/* Native image runtime: tone-mapping + PNG encode.
 *
 * The TPU-native equivalent of the reference's C++ host-side image layer
 * (renderer/Image.cpp + vendored lodepng): the compute path is JAX/XLA, but
 * the host pipeline — clamp, pow(1/2.2) gamma, RGBA8 pack, zlib PNG encode —
 * is native C with a plain C ABI (loaded via ctypes; no pybind11 in this
 * image). Exact same pixel math as utils/image.py (clamp -> powf -> *255+.5).
 *
 * Build: see runtime/__init__.py (cc -O3 -shared -lz -lm).
 */

#include <math.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

/* clamp -> pow(1/2.2) -> *255+.5 -> RGBA8, alpha forced 255
 * (spec renderer/Image.cpp:14-27, cpu/Renderer.cpp:73) */
void kajo_tonemap(const float* rgba, int64_t n_pixels, uint8_t* out)
{
    const float inv_gamma = 1.0f / 2.2f;
    for (int64_t i = 0; i < n_pixels; i++) {
        for (int c = 0; c < 3; c++) {
            float v = rgba[i * 4 + c];
            v = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
            out[i * 4 + c] = (uint8_t)(powf(v, inv_gamma) * 255.f + .5f);
        }
        out[i * 4 + 3] = 255;
    }
}

static void put_be32(uint8_t* p, uint32_t v)
{
    p[0] = v >> 24; p[1] = v >> 16; p[2] = v >> 8; p[3] = v;
}

static uint8_t* put_chunk(uint8_t* p, const char* tag, const uint8_t* data, uint32_t len)
{
    put_be32(p, len);
    memcpy(p + 4, tag, 4);
    if (len) memcpy(p + 8, data, len);
    uint32_t crc = crc32(0, p + 4, len + 4);
    put_be32(p + 8 + len, crc);
    return p + 12 + len;
}

/* Encode RGBA8 -> PNG. Returns bytes written, or -1 if out_cap too small. */
int64_t kajo_encode_png(const uint8_t* rgba8, int width, int height,
                        uint8_t* out, int64_t out_cap)
{
    int64_t stride = (int64_t)width * 4;
    int64_t raw_len = (stride + 1) * height;
    uint8_t* raw = (uint8_t*)malloc(raw_len);
    if (!raw) return -1;
    for (int y = 0; y < height; y++) {
        raw[y * (stride + 1)] = 0; /* filter: none */
        memcpy(raw + y * (stride + 1) + 1, rgba8 + y * stride, stride);
    }

    uLongf comp_cap = compressBound(raw_len);
    uint8_t* comp = (uint8_t*)malloc(comp_cap);
    if (!comp) { free(raw); return -1; }
    if (compress2(comp, &comp_cap, raw, raw_len, 6) != Z_OK) {
        free(raw); free(comp); return -1;
    }
    free(raw);

    int64_t need = 8 + 25 + (12 + (int64_t)comp_cap) + 12;
    if (need > out_cap) { free(comp); return -1; }

    uint8_t* p = out;
    static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
    memcpy(p, sig, 8); p += 8;
    uint8_t ihdr[13];
    put_be32(ihdr, (uint32_t)width);
    put_be32(ihdr + 4, (uint32_t)height);
    ihdr[8] = 8; ihdr[9] = 6; ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
    p = put_chunk(p, "IHDR", ihdr, 13);
    p = put_chunk(p, "IDAT", comp, (uint32_t)comp_cap);
    p = put_chunk(p, "IEND", NULL, 0);
    free(comp);
    return p - out;
}

/* Progressive accumulation: total += pass; display = clamped total/passes.
 * One fused pass over the buffers (the reference's per-pixel accumulate at
 * cpu/Renderer.cpp:69-75 done host-side for the streaming preview). */
void kajo_accumulate(float* total, const float* pass_img, int64_t n, float inv_passes,
                     uint8_t* display_rgba8)
{
    const float inv_gamma = 1.0f / 2.2f;
    for (int64_t i = 0; i < n; i++) {
        float t0 = total[i * 4 + 0] += pass_img[i * 4 + 0];
        float t1 = total[i * 4 + 1] += pass_img[i * 4 + 1];
        float t2 = total[i * 4 + 2] += pass_img[i * 4 + 2];
        total[i * 4 + 3] += pass_img[i * 4 + 3];
        if (display_rgba8) {
            float v;
            v = t0 * inv_passes; v = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
            display_rgba8[i * 4 + 0] = (uint8_t)(powf(v, inv_gamma) * 255.f + .5f);
            v = t1 * inv_passes; v = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
            display_rgba8[i * 4 + 1] = (uint8_t)(powf(v, inv_gamma) * 255.f + .5f);
            v = t2 * inv_passes; v = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
            display_rgba8[i * 4 + 2] = (uint8_t)(powf(v, inv_gamma) * 255.f + .5f);
            display_rgba8[i * 4 + 3] = 255;
        }
    }
}
