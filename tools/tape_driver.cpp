// RNG-tape recorder for the reference CPU estimator (/root/reference).
//
// Lockstep validation oracle (SURVEY.md §7.4 hard-part 2b): renders a set of
// individual samples with the reference's own Raytracer/Shader/BSDF/Light
// code and records, per sample,
//   S ox oy oz dx dy dz        the exact camera ray
//   U x y z w                  every Random::generate() vec4 drawn by shade()
//   R r g b a                  the returned radiance
// The Python lockstep integrator (tools/lockstep.py) replays the same rays
// and uniforms through OUR estimator math; per-sample radiance agreement
// validates every MIS weight / RR factor / lottery division exactly, with no
// Monte-Carlo noise floor in the way.
//
// The generate() hook is patched into a COPY of the reference's Random.cpp
// by tools/build_tape_driver.sh (the read-only reference tree is untouched).
//
// Usage: tape_driver SCENE.json W H SPP N_PIXELS [SEED] > tape.txt

#include "scene/Parser.h"
#include "scene/Scene.h"
#include "renderer/cpu/Scene.h"
#include "renderer/cpu/Raytracer.h"
#include "renderer/cpu/Shader.h"
#include "renderer/cpu/Random.h"
#include "renderer/cpu/Ray.h"
#include "renderer/cpu/SurfacePoint.h"

#include <glm/glm.hpp>
#include <glm/gtc/matrix_transform.hpp>
#include <cstdio>
#include <cstdlib>

// defined here, called from the patched Random::generate()
void (*kajo_tape_hook)(const glm::vec4&) = nullptr;

static void record(const glm::vec4& v)
{
    printf("U %.9g %.9g %.9g %.9g\n", v.x, v.y, v.z, v.w);
}

int main(int argc, char** argv)
{
    if (argc < 6) {
        fprintf(stderr, "usage: %s SCENE.json W H SPP N_PIXELS [SEED]\n", argv[0]);
        return 1;
    }
    const char* scenePath = argv[1];
    int width = atoi(argv[2]);
    int height = atoi(argv[3]);
    int spp = atoi(argv[4]);
    int nPixels = atoi(argv[5]);
    unsigned seed = argc > 6 ? (unsigned)atoi(argv[6]) : 0715517u;

    scene::Scene sceneData;
    if (!scene::Parser::load(sceneData, scenePath, (float)width / height)) {
        fprintf(stderr, "failed to load %s\n", scenePath);
        return 1;
    }

    cpu::Scene scene(sceneData);
    cpu::Raytracer raytracer(&scene);
    cpu::Shader shader(&scene, &raytracer);

    const cpu::Camera& camera = scene.camera;
    const glm::vec4 viewport(0, 0, 1, 1);
    glm::vec3 p1 = glm::unProject(glm::vec3(0.f, 0.f, 0.f), camera.transform, camera.projection, viewport);
    glm::vec3 p2 = glm::unProject(glm::vec3(1.f, 0.f, 0.f), camera.transform, camera.projection, viewport);
    glm::vec3 p3 = glm::unProject(glm::vec3(0.f, 1.f, 0.f), camera.transform, camera.projection, viewport);
    glm::vec3 origin(glm::inverse(camera.transform) * glm::vec4(0.f, 0.f, 0.f, 1.f));

    int samplesPerAxis = (int)sqrtf((float)spp);
    float pixelWidth = 1.f / width;
    float pixelHeight = 1.f / height;
    float sampleWidth = pixelWidth / samplesPerAxis;
    float sampleHeight = pixelHeight / samplesPerAxis;

    cpu::Random random(seed);
    int stride = std::max(1, (width * height) / std::max(1, nPixels));
    for (int p = 0; p < nPixels; p++) {
        int pix = (p * stride) % (width * height);
        int x = pix % width;
        int y = pix / width;
        for (int sy = 0; sy < samplesPerAxis; sy++) {
            for (int sx = 0; sx < samplesPerAxis; sx++) {
                glm::vec4 offset = random.generate() * .5f + glm::vec4(.5f);
                float fx = x * pixelWidth + sx * sampleWidth + offset.x * sampleWidth;
                float fy = (height - y) * pixelHeight + sy * sampleHeight + offset.y * sampleHeight;
                glm::vec3 direction = glm::normalize(p1 + (p2 - p1) * fx + (p3 - p1) * fy - origin);
                cpu::Ray ray;
                ray.origin = origin;
                ray.direction = direction;
                printf("S %.9g %.9g %.9g %.9g %.9g %.9g\n",
                       origin.x, origin.y, origin.z, direction.x, direction.y, direction.z);
                kajo_tape_hook = &record;  // jitter draws above are not taped
                cpu::SurfacePoint sp = raytracer.trace(ray);
                glm::vec4 radiance = shader.shade(sp, random);
                kajo_tape_hook = nullptr;
                printf("R %.9g %.9g %.9g %.9g\n", radiance.x, radiance.y, radiance.z, radiance.w);
            }
        }
    }
    return 0;
}
