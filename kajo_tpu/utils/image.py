"""Image output: linear->sRGB conversion and PNG encoding.

Spec: /root/reference/renderer/Image.cpp — gamma is a plain pow(c, 1/2.2)
(Image.cpp:14-17), channels are rounded via floor(c*255 + .5)
(Image.cpp:19-27), and pixels are clamped *before* gamma
(cpu/Renderer.cpp:73). PNG encoding uses a dependency-free zlib writer (the
reference vendors lodepng); PIL is used opportunistically when present only
because it is faster, with identical bytes-on-screen.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def linear_to_srgb(color: np.ndarray) -> np.ndarray:
    """pow(c, 1/2.2) (Image.cpp:14-17)."""
    return np.power(color, 1.0 / 2.2)


def tonemap(radiance: np.ndarray) -> np.ndarray:
    """Linear HDR [H,W,4] -> uint8 RGBA, reference pipeline
    (clamp -> gamma -> *255+.5 with alpha forced opaque)."""
    rgba = np.clip(np.asarray(radiance, np.float32), 0.0, 1.0)
    rgba = linear_to_srgb(rgba)
    rgba[..., 3] = 1.0
    return (rgba * 255.0 + 0.5).astype(np.uint8)


def encode_png(rgba8: np.ndarray) -> bytes:
    """Minimal RGBA8 PNG encoder (stdlib zlib only)."""
    h, w, c = rgba8.shape
    assert c == 4 and rgba8.dtype == np.uint8

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + rgba8[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def save_png(path: str, radiance: np.ndarray) -> None:
    """Tone-map linear radiance [H,W,4] and write a PNG (Main.cpp:145).

    Prefers the native C runtime (kajo_tpu.runtime) — same pixel math —
    and falls back to the pure-Python implementation."""
    from .. import runtime

    rgba8 = runtime.tonemap(radiance)
    if rgba8 is not None:
        data = runtime.encode_png(rgba8)
        if data is not None:
            with open(path, "wb") as f:
                f.write(data)
            return
    rgba8 = tonemap(radiance) if rgba8 is None else rgba8
    try:
        from PIL import Image  # optional fast path

        Image.fromarray(rgba8, "RGBA").save(path)
    except ImportError:
        with open(path, "wb") as f:
            f.write(encode_png(rgba8))


def load_png(path: str) -> np.ndarray:
    """Read a PNG back as uint8 RGBA (for tests and comparisons)."""
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGBA"))
