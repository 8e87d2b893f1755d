"""Built-in fallback test scene.

Same content as the reference's hardcoded scene used when no scene file is
given (spec /root/reference/renderer/Main.cpp:13-95): four unit spheres (one
refractive, one Phong), one small emissive sphere, a ground plane, four walls
and a ceiling, perspective camera. Colors here are already linear (the
reference builds this scene without the sRGB->linear parse step).
"""

from __future__ import annotations

import numpy as np

from ..utils import math3d
from .types import Camera, Scene, make_scene


def build_test_scene(aspect_ratio: float = 4.0 / 3.0) -> Scene:
    colors = np.array(
        [[1, 1, 1, 1], [0.8, 0.1, 0.1, 1], [0.1, 0.8, 0.1, 1], [0.1, 0.1, 0.8, 1]],
        np.float32,
    )

    spheres = []
    for i in range(4):
        material = {"ambient": colors[i] * 0.1, "diffuse": colors[i]}
        if i == 1:
            material["specular_exponent"] = 20.0
        if i == 0:
            material["transparency"] = np.full(4, 0.9, np.float32)
            material["refractive_index"] = 1.5
        spheres.append(
            {
                "transform": math3d.translate(math3d.identity(), [i * 3 - 2, 0, i * 0.5]),
                "radius": 1.0,
                "material": material,
            }
        )
    spheres.append(
        {
            "transform": math3d.translate(math3d.identity(), [0, -1.5, 2]),
            "radius": 0.3,
            "material": {"emission": np.array([8, 8, 8, 0], np.float32)},
        }
    )

    gray = {"diffuse": np.array([0.4, 0.4, 0.4, 1], np.float32)}
    white = {"diffuse": np.array([1, 1, 1, 1], np.float32)}
    ident = math3d.identity()
    planes = [
        {"transform": math3d.translate(ident, [0, 1, 0]), "material": gray},
        {"transform": math3d.translate(math3d.rotate(ident, -90, [1, 0, 0]), [0, 2, 0]), "material": white},
        {"transform": math3d.translate(math3d.rotate(ident, -90, [0, 0, 1]), [0, 10, 0]), "material": white},
        {"transform": math3d.translate(math3d.rotate(ident, 90, [0, 0, 1]), [0, 8, 0]), "material": white},
        {"transform": math3d.translate(math3d.rotate(ident, 90, [1, 0, 0]), [0, 6, 0]), "material": white},
        {"transform": math3d.translate(math3d.rotate(ident, 180, [1, 0, 0]), [0, 2, 0]), "material": white},
    ]

    camera = Camera(
        transform=math3d.look_at([-6, -0.8, 4], [0, 0, 0], [0, -1, 0]),
        projection=math3d.perspective(45.0, aspect_ratio, 0.1, 100.0),
    )
    return make_scene(camera, np.array([0, 0, 0, 1], np.float32), planes, spheres)
