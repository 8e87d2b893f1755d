"""Scene data model: SoA pytrees over analytic primitives.

Mirrors the capability of the reference scene model (transformed spheres and
planes with Phong-style materials and emissive-sphere lights; spec
/root/reference/scene/Scene.h:11-61) but stores everything as structure-of-arrays
so the whole scene is one JAX pytree:

  * object ids are dense indices, **planes first then spheres** — matching the
    reference nearest-hit scan order (cpu/Raytracer.cpp:131-132) and the gl
    backend's objectIndex() (gl/Scene.cpp:204-212);
  * material fields are per-object arrays and are differentiable leaves;
  * the set of emissive spheres (the lights) is *static structure* captured at
    construction time (``light_indices``), while the light parameters
    themselves (center, radius, emission) remain differentiable.

All color fields are vec4 like the reference (alpha mostly ignored by shading).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    meta = [f for f in fields if f in getattr(cls, "_static_fields", ())]
    data = [f for f in fields if f not in meta]
    jax.tree_util.register_dataclass(cls, data_fields=data, meta_fields=meta)
    return cls


@_pytree_dataclass
class Materials:
    """Per-object material table, planes first then spheres.

    Defaults per the reference: colors zero, specular_exponent 0,
    refractive_index 1 (scene/Scene.cpp:10-14).
    """

    ambient: jax.Array       # [K, 4] (parsed but unused by shading, like the reference)
    diffuse: jax.Array       # [K, 4]
    specular: jax.Array      # [K, 4]
    emission: jax.Array      # [K, 4]
    transparency: jax.Array  # [K, 4]
    specular_exponent: jax.Array  # [K]
    refractive_index: jax.Array   # [K]

    @staticmethod
    def zeros(k: int) -> "Materials":
        z4 = np.zeros((k, 4), np.float32)
        return Materials(
            ambient=z4.copy(),
            diffuse=z4.copy(),
            specular=z4.copy(),
            emission=z4.copy(),
            transparency=z4.copy(),
            specular_exponent=np.zeros((k,), np.float32),
            refractive_index=np.ones((k,), np.float32),
        )


@_pytree_dataclass
class Camera:
    transform: jax.Array   # [4, 4] view matrix
    projection: jax.Array  # [4, 4]

    @staticmethod
    def default() -> "Camera":
        return Camera(np.eye(4, dtype=np.float32), np.eye(4, dtype=np.float32))


@_pytree_dataclass
class Scene:
    """Differentiable scene pytree.

    ``light_indices`` is static metadata: indices into the sphere arrays of the
    spheres that had nonzero emission at load time (lights are emissive spheres
    only — planes never act as lights, cpu/Shader.cpp:188).
    """

    _static_fields = ("light_indices", "rigid_spheres")

    camera: Camera
    background: jax.Array        # [4]
    plane_transform: jax.Array   # [P, 4, 4]
    sphere_transform: jax.Array  # [S, 4, 4]
    sphere_radius: jax.Array     # [S]
    materials: Materials         # K = P + S entries, planes first
    light_indices: Tuple[int, ...]
    # True when every sphere transform is rigid (orthonormal linear part,
    # det +1): enables the fast world-space trace path with results identical
    # to the reference's object-space math. Checked once at load time.
    rigid_spheres: bool = False

    @property
    def num_planes(self) -> int:
        return self.plane_transform.shape[0]

    @property
    def num_spheres(self) -> int:
        return self.sphere_transform.shape[0]

    @property
    def num_objects(self) -> int:
        return self.num_planes + self.num_spheres

    @property
    def num_lights(self) -> int:
        return len(self.light_indices)


def make_scene(camera: Camera, background, planes, spheres) -> Scene:
    """Assemble a Scene from per-object dicts (host-side).

    ``planes``: list of dicts {"transform": (4,4), "material": dict}
    ``spheres``: list of dicts {"transform": (4,4), "radius": float, "material": dict}
    Material dict keys: ambient/diffuse/specular/emission/transparency (vec4-like),
    specular_exponent, refractive_index.
    """
    p, s = len(planes), len(spheres)
    mats = Materials.zeros(p + s)
    mat_arrays = {f.name: getattr(mats, f.name).copy() for f in dataclasses.fields(Materials)}

    def fill(i, material):
        for key, arr in mat_arrays.items():
            if key in material:
                val = np.asarray(material[key], np.float32)
                arr[i] = val

    plane_t = np.tile(np.eye(4, dtype=np.float32), (max(p, 1), 1, 1))[:p]
    for i, obj in enumerate(planes):
        plane_t[i] = np.asarray(obj["transform"], np.float32)
        fill(i, obj.get("material", {}))

    sphere_t = np.tile(np.eye(4, dtype=np.float32), (max(s, 1), 1, 1))[:s]
    sphere_r = np.zeros((s,), np.float32)
    for i, obj in enumerate(spheres):
        sphere_t[i] = np.asarray(obj["transform"], np.float32)
        sphere_r[i] = np.float32(obj["radius"])
        fill(p + i, obj.get("material", {}))

    emission = mat_arrays["emission"][p:]
    light_indices = tuple(int(i) for i in range(s) if np.any(emission[i] != 0.0))

    linear = sphere_t[:, :3, :3]
    rigid = bool(
        s == 0
        or (
            np.allclose(
                np.einsum("sij,skj->sik", linear, linear),
                np.eye(3, dtype=np.float32)[None],
                atol=1e-5,
            )
            and np.allclose(np.linalg.det(linear), 1.0, atol=1e-5)
        )
    )

    return Scene(
        camera=camera,
        background=np.asarray(background, np.float32),
        plane_transform=plane_t,
        sphere_transform=sphere_t,
        sphere_radius=sphere_r,
        materials=Materials(**mat_arrays),
        light_indices=light_indices,
        rigid_spheres=rigid,
    )


def device_put_scene(scene: Scene, sharding=None) -> Scene:
    """Move all scene leaves to device (replicated under a mesh if given)."""
    if sharding is None:
        return jax.tree.map(jnp.asarray, scene)
    return jax.device_put(scene, sharding)
