"""Pallas megakernel vs the jax wavefront spec (interpret mode on CPU)."""

import jax
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from kajo_tpu.models.integrator import RenderConfig
from kajo_tpu.models.wavefront import render_pass_fast
from kajo_tpu.ops.pallas import megakernel
from kajo_tpu.scene import parser
from kajo_tpu.scene.testscene import build_test_scene

from conftest import REFERENCE_DATA


def _mega(scene, key, w, h, spp, config=RenderConfig()):
    with pltpu.force_tpu_interpret_mode():
        return np.asarray(megakernel.render_pass_megakernel(scene, key, w, h, spp, config))


def test_supports():
    scene = parser.load(f"{REFERENCE_DATA}/spheres.json", 1.0)
    assert megakernel.supports(scene)
    import dataclasses

    assert not megakernel.supports(dataclasses.replace(scene, rigid_spheres=False))


def test_matches_wavefront_spheres():
    scene = parser.load(f"{REFERENCE_DATA}/spheres.json", 32 / 24)
    a = _mega(scene, jax.random.PRNGKey(1), 32, 24, 16)
    b = np.asarray(render_pass_fast(scene, jax.random.PRNGKey(1), 32, 24, 16))
    assert np.isfinite(a).all()
    # same estimator, same RNG stream; only the plane tangent frame differs
    # (azimuthal rotation of cosine sampling) -> statistically equal
    rel = abs(a[..., :3].mean() - b[..., :3].mean()) / b[..., :3].mean()
    assert rel < 0.05, rel


def test_matches_reference_golden():
    import os

    scene = parser.load(f"{REFERENCE_DATA}/spheres.json", 32 / 24)
    imgs = [_mega(scene, jax.random.PRNGKey(100 + i), 32, 24, 16) for i in range(4)]
    img = np.mean(imgs, axis=0)
    golden = np.fromfile(
        os.path.join(os.path.dirname(__file__), "goldens", "spheres_32x24.raw"), np.float32
    ).reshape(24, 32, 4)
    tm = lambda x: np.clip(x[..., :3], 0, 1) ** (1 / 2.2)
    mad = np.abs(tm(img) - tm(golden)).mean()
    assert mad < 0.11, mad
    assert abs(img[..., :3].mean() - golden[..., :3].mean()) / golden[..., :3].mean() < 0.08


def test_caustics_finite():
    scene = parser.load("/root/repo/data/caustics.json", 1.0)
    img = _mega(scene, jax.random.PRNGKey(3), 16, 16, 4)
    assert np.isfinite(img).all()
    assert img[..., :3].mean() > 0


def test_full_mis_mode():
    scene = build_test_scene(1.0)
    kajo = _mega(scene, jax.random.PRNGKey(5), 16, 16, 4)
    full = _mega(scene, jax.random.PRNGKey(5), 16, 16, 4, RenderConfig(full_mis=True))
    assert full[..., :3].mean() >= kajo[..., :3].mean() * 0.999
