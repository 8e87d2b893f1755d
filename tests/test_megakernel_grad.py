"""Fused Pallas backward (PRB) vs exact finite differences (interpret mode).

Emission and background enter the estimator linearly and never influence coin
flips or sampled directions, so with a FIXED seed the render is exactly linear
in them: the kernel gradient must match same-seed finite differences to float
precision. Diffuse/specular also steer the (detached) lottery coins, so their
per-seed FD is only valid when no coin flips — tested loosely.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from kajo_tpu.models.integrator import RenderConfig
from kajo_tpu.ops.pallas.megakernel import render_pass_megakernel
from kajo_tpu.ops.pallas.megakernel_grad import make_diff_renderer, material_grads
from kajo_tpu.scene import parser

from conftest import REFERENCE_DATA

CFG = RenderConfig(max_depth=3)
W, H, SPP = 16, 12, 4
KEY = jax.random.PRNGKey(5)


@pytest.fixture(scope="module")
def scene():
    s = parser.load(f"{REFERENCE_DATA}/spheres.json", W / H)
    return jax.tree.map(jnp.asarray, s)


def _mean(scene):
    with pltpu.force_tpu_interpret_mode():
        img = render_pass_megakernel(scene, KEY, W, H, SPP, CFG)
    return float(jnp.mean(img[..., :3]))


def _grads(scene):
    g = np.ones((H, W, 3), np.float32) / (H * W * 3)
    with pltpu.force_tpu_interpret_mode():
        return {k: np.asarray(v) for k, v in material_grads(scene, KEY, g, W, H, SPP, CFG).items()}


def _with_mat(scene, field, idx, ch, dv):
    mats = scene.materials
    arr = getattr(mats, field).at[idx, ch].add(dv)
    return dataclasses.replace(scene, materials=dataclasses.replace(mats, **{field: arr}))


def test_emission_grad_exact(scene):
    # light material is index num_planes + 4 = 10
    gr = _grads(scene)
    h = 10.0
    fd = (_mean(_with_mat(scene, "emission", 10, 1, h)) - _mean(_with_mat(scene, "emission", 10, 1, -h))) / (2 * h)
    np.testing.assert_allclose(gr["emission"][10, 1], fd, rtol=2e-3)


def test_diffuse_grad_close(scene):
    # red channel of the green sphere (mat 8): strictly below the max channel
    # and the sphere has no specular, so p_rr and the lottery coins are
    # unchanged by a small perturbation -> per-seed FD is valid for the
    # detached-probability gradient (the ground #444 has all channels tied,
    # which makes its FD pick up d(1/p_rr) terms the convention excludes)
    gr = _grads(scene)
    h = 5e-3
    fd = (_mean(_with_mat(scene, "diffuse", 8, 0, h)) - _mean(_with_mat(scene, "diffuse", 8, 0, -h))) / (2 * h)
    np.testing.assert_allclose(gr["diffuse"][8, 0], fd, rtol=0.05, atol=1e-4)


def test_custom_vjp_wrapper(scene):
    render = make_diff_renderer(W, H, SPP, CFG)

    def loss(diffuse):
        s = dataclasses.replace(
            scene, materials=dataclasses.replace(scene.materials, diffuse=diffuse)
        )
        return jnp.mean(render(s, KEY)[..., :3])

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss)(scene.materials.diffuse)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0
    assert (g[:, 3] == 0).all()  # alpha receives nothing


def test_grad_zero_for_transparency_by_convention(scene):
    gr = _grads(scene)
    assert set(gr) == {"diffuse", "specular", "emission", "background"}
