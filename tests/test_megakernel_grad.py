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


# ---- big-K path: fori object loops + VMEM-table accumulation -------------
@pytest.fixture(scope="module")
def big_scene():
    from kajo_tpu.scene.procedural import random_spheres_scene

    s = random_spheres_scene(40, seed=11, extent=10.0, n_lights=2)  # K = 43 > 24
    return jax.tree.map(jnp.asarray, s)


def test_big_k_uses_table_path(big_scene):
    from kajo_tpu.ops.pallas import megakernel_grad

    assert big_scene.num_objects > megakernel_grad.GRAD_UNROLL_OBJECTS
    assert megakernel_grad.supports(big_scene)


def test_big_k_emission_grad_exact(big_scene):
    """Emission is exactly linear at fixed seed: kernel grad == same-seed FD
    (validates the dynamic-row VMEM table accumulation end to end)."""
    def mean(s):
        with pltpu.force_tpu_interpret_mode():
            return float(jnp.mean(render_pass_megakernel(s, KEY, W, H, SPP, CFG)[..., :3]))

    g = np.ones((H, W, 3), np.float32) / (H * W * 3)
    with pltpu.force_tpu_interpret_mode():
        gr = {k: np.asarray(v) for k, v in material_grads(big_scene, KEY, g, W, H, SPP, CFG).items()}
    # a light material: num_planes + first light sphere index
    li = 1 + int(np.asarray(big_scene.light_indices)[0])
    h = 10.0
    fd = (mean(_with_mat(big_scene, "emission", li, 1, h))
          - mean(_with_mat(big_scene, "emission", li, 1, -h))) / (2 * h)
    np.testing.assert_allclose(gr["emission"][li, 1], fd, rtol=2e-3, atol=1e-9)
    # background is linear too
    fdbg_h = 0.5

    def with_bg(s, dv):
        return dataclasses.replace(s, background=s.background + jnp.array([0.0, dv, 0.0, 0.0]))

    fd_bg = (mean(with_bg(big_scene, fdbg_h)) - mean(with_bg(big_scene, -fdbg_h))) / (2 * fdbg_h)
    np.testing.assert_allclose(gr["background"][1], fd_bg, rtol=2e-3, atol=1e-9)


def test_big_k_diffuse_grad_close(big_scene):
    def mean(s):
        with pltpu.force_tpu_interpret_mode():
            return float(jnp.mean(render_pass_megakernel(s, KEY, W, H, SPP, CFG)[..., :3]))

    g = np.ones((H, W, 3), np.float32) / (H * W * 3)
    with pltpu.force_tpu_interpret_mode():
        gr = {k: np.asarray(v) for k, v in material_grads(big_scene, KEY, g, W, H, SPP, CFG).items()}
    # pick the diffuse sphere with the largest gradient signal; perturb a
    # non-max channel so coins don't flip (detached-probability convention)
    mats = np.asarray(big_scene.materials.diffuse)
    cand = [k for k in range(1, mats.shape[0]) if mats[k].max() > 0 and np.argmax(mats[k][:3]) != 0]
    k_best = max(cand, key=lambda k: abs(gr["diffuse"][k, 0]))
    h = 5e-3
    fd = (mean(_with_mat(big_scene, "diffuse", k_best, 0, h))
          - mean(_with_mat(big_scene, "diffuse", k_best, 0, -h))) / (2 * h)
    np.testing.assert_allclose(gr["diffuse"][k_best, 0], fd, rtol=0.05, atol=1e-5)
