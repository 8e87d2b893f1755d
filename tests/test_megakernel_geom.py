"""Reverse-mode geometry kernel vs the forward-mode jvp kernel (interpret).

The two kernels share the estimator, the PCG4D streams and the detachment
convention (discrete coins + visibility detached), so every sphere
parameter's reverse-kernel table entry must equal the forward kernel's
tangent image contracted with the cotangent — same-stream, near float-exact.
Light spheres included (VERDICT round-2 item 7): the reverse kernel injects
the one-hot delta into the light record too, covering the NEE-sampler role
(sample position, solid-angle pdfs, deferred-MIS light pdf).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from kajo_tpu.models.integrator import RenderConfig
from kajo_tpu.ops.pallas import megakernel_geom
from kajo_tpu.ops.pallas.megakernel import (
    render_pass_megakernel_jvp,
    scene_zero_tangent,
)
from kajo_tpu.ops.pallas.megakernel_geom import geometry_grads
from kajo_tpu.scene import parser

from conftest import REFERENCE_DATA

CFG = RenderConfig(max_depth=3)
W, H, SPP = 16, 12, 4
KEY = jax.random.PRNGKey(5)


@pytest.fixture(scope="module")
def scene():
    s = parser.load(f"{REFERENCE_DATA}/spheres.json", W / H)
    return jax.tree.map(jnp.asarray, s)


@pytest.fixture(scope="module")
def cot():
    # non-uniform cotangent so per-pixel sign structure is exercised
    y = jnp.linspace(0.2, 1.0, H)[:, None, None]
    x = jnp.linspace(1.0, 0.4, W)[None, :, None]
    return jnp.broadcast_to(y * x, (H, W, 3)).astype(jnp.float32)


@pytest.fixture(scope="module")
def rev(scene, cot):
    with pltpu.force_tpu_interpret_mode():
        g = geometry_grads(scene, KEY, cot, W, H, SPP, CFG)
    return {k: np.asarray(v) for k, v in g.items()}


def _fwd_dot(scene, cot, tangent_scene):
    with pltpu.force_tpu_interpret_mode():
        _, img_dot = render_pass_megakernel_jvp(scene, tangent_scene, KEY, W, H, SPP, CFG)
    return float(jnp.sum(cot * img_dot[..., :3]))


def _center_tangent(scene, i, ax):
    tan = scene_zero_tangent(scene)
    st = tan.sphere_transform.at[i, ax, 3].set(1.0)
    return dataclasses.replace(tan, sphere_transform=st)


def _radius_tangent(scene, i):
    tan = scene_zero_tangent(scene)
    return dataclasses.replace(tan, sphere_radius=tan.sphere_radius.at[i].set(1.0))


def _is_light(scene, i):
    return bool(scene.materials.emission[scene.num_planes + i, :3].max() > 0)


def test_center_grads_match_forward_mode(scene, cot, rev):
    checked = lights = 0
    for i in range(int(scene.num_spheres)):
        for ax in range(3):
            want = _fwd_dot(scene, cot, _center_tangent(scene, i, ax))
            got = float(rev["center"][i, ax])
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)
            checked += 1
        lights += _is_light(scene, i)
    assert checked >= 6 and lights >= 1  # light NEE-sampler grads covered


def test_radius_grads_match_forward_mode(scene, cot, rev):
    checked = 0
    for i in range(int(scene.num_spheres)):
        want = _fwd_dot(scene, cot, _radius_tangent(scene, i))
        got = float(rev["radius"][i])
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)
        checked += 1
    assert checked >= 2


def test_grads_nonzero_and_finite(rev):
    for k, v in rev.items():
        assert np.isfinite(v).all(), k
    assert np.abs(rev["center"]).sum() > 0
    assert np.abs(rev["radius"]).sum() > 0


def test_light_center_grad_matches_same_seed_fd(scene):
    """VERDICT r2 item 7: the LIGHT sphere's center gradient from the
    reverse-mode kernel — which now includes its NEE-sampler role (sample
    position + solid-angle pdfs) — pinned against same-seed central
    differences of the megakernel primal itself. Pixels where FD blows up
    (a silhouette crossing) are excluded from the cotangent, so the
    comparison is interior-gradient vs interior-FD."""
    from kajo_tpu.ops.pallas.megakernel import render_pass_megakernel

    li = int(scene.light_indices[0])  # sphere-array index
    assert _is_light(scene, li)

    def prim(dz):
        st = scene.sphere_transform.at[li, 2, 3].add(dz)
        s2 = dataclasses.replace(scene, sphere_transform=st)
        with pltpu.force_tpu_interpret_mode():
            return np.asarray(render_pass_megakernel(s2, KEY, W, H, SPP, CFG))[..., :3]

    h = 1e-3
    fd = (prim(h) - prim(-h)) / (2 * h)
    mask = (np.abs(fd) < 50).all(axis=-1, keepdims=True)
    cot = np.broadcast_to(mask, (H, W, 3)).astype(np.float32)
    want = float((fd * cot).sum())

    with pltpu.force_tpu_interpret_mode():
        g = geometry_grads(scene, KEY, jnp.asarray(cot), W, H, SPP, CFG)
    got = float(g["center"][li, 2])
    assert abs(want) > 1e-3  # real signal
    np.testing.assert_allclose(got, want, rtol=0.01)


def test_fori_object_path_matches_unrolled(scene, cot, rev):
    """Force the fori sphere loop (the big-K path) on the same scene: the
    injected-delta tangent rides the loop-carried state, so results must be
    identical to the unrolled path."""
    old = megakernel_geom.UNROLL_OBJECTS
    megakernel_geom.UNROLL_OBJECTS = 0
    geometry_grads.clear_cache()  # jit would otherwise reuse the unrolled trace
    try:
        with pltpu.force_tpu_interpret_mode():
            g = geometry_grads(scene, KEY, cot, W, H, SPP, CFG)
        np.testing.assert_allclose(np.asarray(g["center"]), rev["center"], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g["radius"]), rev["radius"], rtol=1e-5)
    finally:
        megakernel_geom.UNROLL_OBJECTS = old
        geometry_grads.clear_cache()
