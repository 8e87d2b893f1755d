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


# ---- forward-mode (jvp) megakernel: geometry tangents at kernel speed ----
def _mega_img(scene, cfg=CFG):
    with pltpu.force_tpu_interpret_mode():
        return np.asarray(render_pass_megakernel(scene, KEY, W, H, SPP, cfg))


def test_jvp_kernel_matches_same_seed_fd(scene):
    """d(image)/d(sphere center x) from the fused forward-mode kernel ==
    same-seed central differences (coins detached -> identical paths; the
    few visibility-flip pixels are masked)."""
    from kajo_tpu.ops.pallas.megakernel import (
        render_pass_megakernel_jvp,
        scene_zero_tangent,
    )

    for sph, col in [(1, 3), (2, 3)]:
        tan = scene_zero_tangent(scene)
        tan = dataclasses.replace(
            tan, sphere_transform=tan.sphere_transform.at[sph, 0, col].set(1.0)
        )
        with pltpu.force_tpu_interpret_mode():
            img, img_dot = render_pass_megakernel_jvp(scene, tan, KEY, W, H, SPP, CFG)
        h = 1e-3
        sp = dataclasses.replace(
            scene, sphere_transform=scene.sphere_transform.at[sph, 0, col].add(h)
        )
        sm = dataclasses.replace(
            scene, sphere_transform=scene.sphere_transform.at[sph, 0, col].add(-h)
        )
        fd = (_mega_img(sp) - _mega_img(sm)) / (2 * h)
        a, b = np.asarray(img_dot[..., :3]), fd[..., :3]
        assert np.isfinite(a).all()
        assert np.abs(a).sum() > 1.0  # real signal
        mask = np.abs(b) < 50  # FD blows up where a silhouette crosses a pixel
        denom = max(np.abs(b[mask]).max(), 1.0)
        assert np.abs(a[mask] - b[mask]).max() / denom < 0.01
        # primal side of the jvp is the ordinary render
        np.testing.assert_allclose(np.asarray(img), _mega_img(scene), rtol=1e-4, atol=1e-5)


def test_jvp_kernel_radius_tangent(scene):
    from kajo_tpu.ops.pallas.megakernel import (
        render_pass_megakernel_jvp,
        scene_zero_tangent,
    )

    tan = scene_zero_tangent(scene)
    tan = dataclasses.replace(tan, sphere_radius=tan.sphere_radius.at[2].set(1.0))
    with pltpu.force_tpu_interpret_mode():
        _, img_dot = render_pass_megakernel_jvp(scene, tan, KEY, W, H, SPP, CFG)
    h = 2e-3
    sp = dataclasses.replace(scene, sphere_radius=scene.sphere_radius.at[2].add(h))
    sm = dataclasses.replace(scene, sphere_radius=scene.sphere_radius.at[2].add(-h))
    fd = (_mega_img(sp) - _mega_img(sm)) / (2 * h)
    a, b = np.asarray(img_dot[..., :3]), fd[..., :3]
    assert np.abs(a).sum() > 0.1
    mask = np.abs(b) < 50
    denom = max(np.abs(b[mask]).max(), 1.0)
    assert np.abs(a[mask] - b[mask]).max() / denom < 0.02


def test_jvp_kernel_detached_lottery(scene):
    """Material tangents must NOT differentiate the RR/lottery compensation
    factors (the detached-probability convention of the jax engines and the
    PRB kernel). Regression: sphere 8 gets BOTH diffuse and specular with
    the perturbed channel as the RR max, so p_rr and p_d move with
    diffuse[8,0] — a jvp that differentiates 1/prob would diverge from the
    detached reverse-mode gradient here (it agreed on the pure-diffuse case
    by accident: there d p_rr/d diffuse[8,0] = 0 and p_d == 1)."""
    from kajo_tpu.ops.pallas.megakernel import (
        render_pass_megakernel_jvp,
        scene_zero_tangent,
    )

    mats = scene.materials
    mixed = dataclasses.replace(
        scene,
        materials=dataclasses.replace(
            mats,
            diffuse=mats.diffuse.at[8, :3].set(jnp.asarray([0.5, 0.3, 0.2])),
            specular=mats.specular.at[8, :3].set(jnp.asarray([0.3, 0.3, 0.3])),
            specular_exponent=mats.specular_exponent.at[8].set(40.0),
        ),
    )
    tan = scene_zero_tangent(mixed)
    tmats = tan.materials
    tan = dataclasses.replace(
        tan, materials=dataclasses.replace(tmats, diffuse=tmats.diffuse.at[8, 0].set(1.0))
    )
    with pltpu.force_tpu_interpret_mode():
        _, img_dot = render_pass_megakernel_jvp(mixed, tan, KEY, W, H, SPP, CFG)
        g = np.ones((H, W, 3), np.float32)
        gr = material_grads(mixed, KEY, g, W, H, SPP, CFG)
    a = float(np.asarray(img_dot[..., :3]).sum())
    b = float(np.asarray(gr["diffuse"])[8, 0])
    assert abs(a) > 1e-3  # real signal
    np.testing.assert_allclose(a, b, rtol=1e-3)


def test_jvp_kernel_material_tangent(scene):
    """Material tangents thread through the same jvp kernel (diffuse of the
    green sphere, matching the reverse-mode kernel's gradient)."""
    from kajo_tpu.ops.pallas.megakernel import (
        render_pass_megakernel_jvp,
        scene_zero_tangent,
    )

    tan = scene_zero_tangent(scene)
    mats = tan.materials
    tan = dataclasses.replace(
        tan, materials=dataclasses.replace(mats, diffuse=mats.diffuse.at[8, 0].set(1.0))
    )
    with pltpu.force_tpu_interpret_mode():
        _, img_dot = render_pass_megakernel_jvp(scene, tan, KEY, W, H, SPP, CFG)
    # <d image, ones> must equal the reverse-mode kernel's diffuse gradient
    g = np.ones((H, W, 3), np.float32)
    with pltpu.force_tpu_interpret_mode():
        gr = material_grads(scene, KEY, g, W, H, SPP, CFG)
    np.testing.assert_allclose(
        float(np.asarray(img_dot[..., :3]).sum()),
        float(np.asarray(gr["diffuse"])[8, 0]),
        rtol=1e-3,
    )


def test_inverse_mega_fwd_grads_match_fd(scene):
    """InverseRenderer(engine='mega-fwd'): per-scalar forward-mode gradients
    of the cross-estimator loss match central differences of the same loss."""
    import numpy as np

    from kajo_tpu.diff.inverse import InverseRenderer, apply_params

    # target: the scene itself, slightly perturbed sphere 1
    target = _mega_like_target(scene)
    mask = {"sphere_transform": np.zeros(scene.sphere_transform.shape, bool)}
    mask["sphere_transform"][1, 0, 3] = True
    mask["sphere_transform"][1, 1, 3] = True
    with pltpu.force_tpu_interpret_mode():
        inv = InverseRenderer(
            scene, target, W, H, spp=SPP, config=CFG,
            param_spec=("sphere_transform",), engine="mega-fwd", param_mask=mask,
        )
        loss, grads = inv._loss_and_grad(inv.params, KEY)
    g = np.asarray(grads["sphere_transform"])
    assert np.count_nonzero(g) == 2

    # FD of the same loss (same keys, primal kernel)
    def loss_of(st):
        import jax.numpy as jnp

        s = dataclasses.replace(scene, sphere_transform=st)
        k1, k2 = jax.random.split(KEY)
        with pltpu.force_tpu_interpret_mode():
            i1 = render_pass_megakernel(s, k1, W, H, SPP, CFG)[..., :3]
            i2 = render_pass_megakernel(s, k2, W, H, SPP, CFG)[..., :3]
        t = target[..., :3]
        return float(jnp.sum((i1 - t) * (i2 - t)) / (W * H * 3))

    h = 1e-3
    st = scene.sphere_transform
    for (r, c) in [(0, 3), (1, 3)]:
        fd = (
            loss_of(st.at[1, r, c].add(h)) - loss_of(st.at[1, r, c].add(-h))
        ) / (2 * h)
        np.testing.assert_allclose(g[1, r, c], fd, rtol=0.05, atol=1e-4)


def _mega_like_target(scene):
    import jax.numpy as jnp

    shifted = dataclasses.replace(
        scene, sphere_transform=scene.sphere_transform.at[1, 0, 3].add(0.3)
    )
    with pltpu.force_tpu_interpret_mode():
        return render_pass_megakernel(shifted, jax.random.PRNGKey(99), W, H, SPP, CFG)


# ---- non-rigid (scaled/rotated transforms): 23-float object-space record --
@pytest.fixture(scope="module")
def scaled_scene():
    s = parser.load("data/scaled.json", W / H)
    return jax.tree.map(jnp.asarray, s)


def test_nonrigid_supported(scaled_scene):
    from kajo_tpu.ops.pallas import megakernel_grad

    assert not getattr(scaled_scene, "rigid_spheres", True)
    assert megakernel_grad.supports(scaled_scene)


def test_nonrigid_emission_grad_exact(scaled_scene):
    """Same-seed FD on emission is exactly linear -> the PRB kernel on the
    general object-space record must reproduce it (round-4 port: the trace
    replay now supports det-scaled t / fwd3 normals, megakernel.py:257-294)."""
    li = int(np.asarray(scaled_scene.light_indices).ravel()[0])
    row = scaled_scene.num_planes + li
    g = np.ones((H, W, 3), np.float32) / (H * W * 3)
    with pltpu.force_tpu_interpret_mode():
        gr = {
            k: np.asarray(v)
            for k, v in material_grads(scaled_scene, KEY, g, W, H, SPP, CFG).items()
        }

    def mean_of(s):
        with pltpu.force_tpu_interpret_mode():
            return float(jnp.mean(render_pass_megakernel(s, KEY, W, H, SPP, CFG)[..., :3]))

    h = 10.0
    fd = (
        mean_of(_with_mat(scaled_scene, "emission", row, 1, h))
        - mean_of(_with_mat(scaled_scene, "emission", row, 1, -h))
    ) / (2 * h)
    np.testing.assert_allclose(gr["emission"][row, 1], fd, rtol=2e-3, atol=1e-9)


def test_nonrigid_diffuse_grad_matches_budget_engine(scaled_scene):
    """PRB diffuse gradients on the scaled scene vs jax.grad of the budget
    engine (the correctness spec for the non-rigid estimator): same estimator
    convention (detached coins), independent seeds -> statistical agreement."""
    from kajo_tpu.models.wavefront import render_pass_budget

    n_seeds = 6
    gs = []
    g = np.ones((H, W, 3), np.float32) / (H * W * 3)
    with pltpu.force_tpu_interpret_mode():
        for i in range(n_seeds):
            k = jax.random.PRNGKey(100 + i)
            gs.append(np.asarray(material_grads(scaled_scene, k, g, W, H, SPP, CFG)["diffuse"]))
    kern = np.mean(gs, axis=0)

    def loss(diffuse, k):
        s = dataclasses.replace(
            scaled_scene,
            materials=dataclasses.replace(scaled_scene.materials, diffuse=diffuse),
        )
        return jnp.mean(render_pass_budget(s, k, W, H, SPP, CFG)[..., :3])

    gf = jax.jit(jax.grad(loss))
    ref = np.mean(
        [
            np.asarray(gf(scaled_scene.materials.diffuse, jax.random.PRNGKey(200 + i)))
            for i in range(n_seeds)
        ],
        axis=0,
    )[:, :3]
    # compare the dominant entries (small-sample Monte Carlo agreement)
    scale = np.abs(ref).max()
    assert scale > 0
    np.testing.assert_allclose(kern, ref, atol=0.25 * scale)


# ---- one_light_nee in the gradient kernels (round-4, VERDICT item 6) ------
@pytest.fixture(scope="module")
def manylight_scene():
    from kajo_tpu.scene.procedural import random_spheres_scene

    s = random_spheres_scene(10, seed=23, extent=8.0, n_lights=3)
    return jax.tree.map(jnp.asarray, s)


def _ol_cfg():
    return dataclasses.replace(CFG, one_light_nee=True)


def test_one_light_emission_grad_exact_small_k(manylight_scene):
    """Emission is linear at fixed seed: the PRB kernel under one_light_nee
    must match same-seed FD of the forward megakernel (also one-light, same
    PCG4D stream)."""
    cfg = _ol_cfg()
    li = int(np.asarray(manylight_scene.light_indices).ravel()[0])
    row = manylight_scene.num_planes + li
    g = np.ones((H, W, 3), np.float32) / (H * W * 3)
    with pltpu.force_tpu_interpret_mode():
        gr = material_grads(manylight_scene, KEY, g, W, H, SPP, cfg)
        gr = {k: np.asarray(v) for k, v in gr.items()}

    def mean_of(s):
        with pltpu.force_tpu_interpret_mode():
            return float(jnp.mean(render_pass_megakernel(s, KEY, W, H, SPP, cfg)[..., :3]))

    h = 10.0
    fd = (
        mean_of(_with_mat(manylight_scene, "emission", row, 1, h))
        - mean_of(_with_mat(manylight_scene, "emission", row, 1, -h))
    ) / (2 * h)
    np.testing.assert_allclose(gr["emission"][row, 1], fd, rtol=2e-3, atol=1e-9)


def test_one_light_emission_grad_exact_big_k(big_scene):
    """Same linear-FD pin through the big-K path (keyed c_le planes flushed
    into the VMEM table: the per-lane selected-light row)."""
    import dataclasses as dc

    from kajo_tpu.ops.pallas import megakernel_grad

    assert big_scene.num_objects > megakernel_grad.GRAD_UNROLL_OBJECTS
    assert big_scene.num_lights > 1
    cfg = dc.replace(CFG, one_light_nee=True)
    li = int(np.asarray(big_scene.light_indices).ravel()[0])
    row = big_scene.num_planes + li
    g = np.ones((H, W, 3), np.float32) / (H * W * 3)
    with pltpu.force_tpu_interpret_mode():
        gr = material_grads(big_scene, KEY, g, W, H, SPP, cfg)
        gr = {k: np.asarray(v) for k, v in gr.items()}

    def mean_of(s):
        with pltpu.force_tpu_interpret_mode():
            return float(jnp.mean(render_pass_megakernel(s, KEY, W, H, SPP, cfg)[..., :3]))

    h = 10.0
    fd = (
        mean_of(_with_mat(big_scene, "emission", row, 1, h))
        - mean_of(_with_mat(big_scene, "emission", row, 1, -h))
    ) / (2 * h)
    np.testing.assert_allclose(gr["emission"][row, 1], fd, rtol=2e-3, atol=1e-9)


# ---- mega-fwd beyond the unroll cap (round-4, VERDICT item 5) -------------
def test_jvp_kernel_fori_path_matches_unrolled(scene):
    """The dual-scalar injection (scene read = v + e * v_tan) threads
    tangents through the DYNAMIC-SMEM fori object/material loops, lifting
    the old unrolled-only restriction: forcing the fori path must reproduce
    the unrolled jvp kernel's primal AND tangent."""
    from kajo_tpu.ops.pallas import megakernel
    from kajo_tpu.ops.pallas.megakernel import (
        render_pass_megakernel_jvp,
        scene_zero_tangent,
    )

    tan = scene_zero_tangent(scene)
    tan = dataclasses.replace(
        tan, sphere_transform=tan.sphere_transform.at[1, 0, 3].set(1.0)
    )
    with pltpu.force_tpu_interpret_mode():
        img_u, dot_u = render_pass_megakernel_jvp(scene, tan, KEY, W, H, SPP, CFG)
    old = megakernel.UNROLL_OBJECTS
    megakernel.UNROLL_OBJECTS = 0
    render_pass_megakernel_jvp.clear_cache()
    try:
        with pltpu.force_tpu_interpret_mode():
            img_f, dot_f = render_pass_megakernel_jvp(scene, tan, KEY, W, H, SPP, CFG)
    finally:
        megakernel.UNROLL_OBJECTS = old
        render_pass_megakernel_jvp.clear_cache()
    np.testing.assert_allclose(np.asarray(img_f), np.asarray(img_u), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dot_f), np.asarray(dot_u), rtol=1e-4, atol=1e-5)
    assert float(np.abs(np.asarray(dot_u)).sum()) > 1.0  # real signal


def test_jvp_kernel_100_objects_matches_geom_kernel():
    """mega-fwd at 100+ objects (far beyond UNROLL_OBJECTS): the jvp kernel's
    cotangent-contracted tangent must equal the reverse-mode geometry
    kernel's table entry (same stream, both all-size kernels now)."""
    from kajo_tpu.ops.pallas.megakernel import (
        render_pass_megakernel_jvp,
        scene_zero_tangent,
    )
    from kajo_tpu.ops.pallas.megakernel_geom import geometry_grads
    from kajo_tpu.scene.procedural import random_spheres_scene

    big = jax.tree.map(jnp.asarray, random_spheres_scene(100, seed=7, extent=12.0, n_lights=2))
    assert big.num_spheres >= 100
    cot = jnp.ones((H, W, 3), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        rev = geometry_grads(big, KEY, cot, W, H, SPP, CFG)
    # pick the sphere with the largest center-gradient magnitude (visible)
    ci = int(np.abs(np.asarray(rev["center"])).sum(axis=1).argmax())
    for ax in range(3):
        tan = scene_zero_tangent(big)
        tan = dataclasses.replace(
            tan, sphere_transform=tan.sphere_transform.at[ci, ax, 3].set(1.0)
        )
        with pltpu.force_tpu_interpret_mode():
            _, img_dot = render_pass_megakernel_jvp(big, tan, KEY, W, H, SPP, CFG)
        want = float(jnp.sum(cot * img_dot[..., :3]))
        got = float(rev["center"][ci, ax])
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)
