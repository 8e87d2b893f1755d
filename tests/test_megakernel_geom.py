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


# ---- non-rigid (scaled/rotated transforms): center tangent via invt -------
@pytest.fixture(scope="module")
def scaled_scene():
    s = parser.load("data/scaled.json", W / H)
    return jax.tree.map(jnp.asarray, s)


@pytest.fixture(scope="module")
def rev_scaled(scaled_scene, cot):
    with pltpu.force_tpu_interpret_mode():
        g = geometry_grads(scaled_scene, KEY, cot, W, H, SPP, CFG)
    return {k: np.asarray(v) for k, v in g.items()}


def test_nonrigid_supported(scaled_scene):
    assert not getattr(scaled_scene, "rigid_spheres", True)
    assert megakernel_geom.supports(scaled_scene)


def test_nonrigid_center_grads_match_forward_mode(scaled_scene, cot, rev_scaled):
    """Round-4 port: the replay kernel injects the one-hot center tangent
    through invt (d invt/d c = -inv3) of the 23-float object-space record;
    must match the forward-mode jvp kernel (which differentiates the packed
    records by jax.jvp outside the kernel) same-stream."""
    checked = 0
    for i in range(int(scaled_scene.num_spheres)):
        for ax in range(3):
            want = _fwd_dot(scaled_scene, cot, _center_tangent(scaled_scene, i, ax))
            got = float(rev_scaled["center"][i, ax])
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)
            checked += 1
    assert checked >= 6


def test_nonrigid_radius_grads_match_forward_mode(scaled_scene, cot, rev_scaled):
    for i in range(int(scaled_scene.num_spheres)):
        want = _fwd_dot(scaled_scene, cot, _radius_tangent(scaled_scene, i))
        got = float(rev_scaled["radius"][i])
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


def test_nonrigid_center_grad_matches_same_seed_fd(scaled_scene):
    """FD pin for the general record: per-pixel same-seed central differences
    of the non-rigid megakernel primal vs the forward-jvp kernel's tangent
    image (the same masked-outlier pattern as the rigid
    test_jvp_kernel_matches_same_seed_fd — FD blows up where a silhouette
    crosses a pixel, those are excluded). rev == jvp is pinned exactly by
    test_nonrigid_center_grads_match_forward_mode above, closing the loop
    rev == jvp == FD."""
    from kajo_tpu.ops.pallas.megakernel import render_pass_megakernel

    checked = 0
    for si, ax in [(0, 0), (1, 0)]:
        with pltpu.force_tpu_interpret_mode():
            _, img_dot = render_pass_megakernel_jvp(
                scaled_scene, _center_tangent(scaled_scene, si, ax), KEY, W, H, SPP, CFG
            )
        h = 1e-3

        def prim(dz, si=si, ax=ax):
            st = scaled_scene.sphere_transform.at[si, ax, 3].add(dz)
            s2 = dataclasses.replace(scaled_scene, sphere_transform=st)
            with pltpu.force_tpu_interpret_mode():
                return np.asarray(
                    render_pass_megakernel(s2, KEY, W, H, SPP, CFG)
                )[..., :3]

        fd = (prim(h) - prim(-h)) / (2 * h)
        a = np.asarray(img_dot[..., :3])
        assert np.isfinite(a).all()
        if np.abs(a).sum() < 0.04:
            continue  # no interior signal for this direction at this size
        mask = np.abs(fd) < 50  # FD blows up where a silhouette crosses
        denom = max(np.abs(fd[mask]).max(), 0.1)
        rel = np.abs(a[mask] - fd[mask]) / denom
        # bulk agreement: sub-threshold silhouette slivers leave a few
        # pixels where FD sees boundary motion the interior gradient
        # excludes by convention — bound the bulk tightly, the tail loosely
        assert np.percentile(rel, 99) < 0.02, np.percentile(rel, 99)
        assert rel.max() < 0.1, rel.max()
        checked += 1
    assert checked >= 1


def test_nonrigid_inverse_mega_runs_fused(scaled_scene):
    """VERDICT r3 item 3 'done' check: inverse rendering on data/scaled.json
    through engine='mega' — the fused PRB material kernel plus the
    general-record geometry replay drive a JOINT (diffuse + transform)
    optimization with the clipped cross-estimator loss (the scene's
    16^2.2-radiance light otherwise drowns the albedo signal in MC noise).
    Asserts the fused engine is selected, the perturbed ground-plane albedo
    moves substantially toward truth, and the transform update stays finite
    (this configuration NaN'd before the round-4 solid-angle underflow fix)."""
    from kajo_tpu.diff.inverse import InverseRenderer
    from kajo_tpu.ops.pallas.megakernel import render_pass_megakernel

    with pltpu.force_tpu_interpret_mode():
        target = np.asarray(
            render_pass_megakernel(scaled_scene, jax.random.PRNGKey(3), W, H, 16, CFG)
        )
    true_diffuse = np.asarray(scaled_scene.materials.diffuse).copy()
    row = 0  # the ground plane's material (#444) — half the image
    wrong = dataclasses.replace(
        scaled_scene,
        materials=dataclasses.replace(
            scaled_scene.materials,
            diffuse=scaled_scene.materials.diffuse.at[row, :3].set(
                jnp.array([0.35, 0.05, 0.35])
            ),
        ),
    )
    err0 = float(
        np.abs(np.asarray(wrong.materials.diffuse)[row, :3] - true_diffuse[row, :3]).sum()
    )
    with pltpu.force_tpu_interpret_mode():
        inv = InverseRenderer(
            wrong, target, W, H, spp=8, config=CFG,
            param_spec=("diffuse", "sphere_transform"),
            learning_rate=5e-2, decay_steps=30, engine="mega", loss_clip=2.0,
        )
        assert inv.engine == "mega"
        losses = inv.run(30, jax.random.PRNGKey(11))
    err1 = float(
        np.abs(np.asarray(inv.params["diffuse"])[row, :3] - true_diffuse[row, :3]).sum()
    )
    assert err1 < 0.75 * err0, (err0, err1)
    assert np.isfinite(losses).all()
    drift = np.abs(
        np.asarray(inv.params["sphere_transform"])
        - np.asarray(scaled_scene.sphere_transform)
    ).max()
    assert np.isfinite(drift) and drift < 1.0, drift


# ---- one_light_nee in the geometry replay kernel (round-4, item 6) --------
@pytest.fixture(scope="module")
def manylight_scene():
    from kajo_tpu.scene.procedural import random_spheres_scene

    # 8 + 3 light spheres = 11 <= UNROLL_OBJECTS (the jvp oracle needs it)
    s = random_spheres_scene(8, seed=23, extent=8.0, n_lights=3)
    return jax.tree.map(jnp.asarray, s)


def test_one_light_geom_grads_match_forward_mode(manylight_scene, cot):
    """Under one_light_nee the replay kernel gathers the selected light's
    record one-hot and injects the delta through it; must match the forward
    jvp kernel (same stream, same one-light path) for center AND radius, for
    a light sphere and a non-light sphere."""
    cfg = dataclasses.replace(CFG, one_light_nee=True)
    with pltpu.force_tpu_interpret_mode():
        g = geometry_grads(manylight_scene, KEY, cot, W, H, SPP, cfg)
    rev = {k: np.asarray(v) for k, v in g.items()}

    def fwd_dot(tan):
        with pltpu.force_tpu_interpret_mode():
            _, img_dot = render_pass_megakernel_jvp(
                manylight_scene, tan, KEY, W, H, SPP, cfg
            )
        return float(jnp.sum(cot * img_dot[..., :3]))

    lights = set(int(i) for i in np.asarray(manylight_scene.light_indices).ravel())
    pick = [
        min(lights),
        next(
            i for i in range(int(manylight_scene.num_spheres)) if i not in lights
        ),
    ]
    for i in pick:
        for ax in range(3):
            want = fwd_dot(_center_tangent(manylight_scene, i, ax))
            got = float(rev["center"][i, ax])
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)
        want = fwd_dot(_radius_tangent(manylight_scene, i))
        np.testing.assert_allclose(float(rev["radius"][i]), want, rtol=2e-3, atol=1e-5)


# ---- TRACK_SLOTS truncation, quantified (round-4, VERDICT item 7) ---------
def _mirror_ring_scene():
    """Deterministic deep-reflection scene: the camera INSIDE a cavity of six
    overlapping mirror spheres (one per axis direction) + a small light.
    Mirror bounces consume no direction RNG, so the sphere sequence each
    pixel's path visits is a deterministic function of the camera ray —
    countable exactly with trace + reflect. ~87% of pixels visit more than 4
    distinct spheres within depth 8 (measured below), overflowing
    TRACK_SLOTS on purpose."""
    from kajo_tpu.scene.types import Camera, make_scene
    from kajo_tpu.utils import math3d

    cam = Camera(
        projection=math3d.perspective(70.0, 4.0 / 3.0, 0.05, 100.0),
        transform=math3d.look_at([0.2, 0.1, 0.3], [3, 0.5, 0.2], [0, -1, 0]),
    )
    spheres = []
    for c in [(3, 0, 0), (-3, 0, 0), (0, 3, 0), (0, -3, 0), (0, 0, 3), (0, 0, -3)]:
        t = math3d.translate(math3d.identity(), list(c))
        spheres.append(
            {"transform": t, "radius": 2.5,
             "material": {"specular": [1, 1, 1, 1], "specular_exponent": 300.0}}
        )
    spheres.append(
        {"transform": math3d.translate(math3d.identity(), [0.8, -0.6, -0.5]),
         "radius": 0.25, "material": {"emission": [12, 12, 12, 1]}}
    )
    return make_scene(cam, [0.05, 0.05, 0.05, 1], [], spheres)


def test_track_slots_truncation_quantified():
    """Quantifies the TRACK_SLOTS replay cap (round-4, VERDICT item 7):
    (a) the fraction of pixels whose modal (mirror-direction) path visits
    more than 4 distinct non-light spheres within the depth limit, (b) the
    gradient mass a 4-slot cap would DROP — by comparing the replay kernel
    against the forward-mode jvp kernel, which tracks every sphere's tangent
    with no cap (same stream, exact comparison) — and (c) that the default
    TRACK_SLOTS=8 is exact on this scene. The measured 4-slot deviation
    (>10x relative on one direction) is why the default was bumped 4 -> 8."""
    import dataclasses as dc

    from kajo_tpu.models.integrator import RenderConfig
    from kajo_tpu.ops import geometry
    from kajo_tpu.ops.pallas.megakernel import (
        render_pass_megakernel_jvp,
        scene_zero_tangent,
    )
    from kajo_tpu.ops.pallas.megakernel_geom import geometry_grads

    scene = jax.tree.map(jnp.asarray, _mirror_ring_scene())
    cfg = RenderConfig(max_depth=8)
    w, h = 24, 18

    # (a) distinct-sphere counting along the deterministic mirror-direction
    # chain (the modal path at exponent 300)
    prep = geometry.prepare_scene(scene)
    xs, ys = jnp.meshgrid(
        (jnp.arange(w) + 0.5) / w, 1.0 - (jnp.arange(h) + 0.5) / h
    )
    o, d = geometry.generate_rays(prep.camera, xs.ravel(), ys.ravel())
    light_obj = int(np.asarray(prep.light_obj)[0])
    visited = np.zeros((o.shape[0], int(scene.num_spheres)), bool)
    o_c, d_c = o, d
    alive = np.ones((o.shape[0],), bool)
    for _ in range(cfg.max_depth):
        sh = geometry.trace(prep, o_c, d_c)
        obj = np.asarray(sh.obj)
        hit_m = alive & (obj >= 0) & (obj != light_obj)
        visited[np.arange(o.shape[0])[hit_m], obj[hit_m]] = True
        alive = alive & (obj >= 0) & (obj != light_obj)
        n = sh.normal
        d_c = d_c - 2.0 * jnp.sum(d_c * n, -1, keepdims=True) * n
        o_c = sh.position + d_c * 1e-3
    counts = visited.sum(axis=1)
    frac_over4 = float((counts > 4).mean())
    assert frac_over4 > 0.5, frac_over4  # the scene genuinely overflows 4 slots
    assert int(counts.max()) <= megakernel_geom.TRACK_SLOTS  # 8 covers it

    cot = jnp.ones((h, w, 3), jnp.float32)
    dirs = [(0, 0), (0, 1), (1, 0), (2, 1)]
    want = {}
    for ci, ax in dirs:
        tan = scene_zero_tangent(scene)
        tan = dc.replace(
            tan, sphere_transform=tan.sphere_transform.at[ci, ax, 3].set(1.0)
        )
        with pltpu.force_tpu_interpret_mode():
            _, img_dot = render_pass_megakernel_jvp(scene, tan, KEY, w, h, 4, cfg)
        want[ci, ax] = float(jnp.sum(cot * img_dot[..., :3]))

    def max_rel(rev):
        errs = []
        for ci, ax in dirs:
            wv = want[ci, ax]
            if abs(wv) > 1e-2:
                errs.append(abs(float(rev["center"][ci, ax]) - wv) / abs(wv))
        assert errs
        return max(errs)

    # (c) default slots: exact vs the uncapped jvp kernel
    with pltpu.force_tpu_interpret_mode():
        rev8 = geometry_grads(scene, KEY, cot, w, h, 4, cfg)
    err8 = max_rel(rev8)

    # (b) a 4-slot cap: measurable dropped mass on the same scene
    old_slots = megakernel_geom.TRACK_SLOTS
    megakernel_geom.TRACK_SLOTS = 4
    geometry_grads.clear_cache()
    try:
        with pltpu.force_tpu_interpret_mode():
            rev4 = geometry_grads(scene, KEY, cot, w, h, 4, cfg)
        err4 = max_rel(rev4)
    finally:
        megakernel_geom.TRACK_SLOTS = old_slots
        geometry_grads.clear_cache()

    print(
        f"\nTRACK_SLOTS audit: {100 * frac_over4:.1f}% of pixels visit > 4 "
        f"distinct spheres (depth {cfg.max_depth}); max relative gradient "
        f"deviation vs uncapped jvp: 4 slots = {err4:.3f}, "
        f"{old_slots} slots = {err8:.5f}"
    )
    assert err8 < 5e-3, err8  # default slots: exact (fp-level)
    assert err4 > 0.5, err4  # 4 slots measurably dropped gradient mass here
