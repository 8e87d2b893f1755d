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

    # non-rigid scenes are supported everywhere since round 4: the forward
    # kernel AND both reverse-mode grad kernels take the general record
    assert megakernel.supports(dataclasses.replace(scene, rigid_spheres=False))
    from kajo_tpu.ops.pallas import megakernel_geom, megakernel_grad

    assert megakernel_grad.supports(dataclasses.replace(scene, rigid_spheres=False))
    assert megakernel_geom.supports(dataclasses.replace(scene, rigid_spheres=False))


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


def test_nonrigid_scaled_scene_matches_wavefront():
    """Scaled transforms (data/scaled.json) run the 23-float general record:
    same RNG stream as the wavefront -> per-pixel agreement up to the plane
    tangent-frame difference (azimuthal rotation of cosine sampling on the
    ground plane — distribution-equal by design, a handful of bounce pixels
    differ; see the megakernel module docstring)."""
    scene = parser.load("/root/repo/data/scaled.json", 32 / 24)
    assert not scene.rigid_spheres
    assert megakernel.supports(scene)
    a = _mega(scene, jax.random.PRNGKey(1), 32, 24, 16)
    b = np.asarray(render_pass_fast(scene, jax.random.PRNGKey(1), 32, 24, 16))
    assert np.isfinite(a).all()
    tm = lambda x: np.clip(x[..., :3], 0, 1) ** (1 / 2.2)
    assert np.abs(tm(a) - tm(b)).mean() < 5e-4


def test_nonrigid_fori_path_matches_wavefront():
    """> UNROLL_OBJECTS non-rigid spheres exercise the dynamic-SMEM fori loop
    with the general record."""
    from kajo_tpu.scene.procedural import random_spheres_scene

    scene = random_spheres_scene(40, seed=3, extent=20.0, scale_jitter=0.5)
    assert not scene.rigid_spheres
    assert scene.num_spheres > megakernel.UNROLL_OBJECTS
    a = _mega(scene, jax.random.PRNGKey(2), 24, 16, 4)
    b = np.asarray(render_pass_fast(scene, jax.random.PRNGKey(2), 24, 16, 4))
    assert np.isfinite(a).all()
    rel = abs(a[..., :3].mean() - b[..., :3].mean()) / max(b[..., :3].mean(), 1e-9)
    assert rel < 0.01, rel


def test_nonrigid_caustics_scaled_element():
    """The caustics scene with one element rescaled (non-rigid): runs the
    general record through delta BSDFs + refraction."""
    import dataclasses

    import jax.numpy as jnp

    scene = parser.load("/root/repo/data/caustics.json", 1.0)
    st = jnp.asarray(scene.sphere_transform)
    scale = jnp.diag(jnp.array([1.3, 0.8, 1.1, 1.0], jnp.float32))
    st = st.at[0].set(st[0] @ scale)
    scene_nr = dataclasses.replace(
        jax.tree.map(jnp.asarray, scene), sphere_transform=st, rigid_spheres=False
    )
    assert megakernel.supports(scene_nr)
    a = _mega(scene_nr, jax.random.PRNGKey(3), 16, 16, 4)
    b = np.asarray(render_pass_fast(scene_nr, jax.random.PRNGKey(3), 16, 16, 4))
    assert np.isfinite(a).all()
    assert a[..., :3].mean() > 0
    rel = abs(a[..., :3].mean() - b[..., :3].mean()) / max(b[..., :3].mean(), 1e-9)
    assert rel < 0.02, rel


def test_nonrigid_jvp_matches_fd():
    """Forward-mode megakernel on a non-rigid scene: radius tangent of the
    visible sphere matches central differences of the primal kernel."""
    import dataclasses

    import jax.numpy as jnp

    sc = jax.tree.map(jnp.asarray, parser.load("/root/repo/data/scaled.json", 1.0))
    key = jax.random.PRNGKey(4)
    tan = megakernel.scene_zero_tangent(sc)
    tan = dataclasses.replace(tan, sphere_radius=tan.sphere_radius.at[3].set(1.0))
    with pltpu.force_tpu_interpret_mode():
        _, dot = megakernel.render_pass_megakernel_jvp(sc, tan, key, 24, 24, 4)
    dot = np.asarray(dot)
    eps = 1e-3
    rp = dataclasses.replace(sc, sphere_radius=sc.sphere_radius.at[3].add(eps))
    rm = dataclasses.replace(sc, sphere_radius=sc.sphere_radius.at[3].add(-eps))
    ip = _mega(rp, key, 24, 24, 4)
    im = _mega(rm, key, 24, 24, 4)
    fd = (ip - im) / (2 * eps)
    scale = np.abs(fd[..., :3]).mean()
    assert scale > 0.1  # the perturbed sphere is visible
    err = np.abs(fd[..., :3] - dot[..., :3]).mean() / scale
    assert err < 0.01, err


def test_one_light_nee_matches_wavefront():
    """one_light_nee in the fused kernel: the selector/sample uniforms are
    the same PCG4D draws as the wavefront's one-light path, so the images
    agree up to the plane tangent-frame difference."""
    from kajo_tpu.scene.procedural import random_spheres_scene

    scene = random_spheres_scene(24, seed=17, extent=12.0, n_lights=3)
    cfg = RenderConfig(max_depth=2, one_light_nee=True)
    a = _mega(scene, jax.random.PRNGKey(9), 24, 16, 4, cfg)
    b = np.asarray(render_pass_fast(scene, jax.random.PRNGKey(9), 24, 16, 4, cfg))
    assert np.isfinite(a).all()
    rel = abs(a[..., :3].mean() - b[..., :3].mean()) / max(b[..., :3].mean(), 1e-9)
    assert rel < 0.05, rel
    # and it is a different (1-shadow-ray) estimator than all-lights, not a
    # silently ignored knob: same key, different NEE draws -> different image
    c = _mega(scene, jax.random.PRNGKey(9), 24, 16, 4, RenderConfig(max_depth=2))
    assert np.abs(a - c).max() > 1e-6


def test_one_light_nee_grad_kernels_run():
    """Round 4 lifted the one_light_nee gate in both gradient kernels (they
    used to raise): smoke-check finite outputs here; exactness is pinned by
    the dedicated FD / forward-jvp comparisons in test_megakernel_grad.py /
    test_megakernel_geom.py."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from kajo_tpu.ops.pallas import megakernel_geom, megakernel_grad

    scene = parser.load(f"{REFERENCE_DATA}/spheres.json", 1.0)
    cfg = RenderConfig(one_light_nee=True)
    cot = jnp.ones((8, 8, 3), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        g1 = megakernel_grad.material_grads(scene, jax.random.PRNGKey(0), cot, 8, 8, 4, cfg)
        g2 = megakernel_geom.geometry_grads(scene, jax.random.PRNGKey(0), cot, 8, 8, 4, cfg)
    for g in (g1, g2):
        for v in g.values():
            assert np.isfinite(np.asarray(v)).all()


def test_full_mis_mode():
    scene = build_test_scene(1.0)
    kajo = _mega(scene, jax.random.PRNGKey(5), 16, 16, 4)
    full = _mega(scene, jax.random.PRNGKey(5), 16, 16, 4, RenderConfig(full_mis=True))
    assert full[..., :3].mean() >= kajo[..., :3].mean() * 0.999
