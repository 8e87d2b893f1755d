"""Sampler/BSDF/light property tests: pdfs integrate to 1, histograms match pdfs,
energy conservation, reflect/refract identities."""

import jax
import jax.numpy as jnp
import numpy as np

from kajo_tpu.ops import bsdf, lights, sampling

KEY = jax.random.PRNGKey(0)
N = 200_000


def _u(key, n=N):
    return jax.random.uniform(key, (n,), dtype=jnp.float32)


def test_cosine_hemisphere_pdf_and_distribution():
    k1, k2 = jax.random.split(KEY)
    d, pdf = sampling.cosine_hemisphere(_u(k1), _u(k2))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    assert np.all(d[:, 2] >= 0)
    np.testing.assert_allclose(pdf, d[:, 2] / np.pi, atol=1e-5)
    # E[1/pdf] over the sampler = measure of the hemisphere = 2π
    est = np.mean(1.0 / np.maximum(pdf, 1e-8))
    np.testing.assert_allclose(est, 2 * np.pi, rtol=0.02)
    # cosine weighting: E[cosθ] = 2/3
    np.testing.assert_allclose(np.mean(d[:, 2]), 2.0 / 3.0, rtol=0.01)


def test_phong_lobe_pdf_normalized():
    for exp in (1.0, 10.0, 100.0):
        k1, k2 = jax.random.split(jax.random.fold_in(KEY, int(exp)))
        d, pdf = sampling.phong_lobe(_u(k1), _u(k2), exp)
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
        # pdf formula matches (n+1)/2π cosⁿ
        np.testing.assert_allclose(
            pdf, (exp + 1) / (2 * np.pi) * d[:, 2] ** exp, atol=1e-3
        )
        # ∫ pdf dω over the sampled lobe = 1 -> E[1] trivially; instead check
        # E[cosθ] = (n+1)/(n+2) for the Phong lobe about +z
        np.testing.assert_allclose(np.mean(d[:, 2]), (exp + 1) / (exp + 2), rtol=0.01)


def test_uniform_sphere():
    k1, k2 = jax.random.split(KEY)
    d, pdf = sampling.uniform_sphere(_u(k1), _u(k2))
    np.testing.assert_allclose(pdf, 1 / (4 * np.pi), atol=1e-7)
    np.testing.assert_allclose(np.mean(d, axis=0), [0, 0, 0], atol=0.01)


def test_flip_coin_semantics():
    took, prob = sampling.flip_coin(jnp.array([0.2, 0.9, 0.5]), jnp.array([0.5, 0.5, 0.0]))
    np.testing.assert_array_equal(took, [True, False, False])
    np.testing.assert_allclose(prob, [0.5, 0.5, 1.0])


def test_lambert_furnace():
    # ∫ f cos dω with f = albedo/π over the hemisphere = albedo (white furnace)
    k1, k2 = jax.random.split(KEY)
    t = jnp.tile(jnp.array([1.0, 0, 0]), (N, 1))
    b = jnp.tile(jnp.array([0, 1.0, 0]), (N, 1))
    n = jnp.tile(jnp.array([0, 0, 1.0]), (N, 1))
    d, pdf = bsdf.lambert_sample(_u(k1), _u(k2), t, b, n)
    albedo = jnp.tile(jnp.array([0.8, 0.5, 0.25, 1.0]), (N, 1))
    fcos = bsdf.lambert_eval_cos(albedo, n, d)
    est = np.mean(np.asarray(fcos) / np.asarray(pdf)[:, None], axis=0)
    np.testing.assert_allclose(est, [0.8, 0.5, 0.25, 1.0], rtol=0.02)


def test_phong_energy_integral():
    # ∫ lobe(ω) dω = 1 over full sphere when clamped at 0 below the reflection
    # hemisphere: estimate with uniform sphere sampling
    k1, k2 = jax.random.split(KEY)
    d, pdf = sampling.uniform_sphere(_u(k1), _u(k2))
    view = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (N, 1))  # reflection = +z
    n = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (N, 1))
    exp = jnp.full((N,), 30.0)
    p = bsdf.phong_pdf(view, n, d, exp)
    est = np.mean(np.asarray(p) / np.asarray(pdf))
    np.testing.assert_allclose(est, 1.0, rtol=0.02)


def test_reflect_identity():
    v = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2)
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = bsdf.reflect(v, n)
    np.testing.assert_allclose(r, [[1 / np.sqrt(2), 1 / np.sqrt(2), 0]], atol=1e-6)


def test_refraction_snell_and_tir():
    # entering glass at 45°: sin θt = sin 45 / 1.5
    v = jnp.array([[np.sin(np.pi / 4), -np.cos(np.pi / 4), 0.0]], dtype=jnp.float32)
    n = jnp.array([[0.0, 1.0, 0.0]], dtype=jnp.float32)
    ior = jnp.array([1.5], dtype=jnp.float32)
    d, prob = bsdf.transmission_sample(v, n, ior)
    np.testing.assert_allclose(prob, 1.0)
    sin_t = np.abs(d[0, 0])
    np.testing.assert_allclose(sin_t, np.sin(np.pi / 4) / 1.5, rtol=1e-5)
    assert d[0, 1] < 0  # continues downward
    # exiting glass beyond the critical angle -> TIR (mirror)
    v_exit = jnp.array([[np.sin(1.2), np.cos(1.2), 0.0]], dtype=jnp.float32)  # 68.8° > 41.8°
    d2, _ = bsdf.transmission_sample(v_exit, n, ior)
    r2 = bsdf.reflect(v_exit, -n)
    np.testing.assert_allclose(d2, r2, atol=1e-6)


def test_light_solid_angle_and_pdf():
    center = jnp.array([[0.0, 0.0, 10.0]])
    radius = jnp.array([1.0])
    pos = jnp.zeros((1, 3))
    omega = lights.solid_angle(center, radius, pos)
    expected = 2 * np.pi * (1 - np.sqrt(1 - 0.01))
    np.testing.assert_allclose(omega, expected, rtol=1e-4)
    np.testing.assert_allclose(lights.pdf(center, radius, pos), 1 / expected, rtol=1e-4)
    # inside the sphere -> 4π
    omega_in = lights.solid_angle(center, jnp.array([20.0]), pos)
    np.testing.assert_allclose(omega_in, 4 * np.pi, rtol=1e-6)


def test_light_sample_hits_sphere_cone():
    key = jax.random.split(KEY, 3)
    n = 50_000
    center = jnp.tile(jnp.array([0.0, 0.0, 10.0]), (n, 1))
    radius = jnp.full((n,), 1.0)
    pos = jnp.zeros((n, 3))
    d, pdf = lights.sample(_u(key[0], n), _u(key[1], n), _u(key[2], n), center, radius, pos)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    # every sampled direction lies within the cone toward the sphere
    cos_to_center = d @ np.array([0, 0, 1.0])
    cos_cone = np.sqrt(1 - (1.0 / 10.0) ** 2)
    assert np.all(cos_to_center >= cos_cone - 1e-4)
    np.testing.assert_allclose(pdf, 1.0 / (2 * np.pi * (1 - cos_cone)), rtol=1e-4)


def test_solid_angle_far_grazing_jvp_finite():
    """Ω must stay strictly positive (and its jvp finite) at far-grazing
    distances: the naive 1 - sqrt(1 - x²) rounds to EXACTLY 0 in f32 for
    x < ~2e-4 (a grazing plane hit thousands of units out still NEE-samples
    the light), making pdf = 1/Ω infinite — finite primal (the MIS weight
    divides by it) but a 0·inf = NaN tangent that poisoned interior
    gradients in EVERY engine (found round 4 via a config-5-class inverse
    run). The cancellation-free x²/(1 + sqrt(1 - x²)) form fixes it."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kajo_tpu.ops import lights

    radius = jnp.float32(0.3)
    pos = jnp.array([3750.0, 0.0, 0.0], jnp.float32)

    def f(center):
        return lights.pdf(center, radius, pos)

    c0 = jnp.zeros((3,), jnp.float32)
    pdf, dpdf = jax.jvp(f, (c0,), (jnp.ones((3,), jnp.float32),))
    assert np.isfinite(float(pdf)), pdf  # Ω > 0 -> finite pdf
    assert np.isfinite(float(dpdf)), dpdf
    # zero-tangent jvp is the exact failure mode that was NaN
    _, dz = jax.jvp(f, (c0,), (jnp.zeros((3,), jnp.float32),))
    assert float(dz) == 0.0, dz
    # and the value still matches the small-angle limit pi * x^2 / ... well
    x = float(radius / 3750.0)
    assert abs(float(1.0 / pdf) - np.pi * x * x) / (np.pi * x * x) < 1e-3
