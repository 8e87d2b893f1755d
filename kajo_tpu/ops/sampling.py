"""Stochastic samplers with explicit pdfs.

TPU-native replacement for the reference's stateful RNG + samplers
(spec /root/reference/renderer/cpu/Random.cpp): instead of a sequential SSE2
shuffle-add generator, we draw counter-based uniforms (jax.random) shaped per
ray-lane, and every sampler returns ``(value, pdf)`` — keeping the reference's
``RandomValue`` convention (cpu/Random.h:17-37), which is exactly the right
functional interface for MIS.

All functions are elementwise over leading batch dims; ``u*`` arguments are
uniforms in [0, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PI = jnp.float32(jnp.pi)
INV_PI = jnp.float32(1.0 / jnp.pi)


def safe_sqrt(x):
    """sqrt with a zero gradient at x <= 0 (double-where NaN-grad guard)."""
    m = x > 0
    return jnp.where(m, jnp.sqrt(jnp.where(m, x, 1.0)), 0.0)


def safe_pow(x, n):
    """x**n for x >= 0 with powf semantics (0**0 = 1) and NaN-free gradients
    at x = 0 (the masked-branch 0*NaN guard)."""
    m = x > 0
    xs = jnp.where(m, x, 1.0)
    return jnp.where(m, jnp.power(xs, n), jnp.where(n == 0, 1.0, 0.0))


def safe_normalize(v, axis=-1):
    """Normalize, returning 0 for zero vectors, with NaN-free gradients."""
    n2 = jnp.sum(v * v, axis=axis, keepdims=True)
    m = n2 > 0
    return jnp.where(m, v * jax.lax.rsqrt(jnp.where(m, n2, 1.0)), 0.0)



def cosine_hemisphere(u1, u2):
    """Cosine-weighted hemisphere in local (t, b, n) coords; pdf = cosθ/π.

    Spec: cpu/Random.cpp:77-88."""
    r = jnp.sqrt(u1)
    phi = u2 * 2.0 * PI
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    d = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    return d, z * INV_PI


def phong_lobe(u1, u2, exponent):
    """Phong lobe about local +z; pdf = (n+1)/(2π) cosⁿa.

    Spec: cpu/Random.cpp:90-102, with acos/cos cancelled out analytically:
    sin a = sqrt(1 - cos²a) — same distribution, gradient-stable at the apex
    (arccos' blows up at 1)."""
    cos_a = safe_pow(u1, 1.0 / (exponent + 1.0))
    phi = 2.0 * PI * u2
    sin_a = safe_sqrt(1.0 - cos_a * cos_a)
    d = jnp.stack([sin_a * jnp.cos(phi), sin_a * jnp.sin(phi), cos_a], axis=-1)
    pdf = (exponent + 1.0) / (2.0 * PI) * safe_pow(cos_a, exponent)
    return d, pdf


def uniform_sphere(u1, u2):
    """Uniform direction on the sphere; pdf = 1/4π (cpu/Random.cpp:55-66)."""
    z = u1 * 2.0 - 1.0
    phi = u2 * 2.0 * PI
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    d = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    return d, jnp.full_like(u1, 1.0 / (4.0 * PI))


def uniform_hemisphere(u1, u2, normal):
    """Uniform hemisphere about ``normal``; pdf = 1/2π (cpu/Random.cpp:68-75)."""
    d, _ = uniform_sphere(u1, u2)
    flip = jnp.sum(d * normal, axis=-1, keepdims=True) < 0
    d = jnp.where(flip, -d, d)
    return d, jnp.full_like(u1, 1.0 / (2.0 * PI))


def flip_coin(u, probability):
    """Returns (took_branch, prob_of_drawn_branch) (cpu/Random.cpp:111-117).

    The reference takes the branch when ``p > 0 and r <= p``."""
    took = (probability > 0) & (u <= probability)
    return took, jnp.where(took, probability, 1.0 - probability)


def russian_roulette(u, reflectance):
    """Continue w.p. max RGB of ``reflectance`` [..., 4] (cpu/Random.cpp:104-109)."""
    p = jnp.max(reflectance[..., :3], axis=-1)
    return flip_coin(u, p)


def local_to_world(d_local, tangent, binormal, normal):
    """Rotate local (t,b,n) sample into the world frame (cpu/BSDF.cpp:23-26)."""
    return (
        tangent * d_local[..., 0:1]
        + binormal * d_local[..., 1:2]
        + normal * d_local[..., 2:3]
    )


def uniforms(key: jax.Array, shape, n: int):
    """Draw ``n`` independent uniform fields of ``shape`` as a tuple."""
    u = jax.random.uniform(key, (n,) + tuple(shape), dtype=jnp.float32)
    return tuple(u[i] for i in range(n))
