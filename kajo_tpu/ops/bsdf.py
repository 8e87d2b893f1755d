"""The four BSDFs as pure, batched functions.

Spec: /root/reference/renderer/cpu/BSDF.cpp. Each BSDF exposes:

  * ``*_sample(...) -> (direction, pdf)`` — importance-sampled direction;
  * ``*_eval_cos(...) -> f(dir) * max(0, n·dir)`` — the BRDF value already
    multiplied by the clamped cosine (this product is what every estimator
    term uses, and it is numerically safe for the delta BSDFs whose raw ``f``
    contains a 1/cos that cancels);
  * ``*_pdf(...)`` — density of ``*_sample`` in a given direction (0 for the
    delta BSDFs, matching cpu/BSDF.cpp:93-96,133-136; the reference's raw
    Lambert pdf can go negative below the horizon and is only used behind a
    ``pdf != 0`` gate, which we replicate).

Conventions: ``view`` is the incident ray direction (pointing *into* the
surface, as stored in SurfacePoint.view), normals are unit, colors vec4.
All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

from .sampling import (PI, INV_PI, cosine_hemisphere, local_to_world, phong_lobe,
                       safe_normalize, safe_pow, safe_sqrt)


def reflect(v, n):
    """GLM reflect: v - 2 dot(n, v) n."""
    return v - 2.0 * jnp.sum(n * v, axis=-1, keepdims=True) * n


def refract_or_reflect(view, normal, eta_ratio):
    """IdealTransmission direction (cpu/BSDF.cpp:106-125).

    ``normal`` faces the incoming side; falls back to mirror reflection on
    total internal reflection. ``eta_ratio`` = n_incident / n_transmitted."""
    cos_i = jnp.sum(view * normal, axis=-1, keepdims=True)
    k = 1.0 - eta_ratio * eta_ratio * (1.0 - cos_i * cos_i)
    tir = k < 0
    refracted = eta_ratio * view - (eta_ratio * cos_i + safe_sqrt(k)) * normal
    return jnp.where(tir, reflect(view, normal), refracted)


# ---------------------------------------------------------------- Lambert

def lambert_sample(u1, u2, tangent, binormal, normal):
    d_local, pdf = cosine_hemisphere(u1, u2)
    return local_to_world(d_local, tangent, binormal, normal), pdf


def lambert_eval_cos(diffuse, normal, direction):
    cos = jnp.maximum(0.0, jnp.sum(normal * direction, axis=-1, keepdims=True))
    return diffuse * INV_PI * cos


def lambert_pdf(normal, direction):
    """cosθ/π, unclamped like the reference (cpu/BSDF.cpp:35-39)."""
    return INV_PI * jnp.sum(normal * direction, axis=-1)


# ------------------------------------------------------------------ Phong

def _phong_frame(view, normal):
    """Frame about the reflection vector, built from ẑ (cpu/BSDF.cpp:52-58).

    The reference NaNs when the reflection is parallel to ẑ (measure zero);
    we fall back to building from ŷ."""
    r = reflect(view, normal)
    z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], r.dtype), r.shape)
    u = jnp.cross(z, r)
    degenerate = jnp.sum(u * u, axis=-1, keepdims=True) < 1e-12
    alt = jnp.cross(jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], r.dtype), r.shape), r)
    u = safe_normalize(jnp.where(degenerate, alt, u))
    v = jnp.cross(u, r)
    return r, u, v


def phong_sample(u1, u2, view, normal, exponent):
    r, u, v = _phong_frame(view, normal)
    d_local, pdf = phong_lobe(u1, u2, exponent)
    d = u * d_local[..., 0:1] + v * d_local[..., 1:2] + r * d_local[..., 2:3]
    return d, pdf


def phong_eval_cos(specular, view, normal, direction, exponent):
    r = reflect(view, normal)
    cos_a = jnp.maximum(0.0, jnp.sum(r * direction, axis=-1, keepdims=True))
    lobe = (exponent[..., None] + 1.0) / (2.0 * PI) * safe_pow(cos_a, exponent[..., None])
    cos = jnp.maximum(0.0, jnp.sum(normal * direction, axis=-1, keepdims=True))
    return specular * lobe * cos


def phong_pdf(view, normal, direction, exponent):
    r = reflect(view, normal)
    cos_a = jnp.maximum(0.0, jnp.sum(r * direction, axis=-1))
    return (exponent + 1.0) / (2.0 * PI) * safe_pow(cos_a, exponent)


# --------------------------------------------------------- Ideal reflector

def reflector_sample(view, normal):
    """Delta mirror: direction with discrete prob 1 (cpu/BSDF.cpp:82-85)."""
    d = reflect(view, normal)
    return d, jnp.ones(d.shape[:-1], d.dtype)


def reflector_eval_cos(specular, normal, direction):
    """f·cos = specular when n·dir > 0, else 0 (the raw f = spec/cosθ)."""
    front = jnp.sum(normal * direction, axis=-1, keepdims=True) > 0
    return jnp.where(front, specular, 0.0)


# ------------------------------------------------------ Ideal transmission

def transmission_sample(view, normal, refractive_index):
    """Delta refraction with entering/exiting eta and TIR fallback
    (cpu/BSDF.cpp:106-125). Returns (direction, prob=1)."""
    cos_a = jnp.sum(view * normal, axis=-1, keepdims=True)
    entering = cos_a < 0
    n_eff = jnp.where(entering, normal, -normal)
    ior = refractive_index[..., None]
    eta = jnp.where(entering, 1.0 / ior, ior)
    d = refract_or_reflect(view, n_eff, eta)
    return d, jnp.ones(view.shape[:-1], view.dtype)


def transmission_eval_abscos(color, normal, direction):
    """f·|cos| = color (the raw f = color/|cosθ| — exact cancellation,
    cpu/BSDF.cpp:127-131 multiplied by |n·ω| at Shader.cpp:148-149)."""
    return jnp.broadcast_to(color, direction.shape[:-1] + (color.shape[-1],))
