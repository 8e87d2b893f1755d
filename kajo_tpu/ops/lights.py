"""Spherical emitters: solid-angle sampling, evaluation, pdfs.

Spec: /root/reference/renderer/cpu/Light.cpp. Lights are emissive spheres;
emission is direction-independent and not distance-attenuated (the solid-angle
pdf accounts for geometry, Light.cpp:53-56). The pdf is also
direction-independent: 1/Ω where Ω is the cone subtended by the sphere
(Light.cpp:58-62) — this makes the MIS "light pdf along a BSDF ray" a simple
per-hit-object lookup.
"""

from __future__ import annotations

import jax.numpy as jnp

from .sampling import PI, safe_normalize, safe_sqrt


def solid_angle(center, radius, position):
    """Ω subtended by the sphere from ``position`` (Light.cpp:26-32);
    full 4π when inside. cos(asin(x)) is computed as sqrt(1-x²).

    Gradient safety (jnp.where does not stop inf/NaN * 0 in reverse mode):
    the sqrt argument is kept strictly positive (its derivative is infinite
    when the shading point sits exactly on the light's surface), and the
    distance is sqrt(max(d², ε)) rather than linalg.norm, whose derivative
    is 0/0 when the shading point coincides with the light center (e.g. the
    zero-initialized prev_pos of idle wavefront lanes). Masked-out lanes
    would otherwise poison every gradient they touch.

    Cancellation: 1 - sqrt(1 - x²) is computed as x²/(1 + sqrt(1 - x²)).
    The naive form rounds to EXACTLY 0 in f32 for x < ~2e-4 (a far-grazing
    hit thousands of units out still NEE-samples the light), making
    pdf = 1/Ω infinite — the primal stays finite (the MIS weight divides by
    it) but its jvp is 0·∞ = NaN, poisoning interior gradients in every
    engine (found via a config-5-class inverse run, round 4). The stable
    form is algebraically identical, strictly positive for x > 0, and more
    accurate than the reference's own float math at grazing angles."""
    d2 = jnp.sum((center - position) ** 2, axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
    x = jnp.clip(radius / dist, 0.0, 1.0)
    c = jnp.sqrt(jnp.maximum(1.0 - x * x, 1e-12))
    omega = 2.0 * PI * (x * x) / (1.0 + c)
    return jnp.where(dist < radius, 4.0 * PI, omega)


def sample(u1, u2, u3, center, radius, position):
    """Direction toward a point on the sphere + pdf = 1/Ω.

    Disk-based construction from "Lightcuts" as in Light.cpp:34-51:
    (x, y) on a disk of the sphere's radius, z picked on the chord through
    it with a signed sine — *not* exactly uniform-in-solid-angle, but the
    estimator divides by the solid-angle pdf exactly as the reference does."""
    x = radius * jnp.sqrt(u1) * jnp.cos(2.0 * PI * u2)
    y = radius * jnp.sqrt(u1) * jnp.sin(2.0 * PI * u2)
    z = safe_sqrt(radius * radius - x * x - y * y) * jnp.sin(PI * (u3 - 0.5))
    offset = jnp.stack([x, y, z], axis=-1)
    d = safe_normalize(center + offset - position)
    pdf = 1.0 / solid_angle(center, radius, position)
    return d, pdf


def pdf(center, radius, position):
    """Density assigned to *any* direction: 1/Ω (Light.cpp:58-62)."""
    return 1.0 / solid_angle(center, radius, position)
