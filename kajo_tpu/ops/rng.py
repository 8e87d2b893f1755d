"""Counter-based per-lane RNG (PCG4D hash).

The reference uses a sequential SSE2 shuffle-add generator per thread
(cpu/Random.cpp:27-53) and a sin-hash in GLSL (gl/Random.cpp:13-18). Neither
shape fits SPMD lanes with independent lifetimes: the TPU-native design needs
a *stateless* generator addressed by (lane, sample, bounce, dim) so that lane
regeneration — a lane starting its next sample while neighbours are mid-path —
stays deterministic and order-independent under any sharding.

jax.random (threefry) provides that too but costs ~10x more VPU ops per word;
for the per-bounce inner loop we use the PCG4D mixing function (Jarzynski &
Olano, "Hash Functions for GPU Rendering", JCGT 2020 — the standard wavefront
path-tracer choice), which passes their statistical batteries and is a handful
of u32 ops. The top-level pass seed still comes from jax.random keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_U32 = jnp.uint32
_INV24 = jnp.float32(1.0 / (1 << 24))


def pcg4d(a, b, c, d):
    """PCG4D: four u32 counters -> four well-mixed u32 words (elementwise)."""
    x = a.astype(_U32) * _U32(1664525) + _U32(1013904223)
    y = b.astype(_U32) * _U32(1664525) + _U32(1013904223)
    z = c.astype(_U32) * _U32(1664525) + _U32(1013904223)
    w = d.astype(_U32) * _U32(1664525) + _U32(1013904223)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def _to_unit_float(u):
    """Top 24 bits -> float32 in [0, 1)."""
    return (u >> 8).astype(jnp.float32) * _INV24


def uniforms4(lane, sample, salt, seed):
    """Four independent U[0,1) fields from integer counters (any broadcastable
    shapes). ``salt`` disambiguates (bounce, purpose); ``seed`` is the pass seed."""
    a, b, c, d = pcg4d(lane, sample, salt, seed)
    return _to_unit_float(a), _to_unit_float(b), _to_unit_float(c), _to_unit_float(d)


def seed_from_key(key: jax.Array) -> jax.Array:
    """Collapse a jax.random key into a u32 pass seed."""
    data = jax.random.key_data(key).astype(_U32)
    return data.reshape(-1)[0] ^ (data.reshape(-1)[-1] << 1)
