"""Pallas streaming nearest-sphere trace for big scenes.

The reference's intersection layer is an O(objects) linear scan per ray
(/root/reference/renderer/cpu/Raytracer.cpp:100-106); its GL backend even
unrolls one intersector per object into the shader, capping scene size by
shader length (gl/Raytracer.cpp:92-104). The TPU answer for the 100k-sphere
scaling config: keep the rays resident in VMEM and *stream* sphere blocks
through the kernel — a (ray-tile x sphere-block) grid where the sphere-block
axis is the minor (sequential) dimension, so Pallas double-buffers the
HBM->SMEM sphere DMA behind compute and the running nearest-hit accumulates
in the revisited output block. This replaces the XLA-chunked path's
[N,3]x[3,C] matmuls (contraction depth 3 — MXU square-filling wasted, HBM
round-trips per block) with one fused VPU loop.

Two sphere layouts share the kernel structure:
  * rigid    — [S, 4]  (cx, cy, cz, r^2): world-space quadratic, a == 1
    (valid because rigid transforms are isometries with det +1, see
    ops/geometry.py `_intersect_spheres_rigid`);
  * general  — [S, 14] (inv3 row-major 9, invt 3, r^2, det): the reference's
    object-space formulation with determinant-scaled hit distance
    (Raytracer.cpp:21-51,70) — lifts the big-scene path's rigid-only
    restriction.

Differentiability: `pallas_call` has no autodiff rule, so `nearest_sphere`
wraps the kernel in a `custom_vjp` whose backward recomputes the winning
sphere's hit analytically (a gather + `jax.vjp` of the scalar quadratic per
ray + segment-sum scatter) — O(N) instead of O(N*S), and exactly what XLA's
gather-of-argmin backward computes on the dense path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megakernel import BIG, safe_sqrt

RAY_ROWS = 32          # rays per tile: RAY_ROWS x 128
# smaller blocks = tighter AABBs = fewer genuinely-intersected spheres per
# ray tile; 128 measured ~10% faster than 512 at 100k spheres (grid-step
# overhead is small next to visited-block compute)
SPH_BLOCK_RIGID = 128   # spheres per streamed SMEM block (2 KB)
SPH_BLOCK_GENERAL = 128  # 7 KB
_F_RIGID = 4
_F_GENERAL = 14


def _quadratic_rigid(cx, cy, cz, r2, o, d, d_dot_o, o2):
    """World-space stable quadratic with a == 1 (|d| == 1). Returns (t, valid)."""
    d_dot_c = d[0] * cx + d[1] * cy + d[2] * cz
    o_dot_c = o[0] * cx + o[1] * cy + o[2] * cz
    b = 2.0 * (d_dot_o - d_dot_c)
    cq = o2 - 2.0 * o_dot_c + (cx * cx + cy * cy + cz * cz - r2)
    discr = b * b - 4.0 * cq
    sq = safe_sqrt(discr)
    q = jnp.where(b < 0, (-b - sq) * 0.5, (-b + sq) * 0.5)
    t1 = cq / jnp.where(q == 0, 1.0, q)
    lo = jnp.minimum(q, t1)
    hi = jnp.maximum(q, t1)
    t = jnp.where(lo < 0, hi, lo)
    valid = (discr >= 0) & (hi >= 0) & (q != 0) & (t >= 0)
    return t, valid


def _quadratic_general(rec, o, d):
    """Object-space stable quadratic (Raytracer.cpp:21-51) with det-scaled t.

    ``rec``: 14 per-sphere scalars (inv3, invt, r2, det); o/d broadcast."""
    ox = rec[0] * o[0] + rec[1] * o[1] + rec[2] * o[2] + rec[9]
    oy = rec[3] * o[0] + rec[4] * o[1] + rec[5] * o[2] + rec[10]
    oz = rec[6] * o[0] + rec[7] * o[1] + rec[8] * o[2] + rec[11]
    dx = rec[0] * d[0] + rec[1] * d[1] + rec[2] * d[2]
    dy = rec[3] * d[0] + rec[4] * d[1] + rec[5] * d[2]
    dz = rec[6] * d[0] + rec[7] * d[1] + rec[8] * d[2]
    r2, det = rec[12], rec[13]
    a = dx * dx + dy * dy + dz * dz
    b = 2.0 * (dx * ox + dy * oy + dz * oz)
    cq = ox * ox + oy * oy + oz * oz - r2
    discr = b * b - 4.0 * a * cq
    sq = safe_sqrt(discr)
    q = jnp.where(b < 0, (-b - sq) * 0.5, (-b + sq) * 0.5)
    t0 = q / jnp.where(a == 0, 1.0, a)
    t1 = cq / jnp.where(q == 0, 1.0, q)
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    t_loc = jnp.where(lo < 0, hi, lo)
    t = t_loc * det
    valid = (discr >= 0) & (hi >= 0) & (a != 0) & (q != 0) & (t >= 0)
    return t, valid


def _build_kernel(rigid: bool, block: int, fields: int):
    def kernel(ray_ref, sph_ref, box_ref, t_ref, idx_ref):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            # per-ray search bound (row 6): hits beyond it can be discarded
            # (e.g. a shadow query only cares about occluders nearer than
            # the light) — seeding t_best with it also tightens the block
            # culling for free
            t_ref[...] = ray_ref[6]
            idx_ref[...] = jnp.full_like(idx_ref, -1)

        o = (ray_ref[0], ray_ref[1], ray_ref[2])
        d = (ray_ref[3], ray_ref[4], ray_ref[5])
        t_best = t_ref[...]
        idx_best = idx_ref[...]
        base = s * block

        # ---- block culling: spheres are Morton-ordered, so each streamed
        # block has a tight AABB; if no ray in this tile can hit the box
        # closer than its current nearest, skip the whole sphere loop.
        # Conservative (the AABB is slightly inflated at build time), so the
        # result is exactly the full linear scan's.
        lo = (box_ref[0, 0, 0], box_ref[0, 0, 1], box_ref[0, 0, 2])
        hi = (box_ref[0, 0, 3], box_ref[0, 0, 4], box_ref[0, 0, 5])
        t_enter = jnp.zeros_like(t_best)
        t_exit = jnp.full_like(t_best, BIG)
        for ax in range(3):
            # BIG (not inf) keeps 0 * inv == 0 when the origin sits on a face
            inv = jnp.where(d[ax] == 0, BIG, 1.0 / jnp.where(d[ax] == 0, 1.0, d[ax]))
            inside = (o[ax] >= lo[ax]) & (o[ax] <= hi[ax])
            t0 = (lo[ax] - o[ax]) * inv
            t1 = (hi[ax] - o[ax]) * inv
            near = jnp.minimum(t0, t1)
            far = jnp.maximum(t0, t1)
            near = jnp.where(d[ax] == 0, jnp.where(inside, -BIG, BIG), near)
            far = jnp.where(d[ax] == 0, jnp.where(inside, BIG, -BIG), far)
            t_enter = jnp.maximum(t_enter, near)
            t_exit = jnp.minimum(t_exit, far)
        may_hit = (t_exit >= t_enter) & (t_enter < t_best)
        any_hit = jnp.any(may_hit)

        if rigid:
            d_dot_o = d[0] * o[0] + d[1] * o[1] + d[2] * o[2]
            o2 = o[0] * o[0] + o[1] * o[1] + o[2] * o[2]

            def body(i, carry):
                t_best, idx_best = carry
                cx = sph_ref[i, 0]
                cy = sph_ref[i, 1]
                cz = sph_ref[i, 2]
                r2 = sph_ref[i, 3]
                t, valid = _quadratic_rigid(cx, cy, cz, r2, o, d, d_dot_o, o2)
                win = valid & (t < t_best)
                return jnp.where(win, t, t_best), jnp.where(win, base + i, idx_best)

        else:

            def body(i, carry):
                t_best, idx_best = carry
                rec = [sph_ref[i, f] for f in range(fields)]
                t, valid = _quadratic_general(rec, o, d)
                win = valid & (t < t_best)
                return jnp.where(win, t, t_best), jnp.where(win, base + i, idx_best)

        t_best, idx_best = jax.lax.cond(
            any_hit,
            lambda carry: jax.lax.fori_loop(0, block, body, carry),
            lambda carry: carry,
            (t_best, idx_best),
        )
        t_ref[...] = t_best
        idx_ref[...] = idx_best

    return kernel


# ---------------------------------------------------------- Morton ordering
def _expand_bits10(v):
    """Spread the low 10 bits of each u32 lane two positions apart (the
    standard LBVH morton3D bit-dilation)."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton_order(centers):
    """Permutation sorting sphere centers along a 3D Morton curve."""
    lo = jnp.min(centers, axis=0)
    hi = jnp.max(centers, axis=0)
    q = (centers - lo) / jnp.maximum(hi - lo, 1e-20)
    q = jnp.clip(q * 1023.0, 0.0, 1023.0).astype(jnp.uint32)
    code = (
        (_expand_bits10(q[:, 0]) << 2)
        | (_expand_bits10(q[:, 1]) << 1)
        | _expand_bits10(q[:, 2])
    )
    return jnp.argsort(code)


def _round_up(n, m):
    return -(-n // m) * m


def ray_sort_perm(o, d, lo, hi):
    """Permutation grouping rays by (origin Morton cell, direction octant).

    The kernel's block culling is per ray *tile*: a sphere block is skipped
    only if NO ray in the 32x128 tile can hit it. Camera rays are coherent
    (lanes are pixel-ordered) and cull well, but bounce and NEE rays are
    spatially scattered across lanes, so their tiles touch nearly every
    block. Sorting rays by a 24-bit key — 7 Morton bits per origin axis
    (quantized to the scene bounds) then 3 direction-sign bits — makes each
    tile's rays share a ~1-cell origin neighbourhood and a direction octant,
    restoring the cull for secondary rays. A pure permutation: the unsorted
    result is bit-identical (each ray's answer is independent)."""
    q = (jnp.clip(o, lo, hi) - lo) / jnp.maximum(hi - lo, 1e-20)
    q = jnp.clip(q * 127.0, 0.0, 127.0).astype(jnp.uint32)
    code = (
        (_expand_bits10(q[:, 0]) << 2)
        | (_expand_bits10(q[:, 1]) << 1)
        | _expand_bits10(q[:, 2])
    )
    octant = (
        (d[:, 0] < 0).astype(jnp.uint32) * 4
        + (d[:, 1] < 0).astype(jnp.uint32) * 2
        + (d[:, 2] < 0).astype(jnp.uint32)
    )
    return jnp.argsort((code << 3) | octant)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _nearest(rigid: bool, o, d, t_max, packed, boxes):
    """(t_world [N], sphere_idx [N]) nearest hit; idx -1 / t BIG on miss.

    ``o``/``d`` are [N, 3] with N a multiple of RAY_ROWS*128; ``packed`` is
    [S_pad, F] with S_pad a multiple of the block size (padding rows must be
    unhittable: r2 < 0); ``boxes`` is [S_pad/block, 8] per-block AABBs
    (lo3, hi3, pad2) used only for conservative culling."""
    return _nearest_fwd_impl(rigid, o, d, t_max, packed, boxes)


def _nearest_fwd_impl(rigid, o, d, t_max, packed, boxes):
    n = o.shape[0]
    block = SPH_BLOCK_RIGID if rigid else SPH_BLOCK_GENERAL
    fields = _F_RIGID if rigid else _F_GENERAL
    s_pad = packed.shape[0]
    assert n % (RAY_ROWS * 128) == 0 and s_pad % block == 0
    rows = n // 128
    n_ray_tiles = rows // RAY_ROWS
    n_sph_blocks = s_pad // block

    rays = jnp.concatenate([o.T, d.T, t_max[None, :]], axis=0).reshape(7, rows, 128)
    kernel = _build_kernel(rigid, block, fields)
    t, idx = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        ),
        grid=(n_ray_tiles, n_sph_blocks),
        in_specs=[
            pl.BlockSpec((7, RAY_ROWS, 128), lambda r, s: (0, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, fields), lambda r, s: (s, 0), memory_space=pltpu.SMEM),
            # (1, 1, 8): Mosaic requires the last two block dims to divide
            # (8, 128) or equal the array dims; the singleton middle dim
            # satisfies that for an 8-float record
            pl.BlockSpec((1, 1, 8), lambda r, s: (s, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((RAY_ROWS, 128), lambda r, s: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_ROWS, 128), lambda r, s: (r, 0), memory_space=pltpu.VMEM),
        ),
    )(rays, packed, boxes)
    return t.reshape(n), idx.reshape(n)


def _t_recompute(rigid, rec, o, d):
    """Winning-sphere t as a differentiable function of the gathered record."""
    if rigid:
        ot = (o[:, 0], o[:, 1], o[:, 2])
        dt = (d[:, 0], d[:, 1], d[:, 2])
        d_dot_o = jnp.sum(d * o, -1)
        o2 = jnp.sum(o * o, -1)
        t, _ = _quadratic_rigid(
            rec[:, 0], rec[:, 1], rec[:, 2], rec[:, 3], ot, dt, d_dot_o, o2
        )
        return t
    t, _ = _quadratic_general(
        [rec[:, f] for f in range(_F_GENERAL)], (o[:, 0], o[:, 1], o[:, 2]),
        (d[:, 0], d[:, 1], d[:, 2]),
    )
    return t


def _nearest_fwd(rigid, o, d, t_max, packed, boxes):
    t, idx = _nearest_fwd_impl(rigid, o, d, t_max, packed, boxes)
    return (t, idx), (o, d, packed, boxes, t, idx)


def _nearest_bwd(rigid, res, cots):
    o, d, packed, boxes, t, idx = res
    gt = cots[0]
    hit = idx >= 0
    safe = jnp.maximum(idx, 0)
    rec = packed[safe]
    _, vjp = jax.vjp(lambda r_, o_, d_: _t_recompute(rigid, r_, o_, d_), rec, o, d)
    g = jnp.where(hit, gt, 0.0)
    grec, go, gd = vjp(g)
    gpacked = jax.ops.segment_sum(
        jnp.where(hit[:, None], grec, 0.0), safe, num_segments=packed.shape[0]
    )
    # boxes/t_max only gate the search (piecewise constant): zero gradient
    return go, gd, jnp.zeros((o.shape[0],), jnp.float32), gpacked, jnp.zeros_like(boxes)


_nearest.defvjp(_nearest_fwd, _nearest_bwd)


def build_stream_scene(prep):
    """Morton-sorted packed spheres + per-block AABBs for the stream kernel.

    Returns (packed [S_pad, F], boxes [S_pad/block, 8], perm [S]). Sorting
    along the Morton curve makes streamed blocks spatially tight, so the
    kernel's per-block AABB test skips most blocks for coherent ray tiles —
    the TPU translation of an acceleration structure: no per-lane gathers,
    just block-granular early-out, and exactness is preserved because the
    cull is conservative."""
    rigid = prep.rigid
    s = prep.sphere_center.shape[0]
    perm = morton_order(prep.sphere_center)
    radius = safe_sqrt(jnp.maximum(prep.sphere_radius2, 0.0))
    if rigid:
        packed = jnp.concatenate(
            [prep.sphere_center, prep.sphere_radius2[:, None]], axis=1
        )[perm]
        block = SPH_BLOCK_RIGID
        # world extent of a rigid sphere: radius in every axis
        ext = jnp.broadcast_to(radius[perm][:, None], (s, 3))
    else:
        packed = jnp.concatenate(
            [
                prep.sphere_inv3.reshape(s, 9),
                prep.sphere_invt,
                prep.sphere_radius2[:, None],
                prep.sphere_det[:, None],
            ],
            axis=1,
        )[perm]
        block = SPH_BLOCK_GENERAL
        # world AABB of the transformed unit sphere x = c + M u, |u| = r:
        # extent along world axis a is r * |row_a(M)|
        row_norm = jnp.sqrt(jnp.sum(prep.sphere_fwd3 * prep.sphere_fwd3, axis=2))
        ext = (radius[:, None] * row_norm)[perm]

    centers = prep.sphere_center[perm]
    s_pad = _round_up(max(s, 1), block)
    pad = s_pad - s
    pad_row = jnp.zeros((pad, packed.shape[1]), jnp.float32)
    pad_row = pad_row.at[:, -1 if rigid else -2].set(-1.0)  # r2 = -1: unhittable
    packed = jnp.concatenate([packed, pad_row], axis=0)
    # padding spheres reuse the last real center so they never widen a box
    last_c = centers[-1] if s else jnp.zeros((3,), jnp.float32)
    centers = jnp.concatenate([centers, jnp.broadcast_to(last_c, (pad, 3))], axis=0)
    ext = jnp.concatenate([ext, jnp.zeros((pad, 3), jnp.float32)], axis=0)

    n_blocks = s_pad // block
    c_b = centers.reshape(n_blocks, block, 3)
    e_b = ext.reshape(n_blocks, block, 3)
    lo = jnp.min(c_b - e_b, axis=1)
    hi = jnp.max(c_b + e_b, axis=1)
    # conservative inflation: f32 slab-test rounding must never cull a true hit
    slack = 1e-4 * (jnp.max(hi) - jnp.min(lo) + 1.0)
    boxes = jnp.concatenate(
        [lo - slack, hi + slack, jnp.zeros((n_blocks, 2), jnp.float32)], axis=1
    )[:, None, :]
    return packed, boxes, perm


def nearest_sphere(prep, o, d, t_max=None):
    """Streamed nearest-sphere hit for a PreparedScene (rigid or general).

    Returns (t_world [N] with inf on miss, sphere_idx [N] with -1 on miss,
    original object indexing). Pads rays to whole kernel tiles; uses the
    prepared scene's cached Morton packing when present."""
    n = o.shape[0]
    rigid = prep.rigid
    cached = getattr(prep, "stream_packed", None)
    if cached is not None:
        packed, boxes, perm = prep.stream_packed, prep.stream_boxes, prep.stream_perm
    else:
        packed, boxes, perm = build_stream_scene(prep)

    lane_tile = RAY_ROWS * 128
    n_pad = _round_up(max(n, 1), lane_tile)
    o_p = jnp.pad(o, ((0, n_pad - n), (0, 0)))
    # padding rays get direction 0 -> rigid: q==0 invalid; general: a==0 invalid
    d_p = jnp.pad(d, ((0, n_pad - n), (0, 0)))
    if t_max is None:
        tm = jnp.full((n_pad,), BIG, jnp.float32)
    else:
        tm = jnp.pad(jnp.minimum(t_max, BIG).astype(jnp.float32), (0, n_pad - n))

    t, idx = _nearest(rigid, o_p, d_p, tm, packed, boxes)
    t = t[:n]
    idx = idx[:n]
    # map Morton-sorted winner back to the scene's sphere numbering
    idx_orig = jnp.where(idx >= 0, perm[jnp.maximum(idx, 0)].astype(jnp.int32), -1)
    return jnp.where(idx >= 0, t, jnp.float32(jnp.inf)), idx_orig
