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
# Visit sphere blocks near-to-far from each ray tile (per-tile order fed to
# the kernel via scalar prefetch). With t_best seeded (plane hit / shadow
# t_max) and rays sorted (ray_sort_perm), the conservative `t_enter < t_best`
# block cull then acts as an occlusion early-out: once a tile has found its
# nearest hits, every farther block is skipped — BVH-like behavior at block
# granularity with zero per-lane gathers. Pure visitation order: the result
# is unchanged (strict `t < t_best` keeps the nearest hit regardless).
# Measured on the real TPU: OFF wins for this kernel — the stream is
# SMEM-DMA-bandwidth-bound (~0.9 GB/s effective; culled-everything floor
# 24.7 ms/trace at 100k spheres), so scattering the 2 KB block reads costs
# more than the extra culling saves. Kept for A/B runs and for the
# reachability-compaction machinery it shares with the V2 VMEM kernel.
NEAR_FAR_ORDER: bool = False
# smaller blocks = tighter AABBs = fewer genuinely-intersected spheres per
# ray tile; 128 measured ~10% faster than 512 at 100k spheres (grid-step
# overhead is small next to visited-block compute)
SPH_BLOCK_RIGID = 128   # spheres per streamed SMEM block (2 KB)
SPH_BLOCK_GENERAL = 128  # 7 KB
# Physically sort whole Morton blocks near-to-far from the camera at pack
# time (see build_stream_scene). Global visit order, zero per-trace cost,
# sequential DMA. MEASURED (real TPU, 100k spheres, same process, same
# compiled fn, data-only A/B — tools/ftb_ab.py): primaries 0.22 -> 0.19 ms
# (1.19x), scattered 22.9 -> 22.9 ms (1.00x), winners identical. The
# scattered regime is compute-bound on blocks the tile genuinely spans, so
# ordering can't help it; primaries get the occlusion early-out sooner.
FRONT_TO_BACK: bool = True
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


def _slab_test(o, d, lo, hi, t_like):
    """Per-ray AABB slab interval (t_enter, t_exit), the shared cull test of
    the V1/V2/V4 kernels (identical f32 ops in identical order — the
    kernels' bit-exactness equivalence depends on every copy agreeing).
    ``o``/``d`` are per-axis ray component triples, ``lo``/``hi`` per-axis
    box-bound scalars, ``t_like`` a per-ray array setting the shape."""
    t_enter = jnp.zeros_like(t_like)
    t_exit = jnp.full_like(t_like, BIG)
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
    return t_enter, t_exit


def _build_kernel(rigid: bool, block: int, fields: int):
    def kernel(order_ref, ray_ref, sph_ref, box_ref, t_ref, idx_ref):
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
        # sphere indices must name the streamed block's TRUE position in the
        # packed array (the visit order is per-tile, near-to-far)
        base = order_ref[pl.program_id(0), s] * block

        # ---- block culling: spheres are Morton-ordered, so each streamed
        # block has a tight AABB; if no ray in this tile can hit the box
        # closer than its current nearest, skip the whole sphere loop.
        # Conservative (the AABB is slightly inflated at build time), so the
        # result is exactly the full linear scan's.
        lo = (box_ref[0, 0, 0], box_ref[0, 0, 1], box_ref[0, 0, 2])
        hi = (box_ref[0, 0, 3], box_ref[0, 0, 4], box_ref[0, 0, 5])
        t_enter, t_exit = _slab_test(o, d, lo, hi, t_best)
        # box slot 6 = block min det: reported hits are det-scaled, so
        # t_enter * min_det lower-bounds any reported t from this block
        # (rigid scenes store 1.0 — exact multiply, culls unchanged)
        may_hit = (t_exit >= t_enter) & (t_enter * box_ref[0, 0, 6] < t_best)
        any_hit = jnp.any(may_hit)
        # near-to-far orders pad their tail with repeats of the final
        # candidate; a repeated index re-DMAs nothing (Pallas elides the
        # fetch) and is skipped here outright
        fresh = jnp.logical_or(
            s == 0,
            order_ref[pl.program_id(0), s]
            != order_ref[pl.program_id(0), jnp.maximum(s - 1, 0)],
        )

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

        # pl.when (not lax.cond over the carry): a culled step must not pay
        # a 2x[ROWS,128] select/copy — with most blocks culled, that copy was
        # the dominant per-step cost
        @pl.when(any_hit & fresh)
        def _():
            t2, idx2 = jax.lax.fori_loop(0, block, body, (t_ref[...], idx_ref[...]))
            t_ref[...] = t2
            idx_ref[...] = idx2

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
    """Permutation grouping rays by (direction octant, origin Morton cell).

    The kernel's block culling is per ray *tile*: a sphere block is skipped
    only if NO ray in the 32x128 tile can hit it. Camera rays are coherent
    (lanes are pixel-ordered) and cull well, but bounce and NEE rays are
    spatially scattered across lanes, so their tiles touch nearly every
    block. Sorting rays by a 24-bit key — 3 direction-sign bits MAJOR, then
    7 Morton bits per origin axis (quantized to the scene bounds) — makes
    each tile mono-octant with a ~1-cell origin neighbourhood (at most 7
    tiles straddle an octant boundary), so the whole half-scene *behind* a
    tile culls on the slab test and the XLA-side reachability compaction can
    drop it from the stream outright. A pure permutation: the unsorted
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
    return jnp.argsort((octant << 21) | code)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _nearest(rigid: bool, o, d, t_max, packed, boxes):
    """(t_world [N], sphere_idx [N]) nearest hit; idx -1 / t BIG on miss.

    ``o``/``d`` are [N, 3] with N a multiple of RAY_ROWS*128; ``packed`` is
    [S_pad, F] with S_pad a multiple of the block size (padding rows must be
    unhittable: r2 < 0); ``boxes`` is [S_pad/block, 8] per-block records
    (AABB lo3, hi3, min-det, pad) used only for conservative culling —
    min-det rescales slab-test distances to the det-scaled t convention."""
    return _nearest_fwd_impl(rigid, o, d, t_max, packed, boxes)


# Per-tile FRUSTUM cull (default path). The kernel's in-tile slab test skips
# a culled block's *compute*, but Pallas still streams the 2 KB sphere record
# into SMEM every grid step — at the measured ~0.9 GB/s SMEM DMA bandwidth
# that stream IS the floor (~2 ms per tile for a 100k scene). The only way to
# not pay for a block is to never name it: these XLA-side candidate lists
# keep, per ray tile, only the blocks a conservative interval-arithmetic slab
# test says SOME tile ray could hit within its search bound, in ASCENDING
# block order (near-sequential SMEM reads — a measured requirement: near-to-
# far orders scatter the reads and regress ~40%), tail-padded with repeats of
# the last candidate (Pallas elides the repeat DMA; the kernel skips the
# step). With per-iteration wavefront ray reordering the tiles are
# origin-local and mono-octant, so bounce cones and NEE shadow fans (whose
# t_max is the light distance) cull most of the scene. Pure work elision:
# reachability is conservative and the kernel test stays exact, so results
# are bit-identical to the full sequential stream.
#
# MEASURED (real TPU, 100k spheres, one process): +15% on coherent primary
# traces (11.8 vs 13.9 ms), but the XLA-side list construction costs 1.9 ms
# of DISPATCH per trace call on this platform and the cull fraction for
# sorted scattered/bounce tiles is 1.00 (a 4096-ray tile spans too much of
# the scene for its direction box to exclude anything) — full render 72K vs
# 104K samples/s. Default OFF; superseded by the V3 resident-scene kernel,
# which runs the same interval test IN-KERNEL for free. Kept for A/B and
# for the V1 streaming path on scenes too big for V3 residency.
TILE_FRUSTUM: bool = False
# numpy scalar: module import must not touch a jax backend (tests pin the
# platform after import), and weak-typed promotion keeps everything f32
_BIGF = np.float32(3.0e38)


def _interval_div(nl, nh, dl, dh):
    """Interval quotient [nl,nh]/[dl,dh] -> (lo, hi); unbounded if 0 in d."""
    contains0 = (dl <= 0.0) & (dh >= 0.0)
    sdl = jnp.where(contains0, 1.0, dl)
    sdh = jnp.where(contains0, 1.0, dh)
    q1, q2, q3, q4 = nl / sdl, nl / sdh, nh / sdl, nh / sdh
    lo = jnp.minimum(jnp.minimum(q1, q2), jnp.minimum(q3, q4))
    hi = jnp.maximum(jnp.maximum(q1, q2), jnp.maximum(q3, q4))
    return jnp.where(contains0, -_BIGF, lo), jnp.where(contains0, _BIGF, hi)


def _frustum_candidates(o, d, t_max, b2, n_tiles, tile_rays):
    """[T, n_blocks] int32 visit order: ascending reachable block ids, tail
    repeats. A block is reachable if the interval slab test over the tile's
    (origin box x direction box) admits ANY hit time in [0, max t_max)."""
    T = n_tiles
    o_t = o.reshape(T, tile_rays, 3)
    d_t = d.reshape(T, tile_rays, 3)
    live = jnp.any(d_t != 0, axis=-1, keepdims=True)
    has_live = jnp.any(live[:, :, 0], axis=1)
    olo = jnp.min(jnp.where(live, o_t, _BIGF), axis=1)[:, None, :]
    ohi = jnp.max(jnp.where(live, o_t, -_BIGF), axis=1)[:, None, :]
    dlo = jnp.min(jnp.where(live, d_t, _BIGF), axis=1)[:, None, :]
    dhi = jnp.max(jnp.where(live, d_t, -_BIGF), axis=1)[:, None, :]
    tmx = jnp.max(
        jnp.where(live[:, :, 0], t_max.reshape(T, tile_rays), 0.0), axis=1
    )

    blo = b2[None, :, 0:3]
    bhi = b2[None, :, 3:6]
    # per-axis crossing-time intervals over all (o, d) in the tile boxes:
    # t_lo-slab in [blo-ohi, blo-olo]/D, t_hi-slab in [bhi-ohi, bhi-olo]/D
    q1l, q1h = _interval_div(blo - ohi, blo - olo, dlo, dhi)
    q2l, q2h = _interval_div(bhi - ohi, bhi - olo, dlo, dhi)
    # LB(min per ray) = min of LBs; UB(max per ray) = max of UBs
    near_lo = jnp.maximum(jnp.minimum(q1l, q2l), 0.0)
    far_hi = jnp.maximum(q1h, q2h)
    lb_enter = jnp.max(near_lo, axis=-1)   # [T, B]
    ub_exit = jnp.min(far_hi, axis=-1)
    # box slot 6 = block min det (det-scaled-t lower bound, see V1)
    reach = (
        (lb_enter <= ub_exit)
        & (lb_enter * b2[None, :, 6] < tmx[:, None])
        & has_live[:, None]
    )

    n_blocks = b2.shape[0]
    pos = jnp.arange(n_blocks, dtype=jnp.int32)[None, :]
    key = jnp.where(reach, pos.astype(jnp.float32), jnp.float32(np.inf))
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    count = jnp.sum(reach, axis=1).astype(jnp.int32)
    lastc = jnp.take_along_axis(order, jnp.maximum(count - 1, 0)[:, None], axis=1)
    return jnp.where(pos < jnp.maximum(count, 1)[:, None], order, lastc)


def _nearest_fwd_impl(rigid, o, d, t_max, packed, boxes):
    if KERNEL_V2:
        return _nearest_v2_impl(rigid, o, d, t_max, packed, boxes)
    if KERNEL_V4:
        return _nearest_v4_impl(rigid, o, d, t_max, packed, boxes)
    if KERNEL_V3 and packed.size * 4 <= V3_RESIDENT_BYTES:
        return _nearest_v3_impl(rigid, o, d, t_max, packed, boxes)
    n = o.shape[0]
    block = SPH_BLOCK_RIGID if rigid else SPH_BLOCK_GENERAL
    fields = _F_RIGID if rigid else _F_GENERAL
    s_pad = packed.shape[0]
    assert n % (RAY_ROWS * 128) == 0 and s_pad % block == 0
    rows = n // 128
    n_ray_tiles = rows // RAY_ROWS
    n_sph_blocks = s_pad // block

    rays = jnp.concatenate([o.T, d.T, t_max[None, :]], axis=0).reshape(7, rows, 128)

    if TILE_FRUSTUM and n_sph_blocks > 1:
        order = _frustum_candidates(
            o, d, t_max, boxes[:, 0, :], n_ray_tiles, RAY_ROWS * 128
        )
    elif NEAR_FAR_ORDER and n_sph_blocks > 1:
        # Per-tile block visit order: distance from the tile's mean live-ray
        # origin to each block's AABB center (a proxy for slab t_enter —
        # correctness never depends on it). Padding rays (d == 0) are
        # excluded so a part-empty final tile still orders sensibly.
        #
        # On top of the ordering, a conservative per-tile REACHABILITY cull
        # runs here in XLA: live origins lie in the tile box [tlo, thi]; if
        # every live ray moves forward along an axis (all d[ax] >= 0), any
        # block entirely behind tlo[ax] can never be hit at t >= 0 (and
        # symmetrically for all-negative axes). Unreachable blocks sort to
        # the tail and are REPLACED by repeats of the last reachable block:
        # Pallas elides the DMA for an unchanged block index and the kernel
        # skips repeated steps outright, so the effective stream length per
        # tile is its reachable-candidate count — with sorted rays most
        # tiles are mono-octant and drop a large fraction of the scene.
        o_t = o.reshape(n_ray_tiles, RAY_ROWS * 128, 3)
        d_t = d.reshape(n_ray_tiles, RAY_ROWS * 128, 3)
        live = jnp.any(d_t != 0, axis=-1, keepdims=True)
        w = live.astype(jnp.float32)
        centroid = jnp.sum(o_t * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)
        b2 = boxes[:, 0, :]
        bc = 0.5 * (b2[:, 0:3] + b2[:, 3:6])
        dist = jnp.sum((centroid[:, None, :] - bc[None, :, :]) ** 2, axis=-1)

        big_o = jnp.float32(3.0e38)
        tlo = jnp.min(jnp.where(live, o_t, big_o), axis=1)
        thi = jnp.max(jnp.where(live, o_t, -big_o), axis=1)
        all_pos = jnp.all(jnp.where(live, d_t >= 0, True), axis=1)
        all_neg = jnp.all(jnp.where(live, d_t <= 0, True), axis=1)
        # [T, B]: block behind the tile along some uniformly-signed axis
        behind = jnp.any(
            (all_pos[:, None, :] & (b2[None, :, 3:6] < tlo[:, None, :]))
            | (all_neg[:, None, :] & (b2[None, :, 0:3] > thi[:, None, :])),
            axis=-1,
        )
        has_live = jnp.any(live[:, :, 0], axis=1)
        reach = (~behind) & has_live[:, None]

        key_sort = jnp.where(reach, dist, jnp.float32(np.inf))
        order = jnp.argsort(key_sort, axis=1).astype(jnp.int32)
        count = jnp.sum(reach, axis=1).astype(jnp.int32)
        lastc = jnp.take_along_axis(
            order, jnp.maximum(count - 1, 0)[:, None], axis=1
        )
        pos = jnp.arange(n_sph_blocks, dtype=jnp.int32)[None, :]
        order = jnp.where(pos < jnp.maximum(count, 1)[:, None], order, lastc)
    else:
        order = jnp.broadcast_to(
            jnp.arange(n_sph_blocks, dtype=jnp.int32)[None, :],
            (n_ray_tiles, n_sph_blocks),
        )

    kernel = _build_kernel(rigid, block, fields)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ray_tiles, n_sph_blocks),
        in_specs=[
            pl.BlockSpec((7, RAY_ROWS, 128), lambda r, s, order: (0, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, fields), lambda r, s, order: (order[r, s], 0), memory_space=pltpu.SMEM),
            # (1, 1, 8): Mosaic requires the last two block dims to divide
            # (8, 128) or equal the array dims; the singleton middle dim
            # satisfies that for an 8-float record
            pl.BlockSpec((1, 1, 8), lambda r, s, order: (order[r, s], 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((RAY_ROWS, 128), lambda r, s, order: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_ROWS, 128), lambda r, s, order: (r, 0), memory_space=pltpu.VMEM),
        ),
    )
    t, idx = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        ),
        grid_spec=grid_spec,
    )(order, rays, packed, boxes)
    return t.reshape(n), idx.reshape(n)


# --------------------------------------------------------------- V2 kernel
#
# The V1 kernel streams sphere blocks HBM->SMEM and broadcasts each sphere's
# record as scalars over a [32, 128] ray tile. Measured on v5e, that design
# is SMEM-DMA-bandwidth-bound (~0.9 GB/s effective): the all-culled floor is
# ~25 ms for 49k rays x 100k spheres — the whole scene re-streamed into SMEM
# per ray tile at scalar-memory speed. Small ray tiles (which the cull NEEDS:
# a 4096-ray bounce tile spans most of the scene, so ~95% of blocks survive
# tile-level culling; 512-ray tiles cut that to ~15-20%) multiply the
# re-streaming and are therefore unaffordable against SMEM.
#
# V2 removes SMEM from the data path entirely: sphere superblocks stream
# HBM->VMEM (full DMA bandwidth), and the quadratic runs on PAIR MATRICES
# [V2_RAY_TILE rays (sublanes) x 128 spheres (lanes)] built from two natural
# broadcasts — per-ray values as [R, 1] columns, per-sphere values as
# [1, 128] rows. Small ray tiles become nearly free, which makes per-tile
# candidate compaction effective: an XLA-side reachability pass (behind-test
# along the tile's uniform direction signs + distance/t_max pruning) sorts
# each tile's reachable superblocks near-to-far and pads the tail with
# repeats of the last candidate; the kernel skips repeated steps and Pallas
# elides their DMA, so each tile pays only for its candidate list. The
# in-kernel per-superblock slab test (exact per ray) then retires blocks as
# t_best tightens near-to-far. Results are identical to V1/the dense scan:
# same f32 formula and operation order, same strict-< earliest-index ties.
#
# MEASURED VERDICT (real TPU v5e, 100k spheres, one process, bit-exact
# outputs): V2 LOSES to V1 — 19.0 ms vs 13.6 ms per primary-ray trace
# (12k rays) and 37K vs ~105K samples/s on the full config-5 render. By the
# time V2 was built, plane-seeded t_best, block=128 AABBs, and per-iteration
# wavefront ray reordering had already pulled V1 well under its old ~25 ms
# SMEM floor; V2's coarser cull granularity (512-ray tiles x 1024-sphere
# superblock AABBs vs 4096-ray tiles x 128-sphere blocks) plus ~3x more grid
# steps cost more than VMEM DMA bandwidth recovers. Kept, default-off, as the
# measured A/B point (tests force it on and gate bit-exactness vs V1).

KERNEL_V2: bool = False
V2_RAY_TILE = 512   # rays per tile == pair-matrix sublane extent
V2_SUPER = 1024     # spheres per streamed superblock (V2_SUPER // 128 chunks)


def _build_kernel_v2(rigid, fields, n_chunks, n_super):
    int_max = np.int32(2_147_483_647)

    def kernel(cand_ref, ray_ref, sph_ref, sbox_ref, t_ref, idx_ref):
        r = pl.program_id(0)
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            # seed with the per-ray search bound (shadow t_max / plane hit)
            t_ref[...] = ray_ref[:, 6:7]
            idx_ref[...] = jnp.full_like(idx_ref, -1)

        cand = cand_ref[r, s]
        fresh = jnp.logical_or(s == 0, cand != cand_ref[r, jnp.maximum(s - 1, 0)])

        ox = ray_ref[:, 0:1]
        oy = ray_ref[:, 1:2]
        oz = ray_ref[:, 2:3]
        dx = ray_ref[:, 3:4]
        dy = ray_ref[:, 4:5]
        dz = ray_ref[:, 5:6]
        t_best = t_ref[...]

        # exact per-ray slab test against the superblock AABB, [R, 1]
        t_enter, t_exit = _slab_test(
            (ox, oy, oz),
            (dx, dy, dz),
            (sbox_ref[0, 0, 0], sbox_ref[0, 0, 1], sbox_ref[0, 0, 2]),
            (sbox_ref[0, 0, 3], sbox_ref[0, 0, 4], sbox_ref[0, 0, 5]),
            t_best,
        )
        # slot 6 = superblock min det (det-scaled-t lower bound, see V1)
        may = (t_exit >= t_enter) & (t_enter * sbox_ref[0, 0, 6] < t_best)

        lane = jax.lax.broadcasted_iota(jnp.int32, (t_best.shape[0], 128), 1)

        @pl.when(fresh & jnp.any(may))
        def _():
            tb = t_ref[...]
            ib = idx_ref[...]
            base = cand * n_super
            if rigid:
                d_dot_o = dx * ox + dy * oy + dz * oz
                o2 = ox * ox + oy * oy + oz * oz
            for c in range(n_chunks):
                sl = slice(c * 128, (c + 1) * 128)
                if rigid:
                    t, valid = _quadratic_rigid(
                        sph_ref[0, 0:1, sl],
                        sph_ref[0, 1:2, sl],
                        sph_ref[0, 2:3, sl],
                        sph_ref[0, 3:4, sl],
                        (ox, oy, oz),
                        (dx, dy, dz),
                        d_dot_o,
                        o2,
                    )
                else:
                    rec = [sph_ref[0, f : f + 1, sl] for f in range(fields)]
                    t, valid = _quadratic_general(rec, (ox, oy, oz), (dx, dy, dz))
                win = valid & (t < tb)
                t_m = jnp.where(win, t, BIG)
                t_min = jnp.min(t_m, axis=1, keepdims=True)
                any_win = t_min < tb
                lane_w = jnp.min(
                    jnp.where(win & (t_m == t_min), lane, int_max),
                    axis=1,
                    keepdims=True,
                )
                ib = jnp.where(any_win, base + c * 128 + lane_w, ib)
                tb = jnp.where(any_win, t_min, tb)
            t_ref[...] = tb
            idx_ref[...] = ib

    return kernel


def _nearest_v2_impl(rigid, o, d, t_max, packed, boxes):
    n = o.shape[0]
    fields = _F_RIGID if rigid else _F_GENERAL
    R = V2_RAY_TILE
    n_pad = _round_up(max(n, 1), R)
    o_p = jnp.pad(o, ((0, n_pad - n), (0, 0)))
    d_p = jnp.pad(d, ((0, n_pad - n), (0, 0)))
    tm = jnp.pad(t_max, (0, n_pad - n))
    T = n_pad // R

    s_pad0 = packed.shape[0]
    sb_pad = _round_up(s_pad0, V2_SUPER)
    if sb_pad > s_pad0:
        pad_row = jnp.zeros((sb_pad - s_pad0, fields), jnp.float32)
        # r2 = -1: unhittable (same convention as build_stream_scene)
        pad_row = pad_row.at[:, -1 if rigid else -2].set(-1.0)
        packed_p = jnp.concatenate([packed, pad_row], axis=0)
    else:
        packed_p = packed
    Bs = sb_pad // V2_SUPER
    n_chunks = V2_SUPER // 128
    # lane-major sphere layout: [Bs, F, V2_SUPER], spheres consecutive on lanes
    packed_t = packed_p.T.reshape(fields, Bs, V2_SUPER).transpose(1, 0, 2)

    # superblock AABBs from the (block=128) Morton chunk boxes; chunk boxes
    # past the packed extent get (lo=+BIG, hi=-BIG) so they never widen one
    b2 = boxes[:, 0, :]
    need = sb_pad // SPH_BLOCK_RIGID if rigid else sb_pad // SPH_BLOCK_GENERAL
    nb = b2.shape[0]
    if need > nb:
        filler = jnp.concatenate(
            [
                jnp.full((need - nb, 3), BIG, jnp.float32),
                jnp.full((need - nb, 3), -BIG, jnp.float32),
                jnp.full((need - nb, 1), BIG, jnp.float32),  # min-det slot
                jnp.zeros((need - nb, 1), jnp.float32),
            ],
            axis=1,
        )
        b2 = jnp.concatenate([b2, filler], axis=0)
    per_super = V2_SUPER // (SPH_BLOCK_RIGID if rigid else SPH_BLOCK_GENERAL)
    g = b2[:need].reshape(Bs, per_super, 8)
    sb_lo = jnp.min(g[..., 0:3], axis=1)
    sb_hi = jnp.max(g[..., 3:6], axis=1)
    sb_mind = jnp.min(g[..., 6], axis=1)  # det-scaled-t cull bound scale
    sboxes = jnp.concatenate(
        [sb_lo, sb_hi, sb_mind[:, None], jnp.zeros((Bs, 1), jnp.float32)],
        axis=1,
    )[:, None, :]

    # ---- XLA-side per-tile candidate lists over superblocks
    if Bs > 1:
        o_t = o_p.reshape(T, R, 3)
        d_t = d_p.reshape(T, R, 3)
        live = jnp.any(d_t != 0, axis=-1, keepdims=True)
        has_live = jnp.any(live[:, :, 0], axis=1)
        w = live.astype(jnp.float32)
        centroid = jnp.sum(o_t * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)
        bc = 0.5 * (sb_lo + sb_hi)
        dist = jnp.sum((centroid[:, None, :] - bc[None, :, :]) ** 2, axis=-1)

        big_o = jnp.float32(3.0e38)
        tlo = jnp.min(jnp.where(live, o_t, big_o), axis=1)
        thi = jnp.max(jnp.where(live, o_t, -big_o), axis=1)
        all_pos = jnp.all(jnp.where(live, d_t >= 0, True), axis=1)
        all_neg = jnp.all(jnp.where(live, d_t <= 0, True), axis=1)
        behind = jnp.any(
            (all_pos[:, None, :] & (sb_hi[None, :, :] < tlo[:, None, :]))
            | (all_neg[:, None, :] & (sb_lo[None, :, :] > thi[:, None, :])),
            axis=-1,
        )
        # t_max prune: per-axis box separation is a lower bound on the hit
        # distance of any unit-direction ray from this tile, so a superblock
        # farther than the tile's largest search bound is unreachable
        tm_t = jnp.where(live[:, :, 0], tm.reshape(T, R), 0.0)
        tm_max = jnp.max(tm_t, axis=1)
        sep = jnp.maximum(
            sb_lo[None, :, :] - thi[:, None, :], tlo[:, None, :] - sb_hi[None, :, :]
        )
        lb = jnp.max(jnp.maximum(sep, 0.0), axis=-1)
        # reported hits are det-scaled: lb * min_det bounds any reported t
        reach = (~behind) & (lb * sb_mind[None, :] < tm_max[:, None]) & has_live[:, None]

        key_sort = jnp.where(reach, dist, jnp.float32(np.inf))
        cand = jnp.argsort(key_sort, axis=1).astype(jnp.int32)
        count = jnp.sum(reach, axis=1).astype(jnp.int32)
        lastc = jnp.take_along_axis(cand, jnp.maximum(count - 1, 0)[:, None], axis=1)
        pos = jnp.arange(Bs, dtype=jnp.int32)[None, :]
        cand = jnp.where(pos < jnp.maximum(count, 1)[:, None], cand, lastc)
    else:
        cand = jnp.zeros((T, 1), jnp.int32)

    rays8 = jnp.concatenate(
        [o_p, d_p, tm[:, None], jnp.zeros((n_pad, 1), jnp.float32)], axis=1
    )

    kernel = _build_kernel_v2(rigid, fields, n_chunks, V2_SUPER)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, Bs),
        in_specs=[
            pl.BlockSpec((R, 8), lambda r, s, cand: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, fields, V2_SUPER),
                lambda r, s, cand: (cand[r, s], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 8), lambda r, s, cand: (cand[r, s], 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((R, 1), lambda r, s, cand: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda r, s, cand: (r, 0), memory_space=pltpu.VMEM),
        ),
    )
    t, idx = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ),
        grid_spec=grid_spec,
    )(cand, rays8, packed_t, sboxes)
    return t[:n, 0], idx[:n, 0]


# --------------------------------------------------------------- V3 kernel
#
# Resident-scene kernel, the default for scenes that fit VMEM. The decisive
# measurement behind it: the V1 render at 100k spheres sits AT the SMEM
# restream floor — every ray tile re-streams the whole 1.6 MB packed scene
# HBM->SMEM at ~1 GB/s effective even when the in-kernel cull skips all the
# compute, because Pallas DMAs every named block regardless. XLA-side
# candidate lists can elide those DMAs but cost ~1.9 ms of dispatch per
# trace call on this platform (measured) and cull nothing for scattered
# bounce tiles. V3 removes the restream entirely: a 100k-sphere scene packs
# to 1.6 MB (rigid) / 5.6 MB (general) — it FITS IN VMEM, so the kernel
# keeps it resident (constant index map -> fetched once), the per-tile
# frustum/AABB cull runs IN-KERNEL (a vectorized interval slab test over
# all chunk AABBs at once, ~us, zero dispatch), and each surviving
# 128-sphere chunk is evaluated as a pair matrix [V3_RAY_TILE x 128]
# (per-ray columns x per-sphere rows). Grid = ray tiles only: no per-block
# grid steps, no per-block DMA, 8x finer ray-cull granularity than V1's
# 4096-ray tiles. Bit-exact vs V1/V2/dense: same f32 formulas and op order,
# same strict-< earliest-index ties.
#
# MEASURED VERDICT (real TPU, 100k spheres, one process): V3 also loses to
# V1 — 12.8 vs 10.8 ms on primary traces. The per-chunk overhead moves from
# DMA to the VPU: ~0.3 us per chunk for the dynamic [1,1] mask load +
# cross-lane any() + branch (782 per tile x 24 tiles), plus the pair-matrix
# form pays two lane-reductions (t_min, winner lane) per surviving chunk
# that V1's strict-< scalar-broadcast update never needs. Kept default-off
# as the measured A/B point; the winning design is V4 below (V1's compute
# form, scene streamed once per TRACE instead of once per tile).

KERNEL_V3: bool = False
V3_RAY_TILE = 512
# packed-scene byte cap for residency (Pallas double-buffers input windows,
# so the true VMEM cost is ~2x this; v5e has 16 MB less outputs/scratch)
V3_RESIDENT_BYTES = 6 * 2**20


def _build_kernel_v3(rigid, fields, n_blocks):
    int_max = np.int32(2_147_483_647)
    bigf = np.float32(3.0e38)

    def kernel(ray_ref, box_ref, sph_ref, t_ref, idx_ref, mask_ref):
        ox = ray_ref[:, 0:1]
        oy = ray_ref[:, 1:2]
        oz = ray_ref[:, 2:3]
        dx = ray_ref[:, 3:4]
        dy = ray_ref[:, 4:5]
        dz = ray_ref[:, 5:6]
        tmax_col = ray_ref[:, 6:7]
        live = (dx != 0.0) | (dy != 0.0) | (dz != 0.0)

        # ---- tile bounds (scalars; dead/padding lanes excluded)
        def lo_of(v):
            return jnp.min(jnp.where(live, v, bigf))

        def hi_of(v):
            return jnp.max(jnp.where(live, v, -bigf))

        tmx = jnp.max(jnp.where(live, tmax_col, 0.0))

        # ---- in-kernel frustum: conservative interval slab test of the
        # tile's (origin box x direction box x [0, tmx)) against every chunk
        # AABB at once, on [n_blocks, 1] columns
        def axis_iv(ax, ov, dv):
            blo = box_ref[:, ax : ax + 1]
            bhi = box_ref[:, 3 + ax : 4 + ax]
            olo, ohi = lo_of(ov), hi_of(ov)
            dlo, dhi = lo_of(dv), hi_of(dv)
            c0 = (dlo <= 0.0) & (dhi >= 0.0)
            sdl = jnp.where(c0, 1.0, dlo)
            sdh = jnp.where(c0, 1.0, dhi)
            n1l, n1h = blo - ohi, blo - olo
            n2l, n2h = bhi - ohi, bhi - olo
            q1l = jnp.minimum(jnp.minimum(n1l / sdl, n1l / sdh),
                              jnp.minimum(n1h / sdl, n1h / sdh))
            q1h = jnp.maximum(jnp.maximum(n1l / sdl, n1l / sdh),
                              jnp.maximum(n1h / sdl, n1h / sdh))
            q2l = jnp.minimum(jnp.minimum(n2l / sdl, n2l / sdh),
                              jnp.minimum(n2h / sdl, n2h / sdh))
            q2h = jnp.maximum(jnp.maximum(n2l / sdl, n2l / sdh),
                              jnp.maximum(n2h / sdl, n2h / sdh))
            near = jnp.where(c0, -bigf, jnp.minimum(q1l, q2l))
            far = jnp.where(c0, bigf, jnp.maximum(q1h, q2h))
            return jnp.maximum(near, 0.0), far

        nx, fx = axis_iv(0, ox, dx)
        ny, fy = axis_iv(1, oy, dy)
        nz, fz = axis_iv(2, oz, dz)
        lb = jnp.maximum(jnp.maximum(nx, ny), nz)
        ub = jnp.minimum(jnp.minimum(fx, fy), fz)
        # slot 6 = chunk min det (det-scaled-t lower bound, see V1)
        mnd = box_ref[:, 6:7]
        mask_ref[...] = ((lb <= ub) & (lb * mnd < tmx)).astype(jnp.int32)

        t_ref[...] = tmax_col
        idx_ref[...] = jnp.full_like(idx_ref, -1)

        lane = jax.lax.broadcasted_iota(jnp.int32, (tmax_col.shape[0], 128), 1)
        if rigid:
            d_dot_o = dx * ox + dy * oy + dz * oz
            o2 = ox * ox + oy * oy + oz * oz

        def body(i, _):
            m = mask_ref[pl.ds(i, 1), :]

            @pl.when(jnp.any(m != 0))
            def _():
                sph = sph_ref[pl.ds(i, 1), :, :]
                tb = t_ref[...]
                ib = idx_ref[...]
                if rigid:
                    t, valid = _quadratic_rigid(
                        sph[0, 0:1, :], sph[0, 1:2, :], sph[0, 2:3, :],
                        sph[0, 3:4, :], (ox, oy, oz), (dx, dy, dz), d_dot_o, o2,
                    )
                else:
                    rec = [sph[0, f : f + 1, :] for f in range(fields)]
                    t, valid = _quadratic_general(rec, (ox, oy, oz), (dx, dy, dz))
                win = valid & (t < tb)
                t_m = jnp.where(win, t, BIG)
                t_min = jnp.min(t_m, axis=1, keepdims=True)
                any_win = t_min < tb
                lane_w = jnp.min(
                    jnp.where(win & (t_m == t_min), lane, int_max),
                    axis=1, keepdims=True,
                )
                idx_ref[...] = jnp.where(any_win, i * 128 + lane_w, ib)
                t_ref[...] = jnp.where(any_win, t_min, tb)

            return 0

        jax.lax.fori_loop(0, n_blocks, body, 0)

    return kernel


def _nearest_v3_impl(rigid, o, d, t_max, packed, boxes):
    n = o.shape[0]
    fields = _F_RIGID if rigid else _F_GENERAL
    R = V3_RAY_TILE
    n_pad = _round_up(max(n, 1), R)
    o_p = jnp.pad(o, ((0, n_pad - n), (0, 0)))
    d_p = jnp.pad(d, ((0, n_pad - n), (0, 0)))
    tm = jnp.pad(t_max, (0, n_pad - n))
    T = n_pad // R

    # resident layouts (loop-invariant under jit: XLA hoists them out of the
    # wavefront while_loop, so per-trace cost is zero after the first)
    B = packed.shape[0] // 128
    scene_t = packed.reshape(B, 128, fields).transpose(0, 2, 1)
    b2 = boxes[:, 0, :]
    B_pad = _round_up(B, 8)
    if B_pad > B:
        filler = jnp.concatenate(
            [
                jnp.full((B_pad - B, 3), BIG, jnp.float32),
                jnp.full((B_pad - B, 3), -BIG, jnp.float32),
                jnp.zeros((B_pad - B, 2), jnp.float32),
            ],
            axis=1,
        )
        b2 = jnp.concatenate([b2, filler], axis=0)

    rays8 = jnp.concatenate(
        [o_p, d_p, tm[:, None], jnp.zeros((n_pad, 1), jnp.float32)], axis=1
    )

    kernel = _build_kernel_v3(rigid, fields, B)
    t, idx = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((R, 8), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B_pad, 8), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, fields, 128), lambda r: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((R, 1), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda r: (r, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((B_pad, 1), jnp.int32)],
    )(rays8, b2, scene_t)
    return t[:n, 0], idx[:n, 0]


# --------------------------------------------------------------- V4 kernel
#
# SWAPPED-GRID streaming kernel: the V1 grid is (ray tile OUTER, sphere
# block INNER), so every ray tile re-streams the whole packed scene
# HBM->SMEM — at the measured ~1 GB/s SMEM DMA rate that restream is the
# render's floor (12 tiles x 1.6 MB per trace at 100k spheres). V4 swaps to
# (sphere block OUTER, ray tile INNER): the sphere block index is constant
# across the inner sweep, so Pallas fetches each block exactly ONCE — total
# SMEM traffic drops from tiles x scene to 1 x scene per trace. Per-tile
# nearest-hit state (t_best, idx) lives in a persistent VMEM scratch
# accumulator, initialized on the first outer step and flushed to the
# outputs on the last. Streamed blocks are V4_SUB x 128 spheres with one
# AABB slab test per 128-sphere sub-block (same cull granularity as V1's
# 128-sphere blocks, V4_SUB x fewer grid steps). The compute form is V1's
# scalar-broadcast fori (identical f32 ops in identical order), so results
# are bit-exact vs V1/V2/V3/dense.
#
# MEASURED (real TPU, 100k spheres): V4 is the winner of the four designs —
# 9.1 vs 10.3 ms per primary trace and 88K vs 69K samples/s on the config-5
# render vs V1 in back-to-back processes, bit-identical images. V4_SUB=2
# and 4 measure equal within noise; 8 is impossible (the Mosaic SMEM window
# for a 1024x4 block pads to 1 MB — the whole SMEM space). Scattered
# (bounce-regime) traces run ~24 ms = ~51G sphere-tests/s: compute-bound,
# the remaining ceiling.

KERNEL_V4: bool = True
V4_SUB = 4  # 128-sphere sub-blocks per streamed SMEM block (8 OOMs SMEM)
# Rays per inner tile (rows of 128). Unlike V1 — where smaller tiles multiply
# the scene restream — V4 fetches each sphere block once regardless of the
# inner tile count, so shrinking the tile only buys FINER CULL GRANULARITY
# (a sub-block is skipped when no ray in the tile can hit it; with wavefront
# reordering small tiles are origin-local and mono-octant). Must divide
# RAY_ROWS (callers pad ray counts to RAY_ROWS*128).
# MEASURED round 3 (real TPU, 100k spheres, sorted rays, same process): 32
# won — 8 was 10.0 ms primary / 40.7 ms scattered / 74.5K render vs 32's
# 9.0 / 22.8 / 121.4K. RE-MEASURED round 5 with per-call sorting off
# (tools/flag_ab.py, interleaved AOT pairs): at 100k spheres 16 now WINS —
# 316K vs 292K (config 5), 209K vs 193K (depth 4), 226K vs 199K (non-rigid)
# — tile-source coherence is coarser without the sort, so halving the tile
# recovers cull selectivity; at 10k spheres 32 still wins (1116K vs 1044K:
# only ~20 streamed blocks to cull, per-step overhead dominates).
# None = auto (16 when the padded stream has >= V4_RR_AUTO_BLOCKS outer
# blocks, else 32); int = forced (A/B).
V4_RAY_ROWS: int | None = None
V4_RR_AUTO_BLOCKS = 64  # 64 x 512 = 32768+ spheres -> fine 16-row tiles
# SECOND cull level: streamed blocks per superblock (V4_SUPER * V4_SUB * 128
# spheres under one AABB, e.g. 8 -> 4096). Once per superblock the kernel
# slab-tests the union box against the tile with the LIVE t_best and parks
# the verdict in an SMEM scalar (one per ray tile); the next V4_SUPER outer
# steps gate their ENTIRE body — 4 sub-block vector slab tests, accumulator
# reads, predicates — on that scalar. Strictly conservative (union box ⊇
# sub boxes, min-det ≤ block min-dets, t_best only shrinks after the test),
# so results stay bit-exact vs V4_SUPER=0; the fixed per-grid-step vector
# cost that capped the scattered (bounce) regime drops to one SMEM scalar
# read wherever a whole 4096-sphere neighborhood is unreachable. 0/1 = off.
V4_SUPER = 8


def _build_kernel_v4(rigid, fields, n_outer, sub, subblock, rr, n_super=None, occl=False):
    """V4 swapped-grid kernel body. ``occl=True`` builds the ANY-HIT variant:
    no winner index is tracked; a valid hit strictly below the lane's bound
    sets the bound to 0 ("occluded", sticky — t >= 0 can never beat 0), so
    every later sub-block/superblock slab test culls for that lane and fully-
    occluded tiles skip whole steps on the superblock scalar. Output is the
    final bound: 0 == occluded, initial t_cut == reachable. The occl ray
    block carries an 8th row: the per-lane EXCLUDED sphere's Morton-sorted
    index (int32 bitcast to f32; -1 = none) — NEE shadow queries exclude the
    queried light's own sphere so its t never has to be re-derived in-kernel
    (kills tangency-noise self-occlusion exactly, not by an epsilon shave)."""
    sb = V4_SUPER

    def kernel(*refs):
        if occl:
            if n_super is not None:
                ray_ref, sph_ref, box_ref, sup_ref, t_ref, tacc, smask = refs
            else:
                ray_ref, sph_ref, box_ref, t_ref, tacc = refs
            idx_ref = iacc = None
        elif n_super is not None:
            ray_ref, sph_ref, box_ref, sup_ref, t_ref, idx_ref, tacc, iacc, smask = refs
        else:
            ray_ref, sph_ref, box_ref, t_ref, idx_ref, tacc, iacc = refs
        s = pl.program_id(0)
        r = pl.program_id(1)
        rowsl = pl.ds(r * rr, rr)

        @pl.when(s == 0)
        def _():
            tacc[rowsl, :] = ray_ref[6]
            if not occl:
                iacc[rowsl, :] = jnp.full((rr, 128), -1, jnp.int32)

        o = (ray_ref[0], ray_ref[1], ray_ref[2])
        d = (ray_ref[3], ray_ref[4], ray_ref[5])
        if occl:
            excl = jax.lax.bitcast_convert_type(ray_ref[7], jnp.int32)

        if n_super is not None:
            # refresh this tile's superblock verdict once per V4_SUPER outer
            # steps, against the LIVE t_best (tighter than any host-side
            # precompute; conservative for the gated steps because t_best
            # only shrinks after the test and sub boxes are subsets)
            @pl.when(s % sb == 0)
            def _():
                t_best0 = tacc[rowsl, :]
                sbi = s // sb
                lo = (sup_ref[sbi, 0], sup_ref[sbi, 1], sup_ref[sbi, 2])
                hi = (sup_ref[sbi, 3], sup_ref[sbi, 4], sup_ref[sbi, 5])
                t_enter, t_exit = _slab_test(o, d, lo, hi, t_best0)
                may = (t_exit >= t_enter) & (t_enter * sup_ref[sbi, 6] < t_best0)
                smask[r] = jnp.any(may).astype(jnp.int32)

            gate = smask[r] > 0
        else:
            gate = None

        def step_body():
            if rigid:
                d_dot_o = d[0] * o[0] + d[1] * o[1] + d[2] * o[2]
                o2 = o[0] * o[0] + o[1] * o[1] + o[2] * o[2]

            for j in range(sub):
                t_best = tacc[rowsl, :]
                lo = (box_ref[0, j, 0], box_ref[0, j, 1], box_ref[0, j, 2])
                hi = (box_ref[0, j, 3], box_ref[0, j, 4], box_ref[0, j, 5])
                t_enter, t_exit = _slab_test(o, d, lo, hi, t_best)
                # slot 6 = sub-block min det (det-scaled-t lower bound, see V1)
                may_hit = (t_exit >= t_enter) & (
                    t_enter * box_ref[0, j, 6] < t_best
                )

                def sphere_t(i, _j=j):
                    if rigid:
                        cx = sph_ref[_j * subblock + i, 0]
                        cy = sph_ref[_j * subblock + i, 1]
                        cz = sph_ref[_j * subblock + i, 2]
                        r2 = sph_ref[_j * subblock + i, 3]
                        return _quadratic_rigid(cx, cy, cz, r2, o, d, d_dot_o, o2)
                    rec = [sph_ref[_j * subblock + i, f] for f in range(fields)]
                    return _quadratic_general(rec, o, d)

                if occl:

                    def body(i, tb, _j=j):
                        t, valid = sphere_t(i, _j)
                        base = (s * sub + _j) * subblock
                        win = valid & (t < tb) & (base + i != excl)
                        return jnp.where(win, 0.0, tb)

                    @pl.when(jnp.any(may_hit))
                    def _(body=body):
                        tacc[rowsl, :] = jax.lax.fori_loop(
                            0, subblock, body, tacc[rowsl, :]
                        )
                else:

                    def body(i, carry, _j=j):
                        tb, ib = carry
                        t, valid = sphere_t(i, _j)
                        win = valid & (t < tb)
                        base = (s * sub + _j) * subblock
                        return jnp.where(win, t, tb), jnp.where(win, base + i, ib)

                    @pl.when(jnp.any(may_hit))
                    def _(body=body):
                        t2, i2 = jax.lax.fori_loop(
                            0, subblock, body, (tacc[rowsl, :], iacc[rowsl, :])
                        )
                        tacc[rowsl, :] = t2
                        iacc[rowsl, :] = i2

        if gate is None:
            step_body()
        else:
            pl.when(gate)(step_body)

        # the out windows are parked on a dummy tail block until the final
        # outer step (see the index maps): each real block is written once
        @pl.when(s == n_outer - 1)
        def _():
            t_ref[...] = tacc[rowsl, :]
            if not occl:
                idx_ref[...] = iacc[rowsl, :]

    return kernel


def _nearest_v4_impl(rigid, o, d, t_max, packed, boxes):
    return _v4_impl(rigid, o, d, t_max, packed, boxes, occl=False)


def _occluded_v4_impl(rigid, o, d, t_cut, packed, boxes, excl=None):
    """ANY-HIT V4: final per-ray bound (0 == some sphere hit strictly below
    t_cut, the per-ray ``excl`` Morton index skipped). Shares every
    packing/culling decision with the nearest kernel."""
    return _v4_impl(rigid, o, d, t_cut, packed, boxes, occl=True, excl=excl)


def _v4_impl(rigid, o, d, t_max, packed, boxes, occl, excl=None):
    n = o.shape[0]
    block128 = SPH_BLOCK_RIGID if rigid else SPH_BLOCK_GENERAL
    fields = _F_RIGID if rigid else _F_GENERAL
    big_block = V4_SUB * 128
    s_pad0 = packed.shape[0]
    s_pad = _round_up(s_pad0, big_block)
    if s_pad > s_pad0:
        pad_row = jnp.zeros((s_pad - s_pad0, fields), jnp.float32)
        pad_row = pad_row.at[:, -1 if rigid else -2].set(-1.0)  # unhittable
        packed = jnp.concatenate([packed, pad_row], axis=0)
    b2 = boxes[:, 0, :]
    need = s_pad // block128
    if need > b2.shape[0]:
        # filler boxes copy the last real box: the slab test may pass, but
        # every padded sphere has r2 = -1 and can never win
        filler = jnp.broadcast_to(b2[-1:], (need - b2.shape[0], 8))
        b2 = jnp.concatenate([b2, filler], axis=0)
    n_outer = s_pad // big_block
    boxes4 = b2.reshape(n_outer, V4_SUB, 8)

    # second cull level: union AABB + min det over V4_SUPER consecutive
    # streamed blocks (ragged tail groups just union fewer real boxes —
    # padding with copies of the last box keeps the union conservative)
    use_super = V4_SUPER > 1 and n_outer > V4_SUPER
    if use_super:
        n_super = -(-n_outer // V4_SUPER)
        bs = boxes4
        if n_super * V4_SUPER > n_outer:
            fill = jnp.broadcast_to(
                bs[-1:], (n_super * V4_SUPER - n_outer, V4_SUB, 8)
            )
            bs = jnp.concatenate([bs, fill], axis=0)
        bs = bs.reshape(n_super, V4_SUPER * V4_SUB, 8)
        sboxes = jnp.concatenate(
            [
                jnp.min(bs[:, :, 0:3], axis=1),
                jnp.max(bs[:, :, 3:6], axis=1),
                jnp.min(bs[:, :, 6:7], axis=1),
                jnp.zeros((n_super, 1), jnp.float32),
            ],
            axis=1,
        )
    else:
        n_super = None

    if V4_RAY_ROWS is None:
        rr = 16 if n_outer >= V4_RR_AUTO_BLOCKS else 32
    else:
        rr = V4_RAY_ROWS
    rr = min(rr, RAY_ROWS)
    assert n % (rr * 128) == 0
    rows = n // 128
    n_ray_tiles = rows // rr
    parts = [o.T, d.T, t_max[None, :]]
    if occl:
        if excl is None:
            excl = jnp.full((n,), -1, jnp.int32)
        parts.append(
            jax.lax.bitcast_convert_type(excl.astype(jnp.int32), jnp.float32)[None, :]
        )
    nrows = 8 if occl else 7  # o(3) + d(3) + bound(1) [+ occl exclusion row]
    rays = jnp.concatenate(parts, axis=0).reshape(nrows, rows, 128)

    kernel = _build_kernel_v4(rigid, fields, n_outer, V4_SUB, 128, rr, n_super, occl)

    # out windows may not be REVISITED non-consecutively (undefined
    # pipelining): park them on a dummy tail block for every outer step but
    # the last, where each real block is visited (and written) exactly once
    def out_idx(s, r):
        return (jnp.where(s == n_outer - 1, r, n_ray_tiles), 0)

    in_specs = [
        pl.BlockSpec((nrows, rr, 128), lambda s, r: (0, r, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((big_block, fields), lambda s, r: (s, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, V4_SUB, 8), lambda s, r: (s, 0, 0), memory_space=pltpu.SMEM),
    ]
    operands = [rays, packed, boxes4]
    scratch = [pltpu.VMEM((rows, 128), jnp.float32)]
    if not occl:
        scratch.append(pltpu.VMEM((rows, 128), jnp.int32))
    if n_super is not None:
        # whole superblock-box table resident in SMEM (n_super x 8 floats);
        # per-tile verdict scalars live in an SMEM scratch indexed by r
        in_specs.append(
            pl.BlockSpec((n_super, 8), lambda s, r: (0, 0), memory_space=pltpu.SMEM)
        )
        operands.append(sboxes)
        scratch.append(pltpu.SMEM((n_ray_tiles,), jnp.int32))

    out_spec = pl.BlockSpec((rr, 128), out_idx, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows + rr, 128), jnp.float32)
    if occl:
        t = pl.pallas_call(
            kernel,
            grid=(n_outer, n_ray_tiles),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
        )(*operands)
        return t[:rows].reshape(n)

    t, idx = pl.pallas_call(
        kernel,
        grid=(n_outer, n_ray_tiles),
        in_specs=in_specs,
        out_specs=(
            out_spec,
            pl.BlockSpec((rr, 128), out_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            out_shape,
            jax.ShapeDtypeStruct((rows + rr, 128), jnp.int32),
        ),
        scratch_shapes=scratch,
    )(*operands)
    return t[:rows].reshape(n), idx[:rows].reshape(n)


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

    Returns (packed [S_pad, F], boxes [S_pad/block, 8], perm [S_pad]).
    ``perm`` is padded to S_pad alongside ``packed``: pad entries map to
    sphere 0 but are never dereferenced for a real winner (padded packed
    rows are unhittable, r2 = -1). Sorting
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

    # Reported hit distances are DET-SCALED (t = t_loc * det, the reference's
    # Raytracer.cpp:70 semantics replicated by _quadratic_general), while the
    # slab test's t_enter is a world-space ray parameter. A sphere with
    # det < 1 reports t < its world distance, so a cull of the form
    # `t_enter < t_best` could drop a block whose sphere would WIN the
    # det-scaled comparison the dense scan performs. Box slot 6 carries the
    # block's min det (clamped >= 0): t_enter * min_det is a valid lower
    # bound on any reported t from the block, restoring exactness vs the
    # dense path for non-rigid scenes. Rigid scenes have det == 1 (slot 6
    # == 1.0: multiplying by it is exact, so rigid culls are unchanged).
    if rigid:
        dets = jnp.ones((s,), jnp.float32)
    else:
        dets = jnp.maximum(prep.sphere_det, 0.0)[perm]
    # padding spheres are unhittable (r2 = -1): +BIG keeps them out of the min
    dets = jnp.concatenate([dets, jnp.full((pad,), BIG, jnp.float32)], axis=0)

    n_blocks = s_pad // block
    c_b = centers.reshape(n_blocks, block, 3)
    e_b = ext.reshape(n_blocks, block, 3)
    lo = jnp.min(c_b - e_b, axis=1)
    hi = jnp.max(c_b + e_b, axis=1)
    mind = jnp.min(dets.reshape(n_blocks, block), axis=1)[:, None]
    # conservative inflation: f32 slab-test rounding must never cull a true hit
    slack = 1e-4 * (jnp.max(hi) - jnp.min(lo) + 1.0)
    boxes = jnp.concatenate(
        [lo - slack, hi + slack, mind, jnp.zeros((n_blocks, 1), jnp.float32)],
        axis=1,
    )[:, None, :]

    # perm padded to s_pad so a whole-BLOCK permutation below can carry it
    # along (padding rows never win — r2 = -1 — so their mapping is unused)
    perm = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)], axis=0)

    if FRONT_TO_BACK and n_blocks > 1:
        # Visit order = array order for the streaming kernels (V4's outer
        # grid axis walks blocks sequentially), so physically sort whole
        # Morton blocks near-to-far FROM THE CAMERA: primary tiles then
        # tighten t_best on the first blocks and slab-cull everything behind
        # their hits, and bounce/NEE tiles (origins on camera-visible
        # surfaces) inherit most of that ordering. Block contents (and their
        # AABBs) are untouched, DMA reads stay sequential in the permuted
        # array — the reason per-tile index-map orders lost (NEAR_FAR_ORDER
        # above) does not apply. Pure visitation order: the strict `t <
        # t_best` winner is order-independent, so results match the dense
        # scan everywhere except exact-f32 t ties between distinct spheres.
        cam = jax.lax.stop_gradient(prep.camera.origin)
        # squared distance from the camera to each block's AABB (0 inside)
        gap = jnp.maximum(lo - cam[None, :], 0.0) + jnp.maximum(
            cam[None, :] - hi, 0.0
        )
        order = jnp.argsort(jnp.sum(gap * gap, axis=1))
        packed = packed.reshape(n_blocks, block, -1)[order].reshape(s_pad, -1)
        boxes = boxes[order]
        perm = perm.reshape(n_blocks, block)[order].reshape(s_pad)

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


def occluded_sphere(prep, o, d, t_cut, excl=None):
    """ANY-HIT occlusion query: True where some sphere's hit t (the same
    world / det-scaled-t convention as nearest_sphere) is STRICTLY below the
    per-ray ``t_cut``, skipping the per-ray ``excl`` Morton-sorted sphere
    index (int32, -1 = none — NEE passes the queried light's own sphere so
    self-occlusion is excluded structurally). The shadow-query fast path
    (ops/geometry.light_visible): no winner tracking, and a hit zeroes the
    lane's search bound so every later sphere block culls on the slab test —
    with front-to-back block ordering an occluded lane stops paying after
    its first occluder block, and fully-occluded ray tiles skip whole
    superblocks. Visibility is discrete: EVERY input is stop_gradient-ed
    (matches the interior-gradient detachment convention; boundary terms
    live in diff/edges.py), which also keeps Pallas's missing JVP rule out
    of ``jax.grad`` through callers.

    Rays with ``t_cut <= 0`` are clamped to a 0 bound and report occluded
    at no cost (every block culls against 0)."""
    n = o.shape[0]
    cached = getattr(prep, "stream_packed", None)
    if cached is not None:
        packed, boxes = prep.stream_packed, prep.stream_boxes
    else:
        packed, boxes, _ = build_stream_scene(prep)
    packed = jax.lax.stop_gradient(packed)
    boxes = jax.lax.stop_gradient(boxes)

    lane_tile = RAY_ROWS * 128
    n_pad = _round_up(max(n, 1), lane_tile)
    o_p = jnp.pad(o, ((0, n_pad - n), (0, 0)))
    d_p = jnp.pad(d, ((0, n_pad - n), (0, 0)))
    # padding rays get t_cut 0: always "occluded", never tested
    tc = jnp.clip(jax.lax.stop_gradient(t_cut), 0.0, BIG).astype(jnp.float32)
    tc = jnp.pad(tc, (0, n_pad - n))
    if excl is not None:
        excl = jnp.pad(jax.lax.stop_gradient(excl).astype(jnp.int32),
                       (0, n_pad - n), constant_values=-1)
    t_out = _occluded_v4_impl(prep.rigid, jax.lax.stop_gradient(o_p),
                              jax.lax.stop_gradient(d_p), tc, packed, boxes,
                              excl)
    return t_out[:n] == 0.0
