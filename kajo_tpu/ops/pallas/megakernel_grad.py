"""Fused Pallas backward pass: Path Replay Backpropagation for materials.

Completes the BASELINE north-star "fused Pallas forward+backward kernels":
gradients of the rendered image w.r.t. material colors (diffuse, specular,
emission) and the background, computed by a single self-contained kernel —
no tape, no reverse-mode scan, O(1) memory per lane.

Algorithm (Vicini et al. 2021 adapted to the kajo estimator): each lane walks
every sample **twice** with the same PCG4D stream. Walk 1 recomputes the
sample's total radiance L. Walk 2 replays the path maintaining
``R_rem`` — the radiance still to be collected — peeling off each local
contribution as it is re-derived. Because every radiance term is *linear* in
the material color it carries (f·cos = color ⊙ s for all four BSDFs), the
parameter gradient of everything downstream of a throughput factor F = c ⊙ s
is simply g ⊙ R_rem / c, and local NEE/emission/background terms contribute
their coefficients directly. Discrete branch probabilities are detached
(estimator convention, models/integrator.py), so transparency / IOR /
exponent / geometry receive no gradient here — the differentiable jax budget
engine (models/wavefront.py) covers those; this kernel covers the common
material-optimization case at megakernel speed.

Gradient accumulation: per-tile [K+1, 16] tables carried through the loop
(cols 0-2 diffuse, 3-5 specular, 6-8 emission; row K cols 0-2 background),
summed across tiles by the caller. Scatter is a masked per-object reduction
(K is small; the scene is VMEM/SMEM-resident).

Validation: tests compare E[grad] against E[jax.grad] of the budget engine
and against finite differences of E[render] (tests/test_megakernel_grad.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.integrator import RenderConfig
from ...ops.geometry import prepare_scene
from ...ops.rng import seed_from_key
from ...scene.types import Scene
from .megakernel import (  # noqa: F401 (UNROLL re-exported for the gate below)
    BIG,
    FLT_EPSILON,
    MAX_KERNEL_OBJECTS,
    PI,
    TILE_ROWS,
    UNROLL_OBJECTS,
    _LI,
    _MA,
    _PL,
    _SP,
    _SPG,
    _pack_scene,
    _sphere_hit_general,
    _uniforms4,
    reflect,
    safe_pow,
    safe_sqrt,
    vadd,
    vcross,
    vdot,
    vfull,
    vmul,
    vnormalize,
    vscale,
    vsub,
    vwhere,
)


# Below this object count, gradients accumulate into fully-unrolled per-(row,
# col) loop-carried planes (fastest; compile time grows with K). Above it the
# kernel switches to fori object loops + a VMEM [K, 128] accumulation table
# written with dynamic-row stores — graph size O(1) in K, so the cap matches
# the forward kernel's.
GRAD_UNROLL_OBJECTS = 24
MAX_GRAD_OBJECTS = MAX_KERNEL_OBJECTS


def supports(scene: Scene) -> bool:
    from .megakernel import supports as fwd_supports

    # rigid scenes replay the trace with the 4-float world-space record;
    # general (scaled/sheared) transforms with the forward kernel's 23-float
    # object-space record (det-scaled t, fwd3-rotated normals) — the PRB
    # material gradient is geometry-agnostic, so both are exact
    return bool(fwd_supports(scene) and scene.num_objects <= MAX_GRAD_OBJECTS)


def _build_grad_kernel(
    width, height, grid_n, eff, config: RenderConfig, P, S, L, rigid=True
):
    K = P + S
    Krows = K + 1  # last row: background
    big = K > GRAD_UNROLL_OBJECTS  # VMEM-table accumulation + fori loops
    max_depth = config.max_depth
    eps = np.float32(config.surface_epsilon)
    emit_after_scatter = bool((not config.direct_lighting) or config.full_mis)
    nee_on = bool(config.direct_lighting and L > 0)
    # one-of-L light sampling (same stream/budget as the forward kernel,
    # megakernel.py: us[5] selects, us[6:9] sample; for L > 1 the uniform
    # count is unchanged, so the walks stay bit-identical to the primal)
    one_light = bool(config.one_light_nee and L > 1)
    ncalls = -(-max(5 + 3 * L, 9 if one_light else 0) // 4)
    CAM_SALT = np.uint32(0x7FFFFFFF)
    SPF = _SP if rigid else _SPG  # per-sphere record size (see megakernel.py)
    off_planes = 0
    off_spheres = off_planes + P * _PL
    off_mats = off_spheres + S * SPF
    off_lights = off_mats + K * _MA
    off_bg = off_lights + L * _LI
    off_cam = off_bg + 3
    fgrid = np.float32(grid_n)
    fw = np.float32(width)
    fh = np.float32(height)

    def kernel(seed_ref, scn_ref, g_ref, out_ref, *scratch):
        acc_ref = scratch[0] if big else None

        def s_(i):
            return scn_ref[0, i]

        seed = seed_ref[0, 0]
        origin0 = (s_(off_cam), s_(off_cam + 1), s_(off_cam + 2))
        p1 = (s_(off_cam + 3), s_(off_cam + 4), s_(off_cam + 5))
        du = (s_(off_cam + 6), s_(off_cam + 7), s_(off_cam + 8))
        dv = (s_(off_cam + 9), s_(off_cam + 10), s_(off_cam + 11))
        bg = (s_(off_bg), s_(off_bg + 1), s_(off_bg + 2))

        tile = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 128), 1)
        lane_i = (tile * TILE_ROWS + rows) * 128 + cols
        lane = lane_i.astype(jnp.uint32)
        in_image = lane_i < width * height
        px = (lane_i % width).astype(jnp.float32)
        py = (lane_i // width).astype(jnp.float32)
        zf = px * 0.0
        zi = lane_i * 0
        g3 = (g_ref[0], g_ref[1], g_ref[2])  # upstream cotangent per pixel

        def plane_rec(i):
            b = off_planes + i * _PL
            return [s_(b + j) for j in range(_PL)]

        def sphere_rec(i):
            b = off_spheres + i * SPF
            return [s_(b + j) for j in range(SPF)]

        def mat_rec(i):
            b = off_mats + i * _MA
            return [s_(b + j) for j in range(_MA)]

        def light_rec(i):
            b = off_lights + i * _LI
            return [s_(b + j) for j in range(_LI)]

        def camera_ray(sample):
            su = sample.astype(jnp.uint32)
            gx = (sample % grid_n).astype(jnp.float32)
            gy = (sample // grid_n).astype(jnp.float32)
            u1, u2, _, _ = _uniforms4(lane, su, CAM_SALT, seed)
            sx = (px + (gx + u1) / fgrid) / fw
            sy = ((fh - py) + (gy + u2) / fgrid) / fh
            d = vnormalize(
                vsub(
                    vadd(vfull(p1, zf), vadd(vscale(vfull(du, zf), sx), vscale(vfull(dv, zf), sy))),
                    vfull(origin0, zf),
                )
            )
            return vfull(origin0, zf), d

        def trace(o, d):
            t_best = zf + BIG
            obj_best = zi - 1
            n_best = (zf, zf, zf)
            for i in range(P):
                r = plane_rec(i)
                denom = d[0] * r[0] + d[1] * r[1] + d[2] * r[2]
                onum = o[0] * r[0] + o[1] * r[1] + o[2] * r[2] + r[3]
                t_loc = -onum / jnp.where(denom == 0, 1.0, denom)
                t = t_loc * r[4]
                valid = (jnp.abs(denom) >= FLT_EPSILON) & (t_loc >= 0) & (t >= 0) & (t < t_best)
                t_best = jnp.where(valid, t, t_best)
                obj_best = jnp.where(valid, i, obj_best)
                n_best = vwhere(valid, vfull((r[5], r[6], r[7]), zf), n_best)
            if not rigid:
                # general transforms: object-space quadratic, det-scaled t,
                # fwd3 normal — identical structure to the forward kernel
                # (megakernel.py trace); material gradients only need the
                # primal geometry, so this is a drop-in replay
                if S <= UNROLL_OBJECTS:
                    for i in range(S):
                        t, valid, n_new = _sphere_hit_general(sphere_rec(i), o, d)
                        valid = valid & (t < t_best)
                        t_best = jnp.where(valid, t, t_best)
                        obj_best = jnp.where(valid, P + i, obj_best)
                        n_best = vwhere(valid, n_new, n_best)
                    return t_best, obj_best, n_best

                def sphere_step_g(i, carry):
                    t_best, obj_best, n0, n1, n2 = carry
                    base = off_spheres + i * SPF
                    rec = [scn_ref[0, base + j] for j in range(SPF)]
                    t, valid, n_new = _sphere_hit_general(rec, o, d)
                    valid = valid & (t < t_best)
                    return (
                        jnp.where(valid, t, t_best),
                        jnp.where(valid, P + i, obj_best),
                        jnp.where(valid, n_new[0], n0),
                        jnp.where(valid, n_new[1], n1),
                        jnp.where(valid, n_new[2], n2),
                    )

                t_best, obj_best, n0, n1, n2 = jax.lax.fori_loop(
                    0, S, sphere_step_g, (t_best, obj_best, n_best[0], n_best[1], n_best[2])
                )
                return t_best, obj_best, (n0, n1, n2)
            d_dot_o = vdot(d, o)
            o2 = vdot(o, o)
            if S <= UNROLL_OBJECTS:
                for i in range(S):
                    cx, cy, cz, r2 = sphere_rec(i)
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
                    valid = (discr >= 0) & (hi >= 0) & (q != 0) & (t >= 0) & (t < t_best)
                    t_best = jnp.where(valid, t, t_best)
                    obj_best = jnp.where(valid, P + i, obj_best)
                    n_new = vnormalize(vsub(vadd(o, vscale(d, t)), vfull((cx, cy, cz), zf)))
                    n_best = vwhere(valid, n_new, n_best)
                return t_best, obj_best, n_best

            def sphere_step(i, carry):
                # dynamic SMEM reads keep graph size O(1) in the object count
                # (same pattern as the forward kernel, megakernel.py)
                t_best, obj_best, n0, n1, n2 = carry
                base = off_spheres + i * _SP
                cx = scn_ref[0, base]
                cy = scn_ref[0, base + 1]
                cz = scn_ref[0, base + 2]
                r2 = scn_ref[0, base + 3]
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
                valid = (discr >= 0) & (hi >= 0) & (q != 0) & (t >= 0) & (t < t_best)
                n_new = vnormalize(vsub(vadd(o, vscale(d, t)), vfull((cx, cy, cz), zf)))
                return (
                    jnp.where(valid, t, t_best),
                    jnp.where(valid, P + i, obj_best),
                    jnp.where(valid, n_new[0], n0),
                    jnp.where(valid, n_new[1], n1),
                    jnp.where(valid, n_new[2], n2),
                )

            t_best, obj_best, n0, n1, n2 = jax.lax.fori_loop(
                0, S, sphere_step, (t_best, obj_best, n_best[0], n_best[1], n_best[2])
            )
            return t_best, obj_best, (n0, n1, n2)

        def tangent_frame(n):
            smallest = jnp.minimum(n[2], jnp.minimum(n[0], n[1]))
            mx = n[0] == smallest
            my = n[1] == smallest
            t = vwhere(mx, (zf, -n[2], n[1]), vwhere(my, (-n[2], zf, n[0]), (-n[1], n[0], zf)))
            up = vwhere(jnp.abs(n[1]) < 0.9, vfull((0.0, 1.0, 0.0), zf), vfull((1.0, 0.0, 0.0), zf))
            t = vwhere(vdot(t, t) < 1e-12, vcross(n, up), t)
            t = vnormalize(t)
            return t, vcross(n, t)

        def gather_mat(obj):
            if K <= UNROLL_OBJECTS + 8:
                fields = [zf] * _MA
                for k in range(K):
                    rec = mat_rec(k)
                    m = (obj == k).astype(jnp.float32)
                    for f in range(_MA):
                        fields[f] = fields[f] + m * rec[f]
                return fields

            def mat_step(k, fields):
                base = off_mats + k * _MA
                m = (obj == k).astype(jnp.float32)
                return tuple(fields[f] + m * scn_ref[0, base + f] for f in range(_MA))

            return list(jax.lax.fori_loop(0, K, mat_step, tuple([zf] * _MA)))

        def solid_angle(dist, rad):
            x = jnp.clip(rad / jnp.maximum(dist, 1e-30), 0.0, 1.0)
            # x²/(1+sqrt(1-x²)) == 1-sqrt(1-x²) without the cancellation
            # that rounds Ω to exactly 0 for far-grazing x (< ~2e-4),
            # whose 1/Ω pdf then NaNs every jvp (see ops/lights.py)
            omega = 2.0 * PI * (x * x) / (1.0 + safe_sqrt(1.0 - x * x))
            return jnp.where(dist < rad, 4.0 * PI, omega)

        def light_pdf_from(pos, prev_obj, hit_obj):
            pdf = zf
            for li in range(L):
                r = light_rec(li)
                delta = vsub(vfull((r[0], r[1], r[2]), zf), pos)
                dist = safe_sqrt(vdot(delta, delta))
                obj_id = jnp.int32(0) + r[7].astype(jnp.int32)
                ok = (hit_obj == obj_id) & (prev_obj != obj_id)
                pdf = pdf + jnp.where(ok, 1.0 / solid_angle(dist, r[3]), 0.0)
            return pdf

        # Mosaic has no scatter-add. Two accumulation designs:
        #
        # small K — gradients accumulate into carried per-(row, col)
        # [TILE_ROWS, 128] *planes* (only vector FMAs per iteration; each
        # plane reduced to its table scalar once, after the loop). Plane
        # keys: (k, c) for object rows 0..K-1 and cols 0..8 (diffuse3,
        # specular3, emission3) plus (K, 0..2) for the background.
        #
        # big K — per-iteration contributions are collected into 9+6 local
        # planes keyed by (hit object, previous object), then flushed by a
        # fori loop over K into a VMEM [K, 128] table via dynamic-row
        # stores (masked reduction per row, predicated on any-lane-match so
        # untouched rows cost one reduction). Graph size stays O(1) in K.
        if not big:
            PLANE_KEYS = [(k, c) for k in range(K) for c in range(9)] + [
                (K, c) for c in range(3)
            ]
            PK_INDEX = {kc: i for i, kc in enumerate(PLANE_KEYS)}

        def scatter_mask(acc, mask, row_k, cols3, vals3):
            """acc plane (row_k, c) += where(mask, v) (static row)."""
            for c, v in zip(cols3, vals3):
                i = PK_INDEX[(row_k, c)]
                acc[i] = acc[i] + jnp.where(mask, v, 0.0)
            return acc

        def scatter_obj(acc, mask, obj, cols3, vals3):
            """Same but row chosen per-lane by object id (masked loop over K)."""
            for k in range(K):
                mk = mask & (obj == k)
                for c, v in zip(cols3, vals3):
                    i = PK_INDEX[(k, c)]
                    acc[i] = acc[i] + jnp.where(mk, v, 0.0)
            return acc

        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def acc_row_add(row, cols, scalars):
            """acc_ref[row, c] += scalar for (c, scalar) pairs; row is traced."""
            delta = jnp.zeros((1, 128), jnp.float32)
            for c, sc in zip(cols, scalars):
                delta = delta + sc * (col_iota == c).astype(jnp.float32)
            acc_ref[pl.ds(row, 1), :] = acc_ref[pl.ds(row, 1), :] + delta

        def flush_keyed(key_plane, contribs, cols):
            """Table rows += masked sums of contribution planes, keyed per
            lane by ``key_plane`` (-1 = no contribution)."""

            def kstep(k, carry):
                mk = key_plane == k

                @pl.when(jnp.any(mk))
                def _():
                    acc_row_add(
                        k,
                        cols,
                        [jnp.sum(jnp.where(mk, plane, 0.0)) for plane in contribs],
                    )

                return carry

            jax.lax.fori_loop(0, K, kstep, 0)

        def init_state():
            sample = jnp.where(in_image, 0, eff)
            o, d = camera_ray(sample * 0)
            one = zf + 1.0
            return (
                sample, zi,                      # sample, phase
                zi,                              # depth
                o[0], o[1], o[2], d[0], d[1], d[2],
                one, one, one,                   # throughput / A
                zf, zf, zf,                      # Lcur (walk-1 accumulation)
                zf, zf, zf,                      # Rrem (walk-2 remaining)
                zi + 1, zi,                      # emit, mis_pending
                one,                             # pend_pdf_b
                one, one, one,                   # pend_fcos
                zi,                              # pend_delta
                zi - 1,                          # prev_obj
                zf, zf, zf,                      # prev_pos
                one, one, one,                   # pend_mat (color in deferred F)
                zi - 1,                          # pend_mobj
                zi - 1,                          # pend_mtab (0=diffuse,1=specular,-1 none)
                # gradient accumulation planes: per-(row,col) for small K,
                # background-only for big K (rest lives in the VMEM table)
                (zf, zf, zf) if big else tuple(zf for _ in PLANE_KEYS),
            )

        def cond(st):
            return jnp.any((st[0] < eff) | (st[1] > 0))

        def body(st):
            (sample, phase, depth, ox, oy, oz, dx, dy, dz, tr, tg, tb,
             lr, lg, lb, rr_, rg_, rb_, emit_f, misp_f, ppdf, pfr, pfg, pfb,
             pdelta_f, prev_obj, qx, qy, qz, pmr, pmg, pmb, pmobj, pmtab,
             gplanes) = st
            acc = list(gplanes)
            if big:
                c_obj = [zf] * 9  # contributions keyed by this vertex's object
                c_pm = [zf] * 6   # keyed by the previous vertex's object
            o = (ox, oy, oz)
            d = (dx, dy, dz)
            t3 = (tr, tg, tb)
            lcur = (lr, lg, lb)
            rrem = (rr_, rg_, rb_)
            in_phase1 = phase > 0
            active = (sample < eff) | in_phase1
            grading = active & in_phase1
            su = sample.astype(jnp.uint32)
            salt0 = depth.astype(jnp.uint32) * jnp.uint32(ncalls)
            us = []
            for i in range(ncalls):
                us.extend(_uniforms4(lane, su, salt0 + jnp.uint32(i), seed))

            t_hit, obj, normal = trace(o, d)
            was_hit = obj >= 0
            pos_hit = vadd(o, vscale(d, jnp.where(was_hit, t_hit, 0.0)))

            # ---- deferred MIS weight F (grad first, then apply) -------------
            pdf_l_vis = light_pdf_from((qx, qy, qz), prev_obj, obj) if L else zf
            if config.full_mis:
                pdf_l_vis = jnp.where(pdelta_f > 0, 0.0, pdf_l_vis)
            denom = pdf_l_vis + ppdf
            w = 1.0 / jnp.where(denom == 0, 1.0, denom)
            apply_w = (misp_f > 0) & active

            # F = pend_mat ⊙ s: everything still remaining is downstream of F
            fmask = apply_w & grading & (pmtab >= 0)
            pm = (pmr, pmg, pmb)
            coeff = tuple(
                jnp.where(p_ != 0, gc * rc / jnp.where(p_ == 0, 1.0, p_), 0.0)
                for p_, gc, rc in zip(pm, g3, rrem)
            )
            if big:
                for c in range(3):
                    c_pm[c] = c_pm[c] + jnp.where(fmask & (pmtab == 0), coeff[c], 0.0)
                    c_pm[3 + c] = c_pm[3 + c] + jnp.where(
                        fmask & (pmtab == 1), coeff[c], 0.0
                    )
            else:
                acc = scatter_obj(acc, fmask & (pmtab == 0), pmobj, (0, 1, 2), coeff)
                acc = scatter_obj(acc, fmask & (pmtab == 1), pmobj, (3, 4, 5), coeff)

            t3 = vwhere(apply_w, vmul(t3, vscale((pfr, pfg, pfb), w)), t3)

            # ---- miss: background ------------------------------------------
            miss = active & ~was_hit
            cbg = vmul(t3, vfull(bg, zf))
            lcur = vwhere(miss & ~in_phase1, vadd(lcur, cbg), lcur)
            if big:
                for c in range(3):
                    acc[c] = acc[c] + jnp.where(miss & grading, g3[c] * t3[c], 0.0)
            else:
                acc = scatter_mask(
                    acc, miss & grading, K, (0, 1, 2), tuple(gc * tc for gc, tc in zip(g3, t3))
                )
            rrem = vwhere(miss & grading, vsub(rrem, cbg), rrem)
            on_path = active & was_hit

            mats = gather_mat(jnp.maximum(obj, 0))
            md = (mats[0], mats[1], mats[2])
            ms = (mats[3], mats[4], mats[5])
            me = (mats[6], mats[7], mats[8])
            mt = (mats[9], mats[10], mats[11])
            mexp = mats[12]
            mior = mats[13]

            # ---- RR + depth ------------------------------------------------
            p_rr = jnp.maximum(
                jnp.maximum(jnp.maximum(md[0], ms[0]), jnp.maximum(md[1], ms[1])),
                jnp.maximum(
                    jnp.maximum(md[2], ms[2]),
                    jnp.maximum(jnp.maximum(mt[0], mt[1]), mt[2]),
                ),
            )
            cont = (p_rr > 0) & (us[0] <= p_rr)
            prob_rr = jnp.where(cont, p_rr, 1.0 - p_rr)
            t3 = vwhere(on_path, vscale(t3, 1.0 / prob_rr), t3)
            tk = t3
            emitter = on_path & (emit_f > 0)
            survive = on_path & cont & (depth < max_depth)

            # ---- lottery ----------------------------------------------------
            sum_d = md[0] + md[1] + md[2]
            sum_s = ms[0] + ms[1] + ms[2]
            sum_t = mt[0] + mt[1] + mt[2]
            total = sum_d + sum_s + sum_t
            p_t = jnp.where(total > 0, sum_t / jnp.where(total == 0, 1.0, total), 0.0)
            transmit = (p_t > 0) & (us[1] <= p_t)
            prob_t = jnp.where(transmit, p_t, 1.0 - p_t)
            t3 = vwhere(survive, vscale(t3, 1.0 / prob_t), t3)
            dsum = sum_d + sum_s
            p_d = jnp.where(dsum > 0, sum_d / jnp.where(dsum == 0, 1.0, dsum), 0.0)
            diffc = (p_d > 0) & (us[2] <= p_d)
            prob_d = jnp.where(diffc, p_d, 1.0 - p_d)
            t3 = vwhere(survive & ~transmit, vscale(t3, 1.0 / prob_d), t3)

            m_trans = survive & transmit
            m_lam = survive & ~transmit & diffc
            m_ph = survive & ~transmit & ~diffc & (mexp > 0)
            m_mir = survive & ~transmit & ~diffc & (mexp <= 0)
            scatter = m_lam | m_ph | m_mir

            view = d
            tangent, binormal = tangent_frame(normal)
            refl = reflect(view, normal)

            # ---- NEE --------------------------------------------------------
            if nee_on:
                if one_light:
                    # one uniformly selected light per lane (x L), the
                    # forward kernel's one-hot record gather — the selected
                    # object id is PER-LANE, so the emission gradient goes
                    # through the keyed paths instead of a uniform table row
                    li_v = jnp.minimum(
                        (us[5] * np.float32(L)).astype(jnp.int32), L - 1
                    )
                    rec_sel = [zf] * _LI
                    for li in range(L):
                        r_ = light_rec(li)
                        m_ = (li_v == li).astype(jnp.float32)
                        rec_sel = [rec_sel[f] + m_ * r_[f] for f in range(_LI)]
                    light_iter = [(rec_sel, us[6], us[7], us[8], np.float32(L))]
                    if big:
                        c_le = [zf] * 3  # keyed by the selected light's object
                else:
                    light_iter = [
                        (
                            light_rec(li),
                            us[5 + 3 * li],
                            us[6 + 3 * li],
                            us[7 + 3 * li],
                            np.float32(1.0),
                        )
                        for li in range(L)
                    ]
                nee = (zf, zf, zf)
                for r, u1, u2, u3, lscale in light_iter:
                    rad = r[3]
                    sx_ = rad * jnp.sqrt(u1) * jnp.cos(2.0 * PI * u2)
                    sy_ = rad * jnp.sqrt(u1) * jnp.sin(2.0 * PI * u2)
                    sz_ = safe_sqrt(rad * rad - sx_ * sx_ - sy_ * sy_) * jnp.sin(PI * (u3 - 0.5))
                    c = vfull((r[0], r[1], r[2]), zf)
                    dl = vnormalize(vsub(vadd(c, (sx_, sy_, sz_)), pos_hit))
                    delta = vsub(c, pos_hit)
                    dist = safe_sqrt(vdot(delta, delta))
                    pdf_l = 1.0 / solid_angle(dist, rad)
                    _, st_obj, _ = trace(vadd(pos_hit, vscale(dl, eps)), dl)
                    obj_id = jnp.int32(0) + r[7].astype(jnp.int32)
                    visible = st_obj == obj_id
                    not_self = obj != obj_id
                    cosl = vdot(normal, dl)
                    lobe_l = (mexp + 1.0) / (2.0 * PI) * safe_pow(
                        jnp.maximum(vdot(refl, dl), 0.0), mexp
                    )
                    # fcos = mat ⊙ s_vec
                    s_lam = jnp.maximum(cosl, 0.0) / PI
                    s_ph = lobe_l * jnp.maximum(cosl, 0.0)
                    pdf_b_l = jnp.where(m_lam, cosl / PI, jnp.where(m_ph, lobe_l, 0.0))
                    ok = visible & not_self & (pdf_b_l != 0) & (pdf_l > 0)
                    wl = jnp.where(ok, lscale / (pdf_b_l + pdf_l), 0.0)
                    le = vfull((r[4], r[5], r[6]), zf)
                    s_sel = jnp.where(m_lam, s_lam, jnp.where(m_ph, s_ph, 0.0))
                    mat_sel = vwhere(m_lam, md, vwhere(m_ph, ms, (zf, zf, zf)))
                    fcos_l = vscale(mat_sel, s_sel)
                    nee = vadd(nee, vscale(vmul(fcos_l, le), wl))

                    # walk-2 gradients for this light's NEE term
                    gm = scatter & grading
                    base = tuple(gc * tc * wl for gc, tc in zip(g3, t3))
                    # ∂/∂Le (emission of the light's material)
                    row = obj_id  # object id: uniform scalar per light, or
                    #               per-lane under one-light selection
                    vals_le = tuple(b * f for b, f in zip(base, fcos_l))
                    vals_mat = tuple(b * s_sel * l_ for b, l_ in zip(base, le))
                    if big and one_light:
                        # per-lane row: route through the keyed c_le planes
                        # (flushed with flush_keyed below, like c_obj/c_pm)
                        lsel_key = row
                        for c in range(3):
                            c_le[c] = c_le[c] + jnp.where(gm, vals_le[c], 0.0)
                        for c in range(3):
                            c_obj[c] = c_obj[c] + jnp.where(gm & m_lam, vals_mat[c], 0.0)
                            c_obj[3 + c] = c_obj[3 + c] + jnp.where(
                                gm & m_ph, vals_mat[c], 0.0
                            )
                    elif big:
                        @pl.when(jnp.any(gm))
                        def _(vals_le=vals_le, gm=gm, row=row):
                            acc_row_add(
                                row,
                                (6, 7, 8),
                                [jnp.sum(jnp.where(gm, v, 0.0)) for v in vals_le],
                            )

                        for c in range(3):
                            c_obj[c] = c_obj[c] + jnp.where(gm & m_lam, vals_mat[c], 0.0)
                            c_obj[3 + c] = c_obj[3 + c] + jnp.where(
                                gm & m_ph, vals_mat[c], 0.0
                            )
                    else:
                        for k in range(K):
                            mk = gm & (row == k)
                            for cidx, v in zip((6, 7, 8), vals_le):
                                i = PK_INDEX[(k, cidx)]
                                acc[i] = acc[i] + jnp.where(mk, v, 0.0)
                        # ∂/∂diffuse or ∂/∂specular at the hit object
                        acc = scatter_obj(acc, gm & m_lam, obj, (0, 1, 2), vals_mat)
                        acc = scatter_obj(acc, gm & m_ph, obj, (3, 4, 5), vals_mat)
                cne = vmul(t3, nee)
                lcur = vwhere(scatter & ~in_phase1, vadd(lcur, cne), lcur)
                rrem = vwhere(scatter & grading, vsub(rrem, cne), rrem)

            # ---- continuation sample ---------------------------------------
            u1, u2 = us[3], us[4]
            cos_a = vdot(view, normal)
            entering = cos_a < 0
            n_eff = vwhere(entering, normal, vscale(normal, -1.0))
            eta = jnp.where(entering, 1.0 / mior, mior)
            ci = vdot(view, n_eff)
            kk = 1.0 - eta * eta * (1.0 - ci * ci)
            refr = vsub(vscale(view, eta), vscale(n_eff, eta * ci + safe_sqrt(kk)))
            d_trans = vwhere(kk < 0, reflect(view, n_eff), refr)
            rl = jnp.sqrt(u1)
            phi = u2 * 2.0 * PI
            lz = safe_sqrt(1.0 - u1)
            d_lam = vadd(
                vadd(vscale(tangent, rl * jnp.cos(phi)), vscale(binormal, rl * jnp.sin(phi))),
                vscale(normal, lz),
            )
            pdf_lam = lz / PI
            zax = vfull((0.0, 0.0, 1.0), zf)
            uax = vcross(zax, refl)
            degen = vdot(uax, uax) < 1e-12
            uax = vnormalize(vwhere(degen, vcross(vfull((0.0, 1.0, 0.0), zf), refl), uax))
            vax = vcross(uax, refl)
            cos_ph = safe_pow(u1, 1.0 / (mexp + 1.0))
            sin_ph = safe_sqrt(1.0 - cos_ph * cos_ph)
            d_ph = vadd(
                vadd(vscale(uax, sin_ph * jnp.cos(phi)), vscale(vax, sin_ph * jnp.sin(phi))),
                vscale(refl, cos_ph),
            )
            pdf_ph = (mexp + 1.0) / (2.0 * PI) * safe_pow(cos_ph, mexp)

            new_d = vwhere(m_trans, d_trans, vwhere(m_lam, d_lam, vwhere(m_ph, d_ph, refl)))
            pdf_b = jnp.where(m_lam, pdf_lam, jnp.where(m_ph, pdf_ph, 1.0))
            cos_nd = vdot(normal, new_d)
            lobe_c = (mexp + 1.0) / (2.0 * PI) * safe_pow(jnp.maximum(vdot(refl, d_ph), 0.0), mexp)
            # fcos = mat_sel ⊙ s_cont
            s_cont = jnp.where(
                m_trans,
                1.0,
                jnp.where(
                    m_lam,
                    jnp.maximum(cos_nd, 0.0) / PI,
                    jnp.where(
                        m_ph,
                        lobe_c * jnp.maximum(cos_nd, 0.0),
                        jnp.where(cos_nd > 0, 1.0, 0.0),
                    ),
                ),
            )
            mat_cont = vwhere(m_lam, md, ms)  # specular for trans/phong/mirror
            fcos = vscale(mat_cont, s_cont)

            # transmission applies its factor immediately: grad before multiply
            tmask = m_trans & grading
            coeff_t = tuple(
                jnp.where(mc != 0, gc * rc / jnp.where(mc == 0, 1.0, mc), 0.0)
                for mc, gc, rc in zip(ms, g3, rrem)
            )
            if big:
                for c in range(3):
                    c_obj[3 + c] = c_obj[3 + c] + jnp.where(tmask, coeff_t[c], 0.0)
            else:
                acc = scatter_obj(acc, tmask, obj, (3, 4, 5), coeff_t)
            t3 = vwhere(m_trans, vmul(t3, fcos), t3)

            # emission at this vertex
            t_em = vwhere(survive, t3, tk)
            cem = vmul(t_em, me)
            lcur = vwhere(emitter & ~in_phase1, vadd(lcur, cem), lcur)
            if big:
                for c in range(3):
                    c_obj[6 + c] = c_obj[6 + c] + jnp.where(
                        emitter & grading, g3[c] * t_em[c], 0.0
                    )
            else:
                acc = scatter_obj(
                    acc,
                    emitter & grading,
                    obj,
                    (6, 7, 8),
                    tuple(gc * tc for gc, tc in zip(g3, t_em)),
                )
            rrem = vwhere(emitter & grading, vsub(rrem, cem), rrem)

            if big:
                # flush this iteration's keyed contributions into the table
                flush_keyed(obj, c_obj, (0, 1, 2, 3, 4, 5, 6, 7, 8))
                flush_keyed(pmobj, c_pm, (0, 1, 2, 3, 4, 5))
                if nee_on and one_light:
                    flush_keyed(lsel_key, c_le, (6, 7, 8))

            continuing = survive & (m_trans | (pdf_b != 0))
            path_end = active & ~continuing

            # ---- phase transitions / regeneration ---------------------------
            # phase 0 ending -> replay same sample in phase 1
            to_grad = path_end & ~in_phase1
            # phase 1 ending -> next sample, phase 0
            to_next = path_end & in_phase1
            new_sample = jnp.where(to_next, sample + 1, sample)
            new_phase = jnp.where(to_grad, 1, jnp.where(to_next, 0, phase))
            restart = path_end  # both transitions restart a walk from the camera
            o_cam, d_cam = camera_ray(jnp.minimum(new_sample, eff - 1))

            new_o = vwhere(
                continuing, vadd(pos_hit, vscale(new_d, eps)), vwhere(restart, o_cam, o)
            )
            new_dir = vwhere(continuing, new_d, vwhere(restart, d_cam, d))
            t3 = vwhere(restart, vfull((1.0, 1.0, 1.0), zf), t3)
            lcur = vwhere(to_next, (zf, zf, zf), lcur)
            rrem = vwhere(to_grad, lcur, rrem)

            sc = scatter & ~path_end
            new_pmtab = jnp.where(sc & m_lam, 0, jnp.where(sc & (m_ph | m_mir), 1, -1))
            return (
                new_sample, new_phase,
                jnp.where(restart, 0, depth + 1),
                new_o[0], new_o[1], new_o[2], new_dir[0], new_dir[1], new_dir[2],
                t3[0], t3[1], t3[2],
                lcur[0], lcur[1], lcur[2],
                rrem[0], rrem[1], rrem[2],
                jnp.where(restart, 1, jnp.where(scatter, jnp.int32(emit_after_scatter), emit_f)),
                jnp.where(sc, 1, 0).astype(jnp.int32),
                jnp.where(sc, pdf_b, 1.0),
                jnp.where(sc, fcos[0], 1.0),
                jnp.where(sc, fcos[1], 1.0),
                jnp.where(sc, fcos[2], 1.0),
                jnp.where(m_mir & ~path_end, 1, 0).astype(jnp.int32),
                jnp.where(sc, obj, -1),
                jnp.where(sc, pos_hit[0], 0.0),
                jnp.where(sc, pos_hit[1], 0.0),
                jnp.where(sc, pos_hit[2], 0.0),
                jnp.where(sc, mat_cont[0], 1.0),
                jnp.where(sc, mat_cont[1], 1.0),
                jnp.where(sc, mat_cont[2], 1.0),
                jnp.where(sc, obj, -1),
                new_pmtab,
                tuple(acc),
            )

        if big:
            acc_ref[...] = jnp.zeros_like(acc_ref)
        final = jax.lax.while_loop(cond, body, init_state())
        planes = final[-1]
        if big:
            # planes here are the 3 background accumulators; everything else
            # already lives in the acc table
            acc_row_add(K, (0, 1, 2), [jnp.sum(p) for p in planes])
            out_ref[0] = acc_ref[0:Krows, :]
        else:
            gtab = jnp.zeros((Krows, 16), jnp.float32)
            _b_rows = jax.lax.broadcasted_iota(jnp.int32, (Krows, 16), 0)
            _b_cols = jax.lax.broadcasted_iota(jnp.int32, (Krows, 16), 1)
            for (k, c), plane in zip(PLANE_KEYS, planes):
                basis = ((_b_rows == k) & (_b_cols == c)).astype(jnp.float32)
                gtab = gtab + jnp.sum(plane) * basis
            out_ref[0] = gtab

    return kernel


@partial(jax.jit, static_argnames=("width", "height", "spp", "config"))
def material_grads(
    scene: Scene,
    key: jax.Array,
    cotangent: jax.Array,
    width: int,
    height: int,
    spp: int,
    config: RenderConfig = RenderConfig(),
):
    """d(Σ cotangent ⊙ image)/d(materials) for the megakernel render.

    ``cotangent``: [H, W, 3or4] upstream gradient (e.g. from an L2 loss).
    Returns dict(diffuse=[K,3], specular=[K,3], emission=[K,3], background=[3]).
    """
    prep = prepare_scene(scene)
    grid_n = max(int(spp**0.5), 1)
    eff = grid_n * grid_n
    divisor = float(spp if config.kajo_spp_quirk else eff)

    n = width * height
    rows_n = -(-n // 128)
    rows_pad = -(-rows_n // TILE_ROWS) * TILE_ROWS
    n_tiles = rows_pad // TILE_ROWS

    P, S, L = scene.num_planes, scene.num_spheres, scene.num_lights
    K = P + S
    kernel = _build_grad_kernel(
        width, height, grid_n, eff, config, P, S, L, rigid=prep.rigid
    )

    packed = _pack_scene(prep)
    seed = jnp.asarray(seed_from_key(key), jnp.uint32).reshape(1, 1)
    g = jnp.asarray(cotangent, jnp.float32)[..., :3].reshape(n, 3) / divisor
    g_lanes = jnp.zeros((3, rows_pad * 128), jnp.float32)
    g_lanes = g_lanes.at[:, :n].set(g.T).reshape(3, rows_pad, 128)

    big = K > GRAD_UNROLL_OBJECTS
    cols = 128 if big else 16
    krow_pad = -(-(K + 1) // 8) * 8
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, K + 1, cols), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, TILE_ROWS, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K + 1, cols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((krow_pad, 128), jnp.float32)] if big else [],
    )(seed, packed, g_lanes)

    table = jnp.sum(out, axis=0)[:, :16]
    return {
        "diffuse": table[:K, 0:3],
        "specular": table[:K, 3:6],
        "emission": table[:K, 6:9],
        "background": table[K, 0:3],
    }


def make_diff_renderer(
    width: int,
    height: int,
    spp: int,
    config: RenderConfig = RenderConfig(),
    geometry: bool = False,
):
    """A render function differentiable w.r.t. material colors + background.

    Returns ``render(scene, key) -> [H, W, 4]`` whose VJP runs the fused
    backward kernel. Gradients flow to materials.{diffuse, specular, emission}
    and the background — transparency/IOR/exponent get zero here by the
    detached-probability convention.

    ``geometry=True`` additionally runs the reverse-mode geometry kernel
    (megakernel_geom.geometry_grads) in the VJP: sphere centers (the
    translation column of ``sphere_transform``) and ``sphere_radius`` get
    interior gradients at kernel speed; rotation entries stay zero (exact
    for spheres) and silhouettes are detached (compose with diff/edges.py
    for boundary terms)."""
    import dataclasses

    from .megakernel import render_pass_megakernel

    @jax.custom_vjp
    def render(scene, key):
        return render_pass_megakernel(scene, key, width, height, spp, config)

    def fwd(scene, key):
        return render(scene, key), (scene, key)

    def bwd(res, g):
        scene, key = res
        gr = material_grads(scene, key, g, width, height, spp, config)
        zero = jax.tree.map(jnp.zeros_like, scene)

        def pad4(a):  # [K,3] -> [K,4] (alpha cotangent 0)
            return jnp.pad(a, ((0, 0), (0, 1)))

        mats = dataclasses.replace(
            zero.materials,
            diffuse=pad4(gr["diffuse"]),
            specular=pad4(gr["specular"]),
            emission=pad4(gr["emission"]),
        )
        scene_bar = dataclasses.replace(
            zero, materials=mats, background=jnp.append(gr["background"], 0.0)
        )
        if geometry:
            from .megakernel_geom import geometry_grads

            gg = geometry_grads(scene, key, g, width, height, spp, config)
            scene_bar = dataclasses.replace(
                scene_bar,
                sphere_transform=zero.sphere_transform.at[:, :3, 3].set(gg["center"]),
                sphere_radius=gg["radius"],
            )
        key_bar = np.zeros(key.shape, jax.dtypes.float0)
        return scene_bar, key_bar

    render.defvjp(fwd, bwd)
    return render
