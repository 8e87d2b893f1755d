"""Fused reverse-mode GEOMETRY gradients: per-sphere replay with one-hot jvp.

Completes the fused-backward story (VERDICT round-1 item 4, second half):
gradients of the rendered image w.r.t. EVERY sphere's center and radius from
one self-contained kernel — the many-parameter geometry case (e.g. all
sphere positions of a field) that the forward-mode kernel
(megakernel.render_pass_megakernel_jvp, one kernel per scalar) cannot cover
and the jax budget engine covers only at ~1M samples/s.

Reverse-mode through the path-tracing loop is impossible directly (the
regenerating walk is a `while_loop`; taping it would need O(depth) VMEM per
lane), and the Path Replay trick used for materials (megakernel_grad.py)
relies on radiance being *linear* in the parameter — false for geometry.
The key observation here: a path's radiance depends on the geometry of only
the handful of DISTINCT spheres the path hits (visibility is discrete ==
detached, exactly like the jax engines' interior gradient; boundary terms
live in diff/edges.py). So reverse-mode over 100k parameters collapses to a
few forward-mode directions per path:

  phase 0   walk the sample once, recording the distinct spheres it hits
            (up to ``TRACK_SLOTS``);
  replay    for each recorded sphere j and each direction p in (cx, cy, cz,
            r^2): walk the SAME path again (same PCG4D stream, bit-identical
            branch decisions) with a per-lane one-hot tangent injected at
            every read of sphere j's record — `jax.jvp` inside the kernel
            threads d(hit t)/dθ, d(normal)/dθ, sampled directions, pdfs, MIS
            weights and NEE factors through the walk; at walk end the scalar
            dΣ(g·L)/dθ_jp is flushed into a VMEM [S, 128] table row j.

Because the tangent enters ONLY through the explicit `(i == j)·δ` term (the
SMEM scene reads stay primal constants), the fori-loop object scan works
unmodified — this kernel scales to MAX_KERNEL_OBJECTS (512), unlike the
forward-mode kernel's unrolled-only restriction.

Semantics scope (== the jax budget engine's interior gradient, validated in
tests/test_megakernel_geom.py):
  * sphere-as-OBJECT geometry: hit distance + normal derivatives, with the
    discrete branch probabilities and visibility detached — matches
    jax.grad of models/wavefront.render_pass_budget. Rigid scenes inject
    the delta into the 4-float world-space record; general (scaled/sheared)
    transforms into the 23-float object-space record, where the center
    tangent rides invt (d invt/d c = -inv3, exact — inv3/fwd3/det are
    center-independent) and the radius tangent rides r^2;
  * sphere-as-LIGHT geometry IS differentiated (VERDICT round-2 item 7):
    the NEE sample position and 1/Ω pdf (plus the deferred-MIS light pdf)
    are closed-form in the emitter's center/radius, so the same one-hot
    delta is injected into the light record whenever the replayed sphere is
    a light. Light spheres get dedicated replay slots after the discovery
    slots, scheduled from per-light flags recorded during the discovery
    walk (NEE contribution fired, or the light was hit directly) — a path
    that never hits the light still differentiates its shadow-ray terms.
    NEE *visibility* stays detached (boundary term: diff/edges.py).
  * paths touching more than TRACK_SLOTS (8) distinct non-light spheres
    drop the extras' contributions. Quantified (round 4): an adversarial
    glossy mirror-cavity where 87% of pixels visit >4 distinct spheres
    showed up to ~13x relative gradient deviation at 4 slots and exact
    agreement with the uncapped forward-jvp kernel at 8 — hence 8. Slots
    only cost replays when FILLED, so ordinary scenes pay nothing for the
    headroom (tests/test_megakernel_geom.py::test_track_slots_truncation_quantified).
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
from .megakernel import (
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

# Distinct spheres tracked per path (== replay fan-out cap). Replays are
# scheduled only for FILLED slots, so typical scenes (few distinct spheres
# per path) pay nothing for the headroom; deep multi-sphere chains would
# otherwise DROP the extras' gradient mass — measured up to ~13x relative
# deviation on an adversarial 6-sphere glossy cavity at 4 slots, exact at 8
# (tests/test_megakernel_geom.py::test_track_slots_truncation_quantified).
TRACK_SLOTS = 8


def supports(scene: Scene) -> bool:
    from .megakernel import supports as fwd_supports

    # rigid scenes replay against the 4-float world-space record; general
    # (scaled/sheared) transforms against the 23-float object-space record —
    # the center tangent rides invt (d invt/d c = -inv3, exact), the radius
    # tangent rides r^2, and fwd3/det are c- and r-independent
    return bool(fwd_supports(scene) and scene.num_spheres > 0)


def _build_geom_kernel(
    width, height, grid_n, eff, config: RenderConfig, P, S, L, rigid=True
):
    K = P + S
    max_depth = config.max_depth
    eps = np.float32(config.surface_epsilon)
    emit_after_scatter = bool((not config.direct_lighting) or config.full_mis)
    nee_on = bool(config.direct_lighting and L > 0)
    # one-of-L light sampling: same stream/budget as the forward kernel
    # (us[5] selects, us[6:9] sample; L > 1 keeps the uniform count equal)
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

    def kernel(seed_ref, scn_ref, g_ref, out_ref, acc_ref):
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
        g3 = (g_ref[0], g_ref[1], g_ref[2])

        def plane_rec(i):
            b = off_planes + i * _PL
            return [s_(b + j) for j in range(_PL)]

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

        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def acc_row_add(row, cols_, scalars):
            delta = jnp.zeros((1, 128), jnp.float32)
            for c, sc in zip(cols_, scalars):
                delta = delta + sc * (col_iota == c).astype(jnp.float32)
            acc_ref[pl.ds(row, 1), :] = acc_ref[pl.ds(row, 1), :] + delta

        def init_state():
            sample = jnp.where(in_image, 0, eff)
            o, d = camera_ray(sample * 0)
            one = zf + 1.0
            neg1 = zi - 1
            return (
                sample,
                neg1,                    # slot: -1 = discovery walk
                zi,                      # dirp
                zi,                      # depth
                # slots 0..TRACK_SLOTS-1 (touched sphere ids)
                *([neg1] * TRACK_SLOTS),
                neg1,                    # jsel (selected sphere this walk)
                zi + 1, zi,              # emit, mis_pending
                zi,                      # pend_delta
                neg1,                    # prev_obj
                zi,                      # lflags (per-light replay bitmask)
                # primal continuous state
                o[0], o[1], o[2], d[0], d[1], d[2],
                one, one, one,           # throughput
                zf, zf, zf,              # prev_pos q
                one, one, one,           # pend_fcos
                one,                     # pend_pdf_b
                # tangent partners (same order: o, d, t3, q, pf, ppdf)
                zf, zf, zf, zf, zf, zf,
                zf, zf, zf,
                zf, zf, zf,
                zf, zf, zf,
                zf,
                zf,                      # dL_dot (g-weighted tangent so far)
            )

        def cond(st):
            return jnp.any(st[0] < eff)

        def body(st):
            (sample, slot, dirp, depth) = st[0:4]
            svals = list(st[4 : 4 + TRACK_SLOTS])
            (jsel,
             emit_f, misp_f, pdelta_f, prev_obj, lflags,
             ox, oy, oz, dx, dy, dz, tr, tg, tb, qx, qy, qz,
             pfr, pfg, pfb, ppdf,
             dox, doy, doz, ddx, ddy, ddz, dtr, dtg, dtb,
             dqx, dqy, dqz, dpfr, dpfg, dpfb, dppdf,
             dL) = st[4 + TRACK_SLOTS :]

            active = sample < eff
            su = sample.astype(jnp.uint32)
            salt0 = depth.astype(jnp.uint32) * jnp.uint32(ncalls)
            us = []
            for i in range(ncalls):
                us.extend(_uniforms4(lane, su, salt0 + jnp.uint32(i), seed))

            # ---- one path step as a pure function of the continuous state
            # plus the selected sphere's 4-scalar perturbation delta (primal
            # 0, tangent one-hot) — jax.jvp threads the geometry derivative
            # through trace, NEE, sampling, pdfs and the deferred MIS weight.
            def step(o0, o1_, o2_, d0, d1_, d2_, t0, t1_, t2_,
                     q0, q1_, q2_, pf0, pf1, pf2, ppdf_, de0, de1, de2, de3):
                o = (o0, o1_, o2_)
                d = (d0, d1_, d2_)
                t3 = (t0, t1_, t2_)
                delta = (de0, de1, de2, de3)

                def trace(o, d, perturb):
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
                        # general record: the center perturbation enters the
                        # OBJECT-SPACE formulation through invt (invt =
                        # -inv3 @ c, so d invt/d c_p = -inv3 column p — the
                        # inv3 entries are primal SMEM constants, making the
                        # product's tangent exact), the radius^2 perturbation
                        # through rec[12]; det and fwd3 are c/r-independent
                        def sphere_hit_g(i, rec, carry):
                            t_best, obj_best, n0, n1, n2 = carry
                            if perturb:
                                selm = (jsel == i).astype(jnp.float32)
                                rec = list(rec)
                                rec[9] = rec[9] - selm * (
                                    rec[0] * delta[0] + rec[1] * delta[1] + rec[2] * delta[2]
                                )
                                rec[10] = rec[10] - selm * (
                                    rec[3] * delta[0] + rec[4] * delta[1] + rec[5] * delta[2]
                                )
                                rec[11] = rec[11] - selm * (
                                    rec[6] * delta[0] + rec[7] * delta[1] + rec[8] * delta[2]
                                )
                                rec[12] = rec[12] + selm * delta[3]
                            t, valid, n_new = _sphere_hit_general(rec, o, d)
                            valid = valid & (t < t_best)
                            return (
                                jnp.where(valid, t, t_best),
                                jnp.where(valid, P + i, obj_best),
                                jnp.where(valid, n_new[0], n0),
                                jnp.where(valid, n_new[1], n1),
                                jnp.where(valid, n_new[2], n2),
                            )

                        if S <= UNROLL_OBJECTS:
                            carry = (t_best, obj_best, *n_best)
                            for i in range(S):
                                b_ = off_spheres + i * SPF
                                carry = sphere_hit_g(
                                    i, [s_(b_ + j) for j in range(SPF)], carry
                                )
                            t_best, obj_best, n0, n1, n2 = carry
                        else:

                            def sphere_step_g(i, carry):
                                b_ = off_spheres + i * SPF
                                return sphere_hit_g(
                                    i, [scn_ref[0, b_ + j] for j in range(SPF)], carry
                                )

                            t_best, obj_best, n0, n1, n2 = jax.lax.fori_loop(
                                0, S, sphere_step_g, (t_best, obj_best, *n_best)
                            )
                        return t_best, obj_best, (n0, n1, n2)

                    d_dot_o = vdot(d, o)
                    o2 = vdot(o, o)

                    def sphere_hit(i, cx, cy, cz, r2, carry):
                        t_best, obj_best, n0, n1, n2 = carry
                        if perturb:
                            selm = (jsel == i).astype(jnp.float32)
                            cx = cx + selm * delta[0]
                            cy = cy + selm * delta[1]
                            cz = cz + selm * delta[2]
                            r2 = r2 + selm * delta[3]
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
                        n_new = vnormalize(vsub(vadd(o, vscale(d, t)), (cx, cy, cz)))
                        return (
                            jnp.where(valid, t, t_best),
                            jnp.where(valid, P + i, obj_best),
                            jnp.where(valid, n_new[0], n0),
                            jnp.where(valid, n_new[1], n1),
                            jnp.where(valid, n_new[2], n2),
                        )

                    if S <= UNROLL_OBJECTS:
                        carry = (t_best, obj_best, *n_best)
                        for i in range(S):
                            b_ = off_spheres + i * _SP
                            carry = sphere_hit(
                                i, s_(b_), s_(b_ + 1), s_(b_ + 2), s_(b_ + 3), carry
                            )
                        t_best, obj_best, n0, n1, n2 = carry
                    else:

                        def sphere_step(i, carry):
                            b_ = off_spheres + i * _SP
                            return sphere_hit(
                                i,
                                scn_ref[0, b_],
                                scn_ref[0, b_ + 1],
                                scn_ref[0, b_ + 2],
                                scn_ref[0, b_ + 3],
                                carry,
                            )

                        t_best, obj_best, n0, n1, n2 = jax.lax.fori_loop(
                            0, S, sphere_step, (t_best, obj_best, *n_best)
                        )
                    return t_best, obj_best, (n0, n1, n2)

                t_hit, obj, normal = trace(o, d, True)
                was_hit = obj >= 0
                pos_hit = vadd(o, vscale(d, jnp.where(was_hit, t_hit, 0.0)))

                # light-record perturbation: when the replayed sphere IS a
                # light, the same one-hot delta rides its NEE-sampler role
                # (sample position, solid-angle pdfs). delta[3] is d/d(r^2),
                # so the perturbed radius^2 is rad^2 + selm*delta[3]; primal
                # is bit-identical (delta primal is 0, safe_sqrt(r*r) == r).
                def light_geo(li):
                    r = light_rec(li)
                    selm = ((jsel + P) == r[7].astype(jnp.int32)).astype(
                        jnp.float32
                    )
                    c = (
                        r[0] + selm * delta[0],
                        r[1] + selm * delta[1],
                        r[2] + selm * delta[2],
                    )
                    rad2 = r[3] * r[3] + selm * delta[3]
                    return r, c, rad2, safe_sqrt(rad2)

                # deferred MIS weight (tangent via prev_pos q and ppdf)
                q3_ = (q0, q1_, q2_)
                if L:
                    pdf_l_vis = zf
                    for li in range(L):
                        r, c_l, _, rad_l = light_geo(li)
                        delta_l = vsub(vfull(c_l, zf), q3_)
                        dist_l = safe_sqrt(vdot(delta_l, delta_l))
                        obj_id = jnp.int32(0) + r[7].astype(jnp.int32)
                        okl = (obj == obj_id) & (prev_obj != obj_id)
                        pdf_l_vis = pdf_l_vis + jnp.where(
                            okl, 1.0 / solid_angle(dist_l, rad_l), 0.0
                        )
                else:
                    pdf_l_vis = zf
                if config.full_mis:
                    pdf_l_vis = jnp.where(pdelta_f > 0, 0.0, pdf_l_vis)
                denom = pdf_l_vis + ppdf_
                w = 1.0 / jnp.where(denom == 0, 1.0, denom)
                apply_w = (misp_f > 0) & active
                t3 = vwhere(apply_w, vmul(t3, vscale((pf0, pf1, pf2), w)), t3)

                contrib = (zf, zf, zf)
                miss = active & ~was_hit
                contrib = vwhere(miss, vmul(t3, vfull(bg, zf)), contrib)
                on_path = active & was_hit

                mats = gather_mat(jnp.maximum(obj, 0))
                md = (mats[0], mats[1], mats[2])
                ms = (mats[3], mats[4], mats[5])
                me = (mats[6], mats[7], mats[8])
                mt = (mats[9], mats[10], mats[11])
                mexp = mats[12]
                mior = mats[13]

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

                nee_ok = []
                if nee_on:
                    if one_light:
                        # one-hot gathered light record (forward kernel's
                        # one-light path); the replayed sphere's delta rides
                        # the GATHERED record — selm compares against the
                        # per-lane selected object id, so the injection is
                        # live exactly when the selected light is replayed
                        li_v = jnp.minimum(
                            (us[5] * np.float32(L)).astype(jnp.int32), L - 1
                        )
                        rsel = [zf] * _LI
                        for li_ in range(L):
                            r_ = light_rec(li_)
                            m_ = (li_v == li_).astype(jnp.float32)
                            rsel = [rsel[f] + m_ * r_[f] for f in range(_LI)]
                        selm_s = ((jsel + P) == rsel[7].astype(jnp.int32)).astype(
                            jnp.float32
                        )
                        c_sel = (
                            rsel[0] + selm_s * delta[0],
                            rsel[1] + selm_s * delta[1],
                            rsel[2] + selm_s * delta[2],
                        )
                        rad2_sel = rsel[3] * rsel[3] + selm_s * delta[3]
                        light_iter = [
                            (rsel, c_sel, rad2_sel, safe_sqrt(rad2_sel),
                             us[6], us[7], us[8], np.float32(L))
                        ]
                    else:
                        light_iter = [
                            (*light_geo(li_), us[5 + 3 * li_], us[6 + 3 * li_],
                             us[7 + 3 * li_], np.float32(1.0))
                            for li_ in range(L)
                        ]
                    nee = (zf, zf, zf)
                    for r, c_l, rad2_l, rad, u1, u2, u3, lscale in light_iter:
                        sx_ = rad * jnp.sqrt(u1) * jnp.cos(2.0 * PI * u2)
                        sy_ = rad * jnp.sqrt(u1) * jnp.sin(2.0 * PI * u2)
                        sz_ = safe_sqrt(rad2_l - sx_ * sx_ - sy_ * sy_) * jnp.sin(
                            PI * (u3 - 0.5)
                        )
                        c = vfull(c_l, zf)
                        dl = vnormalize(vsub(vadd(c, (sx_, sy_, sz_)), pos_hit))
                        delta_l = vsub(c, pos_hit)
                        dist = safe_sqrt(vdot(delta_l, delta_l))
                        pdf_l = 1.0 / solid_angle(dist, rad)
                        # visibility is discrete (detached in the interior
                        # gradient): trace primal-only on detached inputs —
                        # jvp emits no tangent ops for it
                        _, st_obj, _ = trace(
                            jax.lax.stop_gradient(vadd(pos_hit, vscale(dl, eps))),
                            jax.lax.stop_gradient(dl),
                            False,
                        )
                        obj_id = jnp.int32(0) + r[7].astype(jnp.int32)
                        visible = st_obj == obj_id
                        not_self = obj != obj_id
                        cosl = vdot(normal, dl)
                        lobe_l = (mexp + 1.0) / (2.0 * PI) * safe_pow(
                            jnp.maximum(vdot(refl, dl), 0.0), mexp
                        )
                        pdf_b_l = jnp.where(m_lam, cosl / PI, jnp.where(m_ph, lobe_l, 0.0))
                        fcos_l = vwhere(
                            m_lam,
                            vscale(md, jnp.maximum(cosl, 0.0) / PI),
                            vwhere(
                                m_ph,
                                vscale(ms, lobe_l * jnp.maximum(cosl, 0.0)),
                                (zf, zf, zf),
                            ),
                        )
                        ok = visible & not_self & (pdf_b_l != 0) & (pdf_l > 0)
                        wl = jnp.where(ok, lscale / (pdf_b_l + pdf_l), 0.0)
                        nee = vadd(nee, vscale(vmul(fcos_l, vfull((r[4], r[5], r[6]), zf)), wl))
                        # float-encoded flag(s) for the discovery walk: this
                        # light's shadow term contributed at this vertex
                        if one_light:
                            # one iteration, L flags: the term belongs to the
                            # per-lane SELECTED light
                            for lj in range(L):
                                nee_ok.append(
                                    jnp.where(scatter & ok & (li_v == lj), 1.0, 0.0)
                                )
                        else:
                            nee_ok.append(jnp.where(scatter & ok, 1.0, 0.0))
                    contrib = vwhere(scatter, vadd(contrib, vmul(t3, nee)), contrib)

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
                lobe_c = (mexp + 1.0) / (2.0 * PI) * safe_pow(
                    jnp.maximum(vdot(refl, d_ph), 0.0), mexp
                )
                fcos = vwhere(
                    m_trans,
                    ms,
                    vwhere(
                        m_lam,
                        vscale(md, jnp.maximum(cos_nd, 0.0) / PI),
                        vwhere(
                            m_ph,
                            vscale(ms, lobe_c * jnp.maximum(cos_nd, 0.0)),
                            vwhere(cos_nd > 0, ms, (zf, zf, zf)),
                        ),
                    ),
                )

                t3 = vwhere(m_trans, vmul(t3, fcos), t3)
                t_em = vwhere(survive, t3, tk)
                contrib = vwhere(emitter, vadd(contrib, vmul(t_em, me)), contrib)

                continuing = survive & (m_trans | (pdf_b != 0))
                if config.regen_threshold > 0.0:
                    tmax = jnp.maximum(jnp.maximum(t3[0], t3[1]), t3[2])
                    continuing = continuing & (tmax >= np.float32(config.regen_threshold))

                o_cont = vadd(pos_hit, vscale(new_d, eps))
                return (
                    o_cont[0], o_cont[1], o_cont[2],
                    new_d[0], new_d[1], new_d[2],
                    t3[0], t3[1], t3[2],
                    pos_hit[0], pos_hit[1], pos_hit[2],
                    fcos[0], fcos[1], fcos[2],
                    pdf_b,
                    contrib[0], contrib[1], contrib[2],
                    # discrete results, float-encoded (primal only)
                    obj.astype(jnp.float32),
                    jnp.where(scatter, 1.0, 0.0),
                    jnp.where(continuing, 1.0, 0.0),
                    jnp.where(m_mir, 1.0, 0.0),
                    *nee_ok,
                )

            zero4 = (zf, zf, zf, zf)
            dtan = tuple((dirp == p).astype(jnp.float32) for p in range(4))
            prim = (ox, oy, oz, dx, dy, dz, tr, tg, tb, qx, qy, qz,
                    pfr, pfg, pfb, ppdf) + zero4
            tans = (dox, doy, doz, ddx, ddy, ddz, dtr, dtg, dtb, dqx, dqy, dqz,
                    dpfr, dpfg, dpfb, dppdf) + dtan
            outs, douts = jax.jvp(lambda *a: step(*a), prim, tans)

            (co0, co1, co2, nd0, nd1, nd2, nt0, nt1, nt2,
             ph0, ph1, ph2, fc0, fc1, fc2, npdf,
             cb0, cb1, cb2, obj_f, f_sc, f_cont, f_mir) = outs[:23]
            ok_fs = outs[23:]  # per-light NEE-contributed flags (primal)
            (dco0, dco1, dco2, dnd0, dnd1, dnd2, dnt0, dnt1, dnt2,
             dph0, dph1, dph2, dfc0, dfc1, dfc2, dnpdf,
             dcb0, dcb1, dcb2) = douts[:19]

            obj = obj_f.astype(jnp.int32)
            scatter = f_sc > 0
            continuing = f_cont > 0
            m_mir = f_mir > 0
            path_end = active & ~continuing

            # accumulate the g-weighted tangent of this step's radiance
            dL = dL + g3[0] * dcb0 + g3[1] * dcb1 + g3[2] * dcb2

            # ---- discovery: record distinct touched spheres ------------------
            # light spheres get dedicated replay slots (scheduled from
            # lflags below) — keep them out of the discovery slots
            lids = (
                [light_rec(li)[7].astype(jnp.int32) for li in range(L)]
                if nee_on
                else []
            )
            disc = active & (slot < 0) & (obj >= P)
            sid = obj - P
            newly = disc
            for sv in svals:
                newly = newly & (sid != sv)
            for lid in lids:
                newly = newly & (obj != lid)
            placed = jnp.zeros_like(newly)
            for k in range(TRACK_SLOTS):
                pl_k = newly & ~placed & (svals[k] < 0)
                svals[k] = jnp.where(pl_k, sid, svals[k])
                placed = placed | pl_k

            # per-light replay flags: this light's NEE term contributed at
            # this vertex, or the light sphere was hit directly (its hit
            # geometry and deferred-MIS pdf carry tangents)
            if nee_on:
                disc_any = active & (slot < 0)
                for li, lid in enumerate(lids):
                    touch = disc_any & ((obj == lid) | (ok_fs[li] > 0))
                    lflags = lflags | jnp.where(touch, jnp.int32(1 << li), 0)

            # ---- walk-end transitions ---------------------------------------
            disc_end = path_end & (slot < 0)
            rep_end = path_end & (slot >= 0)

            # flush finished replays: table row jsel, col dirp += dL
            @pl.when(jnp.any(rep_end))
            def _():
                def kstep(k, carry):
                    mk = rep_end & (jsel == k)

                    @pl.when(jnp.any(mk))
                    def _():
                        acc_row_add(
                            k,
                            (0, 1, 2, 3),
                            [
                                jnp.sum(jnp.where(mk & (dirp == p), dL, 0.0))
                                for p in range(4)
                            ],
                        )

                    return carry

                jax.lax.fori_loop(0, S, kstep, 0)

            # replay schedule: discovered slots 0..TRACK_SLOTS-1 (packed,
            # -1-terminated), then one slot per flagged light. first_valid
            # scans (compile-time unrolled) for the lowest valid slot >=
            # from_, returning (slot, sphere id); NSLOT means none left.
            NSLOT = TRACK_SLOTS + (L if nee_on else 0)

            def first_valid(from_):
                best = jnp.full_like(slot, NSLOT)
                jbest = zi - 1
                for c in reversed(range(NSLOT)):
                    if c < TRACK_SLOTS:
                        v = svals[c] >= 0
                        jc = svals[c]
                    else:
                        li = c - TRACK_SLOTS
                        v = (lflags & (1 << li)) != 0
                        jc = zi + (lids[li] - P)
                    take = (from_ <= c) & v
                    best = jnp.where(take, c, best)
                    jbest = jnp.where(take, jc, jbest)
                return best, jbest

            # discovery end: start replays at the first valid slot
            slot0, j0 = first_valid(zi)
            has = slot0 < NSLOT
            # replay end: advance (dir, slot) past invalid slots
            dir_n = dirp + 1
            adv = dir_n >= 4
            slot_n, j_next = first_valid(slot + jnp.where(adv, 1, 0))
            more = ~adv | (slot_n < NSLOT)

            next_sample = (disc_end & ~has) | (rep_end & ~more)
            new_sample = jnp.where(next_sample, sample + 1, sample)
            new_slot = jnp.where(
                disc_end, jnp.where(has, slot0, -1),
                jnp.where(rep_end, jnp.where(more, slot_n, -1), slot),
            )
            new_dirp = jnp.where(
                disc_end, 0, jnp.where(rep_end, jnp.where(adv, 0, dir_n), dirp)
            )
            new_jsel = jnp.where(
                disc_end, jnp.where(has, j0, -1),
                jnp.where(rep_end, jnp.where(adv, j_next, jsel), jsel),
            )
            reset_slots = next_sample
            svals = [jnp.where(reset_slots, -1, sv) for sv in svals]
            lflags = jnp.where(reset_slots, 0, lflags)

            # ---- state updates ----------------------------------------------
            o_cam, d_cam = camera_ray(jnp.minimum(new_sample, eff - 1))
            restart = path_end
            new_o = vwhere(continuing, (co0, co1, co2), vwhere(restart, o_cam, (ox, oy, oz)))
            new_dir3 = vwhere(continuing, (nd0, nd1, nd2), vwhere(restart, d_cam, (dx, dy, dz)))
            t3n = vwhere(restart, vfull((1.0, 1.0, 1.0), zf), (nt0, nt1, nt2))
            sc = scatter & ~path_end

            rz = restart  # tangent hard-reset at walk starts

            new_q = vwhere(sc, (ph0, ph1, ph2), (zf, zf, zf))
            new_pf = (
                jnp.where(sc, fc0, 1.0),
                jnp.where(sc, fc1, 1.0),
                jnp.where(sc, fc2, 1.0),
            )
            new_ppdf = jnp.where(sc, npdf, 1.0)

            dz_ = zf
            new_do = (
                jnp.where(rz, dz_, dco0), jnp.where(rz, dz_, dco1), jnp.where(rz, dz_, dco2)
            )
            new_dd = (
                jnp.where(rz, dz_, dnd0), jnp.where(rz, dz_, dnd1), jnp.where(rz, dz_, dnd2)
            )
            new_dt = (
                jnp.where(rz, dz_, dnt0), jnp.where(rz, dz_, dnt1), jnp.where(rz, dz_, dnt2)
            )
            new_dq = (
                jnp.where(sc, dph0, dz_), jnp.where(sc, dph1, dz_), jnp.where(sc, dph2, dz_)
            )
            new_dpf = (
                jnp.where(sc, dfc0, dz_), jnp.where(sc, dfc1, dz_), jnp.where(sc, dfc2, dz_)
            )
            new_dppdf = jnp.where(sc, dnpdf, dz_)
            new_dL = jnp.where(path_end, 0.0, dL)

            return (
                new_sample, new_slot, new_dirp,
                jnp.where(restart, 0, depth + 1),
                *svals, new_jsel,
                jnp.where(restart, 1, jnp.where(scatter, jnp.int32(emit_after_scatter), emit_f)),
                jnp.where(sc, 1, 0).astype(jnp.int32),
                jnp.where(m_mir & ~path_end, 1, 0).astype(jnp.int32),
                jnp.where(sc, obj, -1),
                lflags,
                new_o[0], new_o[1], new_o[2],
                new_dir3[0], new_dir3[1], new_dir3[2],
                t3n[0], t3n[1], t3n[2],
                new_q[0], new_q[1], new_q[2],
                new_pf[0], new_pf[1], new_pf[2],
                new_ppdf,
                new_do[0], new_do[1], new_do[2],
                new_dd[0], new_dd[1], new_dd[2],
                new_dt[0], new_dt[1], new_dt[2],
                new_dq[0], new_dq[1], new_dq[2],
                new_dpf[0], new_dpf[1], new_dpf[2],
                new_dppdf,
                new_dL,
            )

        acc_ref[...] = jnp.zeros_like(acc_ref)
        jax.lax.while_loop(cond, body, init_state())
        out_ref[0] = acc_ref[0 : out_ref.shape[1], :]

    return kernel


@partial(jax.jit, static_argnames=("width", "height", "spp", "config"))
def geometry_grads(
    scene: Scene,
    key: jax.Array,
    cotangent: jax.Array,
    width: int,
    height: int,
    spp: int,
    config: RenderConfig = RenderConfig(),
):
    """d(Σ cotangent ⊙ image)/d(sphere geometry) for the megakernel render.

    Returns dict(center=[S, 3] world-space center gradients,
    radius=[S] radius gradients). Interior terms only (visibility detached);
    light spheres include their NEE-sampler role (sample position, solid-
    angle pdfs) — see the module docstring."""
    prep = prepare_scene(scene)
    grid_n = max(int(spp**0.5), 1)
    eff = grid_n * grid_n
    divisor = float(spp if config.kajo_spp_quirk else eff)

    n = width * height
    rows_n = -(-n // 128)
    rows_pad = -(-rows_n // TILE_ROWS) * TILE_ROWS
    n_tiles = rows_pad // TILE_ROWS

    P, S, L = scene.num_planes, scene.num_spheres, scene.num_lights
    kernel = _build_geom_kernel(
        width, height, grid_n, eff, config, P, S, L, rigid=prep.rigid
    )

    packed = _pack_scene(prep)
    seed = jnp.asarray(seed_from_key(key), jnp.uint32).reshape(1, 1)
    g = jnp.asarray(cotangent, jnp.float32)[..., :3].reshape(n, 3) / divisor
    g_lanes = jnp.zeros((3, rows_pad * 128), jnp.float32)
    g_lanes = g_lanes.at[:, :n].set(g.T).reshape(3, rows_pad, 128)

    srow_pad = -(-S // 8) * 8
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, srow_pad, 128), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, TILE_ROWS, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, srow_pad, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((srow_pad, 128), jnp.float32)],
    )(seed, packed, g_lanes)

    table = jnp.sum(out, axis=0)[:S, :4]
    radius = safe_sqrt(jnp.maximum(prep.sphere_radius2, 0.0))
    return {
        "center": table[:, 0:3],
        # kernel direction 3 is d/d(r^2); chain to d/dr = 2 r · d/d(r^2)
        "radius": 2.0 * radius * table[:, 3],
    }
