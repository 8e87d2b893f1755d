"""Production wavefront renderer with lane regeneration.

Computes the *same estimator* as models/integrator.py (the parity-spec module;
see its docstring for the full semantics derivation) but restructured for TPU
throughput:

  * **lane regeneration** — one lane per pixel; when a path terminates the
    lane immediately starts that pixel's next stratified sample instead of
    idling until the fixed bounce loop drains. This is the reference GL
    backend's occupancy trick (gl/SurfaceShader.cpp:88-93) made exact: the
    loop runs under `lax.while_loop` until every lane has finished all its
    samples, so per-pixel sample counts equal the parity path's exactly.
    Expected iterations ~ spp * E[path length] instead of spp * (depth+1):
    with Russian-roulette survival ~0.25-0.5 that is a 3-5x utilization win;
  * **counter-based PCG4D uniforms** addressed by (pixel, sample, depth,
    purpose) — stateless, so regeneration stays deterministic under any
    sharding, and ~10x cheaper than threefry per word (ops/rng.py);
  * **vec3 color state** — the reference's vec4 alpha channel never feeds
    back into RGB (verified against cpu/Shader.cpp), so the wavefront carries
    RGB only;
  * rigid scenes use the MXU ray-sphere path automatically (ops/geometry.py).

`lax.while_loop` has no reverse-mode derivative, so two drivers share the
same loop body: `render_lanes` (while_loop, exact sample counts, fastest
forward) and `render_lanes_budget` (fixed-length remat'd scan, differentiable,
discards in-flight samples at the horizon — the fast gradient path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.integrator import RenderConfig
from ..ops import bsdf, lights, sampling
from ..ops.geometry import (
    PreparedScene,
    generate_rays,
    light_visible,
    prepare_scene,
    trace,
)
from ..ops.rng import seed_from_key, uniforms4
from ..scene.types import Scene

_CAMERA_SALT = jnp.uint32(0x7FFFFFFF)

# Keep the wavefront state sorted by (ray-origin Morton cell, direction
# octant) every iteration on streaming scenes. HISTORY: introduced in round 2
# when it won; round 4's lane multiplier + pass batching flipped the balance
# — the tiled pixel order already hands the kernels tile-coherent lanes, so
# the state-level argsort+gather became pure overhead: 211.8K (on) vs 288.4K
# (off) samples/s on config 5, bit-identical images (the un-permute makes
# reorder transparent). Round 5 found the same for the PER-CALL sorts
# (geometry.SORT_STREAM_RAYS, now also default off — see its history note).
# None = auto (now OFF); True/False = A/B override.
REORDER_WAVEFRONT: bool | None = None
_REORDER_AUTO: bool = False

# Lane multiplier for streaming scenes (render_pass_fast): each pixel's
# samples split across this many lanes (when eff_spp divides), cutting
# while_loop iterations by the same factor. 1 = off.
LANE_MULT: int = 4


def _maxrgb(c):
    return jnp.max(c, axis=-1)


def _camera_ray(prep, lane, pix, sample, seed, width, height, grid):
    # ``pix`` is the pixel id this lane renders (== lane by default; big
    # scenes remap lanes into square screen tiles so the streaming trace's
    # per-ray-tile AABB culling sees tight frustums); the PCG4D streams stay
    # keyed by lane — any lane->pixel bijection is a valid estimator
    px = (pix % width).astype(jnp.float32)
    py = (pix // width).astype(jnp.float32)
    gx = (sample % grid).astype(jnp.float32)
    gy = (sample // grid).astype(jnp.float32)
    u1, u2, _, _ = uniforms4(lane, sample.astype(jnp.uint32), _CAMERA_SALT, seed)
    sx = (px + (gx + u1) / grid) / width
    sy = ((height - py) + (gy + u2) / grid) / height
    return generate_rays(prep.camera, sx, sy)


def _nee3(prep, hit, mat, u_l, m_lambert, m_phong, eps, trace_fn=trace):
    """NEE over emissive spheres, RGB only. u_l: [3, N, L]."""
    num_l = prep.light_obj.shape[0]
    n = hit.position.shape[0]
    pos = hit.position[:, None, :]
    center = prep.light_center[None, :, :]
    radius = prep.light_radius[None, :]
    dir_l, pdf_l = lights.sample(u_l[0], u_l[1], u_l[2], center, radius, pos)
    not_self = hit.obj[:, None] != prep.light_obj[None, :]

    normal = hit.normal[:, None, :]
    view = hit.view[:, None, :]
    exp = mat["specular_exponent"][:, None]
    pdf_b = jnp.where(
        m_lambert[:, None],
        bsdf.lambert_pdf(normal, dir_l),
        jnp.where(m_phong[:, None], bsdf.phong_pdf(view, normal, dir_l, exp), 0.0),
    )
    fcos = jnp.where(
        m_lambert[:, None, None],
        bsdf.lambert_eval_cos(mat["diffuse"][:, None, :], normal, dir_l),
        jnp.where(
            m_phong[:, None, None],
            bsdf.phong_eval_cos(mat["specular"][:, None, :], view, normal, dir_l, exp),
            0.0,
        ),
    )
    # visibility: ANY-HIT occlusion kernel on the streaming path (geometry.
    # light_visible; the light hit t is closed-form so "nearest == light"
    # decomposes into plane + any-sphere-below tests), nearest trace bounded
    # by dist + radius + 1 elsewhere. Lanes whose term is dead regardless of
    # visibility (backfacing bsdf, self-hit, non-scattering) skip the
    # occlusion work via the sticky-zero bound.
    needed = not_self & (pdf_b != 0) & (pdf_l > 0) & (m_lambert | m_phong)[:, None]
    visible = light_visible(
        prep,
        (pos + dir_l * eps).reshape(n * num_l, 3),
        dir_l.reshape(n * num_l, 3),
        jnp.broadcast_to(center, (n, num_l, 3)).reshape(n * num_l, 3),
        jnp.broadcast_to(radius, (n, num_l)).reshape(n * num_l),
        jnp.broadcast_to(prep.light_obj[None, :], (n, num_l)).reshape(n * num_l),
        trace_fn,
        needed.reshape(n * num_l),
    ).reshape(n, num_l)
    ok = visible & not_self & (pdf_b != 0) & (pdf_l > 0)
    weight = jnp.where(ok, 1.0 / (pdf_b + pdf_l), 0.0)
    return jnp.sum(weight[..., None] * fcos * prep.light_emission[None, :, :3], axis=1)


def _nee3_one_light(prep, hit, mat, u_sel, u3, m_lambert, m_phong, eps, trace_fn):
    """One-of-L NEE: a uniformly chosen light per lane, scaled by L.

    Unbiased against the reference's all-lights loop (each light's term keeps
    its exact per-light MIS weight 1/(pdf_b + pdf_l); the uniform selection
    contributes the factor L), with one shadow trace per vertex instead of L."""
    num_l = prep.light_obj.shape[0]
    li = jnp.minimum((u_sel * num_l).astype(jnp.int32), num_l - 1)
    center = prep.light_center[li]          # [N, 3]
    radius = prep.light_radius[li]          # [N]
    lobj = prep.light_obj[li]               # [N]
    emission = prep.light_emission[li, :3]  # [N, 3]

    pos = hit.position
    dir_l, pdf_l = lights.sample(u3[0], u3[1], u3[2], center, radius, pos)
    not_self = hit.obj != lobj

    exp = mat["specular_exponent"]
    pdf_b = jnp.where(
        m_lambert,
        bsdf.lambert_pdf(hit.normal, dir_l),
        jnp.where(m_phong, bsdf.phong_pdf(hit.view, hit.normal, dir_l, exp), 0.0),
    )
    fcos = jnp.where(
        m_lambert[:, None],
        bsdf.lambert_eval_cos(mat["diffuse"], hit.normal, dir_l),
        jnp.where(
            m_phong[:, None],
            bsdf.phong_eval_cos(mat["specular"], hit.view, hit.normal, dir_l, exp),
            0.0,
        ),
    )
    # lanes whose term is dead regardless of visibility skip the occlusion
    # work (sticky-zero bound; ~36% of the big-scene pass was shadow queries)
    needed = not_self & (pdf_b != 0) & (pdf_l > 0) & (m_lambert | m_phong)
    visible = light_visible(
        prep, pos + dir_l * eps, dir_l, center, radius, lobj, trace_fn, needed
    )
    ok = visible & not_self & (pdf_b != 0) & (pdf_l > 0)
    weight = jnp.where(ok, num_l / (pdf_b + pdf_l), 0.0)
    return weight[:, None] * fcos * emission


def _light_pdf_for_hit3(prep, hit_obj, prev_obj, prev_pos):
    if prep.light_obj.shape[0] == 0:
        return jnp.zeros(hit_obj.shape, jnp.float32)
    is_light = hit_obj[:, None] == prep.light_obj[None, :]
    not_self = prev_obj[:, None] != prep.light_obj[None, :]
    pdf = lights.pdf(
        prep.light_center[None, :, :], prep.light_radius[None, :], prev_pos[:, None, :]
    )
    return jnp.sum(jnp.where(is_light & not_self, pdf, 0.0), axis=1)


def _make_loop(
    prep: PreparedScene,
    lane: jax.Array,
    seed: jax.Array,
    width: int,
    height: int,
    eff_spp: int,
    grid: int,
    config: RenderConfig,
    trace_fn=trace,
    pix=None,
    reorder: bool = False,
    sample_lo=None,
    sample_hi=None,
):
    """Build (init_state, cond, body) for the regenerating wavefront.

    Radiance is split into ``radiance`` (completed samples only — folded in
    at path end) and ``r_cur`` (the in-flight sample), so a truncated run
    can discard partial samples and stay unbiased per completed sample.

    ``reorder=True`` (big scenes): at the end of every iteration the whole
    per-lane state — lane ids and pixel assignment ride along — is permuted
    by (ray-origin Morton cell, direction octant). Bounce and NEE rays are
    spatially scattered across lanes after the first vertex, which defeats
    the streaming trace's per-ray-tile block culling; keeping the wavefront
    sorted restores it with ONE argsort per iteration, amortized over every
    trace call in the body (path + shadow rays share the lane origins).
    A pure permutation: per-lane PCG4D streams are keyed by the carried lane
    id, so the estimator is bit-identical — only the lane order (and the
    final scatter by ``pix``) changes.

    ``sample_lo``/``sample_hi`` (per-lane int32, optional): each lane walks
    samples [lo, hi) instead of [0, eff_spp) — the lane-multiplier path
    splits a pixel's eff_spp samples across several lanes (distinct stream
    keys via distinct lane ids, full stratum coverage via the global sample
    index), cutting the while_loop's iteration count by the multiplier."""
    n = lane.shape[0]
    if pix is None:
        pix = lane
    if sample_lo is None:
        s_lo = jnp.zeros((n,), jnp.int32)
        s_hi = jnp.full((n,), eff_spp, jnp.int32)
    else:
        s_lo = jnp.asarray(sample_lo, jnp.int32)
        s_hi = jnp.asarray(sample_hi, jnp.int32)
    # per-lane bounds must ride the reorder permutation with the lane ids
    carry_hi = reorder and sample_lo is not None
    if reorder:
        from ..ops.pallas.stream_trace import ray_sort_perm

        if prep.stream_boxes is not None:
            boxes2 = prep.stream_boxes[:, 0, :]
            sort_lo = jnp.min(boxes2[:, 0:3], axis=0)
            sort_hi = jnp.max(boxes2[:, 3:6], axis=0)
        else:
            sort_lo = jnp.min(prep.sphere_center, axis=0)
            sort_hi = jnp.max(prep.sphere_center, axis=0)
    num_lights = prep.light_obj.shape[0]
    eps = jnp.float32(config.surface_epsilon)
    mat3 = {
        "diffuse": prep.materials.diffuse[:, :3],
        "specular": prep.materials.specular[:, :3],
        "emission": prep.materials.emission[:, :3],
        "transparency": prep.materials.transparency[:, :3],
        "specular_exponent": prep.materials.specular_exponent,
        "refractive_index": prep.materials.refractive_index,
    }
    bg = prep.background[:3]
    emit_after_scatter = (not config.direct_lighting) or config.full_mis
    # GL-backend-exact estimator mode (see integrator.RenderConfig
    # .gl_semantics for the rule list and the SurfaceShader.cpp citations)
    gl = bool(config.gl_semantics)
    gl_cull = jnp.float32(
        config.regen_threshold if config.regen_threshold > 0.0 else 0.01
    )

    sample0 = s_lo
    o0, d0 = _camera_ray(prep, lane, pix, sample0, seed, width, height, grid)
    state = dict(
        sample=sample0,
        depth=jnp.zeros((n,), jnp.int32),
        o=o0,
        d=d0,
        throughput=jnp.ones((n, 3), jnp.float32),
        radiance=jnp.zeros((n, 3), jnp.float32),
        emit=jnp.ones((n,), bool),
        mis_pending=jnp.zeros((n,), bool),
        pend_pdf_b=jnp.ones((n,), jnp.float32),
        pend_fcos=jnp.ones((n, 3), jnp.float32),
        pend_delta=jnp.zeros((n,), bool),
        prev_obj=jnp.full((n,), -1, jnp.int32),
        prev_pos=jnp.zeros((n, 3), jnp.float32),
        r_cur=jnp.zeros((n, 3), jnp.float32),
        iters=jnp.zeros((), jnp.int32),
        # live-lane ray counter in f32: int32 products overflow at realistic
        # sizes (640x480 x 1600 spp ~ 3e9 rays) and lanes that drained early
        # must not keep counting (VERDICT r1 weak #7)
        rays=jnp.zeros((), jnp.float32),
    )
    if reorder:
        state["lane"] = lane
        state["pix"] = jnp.asarray(pix, jnp.uint32)
        # original row position, so render_lanes can un-permute the result
        state["row"] = jnp.arange(n, dtype=jnp.uint32)
        if carry_hi:
            state["s_hi"] = s_hi

    # uniform4 calls per vertex; one-light NEE needs 4 NEE uniforms
    # (selector + 3 sample dims) regardless of L
    n_uni = max(5 + 3 * num_lights, 9 if config.one_light_nee else 0)
    ncalls = -(-n_uni // 4)

    def cond(state):
        return jnp.any(state["sample"] < (state["s_hi"] if carry_hi else s_hi))

    def body(state):
        lane_b = state["lane"] if reorder else lane
        pix_b = state["pix"] if reorder else pix
        hi_b = state["s_hi"] if carry_hi else s_hi
        active = state["sample"] < hi_b
        sample_u = state["sample"].astype(jnp.uint32)
        depth = state["depth"]
        salt0 = depth.astype(jnp.uint32) * jnp.uint32(ncalls)
        us = []
        for i in range(ncalls):
            us.extend(uniforms4(lane_b, sample_u, salt0 + jnp.uint32(i), seed))
        # us[0]=rr, us[1]=transparency coin, us[2]=diffuse coin,
        # us[3], us[4]=bsdf sample, us[5:5+3L]=NEE

        hit = trace_fn(prep, state["o"], state["d"])
        was_hit = hit.obj >= 0
        t = state["throughput"]
        r = state["r_cur"]

        # deferred MIS weight from previous vertex. GL mode: rayCanReach has
        # no not-self test (prev_obj forced to -1) and the ideal-reflector
        # continuation carries no light pdf (delta exclusion, like full_mis)
        pdf_l_vis = _light_pdf_for_hit3(
            prep,
            hit.obj,
            jnp.full_like(state["prev_obj"], -1) if gl else state["prev_obj"],
            state["prev_pos"],
        )
        if config.full_mis or gl:
            pdf_l_vis = jnp.where(state["pend_delta"], 0.0, pdf_l_vis)
        denom = pdf_l_vis + state["pend_pdf_b"]
        weight = state["pend_fcos"] / jnp.where(denom == 0, 1.0, denom)[:, None]
        t = jnp.where((state["mis_pending"] & active)[:, None], t * weight, t)

        if gl:
            # GL's post-shade cull (SurfaceShader.cpp:88-93), applied here —
            # after the deferred weight lands, before ANY of this vertex's
            # contributions — which is exactly "culled at the previous
            # vertex, never traced on": the lane regenerates below
            active_v = active & ~(jnp.max(t, axis=-1) < gl_cull)
        else:
            active_v = active

        # miss -> path ends (background only in the CPU scheme: the GL
        # pipeline never consumes backgroundColor)
        miss = active_v & ~was_hit
        if not gl:
            r = r + jnp.where(miss[:, None], t * bg[None, :], 0.0)
        on_path = active_v & was_hit

        mat = jax.tree.map(lambda a: a[jnp.maximum(hit.obj, 0)], mat3)

        # Russian roulette + depth limit (GL mode: no RR — paths run until
        # the throughput cull; us[0] is drawn but unused, keeping the PCG4D
        # stream layout shared with the CPU scheme)
        if gl:
            cont = jnp.ones_like(on_path)
        else:
            p_rr = _maxrgb(jnp.maximum(jnp.maximum(mat["diffuse"], mat["specular"]), mat["transparency"]))
            cont, prob_rr = sampling.flip_coin(us[0], jax.lax.stop_gradient(p_rr))
            t = jnp.where(on_path[:, None], t / prob_rr[:, None], t)
        t_kill = t
        # GL adds emission only on the path's first vertex (weight==vec4(1.0))
        emitter = on_path & ((depth == 0) if gl else state["emit"])
        survive = on_path & cont & (depth < config.max_depth)

        # lottery
        sum_d = jnp.sum(mat["diffuse"], -1)
        sum_s = jnp.sum(mat["specular"], -1)
        sum_t = jnp.sum(mat["transparency"], -1)
        total = sum_d + sum_s + sum_t
        p_t = jnp.where(total > 0, sum_t / jnp.where(total == 0, 1.0, total), 0.0)
        transmit, prob_t = sampling.flip_coin(us[1], jax.lax.stop_gradient(p_t))
        t = jnp.where(survive[:, None], t / prob_t[:, None], t)
        ds = sum_d + sum_s
        p_d = jnp.where(ds > 0, sum_d / jnp.where(ds == 0, 1.0, ds), 0.0)
        diff, prob_d = sampling.flip_coin(us[2], jax.lax.stop_gradient(p_d))
        t = jnp.where((survive & ~transmit)[:, None], t / prob_d[:, None], t)

        m_transmit = survive & transmit
        m_lambert = survive & ~transmit & diff
        m_phong = survive & ~transmit & ~diff & (mat["specular_exponent"] > 0)
        m_mirror = survive & ~transmit & ~diff & (mat["specular_exponent"] <= 0)
        scatter = m_lambert | m_phong | m_mirror

        # NEE
        if config.direct_lighting and num_lights:
            if config.one_light_nee and num_lights > 1:
                nee = _nee3_one_light(
                    prep, hit, mat, us[5], (us[6], us[7], us[8]),
                    m_lambert, m_phong, eps, trace_fn,
                )
            else:
                u_l = jnp.stack(us[5 : 5 + 3 * num_lights]).reshape(3, num_lights, n).transpose(0, 2, 1)
                nee = _nee3(prep, hit, mat, u_l, m_lambert, m_phong, eps, trace_fn)
            r = r + jnp.where(scatter[:, None], t * nee, 0.0)

        # continuation
        d_trans, _ = bsdf.transmission_sample(hit.view, hit.normal, mat["refractive_index"])
        d_lam, pdf_lam = bsdf.lambert_sample(us[3], us[4], hit.tangent, hit.binormal, hit.normal)
        d_ph, pdf_ph = bsdf.phong_sample(us[3], us[4], hit.view, hit.normal, mat["specular_exponent"])
        d_mir, _ = bsdf.reflector_sample(hit.view, hit.normal)

        new_d = jnp.where(
            m_transmit[:, None],
            d_trans,
            jnp.where(m_lambert[:, None], d_lam, jnp.where(m_phong[:, None], d_ph, d_mir)),
        )
        pdf_b = jnp.where(m_lambert, pdf_lam, jnp.where(m_phong, pdf_ph, jnp.ones_like(pdf_lam)))
        fcos = jnp.where(
            m_transmit[:, None],
            bsdf.transmission_eval_abscos(mat["specular"], hit.normal, d_trans),
            jnp.where(
                m_lambert[:, None],
                bsdf.lambert_eval_cos(mat["diffuse"], hit.normal, d_lam),
                jnp.where(
                    m_phong[:, None],
                    bsdf.phong_eval_cos(
                        mat["specular"], hit.view, hit.normal, d_ph, mat["specular_exponent"]
                    ),
                    bsdf.reflector_eval_cos(mat["specular"], hit.normal, d_mir),
                ),
            ),
        )

        t = jnp.where(m_transmit[:, None], t * fcos, t)
        r = r + jnp.where(
            emitter[:, None], jnp.where(survive[:, None], t, t_kill) * mat["emission"], 0.0
        )
        continuing = survive & (m_transmit | (pdf_b != 0))
        if config.regen_threshold > 0.0 and not gl:
            # standalone throughput culling (a cheap approximation of the GL
            # backend's — the exact rule lives in the gl_semantics branch
            # above, where the cull runs post-deferred-MIS): lanes whose
            # path throughput drops below the threshold regenerate instead
            # of tracing on. Default 0.0 keeps the exact estimator.
            continuing = continuing & (
                jnp.max(t, axis=-1) >= jnp.float32(config.regen_threshold)
            )

        # ---- regeneration: ended paths start the lane's next sample --------
        path_end = active & ~continuing
        new_sample = jnp.where(path_end, state["sample"] + 1, state["sample"])
        o_cam, d_cam = _camera_ray(
            prep, lane_b, pix_b, jnp.minimum(new_sample, hi_b - 1), seed, width, height, grid
        )
        regen = path_end

        new_o = jnp.where(
            continuing[:, None], hit.position + new_d * eps, jnp.where(regen[:, None], o_cam, state["o"])
        )
        new_dir = jnp.where(
            continuing[:, None], new_d, jnp.where(regen[:, None], d_cam, state["d"])
        )
        new_state = dict(
            sample=new_sample,
            depth=jnp.where(path_end, 0, depth + 1),
            o=new_o,
            d=new_dir,
            throughput=jnp.where(path_end[:, None], 1.0, t),
            radiance=state["radiance"] + jnp.where(path_end[:, None], r, 0.0),
            r_cur=jnp.where(path_end[:, None], 0.0, r),
            emit=jnp.where(
                path_end, True, jnp.where(scatter, jnp.full_like(path_end, emit_after_scatter), state["emit"])
            ),
            mis_pending=jnp.where(path_end, False, scatter),
            pend_pdf_b=jnp.where(scatter & ~path_end, pdf_b, 1.0),
            pend_fcos=jnp.where((scatter & ~path_end)[:, None], fcos, 1.0),
            pend_delta=m_mirror & ~path_end,
            prev_obj=jnp.where(scatter & ~path_end, hit.obj, -1),
            prev_pos=jnp.where((scatter & ~path_end)[:, None], hit.position, 0.0),
            iters=state["iters"] + 1,
            # one continuation/camera trace per live lane + one NEE shadow
            # trace per scattering lane (x num_lights unless one-of-L
            # light sampling collapses the shadow fan to a single ray;
            # zero with direct lighting disabled — no NEE block runs)
            rays=state["rays"]
            + jnp.sum(active.astype(jnp.float32))
            + jnp.sum(scatter.astype(jnp.float32))
            * (
                0
                if not config.direct_lighting
                else (1 if config.one_light_nee and num_lights > 1 else num_lights)
            ),
        )
        if reorder:
            new_state["lane"] = lane_b
            new_state["pix"] = pix_b
            new_state["row"] = state["row"]
            if carry_hi:
                new_state["s_hi"] = hi_b
            perm = ray_sort_perm(new_o, new_dir, sort_lo, sort_hi)
            new_state = {
                k: (v[perm] if v.ndim >= 1 else v) for k, v in new_state.items()
            }
        return new_state

    return state, cond, body


def render_lanes(
    prep, lane, seed, width, height, eff_spp, grid, config, trace_fn=trace, pix=None,
    reorder=False, sample_lo=None, sample_hi=None,
):
    """Exact engine: loop until every lane finishes all its samples.

    ``reorder=True`` keeps the wavefront sorted by ray coherence each
    iteration (see ``_make_loop``); the result is un-permuted back to the
    caller's lane order, so it is bit-identical to ``reorder=False``."""
    state, cond, body = _make_loop(
        prep, lane, seed, width, height, eff_spp, grid, config, trace_fn, pix,
        reorder=reorder, sample_lo=sample_lo, sample_hi=sample_hi,
    )
    state = jax.lax.while_loop(cond, body, state)
    rad = state["radiance"]
    if reorder:
        rad = jnp.zeros_like(rad).at[state["row"].astype(jnp.int32)].set(rad)
    return rad, state["iters"]


# jax.checkpoint on the budget scan body (trades ~n_iters x activation
# memory for one recompute on the backward pass). Tests flip this off when
# gradding through INTERPRET-mode pallas calls: their io_callback effect
# cannot be partial-eval'd under remat (a jax limitation the compiled TPU
# path doesn't have).
BUDGET_REMAT: bool = True


def render_lanes_budget(prep, lane, seed, width, height, eff_spp, grid, config, n_iters):
    """Differentiable engine: the same regenerating body under a fixed-length
    remat'd scan. Runs ``n_iters`` wavefront iterations; samples still in
    flight at the end are *discarded* (their partial radiance never reaches
    ``radiance``), so the per-completed-sample estimator stays unbiased —
    per-lane sample counts become slightly variable instead (ratio estimator
    across lanes, standard progressive-rendering semantics). Returns
    (radiance_sum [N,3], completed_samples [N])."""
    state, _, body = _make_loop(prep, lane, seed, width, height, eff_spp, grid, config)
    body_fn = lambda c, _: (body(c), None)
    if BUDGET_REMAT:
        body_fn = jax.checkpoint(body_fn, prevent_cse=False)
    state, _ = jax.lax.scan(body_fn, state, None, length=n_iters)
    return state["radiance"], jnp.minimum(state["sample"], eff_spp)


@partial(jax.jit, static_argnames=("width", "height", "spp", "config"))
def render_pass_fast(
    scene: Scene,
    key: jax.Array,
    width: int,
    height: int,
    spp: int,
    config: RenderConfig = RenderConfig(),
) -> jax.Array:
    """One progressive pass via the regenerating wavefront -> [H, W, 4]."""
    prep = prepare_scene(scene)
    grid = max(int(spp**0.5), 1)
    eff = grid * grid
    divisor = float(spp if config.kajo_spp_quirk else eff)

    n = width * height
    seed = seed_from_key(key)
    from ..ops.geometry import STREAM_THRESHOLD, _stream_enabled

    # tile remapping and per-iteration reordering only pay off when the
    # trace actually takes the tile-culling streaming kernel — on dense/
    # chunked backends the per-iteration argsort+gather is pure overhead
    streaming = scene.num_spheres > STREAM_THRESHOLD and _stream_enabled()
    reorder = (
        (streaming and _REORDER_AUTO)
        if REORDER_WAVEFRONT is None
        else REORDER_WAVEFRONT
    )

    # lane multiplier (streaming scenes): split each pixel's eff samples
    # across `mult` lanes with distinct stream keys and disjoint global
    # sample ranges — ~mult-x fewer while_loop iterations, so the
    # per-iteration glue (and the trace kernels' fixed floor) amortizes
    # over mult-x more rays. Measured round 4 on config 5: 12 -> 3
    # iterations, ~1.6x samples/s. Exact same per-pixel sample budget and
    # strata; streams differ from mult=1 (any lane->(pixel, sample-slice)
    # bijection is a valid estimator — statistically identical).
    mult = 1
    if streaming and LANE_MULT > 1:
        for m in (LANE_MULT, 2):
            if eff % m == 0:
                mult = m
                break
    if mult > 1:
        k = eff // mult
        lane = jnp.arange(n * mult, dtype=jnp.uint32)
        pixmap = jnp.asarray(tiled_pixel_order(width, height))
        pix = pixmap[(lane % n).astype(jnp.int32)]
        s_lo = ((lane // n) * k).astype(jnp.int32)
        rgb, _ = render_lanes(
            prep, lane, seed, width, height, eff, grid, config, pix=pix,
            reorder=reorder, sample_lo=s_lo, sample_hi=s_lo + k,
        )
        rgb = jnp.zeros((n, 3), jnp.float32).at[pix.astype(jnp.int32)].add(rgb)
        rgb = rgb / divisor
    else:
        lane = jnp.arange(n, dtype=jnp.uint32)
        pix = jnp.asarray(tiled_pixel_order(width, height)) if streaming else None
        rgb, _ = render_lanes(
            prep, lane, seed, width, height, eff, grid, config, pix=pix, reorder=reorder
        )
        rgb = rgb / divisor
        if pix is not None:
            rgb = jnp.zeros_like(rgb).at[pix.astype(jnp.int32)].set(rgb)
    img = jnp.concatenate([rgb, jnp.ones((n, 1), jnp.float32)], axis=1)
    return img.reshape(height, width, 4)


@partial(jax.jit, static_argnames=("width", "height", "spp", "n_passes", "config"))
def render_passes_fast(
    scene: Scene,
    key: jax.Array,
    pass_offset: jax.Array,
    width: int,
    height: int,
    spp: int,
    n_passes: int,
    config: RenderConfig = RenderConfig(),
) -> jax.Array:
    """Sum of ``n_passes`` wavefront passes in ONE dispatch.

    Per-pass dispatch/readback overhead on the remote TPU runtime dominates
    the ~250 ms big-scene pass (measured round 4: one-light config-5 runs
    131K samples/s pass-at-a-time vs 196-200K batched 4-8 under one jit +
    scan — the same amortization render_passes_megakernel gives the small-
    scene engine). Pass keys are fold_in(key, pass_offset + i), identical to
    the unbatched progressive loop."""
    def body(carry, i):
        img = render_pass_fast(
            scene, jax.random.fold_in(key, pass_offset + i), width, height, spp, config
        )
        return carry + img, None

    total, _ = jax.lax.scan(
        body, jnp.zeros((height, width, 4), jnp.float32), jnp.arange(n_passes)
    )
    return total


# screen-tile edge for the lane->pixel mapping below (A/B knob; round-5
# interleaved sweep on config 5 at 128x96: 128 ~= 64 > 32 within the noise
# floor — note at that size ts=128 degenerates to scanline order, so the
# mapping matters little at bench resolution; 64 stays the default for the
# real production sizes where 4096-lane tiles get compact frustums)
TILE_TS: int = 64


def tiled_pixel_order(width, height, ts: int | None = None):
    """Lane -> pixel id mapping walking the image in ts x ts screen tiles
    (host-side, static per resolution). Square tiles give the streaming
    trace's 4096-lane ray tiles compact frustums, so the per-block AABB
    cull rejects far more sphere blocks than scanline-strip tiles do."""
    import numpy as np

    if ts is None:
        ts = TILE_TS
    xs, ys = np.meshgrid(np.arange(width), np.arange(height))
    tiles_x = -(-width // ts)
    tile_id = (ys // ts) * tiles_x + (xs // ts)
    within = (ys % ts) * ts + (xs % ts)
    order = np.argsort((tile_id * (ts * ts) + within).ravel(), kind="stable")
    return order.astype(np.uint32)


@partial(jax.jit, static_argnames=("width", "height", "spp", "config"))
def render_pass_fast_stats(
    scene: Scene,
    key: jax.Array,
    width: int,
    height: int,
    spp: int,
    config: RenderConfig = RenderConfig(),
):
    """render_pass_fast + (iterations, rays_traced) observability counters.

    ``rays`` counts only *live-lane* traces (one continuation/camera trace per
    live lane per iteration, plus one NEE shadow trace per light on scattering
    lanes), accumulated in f32 inside the loop — lanes that drain early stop
    counting, and the counter cannot overflow int32 at realistic sizes
    (the reference preview reported samples/s only)."""
    prep = prepare_scene(scene)
    grid = max(int(spp**0.5), 1)
    eff = grid * grid
    divisor = float(spp if config.kajo_spp_quirk else eff)
    n = width * height
    lane = jnp.arange(n, dtype=jnp.uint32)
    seed = seed_from_key(key)
    state, cond, body = _make_loop(prep, lane, seed, width, height, eff, grid, config)
    state = jax.lax.while_loop(cond, body, state)
    rgb = state["radiance"] / divisor
    img = jnp.concatenate([rgb, jnp.ones((n, 1), jnp.float32)], axis=1)
    return img.reshape(height, width, 4), state["iters"], state["rays"]


def render_image_fast(
    scene: Scene,
    width: int,
    height: int,
    spp: int,
    key: jax.Array,
    passes: int = 1,
    config: RenderConfig = RenderConfig(),
) -> jax.Array:
    total = jnp.zeros((height, width, 4), jnp.float32)
    for p in range(passes):
        total = total + render_pass_fast(scene, jax.random.fold_in(key, p), width, height, spp, config)
    return total / passes


@partial(jax.jit, static_argnames=("width", "height", "spp", "config", "iters_per_sample"))
def render_pass_budget(
    scene: Scene,
    key: jax.Array,
    width: int,
    height: int,
    spp: int,
    config: RenderConfig = RenderConfig(),
    iters_per_sample: int = 4,
) -> jax.Array:
    """Differentiable regenerating-wavefront pass -> [H, W, 4].

    ``iters_per_sample * eff_spp`` wavefront iterations; with Russian-roulette
    path lengths ~2-3 this completes >99% of samples while doing ~2-3x less
    work than the fixed-depth parity scan. Per-pixel normalization uses the
    actual completed-sample count."""
    prep = prepare_scene(scene)
    grid = max(int(spp**0.5), 1)
    eff = grid * grid
    quirk = float(spp if config.kajo_spp_quirk else eff) / eff  # kajo 25/32 bias
    n = width * height
    lane = jnp.arange(n, dtype=jnp.uint32)
    seed = seed_from_key(key)
    rgb, completed = render_lanes_budget(
        prep, lane, seed, width, height, eff, grid, config, iters_per_sample * eff
    )
    denom = jnp.maximum(completed, 1).astype(jnp.float32) * quirk
    rgb = rgb / denom[:, None]
    img = jnp.concatenate([rgb, jnp.ones((n, 1), jnp.float32)], axis=1)
    return img.reshape(height, width, 4)
