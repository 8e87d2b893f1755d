"""Edge-aware visibility gradients: boundary sampling of sphere silhouettes.

A sphere's visibility is a step function of the scene parameters, so interior
autodiff (diff/inverse.py) sees zero gradient from silhouette motion — the
BASELINE.md north-star asks for "reparameterized/edge-aware gradients", and a
flat-lit sphere's position is unrecoverable without them. The reference has
nothing here (it is not differentiable at all); this module implements the
boundary term of Reynolds' transport theorem for the *primary* (camera-ray)
discontinuities, which spheres make analytic:

    dI_p/dθ = interior + ∮_{edges ∩ p} (L_in − L_out) (v · n̂) dl

The silhouette of a sphere (center c, radius r) seen from o is an exact
circle: p(φ) = c − (r²/D) â + r√(1−r²/D²)(cos φ e₁ + sin φ e₂), D = |c−o| —
a *smooth* function of (c, r). We Monte-Carlo the screen-space line integral:
sample φ, project p(φ) to pixel coordinates x(φ; c, r) (differentiable),
estimate L on both sides of the edge by tracing two rays offset ±δ pixels
along the screen normal (this also handles occlusion of the edge for free —
an occluded edge sees L_in ≈ L_out and contributes nothing), and accumulate

    g(c, r) = Σ_s  [cot·(L_in−L_out)]_s · |dx/dφ|_s · (2π/M) · (n̂_s · x_s)

with everything but x_s detached; jax.grad of g is then the boundary term.
`shadow_silhouette_grads` applies the same construction to NEE-visibility
(shadow) edges at primary vertices — the occluder's silhouette seen from the
shading point is still an analytic circle, this time in *direction* space.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.integrator import RenderConfig, render_samples
from ..ops import bsdf, lights
from ..ops.geometry import generate_rays, prepare_scene, trace
from ..scene.types import Scene
from ..utils.math3d import project

# screen-space offset (in pixels) of the two one-sided radiance probes
EDGE_DELTA_PX = 0.05


def _edge_points(centers, radii, phi, o_cam):
    """Silhouette circle points [S, M, 3] as a smooth function of (c, r).

    ``phi`` is [S, M] per-sphere angles. The camera-origin special case of
    _edge_points_from (one shared viewpoint for every sphere)."""
    return _edge_points_from(
        jnp.broadcast_to(o_cam[None, :], centers.shape), centers, radii, phi
    )


def _screen_pix(p, view, proj, width, height):
    """World points -> differentiable pixel coordinates (x right, y down)."""
    sp, w = project(p, view, proj, xp=jnp)
    x = sp[..., 0] * width
    y = height - sp[..., 1] * height  # image rows grow downward (geometry.py)
    return jnp.stack([x, y], axis=-1), w


def silhouette_loss_grads(
    scene: Scene,
    key: jax.Array,
    cotangent: jax.Array,
    width: int,
    height: int,
    config: RenderConfig = RenderConfig(),
    n_edge: int = 256,
):
    """Boundary-term gradients of sum(cotangent * image) w.r.t. sphere
    centers [S, 3] and radii [S] (primary visibility edges only)."""
    view = jnp.asarray(scene.camera.transform, jnp.float32)
    proj = jnp.asarray(scene.camera.projection, jnp.float32)
    prep = jax.lax.stop_gradient(prepare_scene(scene))
    o_cam = prep.camera.origin
    centers = jnp.asarray(scene.sphere_transform, jnp.float32)[:, :3, 3]
    radii = jnp.asarray(scene.sphere_radius, jnp.float32)
    s = centers.shape[0]
    cot = jnp.asarray(cotangent, jnp.float32)[..., :3]

    k_phi, k_trace = jax.random.split(key)
    u0 = jax.random.uniform(k_phi, (s, 1))
    phi_base = (jnp.arange(n_edge, dtype=jnp.float32) / n_edge) * 2.0 * jnp.pi

    def g_fn(centers, radii):
        # stratified ring angles with a random per-sphere rotation
        phi = phi_base[None, :] + u0 * (2.0 * jnp.pi / n_edge)  # [S, M]
        p = _edge_points(centers, radii, phi, o_cam)  # [S, M, 3]
        x, w_clip = _screen_pix(p, view, proj, width, height)  # [S, M, 2]

        # ---- detached geometry of the edge -----------------------------
        xd = jax.lax.stop_gradient(x)
        # screen tangent dx/dφ via jvp on the detached inputs
        cd = jax.lax.stop_gradient(centers)
        rd = jax.lax.stop_gradient(radii)

        def x_of_phi(ph):
            pp = _edge_points(cd, rd, ph, o_cam)
            xx, _ = _screen_pix(pp, view, proj, width, height)
            return xx

        _, tau = jax.jvp(x_of_phi, (phi,), (jnp.ones_like(phi),))  # [S, M, 2]
        tau = jax.lax.stop_gradient(tau)
        tau_len = jnp.linalg.norm(tau, axis=-1)
        # screen normal = tangent rotated 90°, oriented away from the
        # projected sphere center (outward from the silhouette disk)
        n_raw = jnp.stack([tau[..., 1], -tau[..., 0]], axis=-1)
        n_raw = n_raw / jnp.maximum(tau_len[..., None], 1e-12)
        xc, _ = _screen_pix(jax.lax.stop_gradient(centers)[:, None, :], view, proj, width, height)
        outward = jnp.sum((xd - xc) * n_raw, axis=-1)
        n_hat = n_raw * jnp.sign(outward)[..., None]

        # ---- one-sided radiance probes (fully detached) ----------------
        def probe(offset_sign):
            xs = xd + offset_sign * EDGE_DELTA_PX * n_hat
            sx = (xs[..., 0] / width).reshape(-1)
            sy = ((height - xs[..., 1]) / height).reshape(-1)
            o, d = generate_rays(prep.camera, sx, sy)
            rad = render_samples(prep, o, d, k_trace, config)
            return rad[..., :3].reshape(s, n_edge, 3)

        l_in = jax.lax.stop_gradient(probe(-1.0))
        l_out = jax.lax.stop_gradient(probe(1.0))

        # cotangent at the edge pixel. Column x covers x_pix in [x, x+1) ->
        # floor; row y covers y_pix in (y-1, y] (the jitter is SUBTRACTED in
        # the (H - py) flip, geometry.py generate_rays convention) -> ceil.
        # Getting the row off by one flips the sign of the y-gradient when
        # the cotangent changes sign across the rim (an MSE residual does).
        ix = jnp.clip(jnp.floor(xd[..., 0]).astype(jnp.int32), 0, width - 1)
        iy = jnp.clip(jnp.ceil(xd[..., 1]).astype(jnp.int32), 0, height - 1)
        cot_e = cot[iy, ix]  # [S, M, 3]

        in_image = (
            (xd[..., 0] >= 0.0)
            & (xd[..., 0] < width)
            & (xd[..., 1] >= 0.0)
            & (xd[..., 1] < height)
        )
        dist = jnp.linalg.norm(jax.lax.stop_gradient(centers) - o_cam[None, :], axis=-1)
        visible_sphere = (dist > jax.lax.stop_gradient(radii))[:, None]
        front = jax.lax.stop_gradient(w_clip) > 0.0
        valid = in_image & visible_sphere & front & (tau_len > 1e-9)

        w_s = jnp.where(
            valid,
            jnp.sum(cot_e * (l_in - l_out), axis=-1) * tau_len * (2.0 * jnp.pi / n_edge),
            0.0,
        )
        # only x is differentiated; everything in w_s / n_hat is detached
        return jnp.sum(w_s * jnp.sum(n_hat * x, axis=-1))

    gc, gr = jax.grad(g_fn, argnums=(0, 1))(centers, radii)
    return gc, gr


def _edge_points_from(origins, centers, radii, phi):
    """Silhouette circle of (centers, radii) seen from per-row ``origins``
    [N, 3] -> [N, M, 3]; smooth in (centers, radii). Generalizes
    _edge_points (whose origin is the camera) to arbitrary viewpoints —
    a sphere's silhouette from ANY point is an analytic circle."""
    a_vec = centers - origins
    d2 = jnp.sum(a_vec * a_vec, axis=-1, keepdims=True)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
    a = a_vec / dist
    up = jnp.where(
        (jnp.abs(a[:, 1]) < 0.9)[:, None],
        jnp.array([0.0, 1.0, 0.0], jnp.float32),
        jnp.array([1.0, 0.0, 0.0], jnp.float32),
    )
    e1 = jnp.cross(a, up)
    e1 = e1 / jnp.linalg.norm(e1, axis=-1, keepdims=True)
    e2 = jnp.cross(a, e1)
    sin_t = radii[:, None] / dist
    # floor, not 0: sqrt(0)'s infinite derivative would NaN-poison the whole
    # gradient (0·inf) whenever the viewpoint lies ON a sphere (dist == r —
    # every pixel that hits the occluder itself); those rows are masked to
    # zero weight, which only kills finite gradients
    cos_t2 = jnp.maximum(1.0 - sin_t * sin_t, 1e-12)
    ring_c = centers - (radii[:, None] * sin_t) * a
    ring_r = radii[:, None] * jnp.sqrt(cos_t2)
    cphi = jnp.cos(phi)[..., None]
    sphi = jnp.sin(phi)[..., None]
    return ring_c[:, None, :] + ring_r[:, None, :] * (
        cphi * e1[:, None, :] + sphi * e2[:, None, :]
    )


def shadow_silhouette_grads(
    scene: Scene,
    key: jax.Array,
    cotangent: jax.Array,
    width: int,
    height: int,
    config: RenderConfig = RenderConfig(),
    n_edge: int = 4,
):
    """NEE-visibility (shadow) boundary gradients at primary vertices.

    For each primary hit p, occluder sphere j and light l, the occluded set
    of light directions is bounded by j's silhouette circle seen from p.
    Reynolds over the light's solid angle gives, per edge sample ω(φ):

        d(NEE)/dθ += (V_in − V_out) · K(ω) · (n̂_ω · dω/dθ) · sinα · (2π/M) / Ω_l

    with K the (smooth) NEE integrand (per-branch MIS weight · f·cos · L_e —
    the branch lotteries' 1/p factors cancel in expectation, so both Lambert
    and Phong terms are summed), V probed by two rays offset ±δ across the
    edge (this gates the light cone AND other occluders for free: both sides
    blocked → ΔV = 0), and everything but ω detached. Covers the "recover
    the sphere from its shadow" case interior autodiff is blind to; shadow
    edges at deeper vertices are not sampled (their throughput-weighted
    contribution is a strict subset of direct light)."""
    prep = jax.lax.stop_gradient(prepare_scene(scene))
    num_l = int(prep.light_obj.shape[0])
    s = int(scene.num_spheres)
    if num_l == 0 or s == 0:
        return jnp.zeros((s, 3), jnp.float32), jnp.zeros((s,), jnp.float32)
    num_p = int(prep.plane_nrow.shape[0])
    centers0 = jnp.asarray(scene.sphere_transform, jnp.float32)[:, :3, 3]
    radii0 = jnp.asarray(scene.sphere_radius, jnp.float32)
    eps = jnp.float32(config.surface_epsilon)
    delta_ang = jnp.float32(2e-3)
    m = n_edge
    two_pi = jnp.float32(2.0 * np.pi)

    # one jittered primary ray per pixel (wavefront _camera_ray convention:
    # row py's footprint is sy·H ∈ [H−py, H−py+1))
    k_pix, k_phi = jax.random.split(key)
    n = width * height
    u = jax.random.uniform(k_pix, (2, n), dtype=jnp.float32)
    px = jnp.arange(n, dtype=jnp.float32) % width
    py = jnp.floor(jnp.arange(n, dtype=jnp.float32) / width)
    o_cam, d_cam = generate_rays(
        prep.camera, (px + u[0]) / width, (height - py + u[1]) / height
    )
    hit = jax.lax.stop_gradient(trace(prep, o_cam, d_cam))
    hit_obj = hit.obj
    mat = jax.tree.map(lambda a: a[jnp.maximum(hit_obj, 0)], prep.materials)

    # flatten (pixel, occluder) pairs: row i*s + j  <->  (pixel i, sphere j)
    p_r = jnp.repeat(hit.position, s, axis=0)  # [N*S, 3]
    n_r = jnp.repeat(hit.normal, s, axis=0)
    v_r = jnp.repeat(hit.view, s, axis=0)
    hobj_r = jnp.repeat(hit_obj, s)
    exp_r = jnp.repeat(mat.specular_exponent, s, axis=0)
    diff_r = jnp.repeat(mat.diffuse, s, axis=0)
    spec_r = jnp.repeat(mat.specular, s, axis=0)
    cot_r = jnp.repeat(
        jnp.asarray(cotangent, jnp.float32)[..., :3].reshape(n, 3), s, axis=0
    )
    light_obj = prep.light_obj
    pdf_l = lights.pdf(
        prep.light_center[None, :, :], prep.light_radius[None, :], hit.position[:, None, :]
    )  # [N, L] — direction-independent (Light.cpp:58-62)
    pl = jnp.repeat(pdf_l, s, axis=0)[:, None, :]  # [N*S, 1, L]

    phi0 = jax.random.uniform(k_phi, (n * s, 1), dtype=jnp.float32) * (two_pi / m)
    phi = phi0 + (jnp.arange(m, dtype=jnp.float32) * (two_pi / m))[None, :]

    def g_fn(centers, radii):
        c_r = jnp.tile(centers, (n, 1))  # [N*S, 3]
        r_r = jnp.tile(radii, (n,))
        x = _edge_points_from(p_r, c_r, r_r, phi)  # [N*S, M, 3]
        w_dir = x - p_r[:, None, :]
        w_len = jnp.sqrt(jnp.maximum(jnp.sum(w_dir * w_dir, -1), 1e-20))
        omega = w_dir / w_len[..., None]  # the ONLY differentiable quantity
        om_d = jax.lax.stop_gradient(omega)

        c_d = jax.lax.stop_gradient(c_r)
        r_d = jax.lax.stop_gradient(r_r)
        dist = jnp.sqrt(jnp.maximum(jnp.sum((c_d - p_r) ** 2, -1), 1e-20))
        axis = (c_d - p_r) / dist[:, None]
        sin_a = jnp.clip(r_d / dist, 0.0, 1.0)  # angular radius of the cone

        # outward normal of the occlusion cone in direction space: the
        # rejection of −axis onto the tangent plane at ω
        n_e = om_d * jnp.sum(om_d * axis[:, None, :], -1, keepdims=True) - axis[:, None, :]
        n_e = n_e / jnp.maximum(jnp.linalg.norm(n_e, axis=-1, keepdims=True), 1e-12)

        # ±δ visibility probes (in = inside the occlusion cone), one trace
        dirs = jnp.stack([om_d - delta_ang * n_e, om_d + delta_ang * n_e])
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        org = jnp.broadcast_to(p_r[None, :, None, :], dirs.shape)
        sh = trace(prep, (org + dirs * eps).reshape(-1, 3), dirs.reshape(-1, 3))
        obj_pr = sh.obj.reshape(2, n * s, m)
        dv = (obj_pr[0][..., None] == light_obj).astype(jnp.float32) - (
            obj_pr[1][..., None] == light_obj
        ).astype(jnp.float32)  # [N*S, M, L] = V_in − V_out

        # K(ω) per light: pdf_l·f·cos·L_e/(pdf_b+pdf_l), via the same bsdf
        # ops as integrator._nee so the integrand matches by construction
        nb, vb = n_r[:, None, :], v_r[:, None, :]
        f_lam = bsdf.lambert_eval_cos(diff_r[:, None, :], nb, om_d)[..., :3]
        pdf_lam = bsdf.lambert_pdf(nb, om_d)  # [N*S, M]
        expb = jnp.broadcast_to(exp_r[:, None], pdf_lam.shape)
        f_ph = bsdf.phong_eval_cos(spec_r[:, None, :], vb, nb, om_d, expb)[..., :3]
        pdf_ph = bsdf.phong_pdf(vb, nb, om_d, expb)

        def branch(f, pdf_b, gate):
            den = pdf_b[..., None] + pl  # [N*S, M, L]
            ok = gate[..., None] & (pl > 0)
            return jnp.where(
                ok[..., None],
                f[:, :, None, :] / jnp.where(den == 0, 1.0, den)[..., None],
                0.0,
            )  # [N*S, M, L, 3]

        k_int = branch(f_lam, pdf_lam, pdf_lam != 0) + branch(
            f_ph, pdf_ph, (expb > 0) & (pdf_ph != 0)
        )
        k_int = k_int * prep.light_emission[None, None, :, :3] * pl[..., None]

        sphere_obj = num_p + jnp.arange(s, dtype=jnp.int32)
        occ_obj = jnp.tile(sphere_obj, n)  # [N*S]
        valid = (hobj_r >= 0) & (hobj_r != occ_obj) & (dist > r_d)
        lmask = (occ_obj[:, None] != light_obj[None, :]) & (
            hobj_r[:, None] != light_obj[None, :]
        )  # occluder is not the light; shading point is not on the light
        coeff = jnp.sum(
            jnp.where(
                valid[:, None, None] & lmask[:, None, :],
                dv * jnp.sum(cot_r[:, None, None, :] * k_int, -1),
                0.0,
            ),
            axis=-1,
        )  # [N*S, M]
        w_s = jax.lax.stop_gradient(coeff * sin_a[:, None] * (two_pi / m))
        return jnp.sum(w_s * jnp.sum(n_e * omega, -1))

    gc_flat, gr_flat = jax.grad(g_fn, argnums=(0, 1))(centers0, radii0)
    return gc_flat, gr_flat


def make_silhouette_term(
    width: int,
    height: int,
    config: RenderConfig = RenderConfig(),
    n_edge: int = 256,
    shadow_edges: bool = False,
    n_shadow_edge: int = 4,
):
    """A zero-valued image term whose VJP is the silhouette boundary gradient.

    Add it to a differentiable render: ``img = render(scene) +
    silhouette_term(scene, key)`` — the primal is exactly zero, and under
    `jax.grad` the upstream cotangent flows into the boundary integral,
    completing the interior gradients at visibility discontinuities.
    ``shadow_edges=True`` also adds the NEE-visibility boundary term
    (`shadow_silhouette_grads`, ``n_shadow_edge`` ring samples per pixel per
    occluder), needed when a sphere must be recovered from its cast shadow."""

    @jax.custom_vjp
    def term(scene, key):
        return jnp.zeros((height, width, 4), jnp.float32)

    def fwd(scene, key):
        return term(scene, key), (scene, key)

    def bwd(res, cot):
        scene, key = res
        gc, gr = silhouette_loss_grads(scene, key, cot, width, height, config, n_edge)
        if shadow_edges:
            gc2, gr2 = shadow_silhouette_grads(
                scene, jax.random.fold_in(key, 1), cot, width, height, config, n_shadow_edge
            )
            gc, gr = gc + gc2, gr + gr2
        zero = jax.tree.map(jnp.zeros_like, scene)
        st = zero.sphere_transform
        st = st.at[:, 0, 3].set(gc[:, 0]).at[:, 1, 3].set(gc[:, 1]).at[:, 2, 3].set(gc[:, 2])
        scene_bar = dataclasses.replace(zero, sphere_transform=st, sphere_radius=gr)
        key_bar = np.zeros(key.shape, jax.dtypes.float0)
        return scene_bar, key_bar

    term.defvjp(fwd, bwd)
    return term
