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
Shadow (NEE-visibility) edges are not yet sampled — primary silhouettes are
the dominant term for the config-4 position/radius recovery tasks.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.integrator import RenderConfig, render_samples
from ..ops.geometry import generate_rays, prepare_scene
from ..scene.types import Scene
from ..utils.math3d import project

# screen-space offset (in pixels) of the two one-sided radiance probes
EDGE_DELTA_PX = 0.05


def _edge_points(centers, radii, phi, o_cam):
    """Silhouette circle points [S, M, 3] as a smooth function of (c, r).

    ``phi`` is [S, M] per-sphere angles."""
    a_vec = centers - o_cam[None, :]  # [S, 3]
    dist = jnp.linalg.norm(a_vec, axis=-1, keepdims=True)  # [S, 1]
    a = a_vec / dist
    up = jnp.where(
        (jnp.abs(a[:, 1]) < 0.9)[:, None],
        jnp.array([0.0, 1.0, 0.0], jnp.float32),
        jnp.array([1.0, 0.0, 0.0], jnp.float32),
    )
    e1 = jnp.cross(a, up)
    e1 = e1 / jnp.linalg.norm(e1, axis=-1, keepdims=True)
    e2 = jnp.cross(a, e1)
    sin_t = radii[:, None] / dist  # [S, 1] sin of the cone half-angle
    cos_t2 = jnp.maximum(1.0 - sin_t * sin_t, 0.0)
    ring_c = centers - (radii[:, None] * sin_t) * a  # circle center
    ring_r = radii[:, None] * jnp.sqrt(cos_t2)  # circle radius
    cphi = jnp.cos(phi)[..., None]  # [S, M, 1]
    sphi = jnp.sin(phi)[..., None]
    return ring_c[:, None, :] + ring_r[:, None, :] * (cphi * e1[:, None, :] + sphi * e2[:, None, :])


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


def make_silhouette_term(
    width: int, height: int, config: RenderConfig = RenderConfig(), n_edge: int = 256
):
    """A zero-valued image term whose VJP is the silhouette boundary gradient.

    Add it to a differentiable render: ``img = render(scene) +
    silhouette_term(scene, key)`` — the primal is exactly zero, and under
    `jax.grad` the upstream cotangent flows into the boundary integral,
    completing the interior gradients at visibility discontinuities."""

    @jax.custom_vjp
    def term(scene, key):
        return jnp.zeros((height, width, 4), jnp.float32)

    def fwd(scene, key):
        return term(scene, key), (scene, key)

    def bwd(res, cot):
        scene, key = res
        gc, gr = silhouette_loss_grads(scene, key, cot, width, height, config, n_edge)
        zero = jax.tree.map(jnp.zeros_like, scene)
        st = zero.sphere_transform
        st = st.at[:, 0, 3].set(gc[:, 0]).at[:, 1, 3].set(gc[:, 1]).at[:, 2, 3].set(gc[:, 2])
        scene_bar = dataclasses.replace(zero, sphere_transform=st, sphere_radius=gr)
        key_bar = np.zeros(key.shape, jax.dtypes.float0)
        return scene_bar, key_bar

    term.defvjp(fwd, bwd)
    return term
