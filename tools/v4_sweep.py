"""Trace-level sweep of the V4 streaming-kernel knobs on the real TPU.

The config-5 render is trace-bound (~24 ms per scattered trace at 100k
spheres ~= the whole per-pass budget), so sweeping V4_RAY_ROWS / V4_SUB /
V4_SUPER at the TRACE level isolates the lever without paying the ~5 min
remote recompile of the full while_loop render graph per variant (Mosaic
kernels compile in seconds).

Measures nearest_sphere on (a) camera-primary rays and (b) scattered
bounce-like rays (random origins in the scene extent, random directions,
both run through ray_sort_perm exactly as geometry.trace does), plus
occluded_sphere on scattered rays with finite cuts. Honest chain-scalar
sync per group (see bench.py timed_groups).

Usage: python tools/v4_sweep.py [n_spheres] [n_rays]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    args = sys.argv[1:]
    n_sph = int(args[0]) if args else 100_000
    n_rays = int(args[1]) if len(args) > 1 else 49_152

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/kajo_jax_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from kajo_tpu.ops import geometry
    from kajo_tpu.ops.pallas import stream_trace as st
    from kajo_tpu.scene.procedural import random_spheres_scene

    scene = random_spheres_scene(n_sph, seed=0, extent=60.0)
    prep = geometry.prepare_scene(scene)
    assert prep.stream_packed is not None

    w = int((n_rays * 4 / 3) ** 0.5)
    h = n_rays // w
    xs, ys = jnp.meshgrid(jnp.linspace(0.01, 0.99, w), jnp.linspace(0.01, 0.99, h))
    o_pri, d_pri = geometry.generate_rays(prep.camera, xs.ravel(), ys.ravel())

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    o_sc = jax.random.uniform(k1, o_pri.shape, minval=-55.0, maxval=55.0)
    d_sc = jax.random.normal(k2, d_pri.shape)
    d_sc = d_sc / jnp.linalg.norm(d_sc, axis=-1, keepdims=True)
    t_cut = jax.random.uniform(k3, (o_sc.shape[0],), minval=5.0, maxval=40.0)

    from kajo_tpu.ops.pallas.stream_trace import ray_sort_perm

    boxes2 = prep.stream_boxes[:, 0, :]
    blo = jnp.min(boxes2[:, 0:3], axis=0)
    bhi = jnp.max(boxes2[:, 3:6], axis=0)

    def sortit(o, d, *extra):
        p = ray_sort_perm(o, d, blo, bhi)
        return (o[p], d[p]) + tuple(e[p] for e in extra)

    o_pri, d_pri = jax.block_until_ready(sortit(o_pri, d_pri))
    o_sc, d_sc, t_cut = jax.block_until_ready(sortit(o_sc, d_sc, t_cut))

    def timed(fn, reps=8, groups=3):
        # warm + first-readback (see bench.py timed_groups for why)
        float(fn(0).ravel()[0] + fn(1).ravel()[0])
        rates = []
        k = 0
        for _ in range(groups):
            t0 = time.time()
            acc = None
            for _ in range(reps):
                v = fn(k).ravel()[0]
                k += 1
                acc = v if acc is None else acc + v
            float(acc)
            rates.append((time.time() - t0) / reps * 1e3)
        return min(rates)  # ms per call, best group

    base = (st.V4_RAY_ROWS, st.V4_SUB, st.V4_SUPER)
    print(f"scene {n_sph}, rays {o_pri.shape[0]} (defaults rr,sub,super = {base})")
    variants = []
    for rr in (32, 16, 8):
        variants.append((rr, 4, 8))
    for sub in (8, 2):
        variants.append((32, sub, 8))
    for sup in (4, 16, 0):
        variants.append((32, 4, sup))
    seen = set()
    for rr, sub, sup in variants:
        if (rr, sub, sup) in seen:
            continue
        seen.add((rr, sub, sup))
        st.V4_RAY_ROWS, st.V4_SUB, st.V4_SUPER = rr, sub, sup
        try:
            near = jax.jit(lambda o, d: st.nearest_sphere(prep, o, d)[0])
            occl = jax.jit(lambda o, d, t: st.occluded_sphere(prep, o, d, t))
            ms_pri = timed(lambda i: near(o_pri, d_pri))
            ms_sc = timed(lambda i: near(o_sc, d_sc))
            ms_oc = timed(lambda i: occl(o_sc, d_sc, t_cut).astype(jnp.float32))
            print(
                f"rr={rr:2d} sub={sub} super={sup:2d}: primary {ms_pri:6.2f} ms  "
                f"scattered {ms_sc:6.2f} ms  occl {ms_oc:6.2f} ms",
                flush=True,
            )
        except Exception as e:
            print(f"rr={rr} sub={sub} super={sup}: FAILED {e!r}", flush=True)
    st.V4_RAY_ROWS, st.V4_SUB, st.V4_SUPER = base


if __name__ == "__main__":
    main()
