"""A/B: FRONT_TO_BACK block ordering vs Morton order, same compiled kernel.

The ordering is a pack-time data permutation, so both variants run through
ONE jitted _nearest call — no recompile, no cross-process variance. Measures
primary (coherent) and scattered (bounce-regime) traces at 100k spheres.

Usage: python tools/ftb_ab.py [n_spheres]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    n_sph = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/kajo_jax_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from kajo_tpu.ops import geometry
    from kajo_tpu.ops.geometry import generate_rays
    from kajo_tpu.ops.pallas import stream_trace as st
    from kajo_tpu.scene.procedural import random_spheres_scene

    scene = random_spheres_scene(n_sph, seed=0, extent=60.0)
    # prepare WITHOUT the cached packing so we control the flag per build
    saved = st.FRONT_TO_BACK
    st.FRONT_TO_BACK = False
    prep = geometry.prepare_scene(scene)
    packed_off, boxes_off, perm_off = (
        prep.stream_packed,
        prep.stream_boxes,
        prep.stream_perm,
    )
    st.FRONT_TO_BACK = True
    packed_on, boxes_on, perm_on = st.build_stream_scene(prep)
    st.FRONT_TO_BACK = saved

    w, h = 128, 96
    xs, ys = jnp.meshgrid(jnp.linspace(0.01, 0.99, w), jnp.linspace(0.01, 0.99, h))
    o_pri, d_pri = generate_rays(prep.camera, xs.ravel(), ys.ravel())

    # scattered (bounce-regime) rays: random origins in the scene extent,
    # random unit directions
    k = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(k)
    o_sc = jax.random.uniform(k1, o_pri.shape, minval=-55.0, maxval=55.0)
    d_sc = jax.random.normal(k2, d_pri.shape)
    d_sc = d_sc / jnp.linalg.norm(d_sc, axis=-1, keepdims=True)

    lane_tile = st.RAY_ROWS * 128
    n = o_pri.shape[0]
    n_pad = -(-n // lane_tile) * lane_tile
    pad = lambda a: jnp.pad(a, ((0, n_pad - n), (0, 0)))
    tm = jnp.full((n_pad,), st.BIG, jnp.float32)

    f = jax.jit(partial(st._nearest, prep.rigid))

    def timed(o, d, packed, boxes, reps=10):
        t, i = f(pad(o), pad(d), tm, packed, boxes)
        jax.block_until_ready((t, i))
        t0 = time.time()
        for _ in range(reps):
            t, i = f(pad(o), pad(d), tm, packed, boxes)
        jax.block_until_ready((t, i))
        return (time.time() - t0) / reps * 1e3, t, i

    results = {}
    for name, (o, d) in {"primary": (o_pri, d_pri), "scattered": (o_sc, d_sc)}.items():
        ms_off, t0_, i0_ = timed(o, d, packed_off, boxes_off)
        ms_on, t1_, i1_ = timed(o, d, packed_on, boxes_on)
        # map winners to original ids for an exactness check across orders
        id0 = jnp.where(i0_ >= 0, perm_off[jnp.maximum(i0_, 0)].astype(jnp.int32), -1)
        id1 = jnp.where(i1_ >= 0, perm_on[jnp.maximum(i1_, 0)].astype(jnp.int32), -1)
        same = bool(jnp.all((id0 == id1) & (jnp.abs(t0_ - t1_) <= 1e-6 * jnp.abs(t0_))))
        results[name] = (ms_off, ms_on, same)
        print(
            f"{name:9s}: morton {ms_off:7.2f} ms  front-to-back {ms_on:7.2f} ms  "
            f"({ms_off / ms_on:.2f}x)  winners-match={same}",
            flush=True,
        )


if __name__ == "__main__":
    main()
