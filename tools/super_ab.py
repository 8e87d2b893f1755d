"""A/B: V4 superblock cull level (V4_SUPER) x inner tile rows (V4_RAY_ROWS).

Same-process timing of the streaming trace (primary + scattered rays) and
the config-5 render for each variant. Module flags are read at trace time,
so each variant gets a fresh jit wrapper (traces) and a distinct sphere
count (renders — render_pass_fast is module-jitted and shape-cached).

Usage: python tools/super_ab.py [n_spheres] [--render]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_sph = int(args[0]) if args else 100_000
    do_render = "--render" in sys.argv[1:]

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/kajo_jax_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from kajo_tpu.models.integrator import RenderConfig
    from kajo_tpu.models.wavefront import render_pass_fast as rpf
    from kajo_tpu.ops import geometry
    from kajo_tpu.ops.geometry import generate_rays
    from kajo_tpu.ops.pallas import stream_trace as st
    from kajo_tpu.scene.procedural import random_spheres_scene

    scene = random_spheres_scene(n_sph, seed=0, extent=60.0)
    prep = geometry.prepare_scene(scene)
    packed, boxes, perm = (
        prep.stream_packed,
        prep.stream_boxes,
        prep.stream_perm,
    )
    if packed is None:
        packed, boxes, perm = st.build_stream_scene(prep)

    w, h = 128, 96
    xs, ys = jnp.meshgrid(jnp.linspace(0.01, 0.99, w), jnp.linspace(0.01, 0.99, h))
    o_pri, d_pri = generate_rays(prep.camera, xs.ravel(), ys.ravel())

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

    variants = [(0, 32), (8, 32), (4, 32), (16, 32), (8, 16), (8, 8), (0, 8)]
    base = {}
    key = jax.random.PRNGKey(0)
    bcfg = RenderConfig(max_depth=2)
    bspp = 4
    samples = w * h * bspp

    # honest sync on the axon tunnel (see bench.py timed_groups): chain each
    # rep's outputs into one device scalar and read 4 bytes back at the end —
    # block_until_ready alone lets dead results be deferred/elided
    for vi, (sup, rr) in enumerate(variants):
        st.V4_SUPER, st.V4_RAY_ROWS = sup, rr
        f = jax.jit(partial(st._nearest, prep.rigid))

        def timed(o_, d_, reps=10):
            t, i = f(pad(o_), pad(d_), tm, packed, boxes)
            float(t.ravel()[0] + i.ravel()[0].astype(jnp.float32))  # warm glue
            t0 = time.time()
            acc = None
            for _ in range(reps):
                t, i = f(pad(o_), pad(d_), tm, packed, boxes)
                v = t.ravel()[0] + i.ravel()[0].astype(jnp.float32)
                acc = v if acc is None else acc + v
            float(acc)
            return (time.time() - t0) / reps * 1e3, t, i

        ms_p, tp, ip = timed(o_pri, d_pri)
        ms_s, ts, is_ = timed(o_sc, d_sc)
        if vi == 0:
            base["p"] = (tp, ip)
            base["s"] = (ts, is_)
            okp = oks = True
        else:
            okp = bool(jnp.all((tp == base["p"][0]) & (ip == base["p"][1])))
            oks = bool(jnp.all((ts == base["s"][0]) & (is_ == base["s"][1])))

        line = (
            f"super={sup:2d} rr={rr:2d}: primary {ms_p:7.2f} ms  "
            f"scattered {ms_s:7.2f} ms  exact(p/s)={okp}/{oks}"
        )

        if do_render:
            # distinct sphere count per variant -> fresh trace of the jitted
            # render (module flags are baked at trace time)
            big = random_spheres_scene(n_sph + vi, seed=0, extent=60.0)
            img = rpf(big, key, w, h, bspp, bcfg)
            float(img.ravel()[0])
            img = rpf(big, jax.random.fold_in(key, 99), w, h, bspp, bcfg)
            float(img.ravel()[0])
            t0 = time.time()
            reps = 4
            acc = None
            for i in range(reps):
                img = rpf(big, jax.random.fold_in(key, i + 1), w, h, bspp, bcfg)
                v = img.ravel()[0]
                acc = v if acc is None else acc + v
            float(acc)
            rate = samples * reps / (time.time() - t0)
            line += f"  render {rate / 1e3:7.1f}K samples/s"

        print(line, flush=True)

    st.V4_SUPER, st.V4_RAY_ROWS = 8, 32


if __name__ == "__main__":
    main()
