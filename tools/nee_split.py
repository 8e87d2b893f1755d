"""Config-5 time split: how much of a production big-scene pass is the NEE
block (occlusion kernel + glue) vs the path trace + estimator?

Times render_passes_fast (the bench/CLI production path: one-light NEE,
LANE_MULT, 8-pass batching) against the same loop with direct_lighting=False
(a DIFFERENT estimator — no shadow work at all — but the same path traces,
so the delta bounds what any NEE-side optimization can win). Honest sync per
bench.py timed_groups (chained scalar + readback).

Usage: python tools/nee_split.py [--passes 8] [--groups 3]
"""

import argparse
import dataclasses
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, groups=3, iters=1):
    import jax
    import jax.numpy as jnp

    def chain(out, acc):
        for leaf in jax.tree_util.tree_leaves(out):
            v = leaf.ravel()[0].astype(jnp.float32)
            acc = v if acc is None else acc + v
        return acc

    float(chain(fn(1), chain(fn(0), None)))
    times = []
    k = 2
    for _ in range(groups):
        t0 = time.time()
        acc = None
        for _ in range(iters):
            acc = chain(fn(k), acc)
            k += 1
        float(acc)
        times.append((time.time() - t0) / iters)
    return statistics.median(times), times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=8)
    ap.add_argument("--groups", type=int, default=3)
    ap.add_argument("--n", type=int, default=100_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    d = "/tmp/kajo_jax_cache"
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from kajo_tpu.models.integrator import RenderConfig
    from kajo_tpu.models.wavefront import render_passes_fast
    from kajo_tpu.scene.procedural import random_spheres_scene

    key = jax.random.PRNGKey(0)
    bw, bh, bspp, nb = 128, 96, 4, args.passes
    big = random_spheres_scene(args.n, seed=0, extent=60.0)
    spp_total = bw * bh * bspp * nb

    cfgs = {
        "one_light": RenderConfig(max_depth=2, one_light_nee=True),
        "no_nee": RenderConfig(max_depth=2, direct_lighting=False),
    }

    import numpy as np

    # first readback before timing (axon lazy-dispatch)
    img = render_passes_fast(big, key, jnp.int32(0), bw, bh, bspp, nb, cfgs["one_light"])
    float(np.asarray(img)[0, 0, 0])

    res = {}
    for name, cfg in cfgs.items():
        fn = lambda i: render_passes_fast(
            big, key, jnp.int32(1 + nb * i), bw, bh, bspp, nb, cfg
        )
        med, times = timed(fn, groups=args.groups)
        res[name] = med
        print(
            f"{name:10s}: {med * 1000:8.1f} ms/dispatch "
            f"({spp_total / med / 1e3:7.1f}K samples/s)  "
            f"[{', '.join(f'{t * 1000:.0f}' for t in times)}]",
            flush=True,
        )

    delta = res["one_light"] - res["no_nee"]
    print(
        f"NEE block (occl kernel + sort + glue): {delta * 1000:.1f} ms/dispatch "
        f"= {100 * delta / res['one_light']:.1f}% of the production pass"
    )


if __name__ == "__main__":
    main()
