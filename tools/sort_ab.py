"""Config-5 sort-placement A/B (round 5).

DEPRECATED METHODOLOGY — this script times variants SEQUENTIALLY, and the
tunnel's multi-minute speed episodes make that unreliable (this script
"measured" the sort at 37%; the interleaved rerun showed 6%). Use
tools/flag_ab.py / sort_ab3.py (AOT pairs, alternating groups). Kept as the
artifact that exposed the problem.

The production pass runs TWO argsort+gather rounds per wavefront iteration
(one inside trace, one inside light_visible). Candidate restructures:

  prod          REORDER_WAVEFRONT off, per-call sorts on   (round-4 default)
  no_nee        direct_lighting off — bounds any NEE-side win
  reorder_only  state-level sort ON, per-call sorts OFF    (1 argsort/iter)
  no_sort       everything off — bounds the total sort cost

Each variant flips module flags then jax.clear_caches() so the jit retraces
with the flags honored (same shapes; the persistent cache takes the compile
hit once per variant). Honest chained-scalar sync per bench.py.

Usage: python tools/sort_ab.py [--variants prod,no_nee,...]
"""

import argparse
import dataclasses
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, groups=4, iters=1):
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
    ap.add_argument(
        "--variants", default="prod,no_nee,reorder_only,no_sort"
    )
    ap.add_argument("--passes", type=int, default=8)
    ap.add_argument("--n", type=int, default=100_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    d = "/tmp/kajo_jax_cache"
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from kajo_tpu.models import wavefront
    from kajo_tpu.models.integrator import RenderConfig
    from kajo_tpu.models.wavefront import render_passes_fast
    from kajo_tpu.ops import geometry
    from kajo_tpu.scene.procedural import random_spheres_scene

    key = jax.random.PRNGKey(0)
    bw, bh, bspp, nb = 128, 96, 4, args.passes
    big = random_spheres_scene(args.n, seed=0, extent=60.0)
    spp_total = bw * bh * bspp * nb
    cfg = RenderConfig(max_depth=2, one_light_nee=True)
    cfg_nonee = RenderConfig(max_depth=2, direct_lighting=False)

    # (reorder_flag, sort_flag, config)
    variants = {
        "prod": (None, True, cfg),
        "no_nee": (None, True, cfg_nonee),
        "reorder_only": (True, False, cfg),
        "no_sort": (False, False, cfg),
    }

    # first readback flips the runtime out of deferred mode
    img = render_passes_fast(big, key, jnp.int32(0), bw, bh, bspp, nb, cfg)
    float(np.asarray(img)[0, 0, 0])

    for name in args.variants.split(","):
        reorder, sort, c = variants[name]
        wavefront.REORDER_WAVEFRONT = reorder
        geometry.SORT_STREAM_RAYS = sort
        jax.clear_caches()
        t0 = time.time()
        fn = lambda i: render_passes_fast(
            big, key, jnp.int32(1 + nb * i), bw, bh, bspp, nb, c
        )
        fn(0).block_until_ready()
        compile_s = time.time() - t0
        med, times = timed(fn)
        print(
            f"{name:13s}: {med * 1000:8.1f} ms/dispatch "
            f"({spp_total / med / 1e3:7.1f}K samples/s)  compile {compile_s:.0f}s  "
            f"[{', '.join(f'{t * 1000:.0f}' for t in times)}]",
            flush=True,
        )
    wavefront.REORDER_WAVEFRONT = None
    geometry.SORT_STREAM_RAYS = True


if __name__ == "__main__":
    main()
