"""Interleaved sort A/B (round 5, definitive).

sort_ab.py (sequential variants) said per-call sorts cost 37% on config 5;
sort_ab2.py (another process) said 0%. Tunnel-speed episodes drift across
the minutes a sequential A/B takes, so only INTERLEAVED timing decides:
AOT-compile both variants (flag baked at lower() time), then alternate
A,B,A,B,... groups so any drift hits both equally.

Usage: python tools/sort_ab3.py [--groups 6] [--depth 2] [--n 100000]
                                 [--w 128] [--h 96] [--nonee]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=6)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--w", type=int, default=128)
    ap.add_argument("--h", type=int, default=96)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--passes", type=int, default=8)
    ap.add_argument("--nonee", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    d = "/tmp/kajo_jax_cache"
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from kajo_tpu.models.integrator import RenderConfig
    from kajo_tpu.models.wavefront import render_passes_fast
    from kajo_tpu.ops import geometry
    from kajo_tpu.scene.procedural import random_spheres_scene

    key = jax.random.PRNGKey(0)
    w, h, spp, nb = args.w, args.h, args.spp, args.passes
    big = random_spheres_scene(args.n, seed=0, extent=60.0)
    cfg = (
        RenderConfig(max_depth=args.depth, direct_lighting=False)
        if args.nonee
        else RenderConfig(max_depth=args.depth, one_light_nee=True)
    )
    spp_total = w * h * spp * nb

    compiled = {}
    for sort in (True, False):
        geometry.SORT_STREAM_RAYS = sort
        jax.clear_caches()
        t0 = time.time()
        lowered = render_passes_fast.lower(
            big, key, jnp.int32(0), w, h, spp, nb, cfg
        )
        compiled[sort] = lowered.compile()
        print(f"sort={int(sort)} compiled in {time.time() - t0:.0f}s", flush=True)
    geometry.SORT_STREAM_RAYS = True

    # one readback before timing (axon deferred-dispatch)
    float(np.asarray(compiled[True](big, key, jnp.int32(0)))[0, 0, 0])
    float(np.asarray(compiled[False](big, key, jnp.int32(0)))[0, 0, 0])

    def one_group(sort, k):
        t0 = time.time()
        out = compiled[sort](big, key, jnp.int32(1 + nb * k))
        # honest sync: chain a scalar and read it back
        float(jnp.asarray(out).ravel()[0])
        return time.time() - t0

    times = {True: [], False: []}
    for g in range(args.groups):
        for sort in (True, False):
            times[sort].append(one_group(sort, 2 * g + int(sort)))
    for sort in (True, False):
        ts = times[sort]
        med = statistics.median(ts)
        print(
            f"sort={int(sort)}: median {med * 1000:8.1f} ms "
            f"({spp_total / med / 1e3:7.1f}K samples/s) "
            f"[{', '.join(f'{t * 1000:.0f}' for t in ts)}]",
            flush=True,
        )


if __name__ == "__main__":
    main()
