"""Interleaved NEE-cost A/B (round 5): production one-light pass vs the same
loop with direct_lighting=False, AOT-compiled and alternated so tunnel drift
cancels. Bounds what ANY NEE-side optimization (fused occlusion, deferred
shadow rays) can win on config 5.

Usage: python tools/nee_ab3.py [--groups 6] [--depth 2]
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
    from kajo_tpu.scene.procedural import random_spheres_scene

    key = jax.random.PRNGKey(0)
    w, h, spp, nb = args.w, args.h, args.spp, args.passes
    big = random_spheres_scene(args.n, seed=0, extent=60.0)
    cfgs = {
        "one_light": RenderConfig(max_depth=args.depth, one_light_nee=True),
        "no_nee": RenderConfig(max_depth=args.depth, direct_lighting=False),
    }
    spp_total = w * h * spp * nb

    compiled = {}
    for name, cfg in cfgs.items():
        t0 = time.time()
        compiled[name] = render_passes_fast.lower(
            big, key, jnp.int32(0), w, h, spp, nb, cfg
        ).compile()
        print(f"{name} compiled in {time.time() - t0:.0f}s", flush=True)

    for name in cfgs:
        float(np.asarray(compiled[name](big, key, jnp.int32(0)))[0, 0, 0])

    def one_group(name, k):
        t0 = time.time()
        out = compiled[name](big, key, jnp.int32(1 + nb * k))
        float(jnp.asarray(out).ravel()[0])
        return time.time() - t0

    times = {n: [] for n in cfgs}
    for g in range(args.groups):
        for j, name in enumerate(cfgs):
            times[name].append(one_group(name, 2 * g + j))
    meds = {}
    for name in cfgs:
        ts = times[name]
        meds[name] = statistics.median(ts)
        print(
            f"{name:10s}: median {meds[name] * 1000:8.1f} ms "
            f"({spp_total / meds[name] / 1e3:7.1f}K samples/s) "
            f"[{', '.join(f'{t * 1000:.0f}' for t in ts)}]",
            flush=True,
        )
    delta = meds["one_light"] - meds["no_nee"]
    print(
        f"NEE block: {delta * 1000:.1f} ms = "
        f"{100 * delta / meds['one_light']:.1f}% of the production pass"
    )


if __name__ == "__main__":
    main()
