"""Interleaved megakernel TILE_ROWS sweep (round 5): headline engine,
spheres.json 512x384x16. Same AOT-paired alternating-group methodology as
tools/flag_ab.py (see BASELINE.md round-5 measurement integrity).

Usage: python tools/mega_ab.py [--values 16,32,64] [--groups 6]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--values", default="16,32,64")
    ap.add_argument("--groups", type=int, default=6)
    ap.add_argument("--iters", type=int, default=7)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    d = "/tmp/kajo_jax_cache"
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from kajo_tpu.models.integrator import RenderConfig
    from kajo_tpu.ops.pallas import megakernel
    from kajo_tpu.scene import parser

    W, H, SPP = 512, 384, 16
    scene = parser.load("/root/reference/data/spheres.json", W / H)
    config = RenderConfig()
    key = jax.random.PRNGKey(0)
    spp_pass = W * H * 16

    values = [int(v) for v in args.values.split(",")]
    orig = megakernel.TILE_ROWS
    compiled = {}
    for v in values:
        megakernel.TILE_ROWS = v
        jax.clear_caches()
        t0 = time.time()
        compiled[v] = megakernel.render_pass_megakernel.lower(
            scene, key, W, H, SPP, config
        ).compile()
        print(f"TILE_ROWS={v} compiled in {time.time() - t0:.0f}s", flush=True)
    megakernel.TILE_ROWS = orig

    for v in values:
        float(np.asarray(compiled[v](scene, key))[0, 0, 0])

    times = {v: [] for v in values}
    k = 0
    for g in range(args.groups):
        for v in values:
            t0 = time.time()
            acc = None
            for _ in range(args.iters):
                out = compiled[v](scene, jax.random.fold_in(key, k))
                k += 1
                s = out.ravel()[0]
                acc = s if acc is None else acc + s
            float(acc)
            times[v].append((time.time() - t0) / args.iters)
    for v in values:
        ts = times[v]
        med = statistics.median(ts)
        print(
            f"TILE_ROWS={v}: median {med * 1000:7.1f} ms/pass "
            f"({spp_pass / med / 1e6:6.1f}M samples/s) "
            f"[{', '.join(f'{t * 1000:.0f}' for t in ts)}]",
            flush=True,
        )


if __name__ == "__main__":
    main()
