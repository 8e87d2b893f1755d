"""Interleaved sharded-vs-unsharded megakernel A/B (round 5).

The bench's sharded_mega row (1-device mesh) read ~72% of the headline in
sequential rows — either real shard_map overhead or tunnel drift between
rows. AOT-compile both and alternate groups to decide.

Usage: python tools/shard_ab.py [--groups 6]
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
    from kajo_tpu.ops.pallas.megakernel import (
        render_pass_megakernel,
        render_pass_megakernel_sharded,
    )
    from kajo_tpu.parallel.render import make_mesh
    from kajo_tpu.scene import parser

    W, H, SPP = 512, 384, 16
    scene = parser.load("/root/reference/data/spheres.json", W / H)
    config = RenderConfig()
    key = jax.random.PRNGKey(0)
    mesh1 = make_mesh(jax.devices()[:1])
    spp_pass = W * H * 16

    fns = {
        "unsharded": lambda k: render_pass_megakernel(scene, k, W, H, SPP, config),
        "sharded": lambda k: render_pass_megakernel_sharded(
            scene, k, W, H, SPP, config, mesh1
        ),
    }
    for name, fn in fns.items():
        t0 = time.time()
        float(np.asarray(fn(key))[0, 0, 0])
        print(f"{name} warm in {time.time() - t0:.0f}s", flush=True)

    def chain(out, acc):
        v = out.ravel()[0]
        return v if acc is None else acc + v

    times = {n: [] for n in fns}
    k = 0
    for g in range(args.groups):
        for name, fn in fns.items():
            t0 = time.time()
            acc = None
            for _ in range(args.iters):
                acc = chain(fn(jax.random.fold_in(key, k)), acc)
                k += 1
            float(acc)
            times[name].append((time.time() - t0) / args.iters)
    for name in fns:
        ts = times[name]
        med = statistics.median(ts)
        print(
            f"{name:10s}: median {med * 1000:7.1f} ms/pass "
            f"({spp_pass / med / 1e6:6.1f}M samples/s) "
            f"[{', '.join(f'{t * 1000:.0f}' for t in ts)}]",
            flush=True,
        )


if __name__ == "__main__":
    main()
