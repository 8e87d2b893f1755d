"""Sort A/B across bounce regimes (round 5, follow-up to sort_ab.py).

DEPRECATED METHODOLOGY — sequential variants; see sort_ab.py's note and
use tools/flag_ab.py instead.

sort_ab.py showed per-call ray sorting is a net LOSS on config 5 (depth 2):
205K sorted vs 280K unsorted — the two ~10 ms argsorts per iteration cost
more than the coherence they buy once lanes ride the tiled pixel order.
This probe checks deeper-bounce regimes (depth 4, where 3rd+ generation
bounce rays are genuinely scattered) at 10k and 100k spheres before any
default flip.

Usage: python tools/sort_ab2.py
"""

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
    nb = 8

    cases = [
        # (label, n_spheres, w, h, spp, depth)
        ("d2_100k_128", 100_000, 128, 96, 4, 2),
        ("d4_100k_128", 100_000, 128, 96, 4, 4),
        ("d4_10k_256", 10_000, 256, 192, 4, 4),
    ]

    first = True
    for label, n, w, h, spp, depth in cases:
        big = random_spheres_scene(n, seed=0, extent=60.0)
        cfg = RenderConfig(max_depth=depth, one_light_nee=True)
        spp_total = w * h * spp * nb
        for sort in (True, False):
            geometry.SORT_STREAM_RAYS = sort
            jax.clear_caches()
            fn = lambda i: render_passes_fast(
                big, key, jnp.int32(1 + nb * i), w, h, spp, nb, cfg
            )
            t0 = time.time()
            out = fn(0)
            if first:
                float(np.asarray(out)[0, 0, 0])
                first = False
            else:
                out.block_until_ready()
            compile_s = time.time() - t0
            med, times = timed(fn)
            print(
                f"{label:13s} sort={int(sort)}: {med * 1000:8.1f} ms "
                f"({spp_total / med / 1e3:7.1f}K samples/s) compile {compile_s:.0f}s "
                f"[{', '.join(f'{t * 1000:.0f}' for t in times)}]",
                flush=True,
            )
    geometry.SORT_STREAM_RAYS = True


if __name__ == "__main__":
    main()
