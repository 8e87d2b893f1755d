"""Probe the axon tunnel's per-process dispatch acceleration window.

Times each rep of the SAME compiled streaming-trace kernel individually.
If the tunnel deprioritizes after a per-process budget, the series shows a
sharp fast->slow transition; the rep index and cumulative device time at
the flip characterize the window (methodology input for bench.py).
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
    prep = geometry.prepare_scene(scene)
    packed, boxes = prep.stream_packed, prep.stream_boxes
    if packed is None:
        packed, boxes, _ = st.build_stream_scene(prep)

    w, h = 128, 96
    xs, ys = jnp.meshgrid(jnp.linspace(0.01, 0.99, w), jnp.linspace(0.01, 0.99, h))
    o, dd = generate_rays(prep.camera, xs.ravel(), ys.ravel())
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    o = jax.random.uniform(k1, o.shape, minval=-55.0, maxval=55.0)
    dd = jax.random.normal(k2, dd.shape)
    dd = dd / jnp.linalg.norm(dd, axis=-1, keepdims=True)

    lane_tile = st.RAY_ROWS * 128
    n = o.shape[0]
    n_pad = -(-n // lane_tile) * lane_tile
    pad = lambda a: jnp.pad(a, ((0, n_pad - n), (0, 0)))
    tm = jnp.full((n_pad,), st.BIG, jnp.float32)
    op, dp = pad(o), pad(dd)

    f = jax.jit(partial(st._nearest, prep.rigid))
    r = f(op, dp, tm, packed, boxes)
    jax.block_until_ready(r)

    times = []
    for i in range(120):
        t0 = time.perf_counter()
        r = f(op, dp, tm, packed, boxes)
        jax.block_until_ready(r)
        times.append((time.perf_counter() - t0) * 1e3)
    cum = 0.0
    for i, t in enumerate(times):
        cum += t
        if i < 40 or i % 10 == 0 or t > 3 * times[0]:
            print(f"rep {i:3d}: {t:7.2f} ms   cum {cum:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
