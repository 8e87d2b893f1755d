"""Honest A/B for the config-5 (100k-sphere) render rate.

Crosses {V4_SUPER off/on} x {all-lights / one-light NEE} on the real TPU
with the chain-scalar sync (see bench.py timed_groups). Each variant gets a
distinct sphere count so the module-flag state is baked into a fresh jit
trace.

Usage: python tools/bigscene_ab.py [n_spheres] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    args = sys.argv[1:]
    n_sph = int(args[0]) if args else 100_000
    reps = int(args[1]) if len(args) > 1 else 6

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/kajo_jax_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from kajo_tpu.models.integrator import RenderConfig
    from kajo_tpu.models.wavefront import render_pass_fast as rpf
    from kajo_tpu.ops.pallas import stream_trace as st
    from kajo_tpu.scene.procedural import random_spheres_scene

    w, h, spp = 128, 96, 4
    key = jax.random.PRNGKey(0)
    samples = w * h * spp

    variants = [
        ("super=0 all-lights", 0, False),
        ("super=8 all-lights", 8, False),
        ("super=0 one-light ", 0, True),
        ("super=8 one-light ", 8, True),
    ]
    for vi, (name, sup, ol) in enumerate(variants):
        st.V4_SUPER = sup
        cfg = RenderConfig(max_depth=2, one_light_nee=ol)
        big = random_spheres_scene(n_sph + 10 + vi, seed=0, extent=60.0)
        img = rpf(big, key, w, h, spp, cfg)
        float(img.ravel()[0])
        img = rpf(big, jax.random.fold_in(key, 99), w, h, spp, cfg)
        float(img.ravel()[0])
        t0 = time.time()
        acc = None
        for i in range(reps):
            img = rpf(big, jax.random.fold_in(key, i + 1), w, h, spp, cfg)
            v = img.ravel()[0]
            acc = v if acc is None else acc + v
        float(acc)
        rate = samples * reps / (time.time() - t0)
        mean = float(jnp.mean(img[..., :3]))
        print(f"{name}: {rate / 1e3:7.1f}K samples/s  (img mean {mean:.4f})", flush=True)

    st.V4_SUPER = 8


if __name__ == "__main__":
    main()
