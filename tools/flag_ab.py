"""Generic interleaved flag A/B on the config-5 production pass (round 5).

AOT-compiles one executable per flag assignment, then alternates timed
groups across all variants so tunnel-speed drift cancels (the only A/B
methodology that has proven trustworthy on this runtime — see
tools/sort_ab3.py history).

Usage:
  python tools/flag_ab.py --flags stream_trace.V4_RAY_ROWS=16,32
  python tools/flag_ab.py --flags stream_trace.V4_SUPER=4,8,16 --depth 4
  python tools/flag_ab.py --flags wavefront.LANE_MULT=2,4 --n 10000 --w 256 --h 192

Each --flags entry is MODULE.NAME=v1,v2,... (module under kajo_tpu resolved
by suffix: stream_trace, geometry, wavefront). One flag per run.
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flags", required=True)
    ap.add_argument("--groups", type=int, default=6)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--w", type=int, default=128)
    ap.add_argument("--h", type=int, default=96)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--passes", type=int, default=8)
    ap.add_argument("--jitter", type=float, default=0.0)
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
    from kajo_tpu.ops.pallas import stream_trace
    from kajo_tpu.scene.procedural import random_spheres_scene

    mods = {
        "stream_trace": stream_trace,
        "geometry": geometry,
        "wavefront": wavefront,
    }
    # one or more MODULE.NAME=v1,v2 specs separated by ';' — variants are the
    # cartesian product
    import itertools

    flag_specs = []
    for part in args.flags.split(";"):
        spec, vals = part.split("=")
        modname, flagname = spec.rsplit(".", 1)
        mod = mods[modname]
        orig = getattr(mod, flagname)
        vs = [
            type(orig)(v) if not isinstance(orig, bool) else v in ("1", "True")
            for v in vals.split(",")
        ]
        flag_specs.append((mod, flagname, orig, vs))
    values = list(itertools.product(*[vs for _, _, _, vs in flag_specs]))

    def set_combo(combo):
        for (mod, flagname, _, _), v in zip(flag_specs, combo):
            setattr(mod, flagname, v)

    def combo_name(combo):
        return ",".join(
            f"{fl}={v}" for (_, fl, _, _), v in zip(flag_specs, combo)
        )

    key = jax.random.PRNGKey(0)
    w, h, spp, nb = args.w, args.h, args.spp, args.passes
    big = random_spheres_scene(
        args.n, seed=0, extent=60.0, scale_jitter=args.jitter
    )
    cfg = RenderConfig(max_depth=args.depth, one_light_nee=True)
    spp_total = w * h * spp * nb

    compiled = {}
    for v in values:
        set_combo(v)
        jax.clear_caches()
        t0 = time.time()
        compiled[v] = render_passes_fast.lower(
            big, key, jnp.int32(0), w, h, spp, nb, cfg
        ).compile()
        print(f"{combo_name(v)} compiled in {time.time() - t0:.0f}s", flush=True)
    for mod, flagname, orig, _ in flag_specs:
        setattr(mod, flagname, orig)

    for v in values:
        float(np.asarray(compiled[v](big, key, jnp.int32(0)))[0, 0, 0])

    times = {v: [] for v in values}
    for g in range(args.groups):
        for j, v in enumerate(values):
            t0 = time.time()
            out = compiled[v](big, key, jnp.int32(1 + nb * (len(values) * g + j)))
            float(jnp.asarray(out).ravel()[0])
            times[v].append(time.time() - t0)
    for v in values:
        ts = times[v]
        med = statistics.median(ts)
        print(
            f"{combo_name(v)}: median {med * 1000:8.1f} ms "
            f"({spp_total / med / 1e3:7.1f}K samples/s) "
            f"[{', '.join(f'{t * 1000:.0f}' for t in ts)}]",
            flush=True,
        )


if __name__ == "__main__":
    main()
