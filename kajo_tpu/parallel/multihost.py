"""Multi-host distributed rendering.

The reference's distributed story is an empty stub (coordinator/Main.cpp:5-9
— a never-implemented multi-process render coordinator). The TPU-native
equivalent needs no bespoke networking at all: `jax.distributed.initialize`
joins all hosts of a slice into one process group, `make_mesh` spans every
chip, and the identical SPMD render code (parallel/render.py) runs on each
host with XLA routing collectives over ICI within a slice and DCN across
slices. Scene-parameter gradients all-reduce automatically (replicated
params, sharded rays); the final image is assembled on host 0.

Single-chip/single-host sessions work through the same entry points (the
initialize call becomes a no-op), so the code path is exercised by the
virtual-mesh tests and by the driver's dryrun_multichip.

Typical pod usage (same command on every host):

    python -m kajo_tpu.parallel.multihost SCENE.json --out out.png
"""

from __future__ import annotations

import time

import jax
import numpy as np


def initialize(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-host process group (no-op when single-process).

    On Cloud TPU pods the arguments are auto-detected from the environment;
    pass them explicitly for other clusters.

    Ordering matters: `jax.distributed.initialize` must run BEFORE anything
    that initializes the XLA backend — including `jax.process_count()` /
    `jax.devices()` — so "already initialized" is detected via the
    distributed client state, never via a backend call."""
    from jax._src import distributed as _distributed

    if _distributed.global_state.client is not None:
        return  # already joined (repeat initialize() would raise)
    if coordinator_address or num_processes is not None:
        # explicit cluster spec: failures here are real and must propagate
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
        return
    # No-arg form: only attempt the join when a cluster environment is
    # actually present (Cloud TPU pod, SLURM, Open MPI, K8s jobset) — jax's
    # own plugin detection, run WITHOUT touching the backend. This keeps
    # single-process sessions exact no-ops (jax.distributed.initialize()
    # raises even in them once the backend is up) while letting a *detected*
    # cluster's join failures propagate loudly instead of being swallowed.
    try:
        from jax._src import clusters

        env_present = any(
            c.is_env_present() for c in clusters.ClusterEnv._cluster_types
        )
    except Exception:
        env_present = None  # private detection API unavailable
    if env_present:
        jax.distributed.initialize()
    elif env_present is None:
        try:
            jax.distributed.initialize()
        except ValueError:
            # the documented no-cluster signal ("coordinator_address should
            # be defined."): single-process. RuntimeErrors still propagate.
            pass


def render_distributed(scene, width, height, spp, key, passes=1, config=None, engine="auto"):
    """Render across every chip of every host with the fastest supported
    engine (megakernel/wavefront per device, like the CLI); returns the
    image on host 0 (None elsewhere)."""
    from ..models.integrator import RenderConfig
    from .render import make_mesh, render_pass_sharded_engine, select_engine_sharded

    config = config or RenderConfig()
    mesh = make_mesh()  # all devices across all hosts
    engine = select_engine_sharded(scene, engine)
    total = None
    for p in range(passes):
        img = render_pass_sharded_engine(
            engine, scene, jax.random.fold_in(key, p), width, height, spp, config, mesh
        )
        total = img if total is None else total + img
    total = total / passes
    if jax.process_count() > 1:
        # a cross-host-sharded jit output is not addressable from one
        # process; replicate it first (one [H,W,4] all-gather over ICI/DCN)
        from jax.experimental import multihost_utils

        total = multihost_utils.process_allgather(total, tiled=True)
    if jax.process_index() != 0:
        return None
    return np.asarray(total)


def main(argv=None):
    import argparse

    from ..scene import parser as scene_parser
    from ..utils.image import save_png

    ap = argparse.ArgumentParser(description="multi-host distributed render")
    ap.add_argument("scene")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--out", default="out.png")
    args = ap.parse_args(argv)

    initialize()
    scene = scene_parser.load(args.scene, args.width / args.height)
    t0 = time.time()
    img = render_distributed(
        scene, args.width, args.height, args.spp, jax.random.PRNGKey(0), args.passes
    )
    if img is not None:
        dt = time.time() - t0
        n = args.width * args.height * int(args.spp**0.5) ** 2 * args.passes
        print(
            f"{jax.process_count()} hosts x {jax.local_device_count()} chips: "
            f"{n / dt / 1e6:.2f}M samples/s"
        )
        save_png(args.out, img)


if __name__ == "__main__":
    main()
