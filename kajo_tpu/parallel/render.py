"""SPMD rendering over a device mesh.

TPU-native replacement for the reference's thread fan-out scheduler
(spec /root/reference/renderer/cpu/Scheduler.cpp:32-42: horizontal scanline
slices x std::async): here the ray wavefront is sharded over the mesh's
``data`` axis with `jax.sharding` and the whole per-bounce pipeline runs under
one jit — XLA SPMD partitions every op, no explicit communication is needed in
the forward path (pixel work is disjoint, like the reference's row ownership),
and scene-parameter gradients in inverse mode are all-reduced by XLA over ICI
automatically because scene leaves are replicated.

Multi-host: call `jax.distributed.initialize()` first; the same mesh-of-all-
devices code then spans hosts, with the image gathered to host 0 via
`jax.experimental.multihost_utils` (the reference's never-implemented
coordinator/, done the TPU way).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.integrator import RenderConfig, render_samples
from ..ops.geometry import generate_rays, prepare_scene
from ..scene.types import Scene

DATA_AXIS = "data"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over all (or given) devices; pixels/rays shard over it.

    Axes are Auto-typed so `with_sharding_constraint` steers GSPMD partitioning
    (jax 0.9's make_mesh defaults to Explicit axes, which rejects it)."""
    devices = jax.devices() if devices is None else devices
    return jax.make_mesh(
        (len(devices),),
        (axis_name,),
        devices=devices,
        axis_types=(jax.sharding.AxisType.Auto,),
    )


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@partial(jax.jit, static_argnames=("width", "height", "spp", "config", "mesh"))
def render_pass_sharded(
    scene: Scene,
    key: jax.Array,
    width: int,
    height: int,
    spp: int,
    config: RenderConfig = RenderConfig(),
    mesh: Mesh | None = None,
) -> jax.Array:
    """One progressive pass with lanes sharded over ``mesh``'s data axis.

    Pads the lane count to a multiple of the mesh size (SPMD needs equal
    shards; the pad lanes render throwaway pixels, <0.1% overhead at real
    sizes). Returns [H, W, 4] linear radiance, replicated."""
    if mesh is None:
        return _render_pass_single(scene, key, width, height, spp, config)

    prep = prepare_scene(scene)
    grid = max(int(spp**0.5), 1)
    eff = grid * grid
    divisor = float(spp if config.kajo_spp_quirk else eff)

    n_dev = mesh.shape[DATA_AXIS]
    lanes = width * height
    padded = _round_up(lanes, n_dev)
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    x = jnp.arange(width, dtype=jnp.float32)
    y = jnp.arange(height, dtype=jnp.float32)
    xs, ys = jnp.meshgrid(x, y)
    xs = jnp.pad(xs.reshape(-1), (0, padded - lanes))
    ys = jnp.pad(ys.reshape(-1), (0, padded - lanes))

    def stratum(carry, idx):
        k = jax.random.fold_in(key, idx)
        gx = (idx % grid).astype(jnp.float32)
        gy = (idx // grid).astype(jnp.float32)
        u = jax.random.uniform(k, (2, padded), dtype=jnp.float32)
        sx = (xs + (gx + u[0]) / grid) / width
        sy = ((height - ys) + (gy + u[1]) / grid) / height
        sx = jax.lax.with_sharding_constraint(sx, sharding)
        sy = jax.lax.with_sharding_constraint(sy, sharding)
        o, d = generate_rays(prep.camera, sx, sy)
        rad = render_samples(prep, o, d, jax.random.fold_in(k, 7919), config)
        return carry + rad, None

    total, _ = jax.lax.scan(
        jax.checkpoint(stratum, prevent_cse=False),
        jax.lax.with_sharding_constraint(jnp.zeros((padded, 4), jnp.float32), sharding),
        jnp.arange(eff),
    )
    return (total[:lanes] / divisor).reshape(height, width, 4)


def _render_pass_single(scene, key, width, height, spp, config):
    from ..models.integrator import render_pass

    return render_pass(scene, key, width, height, spp, config)


@partial(
    jax.jit, static_argnames=("width", "height", "spp", "config", "mesh", "axis_name")
)
def render_pass_fast_sharded(
    scene: Scene,
    key: jax.Array,
    width: int,
    height: int,
    spp: int,
    config=None,
    mesh: Mesh | None = None,
    axis_name: str = DATA_AXIS,
) -> jax.Array:
    """One regenerating-wavefront pass with lane blocks sharded over ``mesh``.

    The PCG4D streams are addressed by global lane id, so each device's
    `lax.while_loop` runs exactly the paths its lanes would run unsharded —
    the sharded image is bit-identical to `wavefront.render_pass_fast`. Each
    device drains independently (no synchronization until the output gather),
    the SPMD translation of the reference's free-running scanline threads
    (cpu/Scheduler.cpp:32-42)."""
    from jax import shard_map

    from ..models.wavefront import render_lanes
    from ..ops.rng import seed_from_key

    if config is None:
        config = RenderConfig()
    prep = prepare_scene(scene)
    grid = max(int(spp**0.5), 1)
    eff = grid * grid
    divisor = float(spp if config.kajo_spp_quirk else eff)
    n = width * height
    n_dev = mesh.shape[axis_name]
    padded = _round_up(n, n_dev)
    lane = jnp.arange(padded, dtype=jnp.uint32)
    seed = jnp.asarray(seed_from_key(key), jnp.uint32).reshape(1)
    prep_specs = jax.tree.map(lambda _: P(), prep)

    def shard_fn(prep, lane_blk, seed):
        rgb, _ = render_lanes(
            prep, lane_blk, seed.reshape(()), width, height, eff, grid, config
        )
        return rgb

    rgb = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(prep_specs, P(axis_name), P()),
        out_specs=P(axis_name),
        check_vma=False,
    )(prep, lane, seed)
    rgb = rgb[:n] / divisor
    img = jnp.concatenate([rgb, jnp.ones((n, 1), jnp.float32)], axis=1)
    return img.reshape(height, width, 4)


def select_engine_sharded(scene: Scene, requested: str = "auto") -> str:
    """Engine choice for sharded rendering, mirroring the CLI's auto rule."""
    from ..models.engine import select_engine

    eng = select_engine(scene, requested)
    return eng


def render_pass_sharded_engine(
    engine: str,
    scene: Scene,
    key: jax.Array,
    width: int,
    height: int,
    spp: int,
    config=None,
    mesh: Mesh | None = None,
) -> jax.Array:
    """Sharded render with the CLI's engine lineup: ``mega`` (fused Pallas
    kernel per device), ``fast`` (regenerating wavefront per device), or
    ``parity`` (the fixed-shape scan, the differentiable path)."""
    if config is None:
        config = RenderConfig()
    if mesh is None:
        from ..models.engine import render_pass_engine

        return render_pass_engine(engine, scene, key, width, height, spp, config)
    if engine == "mega":
        from ..ops.pallas.megakernel import render_pass_megakernel_sharded

        return render_pass_megakernel_sharded(
            scene, key, width, height, spp, config, mesh, DATA_AXIS
        )
    if engine == "fast":
        return render_pass_fast_sharded(
            scene, key, width, height, spp, config, mesh, DATA_AXIS
        )
    return render_pass_sharded(scene, key, width, height, spp, config, mesh)


def render_image_sharded(
    scene: Scene,
    width: int,
    height: int,
    spp: int,
    key: jax.Array,
    passes: int = 1,
    config: RenderConfig = RenderConfig(),
    mesh: Mesh | None = None,
) -> jax.Array:
    total = jnp.zeros((height, width, 4), jnp.float32)
    for p in range(passes):
        total = total + render_pass_sharded(
            scene, jax.random.fold_in(key, p), width, height, spp, config, mesh
        )
    return total / passes
