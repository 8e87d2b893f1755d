"""Engine selection: pick the fastest renderer that supports the scene.

  * ``mega``   — fused Pallas megakernel (ops/pallas/megakernel.py): any
    scene (rigid or general transforms) with a VMEM-sized object set; ~20x
    the jax wavefront on TPU.
  * ``fast``   — regenerating jax wavefront (models/wavefront.py): any scene,
    any backend (including the chunked 100k-sphere path).
  * ``parity`` — fixed-shape scan (models/integrator.py): the estimator
    spec; differentiable; used by the gradient/inverse-rendering path.
"""

from __future__ import annotations

import jax

from ..ops.pallas import megakernel
from ..scene.types import Scene
from .integrator import RenderConfig, render_pass
from .wavefront import render_pass_fast


def select_engine(scene: Scene, requested: str = "auto") -> str:
    if requested != "auto":
        return requested
    if jax.default_backend() == "tpu" and megakernel.supports(scene):
        return "mega"
    return "fast"


def render_pass_engine(
    engine: str,
    scene: Scene,
    key: jax.Array,
    width: int,
    height: int,
    spp: int,
    config: RenderConfig = RenderConfig(),
):
    if engine == "mega":
        return megakernel.render_pass_megakernel(scene, key, width, height, spp, config)
    if engine == "fast":
        return render_pass_fast(scene, key, width, height, spp, config)
    return render_pass(scene, key, width, height, spp, config)
