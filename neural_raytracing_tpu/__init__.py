"""neural_raytracing_tpu — a TPU-native (JAX/XLA/Pallas) neural ray-tracing framework.

A from-scratch rebuild of the capabilities of `prashantraina/neural_raytracing`
(the "Neural Ray-Tracing: Learning Surfaces and Reflectance for Relighting and
View Synthesis" system, arXiv:2104.13562): an invertible (differentiable)
raytracer whose surface (SDF), reflectance (BSDF) and lighting components are
learnable neural networks trained from posed images.

Design (TPU-first, not a port):
  * every component is a pure function over a params pytree (jit/pjit-friendly)
  * rays are flat ``[R, 6]`` batches; image tiling is host-side index math
  * sphere tracing is a ``lax.fori_loop`` under ``stop_gradient`` with
    differentiable normals recovered by ``jax.grad`` at the hit points
  * data parallelism shards the ray axis over a ``jax.sharding.Mesh``

Reference layer map: /root/reference/pytorch3d/pathtracer (see SURVEY.md).
"""

__version__ = "0.1.0"

from . import ops, nn, shapes, bsdf, lights, cameras, integrators
from . import edits, samplers, warps, utils, profiling
from .render import pathtrace, pathtrace_sample, render_rays
from .scene import Scene

__all__ = [
    "ops", "nn", "shapes", "bsdf", "lights", "cameras", "integrators",
    "edits", "samplers", "warps", "utils", "profiling",
    "pathtrace", "pathtrace_sample", "render_rays", "Scene",
]
