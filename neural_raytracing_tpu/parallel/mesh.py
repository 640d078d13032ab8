"""Device-mesh data parallelism for ray batches.

The reference is strictly single-process/single-GPU (scripts/readme.md:7-9;
no torch.distributed anywhere) — this module is new TPU-first design, not a
port (SURVEY.md §2.5): ray/pixel batches are embarrassingly parallel, so the
one strategy that matters is data parallelism over a 1-D ``Mesh``:

  * the view/ray axis of each step's inputs is sharded over ``("data",)``
  * params (and optimizer state) are replicated
  * the gradient all-reduce is inserted by the XLA partitioner (psum over
    ICI) because the loss is a mean over sharded inputs of replicated params

Use ``make_parallel_train_step`` to get a pjit'd train step with these
shardings; it degrades gracefully to a single device.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed for multi-host (DCN) operation.

    On a multi-host pod slice, call this before any jax API; afterwards
    ``jax.devices()`` spans all hosts and the same ``make_mesh()`` +
    ``make_parallel_train_step`` code scales across the DCN — XLA places
    the gradient all-reduce on ICI within a slice and DCN across slices.
    On single-host environments (including this one) it is a no-op.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def _batch_spec(mesh: Mesh, tree, batch_size: int):
    """Shard leaves whose leading dim equals the (divisible) batch size."""
    n = mesh.devices.size

    def spec(leaf):
        if (hasattr(leaf, "ndim") and leaf.ndim >= 1
                and leaf.shape[0] == batch_size and batch_size % n == 0):
            return NamedSharding(mesh, P("data"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, tree)


def shard_batch(tree, mesh: Mesh, batch_size: int):
    """Device-put a step's data batch with the view axis sharded."""
    return jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, s),
        tree, _batch_spec(mesh, tree, batch_size))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def sharded_render_rays(scene, params, rays, integrator, mesh: Mesh,
                        key=None, training: bool = False):
    """Render a flat ray batch with the ray axis sharded over the mesh.

    Pads the ray count to a mesh multiple, shards axis 0, replicates
    params; one jit call renders across all devices (serving path).
    """
    import jax.numpy as jnp

    n = mesh.devices.size
    r = rays.shape[0]
    pad = (-r) % n
    if pad:
        rays = jnp.concatenate([rays, jnp.broadcast_to(rays[-1:],
                                                       (pad,) + rays.shape[1:])])
    rays = jax.device_put(rays, data_sharding(mesh))
    params = replicate(params, mesh)
    values, active = _sharded_run(scene, integrator, params, rays, key,
                                  training)
    return values[:r], active[:r]


# module-level jit: repeated sharded_render_rays calls (the serving loop)
# reuse one executable instead of re-jitting a fresh closure per call
@functools.partial(jax.jit,
                   static_argnames=("scene", "integrator", "training"))
def _sharded_run(scene, integrator, params, rays, key, training: bool):
    values, active, _ = integrator.sample(scene, params, rays, key=key,
                                          training=training)
    return values, active


def make_parallel_train_step(scene, integrator, optimizer, mesh: Mesh, *,
                             n_views: int, **step_kwargs):
    """A jitted train step with data-parallel shardings over ``mesh``.

    The per-leaf input shardings: train state replicated; camera/exp/mask
    sharded on the leading view axis (when divisible by the mesh size);
    uv/key replicated.  Output state is replicated (XLA all-reduces grads).
    """
    from ..training.loop import build_step_fn

    step = build_step_fn(scene, integrator, optimizer, **step_kwargs)
    rep = replicated(mesh)

    def sharded_step(state, camera, uv, exp, mask, key):
        return step(state, camera, uv, exp, mask, key)

    def in_shardings(state, camera, uv, exp, mask, key):
        return (
            jax.tree_util.tree_map(lambda _: rep, state),
            _batch_spec(mesh, camera, n_views),
            jax.tree_util.tree_map(lambda _: rep, uv),
            _batch_spec(mesh, exp, n_views),
            _batch_spec(mesh, mask, n_views),
            rep,
        )

    _cache = {}

    def wrapped(state, camera, uv, exp, mask, key):
        if "jitted" not in _cache:
            shardings = in_shardings(state, camera, uv, exp, mask, key)
            _cache["jitted"] = jax.jit(sharded_step, in_shardings=shardings)
        return _cache["jitted"](state, camera, uv, exp, mask, key)

    return wrapped
