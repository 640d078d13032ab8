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


def padded_size(batch_size: int, n: int) -> int:
    return batch_size + (-batch_size) % n


def pad_batch(tree, batch_size: int, n: int):
    """Pad leaves with leading dim ``batch_size`` to a multiple of ``n``.

    Padding repeats the last slice (valid geometry/data, so the forward pass
    stays finite); the train step slices the loss back to the real views, so
    padded entries contribute nothing to gradients.  Leaves already padded
    (or without the batch leading dim) pass through unchanged.
    """
    import jax.numpy as jnp

    pad = (-batch_size) % n
    if pad == 0:
        return tree

    def padleaf(leaf):
        if (hasattr(leaf, "ndim") and leaf.ndim >= 1
                and leaf.shape[0] == batch_size):
            tail = jnp.broadcast_to(leaf[-1:], (pad,) + leaf.shape[1:])
            return jnp.concatenate([jnp.asarray(leaf), tail], axis=0)
        return leaf

    return jax.tree_util.tree_map(padleaf, tree)


def _batch_spec(mesh: Mesh, tree, batch_size: int):
    """Shard leaves whose leading dim equals the padded batch size."""
    n = mesh.devices.size
    padded = padded_size(batch_size, n)

    def spec(leaf):
        if (hasattr(leaf, "ndim") and leaf.ndim >= 1
                and leaf.shape[0] == padded):
            return NamedSharding(mesh, P("data"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, tree)


def shard_batch(tree, mesh: Mesh, batch_size: int):
    """Device-put a step's data batch with the view axis sharded.

    Non-divisible batches are padded to a mesh multiple first (see
    :func:`pad_batch`) so the view axis ALWAYS shards — previously a
    non-divisible batch was silently replicated and every device did the
    full redundant step.
    """
    n = mesh.devices.size
    tree = pad_batch(tree, batch_size, n)
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
    n = mesh.devices.size
    r = rays.shape[0]
    rays = pad_batch(rays, r, n)
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
    sharded on the leading view axis; uv/key replicated.  Output state is
    replicated (XLA all-reduces grads).

    Non-divisible view counts are padded to a mesh multiple (repeating the
    last view) and the loss is computed on the first ``n_views`` only, so
    the padded-sharded step's gradients exactly match the unsharded step.
    """
    from ..training.loop import build_step_fn

    n = mesh.devices.size
    pad = (-n_views) % n
    step = build_step_fn(scene, integrator, optimizer,
                         n_real_views=n_views if pad else None, **step_kwargs)
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
        # idempotent: pads + shards only leaves still at the raw view count
        camera = shard_batch(camera, mesh, n_views)
        exp = shard_batch(exp, mesh, n_views)
        mask = shard_batch(mask, mesh, n_views)
        if "jitted" not in _cache:
            shardings = in_shardings(state, camera, uv, exp, mask, key)
            _cache["jitted"] = jax.jit(sharded_step, in_shardings=shardings)
        return _cache["jitted"](state, camera, uv, exp, mask, key)

    return wrapped
