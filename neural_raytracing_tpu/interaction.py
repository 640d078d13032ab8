"""Interaction records passed between shapes, integrators, BSDFs and lights.

Behavioral parity: pytorch3d/pathtracer/interaction.py:54-119.  The
reference's mutable dataclasses with ``setattr`` side-channels
(``raw_normals``, ``normalized_weights``) become explicit optional fields on
immutable pytree structs, so everything threads cleanly through jit/grad.

All tensors share an arbitrary leading batch shape ``[...]`` (typically
``[N, W, H, bundle]`` for structured crops or ``[R]`` for flat ray batches).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .ops.frames import coordinate_system, from_local, to_local


class Interaction(NamedTuple):
    """Surface/medium interaction.

    p:          [..., 3]  hit position (offset along the normal)
    t:          [...]     ray parameter of the hit
    n:          [..., 3]  shading normal (zeros where no hit)
    frame:      [..., 3, 3] shading frame, columns (s, t, n)
    wi:         [..., 3]  incident direction in the LOCAL frame
    throughput: [...]     soft-silhouette logits (MixedInteraction extra);
                          None outside primary training intersections
    raw_normals: [..., 3] un-normalized SDF gradients (for eikonal loss)
    nonnormalized_weights / normalized_weights: [..., K] spatially-varying
                          BSDF mixture activations (for regularizers)
    """

    p: jax.Array
    t: jax.Array
    n: Optional[jax.Array] = None
    frame: Optional[jax.Array] = None
    wi: Optional[jax.Array] = None
    throughput: Optional[jax.Array] = None
    raw_normals: Optional[jax.Array] = None
    nonnormalized_weights: Optional[jax.Array] = None
    normalized_weights: Optional[jax.Array] = None

    @property
    def batch_shape(self):
        return self.p.shape[:-1]

    def with_normals(self, normals: jax.Array) -> "Interaction":
        return self._replace(n=normals, frame=coordinate_system(normals))

    def to_local(self, wo: jax.Array) -> jax.Array:
        return to_local(self.frame, wo)

    def from_local(self, v: jax.Array) -> jax.Array:
        return from_local(self.frame, v)

    def spawn_rays(self, d: jax.Array) -> jax.Array:
        return jnp.concatenate([jnp.broadcast_to(self.p, d.shape), d], axis=-1)


class DirectionSample(NamedTuple):
    """A sampled direction towards an emitter.

    d:     [..., 3]  unit direction from the surface towards the light
    pdf:   [...]     sample pdf (1 for delta lights)
    dist:  [...] or None   distance to the light (None for light fields)
    p:     [..., 3] or None  point on the light
    n:     normal on the light (unused for delta lights)
    delta: static bool — whether the light is a dirac delta
    """

    d: jax.Array
    pdf: jax.Array
    dist: Optional[jax.Array] = None
    p: Optional[jax.Array] = None
    n: Optional[jax.Array] = None
    delta: bool = True


class BSDFSample(NamedTuple):
    """A sampled outgoing direction from a BSDF (local frame)."""

    wo: jax.Array
    pdf: jax.Array
    eta: float = 1.0
