"""Orthonormal shading frames and local/world direction transforms.

Behavioral parity: pytorch3d/pathtracer/interaction.py:8-51 — a numerically
stabilized version of Mitsuba's branchless ``coordinate_system`` (Duff et al.
"Building an Orthonormal Basis, Revisited") that stays differentiable at the
poles, plus ``to_local``/``from_local`` frame transforms.

Frames are stored as ``[..., 3, 3]`` with COLUMNS (s, t, n); ``frame[..., 2]``
is the normal, matching the reference's ``torch.stack([s, t, n], dim=-1)``.

Note: the reference's ``to_local`` computes ``mean(frame * wo[..., None])``
over the row axis and renormalizes — i.e. a transpose-matvec scaled by 1/3
then normalized.  We implement the same projection as an exact matvec by the
frame transpose followed by the same renormalization (identical direction;
the 1/3 factor is removed by the normalize).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .math import normalize


def coordinate_system(n: jax.Array) -> jax.Array:
    """Build a ``[..., 3, 3]`` orthonormal frame (columns s,t,n) from normals."""
    n = normalize(n, eps=1e-7)
    x, y, z = n[..., 0:1], n[..., 1:2], n[..., 2:3]
    sign = jnp.where(z >= 0, 1.0, -1.0)
    s_z = sign + z
    a = -1.0 / jnp.where(jnp.abs(s_z) < 1e-6, jnp.asarray(1e-6, n.dtype), s_z)
    b = x * y * a

    s = jnp.concatenate([x * x * a * sign + 1.0, b * sign, x * -sign], axis=-1)
    s = normalize(s, eps=1e-7)
    t = normalize(jnp.cross(s, n), eps=1e-7)
    s = normalize(jnp.cross(n, t), eps=1e-7)
    return jnp.stack([s, t, n], axis=-1)


def partial_frame(n: jax.Array, wi: jax.Array) -> jax.Array:
    """Frame from a normal and an incident direction (columns n, wi, n×wi)."""
    c = normalize(jnp.cross(n, wi), eps=1e-7)
    return jnp.stack([n, wi, c], axis=-1)


def to_local(frame: jax.Array, wo: jax.Array) -> jax.Array:
    """World direction -> local frame coordinates (then renormalized)."""
    out = jnp.einsum("...ij,...i->...j", frame, wo)
    return normalize(out, eps=1e-7)


def from_local(frame: jax.Array, v: jax.Array) -> jax.Array:
    """Local frame coordinates -> world direction (then renormalized)."""
    out = jnp.einsum("...ij,...j->...i", frame, v)
    return normalize(out, eps=1e-7)
