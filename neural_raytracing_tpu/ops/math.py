"""Numerics helpers shared across the framework.

Behavioral parity targets (reference citations are into /root/reference):
  * nonzero_eps            — pytorch3d/pathtracer/utils.py:43-51
  * smooth_min             — pytorch3d/pathtracer/utils.py:385-387
  * weak_sigmoid           — pytorch3d/pathtracer/utils.py:272-277
  * pos_weak_sigmoid       — pytorch3d/pathtracer/utils.py:280-281
  * rotate_vector          — pytorch3d/pathtracer/utils.py:152-155 (Rodrigues)
  * eikonal_loss           — pytorch3d/pathtracer/utils.py:294-295
  * mse2psnr               — pytorch3d/pathtracer/utils.py:361
  * fwidth                 — pytorch3d/pathtracer/utils.py:448-459

The reference leans on load-bearing epsilons for stability while
backpropagating through normalizations and atan2; those constants are kept
verbatim here (they are part of the behavior, not of the implementation).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

PI = math.pi
TWO_PI = 2.0 * math.pi
INV_PI = 1.0 / math.pi


def normalize(v: jax.Array, eps: float = 1e-7, axis: int = -1) -> jax.Array:
    """L2-normalize along ``axis`` with a clamped denominator.

    Matches ``torch.nn.functional.normalize`` (``v / max(||v||, eps)``) but
    clamps INSIDE the sqrt so the gradient at ``v = 0`` is 0 instead of NaN
    (``jnp.linalg.norm`` has a NaN subgradient at zero, and masked-out miss
    rays routinely carry zero normals through ``where``).
    """
    n = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=axis, keepdims=True),
                             eps * eps))
    return v / n


def nonzero_eps(v: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Replace near-zero entries with ``eps`` so atan2/divisions stay finite."""
    return jnp.where(jnp.abs(v) < eps, jnp.asarray(eps, v.dtype), v)


def dot(a: jax.Array, b: jax.Array, keepdims: bool = True) -> jax.Array:
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def smooth_min(v: jax.Array, k: float = 32.0, axis: int = 0) -> jax.Array:
    """Exponential smooth minimum: ``-log(max(sum(exp(-k v)), 1e-4)) / k``.

    Reference parity (sdfs.py:41-44): the 1e-4 clamp SATURATES the field at
    ``-log(1e-4)/k`` (0.288 for k=32) — beyond that distance from the
    sphere set the field is constant, which is the root of the degenerate
    trained fields recorded in CLAUDE.md.  ``stable_smooth_min`` below is
    the exact smooth-min without the plateau."""
    return -jnp.log(jnp.maximum(jnp.sum(jnp.exp(-k * v), axis=axis), 1e-4)) / k


def stable_smooth_min(v: jax.Array, k: float = 32.0,
                      axis: int = 0) -> jax.Array:
    """Exact exponential smooth minimum via logsumexp: ``-lse(-k v)/k``.

    Numerically stable at ANY distance (max-subtracted), so the field
    keeps true distance information arbitrarily far from the sphere set
    instead of clamping at -log(1e-4)/k; within ~0.2 of the surface it
    agrees with ``smooth_min`` to f32 precision.  Opt-in through
    ``SphereSDF(stable_min=True)`` — a deliberate divergence from the
    reference quirk for runs that need a marchable far field (sphere-trace
    early exit, overrelaxation, shadow blocker detection)."""
    return -jax.nn.logsumexp(-k * v, axis=axis) / k


def weak_sigmoid(x: jax.Array, k: float = 4e-4, sqrt_k: float = 2e-2,
                 eps: float = 1e-6) -> jax.Array:
    """Signed sqrt with a linear region near zero (stable inverse-ish sigmoid)."""
    return jnp.where(
        jnp.abs(x) < k,
        x / sqrt_k,
        jnp.sign(x) * jnp.sqrt(jnp.abs(x) + eps),
    )


def pos_weak_sigmoid(x: jax.Array, k: float = 4e-4, k_pow_3_2: float = 2e-2,
                     eps: float = 1e-5) -> jax.Array:
    """Positive symmetric variant of :func:`weak_sigmoid`."""
    return jnp.where(jnp.abs(x) <= k, jnp.square(x) / k_pow_3_2,
                     jnp.sqrt(jnp.abs(x) + eps))


def rotate_vector(v: jax.Array, axis: jax.Array, c: jax.Array,
                  s: jax.Array) -> jax.Array:
    """Rodrigues rotation of ``v`` about unit ``axis`` by angle with cos ``c``/sin ``s``."""
    return (v * c
            + axis * jnp.sum(v * axis, axis=-1, keepdims=True) * (1.0 - c)
            + jnp.cross(axis, v) * s)


def reflect(n: jax.Array, v: jax.Array) -> jax.Array:
    """Mirror ``v`` about normal ``n`` (both pointing away from surface)."""
    return 2.0 * jnp.sum(n * v, axis=-1, keepdims=True) * n - v


def local_reflect(v: jax.Array) -> jax.Array:
    """Mirror about the local +z axis: (x,y,z) -> (-x,-y,z)."""
    return v * jnp.asarray([-1.0, -1.0, 1.0], dtype=v.dtype)


def eikonal_loss(grad: jax.Array) -> jax.Array:
    """Mean squared deviation of ``||grad||`` from 1 (IDR surface regularizer).

    The norm clamps inside the sqrt: raw SDF gradients are exactly zero
    where the truncated smooth_min saturates, and ``linalg.norm`` would
    propagate NaN gradients from those points.
    """
    n = jnp.sqrt(jnp.maximum(jnp.sum(grad * grad, axis=-1), 1e-12))
    return jnp.mean(jnp.square(n - 1.0))


def mse2psnr(x: jax.Array) -> jax.Array:
    return -10.0 * jnp.log10(x)


def fwidth(v: jax.Array) -> jax.Array:
    """|ddx| + |ddy| over image dims 1,2 of an ``[N,W,H,...,C]`` tensor."""
    dx = v[:, 1:] - v[:, :-1]
    dx = jnp.concatenate([dx, dx[:, -1:]], axis=1)
    dy = v[:, :, 1:] - v[:, :, :-1]
    dy = jnp.concatenate([dy, dy[:, :, -1:]], axis=2)
    return jnp.abs(dx) + jnp.abs(dy)


def qmul(q: jax.Array, r: jax.Array) -> jax.Array:
    """Hamilton product of quaternions stored ``[w, x, y, z]``."""
    terms = r[..., :, None] * q[..., None, :]
    w = terms[..., 0, 0] - terms[..., 1, 1] - terms[..., 2, 2] - terms[..., 3, 3]
    x = terms[..., 0, 1] + terms[..., 1, 0] - terms[..., 2, 3] + terms[..., 3, 2]
    y = terms[..., 0, 2] + terms[..., 1, 3] + terms[..., 2, 0] - terms[..., 3, 1]
    z = terms[..., 0, 3] - terms[..., 1, 2] + terms[..., 2, 1] + terms[..., 3, 0]
    return jnp.stack([w, x, y, z], axis=-1)


def quat_rot(v: jax.Array, axis: jax.Array, theta: jax.Array) -> jax.Array:
    """Rotate ``v`` about ``axis`` by ``theta`` via quaternion conjugation."""
    zeros = jnp.zeros(v.shape[:-1] + (1,), dtype=v.dtype)
    q1 = jnp.concatenate([zeros, v], axis=-1)
    t2 = jnp.broadcast_to(theta / 2.0, v.shape[:-1] + (1,))
    q2 = jnp.concatenate([jnp.cos(t2), jnp.sin(t2) * axis], axis=-1)
    q2_inv = q2 * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=v.dtype)
    return qmul(qmul(q2, q1), q2_inv)[..., 1:]


def almost_identity(x: jax.Array, thresh: float = 1e-1) -> jax.Array:
    x_abs = jnp.abs(x)
    t = x_abs / thresh
    v = (x_abs - thresh) * t * t + thresh
    return jnp.where(x_abs > thresh, x, jnp.sign(x) * v)
