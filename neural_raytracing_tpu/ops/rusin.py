"""Rusinkiewicz half/difference-angle BRDF parameterization.

Behavioral parity: ``param_rusin``/``param_rusin2`` in
pytorch3d/pathtracer/utils.py:193-258.  ``param_rusin2`` assumes wi/wo are
already in the local shading frame and returns
``[cos(phi_d), cos(theta_h), cos(theta_d)]`` — the 3-vector fed to
``NeuralBSDF`` MLPs.  All epsilon clamps match the reference since they shape
the gradients near grazing configurations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .math import nonzero_eps, normalize, rotate_vector

# numpy, not jnp: a module-level jnp constant would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize in
# multi-process (DCN) programs — it must run before ANY backend use
import numpy as _np

_E1 = _np.asarray([0.0, 1.0, 0.0], _np.float32)
_E2 = _np.asarray([0.0, 0.0, 1.0], _np.float32)


def param_rusin2(wo: jax.Array, wi: jax.Array) -> jax.Array:
    """Local-frame Rusinkiewicz parameterization ``[..., 3]``."""
    wo = normalize(wo)
    wi = normalize(wi)
    e1 = jnp.broadcast_to(_E1.astype(wo.dtype), wo.shape)
    e2 = jnp.broadcast_to(_E2.astype(wo.dtype), wo.shape)

    h = normalize(wo + wi)

    cos_theta_h = h[..., 2]

    # rotate wi about z by -phi_h (cos/sin computed without trig round-trips)
    r = jnp.maximum(jnp.hypot(nonzero_eps(h[..., 1]), nonzero_eps(h[..., 0])), 1e-6)
    c = (h[..., 0] / r)[..., None]
    s = -(h[..., 1] / r)[..., None]
    tmp = normalize(rotate_vector(wi, e2, c, s))

    # rotate about y by -theta_h
    c = h[..., 2][..., None]
    s = -jnp.sqrt(jnp.maximum(1.0 - h[..., 2], 1e-6))[..., None]
    diff = normalize(rotate_vector(tmp, e1, c, s))

    cos_theta_d = diff[..., 2]
    cos_phi_d = jnp.cos(
        jnp.arctan2(nonzero_eps(diff[..., 1]), nonzero_eps(diff[..., 0])))

    return jnp.stack([cos_phi_d, cos_theta_h, cos_theta_d], axis=-1)


def param_rusin(n: jax.Array, wo: jax.Array, wi: jax.Array) -> jax.Array:
    """World-frame variant: first rotates the frame so ``n`` aligns with +z."""
    n = normalize(n)
    wo = normalize(wo)
    wi = normalize(wi)
    e2 = jnp.broadcast_to(_E2.astype(n.dtype), n.shape)
    midway = normalize((n + e2) / 2.0)

    # 180-degree rotation about the bisector maps n -> z
    wo = rotate_vector(wo, midway, -jnp.ones_like(wo), jnp.zeros_like(wo))
    wi = rotate_vector(wi, midway, -jnp.ones_like(wi), jnp.zeros_like(wi))

    h = normalize((wo + wi) / 2.0)
    cos_theta_h = jnp.clip(h[..., 2:3], -1.0, 1.0)
    phi_h = jnp.arctan2(nonzero_eps(h[..., 1]), nonzero_eps(h[..., 0]))

    v = -phi_h[..., None]
    tmp = normalize(rotate_vector(wi, n, jnp.cos(v), jnp.sin(v)))

    sin_theta_h = -jnp.sqrt(jnp.maximum(1.0 - jnp.square(cos_theta_h), 1e-6))
    e1 = jnp.broadcast_to(_E1.astype(n.dtype), tmp.shape)
    diff = normalize(rotate_vector(tmp, e1, cos_theta_h, sin_theta_h))

    cos_theta_d = diff[..., 2]
    phi_d = jnp.arctan2(nonzero_eps(diff[..., 1]), nonzero_eps(diff[..., 0]))

    return jnp.stack([phi_d, cos_theta_h[..., 0], cos_theta_d], axis=-1)
