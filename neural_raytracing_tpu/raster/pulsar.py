"""Pulsar-style sphere-based differentiable renderer.

Behavioral counterpart of pytorch3d/csrc/pulsar + renderer (ext.cpp:86-160):
spheres with positions / colors / radii / opacities are splatted through a
pinhole (or orthographic) camera and blended with a depth softmax whose
``gamma`` controls transparency hardness (gamma -> 0: nearest-sphere
winner-take-all; larger gamma: translucent mixing), with a background
weight so empty pixels fade to ``bg_col`` — the pulsar paper's blending
model.  This is a capability-parity redesign, not a port of the ~6.5k-LoC
CUDA implementation: the per-pixel sphere association reuses the chunked
top-K rasterizer (one jitted XLA program), and JAX AD supplies the
gradients the CUDA backward hand-computes (positions, colors, radii,
opacities, and camera parameters are all differentiable).

Camera: pulsar's 8-vector convention — (pos[3], axis-angle rot[3],
focal_length, sensor_width) in world units.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .rasterize import rasterize_spheres


def _axis_angle_rotation(rvec: jax.Array) -> jax.Array:
    """Rodrigues axis-angle -> rotation matrix (3x3).

    Uses the unnormalized form R = I + a(θ)[r]ₓ + b(θ)[r]ₓ² with
    a = sinθ/θ, b = (1-cosθ)/θ² and Taylor branches at small θ, so the
    gradient w.r.t. rvec is finite AND correct at rvec = 0 (the identity
    rotation — the natural camera init); dividing by ||rvec|| there would
    make jax.grad NaN (0/0 survives the where-mask).
    """
    sq = jnp.sum(rvec * rvec)
    theta = jnp.sqrt(jnp.where(sq > 1e-24, sq, 1.0))
    small = sq < 1e-12
    a = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - sq / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, sq))
    rx = jnp.array([[0.0, -rvec[2], rvec[1]],
                    [rvec[2], 0.0, -rvec[0]],
                    [-rvec[1], rvec[0], 0.0]])
    return jnp.eye(3) + a * rx + b * (rx @ rx)


class PulsarRenderer:
    """``PulsarRenderer(width, height, max_spheres)`` then
    ``renderer(pos, col, rad, cam_params, gamma, max_depth, ...)`` —
    mirroring pulsar's ``Renderer.forward`` surface."""

    def __init__(self, width: int, height: int,
                 max_num_spheres: int = 0,
                 orthogonal_projection: bool = False,
                 n_channels: int = 3,
                 spheres_per_pixel: int = 8,
                 chunk: int = 256):
        self.width = width
        self.height = height
        self.orthogonal = orthogonal_projection
        self.n_channels = n_channels
        self.spheres_per_pixel = spheres_per_pixel
        self.chunk = chunk

    def __call__(self, pos: jax.Array, col: jax.Array, rad: jax.Array,
                 cam_params: jax.Array, gamma: float = 0.1,
                 max_depth: float = 100.0, min_depth: float = 0.0,
                 bg_col: Optional[jax.Array] = None,
                 opacity: Optional[jax.Array] = None) -> jax.Array:
        """pos ``[S, 3]`` world, col ``[S, C]``, rad ``[S]`` world radii,
        cam_params ``[8]`` -> image ``[H, W, C]``."""
        cam_pos = cam_params[:3]
        r = _axis_angle_rotation(cam_params[3:6])
        focal = cam_params[6]
        sensor_w = cam_params[7]

        view = (pos - cam_pos) @ r                         # [S, 3]
        z = view[..., 2]
        half_sensor = 0.5 * sensor_w
        if self.orthogonal:
            x_ndc = view[..., 0] / half_sensor
            y_ndc = view[..., 1] / half_sensor
            r_ndc = rad / half_sensor
        else:
            safe_z = jnp.maximum(z, 1e-8)
            # pinhole: screen offset = focal * x / z, in sensor halves
            x_ndc = focal * view[..., 0] / (half_sensor * safe_z)
            y_ndc = focal * view[..., 1] / (half_sensor * safe_z)
            r_ndc = focal * rad / (half_sensor * safe_z)

        spheres = jnp.stack([x_ndc, y_ndc, z, r_ndc], axis=-1)
        frags = rasterize_spheres(
            spheres, (self.height, self.width),
            points_per_pixel=self.spheres_per_pixel, chunk=self.chunk)

        # pulsar culls spheres outside [min_depth, max_depth] (the CUDA
        # renderer excludes them before blending); without this, beyond-
        # max_depth spheres would still contribute at background-level
        # weight through the clamped closeness below
        in_range = (frags.zbuf >= min_depth) & (frags.zbuf <= max_depth)
        valid = (frags.idx >= 0) & in_range
        safe_idx = jnp.maximum(frags.idx, 0)
        c = jnp.where(valid[..., None], col[safe_idx], 0.0)
        op = (jnp.ones_like(rad) if opacity is None
              else jnp.asarray(opacity))
        a = jnp.where(valid, op[safe_idx], 0.0)

        # depth-softmax blending: closeness in [0, 1]; background sits at
        # closeness 0 with weight exp(0) = 1
        closeness = jnp.clip((max_depth - frags.zbuf)
                             / jnp.maximum(max_depth - min_depth, 1e-8),
                             0.0, 1.0)
        closeness = jnp.where(valid, closeness, 0.0)
        # max-subtracted softmax (the background's exponent is 0): small
        # gamma would overflow exp(1/gamma) otherwise
        logit = closeness / gamma
        m = jnp.maximum(jnp.max(logit, axis=-1, keepdims=True), 0.0)
        w = jnp.where(valid, a * jnp.exp(logit - m), 0.0)
        w_bg = jnp.exp(-m[..., 0])
        bg = (jnp.zeros((self.n_channels,), col.dtype) if bg_col is None
              else jnp.asarray(bg_col, col.dtype))
        denom = jnp.sum(w, axis=-1) + w_bg
        img = (jnp.sum(w[..., None] * c, axis=-2)
               + w_bg[..., None] * bg) / denom[..., None]
        return img
