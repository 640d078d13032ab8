"""Analytic shapes: Sphere and SphereCloud.

Behavioral parity: pytorch3d/pathtracer/shapes/shapes.py:11-206.  Used for
BSDF visualization renders (``sphere_render_bsdf``) and as light geometry.

The reference's per-chunk python loops over spheres (``split_n=256``) are
replaced by one batched quadratic solve over a sphere axis — XLA tiles the
reduction; no host loop required.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..interaction import Interaction
from ..ops.math import normalize

EPS = 1e-8


def quad_solve(a, b, c):
    """Both roots of ``a x^2 + b x + c`` and a validity mask (disc > 0)."""
    disc = b * b - 4.0 * a * c
    valid = disc > 0
    sq = jnp.sqrt(jnp.where(valid, disc, 0.0))
    roots = (-b[..., None] + jnp.stack([sq, -sq], axis=-1)) / (2.0 * a[..., None])
    return roots, valid


def _min_positive_root(roots, valid):
    """Smallest root >= EPS; inf where none."""
    pos = jnp.where(roots >= EPS, roots, jnp.inf)
    t = jnp.min(pos, axis=-1)
    mask = valid & jnp.any(roots >= EPS, axis=-1)
    return t, mask


class Sphere:
    """A single analytic sphere (non-learnable)."""

    def __init__(self, center=(0.0, 0.0, 0.0), radius: float = 1.0):
        self.center = jnp.asarray(center, dtype=jnp.float32)
        self.radius = float(radius)

    def init(self, key=None):
        return {}

    def _quad(self, rays):
        r_o, r_d = rays[..., :3], rays[..., 3:]
        fs = r_o - self.center
        a = jnp.sum(r_d * r_d, axis=-1)
        b = 2.0 * jnp.sum(r_d * fs, axis=-1)
        c = jnp.sum(fs * fs, axis=-1) - self.radius * self.radius
        return quad_solve(a, b, c)

    def intersect(self, params, rays, key=None, primary: bool = True,
                  active=None):
        r_o, r_d = rays[..., :3], rays[..., 3:]
        roots, valid = self._quad(rays)
        t, mask = _min_positive_root(roots, valid)
        t_safe = jnp.where(mask, t, 0.0)
        p = r_o + t_safe[..., None] * r_d
        n = normalize(p - self.center)
        n = jnp.where(mask[..., None], n, 0.0)
        p = p + n * 1e-5
        it = Interaction(p=p, t=t_safe).with_normals(n)
        it = it._replace(wi=it.to_local(-r_d))
        return it, mask

    def intersect_test(self, params, rays, max_t=jnp.inf, active=None):
        """True where the ray is NOT blocked before ``max_t``."""
        roots, valid = self._quad(rays)
        t, mask = _min_positive_root(roots, valid)
        blocked = mask & (t < max_t)
        return ~blocked

    def intersect_limits(self, params, rays):
        roots, valid = self._quad(rays)
        pos = jnp.where(roots >= EPS, roots, jnp.inf)
        lower = jnp.min(pos, axis=-1)
        upper = jnp.max(jnp.where(jnp.isfinite(pos), pos, -jnp.inf), axis=-1)
        mask = valid & jnp.any(roots >= EPS, axis=-1)
        return lower, upper, mask


class SphereCloud:
    """Many spheres; min-t closed-form intersection over a sphere axis."""

    def __init__(self, centers, radii):
        self.centers = jnp.asarray(centers, dtype=jnp.float32)  # [S, 3]
        radii = jnp.asarray(radii, dtype=jnp.float32)
        if radii.ndim == 0:
            radii = jnp.full((self.centers.shape[0],), radii)
        self.radii = radii  # [S]

    def init(self, key=None):
        return {}

    def _all_ts(self, rays, t_max):
        r_o, r_d = rays[..., :3], rays[..., 3:]
        fs = r_o[..., None, :] - self.centers            # [..., S, 3]
        a = jnp.sum(r_d * r_d, axis=-1)[..., None]
        b = 2.0 * jnp.sum(r_d[..., None, :] * fs, axis=-1)
        c = jnp.sum(fs * fs, axis=-1) - self.radii * self.radii
        roots, valid = quad_solve(a, b, c)               # [..., S, 2]
        pos = jnp.where((roots >= EPS) & (roots < t_max), roots, jnp.inf)
        t = jnp.min(pos, axis=-1)                        # [..., S]
        mask = valid & jnp.isfinite(t)
        return jnp.where(mask, t, jnp.inf), mask

    def intersect(self, params, rays, key=None, primary: bool = True,
                  active=None, t_max=jnp.inf):
        r_o, r_d = rays[..., :3], rays[..., 3:]
        ts, mask = self._all_ts(rays, t_max)
        idx = jnp.argmin(ts, axis=-1)
        t = jnp.min(ts, axis=-1)
        out_active = jnp.any(mask, axis=-1) & jnp.isfinite(t)
        t_safe = jnp.where(out_active, t, 0.0)
        p = r_o + t_safe[..., None] * r_d
        n = jnp.where(out_active[..., None],
                      normalize(p - self.centers[idx]), 0.0)
        p = p + n * 1e-5
        it = Interaction(p=p, t=t_safe).with_normals(n)
        it = it._replace(wi=it.to_local(-r_d))
        return it, out_active

    def intersect_test(self, params, rays, max_t=jnp.inf, active=None):
        ts, mask = self._all_ts(rays, max_t)
        blocked = jnp.any(mask & (ts < max_t), axis=-1)
        return ~blocked
