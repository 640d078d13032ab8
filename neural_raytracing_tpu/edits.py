"""Scene-editing warps composed over trained SDFs.

Behavioral parity: the edit functions in scripts/test_nerf.py:59-103 and
scripts/edit_dtu.py:85-100 of the reference — a trained SDF (loaded from a
checkpoint) is recomposed with arbitrary point-space warps or value
post-processing, then re-rendered through the standard pipeline.

Because checkpoints store params and callables come from the scene config
(training/checkpoint.py), editing is just ``sdf.with_warp(bend(k=2.5))`` or
wrapping the module: no torch.jit-style opaque-callable machinery needed.
Inverse warps for BSDF/lights preprocessing (edit_dtu.py:108-119) are the
same functions with negated parameters.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def bend(k: float = 2.5, axis: int = 1) -> Callable:
    """Rotate xz by an angle proportional to the ``axis`` coordinate."""

    def warp(p):
        x, y, z = p[..., 0:1], p[..., 1:2], p[..., 2:3]
        v = p[..., axis:axis + 1] * k
        c, s = jnp.cos(v), -jnp.sin(v)
        return jnp.concatenate([c * x - s * z, y, s * x + c * z], axis=-1)

    return warp


def translate_above(a: float = 0.1, thresh: float = -0.05,
                    coord: int = 1, move: int = 0) -> Callable:
    """Shift coordinate ``move`` by ``a`` where coordinate ``coord`` > thresh."""

    def warp(p):
        shift = a * (p[..., coord] > thresh).astype(p.dtype)
        return p.at[..., move].add(shift)

    return warp


def scale_axis(s: float = 0.2, axis: int = 2) -> Callable:
    """Stretch space along one axis (sdf-space scale: p_axis / s)."""

    def warp(p):
        return p.at[..., axis].set(p[..., axis] / s)

    return warp


def add_hole(sdf_fn: Callable, radius: float = 0.2,
             center=(0.0, 0.0, 0.0)) -> Callable:
    """CSG-subtract a sphere from an SDF VALUE function (not a point warp)."""
    center = jnp.asarray(center)

    def edited(params, p):
        prev = sdf_fn(params, p)
        cut = jnp.linalg.norm(p - center, axis=-1) - radius
        # CSG subtraction max(sdf, -sphere); the reference's add_hole as
        # written computes the intersection instead and notes in a comment
        # that subtraction needs the negation (test_nerf.py:81-85)
        return jnp.maximum(prev, -cut)

    return edited


def displace(sdf_fn: Callable, amp: float = 0.05,
             freq: float = 20.0) -> Callable:
    """Cosine-product surface displacement of an SDF VALUE function."""

    def edited(params, p):
        out = sdf_fn(params, p)
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        return out + amp * (jnp.cos(freq * x) * jnp.cos(freq * y)
                            * jnp.cos(freq * z))

    return edited


class EditedModule:
    """Wrap an SDF module with a value-level edit (add_hole / displace)."""

    def __init__(self, module, edit_fn: Callable):
        self.module = module
        self.edit = edit_fn(lambda params, p: module(params, p))

    def init(self, key):
        return self.module.init(key)

    def __call__(self, params, p):
        return self.edit(params, p)


def compose(*warps: Callable) -> Callable:
    """Compose point warps left-to-right."""

    def warp(p):
        for w in warps:
            p = w(p)
        return p

    return warp
