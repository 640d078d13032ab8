"""Optimizer construction with per-component learning rates.

Behavioral parity: the reference's AdamW param groups (e.g.
scripts/nerf_synthetic.py:81-85 — surface 8e-5 / bsdf 8e-4 / light 8e-5,
weight_decay=0).  Here the groups are the top-level keys of the scene params
pytree ({"shape", "bsdf", "lights", "occ"}), implemented with
``optax.multi_transform``.

Fourier bases (keys named ``B``/``B1``/``B2``) receive zero gradients by
construction (stop_gradient in the encoder); with weight_decay=0 they are
exactly frozen, matching the reference's non-trainable buffers.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import optax


def make_optimizer(lrs: Dict[str, float], default_lr: float = 1e-4,
                   weight_decay: float = 0.0,
                   b1: float = 0.9, b2: float = 0.999,
                   eps: float = 1e-8,
                   clip_norm: Optional[float] = None
                   ) -> optax.GradientTransformation:
    """AdamW with a separate learning rate per top-level params key.

    ``clip_norm`` optionally clips the GLOBAL gradient norm first — the
    reference has no clipping, but long colocated-light runs can spike
    (observed divergence ~5k steps in); a loose clip (e.g. 10) stabilizes
    without changing healthy steps.
    """

    def adamw(lr):
        return optax.adamw(lr, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay)

    transforms = {k: adamw(lr) for k, lr in lrs.items()}
    transforms["__default__"] = adamw(default_lr)

    def label_fn(params):
        return {k: (k if k in transforms else "__default__")
                for k in params.keys()}

    tx = optax.multi_transform(transforms, label_fn)
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


def global_norm(tree) -> jax.Array:
    return optax.global_norm(tree)
