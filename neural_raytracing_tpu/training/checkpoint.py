"""Checkpointing: msgpack pytree artifacts with the reference's semantics.

The reference saves the surface, reflectance and lighting nets as THREE
separately loadable artifacts (torch.jit.save(sdf) + torch.save(bsdf/lights),
nerf_synthetic.py:118-121) because the editing workflows reload and
recompose them (test_nerf.py:57-109, edit_dtu.py:85-145).  We keep that:
``save_scene``/``load_scene`` write one msgpack file per component subtree,
plus optional full train-state checkpoints (params + opt_state + step) for
resume — which the reference lacks (it restarts AdamW on reload).

Serialization uses flax.serialization msgpack (pure pytrees of arrays).
Loading requires a template pytree (from ``scene.init``) — checkpoints are
data-only, reconstruction comes from the scene config in code.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

COMPONENTS = ("shape", "bsdf", "lights", "occ")


def save_pytree(path: str, tree) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tree = jax.device_get(tree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))


def load_pytree(path: str, template):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_scene(directory: str, params: dict, step: Optional[int] = None,
               meta: Optional[dict] = None) -> None:
    """Write each scene component as its own artifact (+ meta.json)."""
    os.makedirs(directory, exist_ok=True)
    for comp in COMPONENTS:
        if comp in params and params[comp]:
            save_pytree(os.path.join(directory, f"{comp}.msgpack"),
                        params[comp])
    info = {"step": step, **(meta or {})}
    with open(os.path.join(directory, "meta.json"), "w") as f:
        json.dump(info, f)


def load_scene(directory: str, template_params: dict) -> dict:
    """Load whatever component artifacts exist, falling back to template."""
    out = dict(template_params)
    for comp in COMPONENTS:
        path = os.path.join(directory, f"{comp}.msgpack")
        if os.path.exists(path) and template_params.get(comp):
            out[comp] = load_pytree(path, template_params[comp])
    return out


def save_train_state(path: str, params, opt_state, step: int) -> None:
    save_pytree(path, {"params": params, "opt_state": opt_state,
                       "step": np.int64(step)})


def load_train_state(path: str, params_template, opt_state_template):
    template = {"params": params_template, "opt_state": opt_state_template,
                "step": np.int64(0)}
    out = load_pytree(path, template)
    return out["params"], out["opt_state"], int(out["step"])
