"""Scene container and emitter-sampling strategies.

Behavioral parity: pytorch3d/pathtracer/scene.py:290-324 — the three emitter
sampling modes selected by the reference's ``w_isect`` flag:
  * ``"none"``    — no occlusion (sample_emitter_dir_wo_isect)
  * ``"hard"``    — shadow ray via the shape's sphere-trace
    (sample_emitter_dir_w_isect)
  * ``"learned"`` — where the shadow ray is blocked, attenuate the spectrum
    by ``sigmoid(occ(x, elev, azim))`` from a learned occlusion MLP
    (sample_emitter_dir_w_learned_occ)

A ``Scene`` bundles the static component objects; all learnable state lives
in one params pytree ``{"shape", "bsdf", "lights", "occ"}`` whose subtrees
remain separately loadable/recomposable (the reference's three-artifact
checkpoint semantics that the editing workflows depend on).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .interaction import DirectionSample, Interaction
from .nn.mlp import SkipConnMLP
from .ops.dirs import dir_to_elev_azim


class Scene:
    """Static scene description: shape + bsdf + lights (+ occlusion MLP)."""

    def __init__(self, shape=None, bsdf=None, lights=None,
                 occ: Optional[SkipConnMLP] = None,
                 occlusion: str = "none"):
        assert occlusion in ("none", "hard", "learned")
        if occlusion == "learned" and occ is None:
            # in_size=5: position (3) + light direction as elev/azim (2)
            occ = SkipConnMLP(in_size=5, out=1)
        self.shape = shape
        self.bsdf = bsdf
        self.lights = lights
        self.occ = occ
        self.occlusion = occlusion

    def init(self, key: jax.Array) -> dict:
        keys = jax.random.split(key, 4)
        params: dict = {}
        params["shape"] = self.shape.init(keys[0]) if self.shape else {}
        params["bsdf"] = self.bsdf.init(keys[1]) if self.bsdf else {}
        params["lights"] = self.lights.init(keys[2]) if self.lights else {}
        params["occ"] = self.occ.init(keys[3]) if self.occ else {}
        return params

    def replace(self, **kwargs) -> "Scene":
        cfg = dict(shape=self.shape, bsdf=self.bsdf, lights=self.lights,
                   occ=self.occ, occlusion=self.occlusion)
        cfg.update(kwargs)
        return Scene(**cfg)


def sample_emitter(scene: Scene, params: dict, it: Interaction,
                   key: Optional[jax.Array], active) -> tuple:
    """Sample a direction towards the lights with the scene's occlusion mode.

    Returns ``(DirectionSample, spectrum [..., 3])``.
    """
    lkey = None
    if key is not None:
        key, lkey = jax.random.split(key)
    ds, spectrum = scene.lights.sample_direction(params["lights"], it,
                                                 key=lkey, active=active)
    if scene.occlusion == "none":
        return ds, spectrum

    rays = jnp.concatenate([it.p, ds.d], axis=-1)
    max_t = ds.dist if ds.dist is not None else 10.0
    not_blocked = scene.shape.intersect_test(params["shape"], rays,
                                             max_t=max_t, active=active)
    if scene.occlusion == "hard":
        active_b = jnp.broadcast_to(jnp.asarray(active), it.p.shape[:-1])
        spectrum = jnp.where((not_blocked & active_b)[..., None], spectrum, 0.0)
        return ds, spectrum

    # learned occlusion: attenuate only the blocked rays
    occ_in = jnp.concatenate([it.p, dir_to_elev_azim(ds.d)], axis=-1)
    occ_att = jax.nn.sigmoid(scene.occ(params["occ"], occ_in))
    spectrum = jnp.where((~not_blocked)[..., None], occ_att * spectrum,
                         spectrum)
    active_b = jnp.broadcast_to(jnp.asarray(active), it.p.shape[:-1])
    spectrum = spectrum * active_b[..., None]
    return ds, spectrum
