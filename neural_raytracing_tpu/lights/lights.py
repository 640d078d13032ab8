"""Light emitters: learnable point lights, constant environment, light field.

Behavioral parity: pytorch3d/pathtracer/lights/lights.py —
  * PointLights (:40-110): learnable intensity/location and
    constant/linear/quadratic falloff; spectrum =
    ``scale * normalize(intensity) / clamp(c + l d + q d^2)``; delta sample.
  * Constant (:113-149): enclosing emitting sphere, uniform-sphere sampling.
  * LightField (:155-195): learned 5D light field — MLP(x) -> unnormalized
    direction whose magnitude scales a learned RGB; delta pdf=1 (used for
    unknown-illumination DTU / nerf-synthetic).

Per-view parameters (e.g. per-frame NeRV light positions) broadcast over the
leading camera axis: a ``[N, C]`` parameter applies to interactions shaped
``[N, ..., C]``.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..interaction import DirectionSample
from ..nn.mlp import SkipConnMLP
from ..ops.math import normalize
from ..ops.warps import (
    square_to_uniform_sphere, square_to_uniform_sphere_pdf,
)


def _bcast(v: jax.Array, batch_ndim: int) -> jax.Array:
    """Reshape an ``[N, C]`` per-view parameter to ``[N, 1, ..., 1, C]``."""
    v = jnp.atleast_2d(v)
    return v.reshape(v.shape[:1] + (1,) * (batch_ndim - 1) + v.shape[-1:])


def _never_hit(rays: jax.Array):
    """intersect/eval_pdf for delta lights: BSDF-sampled rays cannot hit a
    dirac emitter, so the Direct integrator's BSDF-sampling arm contributes
    zero for them (its MIS weight for the emitter arm is 1)."""
    batch = rays.shape[:-1]
    return (jnp.zeros(batch, rays.dtype), jnp.zeros(batch, bool))


class PointLights:
    """Delta point light(s) with learnable falloff and color."""

    def __init__(self, intensity=(1.0, 1.0, 1.0), location=(0.0, 1.0, 0.0),
                 const: float = 1e-8, linear: float = 1e-8,
                 square: float = 1.0, scale: float = 1e2):
        self._intensity = jnp.atleast_2d(jnp.asarray(intensity, jnp.float32))
        self._location = jnp.atleast_2d(jnp.asarray(location, jnp.float32))
        self._const = float(const)
        self._linear = float(linear)
        self._square = float(square)
        self._scale = float(scale)

    def init(self, key=None) -> dict:
        return {
            "intensity": self._intensity,
            "location": self._location,
            "const": jnp.float32(self._const),
            "linear": jnp.float32(self._linear),
            "square": jnp.float32(self._square),
            "scale": jnp.float32(self._scale),
        }

    def _falloff(self, params, dist):
        spectrum = (jnp.maximum(params["const"], 1e-6)
                    + jnp.maximum(params["linear"], 1e-6) * dist
                    + jnp.maximum(params["square"], 1e-6) * jnp.square(dist))
        return params["scale"] * normalize(params["intensity"]) / jnp.maximum(
            spectrum, 1e-6)

    def sample_direction(self, params, it, key=None, active=True):
        batch_ndim = it.p.ndim - 1  # rank of the batch dims (excl. channel)
        loc = _bcast(params["location"], batch_ndim)
        d = loc - it.p
        dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
        d = normalize(d, eps=1e-6)
        color = _bcast(normalize(params["intensity"]), batch_ndim)
        falloff = (jnp.maximum(params["const"], 1e-6)
                   + jnp.maximum(params["linear"], 1e-6) * dist
                   + jnp.maximum(params["square"], 1e-6) * jnp.square(dist))
        spectrum = params["scale"] * color / jnp.maximum(falloff, 1e-6)
        active_b = jnp.broadcast_to(jnp.asarray(active), it.p.shape[:-1])
        spectrum = jnp.where(active_b[..., None], spectrum, 0.0)
        ds = DirectionSample(d=d, pdf=jnp.ones(it.p.shape[:-1], it.p.dtype),
                             dist=dist[..., 0], p=jnp.broadcast_to(loc, it.p.shape),
                             delta=True)
        return ds, spectrum

    def envmap(self, params, p: jax.Array) -> jax.Array:
        """Falloff spectrum at probe points ``p`` (NeRFLE light encoding)."""
        d = p[None, ...] - params["location"][:, None, :]
        dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
        return self._falloff(params, dist)

    # delta light: not intersectable by BSDF-sampled rays
    delta = True

    def intersect(self, params, rays):
        return _never_hit(rays)

    def eval_pdf(self, params, rays):
        batch = rays.shape[:-1]
        return jnp.zeros(batch + (3,), rays.dtype), jnp.zeros(batch, rays.dtype)


class Constant:
    """An enclosing sphere emitting uniformly inwards."""

    def __init__(self, radius: float = 5.0, intensity: float = 0.5):
        self.radius = float(radius)
        self._intensity = float(intensity)

    def init(self, key=None) -> dict:
        return {"intensity": jnp.float32(self._intensity)}

    def sample_direction(self, params, it, key=None, active=True):
        if key is None:
            raise ValueError("Constant light sampling requires a PRNG key")
        sample = jax.random.uniform(key, it.p.shape[:-1] + (2,))
        d = normalize(square_to_uniform_sphere(sample))
        dist = 2.0 * self.radius
        pdf_val = square_to_uniform_sphere_pdf(d)
        pdf = jnp.full(it.p.shape[:-1], pdf_val, it.p.dtype)
        ds = DirectionSample(d=d, pdf=pdf,
                             dist=jnp.full(it.p.shape[:-1], dist, it.p.dtype),
                             p=it.p + d * dist, n=-d, delta=False)
        spectrum = jnp.broadcast_to(params["intensity"] / pdf_val, it.p.shape)
        active_b = jnp.broadcast_to(jnp.asarray(active), it.p.shape[:-1])
        spectrum = jnp.where(active_b[..., None], spectrum, 0.0)
        return ds, spectrum

    # area (non-delta) light: the enclosing sphere is hit by every ray
    # starting inside it — completes the reference's stubbed BSDF-sampling
    # arm (integrators.py:191-205 raises NotImplementedError upstream)
    delta = False

    def intersect(self, params, rays):
        """-> (distance to the enclosing sphere [...], hit mask [...])."""
        p, d = rays[..., :3], rays[..., 3:]
        b = jnp.sum(p * d, axis=-1)
        c = jnp.sum(p * p, axis=-1) - self.radius * self.radius
        disc = b * b - c
        t = -b + jnp.sqrt(jnp.maximum(disc, 0.0))
        hit = (disc >= 0.0) & (t > 0.0)
        return t, hit

    def eval_pdf(self, params, rays):
        """Emitted radiance along ``rays`` and the pdf with which
        ``sample_direction`` would have produced those directions
        (uniform over the sphere of directions)."""
        batch = rays.shape[:-1]
        spectrum = jnp.broadcast_to(params["intensity"], batch + (3,))
        pdf = jnp.full(batch, 1.0 / (4.0 * math.pi), rays.dtype)
        return spectrum, pdf


class LightField:
    """Learned 5D light field: MLP(x) -> direction * magnitude, learned RGB."""

    def __init__(self, mlp: Optional[SkipConnMLP] = None):
        if mlp is None:
            from ..kernels.fused_mlp import FusedSkipConnMLP
            mlp = FusedSkipConnMLP(in_size=3, out=3, num_layers=10,
                                   hidden_size=256)
        self.mlp = mlp

    def init(self, key: jax.Array) -> dict:
        return {
            "mlp": self.mlp.init(key),
            "color": jnp.zeros((3,), jnp.float32),
        }

    def sample_direction(self, params, it, key=None, active=True):
        non_norm = self.mlp(params["mlp"], it.p)
        # parity quirk (lights.py:191): the reference clamps each component of
        # the normalized direction to [1e-6, 1]; DTU training depends on it.
        d = jnp.clip(normalize(non_norm, eps=1e-6), 1e-6, 1.0)
        magn = jnp.linalg.norm(non_norm, axis=-1, keepdims=True)
        spectrum = magn * jax.nn.sigmoid(params["color"])
        active_b = jnp.broadcast_to(jnp.asarray(active), it.p.shape[:-1])
        d = jnp.where(active_b[..., None], d, 0.0)
        spectrum = jnp.where(active_b[..., None], spectrum, 0.0)
        ds = DirectionSample(d=d, pdf=jnp.ones(it.p.shape[:-1], it.p.dtype),
                             dist=None, delta=True)
        return ds, spectrum

    # delta light field: not intersectable by BSDF-sampled rays
    delta = True

    def intersect(self, params, rays):
        return _never_hit(rays)

    def eval_pdf(self, params, rays):
        batch = rays.shape[:-1]
        return jnp.zeros(batch + (3,), rays.dtype), jnp.zeros(batch, rays.dtype)
