"""Volumetric NeRF-family shapes rendered through the same driver.

Behavioral parity: pytorch3d/pathtracer/shapes/nerf.py —
  * PlainNeRF (:9-74): two-stage MLP (sigma+feature from x; RGB from view
    dir elev/azim + latent), stratified ts in [t_near, t_far + U*0.1],
    alpha = 1 - exp(-relu(sigma + noise) * t), exclusive-cumprod compositing
  * PartialNeRF (:77-148): decomposed alpha/rgb + volumetric_integrate
  * NeRFLE (:153-214): NeRF with Light-Emission conditioning — RGB
    conditioned on either the point-light location or a bins^2 envmap probe
    of ``lights.envmap(dirs)`` (the relighting baseline)

Deviation (bug fix): the reference's exclusive cumprod pins the WRONG end
after ``torch.roll`` (nerf.py:69-71 sets ``cp[-1]=1`` instead of ``cp[0]=1``);
we use the standard exclusive transmittance product.

Interface: ``volume_render(params, rays, key, lights, light_params) -> rgb``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..nn.mlp import SkipConnMLP
from ..ops.dirs import dir_to_elev_azim, elev_azim_to_dir


def volumetric_integrate(sigma: jax.Array, rgb: jax.Array,
                         ts: jax.Array, fused: str = "auto") -> jax.Array:
    """Composite ``[T, ...]`` densities and ``[T, ..., 3]`` colors.

    Parity note: like the reference, alpha uses the absolute sample position
    ``t`` (not the inter-sample delta): ``alpha = 1 - exp(-sigma * t)``.
    On TPU the fused Pallas compositing kernel is used (``fused="auto"``).
    """
    if fused != "off" and rgb.shape[-1] == 3:
        from ..kernels.fused_mlp import on_tpu
        if fused == "force" or on_tpu():
            from ..kernels.composite import volumetric_integrate_fused
            return volumetric_integrate_fused(
                sigma, rgb, ts, interpret=(fused == "force" and not on_tpu()))
    t_exp = ts.reshape((ts.shape[0],) + (1,) * (sigma.ndim - 1))
    alpha = 1.0 - jnp.exp(-sigma * t_exp)
    trans = jnp.cumprod(jnp.maximum(1.0 - alpha, 1e-10), axis=0)
    trans = jnp.concatenate([jnp.ones_like(trans[:1]), trans[:-1]], axis=0)
    weights = alpha * trans
    return jnp.sum(weights[..., None] * rgb, axis=0)


def _sample_ts(key, t_near, t_far, steps, jitter=0.1):
    far = t_far
    if key is not None:
        far = t_far + jax.random.uniform(key, ()) * jitter
    return jnp.linspace(t_near, far, steps)


class PlainNeRF:
    """Vanilla NeRF with an optional per-view latent code."""

    def __init__(self, latent_size: int = 32, intermediate_size: int = 32,
                 steps: int = 32, t_near: float = 0.4, t_far: float = 2.0,
                 sigma_noise: float = 1e-3):
        self.latent_size = latent_size
        self.intermediate_size = intermediate_size
        self.steps = steps
        self.t_near = t_near
        self.t_far = t_far
        self.sigma_noise = sigma_noise
        self.first = SkipConnMLP(in_size=3, out=1 + intermediate_size,
                                 latent_size=latent_size, num_layers=5,
                                 hidden_size=32)
        self.second = SkipConnMLP(in_size=2, out=3,
                                  latent_size=latent_size + intermediate_size,
                                  num_layers=5, hidden_size=32)

    def init(self, key: jax.Array) -> dict:
        k1, k2 = jax.random.split(key)
        return {"first": self.first.init(k1), "second": self.second.init(k2)}

    def volume_render(self, params, rays, key=None, lights=None,
                      light_params=None, latent: Optional[jax.Array] = None):
        if latent is None:
            latent = params.get("latent")  # per-view codes [N, L], optional
        r_o, r_d = rays[..., :3], rays[..., 3:]
        tkey = nkey = None
        if key is not None:
            tkey, nkey = jax.random.split(key)
        ts = _sample_ts(tkey, self.t_near, self.t_far, self.steps)
        pts = r_o[None] + ts.reshape(-1, *([1] * r_o.ndim)) * r_d[None]

        if latent is None:
            latent = jnp.zeros(pts.shape[:-1] + (self.latent_size,))
        else:
            # latent is [N, L] over the leading camera axis of the rays
            extra = (None,) * (pts.ndim - 3)
            latent = jnp.broadcast_to(
                latent[(None, slice(None)) + extra],
                pts.shape[:-1] + (self.latent_size,))

        first_out = self.first(params["first"], pts, latent)
        alpha = first_out[..., 0]
        intermediate = first_out[..., 1:]

        elaz = jnp.broadcast_to(dir_to_elev_azim(r_d)[None],
                                pts.shape[:-1] + (2,))
        rgb = jnp.tanh(self.second(
            params["second"], elaz,
            jnp.concatenate([intermediate, latent], axis=-1)))

        noise = 0.0
        if nkey is not None and self.sigma_noise:
            noise = jax.random.normal(nkey, alpha.shape) * self.sigma_noise
        sigma = jax.nn.relu(alpha + noise)
        rgb_out = volumetric_integrate(sigma, rgb, ts)
        return (rgb_out + 1.0) / 2.0


class PartialNeRF:
    """NeRF decomposed into (alpha, rgb) heads + shared integrate step."""

    def __init__(self, latent_size: int = 32, intermediate_size: int = 32,
                 first_layers: int = 4, first_hidden: int = 32,
                 second_layers: int = 4, second_hidden: int = 32,
                 steps: int = 16, t_near: float = 0.4, t_far: float = 1.5):
        self.latent_size = latent_size
        self.steps = steps
        self.t_near = t_near
        self.t_far = t_far
        self.first = SkipConnMLP(in_size=3, out=1 + intermediate_size,
                                 latent_size=latent_size,
                                 num_layers=first_layers,
                                 hidden_size=first_hidden)
        self.second = SkipConnMLP(in_size=2, out=3,
                                  latent_size=latent_size + intermediate_size,
                                  num_layers=second_layers,
                                  hidden_size=second_hidden)

    def init(self, key: jax.Array) -> dict:
        k1, k2 = jax.random.split(key)
        return {"first": self.first.init(k1), "second": self.second.init(k2)}

    def forward(self, params, rays, key=None, latent: Optional[jax.Array] = None):
        r_o, r_d = rays[..., :3], rays[..., 3:]
        ts = _sample_ts(key, self.t_near, self.t_far, self.steps, jitter=0.01)
        pts = r_o[None] + ts.reshape(-1, *([1] * r_o.ndim)) * r_d[None]
        if latent is None:
            latent = jnp.zeros(pts.shape[:-1] + (self.latent_size,))
        else:
            latent = jnp.broadcast_to(latent, pts.shape[:-1] + (self.latent_size,))
        first_out = self.first(params["first"], pts, latent)
        alpha = first_out[..., 0]
        intermediate = first_out[..., 1:]
        elaz = jnp.broadcast_to(dir_to_elev_azim(r_d)[None],
                                pts.shape[:-1] + (2,))
        rgb = self.second(params["second"], elaz,
                          jnp.concatenate([intermediate, latent], axis=-1))
        return alpha, rgb, ts

    def volume_render(self, params, rays, key=None, lights=None,
                      light_params=None, latent=None):
        alpha, rgb, ts = self.forward(params, rays, key, latent)
        out = volumetric_integrate(jax.nn.relu(alpha), rgb, ts)
        return jax.nn.sigmoid(out)


class MPI:
    """Multi-plane image: learnable RGBA on fronto-parallel planes.

    The reference's MPI (nerf.py:216-263) is unfinished (it exits before
    rendering); this is a working volumetric version: ``num_planes``
    planes perpendicular to ``normal`` between ``min_t`` and ``max_t``,
    each sampled through a shared MLP conditioned on the plane index,
    composited front-to-back.
    """

    def __init__(self, num_planes: int = 10, point=(0.0, 0.0, 0.0),
                 normal=(0.0, 0.0, -1.0), min_t: float = 1e-1,
                 max_t: float = 2.0):
        self.num_planes = num_planes
        self.point = jnp.asarray(point, jnp.float32)
        self.normal = jnp.asarray(normal, jnp.float32)
        self.min_t = min_t
        self.max_t = max_t
        self.mlp = SkipConnMLP(in_size=3, out=4, num_layers=4,
                               hidden_size=64, freqs=16)

    def init(self, key: jax.Array) -> dict:
        return {"mlp": self.mlp.init(key)}

    def volume_render(self, params, rays, key=None, lights=None,
                      light_params=None):
        r_o, r_d = rays[..., :3], rays[..., 3:]
        n = self.normal
        offsets = jnp.linspace(self.min_t, self.max_t, self.num_planes)
        # ray/plane intersection per plane: t = (o_k - n.r_o) / (n.r_d)
        denom = jnp.sum(n * r_d, axis=-1)
        denom = jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
        base = jnp.sum(n * (self.point - r_o), axis=-1)
        ts = (base[None] + offsets.reshape(-1, *([1] * base.ndim))) / denom
        valid = ts > 0
        pts = r_o[None] + ts[..., None] * r_d[None]
        idx = jnp.broadcast_to(
            (offsets / self.max_t).reshape(-1, *([1] * base.ndim)),
            ts.shape)
        rgba = self.mlp(params["mlp"],
                        jnp.concatenate(
                            [pts[..., :2], idx[..., None]], axis=-1))
        rgb = jax.nn.sigmoid(rgba[..., :3])
        alpha = jax.nn.sigmoid(rgba[..., 3]) * valid
        trans = jnp.cumprod(jnp.maximum(1.0 - alpha, 1e-10), axis=0)
        trans = jnp.concatenate([jnp.ones_like(trans[:1]), trans[:-1]],
                                axis=0)
        weights = alpha * trans
        return jnp.sum(weights[..., None] * rgb, axis=0)


class NeRFLE:
    """NeRF with Light-Emission conditioning (point light or envmap probe)."""

    def __init__(self, envmap: bool = False, bins: int = 4, steps: int = 64,
                 t_near: float = 0.0, t_far: float = 2.0,
                 latent_size: int = 64):
        self.envmap = envmap
        self.bins = bins
        self.steps = steps
        self.t_near = t_near
        self.t_far = t_far
        self.latent_size = latent_size
        self.first = SkipConnMLP(in_size=3, out=1 + latent_size, num_layers=5,
                                 hidden_size=128)
        light_in = 3 + bins * bins * 3 if envmap else 6
        self.second = SkipConnMLP(in_size=latent_size + light_in, out=3)

    def init(self, key: jax.Array) -> dict:
        k1, k2 = jax.random.split(key)
        return {"first": self.first.init(k1), "second": self.second.init(k2)}

    def volume_render(self, params, rays, key=None, lights=None,
                      light_params=None):
        r_o, r_d = rays[..., :3], rays[..., 3:]
        ts = _sample_ts(key, self.t_near, self.t_far, self.steps)
        pts = r_o[None] + ts.reshape(-1, *([1] * r_o.ndim)) * r_d[None]
        first_out = self.first(params["first"], pts)
        latent = first_out[..., 1:]
        alpha = first_out[..., 0]

        # per-view conditioning broadcasts [N, C] over [T, N, ..., C]:
        # 1 leading None (T axis) + (ndim - 3) trailing Nones before C
        extra = (None,) * max(latent.ndim - 3, 0)
        if self.envmap:
            probes = jnp.stack(jnp.meshgrid(
                jnp.linspace(0.0, 180.0, self.bins),
                jnp.linspace(0.0, 45.0, self.bins), indexing="ij"),
                axis=-1).reshape(-1, 2)
            light_encode = lights.envmap(light_params,
                                         elev_azim_to_dir(probes))
            n = light_encode.shape[0]
            flat = light_encode.reshape(n, -1)
            light_encode = jnp.broadcast_to(
                flat[(None, slice(None)) + extra],
                latent.shape[:-1] + (flat.shape[-1],))
        else:
            loc = light_params["location"]
            light_encode = jnp.broadcast_to(
                loc[(None, slice(None)) + extra],
                latent.shape[:-1] + (3,))

        dirs = jnp.broadcast_to(r_d[None], latent.shape[:-1] + (3,))
        rgb = jax.nn.sigmoid(self.second(
            params["second"],
            jnp.concatenate([latent, dirs, light_encode], axis=-1)))
        sigma = jax.nn.relu(alpha)
        return volumetric_integrate(sigma, rgb, ts)
