"""Convolutional blocks: the DCGAN discriminator for the GAN experiment
and the image-embedding encoder.

Behavioral parity: ``Discriminator`` in
pytorch3d/pathtracer/neural_blocks.py:450-481 — a 64x64 DCGAN critic
(stride-2 convs, batch-norm, leaky-relu) used by the exploratory GAN-NeRF
experiment (exp.py).  Batch norm is replaced by instance norm so the
module stays a pure function of (params, x) without running statistics.

``Embedder`` COMPLETES the reference's empty stub (neural_blocks.py:
440-447: "some number of convolutional layers then MLP to return feature
vector", forward raises NotImplementedError) with exactly that
architecture — strided conv pyramid, global average pool, linear head.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


def _conv_init(key, k, c_in, c_out):
    fan_in = c_in * k * k
    std = math.sqrt(2.0 / fan_in)
    return std * jax.random.normal(key, (c_out, c_in, k, k), jnp.float32)


def _conv(x, w, stride, padding):
    return lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _instance_norm(x, eps=1e-5):
    mu = jnp.mean(x, axis=(2, 3), keepdims=True)
    var = jnp.var(x, axis=(2, 3), keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps)


class Discriminator:
    """DCGAN critic over NCHW images (64x64 native, strided to 1 logit)."""

    def __init__(self, num_features: int = 64, num_channels: int = 3):
        self.nf = num_features
        self.nc = num_channels

    def init(self, key: jax.Array) -> dict:
        nf, nc = self.nf, self.nc
        keys = jax.random.split(key, 5)
        return {
            "c0": _conv_init(keys[0], 4, nc, nf),
            "c1": _conv_init(keys[1], 4, nf, nf * 2),
            "c2": _conv_init(keys[2], 4, nf * 2, nf * 4),
            "c3": _conv_init(keys[3], 4, nf * 4, nf * 8),
            "c4": _conv_init(keys[4], 4, nf * 8, 1),
        }

    def __call__(self, params, x: jax.Array) -> jax.Array:
        """x: [N, C, 64, 64] -> logits [N]."""
        act = lambda v: jax.nn.leaky_relu(v, 0.2)
        h = act(_conv(x, params["c0"], 2, 1))
        h = act(_instance_norm(_conv(h, params["c1"], 2, 1)))
        h = act(_instance_norm(_conv(h, params["c2"], 2, 1)))
        h = act(_instance_norm(_conv(h, params["c3"], 2, 1)))
        h = _conv(h, params["c4"], 1, 0)
        return h.reshape(x.shape[0], -1).mean(axis=-1)


class Embedder:
    """Image -> latent code (completes neural_blocks.py:440-447).

    Strided conv pyramid -> instance norm + leaky-relu -> global average
    pool -> linear projection to ``latent_size``.  Resolution-agnostic
    (the pool absorbs spatial extent); images are NCHW.
    """

    def __init__(self, latent_size: int = 64, num_features: int = 32,
                 num_channels: int = 3, num_layers: int = 4):
        self.latent_size = latent_size
        self.nf = num_features
        self.nc = num_channels
        self.num_layers = num_layers

    def init(self, key: jax.Array) -> dict:
        keys = jax.random.split(key, self.num_layers + 1)
        convs = []
        c_in = self.nc
        for i in range(self.num_layers):
            c_out = self.nf * (2 ** i)
            convs.append(_conv_init(keys[i], 4, c_in, c_out))
            c_in = c_out
        head_std = math.sqrt(1.0 / c_in)
        head = head_std * jax.random.normal(
            keys[-1], (c_in, self.latent_size), jnp.float32)
        return {"convs": tuple(convs),
                "head": {"w": head,
                         "b": jnp.zeros((self.latent_size,), jnp.float32)}}

    def __call__(self, params, img: jax.Array) -> jax.Array:
        """img: [N, C, H, W] -> latent [N, latent_size]."""
        act = lambda v: jax.nn.leaky_relu(v, 0.2)
        h = img
        for i, w in enumerate(params["convs"]):
            h = _conv(h, w, 2, 1)
            if i > 0:
                h = _instance_norm(h)
            h = act(h)
        feat = jnp.mean(h, axis=(2, 3))                  # global avg pool
        return feat @ params["head"]["w"] + params["head"]["b"]
