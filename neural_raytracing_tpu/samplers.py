"""Samplers: PRNG abstraction + stratified orthogonal-array sampling.

Behavioral parity: pytorch3d/pathtracer/samplers/samplers.py —
  * Sampler (:4-26): the independent uniform sampler (the only one the
    reference actually uses; here it is a thin stateful wrapper over
    threaded ``jax.random`` keys, which also fixes the reference's
    irreproducibility from global torch RNG)
  * permute_kensler (:48-76): Kensler's hash-based in-place permutation
    (Pixar correlated multi-jittered sampling), vectorized over uint32
  * OrthogonalSampler (:78-134): Bose orthogonal-array construction of
    strength 2 — left broken/unused in the reference
    (pathtracer/readme.md:31-33); completed here and property-tested
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class Sampler:
    """Independent uniform sampler over a threaded PRNG key."""

    def __init__(self, key: Optional[jax.Array] = None, seed: int = 0):
        self.key = key if key is not None else jax.random.PRNGKey(seed)

    def split(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def sample(self, shape, dtype=jnp.float32) -> jax.Array:
        return jax.random.uniform(self.split(), tuple(shape), dtype)


def _encode_all_ones(x):
    x = x | (x >> 1)
    x = x | (x >> 2)
    x = x | (x >> 4)
    x = x | (x >> 8)
    x = x | (x >> 16)
    return x


def permute_kensler(idx, samples: int, seed: int):
    """Pseudorandom permutation of ``idx`` within [0, samples).

    Vectorized Kensler hash rounds: each candidate is hashed inside the
    power-of-two envelope and rejected (re-hashed) until it lands in
    range — realized as a fixed number of masked rounds.
    """
    if samples <= 1:
        return jnp.zeros_like(jnp.asarray(idx, jnp.uint32))
    idx = jnp.asarray(idx, jnp.uint32)
    seed = jnp.uint32(seed)
    w = _encode_all_ones(jnp.uint32(samples - 1))
    # enough rounds that every lane lands inside [0, samples)
    max_iter = int(2 ** math.ceil(math.log2(max(samples, 2)))) - samples + 1

    def hash_round(v):
        v = v ^ seed
        v = v * jnp.uint32(0xE170893D)
        v = v ^ (seed >> 16)
        v = v ^ ((v & w) >> 4)
        v = v ^ (seed >> 8)
        v = v * jnp.uint32(0x0929EB3F)
        v = v ^ (seed >> 23)
        v = v ^ ((v & w) >> 1)
        v = v * (jnp.uint32(1) | (seed >> 27))
        v = v * jnp.uint32(0x6935FA69)
        v = v ^ ((v & w) >> 11)
        v = v * jnp.uint32(0x74DCB303)
        v = v ^ ((v & w) >> 2)
        v = v * jnp.uint32(0x9E501CC3)
        v = v ^ ((v & w) >> 2)
        v = v * jnp.uint32(0xC860A3DF)
        v = v & w
        v = v ^ (v >> 5)
        return v

    out = idx
    done = jnp.zeros(idx.shape, bool)
    for _ in range(max(max_iter, 1)):
        candidate = hash_round(out)
        out = jnp.where(done, out, candidate)
        done = done | (out < samples)
    return (out + seed) % jnp.uint32(samples)


def _next_prime_resolution(sample_count: int) -> int:
    def is_prime(x):
        if x < 2:
            return False
        for i in range(2, int(math.isqrt(x)) + 1):
            if x % i == 0:
                return False
        return True

    r = max(2, int(math.ceil(math.sqrt(sample_count))))
    while not is_prime(r):
        r += 1
    return r


class OrthogonalSampler(Sampler):
    """Bose orthogonal-array (strength 2) stratified sampler.

    Produces ``resolution^2`` samples whose projections onto every pair of
    dimensions form a stratified (latin-square) pattern.
    """

    def __init__(self, sample_count: int, jitter: bool = True,
                 strength: int = 2, seed: int = 0):
        super().__init__(seed=seed)
        assert strength == 2, "only strength-2 Bose construction supported"
        self.jitter = jitter
        self.resolution = _next_prime_resolution(sample_count)
        self.sample_count = self.resolution ** 2
        self.base_seed = seed
        self.dimension_index = 0

    def bose(self, i, dim: int, permute_seed: int) -> jax.Array:
        r = self.resolution
        i = permute_kensler(jnp.asarray(i) % self.sample_count,
                            self.sample_count, permute_seed)
        i = jnp.asarray(i, jnp.int32)
        a_i0 = i // r
        a_i1 = i - a_i0 * r
        if dim == 0:
            a_ij, a_ik = a_i0, a_i1
        elif dim == 1:
            a_ij, a_ik = a_i1, a_i0
        else:
            k = dim - 1 if dim % 2 == 0 else dim + 1
            a_ij = (a_i0 + (dim - 1) * a_i1) % r
            a_ik = (a_i0 + (k - 1) * a_i1) % r
        stratum = jnp.asarray(
            permute_kensler(a_ij, r, permute_seed * (dim + 1) * 0x51633E2D),
            jnp.float32)
        sub_stratum = jnp.asarray(
            permute_kensler(a_ik, r, permute_seed * (dim + 1) * 0x68BC21EB),
            jnp.float32)
        if self.jitter:
            jit = jax.random.uniform(self.split(), i.shape)
        else:
            jit = 0.5
        return (stratum + (sub_stratum + jit) / r) / r

    def next_1d(self, n: int) -> jax.Array:
        out = self.bose(jnp.arange(n), self.dimension_index,
                        self.base_seed + 1)
        self.dimension_index += 1
        return out

    def next_2d(self, n: int) -> jax.Array:
        return jnp.stack([self.next_1d(n), self.next_1d(n)], axis=-1)

    def sample(self, shape, dtype=jnp.float32) -> jax.Array:
        n = int(np.prod(shape))
        return self.next_1d(n).reshape(shape).astype(dtype)
