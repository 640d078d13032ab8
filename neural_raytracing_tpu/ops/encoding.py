"""Gaussian Fourier-feature positional encoding.

Behavioral parity: ``create_fourier_basis2``/``fourier2`` in the reference
(pytorch3d/pathtracer/utils.py:33-40): the basis is ``sigma * N(0, 1)`` of
shape ``[features, freqs]`` and the encoding concatenates the raw input with
``sin(x @ B)`` and ``cos(x @ B)``, giving ``2*freqs + features`` output dims.

The basis is part of the params pytree (so checkpoints are self-contained)
but is wrapped in ``stop_gradient`` at application time; keep it out of any
optimizer weight-decay mask (see training/optim.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fourier_basis(key: jax.Array, freqs: int, features: int,
                  sigma: float) -> jax.Array:
    """Random Gaussian frequency matrix ``B`` of shape ``[features, freqs]``."""
    return sigma * jax.random.normal(key, (features, freqs), dtype=jnp.float32)


def fourier_size(freqs: int, features: int) -> int:
    return 2 * freqs + features


def fourier_encode(x: jax.Array, basis: jax.Array) -> jax.Array:
    """``[..., features] -> [..., features + 2*freqs]`` Fourier features."""
    basis = jax.lax.stop_gradient(basis)
    mapped = x @ basis.astype(x.dtype)
    return jnp.concatenate([x, jnp.sin(mapped), jnp.cos(mapped)], axis=-1)
