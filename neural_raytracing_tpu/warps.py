"""Learned distribution warps: NeuralWarp, MipMap, SphericalHarmonics.

Behavioral parity: pytorch3d/pathtracer/warps.py:66-253 —
  * NeuralWarp (:66-96): a DensityEstimator-based learned warp over uv with
    a BCE ``prime`` against a target pdf (cos-hemisphere by default)
  * MipMap (:99-208): a hierarchical 2D warp with one learned weight per
    leaf cell of a depth-d bisection; the reference's sampling path is
    unfinished — here both pdf classification AND hierarchical
    inverse-CDF sampling are implemented (vectorized binary descent,
    jit-friendly)
  * SphericalHarmonics (:211-253): the reference leaves this a stub with a
    ``legendre`` helper; here the Legendre recursion and real SH basis
    evaluation are functional (importance sampling remains out of scope,
    matching the reference's unused status)
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from .nn.mlp import DensityEstimator
from .ops.dirs import uv_to_dir
from .ops.math import normalize
from .ops.warps import random_on_sphere, square_to_cos_hemisphere_pdf


class NeuralWarp:
    """Learned square->direction warp via a mixture-density estimator."""

    def __init__(self, dists: int = 32):
        self.estim = DensityEstimator(dists=dists)

    def init(self, key: jax.Array) -> dict:
        return {"estim": self.estim.init(key)}

    def sample(self, params, key, shape: tuple):
        val, pdf = self.estim.sample(params["estim"], key, shape)
        return uv_to_dir(jnp.tanh(val)), pdf

    def pdf(self, params, val):
        return self.estim.pdf(params["estim"], val)

    def prime(self, params, key, iters: int = 2000, batches: int = 4096,
              lr: float = 1e-3,
              compare_to: Callable = square_to_cos_hemisphere_pdf):
        """Fit the warp's density to a target pdf by BCE on random dirs."""
        import optax

        opt = optax.adamw(lr, weight_decay=0.0)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, key):
            skey, key = jax.random.split(key)

            def loss_fn(p):
                d, uv = random_on_sphere(skey, batches)
                est = jnp.clip(self.estim.pdf(p["estim"], uv)[..., 0],
                               1e-7, 1.0 - 1e-7)
                real = jnp.clip(jnp.broadcast_to(compare_to(d), est.shape),
                                0.0, 1.0)
                return jnp.mean(-(real * jnp.log(est)
                                  + (1.0 - real) * jnp.log(1.0 - est)))

            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, key, loss

        loss = None
        for _ in range(iters):
            params, opt_state, key, loss = step(params, opt_state, key)
        return params, loss


class MipMap:
    """Hierarchical binary-partition 2D warp with learned cell weights.

    The unit square is split ``depth`` times (alternating vertical /
    horizontal); each of the ``2**depth`` leaf cells carries a learned
    weight.  ``pdf`` locates a point's leaf by binary descent; ``sample``
    draws a leaf by inverse CDF and jitters uniformly inside it.
    """

    def __init__(self, depth: int = 4):
        self.depth = depth
        self.n = 2 ** depth

    def init(self, key: jax.Array) -> dict:
        return {"percents": jax.random.normal(key, (self.n,))}

    def _leaf_index(self, val01: jax.Array) -> jax.Array:
        """[..., 2] in [0,1]^2 -> leaf index by alternating bisection."""
        idx = jnp.zeros(val01.shape[:-1], jnp.int32)
        x = val01[..., 0]
        y = val01[..., 1]
        for d in range(self.depth):
            if d % 2 == 0:
                upper = y >= 0.5
                y = jnp.where(upper, (y - 0.5) * 2.0, y * 2.0)
            else:
                upper = x >= 0.5
                x = jnp.where(upper, (x - 0.5) * 2.0, x * 2.0)
            idx = idx * 2 + upper.astype(jnp.int32)
        return idx

    def pdf(self, params, val: jax.Array) -> jax.Array:
        """Density at ``val`` in [-1, 1]^2 (leaf weight x leaf count)."""
        w = jax.nn.softmax(params["percents"])
        idx = self._leaf_index(jnp.clip((val + 1.0) / 2.0, 0.0, 1.0))
        return w[idx] * self.n  # normalized over the unit square

    def sample(self, params, key, shape: tuple):
        w = jax.nn.softmax(params["percents"])
        k1, k2 = jax.random.split(key)
        leaf = jax.random.categorical(
            k1, jnp.log(jnp.maximum(w, 1e-20)), shape=shape)
        jitter = jax.random.uniform(k2, shape + (2,))
        # reconstruct the leaf cell from its bit path
        x0 = jnp.zeros(shape)
        y0 = jnp.zeros(shape)
        sx = jnp.ones(shape)
        sy = jnp.ones(shape)
        for d in range(self.depth):
            bit = (leaf >> (self.depth - 1 - d)) & 1
            if d % 2 == 0:
                sy = sy / 2.0
                y0 = y0 + bit * sy
            else:
                sx = sx / 2.0
                x0 = x0 + bit * sx
        uv = jnp.stack([x0 + jitter[..., 0] * sx,
                        y0 + jitter[..., 1] * sy], axis=-1)
        pdf = w[leaf] * self.n
        return uv * 2.0 - 1.0, pdf


def legendre(x: jax.Array, up_to_order: int) -> jax.Array:
    """Legendre polynomials P_0..P_{n-1}(x), stacked on axis 0."""
    out = [jnp.ones_like(x), x]
    for n in range(1, up_to_order - 1):
        out.append(((2 * n + 1) * x * out[-1] - n * out[-2]) / (n + 1))
    return jnp.stack(out[:up_to_order])


def _assoc_legendre(l: int, m: int, x: jax.Array) -> jax.Array:
    """Associated Legendre P_l^m(x) by the standard recurrences."""
    pmm = jnp.ones_like(x)
    if m > 0:
        somx2 = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
        fact = 1.0
        for _ in range(m):
            pmm = -pmm * fact * somx2
            fact += 2.0
    if l == m:
        return pmm
    pmmp1 = x * (2 * m + 1) * pmm
    if l == m + 1:
        return pmmp1
    for ll in range(m + 2, l + 1):
        pll = ((2 * ll - 1) * x * pmmp1 - (ll + m - 1) * pmm) / (ll - m)
        pmm, pmmp1 = pmmp1, pll
    return pmmp1


class SphericalHarmonics:
    """Real spherical-harmonics basis with learnable coefficients."""

    def __init__(self, order: int = 3):
        self.order = order
        self.n_coeffs = order * order

    def init(self, key=None) -> dict:
        return {"coeffs": jnp.zeros((self.n_coeffs,), jnp.float32)}

    def basis(self, d: jax.Array) -> jax.Array:
        """Evaluate the real SH basis at unit directions ``[..., 3]``."""
        d = normalize(d)
        x, y, z = d[..., 0], d[..., 1], d[..., 2]
        phi = jnp.arctan2(y, x)
        out = []
        for l in range(self.order):
            for m in range(-l, l + 1):
                am = abs(m)
                norm = math.sqrt(
                    (2 * l + 1) / (4 * math.pi)
                    * math.factorial(l - am) / math.factorial(l + am))
                p = _assoc_legendre(l, am, z)
                if m > 0:
                    out.append(math.sqrt(2.0) * norm * jnp.cos(m * phi) * p)
                elif m < 0:
                    out.append(math.sqrt(2.0) * norm * jnp.sin(am * phi) * p)
                else:
                    out.append(norm * p)
        return jnp.stack(out, axis=-1)

    def __call__(self, params, d: jax.Array) -> jax.Array:
        return jnp.sum(self.basis(d) * params["coeffs"], axis=-1)

    def fit(self, params, dirs: jax.Array, values: jax.Array) -> dict:
        """Least-squares fit of coefficients to samples (dirs, values)."""
        b = self.basis(dirs)
        coeffs, *_ = jnp.linalg.lstsq(b, values, rcond=None)
        return {"coeffs": coeffs}
