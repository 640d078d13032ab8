"""Multiresolution hash encoding (Instant-NGP style) + HashSDF surface.

Beyond-reference extension (PAPERS.md: "Instant Neural Graphics Primitives
with a Multiresolution Hash Encoding", arXiv:2201.05989): a learned
multi-level hashed feature grid with trilinear interpolation feeding a
small MLP — converges far faster than Fourier-feature MLPs for SDF
surfaces and is a drop-in module for ``shapes.sdf.SDF``.

TPU notes: the per-level corner gathers are [R, 8] takes from a [T, F]
table — XLA lowers these to dynamic-gathers which are not MXU work, so
keep the tables small enough to stay in VMEM-resident cache lines
(2^14-2^16 entries) and the feature dim at 2-4.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .mlp import SkipConnMLP

_PRIMES = (1, 2654435761, 805459861)


class HashEncoding:
    """L-level hashed voxel features with trilinear interpolation.

    apply: ``(params, p[..., 3]) -> [..., levels * features]`` with inputs
    expected in ``[-bound, bound]^3``.
    """

    def __init__(self, levels: int = 8, table_size_log2: int = 14,
                 features: int = 2, base_resolution: int = 16,
                 max_resolution: int = 512, bound: float = 2.0,
                 stacked: bool = False):
        self.stacked = stacked
        self.levels = levels
        self.table_size = 2 ** table_size_log2
        self.features = features
        self.bound = bound
        if levels > 1:
            growth = math.exp(math.log(max_resolution / base_resolution)
                              / (levels - 1))
        else:
            growth = 1.0
        self.resolutions = tuple(
            int(math.floor(base_resolution * growth ** l))
            for l in range(levels))
        self.out_size = levels * features

    def init(self, key: jax.Array) -> dict:
        tables = 1e-4 * jax.random.uniform(
            key, (self.levels, self.table_size, self.features),
            minval=-1.0, maxval=1.0)
        return {"tables": tables}

    def _hash(self, coords: jax.Array) -> jax.Array:
        """[..., 3] voxel coords -> table indices (uint32 hash)."""
        c = coords.astype(jnp.uint32)
        h = c[..., 0] * jnp.uint32(_PRIMES[0])
        h = h ^ (c[..., 1] * jnp.uint32(_PRIMES[1]))
        h = h ^ (c[..., 2] * jnp.uint32(_PRIMES[2]))
        return h % jnp.uint32(self.table_size)

    def __call__(self, params, p: jax.Array) -> jax.Array:
        batches = p.shape[:-1]
        x = (p.reshape(-1, 3) + self.bound) / (2.0 * self.bound)  # [R,3] in [0,1]
        x = jnp.clip(x, 0.0, 1.0)
        corners = jnp.asarray(
            [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
            jnp.int32)                                      # [8, 3]
        if self.stacked:
            # All levels in ONE gather: stack the level tables as
            # [(L*T), F], offset each level's hash by l*T, and fold the
            # lookup into a single [R, L, 8] gather.  Numerics identical
            # to the per-level loop (same hash mod T, same trilinear
            # weights).  MEASURED SLOWER on TPU v5e at flagship scale
            # (5.67 vs 1.62 s/step on the 38,400-ray hash train step,
            # r5 hash_time_q2 vs arm_hash logs): the one gather indexes a
            # 16x-larger table, defeating whatever table locality the 16
            # small gathers had, and the [R, L, 8, 3] index math is not
            # where the time was.  Kept opt-in for documentation.
            res = jnp.asarray(self.resolutions, jnp.float32)    # [L]
            xl = x[:, None, :] * res[None, :, None]             # [R, L, 3]
            base = jnp.floor(xl).astype(jnp.int32)              # [R, L, 3]
            frac = xl - base                                    # [R, L, 3]
            corner_coords = base[:, :, None, :] + corners[None, None]
            idx = self._hash(corner_coords)                     # [R, L, 8]
            idx = idx + (jnp.arange(self.levels, dtype=jnp.uint32)
                         * jnp.uint32(self.table_size))[None, :, None]
            flat = params["tables"].reshape(
                self.levels * self.table_size, self.features)
            feats = flat[idx]                                   # [R, L, 8, F]
            w = jnp.prod(jnp.where(corners[None, None] == 1,
                                   frac[:, :, None, :],
                                   1.0 - frac[:, :, None, :]),
                         axis=-1)                               # [R, L, 8]
            out = jnp.sum(feats * w[..., None], axis=2)         # [R, L, F]
            return out.reshape(batches + (self.out_size,))
        outs = []
        for l, res in enumerate(self.resolutions):
            xl = x * res
            base = jnp.floor(xl).astype(jnp.int32)          # [R, 3]
            frac = xl - base                                # [R, 3]
            corner_coords = base[:, None, :] + corners      # [R, 8, 3]
            idx = self._hash(corner_coords)                 # [R, 8]
            feats = params["tables"][l][idx]                # [R, 8, F]
            w = jnp.prod(jnp.where(corners[None] == 1, frac[:, None, :],
                                   1.0 - frac[:, None, :]), axis=-1)
            outs.append(jnp.sum(feats * w[..., None], axis=1))
        return jnp.concatenate(outs, axis=-1).reshape(
            batches + (self.out_size,))


class HashSDF:
    """SDF surface: hash encoding + small MLP (fast-converging geometry).

    Drop-in module for ``shapes.sdf.SDF`` (same ``init``/``__call__``
    interface as SphereSDF).  The raw position is concatenated with the
    hashed features so the surface stays defined outside the grid bound.
    """

    def __init__(self, encoding: Optional[HashEncoding] = None,
                 hidden_size: int = 64, num_layers: int = 2,
                 init_sphere_radius: float = 0.5):
        self.encoding = encoding if encoding is not None else HashEncoding()
        self.mlp = SkipConnMLP(
            in_size=3 + self.encoding.out_size, out=1,
            num_layers=num_layers, hidden_size=hidden_size, freqs=4,
            sigma=1.0, activation="relu")
        self.init_sphere_radius = init_sphere_radius

    def init(self, key: jax.Array) -> dict:
        k1, k2 = jax.random.split(key)
        mlp = self.mlp.init(k2)
        # zero only the OUTPUT layer: the net starts as the exact sphere but
        # gradients still flow through the hidden layers (an all-zeros init
        # would leave them dead under relu)
        mlp["out"] = jax.tree_util.tree_map(jnp.zeros_like, mlp["out"])
        return {"enc": self.encoding.init(k1), "mlp": mlp}

    def __call__(self, params, p: jax.Array) -> jax.Array:
        feats = self.encoding(params["enc"], p)
        inp = jnp.concatenate([p, feats], axis=-1)
        shift = self.mlp(params["mlp"], inp)[..., 0]
        # zero-init MLP => starts as an exact sphere of init_sphere_radius
        base = jnp.linalg.norm(p, axis=-1) - self.init_sphere_radius
        return base + shift
