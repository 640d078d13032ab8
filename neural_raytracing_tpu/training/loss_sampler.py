"""Loss-proportional view sampling (host-side).

Behavioral parity: ``LossSampler`` (pytorch3d/pathtracer/utils.py:134-147):
tracks a per-view loss, samples views with probability proportional to
loss^2, and multiplies all stored losses by 1.00001 each update so stale
views slowly regain likelihood.
"""

from __future__ import annotations

import numpy as np


class LossSampler:
    def __init__(self, n: int, default: float = 1e5,
                 likelihood_inc: float = 1.00001,
                 rng: np.random.Generator | None = None):
        self.losses = np.full(n, default, dtype=np.float64)
        self.l_inc = likelihood_inc
        self.rng = rng if rng is not None else np.random.default_rng(0)

    def update(self, idx: int, loss: float):
        self.losses *= self.l_inc
        self.losses[idx] = loss + 1.0

    def update_idxs(self, idxs, loss: float):
        for idx in idxs:
            self.update(int(idx), loss)

    def sample(self, n: int = 1, replace: bool = False) -> np.ndarray:
        sqr = self.losses * self.losses
        p = sqr / sqr.sum()
        return self.rng.choice(len(self.losses), size=n, replace=replace, p=p)
