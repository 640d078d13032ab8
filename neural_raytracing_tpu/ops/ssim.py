"""Differentiable SSIM / MS-SSIM in JAX.

Behavioral parity target: the ``pytorch_msssim`` package as used by the
reference loss (pytorch3d/pathtracer/utils.py:306-359) and eval harness
(training_utils.py:342-343, 840-844): gaussian window 11, sigma 1.5,
K=(0.01, 0.03), "valid" convolution (no padding), per-(batch,channel) maps
averaged with ``size_average=True``.

Implementation notes (TPU): the separable gaussian blur is expressed as two
depthwise convolutions via ``lax.conv_general_dilated`` with feature_group_count
— these map to small, well-tiled convs on the MXU and fuse with the
surrounding elementwise work under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@functools.lru_cache(maxsize=8)
def _gaussian_kernel(win_size: int, sigma: float):
    # cache NUMPY only: anything jnp built inside a jit trace must not be
    # cached across traces (it would leak that trace's constant/tracer)
    import numpy as np
    coords = np.arange(win_size, dtype=np.float32) - win_size // 2
    g = np.exp(-np.square(coords) / (2.0 * sigma * sigma))
    return g / np.sum(g)


def _gaussian_blur(x: jax.Array, win_size: int, sigma: float) -> jax.Array:
    """Separable 'valid' gaussian filter of an NCHW tensor, depthwise."""
    c = x.shape[1]
    g = jnp.asarray(_gaussian_kernel(win_size, sigma), dtype=x.dtype)
    kh = jnp.tile(g.reshape(1, 1, win_size, 1), (c, 1, 1, 1))
    kw = jnp.tile(g.reshape(1, 1, 1, win_size), (c, 1, 1, 1))
    dn = ("NCHW", "OIHW", "NCHW")
    # HIGHEST precision: on v5e f32 convs otherwise lower to bf16 passes,
    # and SSIM's E[x^2] - mu^2 variance cancellation then produces errors
    # on the order of C2 = 9e-4 — denominators near zero made a TPU eval
    # report SSIM 2.07 on a batch whose true value is 0.94 (CPU-exact)
    x = lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=c,
                                 precision=lax.Precision.HIGHEST)
    x = lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=c,
                                 precision=lax.Precision.HIGHEST)
    return x


def _ssim_components(x, y, data_range, win_size, sigma, k1, k2):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _gaussian_blur(x, win_size, sigma)
    mu_y = _gaussian_blur(y, win_size, sigma)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y

    sigma_xx = _gaussian_blur(x * x, win_size, sigma) - mu_xx
    sigma_yy = _gaussian_blur(y * y, win_size, sigma) - mu_yy
    sigma_xy = _gaussian_blur(x * y, win_size, sigma) - mu_xy

    cs_map = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs_map
    return ssim_map, cs_map


def ssim(x: jax.Array, y: jax.Array, data_range: float = 1.0,
         win_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03,
         size_average: bool = True) -> jax.Array:
    """SSIM over NCHW images; returns a scalar if ``size_average``."""
    ssim_map, _ = _ssim_components(x, y, data_range, win_size, sigma, k1, k2)
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def ms_ssim(x: jax.Array, y: jax.Array, data_range: float = 1.0,
            win_size: int = 11, sigma: float = 1.5,
            k1: float = 0.01, k2: float = 0.03,
            weights=MS_SSIM_WEIGHTS, size_average: bool = True) -> jax.Array:
    """Multi-scale SSIM over NCHW images (avg-pool 2x between scales)."""
    weights = jnp.asarray(weights, dtype=x.dtype)
    levels = weights.shape[0]
    min_side = min(x.shape[-1], x.shape[-2])
    assert min_side > (win_size - 1) * 2 ** (levels - 1), (
        f"image too small ({min_side}) for {levels}-level ms-ssim with "
        f"window {win_size}")

    mcs = []
    for i in range(levels):
        ssim_map, cs_map = _ssim_components(x, y, data_range, win_size, sigma,
                                            k1, k2)
        if i < levels - 1:
            mcs.append(jax.nn.relu(jnp.mean(cs_map, axis=(1, 2, 3))))
            pad_h = x.shape[2] % 2
            pad_w = x.shape[3] % 2
            x = lax.reduce_window(x, 0.0, lax.add, (1, 1, 2, 2), (1, 1, 2, 2),
                                  ((0, 0), (0, 0), (0, pad_h), (0, pad_w))) / 4.0
            y = lax.reduce_window(y, 0.0, lax.add, (1, 1, 2, 2), (1, 1, 2, 2),
                                  ((0, 0), (0, 0), (0, pad_h), (0, pad_w))) / 4.0

    ssim_val = jax.nn.relu(jnp.mean(ssim_map, axis=(1, 2, 3)))
    mcs_and_ssim = jnp.stack(mcs + [ssim_val], axis=0)  # [levels, N]
    out = jnp.prod(mcs_and_ssim ** weights[:, None], axis=0)
    if size_average:
        return jnp.mean(out)
    return out
