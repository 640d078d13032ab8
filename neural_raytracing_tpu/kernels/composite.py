"""Pallas TPU kernel: fused NeRF alpha compositing.

SURVEY.md §7 Pallas target (b): the volumetric compositing
``alpha = 1 - exp(-sigma * t);  T_i = prod_{j<i}(1 - alpha_j);
out = sum_i T_i * alpha_i * rgb_i`` fused into one VMEM pass per ray
block — the XLA path materializes the ``[T, R]`` alpha/transmittance
tensors in HBM between the exp, cumprod and reduce stages.

The exclusive cumprod along the sample axis is computed as
``exp(shifted-cumsum(log(1 - alpha)))`` (cumsum lowers to a lane-parallel
scan on the VPU; the 1e-10 clamp keeps the log finite and matches the
jnp path's clamp exactly).

Layout: samples on the LAST (lane) axis — inputs are transposed to
``[rays, T]`` blocks; rgb is composited per channel to keep everything
2-D and lane-aligned.

Backward: custom_vjp recomputing through the jnp implementation
(``shapes.nerf.volumetric_integrate``), as with the other fused kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _jnp_composite(sigma_rt, rgb_rt, ts):
    """jnp reference on the transposed layout: sigma [R, T], rgb [R, T, 3]."""
    alpha = 1.0 - jnp.exp(-sigma_rt * ts)
    trans = jnp.cumprod(jnp.maximum(1.0 - alpha, 1e-10), axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]],
                            axis=-1)
    weights = alpha * trans
    return jnp.einsum("rt,rtc->rc", weights, rgb_rt)


def _kernel(sigma_ref, r_ref, g_ref, b_ref, ts_ref, out_ref):
    sigma = sigma_ref[:]
    ts = ts_ref[:]
    t = sigma.shape[-1]
    alpha = 1.0 - jnp.exp(-sigma * ts)
    log_om = jnp.log(jnp.maximum(1.0 - alpha, 1e-10))
    # EXCLUSIVE prefix sum as a strictly-lower-triangular matmul (Mosaic has
    # no cumsum lowering; a [T, T] triangular dot on the MXU is cheap)
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    tri_excl = (rows < cols).astype(jnp.float32)       # sum over j < i
    excl = jnp.dot(log_om, tri_excl, preferred_element_type=jnp.float32)
    weights = alpha * jnp.exp(excl)
    out_ref[:] = jnp.stack([
        jnp.sum(weights * r_ref[:], axis=-1),
        jnp.sum(weights * g_ref[:], axis=-1),
        jnp.sum(weights * b_ref[:], axis=-1),
    ], axis=-1)


def _pallas_composite(sigma_rt, rgb_rt, ts, block_rows: int = 256,
                      interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, t = sigma_rt.shape
    n_pad = max(-(-r // block_rows) * block_rows, block_rows)
    sigma_p = jnp.pad(sigma_rt, ((0, n_pad - r), (0, 0)))
    rgb_p = jnp.pad(rgb_rt, ((0, n_pad - r), (0, 0), (0, 0)))
    ts_row = jnp.broadcast_to(ts, (1, t))

    row = lambda width: pl.BlockSpec((block_rows, width),
                                     lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=(n_pad // block_rows,),
        in_specs=[row(t), row(t), row(t), row(t),
                  pl.BlockSpec((1, t), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=row(3),
        out_shape=jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
        interpret=interpret,
    )(sigma_p, rgb_p[..., 0], rgb_p[..., 1], rgb_p[..., 2], ts_row)
    return out[:r]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_composite(sigma_rt, rgb_rt, ts, interpret: bool = False,
                    block_rows: int = 256):
    """Fused compositing on the ``[R, T]`` layout -> ``[R, 3]``."""
    return _pallas_composite(sigma_rt, rgb_rt, ts, block_rows=block_rows,
                             interpret=interpret)


def _fwd(sigma_rt, rgb_rt, ts, interpret, block_rows):
    return (fused_composite(sigma_rt, rgb_rt, ts, interpret, block_rows),
            (sigma_rt, rgb_rt, ts))


def _bwd(interpret, block_rows, res, g):
    sigma_rt, rgb_rt, ts = res
    _, vjp = jax.vjp(_jnp_composite, sigma_rt, rgb_rt, ts)
    return vjp(g)


fused_composite.defvjp(_fwd, _bwd)


def volumetric_integrate_fused(sigma, rgb, ts, interpret: bool = False):
    """Drop-in for ``shapes.nerf.volumetric_integrate`` using the kernel.

    sigma ``[T, ...]``, rgb ``[T, ..., 3]``, ts ``[T]`` -> ``[..., 3]``.
    """
    batches = sigma.shape[1:]
    t = sigma.shape[0]
    sigma_rt = jnp.moveaxis(sigma.reshape(t, -1), 0, -1)        # [R, T]
    rgb_rt = jnp.moveaxis(rgb.reshape(t, -1, 3), 0, 1)          # [R, T, 3]
    out = fused_composite(sigma_rt, rgb_rt, ts, interpret)
    return out.reshape(batches + (3,))
