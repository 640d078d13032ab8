"""Pallas TPU kernel: fused Fourier-encode + SkipConnMLP forward.

Why: the SDF sphere-trace evaluates the surface MLP ``max_steps`` (+
``throughput_steps``) times per ray under ``stop_gradient`` — it is the
dominant cost of a training step (SURVEY.md §3.3 "HOT LOOP 1/2").  The
plain XLA path materializes the Fourier features and every hidden
activation in HBM between layers; this kernel keeps the whole per-block
computation (encode -> init -> N hidden layers with skip concats -> out)
resident in VMEM, streaming only the ray block in and the result out.

Layout: rays are processed in row blocks of ``block_rows``; all weights are
small enough to sit in VMEM for the entire grid (a 16x256 net with 128
Fourier features is ~4.5 MB in f32).  Matmuls run on the MXU via
``jnp.dot(..., preferred_element_type=f32)``.

Gradients: the kernel is wrapped in ``jax.custom_vjp`` whose backward
recomputes through the reference jnp implementation — so the no-grad march
gets the fused kernel and the (rare) differentiable evaluations get exact
XLA gradients.  Higher-order AD (grad-of-grad for SDF normals) works
because the bwd rule is plain traceable jnp.

Falls back to the jnp path off-TPU (CPU tests) unless forced with
``interpret=True``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.mlp import SkipConnMLP


def _jnp_forward(mlp: SkipConnMLP, params, x, latent=None):
    # explicitly the BASE jnp implementation: a FusedSkipConnMLP's own
    # __call__ would dispatch back into the fused path and recurse
    return SkipConnMLP.__call__(mlp, params, x, latent)


def _build_kernel(mlp: SkipConnMLP, with_latent: bool,
                  compute_dtype=jnp.float32):
    """Kernel body closure for a given static MLP config.

    With ``compute_dtype=bfloat16`` the matmul OPERANDS are bf16 (2x MXU
    throughput) while accumulation and the Fourier trig stay f32 — the
    standard mixed-precision recipe; appropriate for the shading nets,
    keep the SDF surface net in f32.
    """
    act = mlp.activation
    num_layers = mlp.num_layers
    cd = compute_dtype

    def kernel(*refs):
        # refs: x, [latent], B, init_w, init_b, {w_i, b_i}..., out_w, out_b, o
        idx = 0
        x_ref = refs[idx]; idx += 1
        latent_ref = None
        if with_latent:
            latent_ref = refs[idx]; idx += 1
        b_ref = refs[idx]; idx += 1
        init_w = refs[idx]; init_b = refs[idx + 1]; idx += 2
        layer_refs = refs[idx: idx + 2 * num_layers]; idx += 2 * num_layers
        out_w = refs[idx]; out_b = refs[idx + 1]
        o_ref = refs[-1]

        # activations/bias/trig stay f32 (Mosaic lacks bf16 compares for
        # the activation selects); only the matmul OPERANDS are cast to cd
        x = x_ref[:]
        mapped = jnp.dot(x, b_ref[:], preferred_element_type=jnp.float32)
        enc = jnp.concatenate([x, jnp.sin(mapped), jnp.cos(mapped)], axis=-1)
        if with_latent:
            enc = jnp.concatenate([enc, latent_ref[:]], axis=-1)
        enc_c = enc.astype(cd)
        h = jnp.dot(enc_c, init_w[:].astype(cd),
                    preferred_element_type=jnp.float32) + init_b[:]
        # parity: the reference activates the CONCATENATED vector (skip
        # layers see act(enc) too); act is elementwise so split the concat
        act_enc_c = act(enc).astype(cd)
        for i in range(num_layers):
            if mlp._is_skip_layer(i):
                a = jnp.concatenate([act(h).astype(cd), act_enc_c], axis=-1)
            else:
                a = act(h).astype(cd)
            h = jnp.dot(a, layer_refs[2 * i][:].astype(cd),
                        preferred_element_type=jnp.float32) + layer_refs[2 * i + 1][:]
        o_ref[:] = (jnp.dot(act(h).astype(cd), out_w[:].astype(cd),
                            preferred_element_type=jnp.float32) + out_b[:])

    return kernel


def _pallas_forward(mlp: SkipConnMLP, params, x, latent=None,
                    block_rows: int = 512, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batches = x.shape[:-1]
    flat = x.reshape(-1, mlp.in_size)
    n = flat.shape[0]
    n_pad = max(-(-n // block_rows) * block_rows, block_rows)
    flat = jnp.pad(flat, ((0, n_pad - n), (0, 0)))
    with_latent = latent is not None
    inputs = [flat]
    if with_latent:
        lat = latent.reshape(-1, mlp.latent_size)
        inputs.append(jnp.pad(lat, ((0, n_pad - n), (0, 0))))

    weights = [params["B"], params["init"]["w"], params["init"]["b"]]
    for layer in params["layers"]:
        weights.extend([layer["w"], layer["b"]])
    weights.extend([params["out"]["w"], params["out"]["b"]])

    grid = (n_pad // block_rows,)
    row_spec = lambda width: pl.BlockSpec(
        (block_rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    # weights: whole array resident in VMEM for every grid step
    full = lambda w: pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                                  memory_space=pltpu.VMEM)

    in_specs = [row_spec(mlp.in_size)]
    if with_latent:
        in_specs.append(row_spec(mlp.latent_size))
    in_specs.extend(full(w) for w in weights)

    out = pl.pallas_call(
        _build_kernel(mlp, with_latent, compute_dtype=mlp.compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=row_spec(mlp.out_size),
        out_shape=jax.ShapeDtypeStruct((n_pad, mlp.out_size), jnp.float32),
        interpret=interpret,
    )(*inputs, *weights)
    return out[:n].reshape(batches + (mlp.out_size,))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4))
def fused_mlp_apply(mlp: SkipConnMLP, params, x, interpret: bool = False,
                    block_rows: int = 512):
    """Fused forward; backward falls back to exact jnp gradients."""
    return _pallas_forward(mlp, params, x, interpret=interpret,
                           block_rows=block_rows)


def _fwd(mlp, params, x, interpret, block_rows):
    return fused_mlp_apply(mlp, params, x, interpret, block_rows), (params, x)


def _bwd(mlp, interpret, block_rows, res, g):
    params, x = res
    _, vjp = jax.vjp(lambda p, xx: _jnp_forward(mlp, p, xx), params, x)
    return vjp(g)


fused_mlp_apply.defvjp(_fwd, _bwd)


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


class FusedSkipConnMLP(SkipConnMLP):
    """Drop-in SkipConnMLP that uses the Pallas kernel on TPU.

    ``mode``: "auto" (TPU only), "force" (always, interpret off-TPU — for
    tests), or "off".
    """

    def __init__(self, *args, mode: str = "auto", block_rows: int = 512,
                 **kwargs):
        super().__init__(*args, **kwargs)
        assert mode in ("auto", "force", "off")
        self.mode = mode
        self.block_rows = block_rows

    def __call__(self, params, p, latent=None):
        use = (self.mode == "force"
               or (self.mode == "auto" and on_tpu()))
        if not use or latent is not None:
            return super().__call__(params, p, latent)
        interpret = self.mode == "force" and not on_tpu()
        return fused_mlp_apply(self, params, p, interpret, self.block_rows)
