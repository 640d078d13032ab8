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


def _build_bwd_kernel(mlp: SkipConnMLP):
    """Recompute-forward-then-backprop kernel for one row block.

    Weight/bias grads accumulate across the (sequential) TPU grid via
    zero-init at program 0 and += thereafter; dx is written per block.
    """
    from jax.experimental import pallas as pl
    from ..nn.mlp import ACTIVATION_GRADS

    act = mlp.activation
    dact = ACTIVATION_GRADS[mlp.activation_name]
    L = mlp.num_layers
    in_size = mlp.in_size

    def matT(a, b):
        # a [B, m], b [B, n] -> a^T b [m, n] on the MXU
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def kernel(*refs):
        x_ref, g_ref = refs[0], refs[1]
        idx = 2
        b_ref = refs[idx]; idx += 1
        init_w, init_b = refs[idx], refs[idx + 1]; idx += 2
        layer_refs = refs[idx: idx + 2 * L]; idx += 2 * L
        out_w, out_b = refs[idx], refs[idx + 1]; idx += 2
        # outputs
        dx_ref = refs[idx]; idx += 1
        d_init_w, d_init_b = refs[idx], refs[idx + 1]; idx += 2
        d_layer_refs = refs[idx: idx + 2 * L]; idx += 2 * L
        d_out_w, d_out_b = refs[idx], refs[idx + 1]

        @pl.when(pl.program_id(0) == 0)
        def _():
            d_init_w[:] = jnp.zeros_like(d_init_w)
            d_init_b[:] = jnp.zeros_like(d_init_b)
            for r in d_layer_refs:
                r[:] = jnp.zeros_like(r)
            d_out_w[:] = jnp.zeros_like(d_out_w)
            d_out_b[:] = jnp.zeros_like(d_out_b)

        f32 = jnp.float32
        x = x_ref[:]
        g = g_ref[:]
        mapped = jnp.dot(x, b_ref[:], preferred_element_type=f32)
        sin_m, cos_m = jnp.sin(mapped), jnp.cos(mapped)
        enc = jnp.concatenate([x, sin_m, cos_m], axis=-1)
        act_enc = act(enc)

        # forward recompute, keeping pre-activations
        hs = [jnp.dot(enc, init_w[:], preferred_element_type=f32)
              + init_b[:]]
        a_list = []
        for i in range(L):
            if mlp._is_skip_layer(i):
                a = jnp.concatenate([act(hs[-1]), act_enc], axis=-1)
            else:
                a = act(hs[-1])
            a_list.append(a)
            hs.append(jnp.dot(a, layer_refs[2 * i][:],
                              preferred_element_type=f32)
                      + layer_refs[2 * i + 1][:])

        a_out = act(hs[-1])
        d_out_w[:] += matT(a_out, g)
        d_out_b[:] += jnp.sum(g, axis=0, keepdims=True)
        gh = jnp.dot(g, out_w[:].T, preferred_element_type=f32) * dact(hs[-1])

        genc_act = jnp.zeros_like(enc)
        for i in reversed(range(L)):
            d_layer_refs[2 * i][:] += matT(a_list[i], gh)
            d_layer_refs[2 * i + 1][:] += jnp.sum(gh, axis=0, keepdims=True)
            ga = jnp.dot(gh, layer_refs[2 * i][:].T,
                         preferred_element_type=f32)
            if mlp._is_skip_layer(i):
                gh = ga[:, :mlp.hidden_size] * dact(hs[i])
                genc_act = genc_act + ga[:, mlp.hidden_size:]
            else:
                gh = ga * dact(hs[i])

        d_init_w[:] += matT(enc, gh)
        d_init_b[:] += jnp.sum(gh, axis=0, keepdims=True)
        genc = (jnp.dot(gh, init_w[:].T, preferred_element_type=f32)
                + genc_act * dact(enc))
        # enc = [x, sin(xB), cos(xB)]; dB = 0 (stop-gradient basis)
        n_f = mlp.freqs
        g_sin = genc[:, in_size:in_size + n_f]
        g_cos = genc[:, in_size + n_f:]
        dx_ref[:] = (genc[:, :in_size]
                     + jnp.dot(g_sin * cos_m - g_cos * sin_m, b_ref[:].T,
                               preferred_element_type=f32))

    return kernel


def _pallas_backward(mlp: SkipConnMLP, params, x, g, block_rows: int = 256,
                     interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batches = x.shape[:-1]
    flat = x.reshape(-1, mlp.in_size)
    gflat = g.reshape(-1, mlp.out_size)
    n = flat.shape[0]
    n_pad = max(-(-n // block_rows) * block_rows, block_rows)
    flat = jnp.pad(flat, ((0, n_pad - n), (0, 0)))
    gflat = jnp.pad(gflat, ((0, n_pad - n), (0, 0)))

    weights = [params["B"], params["init"]["w"],
               params["init"]["b"].reshape(1, -1)]
    for layer in params["layers"]:
        weights.extend([layer["w"], layer["b"].reshape(1, -1)])
    weights.extend([params["out"]["w"], params["out"]["b"].reshape(1, -1)])

    grid = (n_pad // block_rows,)
    row_spec = lambda width: pl.BlockSpec(
        (block_rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda w: pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                                  memory_space=pltpu.VMEM)

    # grads for every weight (skipping B), all full-array accumulated
    grad_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                   for w in weights[1:]]
    out_shape = ([jax.ShapeDtypeStruct((n_pad, mlp.in_size), jnp.float32)]
                 + grad_shapes)
    out_specs = ([row_spec(mlp.in_size)]
                 + [full(w) for w in weights[1:]])

    outs = pl.pallas_call(
        _build_bwd_kernel(mlp),
        grid=grid,
        in_specs=[row_spec(mlp.in_size), row_spec(mlp.out_size)]
        + [full(w) for w in weights],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(flat, gflat, *weights)

    dx = outs[0][:n].reshape(batches + (mlp.in_size,))
    it = iter(outs[1:])
    dparams = {
        "B": jnp.zeros_like(params["B"]),
        "init": {"w": next(it), "b": next(it).reshape(-1)},
        "layers": tuple({"w": next(it), "b": next(it).reshape(-1)}
                        for _ in range(mlp.num_layers)),
    }
    dparams["out"] = {"w": next(it), "b": next(it).reshape(-1)}
    return dparams, dx


def _segment_bounds(num_layers: int, n_segments: int):
    """Contiguous hidden-layer segments [(l0, l1), ...] covering [0, L)."""
    edges = np.linspace(0, num_layers, n_segments + 1).round().astype(int)
    return [(int(edges[s]), int(edges[s + 1]))
            for s in range(n_segments) if edges[s + 1] > edges[s]]


def _build_ckpt_kernel(mlp: SkipConnMLP, boundaries):
    """Forward recompute that writes ONLY the boundary preactivations.

    ``boundaries`` is a sorted tuple of indices into the hs chain
    (hs[0] = init output, hs[i+1] = layer i output); one output ref each.
    """
    act = mlp.activation
    L = mlp.num_layers
    bset = set(boundaries)

    def kernel(*refs):
        x_ref, b_ref = refs[0], refs[1]
        init_w, init_b = refs[2], refs[3]
        layer_refs = refs[4: 4 + 2 * L]
        out_refs = refs[4 + 2 * L:]

        f32 = jnp.float32
        x = x_ref[:]
        mapped = jnp.dot(x, b_ref[:], preferred_element_type=f32)
        enc = jnp.concatenate([x, jnp.sin(mapped), jnp.cos(mapped)], axis=-1)
        act_enc = act(enc)
        h = jnp.dot(enc, init_w[:], preferred_element_type=f32) + init_b[:]
        oi = 0
        if 0 in bset:
            out_refs[oi][:] = h
            oi += 1
        for i in range(L):
            if mlp._is_skip_layer(i):
                a = jnp.concatenate([act(h), act_enc], axis=-1)
            else:
                a = act(h)
            h = (jnp.dot(a, layer_refs[2 * i][:], preferred_element_type=f32)
                 + layer_refs[2 * i + 1][:])
            if (i + 1) in bset:
                out_refs[oi][:] = h
                oi += 1

    return kernel


def _build_seg_bwd_kernel(mlp: SkipConnMLP, l0: int, l1: int):
    """Backward for hidden layers [l0, l1): recompute the segment forward
    from the checkpointed hs[l0], then backprop.

    inputs:  x, h_in (hs[l0]), g_out (dL/d hs[l1]), B, per-layer (w, b)
    outputs: g_in (dL/d hs[l0]), genc_act partial, per-layer (dw, db)
    """
    from jax.experimental import pallas as pl

    from ..nn.mlp import ACTIVATION_GRADS

    act = mlp.activation
    dact = ACTIVATION_GRADS[mlp.activation_name]
    n_layers = l1 - l0

    def matT(a, b):
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def kernel(*refs):
        x_ref, h_in_ref, g_ref, b_ref = refs[:4]
        idx = 4
        layer_refs = refs[idx: idx + 2 * n_layers]
        idx += 2 * n_layers
        g_in_ref, genc_ref = refs[idx], refs[idx + 1]
        d_layer_refs = refs[idx + 2:]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in d_layer_refs:
                r[:] = jnp.zeros_like(r)

        f32 = jnp.float32
        x = x_ref[:]
        mapped = jnp.dot(x, b_ref[:], preferred_element_type=f32)
        enc = jnp.concatenate([x, jnp.sin(mapped), jnp.cos(mapped)], axis=-1)
        act_enc = act(enc)

        hs = [h_in_ref[:]]
        a_list = []
        for k in range(n_layers):
            i = l0 + k
            if mlp._is_skip_layer(i):
                a = jnp.concatenate([act(hs[-1]), act_enc], axis=-1)
            else:
                a = act(hs[-1])
            a_list.append(a)
            hs.append(jnp.dot(a, layer_refs[2 * k][:],
                              preferred_element_type=f32)
                      + layer_refs[2 * k + 1][:])

        gh = g_ref[:]
        genc_act = jnp.zeros_like(enc)
        for k in reversed(range(n_layers)):
            i = l0 + k
            d_layer_refs[2 * k][:] += matT(a_list[k], gh)
            d_layer_refs[2 * k + 1][:] += jnp.sum(gh, axis=0, keepdims=True)
            ga = jnp.dot(gh, layer_refs[2 * k][:].T,
                         preferred_element_type=f32)
            if mlp._is_skip_layer(i):
                gh = ga[:, :mlp.hidden_size] * dact(hs[k])
                genc_act = genc_act + ga[:, mlp.hidden_size:]
            else:
                gh = ga * dact(hs[k])
        g_in_ref[:] = gh
        genc_ref[:] = genc_act

    return kernel


def _pallas_backward_segmented(mlp: SkipConnMLP, params, x, g,
                               n_segments: int = 4, block_rows: int = 256,
                               interpret: bool = False):
    """Checkpointed multi-kernel backward.

    The monolithic bwd kernel unrolls all 2L layers in one Mosaic program —
    compile time blows past 9 min for the 16x256 shading net (CLAUDE.md).
    Splitting into a boundary-checkpoint forward + one kernel per layer
    segment keeps every program ~L/S layers deep; the extra HBM traffic is
    just the (S+1) boundary activations and inter-segment grads.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..nn.mlp import ACTIVATION_GRADS, fourier_encode

    act = mlp.activation
    dact = ACTIVATION_GRADS[mlp.activation_name]
    L = mlp.num_layers
    segs = _segment_bounds(L, n_segments)
    boundaries = tuple(sorted({s[0] for s in segs} | {L}))

    batches = x.shape[:-1]
    flat = x.reshape(-1, mlp.in_size)
    gflat = g.reshape(-1, mlp.out_size)
    n = flat.shape[0]
    n_pad = max(-(-n // block_rows) * block_rows, block_rows)
    flat = jnp.pad(flat, ((0, n_pad - n), (0, 0)))
    gflat = jnp.pad(gflat, ((0, n_pad - n), (0, 0)))

    grid = (n_pad // block_rows,)
    row_spec = lambda width: pl.BlockSpec(
        (block_rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda w: pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                                  memory_space=pltpu.VMEM)
    enc_dim = mlp.enc_size

    # 1) boundary-checkpoint forward
    all_weights = [params["B"], params["init"]["w"],
                   params["init"]["b"].reshape(1, -1)]
    for layer in params["layers"]:
        all_weights.extend([layer["w"], layer["b"].reshape(1, -1)])
    hs_bounds = pl.pallas_call(
        _build_ckpt_kernel(mlp, boundaries),
        grid=grid,
        in_specs=[row_spec(mlp.in_size)] + [full(w) for w in all_weights],
        out_specs=[row_spec(mlp.hidden_size)] * len(boundaries),
        out_shape=[jax.ShapeDtypeStruct((n_pad, mlp.hidden_size),
                                        jnp.float32)] * len(boundaries),
        interpret=interpret,
    )(flat, *all_weights)
    hs_at = dict(zip(boundaries, hs_bounds))

    # 2) out layer (plain XLA: two matmuls)
    a_out = act(hs_at[L])
    d_out_w = a_out.T @ gflat
    d_out_b = jnp.sum(gflat, axis=0)
    gh = (gflat @ params["out"]["w"].T) * dact(hs_at[L])

    # 3) per-segment bwd kernels, deepest first
    d_layers: dict = {}
    genc_act = jnp.zeros((n_pad, enc_dim), jnp.float32)
    for (l0, l1) in reversed(segs):
        seg_weights = []
        for i in range(l0, l1):
            seg_weights.extend([params["layers"][i]["w"],
                                params["layers"][i]["b"].reshape(1, -1)])
        grad_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                       for w in seg_weights]
        outs = pl.pallas_call(
            _build_seg_bwd_kernel(mlp, l0, l1),
            grid=grid,
            in_specs=([row_spec(mlp.in_size), row_spec(mlp.hidden_size),
                       row_spec(mlp.hidden_size), full(params["B"])]
                      + [full(w) for w in seg_weights]),
            out_specs=([row_spec(mlp.hidden_size), row_spec(enc_dim)]
                       + [full(w) for w in seg_weights]),
            out_shape=([jax.ShapeDtypeStruct((n_pad, mlp.hidden_size),
                                             jnp.float32),
                        jax.ShapeDtypeStruct((n_pad, enc_dim), jnp.float32)]
                       + grad_shapes),
            interpret=interpret,
        )(flat, hs_at[l0], gh, params["B"], *seg_weights)
        gh = outs[0]
        genc_act = genc_act + outs[1]
        it = iter(outs[2:])
        for i in range(l0, l1):
            d_layers[i] = {"w": next(it), "b": next(it).reshape(-1)}

    # 4) init layer + dx epilogue (plain XLA)
    enc = fourier_encode(flat, params["B"])
    d_init_w = enc.T @ gh
    d_init_b = jnp.sum(gh, axis=0)
    genc = gh @ params["init"]["w"].T + genc_act * dact(enc)
    n_f = mlp.freqs
    mapped = flat @ params["B"]
    g_sin = genc[:, mlp.in_size:mlp.in_size + n_f]
    g_cos = genc[:, mlp.in_size + n_f:]
    dx = (genc[:, :mlp.in_size]
          + (g_sin * jnp.cos(mapped) - g_cos * jnp.sin(mapped))
          @ params["B"].T)

    dparams = {
        "B": jnp.zeros_like(params["B"]),
        "init": {"w": d_init_w, "b": d_init_b},
        "layers": tuple(d_layers[i] for i in range(L)),
        "out": {"w": d_out_w, "b": d_out_b},
    }
    return dparams, dx[:n].reshape(batches + (mlp.in_size,))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4))
def fused_mlp_apply(mlp: SkipConnMLP, params, x, interpret: bool = False,
                    block_rows: int = 512):
    """Fused forward; backward via the Pallas bwd kernel (or exact jnp)."""
    return _pallas_forward(mlp, params, x, interpret=interpret,
                           block_rows=block_rows)


def _fwd(mlp, params, x, interpret, block_rows):
    return fused_mlp_apply(mlp, params, x, interpret, block_rows), (params, x)


def _bwd(mlp, interpret, block_rows, res, g):
    params, x = res
    # the Pallas bwd kernel is NOT differentiable itself — only enable it
    # on nets that never need second-order AD (the shading nets; the SDF
    # surface net gets grad-of-grad through its normals and must keep the
    # traceable jnp backward)
    use_pallas = (getattr(mlp, "pallas_bwd", False)
                  and mlp.activation_name is not None)
    if use_pallas:
        segments = getattr(mlp, "pallas_bwd_segments", 0)
        if segments >= 2:
            return _pallas_backward_segmented(
                mlp, params, x, g, n_segments=segments,
                block_rows=min(block_rows, 256), interpret=interpret)
        return _pallas_backward(mlp, params, x, g,
                                block_rows=min(block_rows, 256),
                                interpret=interpret)
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
                 pallas_bwd: bool = False, pallas_bwd_segments: int = 4,
                 **kwargs):
        super().__init__(*args, **kwargs)
        assert mode in ("auto", "force", "off")
        self.mode = mode
        self.block_rows = block_rows
        # opt-in: hand-written Pallas backward (first-order-only nets);
        # segments >= 2 uses the checkpointed multi-kernel variant whose
        # Mosaic programs stay ~L/segments layers deep (the monolithic
        # kernel compiles >9 min on the 16x256 net), 0/1 = monolithic
        self.pallas_bwd = pallas_bwd
        self.pallas_bwd_segments = pallas_bwd_segments

    def __call__(self, params, p, latent=None):
        use = (self.mode == "force"
               or (self.mode == "auto" and on_tpu()))
        if not use or latent is not None:
            return super().__call__(params, p, latent)
        interpret = self.mode == "force" and not on_tpu()
        return fused_mlp_apply(self, params, p, interpret, self.block_rows)
