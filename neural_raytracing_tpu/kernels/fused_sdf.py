"""Pallas TPU kernel: fully fused SphereSDF evaluation.

The SDF sphere-trace evaluates ``SphereSDF`` (128 transformed spheres
smooth-min'ed + a SkipConnMLP residual) up to ~100x per ray per step — the
single hottest function in the framework.  The plain XLA path materializes
the ``[rays, spheres, 3]`` transformed-point tensor in HBM every step; this
kernel keeps everything in VMEM:

  * the per-sphere affine transforms are pre-packed into three ``[3, n]``
    component matrices so the sphere part is 3 MXU matmuls + pure
    lane-parallel VPU math (n = spheres on the 128-lane axis)
  * ``||T_i p - c_i|| - r_i`` and the exponential smooth-min reduce in
    registers/VMEM
  * the residual MLP (encode + layers) runs in the same kernel invocation

Backward falls back to the exact jnp implementation via custom_vjp (same
pattern as fused_mlp; the march is stop-gradiented so only ~2 of ~100
evaluations ever differentiate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..nn.mlp import SkipConnMLP


def _sphere_part_jnp(params, flat, k=32.0, stable_min=False):
    """Reference jnp smooth-min sphere set (matches SphereSDF math)."""
    from ..ops.math import smooth_min, stable_smooth_min
    tfs = params["tfs"] + jnp.eye(3, dtype=flat.dtype)
    q = jnp.einsum("ijk,bk->ibj", tfs, flat) - params["centers"][:, None, :]
    sd = jnp.linalg.norm(q, axis=-1) - params["radii"][:, None]
    mn = stable_smooth_min if stable_min else smooth_min
    return mn(sd, k=k, axis=0)


def _jnp_forward(module, params, p):
    """The exact unfused SphereSDF forward (for the backward rule)."""
    batches = p.shape[:-1]
    flat = p.reshape(-1, 3)
    out = _sphere_part_jnp(params, flat, k=module.k,
                           stable_min=getattr(module, "stable_min", False)
                           ).reshape(batches)
    return out + module.shift_jnp(params["shift"], p)[..., 0]


def _build_kernel(mlp: SkipConnMLP, k_smooth: float,
                  stable_min: bool = False):
    act = mlp.activation
    num_layers = mlp.num_layers

    def kernel(*refs):
        (p_ref, wx, wy, wz, cx, cy, cz, radii) = refs[:8]
        idx = 8
        b_ref = refs[idx]; idx += 1
        init_w, init_b = refs[idx], refs[idx + 1]; idx += 2
        layer_refs = refs[idx: idx + 2 * num_layers]; idx += 2 * num_layers
        out_w, out_b = refs[idx], refs[idx + 1]
        o_ref = refs[-1]

        p = p_ref[:]
        # sphere set: 3 small matmuls -> [B, n] component planes
        f32 = jnp.float32
        qx = jnp.dot(p, wx[:], preferred_element_type=f32) - cx[:]
        qy = jnp.dot(p, wy[:], preferred_element_type=f32) - cy[:]
        qz = jnp.dot(p, wz[:], preferred_element_type=f32) - cz[:]
        d = jnp.sqrt(qx * qx + qy * qy + qz * qz) - radii[:]
        if stable_min:
            m = jnp.max(-k_smooth * d, axis=-1, keepdims=True)
            sm = -(m + jnp.log(jnp.sum(
                jnp.exp(-k_smooth * d - m), axis=-1,
                keepdims=True))) / k_smooth
        else:
            sm = -jnp.log(jnp.maximum(
                jnp.sum(jnp.exp(-k_smooth * d), axis=-1, keepdims=True),
                1e-4)) / k_smooth

        # residual MLP (same structure as fused_mlp)
        mapped = jnp.dot(p, b_ref[:], preferred_element_type=f32)
        enc = jnp.concatenate([p, jnp.sin(mapped), jnp.cos(mapped)], axis=-1)
        h = jnp.dot(enc, init_w[:], preferred_element_type=f32) + init_b[:]
        for i in range(num_layers):
            if mlp._is_skip_layer(i):
                h = jnp.concatenate([h, enc], axis=-1)
            h = (jnp.dot(act(h), layer_refs[2 * i][:],
                         preferred_element_type=f32)
                 + layer_refs[2 * i + 1][:])
        shift = jnp.dot(act(h), out_w[:],
                        preferred_element_type=f32) + out_b[:]
        o_ref[:] = sm + shift

    return kernel


def _pallas_forward(module, params, p, block_rows: int = 512,
                    interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mlp = module.shift
    batches = p.shape[:-1]
    flat = p.reshape(-1, 3)
    n = flat.shape[0]
    n_pad = max(-(-n // block_rows) * block_rows, block_rows)
    flat = jnp.pad(flat, ((0, n_pad - n), (0, 0)))

    tfs = params["tfs"] + jnp.eye(3)
    # component-plane packing: W{x,y,z}[j, i] = T_i[comp, j]
    wx = jnp.transpose(tfs[:, 0, :])           # [3, n]
    wy = jnp.transpose(tfs[:, 1, :])
    wz = jnp.transpose(tfs[:, 2, :])
    cx = params["centers"][:, 0]
    cy = params["centers"][:, 1]
    cz = params["centers"][:, 2]

    sp = params["shift"]
    weights = [wx, wy, wz, cx, cy, cz, params["radii"], sp["B"],
               sp["init"]["w"], sp["init"]["b"]]
    for layer in sp["layers"]:
        weights.extend([layer["w"], layer["b"]])
    weights.extend([sp["out"]["w"], sp["out"]["b"]])

    grid = (n_pad // block_rows,)
    row_spec = lambda width: pl.BlockSpec(
        (block_rows, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda w: pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                                  memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _build_kernel(mlp, module.k,
                      stable_min=getattr(module, "stable_min", False)),
        grid=grid,
        in_specs=[row_spec(3)] + [full(w) for w in weights],
        out_specs=row_spec(1),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        interpret=interpret,
    )(flat, *weights)
    return out[:n, 0].reshape(batches)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4))
def fused_sphere_sdf_apply(module, params, p, interpret: bool = False,
                           block_rows: int = 512):
    return _pallas_forward(module, params, p, block_rows=block_rows,
                           interpret=interpret)


def _fwd(module, params, p, interpret, block_rows):
    return (fused_sphere_sdf_apply(module, params, p, interpret, block_rows),
            (params, p))


def _bwd(module, interpret, block_rows, res, g):
    params, p = res
    _, vjp = jax.vjp(lambda pr, pp: _jnp_forward(module, pr, pp), params, p)
    return vjp(g)


fused_sphere_sdf_apply.defvjp(_fwd, _bwd)


class FusedSphereSDF:
    """SphereSDF with the fully fused Pallas evaluation on TPU.

    Same params layout as ``shapes.sdf.SphereSDF`` (drop-in checkpoint
    compatible).  ``mode``: "auto" | "force" | "off".
    """

    def __init__(self, n: int = 128, k: float = 32.0, mlp=None,
                 mode: str = "auto", block_rows: int = 512,
                 stable_min: bool = False):
        from ..shapes.sdf import SphereSDF
        # plain (non-fused-MLP) shift: the whole module is fused here
        if mlp is None:
            mlp = SkipConnMLP(in_size=3, out=1, num_layers=8,
                              hidden_size=128, freqs=32,
                              activation="softplus", init="zeros")
        self._ref = SphereSDF(n=n, k=k, mlp=mlp, stable_min=stable_min)
        self.n = n
        self.k = k
        self.stable_min = stable_min
        self.shift = mlp
        assert mode in ("auto", "force", "off")
        self.mode = mode
        self.block_rows = block_rows

    def shift_jnp(self, params, p):
        return SkipConnMLP.__call__(self.shift, params, p)

    def init(self, key):
        return self._ref.init(key)

    def __call__(self, params, p):
        from .fused_mlp import on_tpu
        use = self.mode == "force" or (self.mode == "auto" and on_tpu())
        if not use:
            return _jnp_forward(self, params, p)
        interpret = self.mode == "force" and not on_tpu()
        return fused_sphere_sdf_apply(self, params, p, interpret,
                                      self.block_rows)
