"""Pallas TPU kernels: fully fused sphere-trace march and silhouette
min-scan for SphereSDF-family surfaces.

Why: profiling the flagship train step shows the no-grad sphere-trace march
(reference sdfs.py:118-131) and the throughput min-scan (sdfs.py:232-249)
are ~60% of device time — `max_steps + throughput_steps` (~96) sequential
SDF evaluations, each a separate kernel launch plus XLA glue (mask updates,
point advance) with HBM round-trips between steps.

These kernels put the ENTIRE loop inside one ``pallas_call``: each grid
block loads its rays once, keeps the sphere-set and shift-MLP weights
resident in VMEM, and iterates the march/min-scan fully on-chip — zero HBM
traffic between steps.  The march additionally early-exits per block
(``pl.when`` skip inside a ``fori_loop``; Mosaic rejects vector-carried
``while_loop``): rays in a block are spatially coherent pixels, so blocks
whose rays all resolve stop paying for the remaining iterations —
semantically identical to the masked fixed-trip loop because converged
lanes are frozen by the masks.

Both loops are no-grad by design (the reference marches under
``torch.no_grad``; gradients only flow through the separate hit-point /
argmin-point evaluations), so no custom VJP is needed — callers
stop-gradient the results, matching ``SDF._march`` / ``SDF.throughput``.

Math parity: exactly ``SphereSDF.__call__`` (smooth-min of transformed
spheres + SkipConnMLP residual) and the masked updates of ``SDF._march`` /
``SDF.throughput`` — see tests/test_kernels.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..nn.mlp import SkipConnMLP


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def supports(module) -> bool:
    """True if ``module`` is a SphereSDF-family surface the kernels handle."""
    from ..shapes.sdf import SphereSDF
    from .fused_sdf import FusedSphereSDF
    if not isinstance(module, (SphereSDF, FusedSphereSDF)):
        return False
    mlp = module.shift
    return isinstance(mlp, SkipConnMLP) and mlp.latent_size == 0


def _sphere_weight_arrays(params):
    """Pack the sphere set as component-plane matmuls (see fused_sdf)."""
    tfs = params["tfs"] + jnp.eye(3)
    return [
        jnp.transpose(tfs[:, 0, :]),      # [3, n]
        jnp.transpose(tfs[:, 1, :]),
        jnp.transpose(tfs[:, 2, :]),
        params["centers"][:, 0], params["centers"][:, 1],
        params["centers"][:, 2], params["radii"],
    ]


def _mlp_weight_arrays(sp, compute_dtype=jnp.float32):
    """MLP weight matrices pre-cast to the march compute dtype (ONCE per
    step, outside the kernel — casting inside would cost VPU work on every
    march iteration).  Biases and the Fourier basis stay f32: biases add
    to f32 accumulators, the basis feeds sin/cos."""
    cast = lambda w: w.astype(compute_dtype)
    ws = [sp["B"], cast(sp["init"]["w"]), sp["init"]["b"]]
    for layer in sp["layers"]:
        ws.extend([cast(layer["w"]), layer["b"]])
    ws.extend([cast(sp["out"]["w"]), sp["out"]["b"]])
    return ws


def _make_sdf_eval(mlp: SkipConnMLP, k_smooth: float, refs,
                   compute_dtype=jnp.float32, stable_min: bool = False):
    """Closure evaluating the full SphereSDF on a [B, 3] block -> [B, 1].

    With ``compute_dtype=bfloat16`` the MLP matmul operands are bf16
    (weights arrive pre-cast) with f32 accumulation; the sphere set,
    smooth-min, Fourier trig, and activations stay f32.
    """
    wx, wy, wz, cx, cy, cz, radii = refs[:7]
    idx = 7
    b_ref = refs[idx]; idx += 1
    init_w, init_b = refs[idx], refs[idx + 1]; idx += 2
    layer_refs = refs[idx: idx + 2 * mlp.num_layers]
    idx += 2 * mlp.num_layers
    out_w, out_b = refs[idx], refs[idx + 1]
    act = mlp.activation
    f32 = jnp.float32
    cd = compute_dtype

    def sdf_eval(p):
        qx = jnp.dot(p, wx[:], preferred_element_type=f32) - cx[:]
        qy = jnp.dot(p, wy[:], preferred_element_type=f32) - cy[:]
        qz = jnp.dot(p, wz[:], preferred_element_type=f32) - cz[:]
        d = jnp.sqrt(qx * qx + qy * qy + qz * qz) - radii[:]
        if stable_min:
            # exact logsumexp smooth-min (SphereSDF(stable_min=True))
            m = jnp.max(-k_smooth * d, axis=-1, keepdims=True)
            sm = -(m + jnp.log(jnp.sum(
                jnp.exp(-k_smooth * d - m), axis=-1,
                keepdims=True))) / k_smooth
        else:
            sm = -jnp.log(jnp.maximum(
                jnp.sum(jnp.exp(-k_smooth * d), axis=-1, keepdims=True),
                1e-4)) / k_smooth

        mapped = jnp.dot(p, b_ref[:], preferred_element_type=f32)
        enc = jnp.concatenate([p, jnp.sin(mapped), jnp.cos(mapped)],
                              axis=-1).astype(cd)
        h = jnp.dot(enc, init_w[:], preferred_element_type=f32) + init_b[:]
        act_enc = act(enc.astype(f32)).astype(cd)
        for i in range(mlp.num_layers):
            if mlp._is_skip_layer(i):
                a = jnp.concatenate([act(h).astype(cd), act_enc], axis=-1)
            else:
                a = act(h).astype(cd)
            h = (jnp.dot(a, layer_refs[2 * i][:],
                         preferred_element_type=f32)
                 + layer_refs[2 * i + 1][:])
        shift = (jnp.dot(act(h).astype(cd), out_w[:],
                         preferred_element_type=f32) + out_b[:])
        return sm + shift

    return sdf_eval


def _build_march_kernel(mlp: SkipConnMLP, k_smooth: float, max_steps: int,
                        epsilon: float, n_weights: int,
                        compute_dtype=jnp.float32, omega: float = 1.0,
                        stable_min: bool = False, bounded: bool = False):
    # state lives in the OUTPUT refs (Mosaic rejects vector-carried
    # scf loops); the early exit is a pl.when skip of the whole body once
    # every lane in the block is resolved — semantically identical to the
    # masked fixed-trip loop because frozen lanes never change.
    # With omega > 1 three VMEM scratch refs carry the overrelaxation
    # state (previous radius, last step, per-lane omega) — see SDF._march.
    from jax.experimental import pallas as pl

    relaxed = omega > 1.0

    def kernel(*refs):
        if bounded:
            # per-ray [start, max] interval rows replace the SMEM scalar
            # (march_bound: rays begin at the bounding-sphere entry and
            # freeze past their own exit)
            ro_ref, rd_ref, t0_ref, mt_ref = refs[:4]
            w_refs = refs[4:4 + n_weights]
        else:
            maxt_ref = refs[0]                   # SMEM scalar
            ro_ref, rd_ref = refs[1], refs[2]
            w_refs = refs[3:3 + n_weights]
        if relaxed:
            depth_ref, hit_ref = refs[-5], refs[-4]
            prev_ref, slen_ref, om_ref = refs[-3], refs[-2], refs[-1]
        else:
            depth_ref, hit_ref = refs[-2], refs[-1]
        sdf_eval = _make_sdf_eval(mlp, k_smooth, w_refs, compute_dtype,
                                  stable_min=stable_min)

        ro = ro_ref[:]
        rd = rd_ref[:]
        max_t = mt_ref[:] if bounded else maxt_ref[0, 0]

        if bounded:
            depth_ref[:] = t0_ref[:]
        else:
            depth_ref[:] = jnp.zeros_like(depth_ref)
        hit_ref[:] = jnp.zeros_like(hit_ref)
        if relaxed:
            prev_ref[:] = jnp.zeros_like(prev_ref)
            slen_ref[:] = jnp.zeros_like(slen_ref)
            om_ref[:] = jnp.full_like(om_ref, omega)

        def body(_, carry):
            depths = depth_ref[:]
            hit = hit_ref[:] > 0.5
            remaining = jnp.logical_not(hit) & (depths < max_t)

            @pl.when(jnp.max(remaining.astype(jnp.float32)) > 0.0)
            def _():
                sd = sdf_eval(ro + rd * depths)
                if relaxed:
                    prev_sd = prev_ref[:]
                    step_len = slen_ref[:]
                    om = om_ref[:]
                    fail = remaining & (om > 1.0) & (
                        (jnp.abs(sd) + jnp.abs(prev_sd) <= step_len)
                        | (sd < -epsilon))
                    hits = (remaining & jnp.logical_not(fail)
                            & (sd <= epsilon))
                    new_step = jnp.where(fail, (1.0 - om) * step_len,
                                         om * sd)
                    om_ref[:] = jnp.where(fail, 1.0, om)
                    still = remaining & jnp.logical_not(hits)
                    depth_ref[:] = jnp.where(still, depths + new_step,
                                             depths)
                    slen_ref[:] = jnp.where(still, new_step, step_len)
                    prev_ref[:] = jnp.where(still, sd, prev_sd)
                else:
                    hits = remaining & (sd <= epsilon)
                    still = remaining & jnp.logical_not(hits)
                    depth_ref[:] = jnp.where(still, depths + sd, depths)
                hit_ref[:] = (hit | hits).astype(jnp.float32)

            return carry

        lax.fori_loop(0, max_steps, body, 0)

    return kernel


def _build_shadow_kernel(mlp: SkipConnMLP, k_smooth: float, max_steps: int,
                         epsilon: float, n_weights: int,
                         compute_dtype=jnp.float32,
                         past_light_exit: bool = False,
                         stable_min: bool = False):
    # exact replica of SDF.intersect_test's loop: depths start at 1e2*eps,
    # strict < hit test, the hit step's distance IS applied, rays marching
    # past max_t keep marching (the reference lets a negative-sdf overshoot
    # pull a ray back).  Early exit only once every live lane has hit;
    # padded / inactive lanes (zero direction) are excluded from the gate
    # so they cannot hold a block hostage — their `remaining` stays True
    # either way, which is exactly the generic loop's outcome for them.
    #
    # ``past_light_exit`` (opt-in, off = exact reference parity): freeze a
    # lane once its depth reaches the per-ray max_t (it reached the light —
    # physically unblocked) and let the block exit when every lane is
    # resolved.  On a true SDF this is result-identical (the march cannot
    # overshoot INTO a surface); it differs from the reference only in the
    # degenerate-field corner where a negative-sdf pullback from beyond the
    # light would re-block the ray.  Most shadow rays in a lit scene never
    # hit, so this turns their 64 fixed steps into ~a handful.
    from jax.experimental import pallas as pl

    def kernel(*refs):
        if past_light_exit:
            ro_ref, rd_ref, mt_ref = refs[0], refs[1], refs[2]
            w_refs = refs[3:3 + n_weights]
        else:
            ro_ref, rd_ref = refs[0], refs[1]
            w_refs = refs[2:2 + n_weights]
        depth_ref, rem_ref = refs[-2], refs[-1]
        sdf_eval = _make_sdf_eval(mlp, k_smooth, w_refs, compute_dtype,
                                  stable_min=stable_min)

        ro = ro_ref[:]
        rd = rd_ref[:]
        valid = (jnp.sum(jnp.abs(rd), axis=-1, keepdims=True) > 0.0)

        depth_ref[:] = jnp.full_like(depth_ref, 1e2 * epsilon)
        rem_ref[:] = jnp.ones_like(rem_ref)

        def body(_, carry):
            depths = depth_ref[:]
            remaining = rem_ref[:] > 0.5
            if past_light_exit:
                live = remaining & (depths < mt_ref[:])
            else:
                live = remaining

            @pl.when(jnp.max((live & valid).astype(jnp.float32)) > 0.0)
            def _():
                sd = sdf_eval(ro + rd * depths)
                hits = live & (sd < epsilon)
                depth_ref[:] = jnp.where(live, depths + sd, depths)
                rem_ref[:] = (remaining & jnp.logical_not(hits)).astype(
                    jnp.float32)

            return carry

        lax.fori_loop(0, max_steps, body, 0)

    return kernel


def _build_minscan_kernel(mlp: SkipConnMLP, k_smooth: float, steps: int,
                          n_weights: int, compute_dtype=jnp.float32,
                          unroll: int = None, stable_min: bool = False):
    if unroll is None:
        # experiment knob: larger unroll = bigger matmuls per iteration
        # (4 -> 2048-row at block 512); 4 measured best in r2, kept tunable
        import os
        unroll = int(os.environ.get("NRT_MINSCAN_UNROLL", "4"))
    # the scan's evaluations are independent, so ``unroll`` steps are
    # stacked into one (unroll*B)-row MLP evaluation per iteration —
    # larger matmuls pipeline much better on the MXU than 512-row ones.
    # The min/argmin update replays the unrolled steps in order, keeping
    # the sequential scan's earliest-strict-min semantics exactly.
    while steps % unroll:
        unroll -= 1

    def kernel(*refs):
        step_ref = refs[0]                       # SMEM scalar
        ro_ref, rd_ref = refs[1], refs[2]
        w_refs = refs[3:3 + n_weights]
        idx_ref, mn_ref = refs[-2], refs[-1]     # output, VMEM scratch
        sdf_eval = _make_sdf_eval(mlp, k_smooth, w_refs, compute_dtype,
                                  stable_min=stable_min)

        ro = ro_ref[:]
        rd = rd_ref[:]
        rows = ro.shape[0]
        stepsz = step_ref[0, 0]

        idx_ref[:] = jnp.zeros_like(idx_ref)
        mn_ref[:] = sdf_eval(ro)

        def body(i, carry):
            base = (i * unroll).astype(jnp.float32)
            p = jnp.concatenate(
                [ro + (stepsz * (base + float(u + 1))) * rd
                 for u in range(unroll)], axis=0)
            sd_all = sdf_eval(p)
            mn = mn_ref[:]
            idx = idx_ref[:]
            for u in range(unroll):
                fi = base + float(u + 1)
                sd = sd_all[u * rows:(u + 1) * rows]
                idx = jnp.where(sd < mn, fi, idx)
                mn = jnp.minimum(mn, sd)
            idx_ref[:] = idx
            mn_ref[:] = mn
            return carry

        lax.fori_loop(0, steps // unroll, body, 0)

    return kernel


def _pad_rays(r_o, r_d, block_rows):
    # the kernels have no autodiff rules and their outputs are no-grad by
    # contract — sever ALL input tangents (rays may be differentiated:
    # learnable camera poses, shadow origins at it.p) or linearization of
    # an enclosing grad fails on the pallas_call
    flat_o = lax.stop_gradient(r_o).reshape(-1, 3)
    flat_d = lax.stop_gradient(r_d).reshape(-1, 3)
    n = flat_o.shape[0]
    n_pad = max(-(-n // block_rows) * block_rows, block_rows)
    # padded rays start far outside every surface: the march resolves them
    # on its first step so they never hold a block's early-exit back
    flat_o = jnp.pad(flat_o, ((0, n_pad - n), (0, 0)), constant_values=1e6)
    flat_d = jnp.pad(flat_d, ((0, n_pad - n), (0, 0)))
    return flat_o, flat_d, n, n_pad


def _specs(block_rows, weights, n_scalars=1):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    row = lambda width: pl.BlockSpec((block_rows, width), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    full = lambda w: pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                                  memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    in_specs = ([smem] * n_scalars + [row(3), row(3)]
                + [full(w) for w in weights])
    return row, in_specs


def fused_march(module, params, r_o, r_d, max_t, *, max_steps: int,
                epsilon: float, block_rows: int = 512,
                compute_dtype=jnp.float32, omega: float = 1.0,
                interpret: bool = False, t_start=None):
    """Whole-march kernel. Returns (depths [...], hit [...]) — no grads.

    ``t_start`` (optional, per-ray): bounded mode — the march begins at
    ``t_start`` and ``max_t`` is per-ray (SDF.march_bound interval clip);
    rays whose interval is empty (start >= max) resolve on entry.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    params = lax.stop_gradient(params)
    batches = r_o.shape[:-1]
    flat_o, flat_d, n, n_pad = _pad_rays(r_o, r_d, block_rows)
    weights = (_sphere_weight_arrays(params)
               + _mlp_weight_arrays(params["shift"], compute_dtype))
    bounded = t_start is not None

    scratch = []
    if omega > 1.0:
        scratch = [pltpu.VMEM((block_rows, 1), jnp.float32)] * 3
    if bounded:
        row, in_specs = _specs(block_rows, weights, n_scalars=0)
        in_specs = in_specs[:2] + [row(1), row(1)] + in_specs[2:]
        t0 = lax.stop_gradient(
            jnp.broadcast_to(jnp.asarray(t_start, jnp.float32), batches))
        mt = lax.stop_gradient(
            jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), batches))
        # padded lanes: empty interval -> resolved immediately
        flat_t0 = jnp.pad(t0.reshape(-1, 1), ((0, n_pad - n), (0, 0)))
        flat_mt = jnp.pad(mt.reshape(-1, 1), ((0, n_pad - n), (0, 0)))
        inputs = [flat_o, flat_d, flat_t0, flat_mt]
    else:
        row, in_specs = _specs(block_rows, weights)
        maxt = lax.stop_gradient(
            jnp.asarray(max_t, jnp.float32)).reshape(1, 1)
        inputs = [maxt, flat_o, flat_d]
    depths, hit = pl.pallas_call(
        _build_march_kernel(module.shift, module.k, max_steps, epsilon,
                            len(weights), compute_dtype, omega,
                            stable_min=getattr(module, "stable_min", False),
                            bounded=bounded),
        grid=(n_pad // block_rows,),
        in_specs=in_specs,
        out_specs=[row(1), row(1)],
        out_shape=[jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs, *weights)
    return (depths[:n, 0].reshape(batches),
            hit[:n, 0].reshape(batches) > 0.5)


def fused_shadow_march(module, params, r_o, r_d, max_t, *, max_steps: int,
                       epsilon: float, block_rows: int = 512,
                       compute_dtype=jnp.float32, interpret: bool = False,
                       past_light_exit: bool = False):
    """Whole shadow-march kernel. Returns not_blocked [...] — no grads."""
    from jax.experimental import pallas as pl

    params = lax.stop_gradient(params)
    batches = r_o.shape[:-1]
    max_t = lax.stop_gradient(
        jnp.broadcast_to(jnp.asarray(max_t, jnp.float32), batches))
    flat_o, flat_d, n, n_pad = _pad_rays(r_o, r_d, block_rows)
    weights = (_sphere_weight_arrays(params)
               + _mlp_weight_arrays(params["shift"], compute_dtype))

    row, in_specs = _specs(block_rows, weights, n_scalars=0)
    inputs = [flat_o, flat_d]
    if past_light_exit:
        # per-ray light distance; padded lanes get 0 -> frozen immediately
        flat_t = jnp.pad(max_t.reshape(-1, 1).astype(jnp.float32),
                         ((0, n_pad - n), (0, 0)))
        in_specs = in_specs[:2] + [row(1)] + in_specs[2:]
        inputs.append(flat_t)
    depths, rem = pl.pallas_call(
        _build_shadow_kernel(module.shift, module.k, max_steps, epsilon,
                             len(weights), compute_dtype,
                             past_light_exit=past_light_exit,
                             stable_min=getattr(module, "stable_min",
                                                False)),
        grid=(n_pad // block_rows,),
        in_specs=in_specs,
        out_specs=[row(1), row(1)],
        out_shape=[jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)],
        interpret=interpret,
    )(*inputs, *weights)
    depths = depths[:n, 0].reshape(batches)
    remaining = rem[:n, 0].reshape(batches) > 0.5
    return lax.stop_gradient((depths >= max_t) | remaining)


def fused_min_scan(module, params, r_o, r_d, step_size, *, steps: int,
                   block_rows: int = 512, compute_dtype=jnp.float32,
                   interpret: bool = False):
    """Whole min-scan kernel. Returns argmin step index [...] as f32 — the
    differentiable SDF evaluation at the argmin point stays with the caller
    (SDF.throughput), preserving the reference's gradient structure."""
    from jax.experimental import pallas as pl

    params = lax.stop_gradient(params)
    batches = r_o.shape[:-1]
    flat_o, flat_d, n, n_pad = _pad_rays(r_o, r_d, block_rows)
    weights = (_sphere_weight_arrays(params)
               + _mlp_weight_arrays(params["shift"], compute_dtype))
    stepsz = lax.stop_gradient(
        jnp.asarray(step_size, jnp.float32)).reshape(1, 1)

    from jax.experimental.pallas import tpu as pltpu

    row, in_specs = _specs(block_rows, weights)
    idx = pl.pallas_call(
        _build_minscan_kernel(module.shift, module.k, steps, len(weights),
                              compute_dtype,
                              stable_min=getattr(module, "stable_min",
                                                 False)),
        grid=(n_pad // block_rows,),
        in_specs=in_specs,
        out_specs=row(1),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_rows, 1), jnp.float32)],
        interpret=interpret,
    )(stepsz, flat_o, flat_d, *weights)
    return lax.stop_gradient(idx[:n, 0].reshape(batches))
