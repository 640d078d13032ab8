"""Isolated timing of HashEncoding gather variants on the real chip.

r5 found the 'stacked single-gather' rewrite of the hash-table lookup
measured 3.5x SLOWER at the flagship hash train step (5.67 vs 1.62
s/step, /tmp/r5q/hash_time_q2.log vs results/logs_r5/arm_hash.log) —
this microbench times the encoding fwd+bwd in isolation, chained like
the march uses it (96 sequential evals), syncing on a host transfer
(the only honest sync through the axon tunnel — CLAUDE.md).

    python scripts/bench_hash_gather.py [--rays 38400] [--steps 96]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from _common import enable_compile_cache


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rays", type=int, default=38400)
    ap.add_argument("--steps", type=int, default=96,
                    help="chained encoding evals per timed call (the "
                         "flagship march depth)")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_compile_cache()

    from neural_raytracing_tpu.nn.hash_encoding import HashEncoding

    kw = dict(levels=16, table_size_log2=14, features=2,
              base_resolution=16, max_resolution=512, bound=2.0)
    p = jax.random.uniform(jax.random.PRNGKey(1), (args.rays, 3),
                           minval=-1.0, maxval=1.0)

    for name, enc in (("loop", HashEncoding(**kw)),
                      ("stacked", HashEncoding(stacked=True, **kw))):
        params = enc.init(jax.random.PRNGKey(0))

        def loss(prm, pts):
            # remat per step: 96 chained evals' saved gathers OOM a v5e
            # otherwise (the march itself runs under stop_gradient, so
            # the real workload never stores them either)
            @jax.checkpoint
            def body(carry, _):
                out = enc(prm, carry)
                # feed a (rays,3) slice back in so the evals CHAIN (no
                # dispatch-only measurement through the tunnel)
                return carry + 1e-6 * out[..., :3], jnp.sum(out)
            _, sums = jax.lax.scan(body, pts, None, length=args.steps)
            return jnp.sum(sums)

        # fwd+bwd (shading-style: gather fwd + scatter-add table grads)
        # vs fwd-only (march-style: the 96 in-march evals run under
        # stop_gradient in the real workload) — separates "gather is
        # slow" from "the scatter-add backward is slow" on this chip.
        arms = (("fwd+bwd", jax.jit(jax.value_and_grad(loss))),
                ("fwd", jax.jit(loss)))
        for arm, step in arms:
            out = step(params, p)       # compile
            v = out[0] if isinstance(out, tuple) else out
            float(np.asarray(v))        # host-transfer sync
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = step(params, p)
            v = out[0] if isinstance(out, tuple) else out
            float(np.asarray(v))
            if isinstance(out, tuple):
                float(np.asarray(
                    jax.tree_util.tree_leaves(out[1])[0].ravel()[0]))
            dt = (time.perf_counter() - t0) / args.reps
            per_eval = dt / args.steps * 1e3
            print(f"{name:8s} {dt*1e3:8.2f} ms/call  {per_eval:6.3f} "
                  f"ms/eval ({args.rays} rays x {args.steps} chained "
                  f"evals, {arm})")


if __name__ == "__main__":
    main()
