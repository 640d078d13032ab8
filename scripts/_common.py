"""Shared helpers for the experiment scripts."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force_cpu_if_requested(args):
    if getattr(args, "cpu", False):
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    enable_compile_cache()


def enable_compile_cache(path: str = None):
    """Persistent compilation cache: repeat script runs skip recompiles."""
    import jax
    path = path or os.environ.get("NRT_COMPILE_CACHE",
                                  os.path.expanduser("~/.nrt_jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without the knobs


def save_image(path: str, img) -> None:
    from PIL import Image
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    arr = (np.clip(arr[..., :3], 0.0, 1.0) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def save_plot(expected, got, path: str) -> None:
    """Side-by-side expected/got comparison image (training_utils.py:22-33)."""
    exp = np.clip(np.asarray(expected)[..., :3], 0, 1)
    g = np.clip(np.asarray(got)[..., :3], 0, 1)
    save_image(path, np.concatenate([exp, g], axis=1))


def base_parser(desc: str) -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=desc)
    ap.add_argument("--size", type=int, default=256, help="image size")
    ap.add_argument("--iters", type=int, default=25_000)
    ap.add_argument("--crop-size", type=int, default=80)
    ap.add_argument("--n-views", type=int, default=6)
    ap.add_argument("--outputs", type=str, default="outputs")
    ap.add_argument("--models", type=str, default="models")
    ap.add_argument("--load", action="store_true",
                    help="resume from saved model artifacts")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (8 virtual devices)")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard the view axis over all local devices")
    ap.add_argument("--clip-norm", type=float, default=None,
                    help="optional global gradient-norm clip")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--skip-test", action="store_true")
    ap.add_argument("--eval-march-bound", type=float, default=1.2,
                    help="bounding-sphere march clip for TEST/EVAL scenes "
                         "(0 disables -> exact r3 semantics). Default ON "
                         "since round 4: the per-scene golden gate "
                         "(scripts/verify_march_bound.py) measured "
                         "bit-identical renders (max|delta|=0.0, 16 views, "
                         "4 trained checkpoints incl. both DTU scenes) "
                         "while cutting the 256^2 eval 108.7 -> 79.7 ms. "
                         "TRAINING is untouched (reference parity). Run "
                         "the gate on new scene families before trusting "
                         "the default there, or pass 0.")
    ap.add_argument("--nan-skip", action="store_true",
                    help="skip (not raise on) non-finite-loss steps, like "
                         "the reference's train (training_utils.py:112); "
                         "aborts after 200 consecutive bad steps")
    return ap


def nan_policy(args) -> str:
    return "skip" if getattr(args, "nan_skip", False) else "raise"


def eval_bound(args):
    """-> the eval-scene march_bound (None when disabled via 0).

    Emits a runtime warning when active (ADVICE r4): the bit-identical
    golden gate covered the scene families in results/march_bound_gate.json;
    a NEW family with content near/beyond the r=1.2 sphere would get
    clipped eval marches with no other signal.
    """
    b = getattr(args, "eval_march_bound", 0.0) or 0.0
    if b > 0.0:
        print(f"[eval] march_bound={b} active for TEST/EVAL renders; on a "
              "new scene family run scripts/verify_march_bound.py first, "
              "or pass --eval-march-bound 0 for exact reference semantics",
              file=sys.stderr, flush=True)
    return b if b > 0.0 else None


def fresh_path(path: str) -> str:
    """Collision-proof artifact path: never clobber an existing non-empty
    file (same policy as metrics_path_for; a test-only re-run with the
    default tag must not truncate a multi-hour training curve)."""
    base, ext = os.path.splitext(path)
    k, p = 0, path
    while os.path.exists(p) and os.path.getsize(p) > 0:
        k += 1
        p = f"{base}-{k}{ext}"
    if k:
        print(f"{path} exists; writing to {p}")
    return p


def metrics_path_for(outputs: str, name: str) -> str:
    """Collision-proof metrics curve path.

    A smoke run that reuses a dataset name must never clobber a prior
    (possibly 25k-row) curve: ``flush_metrics`` rewrites its file with
    ``"w"`` on every flush, so resolving the path once at process start
    and refusing to reuse an existing non-empty file makes overwrites
    impossible (round-2 post-mortem: a 60-step DP smoke erased the
    flagship curve at HEAD).
    """
    os.makedirs(outputs, exist_ok=True)
    path = os.path.join(outputs, f"metrics_{name}.jsonl")
    k = 0
    while os.path.exists(path) and os.path.getsize(path) > 0:
        k += 1
        path = os.path.join(outputs, f"metrics_{name}-{k}.jsonl")
    if k:
        print(f"metrics: {name} curve exists; writing to {path}")
    return path



def metrics_writer(outputs: str, name: str):
    """JSONL training-curve writer over a collision-proof path.

    Returns ``(metrics, flush)``: append per-step dicts to ``metrics`` and
    call ``flush()`` at checkpoints / end of run (rewrites the whole file;
    curves are small).  One shared implementation so every workload script
    persists curves the same way (nerf_synthetic / dtu / nerv).
    """
    import json
    path = metrics_path_for(outputs, name)
    metrics: list = []

    def flush():
        os.makedirs(outputs, exist_ok=True)
        with open(path, "w") as f:
            for m in metrics:
                f.write(json.dumps(m) + "\n")

    return metrics, flush

def chunk_for(size: int, cap: int = 128) -> int:
    """Largest render tile <= cap that divides ``size`` (pathtrace asserts
    divisibility; keep tiles >= ~100 px where possible — smaller dispatches
    drown in tunnel latency, CLAUDE.md)."""
    chunk = min(size, cap)
    while size % chunk:
        chunk -= 1
    return chunk
