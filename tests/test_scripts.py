"""Tests for the experiment-script helpers (scripts/_common.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from _common import chunk_for, metrics_path_for  # noqa: E402


def test_metrics_path_for_refuses_overwrite(tmp_path):
    out = str(tmp_path)
    p1 = metrics_path_for(out, "run")
    assert p1.endswith("metrics_run.jsonl")
    # empty file -> still claimable
    open(p1, "w").close()
    assert metrics_path_for(out, "run") == p1
    # non-empty curve -> a fresh suffixed path, never the original
    with open(p1, "w") as f:
        f.write('{"step": 0}\n')
    p2 = metrics_path_for(out, "run")
    assert p2 != p1 and p2.endswith("metrics_run-1.jsonl")
    with open(p2, "w") as f:
        f.write('{"step": 0}\n')
    assert metrics_path_for(out, "run").endswith("metrics_run-2.jsonl")


def test_chunk_for_divides():
    for size in (64, 100, 200, 256, 300):
        c = chunk_for(size)
        assert size % c == 0 and c <= 128


def test_mirror_plate_gt_scene():
    """--mirror-plate appends a conductor plate under the object and the
    _ZGate forces the conductor lobe on below the plate top (the
    interreflection GT for the Path-vs-Direct demonstration)."""
    import jax
    import numpy as np

    from make_mesh_dataset import MESHES, build_gt_scene

    base_verts, _ = MESHES["gear"]()
    scene = build_gt_scene("gear", light_scale=1.0, material="variety",
                           mirror_plate=0.8)
    verts = np.asarray(scene.shape.verts)
    assert len(verts) == len(base_verts) + 8          # plate box appended
    assert float(verts[:, 0].max()) >= 0.8 - 1e-6     # plate extent
    params = scene.init(jax.random.PRNGKey(0))
    zmin = float(base_verts[:, 2].min())
    below = np.asarray([[0.5, 0.0, zmin - 0.006]], np.float32)
    above = np.asarray([[0.0, 0.0, zmin + 0.3]], np.float32)
    w_b, _ = scene.bsdf.normalized_weights(params["bsdf"], below)
    w_a, _ = scene.bsdf.normalized_weights(params["bsdf"], above)
    w_b, w_a = np.asarray(w_b)[0], np.asarray(w_a)[0]
    assert w_b[-1] > 0.99 and w_b[:-1].max() < 0.01   # conductor only
    assert w_a[-1] < 0.6                              # gate off above
