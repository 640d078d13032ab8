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
