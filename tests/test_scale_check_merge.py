"""SCALE_CHECK bookkeeping guards (VERDICT r9 task 3): the scale-check
tool must read-merge-write so sections it didn't re-measure (tail_4x)
survive a full re-run, and the committed SCALE_CHECK.json must actually
contain every section SCALING.md cites."""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_merge_write_preserves_unmeasured_sections(tmp_path):
    from scale_check import merge_write

    path = str(tmp_path / "SCALE_CHECK.json")
    merge_write(path, {"cases": {"a": 1}, "tail_4x": {"x": {"t_1x": 1.0}}})
    # a later full re-measure that does NOT include tail_4x
    merged = merge_write(path, {"cases": {"a": 2}, "skew": {}})
    assert merged["tail_4x"] == {"x": {"t_1x": 1.0}}
    assert merged["cases"] == {"a": 2}
    on_disk = json.load(open(path))
    assert set(on_disk) == {"cases", "tail_4x", "skew"}


def test_committed_scale_check_has_tail_4x():
    blob = json.load(open(os.path.join(REPO, "SCALE_CHECK.json")))
    assert "tail_4x" in blob, (
        "SCALE_CHECK.json lost the tail_4x section SCALING.md cites"
    )
    for case in (
        "customer_affinity", "dedup_prefix_jaccard",
        "source_drift_jsd", "threshold_join_bucketed",
    ):
        assert case in blob["tail_4x"]
        assert {"t_1x", "t_2x", "t_4x", "r21", "r42"} <= set(
            blob["tail_4x"][case]
        )
