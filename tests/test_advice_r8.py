"""Regression tests for the round-8 ADVICE items: streaming-funnel
state eviction, hits/hits_exact entry validation, conformal_report
NULL-qhat coverage, and the documented target_encode NULL-target
inference behavior."""

import pytest


class _FakeState:
    """Minimal GroupState stand-in for unit-testing _funnel_group."""

    def __init__(self, value=None, wm_ms=0, timed_out=False):
        self._value = value
        self._wm_ms = wm_ms
        self.hasTimedOut = timed_out
        self.timeout_set = None
        self.removed = False

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None
        self.removed = True

    def getCurrentWatermarkMs(self):
        return self._wm_ms

    def setTimeoutTimestamp(self, ms):
        self.timeout_set = ms


def _batch(rows):
    import pandas as pd

    return [pd.DataFrame(rows, columns=["step_idx", "us"])]


W_US = 86400 * 1_000_000


def test_funnel_state_without_anchors_registers_timeout():
    """ADVICE r8 (medium): a user with only step>0 events must still get
    an event-time timeout, or its buffered state lives forever."""
    from weaviate_txtai_spark.streaming.funnel import _funnel_group

    st = _FakeState(wm_ms=1_000)
    list(
        _funnel_group(
            ("u1",), _batch([(1, 5_000_000), (2, 6_000_000)]), st,
            n_steps=3, window_us=W_US,
        )
    )
    assert st.exists, "non-anchor events within horizon must be kept"
    assert st.timeout_set is not None, "kept state must carry a timeout"
    # the sweep fires once the newest event can no longer serve any
    # anchor: (max_us + window) past -> events fall out of `kept`
    assert st.timeout_set == (6_000_000 + W_US) // 1000 + 1
    # timeouts must be strictly after the current watermark
    assert st.timeout_set > st.getCurrentWatermarkMs()


def test_funnel_state_swept_on_timeout():
    """When the anchor-less timeout fires, the state is removed."""
    from weaviate_txtai_spark.streaming.funnel import _funnel_group

    seal_ms = (6_000_000 + W_US) // 1000 + 1
    st = _FakeState(
        value=([1, 2], [5_000_000, 6_000_000]),
        wm_ms=seal_ms,
        timed_out=True,
    )
    out = list(_funnel_group(("u1",), [], st, n_steps=3, window_us=W_US))
    assert st.removed and not st.exists
    assert not out  # no anchors -> nothing to emit


def test_funnel_anchor_timeout_unchanged():
    """Anchored state keeps the earliest-anchor seal time (the original
    behavior the fix must not disturb)."""
    from weaviate_txtai_spark.streaming.funnel import _funnel_group

    st = _FakeState(wm_ms=1_000)
    list(
        _funnel_group(
            ("u1",), _batch([(0, 3_000_000), (0, 9_000_000)]), st,
            n_steps=3, window_us=W_US,
        )
    )
    assert st.timeout_set == (3_000_000 + W_US) // 1000 + 1


def test_hits_rejects_zero_iterations(spark):
    from weaviate_txtai_spark.operators.graph import hits, hits_exact

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="n_iter"):
        hits(df, n_iter=0)
    with pytest.raises(ValueError, match="n_iter"):
        hits_exact(df, n_iter=0)


def test_hits_exact_rejects_small_scale(spark):
    from weaviate_txtai_spark.operators.graph import hits_exact

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="scale"):
        hits_exact(df, scale=100_000)


def test_conformal_report_null_coverage_when_uncertifiable(spark):
    """ADVICE r8: k > n_cal makes qhat NULL — coverage must be NULL too,
    not a misleading 0.0."""
    from weaviate_txtai_spark.operators.conformal import conformal_report

    rows = [(1.0, 1.1, True), (2.0, 2.2, True), (3.0, 3.0, False)]
    df = spark.createDataFrame(
        rows, "pred double, actual double, cal boolean"
    )
    r = conformal_report(df, "pred", "actual", cal_col="cal", alpha=0.1
                         ).collect()[0]
    assert r["qhat"] is None
    assert r["coverage"] is None
    assert r["n_eval"] == 1


def test_target_encode_null_target_rows_still_scored(spark):
    """Documented inference behavior: NULL-target rows are excluded
    from FITTING but still receive their (category, fold) encoding."""
    from weaviate_txtai_spark.operators.encoding import target_encode

    rows = [
        (1, "a", 1.0, 0),
        (2, "a", 0.0, 1),
        (3, "a", None, 0),  # inference row: encoded from fold-0 mapping
        (4, None, 1.0, 0),  # no category -> NULL encoding
    ]
    df = spark.createDataFrame(
        rows, "id long, cat string, y double, fold int"
    )
    out = {
        r["id"]: r["te"]
        for r in target_encode(
            df, "cat", "y", fold_col="fold", n_folds=2, smoothing=0.0
        ).collect()
    }
    assert out[3] is not None  # scored like any inference row
    assert out[4] is None  # NULL category has no mapping key
    # fold-0 rows see only fold-1's data: mean({0.0}) = 0.0
    assert out[1] == 0.0 and out[3] == 0.0
    # fold-1 row sees only fold-0's fitted data: mean({1.0}) = 1.0
    assert out[2] == 1.0
