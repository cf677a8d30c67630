"""applyInPandasWithState sessionization: state must survive
micro-batch boundaries, and the result must equal the relational
gaps-and-islands computation."""

import os

import pytest
from pyspark.sql import functions as F

from peterman_search_engine_spark.streaming.sessionize import sessionize_events


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    # user 0: one 5-event session straddling the global median ts, so
    # the open session MUST be carried in GroupState across batches;
    # user 1: two clearly separated sessions.
    base = 1_700_000_000_000_000  # epoch us
    hour = 3_600 * 1_000_000
    rows = []
    for i in range(5):
        rows.append((i, base + i * hour, 0))          # one long session
    rows.append((10, base - 50 * hour, 1))            # early singleton
    rows.append((11, base + 50 * hour, 1))            # late singleton
    path = str(tmp_path_factory.mktemp("sess") / "events.parquet")
    (
        spark.createDataFrame(rows, "event_id long, ts_us long, user_id long")
        .select(
            "event_id",
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
            "user_id",
        )
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def test_session_spans_batches(spark, events_path):
    got = sessionize_events(
        spark, events_path, gap_minutes=120, n_batches=2
    ).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 0: ONE session of 5 events despite the 2-batch split
    assert len(by_user[0]) == 1
    s = by_user[0][0]
    assert s["n_events"] == 5
    assert s["session_end_us"] - s["session_start_us"] == 4 * 3_600 * 1_000_000
    # user 1: two singleton sessions
    assert sorted(r["n_events"] for r in by_user[1]) == [1, 1]


def test_gap_boundary_inclusive(spark, tmp_path):
    # events exactly `gap` apart stay in ONE session (strict > closes)
    base = 1_700_000_000_000_000
    gap_us = 60 * 60 * 1_000_000
    rows = [(0, base, 0), (1, base + gap_us, 0), (2, base + 2 * gap_us + 1, 0)]
    path = str(tmp_path / "events.parquet")
    (
        spark.createDataFrame(rows, "event_id long, ts_us long, user_id long")
        .select("event_id", F.timestamp_micros(F.col("ts_us")).alias("ts"), "user_id")
        .write.parquet(path)
    )
    got = sorted(
        sessionize_events(spark, path, gap_minutes=60, n_batches=2).collect(),
        key=lambda r: r["session_start_us"],
    )
    assert [r["n_events"] for r in got] == [2, 1]


class _FakeState:
    """Minimal GroupState stand-in for driving _session_fold directly."""

    def __init__(self, value=None):
        self._value = value

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v


def test_fold_rejects_out_of_order_batches():
    """ADVICE r3: an event older than the carried session end must fail
    loudly (the staging invariant was violated) instead of silently
    rewinding last_us and corrupting session_end/n_events."""
    import pandas as pd

    from peterman_search_engine_spark.streaming.sessionize import _session_fold

    fold = _session_fold(gap_us=1_000_000)
    state = _FakeState((100, 200, 2))  # carried session ends at t=200
    stale = pd.DataFrame({"ts_us": [50]})  # predates carried last_us
    with pytest.raises(ValueError, match="out-of-order micro-batch"):
        list(fold((7,), iter([stale]), state))
    # in-order continuation still folds fine
    state2 = _FakeState((100, 200, 2))
    ok = pd.DataFrame({"ts_us": [300]})
    [out] = list(fold((7,), iter([ok]), state2))
    assert out.iloc[0]["n_events"] == 3 and out.iloc[0]["session_end_us"] == 300
