"""Custom stateful streaming operator: event sessionization with a
gap timeout, via ``applyInPandasWithState``.

The classic operator Spark's built-in windowed aggregations can't
express declaratively for arbitrary outputs: group events per user
into SESSIONS — maximal runs where consecutive events are no more
than ``gap`` apart — while events arrive across micro-batches. Open
sessions must survive batch boundaries, which is exactly what
per-group state is for.

Mechanics (honest state, not a batch job in disguise):

* the event stream is staged as MULTIPLE files read with
  ``maxFilesPerTrigger=1``, so sessions genuinely span micro-batches
  and the handler proves it carries (session_start, last_ts, n)
  forward in ``GroupState``;
* per (user_id) group and batch, the handler sorts the batch's rows,
  folds them into the carried state, and emits a SNAPSHOT row for
  every session it touched (closed or still open). The sink is a
  memory table in update mode; the final answer keeps each
  (user_id, session_start)'s last snapshot — max(n_events) — making
  replayed/extended snapshots idempotent;
* timestamps travel as epoch MICROSECONDS (exact int64 arithmetic —
  no float or truncation disagreements with the SQL oracle).

Scale posture: state is O(open sessions) = O(active users), the
textbook stateful-streaming budget; each micro-batch shuffles only
its own rows (hash on user_id), and snapshots are metadata-sized.
The DuckDB oracle is the standard gaps-and-islands rewrite (lag +
running sum over the same microsecond integers), so the stateful
path is value-hash-gated against relational semantics.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SNAPSHOT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start_us", LongType()),
    StructField("session_end_us", LongType()),
    StructField("n_events", LongType()),
])
STATE_SCHEMA = StructType([
    StructField("session_start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n_events", LongType()),
])


def _session_fold(gap_us: int):
    def fold(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts = (
            pd.concat(list(pdfs), ignore_index=True)["ts_us"]
            .sort_values()
            .to_list()
        )
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        out: list[tuple[int, int, int, int]] = []
        for t in ts:
            t = int(t)
            if start is None:
                start, last, n = t, t, 1
                continue
            if t < last:
                # the fold's correctness rests on micro-batches arriving
                # in event-time order (the mtime-ordered file staging in
                # sessionize_events); an older event would silently
                # rewind last_us and corrupt session_end/n_events — fail
                # loudly instead
                raise ValueError(
                    f"out-of-order micro-batch for user {user_id}: event at "
                    f"{t} us predates carried session end {last} us — the "
                    "event-time-ordered staging invariant was violated"
                )
            if t - last > gap_us:
                out.append((int(user_id), start, last, n))  # closed
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        if start is not None:
            out.append((int(user_id), start, last, n))      # open snapshot
            state.update((start, last, n))
        yield pd.DataFrame(
            out, columns=["user_id", "session_start_us", "session_end_us", "n_events"]
        )

    return fold


def sessionize_events(
    spark: SparkSession,
    events_path: str,
    *,
    gap_minutes: int = 360,
    n_batches: int = 2,
) -> DataFrame:
    """Sessionize the events parquet through a real multi-micro-batch
    Structured Streaming run. Returns the final session table
    (user_id, session_start_us, session_end_us, n_events) as a BATCH
    DataFrame (the deduped snapshot view)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    static = spark.read.parquet(events_path)
    # stage the input as n_batches files split on a deterministic TIME
    # boundary, so micro-batch order == event-time order and open
    # sessions must cross the boundary
    bounds = [
        r[0]
        for r in static.select(
            F.percentile_approx(
                F.unix_micros(F.col("ts").cast("timestamp")),
                [i / n_batches for i in range(1, n_batches)],
                10_000,
            ).alias("p")
        )
        .select(F.explode("p"))
        .collect()
    ]
    src_dir = tempfile.mkdtemp(prefix="pse_sessionize_src_")
    ev = static.withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    ).select("user_id", "ts_us")
    lo = None
    for i, hi in enumerate(bounds + [None]):
        part = ev
        if lo is not None:
            part = part.filter(F.col("ts_us") > lo)
        if hi is not None:
            part = part.filter(F.col("ts_us") <= hi)
        # one file per batch directory entry; coalesce(1) is fine —
        # this is test staging, not the production write path
        part.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src_dir, f"b{i}")
        )
        lo = hi
    # flatten: file source wants one directory of files. Copies (not
    # symlinks) with strictly increasing mtimes — the file source
    # orders by modification time, and the fold relies on micro-batch
    # order == event-time order.
    import shutil
    import time as _time

    flat = tempfile.mkdtemp(prefix="pse_sessionize_flat_")
    k = 0
    t0 = _time.time() - 3600
    for i in range(n_batches):
        d = os.path.join(src_dir, f"b{i}")
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                dst = os.path.join(flat, f"{i:03d}_{k}.parquet")
                shutil.copyfile(os.path.join(d, f), dst)
                os.utime(dst, (t0 + k * 10, t0 + k * 10))
                k += 1

    stream = (
        spark.readStream.schema("user_id long, ts_us long")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(flat)
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _session_fold(gap_minutes * 60 * 1_000_000),
        outputStructType=SNAPSHOT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = "pse_sessions_" + uuid.uuid4().hex[:8]
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="pse_sess_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # final view: last snapshot per session = the max-n_events row
    snap = spark.table(name)
    return (
        snap.groupBy("user_id", "session_start_us")
        .agg(
            F.max("session_end_us").alias("session_end_us"),
            F.max("n_events").alias("n_events"),
        )
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )
