"""Corpus adapters: any input table -> the canonical corpus shape
``(doc_id long, text string)``.

docID semantics carried from the reference: dense int assigned in
insertion order (``InvertedIndexManager.java:60, 194-197``). For
transcripts, insertion order is the stable (conv_id, turn_idx)
ordering mandated by the north star; the dense id is materialized ONCE
(one global sort) and reused everywhere — this removes the reference's
segment-renumbering hazard (SURVEY.md §2.4).

At 100 TB the global ``row_number`` over one window is the wrong tool
(single-partition window). ``docmap`` therefore uses the scalable
two-level scheme: sort partitions by range, count rows per partition,
prefix-sum the counts driver-side (tiny), and add the per-partition
base to a partition-local row number — one range shuffle total, no
single-reducer stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def corpus_from_transcripts(transcripts: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, ..., text) -> (doc_id, text) with dense
    doc_id in stable (conv_id, turn_idx) order."""
    return assign_dense_doc_ids(transcripts, ["conv_id", "turn_idx"]).select(
        "doc_id", "text"
    )


def corpus_from_documents(documents: DataFrame) -> DataFrame:
    """The driver testdata ``documents`` table already carries a dense
    ``doc_id``; pass it through."""
    return documents.select(F.col("doc_id").cast("long").alias("doc_id"), "text")


def assign_dense_doc_ids(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """Dense 0-based ``doc_id`` in ``order_cols`` order, scalably.

    Range-partition by the ordering key, sort within partitions, then
    combine a driver-side prefix sum of partition counts with a
    partition-local row_number. The only wide exchange is the range
    partitioner; no stage ever sees more than one partition of data.

    The ordered layout is ``localCheckpoint``-ed before the counts are
    taken — this is CORRECTNESS, not caching: the range partitioner
    samples its split boundaries with an rdd-id-derived seed, so a
    re-evaluation can place rows in different partitions than the ones
    the counts (and hence the per-partition id bases) were computed
    from, yielding duplicate/skipped doc_ids. The checkpoint pins ONE
    partitioning for both the counts action and every downstream scan.
    (On a multi-executor cluster prefer ``spark.checkpoint`` to a
    reliable dir for fault tolerance; localCheckpoint trades that for
    speed, which is the right call for a single-job build whose retry
    unit is the whole group anyway.)
    """
    ordered = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .localCheckpoint(eager=True)
    )
    with_pid = ordered.withColumn("_pid", F.spark_partition_id())
    # Tiny aggregate: one row per partition.
    counts = {
        r["_pid"]: r["cnt"]
        for r in with_pid.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    bases = {}
    acc = 0
    for pid in sorted(counts):
        bases[pid] = acc
        acc += counts[pid]
    base_col = F.coalesce(
        *[
            F.when(F.col("_pid") == pid, F.lit(base))
            for pid, base in sorted(bases.items())
        ],
        F.lit(0),
    ) if bases else F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        with_pid.withColumn("_rn", F.row_number().over(w) - 1)
        .withColumn("doc_id", (base_col + F.col("_rn")).cast("long"))
        .drop("_pid", "_rn")
    )


def corpus_from_files_dir(spark, path: str) -> DataFrame:
    """B11 ``IcsSearchEngine.writeIndex`` parity: ingest a directory of
    plain-text document files where the NUMERIC FILE NAME is the
    document id (``IcsSearchEngine.java:43-57``; ordering comparator
    ``:170-191`` sorts names numerically). doc_id = int(filename), one
    document per file, whole file contents as the text field."""
    from pyspark.sql import functions as F

    df = spark.read.format("text").option("wholetext", "true").load(
        path + "/*"
    ).withColumn("_file", F.input_file_name())
    name = F.element_at(F.split(F.col("_file"), "/"), -1)
    return df.select(
        F.regexp_extract(name, r"(\d+)", 1).cast("long").alias("doc_id"),
        F.col("value").alias("text"),
    ).filter(F.col("doc_id").isNotNull())
