"""Storage seam: Iceberg catalog when available, parquet+manifest else.

BASELINE.json's north rule states the engine runs "over Iceberg tables"
— the properties it actually relies on are (a) atomic snapshot commits
(the distributed analogue of the reference's delete-and-rename commit,
``InvertedIndexManager.java:1062-1131``), (b) scan-time predicate
pushdown / file pruning on the ``term`` column, and (c) a resumable
write unit. This module is the ONE place that decides how those are
provided:

* **iceberg** mode — used when the Iceberg Spark runtime jar is on the
  session classpath (probed via the JVM, never imported blindly). A
  Hadoop-type catalog is configured against ``root`` and every table
  write is an Iceberg snapshot commit; readers get pushdown + pruning
  from the Iceberg source, plus time travel for free.
* **parquet** mode — the sandbox/shipped fallback (no Iceberg jar is
  baked into this environment): plain parquet directories plus the
  JSON manifest protocol in ``plans.checkpoint`` /
  ``streaming.incremental``, which provides the same commit contract
  at checkpoint-group granularity (data written first, manifest row
  ``os.replace``d last, so a manifest row implies durable data).

Both modes expose the same four calls, so ``checkpoint.py`` and the
jobs never branch on the backend. The active mode is reported in
``BENCH/BASELINE.md``.

To enable iceberg mode on a real cluster::

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
        --conf spark.sql.catalog.pse=org.apache.iceberg.spark.SparkCatalog \
        --conf spark.sql.catalog.pse.type=hadoop \
        --conf spark.sql.catalog.pse.warehouse=<warehouse-uri> ...

or set ``PSE_ICEBERG_JAR`` before ``plans.session.get_spark`` builds
the session.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

CATALOG = "pse"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class TableStore:
    """Uniform read/write surface for the index tables.

    ``root`` is the index directory (parquet mode) or the warehouse
    path (iceberg mode); ``namespace`` isolates one index's tables
    inside a shared catalog. Table names use ``/`` for sub-scoping in
    parquet mode (``postings/group=3``) which maps to a partition
    predicate in iceberg mode.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        namespace: str = "idx",
        mode: str | None = None,
    ):
        self.spark = spark
        self.root = root
        self.namespace = namespace
        if mode is None:
            mode = "iceberg" if iceberg_available(spark) else "parquet"
        if mode == "iceberg" and not iceberg_available(spark):
            raise RuntimeError("iceberg mode requested but runtime jar absent")
        self.mode = mode
        if mode == "iceberg":
            conf = spark.conf
            conf.set(f"spark.sql.catalog.{CATALOG}",
                     "org.apache.iceberg.spark.SparkCatalog")
            conf.set(f"spark.sql.catalog.{CATALOG}.type", "hadoop")
            conf.set(f"spark.sql.catalog.{CATALOG}.warehouse", root)
            spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {CATALOG}.{namespace}")

    # -- identifiers --------------------------------------------------------

    def _ident(self, name: str) -> str:
        return f"{CATALOG}.{self.namespace}.{name}"

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    # -- surface ------------------------------------------------------------

    def write(self, df: DataFrame, name: str, *, partition_by: list[str] | None = None) -> None:
        """Overwrite-commit ``df`` as table ``name``. Iceberg: one
        atomic snapshot commit. Parquet: directory overwrite (callers
        that need atomicity at a coarser unit use the manifest
        protocol on top, writing data before the manifest row)."""
        if self.mode == "iceberg":
            w = df.writeTo(self._ident(name)).using("iceberg")
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
        else:
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(self._path(name))

    def append(self, df: DataFrame, name: str) -> None:
        """Append-commit (iceberg: snapshot append; parquet: new files
        into the directory)."""
        if self.mode == "iceberg":
            # branch on existence rather than try/except: a transient
            # append failure (permissions, commit conflict, schema
            # mismatch) must surface as itself, not as a confusing
            # "table already exists" from a fallback create()
            if self.exists(name):
                df.writeTo(self._ident(name)).append()
            else:
                df.writeTo(self._ident(name)).using("iceberg").create()
        else:
            df.write.mode("append").parquet(self._path(name))

    def write_partition(self, df: DataFrame, name: str, part_col: str, part_val) -> None:
        """Idempotent overwrite of ONE partition of ``name`` — the
        per-checkpoint-group commit unit. Replaying a crashed group
        rewrites exactly its own partition. Iceberg: dynamic partition
        overwrite (snapshot commit); parquet: overwrite of the
        ``name/part_col=val`` directory."""
        from pyspark.sql import functions as F

        if self.mode == "iceberg":
            out = df.withColumn(part_col, F.lit(part_val))
            ident = self._ident(name)
            if not self.exists(name):
                out.writeTo(ident).using("iceberg").partitionedBy(
                    F.col(part_col)
                ).create()
            else:
                out.writeTo(ident).overwritePartitions()
        else:
            df.write.mode("overwrite").parquet(
                self._path(f"{name}/{part_col}={part_val}")
            )

    def read(self, name: str) -> DataFrame:
        if self.mode == "iceberg":
            return self.spark.table(self._ident(name))
        return self.spark.read.option("basePath", self._path(name)).parquet(
            self._path(name)
        )

    def exists(self, name: str) -> bool:
        if self.mode == "iceberg":
            return self.spark.catalog.tableExists(self._ident(name))
        return os.path.isdir(self._path(name))
