"""peterman_search_engine_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch rebuild of the capabilities of the reference engine
(YuehWu1994/Peterman-Search-Engine, a single-node Java LSM inverted
index — see SURVEY.md) re-expressed Spark-first: DataFrame/SQL logical
plans, Catalyst/Tungsten physical execution, Arrow-vectorized pandas
UDFs only where built-ins cannot express the semantics (codec bytes,
Porter stemming).

Layout
------
functions/   scan-side scalar/text functions (analyzer, stemmer, codec,
             text statistics) — SURVEY.md §2.1 (A1-A7) + codec (B5-B7)
operators/   index build/maintenance + query operators — §2.2 (B1-B4),
             §2.3 (Q1-Q17), plus training-data-pipeline operators
             (dedup, similarity search, multimodal plumbing)
sources/     deterministic transcript/corpus generators and adapters
plans/       session config, per-partition checkpoint/lineage manifest,
             metrics
streaming/   incremental index maintenance via Structured Streaming
oracle/      pure-Python single-node re-implementation of the reference
             semantics, used as the pytest correctness oracle
"""

__version__ = "0.1.0"
