"""Deterministic synthetic transcript corpus, per FIXTURES.md.

Input shape mandated by BASELINE.json ``input_hint``:
``transcripts(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)``. One row = one turn = one reference
"document" (``storage/Document.java:7-17`` is a single text field).

All generation is seed-fixed (no wall clock, no external data). The
tiny tier embeds the reference's hand-built golden micro-corpora
(FIXTURES.md §1.2) as designated conversations so the reference test
suite's inline golden assertions port directly.
"""

from __future__ import annotations

import datetime as _dt
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions.stopwords import STOP_WORDS

TIERS = {
    "tiny": (8, 6),       # conversations, turns/conv
    "small": (250, 8),
    "medium": (6_000, 10),
    "bench": (60_000, 10),
}

SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), False),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

# Reference golden micro-corpora carried as designated conversations
# (FIXTURES.md §1.2; citations therein).
GOLDEN_CONVS: dict[str, list[str]] = {
    # Team5DocumentFrequencyTest corpus
    "conv000001": [
        "cat dog toy", "cat Dot", "cat dot toy", "cat toy Dog",
        "toy dog cat", "cat Dog", "cat Dog",
    ],
    # Team8TfIdfTest corpus
    "conv000002": [
        "An apple a day keeps a doctor away",
        "One rotten apple spoils the whole barrel",
        "Fortune knocks once at everyone's rotten door",
    ],
    # Team12PhraseSearchTest corpus
    "conv000003": [
        "The University of California, Irvine is a public research "
        "university located in Irvine, California",
        "University of California Irvine is the best university",
        "University education is great",
    ],
    # Team18FlushTest corpus
    "conv000004": ["kitten, bunny", "bunny"],
    # Team7AndSearchTest corpus
    "conv000005": ["cat dog monkey", "hello world", "cat dog "],
}

_CONTENT_ROOTS = [
    "stem", "stems", "stemming", "stemmed", "compute", "computer",
    "computing", "search", "engine", "index", "indexes", "query",
    "queries", "token", "tokens", "document", "documents", "spark",
    "shuffle", "partition", "partitions", "merge", "merged", "merging",
    "segment", "segments", "posting", "postings", "ranking", "ranked",
    "relational", "conditional", "adjustment", "replacement",
    "happiness", "hopefulness", "transcript", "conversation",
    "assistant", "tool", "agent", "latency", "throughput", "cluster",
    "executor", "driver", "memory", "vector", "embedding", "cosine",
    "jaccard", "minhash", "simhash", "fingerprint", "language",
    "quality", "duplicate", "duplicates", "apple", "rotten", "fortune",
    "barrel", "doctor", "kitten", "bunny", "monkey", "elephant",
    "irvine", "california", "university", "research", "public",
]

_PUNCT = [",", ".", ";", "?", "!"]
_STOPS = sorted(STOP_WORDS)


def _gen_rows(tier: str, seed: int = 42):
    n_conv, turns = TIERS[tier]
    rng = random.Random(seed)
    # Zipf-ish weights over an expanded vocabulary: hot head terms
    # appear in a large share of turns (skew fixture, FIXTURES.md §1.1)
    vocab = list(_CONTENT_ROOTS)
    rng_v = random.Random(seed + 1)
    while len(vocab) < 2000:
        vocab.append(
            "w"
            + "".join(rng_v.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(7))
        )
    weights = [1.0 / (i + 1) for i in range(len(vocab))]
    epoch = _dt.datetime(2020, 1, 1)
    roles = ["user", "assistant", "tool"]
    rows = []
    k = 0
    golden_items = sorted(GOLDEN_CONVS.items())
    for c in range(n_conv):
        conv_id = f"conv{c:06d}"
        if tier == "tiny" and c < len(golden_items):
            conv_id, texts = golden_items[c]
            for t_idx, text in enumerate(texts):
                rows.append(
                    (
                        conv_id,
                        t_idx,
                        roles[t_idx % 3],
                        text,
                        "search" if roles[t_idx % 3] == "tool" else "",
                        epoch + _dt.timedelta(minutes=k),
                    )
                )
                k += 1
            continue
        for t_idx in range(turns):
            n_words = 6 + rng.randrange(18)
            words = rng.choices(vocab, weights=weights, k=n_words)
            # interleave stop words and punctuation; mixed case
            out = []
            for w in words:
                if rng.random() < 0.35:
                    out.append(rng.choice(_STOPS))
                if rng.random() < 0.15:
                    w = w.capitalize()
                out.append(w + (rng.choice(_PUNCT) if rng.random() < 0.2 else ""))
            # ~1% of turns carry a turn-unique marker token
            if rng.random() < 0.01:
                out.append(f"uniqmarker{c:06d}x{t_idx}")
            role = roles[t_idx % 3]
            rows.append(
                (
                    conv_id,
                    t_idx,
                    role,
                    " ".join(out),
                    "search" if role == "tool" else "",
                    epoch + _dt.timedelta(minutes=k),
                )
            )
            k += 1
    return rows


def generate_transcripts(
    spark: SparkSession, tier: str = "tiny", seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """Materialize the deterministic transcript table for a tier."""
    rows = _gen_rows(tier, seed)
    df = spark.createDataFrame(rows, SCHEMA)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


# -- topical corpus (burstiness fixture) --------------------------------------
#
# The tier generator above draws every token i.i.d. from one global
# Zipf — statistically convenient, but real transcripts are TOPICAL:
# a conversation about a subject repeats its terms across many turns
# and never mentions them elsewhere. That burstiness is what makes
# per-block score upper bounds separate, i.e. it is the regime the
# block-max WAND prune (operators/wand.py) is built for. This
# generator models it while keeping the existing tiers byte-identical.

N_TOPICS = 200
TOPIC_SIG_SIZE = 15
TOPIC_VOCAB_SIZE = 5000


def _topic_vocab(seed: int) -> list[str]:
    rng = random.Random(seed + 7)
    vocab = list(_CONTENT_ROOTS)
    while len(vocab) < TOPIC_VOCAB_SIZE:
        vocab.append(
            "t" + "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(8))
        )
    return vocab


def topic_signatures(seed: int = 42) -> list[list[str]]:
    """Per-topic signature term lists, deterministic in ``seed``.
    Topic t's signature is drawn from the tail of the topic vocab so
    signatures are (mostly) disjoint from the global hot head."""
    vocab = _topic_vocab(seed)
    sigs = []
    for t in range(N_TOPICS):
        rng = random.Random((seed << 20) ^ (t * 2654435761 % 2**31))
        sigs.append(rng.sample(vocab[100:], TOPIC_SIG_SIZE))
    return sigs


def generate_topical_transcripts(
    spark: SparkSession,
    n_conv: int,
    turns_per_conv: int = 10,
    seed: int = 42,
    num_partitions: int | None = None,
    topic_word_p: float = 0.55,
) -> DataFrame:
    """Distributed deterministic topical corpus: each conversation
    picks ONE topic (Zipf over topics, so some topics are hot) and
    draws ``topic_word_p`` of its content words from that topic's
    signature, the rest from the global Zipf vocabulary. Rows are
    generated inside ``mapInPandas`` partitions keyed purely on
    conv id + seed — output is independent of partitioning, so the
    same (n_conv, seed) is reproducible at any parallelism (the same
    invariant the docmap relies on at 10^12-turn scale, where a
    driver-side row list would never fit)."""
    sigs = topic_signatures(seed)
    vocab = _topic_vocab(seed)
    head_weights = [1.0 / (i + 1) for i in range(len(vocab))]
    stops = list(_STOPS)
    epoch = _dt.datetime(2020, 1, 1)
    roles = ["user", "assistant", "tool"]

    def _gen(batches):
        import pandas as pd

        for pdf in batches:
            out = {c: [] for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
            for c in pdf["id"]:
                c = int(c)
                rng = random.Random((seed << 24) ^ c)
                # Zipf over topics: hot topics take many convs
                topic = min(
                    int(rng.paretovariate(1.1)) - 1 + int(rng.random() * 3),
                    N_TOPICS - 1,
                )
                sig = sigs[topic]
                sig_weights = [1.0 / (i + 1) for i in range(len(sig))]
                for t_idx in range(turns_per_conv):
                    n_words = 6 + rng.randrange(18)
                    words = []
                    for _ in range(n_words):
                        if rng.random() < topic_word_p:
                            words.append(
                                rng.choices(sig, weights=sig_weights, k=1)[0]
                            )
                        else:
                            words.append(
                                rng.choices(vocab, weights=head_weights, k=1)[0]
                            )
                    toks = []
                    for w in words:
                        if rng.random() < 0.35:
                            toks.append(rng.choice(stops))
                        if rng.random() < 0.15:
                            w = w.capitalize()
                        toks.append(w + (rng.choice(_PUNCT) if rng.random() < 0.2 else ""))
                    role = roles[t_idx % 3]
                    out["conv_id"].append(f"conv{c:08d}")
                    out["turn_idx"].append(t_idx)
                    out["role"].append(role)
                    out["text"].append(" ".join(toks))
                    out["tool"].append("search" if role == "tool" else "")
                    out["ts"].append(epoch + _dt.timedelta(minutes=c * turns_per_conv + t_idx))
            yield pd.DataFrame(out)

    parts = num_partitions or max(32, n_conv // 20_000)
    base = spark.range(n_conv).repartition(parts)
    return base.mapInPandas(
        _gen,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
