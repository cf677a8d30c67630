"""LSH banding at production width: 128 minhashes, b=16 bands of r=8.

The driver queries exercise the banding machinery at toy width
(num_hashes=4) where the oracle SQL can replicate it; this suite
validates the SAME code path at the parameterization a 100 TB dedup
run would use, against the r x b collision theory: a pair with
shingle-Jaccard s becomes a candidate with probability
1 - (1 - s^r)^b, i.e. >= 0.98 at s >= 0.85 and ~4e-5 at s <= 0.2.

Planted near-duplicates (2 token edits on 60-token docs -> true
J ~ 0.8-0.9, measured exactly per pair with the same 3-shingle
definition dedup.shingle_df uses) must be recalled at >= 90%; random
background docs must produce essentially no false candidates.
"""

import random
import re

import pytest

from peterman_search_engine_spark.operators.dedup import lsh_candidate_pairs

N_PAIRS = 50
DOC_LEN = 60
N_BACKGROUND = 100
SHINGLE_W = 3


def _shingles_py(text: str) -> set[str]:
    toks = [t for t in re.split(r"[^0-9a-z]+", text.lower()) if t]
    return {
        " ".join(toks[i: i + SHINGLE_W])
        for i in range(len(toks) - SHINGLE_W + 1)
    }


def _jaccard(a: set[str], b: set[str]) -> float:
    return len(a & b) / len(a | b)


@pytest.fixture(scope="module")
def planted(spark):
    rng = random.Random(20260817)
    vocab = [f"w{i}" for i in range(1000)]
    rows, true_pairs = [], {}
    for i in range(N_PAIRS):
        base = [rng.choice(vocab) for _ in range(DOC_LEN)]
        dup = list(base)
        for pos in rng.sample(range(DOC_LEN), 2):
            dup[pos] = rng.choice(vocab)
        a_txt, b_txt = " ".join(base), " ".join(dup)
        rows.append((2 * i, a_txt))
        rows.append((2 * i + 1, b_txt))
        true_pairs[(2 * i, 2 * i + 1)] = _jaccard(
            _shingles_py(a_txt), _shingles_py(b_txt)
        )
    for j in range(N_BACKGROUND):
        rows.append(
            (10_000 + j, " ".join(rng.choice(vocab) for _ in range(DOC_LEN)))
        )
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    return corpus, true_pairs


def test_recall_at_production_width(planted):
    corpus, true_pairs = planted
    cand = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(
            corpus, num_hashes=128, rows_per_band=8
        ).collect()
    }
    high = {p for p, s in true_pairs.items() if s >= 0.80}
    assert len(high) >= 40  # the edit recipe must actually land there
    recall = len(high & cand) / len(high)
    # theory at s=0.80 is 0.934, at 0.85 it is 0.985; the planted
    # distribution sits at 0.80-0.92, so 0.9 leaves honest slack
    assert recall >= 0.9, f"recall {recall:.3f} over {len(high)} pairs"
    # precision: non-planted candidates are theory ~4e-5 per pair;
    # allow a couple of flukes, not a flood
    false_cand = cand - set(true_pairs)
    assert len(false_cand) <= 2, sorted(false_cand)[:10]


def test_low_similarity_pairs_not_candidates(planted):
    corpus, true_pairs = planted
    cand = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(
            corpus, num_hashes=128, rows_per_band=8
        ).collect()
    }
    background_pairs = {
        p for p in cand if p[0] >= 10_000 and p[1] >= 10_000
    }
    assert not background_pairs
