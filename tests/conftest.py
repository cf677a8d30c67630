import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from peterman_search_engine_spark.plans.session import get_spark  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: bulk-scale stress tests (minutes, not seconds)"
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pse-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus_rows():
    """(doc_id, text) rows of the tiny transcript tier in stable
    (conv_id, turn_idx) order — shared by engine and oracle."""
    from peterman_search_engine_spark.sources.transcripts import _gen_rows

    rows = sorted(_gen_rows("tiny"), key=lambda r: (r[0], r[1]))
    return [(i, r[3]) for i, r in enumerate(rows)]


@pytest.fixture(scope="session")
def tiny_corpus(spark, tiny_corpus_rows):
    return spark.createDataFrame(tiny_corpus_rows, "doc_id long, text string")
