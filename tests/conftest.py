from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csdid_pyspark_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # default to the machine's cores (capped at 32): the suite is a
    # correctness gate, not a benchmark, and at local[8] on a 32-core
    # box the oracle-query gate alone ran ~8.5 min of a driver time
    # budget the full suite must fit (VERDICT r11 item 5). An explicit
    # $SPARK_GRAFT_CPUS still wins, same contract as session.get_spark.
    default_cpus = str(min(32, os.cpu_count() or 8))
    s = get_spark("csdid-pyspark-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", default_cpus))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


# Heavy parametrized cases tiered into `slow` individually (pytest.ini):
# the per-QUERY hygiene/operator properties stay covered in the default
# gate by the 20+ remaining parametrizations; these specific cases are
# 4-16 s each (measured, OPTIMIZATION_r12.md) and the driver's default
# gate runs under a time budget. `-m "slow or not slow"` runs them all.
_SLOW_CASES = {
    "test_query_releases_every_persist[dedup_graph_pagerank]",
    "test_query_releases_every_persist[dedup_incremental]",
    "test_query_releases_every_persist[dedup_jaccard]",
    "test_query_releases_every_persist[dedup_minhash_lsh]",
    "test_query_releases_every_persist[dedup_components]",
    "test_query_releases_every_persist[bpe_encode_stats]",
    "test_query_releases_every_persist[neardup_rate_by_source]",
    "test_query_releases_every_persist[dedup_graph_triangles]",
    "test_postings_index_probe_matches_between_and_skips_corpus_exchange",
    "test_logistic_irls_learns_and_is_partition_invariant",
    "test_embedding_neardup_lsh_recall",
    "test_pq_recall_and_compression_vs_bruteforce",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.name in _SLOW_CASES:
            item.add_marker(pytest.mark.slow)
