"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line with per-query
wall seconds. Each query is forced with a full collect (what the
driver's correctness gate does), after a warmup that absorbs JVM/codegen
startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from csdid_pyspark_spark.queries import QUERIES
from csdid_pyspark_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_revenue",
    "q6_forecast_revenue",
    "join_star_broadcast",
    "join_inner_agg",
    "window_topk_per_group",
    "did_attgt_nevertreated",
    "did_attgt_notyettreated",
    "did_aggte_dynamic",
    "dedup_jaccard",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "text_stats",
    "text_tfidf",
    "events_sessionize",
    "events_asof_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("csdid-pyspark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + codegen + parquet footer reads for every table the
    # headline queries touch (events needs its nanos-timestamp path)
    QUERIES["groupby_count"](spark, sf_dir).collect()
    from csdid_pyspark_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).limit(1).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
