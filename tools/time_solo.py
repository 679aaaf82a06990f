"""Solo per-query timer: same session/warmup/noop-sink methodology as
bench.py but only for the queries named on argv, printing every rep.

Usage: python tools/time_solo.py <query> [...]  (env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_BENCH_REPS)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csdid_pyspark_spark.cache import release_cache
from csdid_pyspark_spark.queries import QUERIES
from csdid_pyspark_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
    spark = get_spark("csdid-time-solo")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["groupby_count"](spark, sf_dir).collect()
    from csdid_pyspark_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).limit(1).collect()
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"solo:{name}")
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.perf_counter() - t0, 3))
            release_cache(df)
    for n, r in runs.items():
        print(f"{n}: median={statistics.median(r):.3f} runs={r}")
    spark.stop()


if __name__ == "__main__":
    main()
