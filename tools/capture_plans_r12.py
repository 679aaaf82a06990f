"""Capture .explain("formatted") for every headline bench query into
plans/r12/<query>_<tag>.txt (tag = before/after, argv[1], default
"before"). Queries whose construction runs eager jobs (did_*) still
produce a plan for their RESULT frame — that is the declared query
surface the bench times.

Usage: python tools/capture_plans_r12.py [before|after] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_LAYOUT_CACHE", "0")  # stable paths in snapshots

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    from csdid_pyspark_spark.queries import QUERIES
    from csdid_pyspark_spark.session import get_spark

    import bench

    names = sys.argv[2:] or [n for n in bench.HEADLINE if n in QUERIES]
    spark = get_spark("csdid-plans-r12")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        from csdid_pyspark_spark.cache import release_cache

        release_cache(df)
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()
