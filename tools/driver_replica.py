"""Replicate the grading driver's correctness gate EXACTLY: a vanilla
SparkSession (no engine session tuning — this is what caught the
pin_utc_session conf.get sentinel crash that the tuned pytest sessions
masked), every `__spark_entry__.queries()` entry vs its
`oracle_sql()` on DuckDB at sf0.01, plus the `entry()` smoke.

Run: python tools/driver_replica.py  (exit 1 on any mismatch)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [
        tuple(round(r[i], 9) if isinstance(r[i], float) else r[i] for i in order)
        for r in rows
    ]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
    return out


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    # driver memory 2g: the EXTERNAL gate runs 50 queries on a fresh
    # default-heap session; this replica runs the FULL ~300-query
    # registry in ONE session, and accumulated broadcast/codegen state
    # intermittently OOMs the 1g default around query ~130 (observed
    # r9: "Not enough memory to build and broadcast" -> heap OOM ->
    # JVM death). The bump removes the replica-tool artifact without
    # changing any per-query semantics.
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", "2g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    import __spark_entry__ as E
    from csdid_pyspark_spark.cache import release_cache

    queries, oracles = E.queries(), E.oracle_sql()
    bad = []
    for name in sorted(queries):
        try:
            sdf = queries[name](spark, SF)
            ns = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
            # release operator-attached persists, as the oracle pytest
            # does: this tool runs the FULL registry (~6x the external
            # gate's 50-query window), and un-released per-query caches
            # eventually exhaust the vanilla session's storage memory —
            # observed as a flaky "Not enough memory to build and
            # broadcast" on whichever query runs near the ceiling
            release_cache(sdf)
            if name not in oracles:
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            nd = _normalize(res.fetchall(), dcols)
            ok = len(ns) == len(nd) and all(
                all(
                    (
                        isinstance(a, float)
                        and isinstance(b, float)
                        and (abs(a - b) <= 1e-9 or (math.isnan(a) and math.isnan(b)))
                    )
                    or a == b
                    for a, b in zip(ra, rb)
                )
                for ra, rb in zip(ns, nd)
            )
        except Exception as e:  # noqa: BLE001 — gate mirrors the driver
            ok = False
            print(f"{name} EXC {str(e)[:160]}")
        if not ok:
            bad.append(name)
    n_entry = len(E.entry(spark).collect())
    print(f"driver replica: {len(queries)} queries, entry rows={n_entry}, bad={bad}")
    return 1 if bad or n_entry <= 0 else 0


if __name__ == "__main__":
    raise SystemExit(main())
