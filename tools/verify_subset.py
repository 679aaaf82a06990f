"""Targeted oracle check: driver_replica's exact comparison, but only
for the query names given on argv — the fast inner loop for verifying
an optimization batch before the full-registry replica at round close.

Run: python tools/verify_subset.py <query> [<query> ...]
"""

from __future__ import annotations

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

    names = sys.argv[1:]
    if not names:
        print("usage: verify_subset.py <query> [...]")
        return 2
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", "2g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    import __spark_entry__ as E
    from csdid_pyspark_spark.cache import release_cache

    queries, oracles = E.queries(), E.oracle_sql()
    # folded names are absent from the exported surface but still
    # oracle-gated locally — fall back to the package registry
    from csdid_pyspark_spark.queries import ALL_ORACLES as _O
    from csdid_pyspark_spark.queries import ALL_QUERIES as _Q

    for name in sys.argv[1:]:
        if name not in queries and name in _Q:
            queries[name], oracles[name] = _Q[name], _O[name]
    bad = []
    for name in names:
        try:
            sdf = queries[name](spark, SF)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            release_cache(sdf)
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
            if sorted(scols) != sorted(ocols):
                bad.append((name, f"schema {scols} vs {ocols}"))
                continue
            a, b = _normalize(srows, scols), _normalize(orows, ocols)
            if a != b:
                diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
                bad.append((name, f"rows {len(a)} vs {len(b)}, first diffs at {diff}"))
        except Exception as exc:  # noqa: BLE001
            bad.append((name, f"ERR {type(exc).__name__}: {exc}"))
    print(f"verify_subset: {len(names)} queries, bad={bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
