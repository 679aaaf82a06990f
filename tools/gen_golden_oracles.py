"""Regenerate the pinned VALUES-literal DuckDB oracles for the
seeded-deterministic queries that have no ANSI-SQL oracle
(``csdid_pyspark_spark/queries/golden_values.py``).

Why these exist: the queries below (LSH candidate generation, the
seeded multiplier/cluster bootstraps, the Wald pre-test, sketch
aggregates) are not expressible in portable SQL, so the external
driver would only run a weak rows-only check on them. They ARE
deterministic — seeded hash-Rademacher draws, seeded LCG
hyperplanes, xxhash64 banding, register-max HLL merges — verified
bit-identical across local[3]/17, local[8]/8 and local[32]/200 session
shapes. Pinning their sf0.01 output as ``SELECT ... FROM (VALUES ...)``
turns the weak check into the same hash-green gate every other query
gets; the in-repo oracle gate (tests/test_oracle_queries.py) then
re-derives the live output every run and diffs it against the pinned
literal, so drift (code change, testdata regeneration) is caught
immediately.

Usage:  python tools/gen_golden_oracles.py   (writes the module in place;
commit the result). Run from the repo root.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_SF_DIR = "/root/testdata/sf0.01"
GOLDEN_NAMES = (
    "did_attgt_bootstrap",
    "did_sunab_event_band",
    "did_pretrend_wald",
    "did_attgt_cluster",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sketch_cardinality",
    "sketch_grouped_stats",
    "embedding_pca_variance",
    "embedding_kmeans",
    "did_attgt_dr_covariate",
    "did_attgt_ipw_covariate",
    "did_attgt_rc_dr_covariate",
    "quality_classifier_train",
    "quality_classifier_score",
    "quality_classifier_holdout",
    "bpe_train_merges",
    "sim_ann_pq",
    "sim_ann_ivfpq",
    "sim_ann_ivfpq_probe",
    "did_synth_control",
    "did_synth_placebo",
    "did_bjs_imputation",
    "did_etwfe",
    # factor extraction is a driver eigendecomposition — pin the output
    "did_ife",
    "sketch_hll_partitioned_union",
    "sim_mmr_diversify",
    # exact Mann-Whitney AUC of the IRLS fit: deterministic, fit not
    # SQL-expressible — pin the 1-row output
    "quality_classifier_auc",
    # streaming MG sketch upgraded by exact recount: deterministic for
    # any candidate superset the stream emits, but items are xxhash64
    # values DuckDB can't derive — pin the output
    "stream_heavy_hitters",
    # learned-merge tokenizer application: deterministic via the
    # trainer's (count desc, pair asc) tiebreak, not SQL-expressible
    "bpe_encode_stats",
    # Frank-Wolfe + driver ridge solve: deterministic, not SQL
    "did_synth_augmented",
    # fixed-iteration soft-impute with decimal-exact Grams and
    # sign-fixed eigenvectors: deterministic, not SQL
    "did_mc_nnm",
    # EM mixture fit on integer pattern counts: deterministic, not SQL
    "er_fellegi_sunter",
    # two Frank-Wolfe weight fits + driver DiD algebra: deterministic
    "did_synth_did",
    # per-cohort Frank-Wolfe fits + decimal-exact cohort means
    "did_sdid_staggered",
    # not-yet-treated donor pools, truncated post windows
    "did_sdid_staggered_nyt",
    # exact two-way-FE theta phase + soft-impute on y - x'theta
    "did_mcnnm_covariate",
    # cohort-mean moving-block test + inversion: driver Frank-Wolfe
    "did_conformal_staggered",
    # per-period pointwise conformal trace (pre ∪ {s} refits)
    "did_conformal_trace",
    # affine-FLCI optimization (Nelder-Mead + bisection): deterministic
    "did_honest_flci",
    # ARP conditional/hybrid test: vertex enumeration + seeded LF draws
    "did_honest_rm",
    # same ARP machinery on the single Delta^SD polytope (d = M·1)
    "did_honest_sd",
    # union of second-difference cones (DeltaSDRM) through the ARP test
    "did_honest_sdrm",
    # batched ADC probe of the persisted index: deterministic
    "sim_ann_ivfpq_batch",
)

_DUCK_TYPES = {
    "int": "INTEGER",
    "bigint": "BIGINT",
    "double": "DOUBLE",
    "float": "DOUBLE",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
}


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # repr is the shortest round-trip rendering: DuckDB parses it
        # back to the bit-identical float64, so the pandas string form
        # the driver hashes matches Spark's exactly
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise TypeError(f"unsupported golden literal type: {type(v)}")


def values_oracle(df) -> str:
    """Pin a (small, deterministic) DataFrame's contents as a DuckDB
    ``SELECT ... FROM (VALUES ...)`` with explicit per-column casts, so
    the result schema (and its pandas rendering) is independent of
    DuckDB's literal-type unification."""
    cols = df.columns
    dtypes = dict(df.dtypes)
    rows = sorted(
        (tuple(r) for r in df.collect()),
        key=lambda row: tuple((x is None, str(type(x)), x) for x in row),
    )
    if not rows:
        raise ValueError("refusing to pin an empty result")
    body = ",\n  ".join("(" + ", ".join(_lit(v) for v in row) + ")" for row in rows)
    sel = ", ".join(
        f"CAST(v{i} AS {_DUCK_TYPES[dtypes[c]]}) AS {c}" for i, c in enumerate(cols)
    )
    vcols = ", ".join(f"v{i}" for i in range(len(cols)))
    return f"SELECT {sel}\nFROM (VALUES\n  {body}\n) AS _golden({vcols})"


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from csdid_pyspark_spark.queries import ALL_QUERIES as QUERIES

    entries = []
    for name in GOLDEN_NAMES:
        df = QUERIES[name](spark, GOLDEN_SF_DIR)
        sql = values_oracle(df)
        entries.append(f'    "{name}": """\n{sql}\n""",')
        print(f"pinned {name}: {df.count()} rows")
    spark.stop()

    out = os.path.join(REPO, "csdid_pyspark_spark", "queries", "golden_values.py")
    with open(out, "w") as f:
        f.write(
            '"""Pinned VALUES-literal DuckDB oracles for the seeded-deterministic\n'
            "queries with no ANSI-SQL formulation (LSH candidate generation, the\n"
            "seeded multiplier bootstrap, sketch aggregates).\n"
            "\n"
            f"AUTO-GENERATED by tools/gen_golden_oracles.py from {GOLDEN_SF_DIR}\n"
            "(driver testdata, seed=42 — TESTDATA.md). Do not edit by hand;\n"
            "regenerate when the algorithm or the driver testdata legitimately\n"
            "changes. These oracles are snapshots of this engine's own verified\n"
            "output (each query ALSO has an independent check in tests/: 1e-7\n"
            "reference parity for the bootstrap, recall-vs-exact for the LSH\n"
            "paths, error bounds vs exact for the sketches); their job here is\n"
            "to give the external driver a hash-comparable oracle and to catch\n"
            "ANY behavioral drift — they are only valid at the pinned scale\n"
            'factor."""\n'
            "\n"
            f"GOLDEN_SF_DIR = {GOLDEN_SF_DIR!r}\n"
            "\n"
            "GOLDEN_ORACLES: dict[str, str] = {\n"
            + "\n".join(entries)
            + "\n}\n"
        )
    print("wrote", out)


if __name__ == "__main__":
    main()
