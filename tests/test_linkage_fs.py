"""Fellegi-Sunter linkage (operators/linkage.py): exact pattern
counts, EM parameter recovery on a planted mixture, posterior
monotonicity, and degenerate-input guards."""

import itertools

import pytest
from pyspark.sql import functions as F

from csdid_pyspark_spark.operators.linkage import (
    agreement_patterns,
    fellegi_sunter_em,
)


def test_agreement_patterns_exact_counts(spark):
    rows = [
        # block X: 3 records -> 3 pairs
        ("X", 1, "t1", 10, "a"),
        ("X", 2, "t1", 10, "b"),
        ("X", 3, "t2", 11, "a"),
        # block Y: 2 records -> 1 pair
        ("Y", 4, "t1", 10, "c"),
        ("Y", 5, "t1", 12, "c"),
    ]
    df = spark.createDataFrame(rows, "blk string, id int, f1 string, f2 int, f3 string")
    got = {
        (r["a0"], r["a1"], r["a2"]): r["n_pairs"]
        for r in agreement_patterns(df, ["blk"], "id", ["f1", "f2", "f3"]).collect()
    }
    # X pairs: (1,2): f1=1,f2=1,f3=0 ; (1,3): 0,0,1 ; (2,3): 0,0,0
    # Y pair:  (4,5): 1,0,1
    assert got == {(1, 1, 0): 1, (0, 0, 1): 1, (0, 0, 0): 1, (1, 0, 1): 1}


def test_agreement_patterns_null_safe_and_block_cap(spark):
    rows = [("X", 1, None), ("X", 2, None), ("X", 3, "v")]
    df = spark.createDataFrame(rows, "blk string, id int, f1 string")
    got = {
        (r["a0"],): r["n_pairs"]
        for r in agreement_patterns(df, ["blk"], "id", ["f1"]).collect()
    }
    # NULL == NULL counts as agreement (eqNullSafe)
    assert got == {(1,): 1, (0,): 2}
    # max_block drops the whole oversized block
    assert (
        agreement_patterns(df, ["blk"], "id", ["f1"], max_block=2).count() == 0
    )


def test_em_recovers_planted_mixture():
    """Pattern counts generated EXACTLY from a known (m, u, pi) mixture
    (expected counts, no sampling noise): EM must recover the planted
    parameters and order posteriors by likelihood ratio."""
    m = [0.95, 0.8, 0.9]
    u = [0.2, 0.05, 0.1]
    pi = 0.15
    n = 1_000_000
    counts = []
    for gam in itertools.product((0, 1), repeat=3):
        pm = pi
        pu = 1 - pi
        for j in range(3):
            pm *= m[j] if gam[j] else 1 - m[j]
            pu *= u[j] if gam[j] else 1 - u[j]
        counts.append((gam, round(n * (pm + pu))))
    fit = fellegi_sunter_em(counts, iters=500)
    for j in range(3):
        assert abs(fit["m"][j] - m[j]) < 0.02, (j, fit["m"])
        assert abs(fit["u"][j] - u[j]) < 0.02, (j, fit["u"])
    assert abs(fit["pi"] - pi) < 0.02
    # full-agreement pattern posterior ~ true P(M | 1,1,1)
    pm = pi * m[0] * m[1] * m[2]
    pu = (1 - pi) * u[0] * u[1] * u[2]
    assert abs(fit["posterior"][(1, 1, 1)] - pm / (pm + pu)) < 0.03
    # weights increase with each additional agreement bit on top of others
    assert (
        fit["weight"][(1, 1, 1)]
        > fit["weight"][(1, 1, 0)]
        > fit["weight"][(1, 0, 0)]
        > fit["weight"][(0, 0, 0)]
    )


def test_em_guards():
    with pytest.raises(ValueError, match="no candidate pairs"):
        fellegi_sunter_em([])
    # a single pattern has no two-class structure -> loud collapse
    with pytest.raises(ValueError, match="collapsed"):
        fellegi_sunter_em([((1, 1), 100)])


def test_em_deterministic():
    counts = [((1, 1), 50), ((1, 0), 200), ((0, 1), 300), ((0, 0), 5000)]
    a = fellegi_sunter_em(counts)
    b = fellegi_sunter_em(counts)
    assert a == b


def test_compare_cols_bounds(spark):
    df = spark.createDataFrame([("X", 1, "a")], "blk string, id int, f1 string")
    with pytest.raises(ValueError, match="compare columns"):
        agreement_patterns(df, ["blk"], "id", [])
