"""MC-NNM (did/mcnnm.py) — numpy-replica equality, planted-effect
recovery, partitioning invariance, and the zero-observed-cell guard."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _toy_panel(spark, n_per=12, T=6, cohorts=(0, 3, 4, 5), tau=2.0):
    """Deterministic small panel with two-way FE + a rank-1 factor +
    a constant treatment effect tau on treated cells."""
    rows = []
    f = [0.5 * t - 1.0 for t in range(1, T + 1)]
    uid = 0
    for g in cohorts:
        for k in range(n_per):
            lam_i = ((uid * 13) % 7 - 3) / 4.0
            a_i = ((uid * 5) % 9) / 2.0
            for t in range(1, T + 1):
                y = (
                    a_i
                    + 0.7 * t
                    + lam_i * f[t - 1]
                    + (tau if 0 < g <= t else 0.0)
                    + ((uid * 31 + t * 17) % 13) / 50.0
                )
                rows.append((uid, t, g, float(y)))
            uid += 1
    return spark.createDataFrame(rows, "id bigint, period int, g int, y double")


def _numpy_mcnnm(panel_rows, shrink_frac, iters):
    """Literal numpy transcription of mc_nnm's block scheme (same
    update order, same lam rule, same sign-fix, same readout)."""
    ids = sorted({r[0] for r in panel_rows})
    periods = sorted({r[1] for r in panel_rows})
    T = len(periods)
    idx = {t: i for i, t in enumerate(periods)}
    N = len(ids)
    iid = {u: i for i, u in enumerate(ids)}
    Y = np.full((N, T), np.nan)
    G = np.zeros(N)
    for u, t, g, y in panel_rows:
        Y[iid[u], idx[t]] = y
        G[iid[u]] = g
    tgrid = np.array(periods)
    O = (
        ((G[:, None] == 0) | (tgrid[None, :] < G[:, None]))
        & ~np.isnan(Y)
    )
    Yf = np.where(np.isnan(Y), 0.0, Y)
    nobs = O.sum(axis=1)
    assert (nobs > 0).all()

    beta = np.zeros(T)
    A = np.zeros((N, T))
    V = np.zeros((T, T))
    lam = None
    bl_read = al_read = L_read = None
    for it in range(iters + 1):
        bl = beta.copy()
        L = A @ V.T if it > 0 else np.zeros((N, T))
        alpha = np.where(O, Yf - bl[None, :] - L, 0.0).sum(axis=1) / nobs
        M = np.where(O, Yf - alpha[:, None] - bl[None, :], L)
        bs = np.where(O, Yf - alpha[:, None] - L, 0.0).sum(axis=0)
        bn = O.sum(axis=0)
        gram = M.T @ M
        beta = np.where(bn > 0, bs / np.maximum(bn, 1), 0.0)
        if lam is None:
            lam = shrink_frac * float(
                np.sqrt(max(float(np.linalg.eigvalsh(gram)[-1]), 0.0))
            )
        if it == iters:
            bl_read, al_read, L_read = bl, alpha, L
            break
        vals, vecs = np.linalg.eigh(gram)
        order = np.argsort(vals)[::-1]
        vals, vecs = vals[order], vecs[:, order]
        sig = np.sqrt(np.clip(vals, 0.0, None))
        for j in range(T):
            k = int(np.argmax(np.abs(vecs[:, j])))
            if vecs[k, j] < 0:
                vecs[:, j] = -vecs[:, j]
        s = np.where(sig > 0, np.maximum(sig - lam, 0.0) / np.where(sig > 0, sig, 1.0), 0.0)
        V = vecs
        A = M @ V @ np.diag(s)

    treated = (G[:, None] > 0) & (tgrid[None, :] >= G[:, None]) & ~np.isnan(Y)
    gap = Yf - al_read[:, None] - bl_read[None, :] - L_read
    out = {}
    for i in range(len(ids)):
        for j in range(T):
            if treated[i, j]:
                e = int(periods[j] - G[i])
                s0, n0 = out.get(e, (0.0, 0))
                out[e] = (s0 + gap[i, j], n0 + 1)
    return {e: (s / n, n) for e, (s, n) in out.items()}


def test_mcnnm_matches_numpy_replica(spark):
    from csdid_pyspark_spark.did.mcnnm import mc_nnm

    panel = _toy_panel(spark)
    rows = [
        (r["id"], r["period"], r["g"], r["y"])
        for r in panel.collect()
    ]
    got = mc_nnm(panel, shrink_frac=0.5, iters=8)
    want = _numpy_mcnnm(rows, shrink_frac=0.5, iters=8)
    assert {e for e, *_ in got["att"]} == set(want)
    for e, att, n in got["att"]:
        w_att, w_n = want[e]
        assert n == w_n
        assert abs(att - w_att) < 1e-7, (e, att, w_att)


def test_mcnnm_recovers_planted_effect(spark):
    """With a rank-1 factor + two-way FE + constant tau on treated
    cells, the completed counterfactual recovers tau despite the
    factor loadings differing across units (where plain TWFE
    imputation would be biased by the factor)."""
    from csdid_pyspark_spark.did.mcnnm import mc_nnm

    panel = _toy_panel(spark, n_per=25, T=8, cohorts=(0, 0, 6, 7), tau=3.0)
    res = mc_nnm(panel, shrink_frac=0.3, iters=25)
    assert abs(res["att_overall"] - 3.0) < 0.35, res["att"]
    for e, att, _ in res["att"]:
        assert abs(att - 3.0) < 0.5, (e, att)


def test_mcnnm_partitioning_invariance(spark):
    """Decimal-exact aggregation ⇒ bit-identical output across
    partition layouts (the golden-oracle determinism contract)."""
    from csdid_pyspark_spark.did.mcnnm import mc_nnm

    panel = _toy_panel(spark)
    a = mc_nnm(panel.repartition(13), shrink_frac=0.5, iters=6)
    b = mc_nnm(panel.repartition(2), shrink_frac=0.5, iters=6)
    assert a["att"] == b["att"]
    assert a["lam"] == b["lam"]
    assert a["sigma"] == b["sigma"]


def test_mcnnm_zero_observed_cells_raises(spark):
    from csdid_pyspark_spark.did.mcnnm import mc_nnm

    rows = [(1, t, 1, float(t)) for t in range(1, 5)]  # g=1: never observed untreated
    rows += [(2, t, 0, float(t)) for t in range(1, 5)]
    panel = spark.createDataFrame(rows, "id bigint, period int, g int, y double")
    with pytest.raises(ValueError, match="zero observed"):
        mc_nnm(panel)


def test_mcnnm_needs_two_periods(spark):
    from csdid_pyspark_spark.did.mcnnm import mc_nnm

    panel = spark.createDataFrame(
        [(1, 1, 0, 1.0), (2, 1, 0, 2.0)], "id bigint, period int, g int, y double"
    )
    with pytest.raises(ValueError, match="period"):
        mc_nnm(panel)


def test_mcnnm_unidentified_period_raises(spark):
    """A calendar period with ZERO untreated observations (no
    never-treated cohort, every cohort treated by t) has an
    unidentified time FE; defaulting beta_t = 0 would bias att(e) for
    that period, so mc_nnm raises instead (mirroring imputation.py's
    'treated periods have no untreated observations' guard)."""
    from csdid_pyspark_spark.did.mcnnm import mc_nnm

    # cohorts g=2 and g=3 only: periods 3 and 4 have no untreated cell
    rows = [
        (u, t, g, float(u + t))
        for g in (2, 3)
        for u in range(g * 10, g * 10 + 4)
        for t in range(1, 5)
    ]
    panel = spark.createDataFrame(rows, "id bigint, period int, g int, y double")
    with pytest.raises(ValueError, match="zero untreated observations"):
        mc_nnm(panel)


def test_mcnnm_placebo_bands_cover_planted_effect(spark):
    """In-space placebo bands: on the toy DGP (constant planted
    tau = 2.0) every event's 95% band must cover the truth within a
    3-se slack, se must be positive, and the whole thing must be
    deterministic across partitionings (hash-assigned replicates,
    decimal sums)."""
    from csdid_pyspark_spark.did.mcnnm import mc_nnm

    panel = _toy_panel(spark, n_per=20, T=6, cohorts=(0, 0, 0, 3, 4, 5))
    res = mc_nnm(panel, shrink_frac=0.5, iters=8, placebo_b=60)
    assert res["placebo_b"] == 60
    assert len(res["bands"]) == len(res["att"])
    for e, att, se, lo, hi in res["bands"]:
        assert se > 0
        assert lo < att < hi
        assert lo - 3 * se < 2.0 < hi + 3 * se, (e, att, se)

    res2 = mc_nnm(
        panel.repartition(13), shrink_frac=0.5, iters=8, placebo_b=60
    )
    assert res2["bands"] == res["bands"]


def test_mcnnm_placebo_bands_guard(spark):
    """Placebo bands refuse a panel with a single never-treated unit
    (no cross-sectional placebo distribution to draw from)."""
    from csdid_pyspark_spark.did.mcnnm import mc_nnm

    rows = [(1, t, 0, float(t)) for t in range(1, 5)]
    rows += [(2, t, 2, float(t + 1)) for t in range(1, 5)]
    panel = spark.createDataFrame(rows, "id bigint, period int, g int, y double")
    with pytest.raises(ValueError, match="placebo bands"):
        mc_nnm(panel, iters=2, placebo_b=10)


def test_mcnnm_cv_selects_interior_lambda_on_factor_dgp(spark):
    """mc_nnm_cv on a rank-1-factor DGP with noise: the held-out MSE
    must be finite for every feasible candidate, the winner must beat
    the extreme pure-TWFE penalty (which cannot fit the factor), the
    final refit recovers the planted tau, and the whole selection is
    deterministic across partitionings. Also pins: the final fit's
    point path equals a direct mc_nnm at the winning shrink_frac (the
    holdout only ever influences SELECTION)."""
    from csdid_pyspark_spark.did.mcnnm import mc_nnm, mc_nnm_cv

    panel = _toy_panel(spark, n_per=16, T=6, cohorts=(0, 0, 3, 4, 5))
    res = mc_nnm_cv(
        panel, shrink_fracs=(0.05, 0.3, 3.0), iters=8, holdout_frac=0.15
    )
    assert set(res["cv"]) == {0.05, 0.3, 3.0}
    finite = {f: m for f, m in res["cv"].items() if m != float("inf")}
    assert finite, res["cv"]
    # frac = 3.0 shrinks every singular value to zero -> pure TWFE,
    # which cannot absorb the planted factor: strictly worse held-out
    # error than the winner
    assert res["cv"][res["shrink_frac"]] <= min(finite.values())
    if 3.0 in finite:
        assert finite[3.0] >= res["cv"][res["shrink_frac"]]
    assert abs(res["att_overall"] - 2.0) < 0.2, res["att_overall"]

    direct = mc_nnm(panel, shrink_frac=res["shrink_frac"], iters=8)
    assert direct["att"] == res["att"]

    res2 = mc_nnm_cv(
        panel.repartition(13),
        shrink_fracs=(0.05, 0.3, 3.0),
        iters=8,
        holdout_frac=0.15,
    )
    assert res2["cv"] == res["cv"] and res2["shrink_frac"] == res["shrink_frac"]


def test_mcnnm_holdout_unit_guarantee_and_period_guard(spark):
    """The holdout mask keeps every UNIT identified (a unit's first
    raw-observed cell is never held), so a moderate fraction runs and
    reports a finite held-out MSE — while an extreme fraction that
    strips a PERIOD's last untreated observation hits the
    unidentified-period guard (the documented CV-infeasible case:
    identification is guaranteed per unit, not per period)."""
    from csdid_pyspark_spark.did.mcnnm import mc_nnm

    panel = _toy_panel(spark, n_per=12, T=6, cohorts=(0, 0, 3, 4, 5))
    res = mc_nnm(panel, iters=3, holdout=(7, 0.3))
    assert res["holdout_n"] > 0
    assert res["holdout_mse"] == res["holdout_mse"]  # not NaN

    small = _toy_panel(spark, n_per=6, T=6, cohorts=(0, 3, 4, 5))
    with pytest.raises(ValueError, match="zero untreated observations"):
        mc_nnm(small, iters=3, holdout=(7, 0.9))


def test_mcnnm_covariates_recover_confounded_effect(spark):
    """Covariate-augmented MC-NNM (Athey et al. 2021 §8.3,
    residualize-then-impute): a covariate whose slope differs between
    treated and control units biases the covariate-free fit badly;
    with xnames the exact two-way-FE theta is recovered and att is
    clean. Deterministic across partitionings; CV and placebo bands
    pass through."""
    from csdid_pyspark_spark.did.mcnnm import mc_nnm, mc_nnm_cv

    rng = np.random.default_rng(23)
    T, tau, theta = 8, 2.0, 1.5
    rows = []
    uid = 0
    for g, n, m in [(0, 60, 1.0), (5, 25, 3.0)]:
        for _ in range(n):
            a = rng.normal(5, 2)
            mi = m + rng.normal(0, 0.2)
            for t in range(T):
                x = mi * t + rng.normal(0, 0.5)
                y = (
                    a + 0.8 * np.sin(t) + theta * x
                    + (tau if g and t >= g else 0.0)
                    + rng.normal(0, 0.1)
                )
                rows.append((uid, int(g), t, float(y), float(x)))
            uid += 1
    panel = spark.createDataFrame(
        rows, "id bigint, g int, period int, y double, x double"
    )

    r0 = mc_nnm(panel)
    r1 = mc_nnm(panel, xnames=("x",))
    assert abs(r0["att_overall"] - tau) > 1.0  # omitted-x bias is real
    assert abs(r1["theta"]["x"] - theta) < 0.02
    assert abs(r1["att_overall"] - tau) < 0.1

    rcv = mc_nnm_cv(panel, xnames=("x",), shrink_fracs=(0.05, 0.2, 0.8))
    assert abs(rcv["att_overall"] - tau) < 0.1
    assert rcv["theta"]["x"] == r1["theta"]["x"]  # same frozen OLS

    r2 = mc_nnm(panel.repartition(17), xnames=("x",))
    assert r2["att_overall"] == r1["att_overall"]

    rb = mc_nnm(panel, xnames=("x",), placebo_b=20)
    assert all(se >= 0.0 for _, _, se, _, _ in rb["bands"])


def test_mcnnm_covariates_null_guard_and_cv_error_discipline(spark):
    """A NULL covariate on an observed cell raises a data-integrity
    ValueError — and mc_nnm_cv PROPAGATES it (only the
    unidentified-period error marks a candidate infeasible)."""
    from csdid_pyspark_spark.did.mcnnm import (
        UnidentifiedPeriodError,
        mc_nnm,
        mc_nnm_cv,
    )

    panel = _toy_panel(spark).withColumn(
        "x",
        F.when(
            (F.col("id") == 3) & (F.col("period") == 2), F.lit(None)
        ).otherwise(F.col("period").cast("double") + F.col("id") % 3),
    )
    with pytest.raises(ValueError, match="NULL covariate"):
        mc_nnm(panel, xnames=("x",), iters=2)
    with pytest.raises(ValueError, match="NULL covariate"):
        mc_nnm_cv(panel, xnames=("x",), shrink_fracs=(0.1,), iters=2)
    # duplicate-cell integrity errors also propagate out of the CV
    dup = _toy_panel(spark)
    dup = dup.unionByName(dup.limit(1))
    with pytest.raises(ValueError, match="duplicate"):
        mc_nnm_cv(dup, shrink_fracs=(0.1,), iters=2)
    assert issubclass(UnidentifiedPeriodError, ValueError)


def test_mcnnm_cv_warm_start_path(spark):
    """Warm-started CV (r11): candidate fits resume from the previous
    lambda's converged factors with tol early-stop; the WINNER'S final
    refit is a cold full-iters fit, so (1) warm and cold CV pick the
    same lambda here, (2) the final att path is BIT-identical across
    modes and to a direct mc_nnm at the winner, (3) candidate holdout
    MSEs agree to far better than the selection gaps, and (4) the warm
    path is deterministic across partitionings. Also pins the tol
    early-stop on mc_nnm itself: a tol run converges to the
    fixed-iters answer."""
    from csdid_pyspark_spark.did.mcnnm import mc_nnm, mc_nnm_cv

    panel = _toy_panel(spark, n_per=16, T=6, cohorts=(0, 0, 3, 4, 5))
    grid = (0.05, 0.3, 3.0)
    cold = mc_nnm_cv(
        panel, shrink_fracs=grid, iters=8, holdout_frac=0.15,
        warm_start=False,
    )
    warm = mc_nnm_cv(
        panel, shrink_fracs=grid, iters=8, holdout_frac=0.15,
    )
    assert warm["shrink_frac"] == cold["shrink_frac"]
    assert warm["att"] == cold["att"]
    direct = mc_nnm(panel, shrink_frac=warm["shrink_frac"], iters=8)
    assert direct["att"] == warm["att"]
    # candidate MSEs are tol-converged vs fixed-iters values — at a
    # small iters both are mid-trajectory approximations, so require
    # agreement well inside the SELECTION gaps, not bit-equality
    for f in grid:
        c, w = cold["cv"][f], warm["cv"][f]
        if c == float("inf") or w == float("inf"):
            assert c == w
        else:
            assert abs(c - w) <= 0.05 * max(c, w) + 1e-9, (f, c, w)

    warm2 = mc_nnm_cv(
        panel.repartition(13), shrink_fracs=grid, iters=8,
        holdout_frac=0.15,
    )
    assert warm2["cv"] == warm["cv"] and warm2["att"] == warm["att"]

    # tol early stop alone: converges to the fixed-iters fixed point
    full = mc_nnm(panel, shrink_frac=0.1, iters=40)
    tolrun = mc_nnm(panel, shrink_frac=0.1, iters=40, tol=1e-9)
    for (e1, a1, n1), (e2, a2, n2) in zip(full["att"], tolrun["att"]):
        assert (e1, n1) == (e2, n2)
        assert abs(a1 - a2) <= 1e-6 * max(1.0, abs(a1)), (e1, a1, a2)


def test_mcnnm_cv_warm_final_tolerance(spark):
    """warm_final=True: the winner's refit resumes from the winning
    candidate's converged factors — same winner, att path within a
    documented tolerance of the cold (bit-pinned) path, deterministic."""
    from csdid_pyspark_spark.did.mcnnm import mc_nnm_cv

    panel = _toy_panel(spark, n_per=16, T=6, cohorts=(0, 0, 3, 4, 5))
    grid = (0.05, 0.3)
    cold = mc_nnm_cv(panel, shrink_fracs=grid, iters=12, holdout_frac=0.15)
    wf = mc_nnm_cv(
        panel, shrink_fracs=grid, iters=12, holdout_frac=0.15,
        warm_final=True,
    )
    assert wf["shrink_frac"] == cold["shrink_frac"]
    scale = max(abs(cold["att_overall"]), 1.0)
    assert abs(wf["att_overall"] - cold["att_overall"]) <= 0.02 * scale
    for (e1, a1, n1), (e2, a2, n2) in zip(cold["att"], wf["att"]):
        assert (e1, n1) == (e2, n2)
        assert abs(a1 - a2) <= 0.05 * max(abs(a1), 0.5), (e1, a1, a2)
    wf2 = mc_nnm_cv(
        panel.repartition(7), shrink_fracs=grid, iters=12,
        holdout_frac=0.15, warm_final=True,
    )
    assert wf2["att"] == wf["att"]

# Slow tier: deselected by the default `-m "not slow"` (pytest.ini) so the
# driver's time-budgeted gate runs the fast product surfaces; run everything
# with `python -m pytest tests/ -m "slow or not slow"` (round-close practice).
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
