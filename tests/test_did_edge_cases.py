"""Edge-case coverage: anticipation periods, mpdta-shaped data (cohort
values on the calendar scale, not contiguous small ints), universal
base period with not-yet-treated controls."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from csdid_pyspark_spark.did import ATTgt


def make_mpdta_like(n_units=400, seed=14):
    """mpdta-shaped county panel (FIXTURES.md F2): years 2003-2007,
    cohorts {0, 2004, 2006, 2007}, log-outcome with a small negative
    treatment effect and a covariate."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_units):
        lpop = rng.normal(5.0, 1.0)
        g = rng.choice([0, 2004, 2006, 2007], p=[0.4, 0.25, 0.2, 0.15])
        fe = rng.normal(0, 0.5)
        for year in range(2003, 2008):
            treat = 0 < g <= year
            y = 5.0 + fe + 0.1 * lpop - 0.02 * (year - 2003) - 0.05 * treat + rng.normal(0, 0.05)
            rows.append((i, year, int(g), y, lpop))
    return pd.DataFrame(rows, columns=["countyreal", "year", "first_treat", "lemp", "lpop"])


def test_mpdta_shaped_panel(spark):
    pdf = make_mpdta_like()
    est = ATTgt(
        spark.createDataFrame(pdf),
        yname="lemp", tname="year", idname="countyreal", gname="first_treat",
        xfmla="lemp ~ lpop", control_group="notyettreated",
        allow_unbalanced_panel=False,
    )
    table = est.fit(est_method="dr")
    # cohorts 2004/2006/2007 × 4 comparison years
    assert sorted(table["g"].unique()) == [2004.0, 2006.0, 2007.0]
    assert len(table) == 12
    post = table[table["post"] == 1]
    assert np.isfinite(post["att"]).all()
    # true effect -0.05: pg-weighted simple aggregation should recover it
    out = est.compute_aggte("simple")
    assert abs(out.overall_att - (-0.05)) < 3 * out.overall_se + 0.01
    # dynamic event times are on the year scale
    dyn = est.compute_aggte("dynamic")
    assert all(float(e).is_integer() for e in dyn.egt)
    assert min(dyn.egt) <= -1 and max(dyn.egt) >= 1


def test_anticipation_shifts_base_period(spark):
    """With anticipation=1, the base period for post cells moves one
    period earlier (g-2 instead of g-1) and cohorts with g <= min_t+1
    are dropped."""
    rng = np.random.default_rng(3)
    rows = []
    for i in range(300):
        g = rng.choice([0, 4], p=[0.5, 0.5])
        fe = rng.normal()
        for t in (1, 2, 3, 4, 5):
            # effect starts one period EARLY (anticipation)
            tau = 2.0 if (g > 0 and t >= g - 1) else 0.0
            rows.append((i, t, int(g), fe + 0.1 * t + tau + rng.normal(0, 0.3)))
    pdf = pd.DataFrame(rows, columns=["id", "period", "G", "Y"])
    sdf = spark.createDataFrame(pdf)

    naive = ATTgt(sdf, "Y", "period", "id", "G", allow_unbalanced_panel=False)
    t0 = naive.fit(est_method="reg")
    antic = ATTgt(sdf, "Y", "period", "id", "G", anticipation=1, allow_unbalanced_panel=False)
    t1 = antic.fit(est_method="reg")

    # naive ATT(4,4) is biased down (base period g-1=3 already treated);
    # anticipation=1 anchors at period 2 and recovers the full effect
    a0 = t0[(t0.g == 4) & (t0.t == 4)]["att"].iloc[0]
    a1 = t1[(t1.g == 4) & (t1.t == 4)]["att"].iloc[0]
    assert a0 < 0.7  # biased: effect net of anticipation ≈ 0
    assert abs(a1 - 2.0) < 0.3  # corrected


def test_universal_base_notyettreated(spark):
    from tests.test_did_parity import make_panel_dgp

    pdf = make_panel_dgp(n_units=200, periods=(1, 2, 3, 4), cohorts=(0, 3, 4), seed=5)
    est = ATTgt(spark.createDataFrame(pdf), "Y", "period", "id", "G",
                control_group="notyettreated", allow_unbalanced_panel=False)
    table = est.fit(est_method="dr", base_period="universal")
    # universal → a cell for every (g, t) incl. t == pret as exact zero
    assert len(table) == 8
    zeros = table[table["t"] == table["g"] - 1]
    assert (zeros["att"] == 0).all()
    post = table[table["post"] == 1]
    for _, r in post.iterrows():
        truth = r["t"] - r["g"] + 1
        assert abs(r["att"] - truth) < 4 * r["se"] + 0.15


def test_irls_nonconvergence_returns_none(spark):
    """Perfect separation never meets tol: irls_logit must return None
    for that cell (an unconverged iterate is not an MLE) rather than
    silently using the last iterate."""
    import pandas as pd
    from pyspark.sql import functions as F

    from csdid_pyspark_spark.did.linalg import irls_logit

    rows = []
    for i in range(200):
        x = (i % 20) / 10.0 - 1.0
        d = 1.0 if x > 0 else 0.0  # d is a deterministic function of x
        rows.append((0, d, 1.0, 1.0, x))
    cell = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cid", "d", "w", "_x0", "_x1"])
    )
    out = irls_logit(cell, ["_x0", "_x1"], spark, [0], max_iter=8)
    assert out[0] is None

# Slow tier: deselected by the default `-m "not slow"` (pytest.ini) so the
# driver's time-budgeted gate runs the fast product surfaces; run everything
# with `python -m pytest tests/ -m "slow or not slow"` (round-close practice).
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
