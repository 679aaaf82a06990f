"""Exact parity of the distributed kernels with the NumPy reference
(tests/ref_drdid.py) on identical cell data, plus DGP-truth checks.

Parity is the strong check: same published formulas, two independent
implementations (aggregation-pass Spark vs dense NumPy) must agree to
float precision on att and analytic SE for every (g,t) cell.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from csdid_pyspark_spark.did import ATTgt
from tests import ref_drdid


def make_panel_dgp(n_units=300, periods=(1, 2, 3, 4, 5), cohorts=(0, 3, 4), seed=42):
    """Staggered-adoption balanced panel with covariate-dependent
    trends and selection; true ATT(g,t) = t - g + 1 for t >= g."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_units):
        x1 = rng.normal()
        # covariate-dependent cohort selection
        probs = np.array([1.0, np.exp(0.3 * x1), np.exp(-0.2 * x1)])
        probs = probs / probs.sum()
        g = rng.choice(cohorts, p=probs)
        fe = rng.normal()
        for t in periods:
            trend = 0.4 * t + 0.3 * x1 * t
            tau = (t - g + 1.0) if 0 < g <= t else 0.0
            y = fe + trend + tau + rng.normal(scale=0.4)
            rows.append((i, t, float(g), y, x1, 1.0 + 0.5 * (i % 3)))
    return pd.DataFrame(rows, columns=["id", "period", "G", "Y", "x1", "wgt"])


def _cell_arrays_panel(pdf, g, t, pret, control_group):
    sub = pdf[pdf.period.isin([t, pret])]
    wide = sub.pivot_table(index="id", columns="period", values="Y")
    meta = sub[sub.period == pret].set_index("id")
    ids = wide.dropna().index.intersection(meta.index)
    G = meta.loc[ids, "G"].to_numpy()
    treat = G == g
    if control_group == "nevertreated":
        ctrl = G == 0
    else:
        ctrl = (G == 0) | ((G > max(t, pret)) & (G != g))
    keep = treat | ctrl
    ids = ids[keep]
    y1 = wide.loc[ids, t].to_numpy()
    y0 = wide.loc[ids, pret].to_numpy()
    D = (meta.loc[ids, "G"] == g).to_numpy().astype(float)
    X = np.column_stack([np.ones(len(ids)), meta.loc[ids, "x1"].to_numpy()])
    w = meta.loc[ids, "wgt"].to_numpy()
    return y1, y0, D, X, w


def _cell_arrays_rc(pdf, g, t, pret, control_group):
    sub = pdf[pdf.period.isin([t, pret])]
    G = sub["G"].to_numpy()
    treat = G == g
    if control_group == "nevertreated":
        ctrl = G == 0
    else:
        ctrl = (G == 0) | ((G > max(t, pret)) & (G != g))
    sub = sub[treat | ctrl]
    y = sub["Y"].to_numpy()
    post = (sub["period"] == t).to_numpy().astype(float)
    D = (sub["G"] == g).to_numpy().astype(float)
    X = np.column_stack([np.ones(len(sub)), sub["x1"].to_numpy()])
    w = sub["wgt"].to_numpy()
    return y, post, D, X, w


REF_PANEL = {"reg": ref_drdid.reg_did_panel, "ipw": ref_drdid.std_ipw_did_panel, "dr": ref_drdid.drdid_panel}
REF_RC = {"reg": ref_drdid.reg_did_rc, "ipw": ref_drdid.std_ipw_did_rc, "dr": ref_drdid.drdid_rc}


@pytest.fixture(scope="module")
def dgp():
    return make_panel_dgp()


@pytest.fixture(scope="module")
def sdf(spark, dgp):
    return spark.createDataFrame(dgp)


@pytest.mark.parametrize("est_method", ["reg", "ipw", "dr"])
@pytest.mark.parametrize("control_group", ["nevertreated", "notyettreated"])
def test_panel_parity(spark, dgp, sdf, est_method, control_group):
    est = ATTgt(
        sdf, "Y", "period", "id", "G",
        xfmla="Y ~ x1", weights_name="wgt",
        control_group=control_group, allow_unbalanced_panel=False,
    )
    table = est.fit(est_method=est_method)
    assert len(table) == 8  # 2 cohorts × 4 comparison periods
    for _, row in table.iterrows():
        g, t = row["g"], row["t"]
        pret = (g - 1) if t >= g else (t - 1)
        y1, y0, D, X, w = _cell_arrays_panel(dgp, g, t, pret, control_group)
        att_ref, inf_ref = REF_PANEL[est_method](y1, y0, D, X, w)
        se_ref = np.sqrt(np.mean(inf_ref**2) / len(D))
        assert row["att"] == pytest.approx(att_ref, abs=1e-8), (g, t)
        assert row["se"] == pytest.approx(se_ref, rel=1e-6), (g, t)


@pytest.mark.parametrize("est_method", ["reg", "ipw", "dr"])
def test_rc_parity(spark, dgp, sdf, est_method):
    est = ATTgt(
        sdf, "Y", "period", "id", "G",
        xfmla="Y ~ x1", weights_name="wgt", panel=False,
    )
    table = est.fit(est_method=est_method)
    n_total = len(dgp)
    for _, row in table.iterrows():
        g, t = row["g"], row["t"]
        pret = (g - 1) if t >= g else (t - 1)
        y, post, D, X, w = _cell_arrays_rc(dgp, g, t, pret, "nevertreated")
        att_ref, inf_ref = REF_RC[est_method](y, post, D, X, w)
        n1 = len(D)
        # spark scales IF by n/n1 into the length-n universe
        se_ref = np.sqrt(np.sum(inf_ref**2)) / n1
        assert row["att"] == pytest.approx(att_ref, abs=1e-8), (g, t)
        assert row["se"] == pytest.approx(se_ref, rel=1e-6), (g, t)


def test_dgp_truth_recovery(spark, sdf):
    """Post-treatment ATT(g,t) should recover t-g+1; pre-treatment ~0."""
    est = ATTgt(sdf, "Y", "period", "id", "G", xfmla="Y ~ x1", allow_unbalanced_panel=False)
    table = est.fit(est_method="dr")
    for _, row in table.iterrows():
        truth = row["t"] - row["g"] + 1 if row["post"] else 0.0
        assert abs(row["att"] - truth) < 4 * row["se"] + 0.15, dict(row)


def test_universal_base_period(spark, sdf):
    est = ATTgt(sdf, "Y", "period", "id", "G", allow_unbalanced_panel=False)
    table = est.fit(est_method="reg", base_period="universal")
    # base-period cells are exact zeros
    zeros = table[(table["g"] - 1) == table["t"]]
    assert len(zeros) == 2
    assert (zeros["att"] == 0).all()

# Slow tier: deselected by the default `-m "not slow"` (pytest.ini) so the
# driver's time-budgeted gate runs the fast product surfaces; run everything
# with `python -m pytest tests/ -m "slow or not slow"` (round-close practice).
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
