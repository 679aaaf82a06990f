"""API-surface and property tests: callable est_method (reference
ATTgt.py:362-367 parity), summaries, and estimator invariances."""

from __future__ import annotations

import numpy as np
import pytest

from csdid_pyspark_spark.did import ATTgt
from tests import ref_drdid
from tests.test_did_parity import make_panel_dgp


@pytest.fixture(scope="module")
def dgp():
    return make_panel_dgp(n_units=200, periods=(1, 2, 3, 4), cohorts=(0, 3, 4), seed=21)


def _fit(spark, pdf, **kw):
    est = ATTgt(spark.createDataFrame(pdf), "Y", "period", "id", "G",
                xfmla="Y ~ x1", weights_name="wgt", allow_unbalanced_panel=False, **kw)
    est.fit(est_method=kw.pop("est_method", "dr") if "est_method" in kw else "dr")
    return est


def test_callable_est_method_matches_builtin(spark, dgp):
    """A custom kernel (the NumPy reference drdid) routed through
    applyInPandas must reproduce the built-in aggregation-pass kernel
    exactly — two entirely different execution paths, one answer."""

    def custom(y1, y0, D, i_weights, covariates):
        return ref_drdid.drdid_panel(y1, y0, D, covariates, i_weights)

    sdf = spark.createDataFrame(dgp)
    a = ATTgt(sdf, "Y", "period", "id", "G", xfmla="Y ~ x1", weights_name="wgt",
              allow_unbalanced_panel=False)
    builtin = a.fit(est_method="dr")
    b = ATTgt(sdf, "Y", "period", "id", "G", xfmla="Y ~ x1", weights_name="wgt",
              allow_unbalanced_panel=False)
    custom_t = b.fit(est_method=custom)
    for (_, r1), (_, r2) in zip(builtin.iterrows(), custom_t.iterrows()):
        assert r2["att"] == pytest.approx(r1["att"], abs=1e-8)
        assert r2["se"] == pytest.approx(r1["se"], rel=1e-6)


def test_summaries(spark, dgp):
    est = _fit(spark, dgp)
    s = est.summary()
    assert "Group-Time Average Treatment Effects" in s and "Control Group" in s
    out = est.compute_aggte("dynamic")
    s2 = out.summary()
    assert "event-study/dynamic" in s2 and "Event time" in s2


def test_invariance_unit_relabeling(spark, dgp):
    base = _fit(spark, dgp).fit_result.table
    relabeled = dgp.copy()
    relabeled["id"] = relabeled["id"] * 7919 + 13
    new = _fit(spark, relabeled).fit_result.table
    assert np.allclose(base["att"], new["att"], atol=1e-9)
    assert np.allclose(base["se"], new["se"], rtol=1e-7)


def test_invariance_time_translation(spark, dgp):
    base = _fit(spark, dgp).fit_result.table
    shifted = dgp.copy()
    shifted["period"] = shifted["period"] + 100
    shifted["G"] = np.where(shifted["G"] > 0, shifted["G"] + 100, 0)
    new = _fit(spark, shifted).fit_result.table
    assert np.allclose(base["att"], new["att"], atol=1e-9)
    assert np.allclose(new["g"] - base["g"], 100)


def test_invariance_weight_rescaling(spark, dgp):
    base = _fit(spark, dgp).fit_result.table
    scaled = dgp.copy()
    scaled["wgt"] = scaled["wgt"] * 17.0
    new = _fit(spark, scaled).fit_result.table
    assert np.allclose(base["att"], new["att"], atol=1e-9)
    assert np.allclose(base["se"], new["se"], rtol=1e-7)


def test_mllib_lsh_backends(spark):
    from csdid_pyspark_spark.operators import dedup, mllib_lsh, similarity
    from csdid_pyspark_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    exact = {(r["id_a"], r["id_b"]) for r in dedup.jaccard_pairs(docs, threshold=0.5).collect()}
    ml = {(r["id_a"], r["id_b"]) for r in
          mllib_lsh.minhash_lsh_pairs_mllib(docs, threshold=0.5).collect()}
    assert ml <= exact
    assert len(ml) / len(exact) >= 0.7

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    import pyspark.sql.functions as F

    q = list(emb.filter(F.col("vec_id") == 2).select("embedding").first()[0])
    out = mllib_lsh.ann_topk_mllib(emb, q, k=5)
    rows = out.collect()
    assert len(rows) == 5
    assert rows[0]["vec_id"] == 2 and rows[0]["dist"] == 0.0


def test_clustered_aggte_bootstrap(spark):
    """compute_aggte honors clustervars: cluster-collapsed bootstrap
    SEs are finite and differ from the unclustered ones."""
    import pandas as pd

    rng = np.random.default_rng(8)
    rows = []
    for i in range(300):
        g = float(rng.choice([0.0, 3.0]))
        cl = i % 15
        fe = rng.normal() + (cl - 7) * 0.3
        for t in (1, 2, 3, 4):
            tau = 1.5 if 0 < g <= t else 0.0
            rows.append((i, t, g, fe + 0.2 * t + tau + rng.normal(0, 0.3), cl))
    pdf = pd.DataFrame(rows, columns=["id", "t", "g", "y", "cl"])
    sdf = spark.createDataFrame(pdf)

    clustered = ATTgt(sdf, "y", "t", "id", "g", clustervars="cl", biters=199, seed=5,
                      allow_unbalanced_panel=False)
    clustered.fit("reg", bstrap=True)
    oc = clustered.compute_aggte("simple", bstrap=True)
    plain = ATTgt(sdf, "y", "t", "id", "g", biters=199, seed=5, allow_unbalanced_panel=False)
    plain.fit("reg", bstrap=True)
    op = plain.compute_aggte("simple", bstrap=True)
    assert np.isfinite(oc.overall_se) and np.isfinite(op.overall_se)
    assert oc.overall_att == pytest.approx(op.overall_att, abs=1e-9)  # point est unchanged
    assert abs(oc.overall_se - op.overall_se) > 1e-7  # clustering changes the SE

    # reference mboot.py:85-99 intended ≤2-way semantics: idname is an
    # implicit cluster — [idname, cl] ≡ "cl"; a second non-id var errors
    two_way = ATTgt(sdf, "y", "t", "id", "g", clustervars=["id", "cl"], biters=199,
                    seed=5, allow_unbalanced_panel=False)
    two_way.fit("reg", bstrap=True)
    ot = two_way.compute_aggte("simple", bstrap=True)
    assert ot.overall_se == pytest.approx(oc.overall_se, abs=1e-12)

    id_only = ATTgt(sdf, "y", "t", "id", "g", clustervars=["id"], biters=199,
                    seed=5, allow_unbalanced_panel=False)
    id_only.fit("reg", bstrap=True)
    oi = id_only.compute_aggte("simple", bstrap=True)
    assert oi.overall_se == pytest.approx(op.overall_se, abs=1e-12)

    from csdid_pyspark_spark.did.preprocess import DidError

    with pytest.raises(DidError, match="more than one cluster variable"):
        ATTgt(sdf, "y", "t", "id", "g", clustervars=["cl", "g"])
    with pytest.raises(DidError, match="not in data"):
        ATTgt(sdf, "y", "t", "id", "g", clustervars="nope")


def test_time_varying_cluster_variable_rejected(spark):
    """A cluster assignment that changes within unit over time is
    rejected (reference mboot.py:96-99 intent; its own check crashes)."""
    import pandas as pd

    rows = []
    for i in range(40):
        g = 3.0 if i % 2 else 0.0
        for t in (1, 2, 3):
            rows.append((i, t, g, float(i + t), (i + t) % 5))  # cl varies with t
    pdf = pd.DataFrame(rows, columns=["id", "t", "g", "y", "cl"])
    sdf = spark.createDataFrame(pdf)

    from csdid_pyspark_spark.did.preprocess import DidError

    with pytest.raises(DidError, match="varies over time"):
        ATTgt(sdf, "y", "t", "id", "g", clustervars="cl", allow_unbalanced_panel=False)


def test_plot_data_accessors(spark, dgp):
    """Plot-data frames are available without matplotlib."""
    from csdid_pyspark_spark.did.plots import aggte_plot_data, attgt_plot_data

    est = _fit(spark, dgp)
    pd_attgt = attgt_plot_data(est.fit_result.table)
    assert set(pd_attgt.columns) == {"g", "t", "att", "se", "lower", "upper", "phase"}
    assert set(pd_attgt["phase"].unique()) <= {"pre", "post"}
    out = est.compute_aggte("dynamic")
    pd_aggte = aggte_plot_data(out)
    assert "phase" in pd_aggte.columns and len(pd_aggte) == len(out.egt)


def test_mboot_covariance_matrix(spark):
    """K9: MbootResult.V is the bootstrap covariance of the draws
    (reference mboot.py:125, np.cov(bres, rowvar=False)) — diagonal
    consistent with the IQR-based SEs up to the sqrt(n) scaling."""
    import pandas as pd

    from csdid_pyspark_spark.did.mboot import mboot

    rng = np.random.default_rng(3)
    n = 400
    rows = []
    for u in range(n):
        for k in (0, 1):
            rows.append((k, u, float(rng.normal(0, 1 + k))))
    if_df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["cid", "uh", "inf_sc"])
    )
    mb = mboot(if_df, "cid", "uh", "inf_sc", n, biters=499, seed=11)
    assert mb.V is not None and mb.V.shape == (2, 2)
    assert np.allclose(mb.V, mb.V.T)
    # Var(bres_k) ≈ (sqrt(n)·se_k)² within bootstrap noise
    for i, k in enumerate(mb.keys):
        assert mb.V[i, i] == pytest.approx(n * mb.se[k] ** 2, rel=0.25)


def test_att_gt_aggte_convenience_wrappers(spark, dgp):
    """R did-style one-call API (att_gt/aggte) must produce the
    identical table and aggregation as the explicit
    construct-then-fit path."""
    from csdid_pyspark_spark.did import aggte, att_gt

    df = spark.createDataFrame(dgp)
    est = att_gt(df, yname="Y", tname="period", idname="id", gname="G",
                 est_method="reg", allow_unbalanced_panel=False)
    explicit = ATTgt(df, "Y", "period", "id", "G", allow_unbalanced_panel=False)
    explicit.fit(est_method="reg")
    a, b = est.fit_result.table, explicit.fit_result.table
    assert np.allclose(a["att"].to_numpy(), b["att"].to_numpy(), equal_nan=True)
    agg = aggte(est, "simple")
    explicit_agg = explicit.compute_aggte("simple")
    assert np.isclose(agg.overall_att, explicit_agg.overall_att)


def test_plot_data_golden_errorbar_semantics(spark, dgp):
    """Golden data-level parity with the reference's gplot/splot
    (reference plots.py:14-18, 62-68): every drawn error bar is
    symmetric, att ± c·att_se, points split by the post flag, and the
    dynamic event-study phase boundary sits at e == 0. Rendering
    cosmetics aside, these frames ARE the plots."""
    from csdid_pyspark_spark.did.plots import aggte_plot_data, attgt_plot_data

    est = _fit(spark, dgp)
    table = est.fit_result.table
    crit = est.fit_result.crit_val

    data = attgt_plot_data(table)
    # reference gplot: yerr = c * att_se, centered on att
    np.testing.assert_allclose(data["att"] - data["lower"], crit * data["se"], rtol=1e-12)
    np.testing.assert_allclose(data["upper"] - data["att"], crit * data["se"], rtol=1e-12)
    # reference pre/post split: post flag partitions the points
    merged = data.merge(table[["g", "t", "post"]], on=["g", "t"])
    assert (merged.loc[merged["post"] == 1, "phase"] == "post").all()
    assert (merged.loc[merged["post"] == 0, "phase"] == "pre").all()

    out = est.compute_aggte("dynamic")
    dyn = aggte_plot_data(out)
    np.testing.assert_allclose(dyn["att"] - dyn["lower"], out.crit_val_egt * dyn["se"], rtol=1e-12)
    np.testing.assert_allclose(dyn["upper"] - dyn["att"], out.crit_val_egt * dyn["se"], rtol=1e-12)
    assert (dyn.loc[dyn["egt"] >= 0, "phase"] == "post").all()
    assert (dyn.loc[dyn["egt"] < 0, "phase"] == "pre").all()


def test_plot_rendering_gated_and_smoke(spark):
    """Figure rendering (reference plots.py gplot/splot equivalents):
    without matplotlib the render functions must raise a pointed
    ImportError (the data-level functions stay available); with it, the
    figures must carry one axes per cohort / one errorbar series."""
    import pandas as pd
    import pytest

    from csdid_pyspark_spark.did import plots

    table = pd.DataFrame(
        {
            "g": [3.0, 3.0, 4.0, 4.0],
            "t": [2.0, 3.0, 2.0, 4.0],
            "post": [0, 1, 0, 1],
            "att": [0.1, 0.5, -0.1, 0.4],
            "se": [0.05, 0.06, 0.05, 0.07],
            "lower": [0.0, 0.38, -0.2, 0.26],
            "upper": [0.2, 0.62, 0.0, 0.54],
        }
    )
    try:
        import matplotlib  # noqa: F401
        have_mpl = True
    except ImportError:
        have_mpl = False

    if not have_mpl:
        with pytest.raises(ImportError, match="attgt_plot_data"):
            plots.plot_attgt(table)
        return

    fig = plots.plot_attgt(table)
    assert len(fig.axes) == 2  # one facet per cohort
    class _Dyn:
        typec = "dynamic"
        overall_att = 0.3
        overall_se = 0.05
        table = pd.DataFrame(
            {
                "egt": [-1.0, 0.0, 1.0],
                "att": [0.0, 0.3, 0.5],
                "se": [0.04, 0.05, 0.06],
                "lower": [-0.08, 0.2, 0.38],
                "upper": [0.08, 0.4, 0.62],
            }
        )

    fig2 = plots.plot_aggte(_Dyn())
    assert len(fig2.axes) == 1
    assert len(fig2.axes[0].collections) >= 1  # the scatter series


def test_chi2_sf_reference_values():
    from csdid_pyspark_spark.did.stats import chi2_sf

    # (x, k, scipy.stats.chi2.sf reference)
    for x, k, want in [
        (3.841458820694124, 1, 0.05),
        (5.991464547107979, 2, 0.05),
        (18.307038053275146, 10, 0.05),
        (124.34211340445888, 100, 0.05),
        (2.705543454095404, 1, 0.10),
        (1.0, 3, 0.8012519569012008),
        (50.0, 7, 1.4444852779215397e-08),
    ]:
        assert chi2_sf(x, k) == pytest.approx(want, rel=1e-9, abs=1e-15)
    assert chi2_sf(0.0, 5) == 1.0
    assert chi2_sf(float("inf"), 5) == 0.0
    with pytest.raises(ValueError):
        chi2_sf(1.0, 0)


def test_pretrend_test_null_vs_violation(spark):
    # Null: make_panel_dgp satisfies parallel trends by construction
    pdf = make_panel_dgp(n_units=400, periods=(1, 2, 3, 4, 5), cohorts=(0, 4, 5), seed=7)
    est = _fit(spark, pdf)
    null_res = est.pretrend_test()
    assert null_res["n_pre"] > 0 and null_res["dof"] >= 1
    assert np.isfinite(null_res["W"]) and null_res["W"] >= 0
    # under H0 an extreme p-value is (very) unlikely at this n
    assert null_res["pvalue"] > 1e-4

    # Violation: treated cohorts drift upward BEFORE treatment
    bad = pdf.copy()
    bad["Y"] = bad["Y"] + np.where(bad["G"] > 0, 1.5 * bad["period"], 0.0)
    est2 = _fit(spark, bad)
    bad_res = est2.pretrend_test()
    assert bad_res["pvalue"] < 1e-3
    assert bad_res["W"] > null_res["W"]


def test_pretrend_cell_bound_guard(spark, monkeypatch):
    """A degenerate design with more pre-cells than the O(m²) guard
    allows must fail loudly BEFORE assembling the covariance (the
    failure mode is a cohort column with unit-level granularity that
    would otherwise drive a silent multi-GB driver collect)."""
    from csdid_pyspark_spark.did import attgt as attgt_mod
    from csdid_pyspark_spark.did.preprocess import DidError

    pdf = make_panel_dgp(n_units=400, periods=(1, 2, 3, 4, 5), cohorts=(0, 4, 5), seed=7)
    est = _fit(spark, pdf)
    monkeypatch.setattr(attgt_mod, "PRETREND_MAX_CELLS", 1)
    with pytest.raises(DidError, match="O\\(m²\\)"):
        est.pretrend_test()
    # restoring the real bound, the same fitted estimator tests fine
    monkeypatch.setattr(attgt_mod, "PRETREND_MAX_CELLS", 500)
    assert est.pretrend_test()["n_pre"] > 1


def test_pretrend_requires_fit(spark, dgp):
    est = ATTgt(spark.createDataFrame(dgp), "Y", "period", "id", "G",
                xfmla="Y ~ x1", allow_unbalanced_panel=False)
    from csdid_pyspark_spark.did.preprocess import DidError

    with pytest.raises(DidError):
        est.pretrend_test()


def test_reference_method_surface(spark, dgp):
    """Method-level parity with the reference class: sum_gt /
    plot_attgt / plot_aggte exist as ATTgt methods (reference
    ATTgt.py:507,881,939)."""
    est = _fit(spark, dgp)
    assert est.sum_gt() == est.summary()
    try:
        import matplotlib  # noqa: F401
        have_mpl = True
    except ImportError:
        have_mpl = False
    if have_mpl:
        assert est.plot_attgt() is not None
        assert est.plot_aggte("dynamic") is not None
    else:
        with pytest.raises(ImportError, match="attgt_plot_data"):
            est.plot_attgt()

    bare = ATTgt(spark.createDataFrame(dgp), "Y", "period", "id", "G",
                 allow_unbalanced_panel=False)
    from csdid_pyspark_spark.did.preprocess import DidError

    with pytest.raises(DidError):
        bare.plot_attgt()



def test_bacon_decomposition_identities(spark):
    """Goodman-Bacon's theorem is EXACT on a balanced panel: the 2x2
    weights sum to 1 and the weighted 2x2 estimates sum to the
    directly-computed TWFE coefficient (Frisch-Waugh on the
    double-demeaned dummy). Checked on a staggered DGP with dynamic
    effects — the regime where TWFE is known to be misleading and the
    late-vs-early comparisons carry the bias."""
    import numpy as np

    from csdid_pyspark_spark.did.bacon import bacon_decompose

    rng = np.random.default_rng(11)
    rows = []
    for i in range(300):
        g = [0, 3, 5][i % 3]
        fe = rng.normal(0, 1)
        for t in range(1, 8):
            # dynamic effect grows with exposure -> TWFE biased
            tau = 0.5 * (t - g + 1) if 0 < g <= t else 0.0
            rows.append((i, t, g, fe + 0.2 * t + tau + rng.normal(0, 0.1)))
    pdf = spark.createDataFrame(rows, "id bigint, period int, g int, y double")
    decomp, beta = bacon_decompose(pdf)
    w_sum = sum(r[3] for r in decomp)
    wb_sum = sum(r[3] * r[4] for r in decomp)
    assert abs(w_sum - 1.0) < 1e-9
    assert abs(wb_sum - beta) < 1e-9
    types = {r[0] for r in decomp}
    assert types == {"treated_vs_never", "early_vs_late", "late_vs_early"}
    # the forbidden comparison exists and, under growing effects, its
    # 2x2 estimate understates the late group's true effect relative
    # to its clean treated-vs-never counterpart
    le = next(r for r in decomp if r[0] == "late_vs_early")
    tvn5 = next(r for r in decomp if r[0] == "treated_vs_never" and r[1] == 5.0)
    assert le[4] < tvn5[4]


def test_bacon_identities_always_treated_and_pooled_never(spark):
    """The exactness identities must survive the awkward cohorts: an
    ALWAYS-treated cohort (first treated before the window — zero
    weight as treated side, positive weight as the late-vs-early
    comparison group) and MULTIPLE never cohorts (g=0 plus a g far
    past the window) pooled unit-weighted."""
    import numpy as np

    from csdid_pyspark_spark.did.bacon import bacon_decompose

    rng = np.random.default_rng(23)
    rows = []
    for i in range(400):
        g = [0, 1, 4, 99][i % 4]  # 1 = always treated; 99 = never (past window)
        fe = rng.normal(0, 1)
        for t in range(2, 8):  # observed window starts AFTER cohort 1 treats
            tau = 0.8 if 0 < g <= t else 0.0
            rows.append((i, t, g, fe + 0.1 * t + tau + rng.normal(0, 0.1)))
    pdf = spark.createDataFrame(rows, "id bigint, period int, g int, y double")
    decomp, beta = bacon_decompose(pdf)
    assert abs(sum(r[3] for r in decomp) - 1.0) < 1e-9
    assert abs(sum(r[3] * r[4] for r in decomp) - beta) < 1e-9
    # the always-treated cohort appears ONLY as a late_vs_early control
    roles = {(r[0], r[1], r[2]) for r in decomp}
    assert ("late_vs_early", 4.0, 1.0) in roles
    assert not any(r[1] == 1.0 for r in decomp)


def test_sunab_matches_cs_dynamic_on_lags_diverges_on_leads(spark):
    """Sun-Abraham's IW lag coefficients (e >= 0) are numerically the
    Callaway-Sant'Anna dynamic aggregation with never-treated controls:
    the post-period CATT(g, g+e) cells use the same base period g-1 and
    the same cohort-share weights. The LEADS differ by construction —
    SA keeps the fixed e = -1 baseline while CS's pre-period cells use
    the varying base min(g, t) - 1 — so agreement on lags plus
    divergence on some lead pins that both sides compute what they
    claim (on data where the varying base actually moves: the sf0.001
    derived panel has cohorts at 3/4/5 over 6 periods)."""
    from csdid_pyspark_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    sa = {
        int(r["e"]): float(r["att_iw"])
        for r in QUERIES["did_sunab_event"](spark, sf).collect()
    }
    cs = {
        float(r["egt"]): float(r["att"])
        for r in QUERIES["did_aggte_dynamic"](spark, sf).collect()
    }
    lags = [e for e in sa if e >= 0]
    assert lags, "derived panel must have post periods"
    assert -1 not in sa, "e = -1 is the SA baseline, identically zero"
    for e in lags:
        assert abs(sa[e] - cs[float(e)]) < 2e-6, (e, sa[e], cs[float(e)])
    leads = [e for e in sa if e < -1]
    assert leads, "derived panel must have leads"
    assert any(abs(sa[e] - cs.get(float(e), float("nan"))) > 1e-6 for e in leads)


def test_synthetic_control_recovers_planted_combo_and_effect(spark):
    """Synthetic control on a panel where the treated unit is BY
    CONSTRUCTION a convex combination (0.5, 0.3, 0.2) of three donors
    plus a +2.0 effect from t0. Weight recovery is asserted on an
    IDENTIFIABLE pool (8 donors < 10 pre periods); with K donors >
    pre-periods any number of simplex combinations fit the pre window
    exactly, so on the wide 50-donor pool only the functional claims
    hold: ~0 pre gaps, att_post ~ 2.0, large RMSPE ratio (the
    placebo-test signature)."""
    import numpy as np

    from csdid_pyspark_spark.did.synth import synthetic_control

    rng = np.random.default_rng(7)
    T, t0 = 14, 10

    def build(n_donors):
        rows, base = [], {}
        for d in range(1, n_donors + 1):
            lvl, slope = rng.normal(10, 3), rng.normal(0.2, 0.1)
            base[d] = [lvl + slope * t + rng.normal(0, 0.05) for t in range(T)]
            rows += [(d, t, base[d][t]) for t in range(T)]
        treated = [
            0.5 * base[1][t] + 0.3 * base[2][t] + 0.2 * base[3][t]
            + (2.0 if t >= t0 else 0.0)
            for t in range(T)
        ]
        rows += [(0, t, treated[t]) for t in range(T)]
        return spark.createDataFrame(rows, "id bigint, period int, y double")

    # identifiable pool: 8 donors, 10 pre periods -> weights pinned
    panel8 = build(8)
    res = synthetic_control(panel8, treated_id=0, t0=t0, donor_k=8)
    w = res["weights"]
    assert abs(w.get(1, 0.0) - 0.5) < 0.05, w
    assert abs(w.get(2, 0.0) - 0.3) < 0.05, w
    assert abs(w.get(3, 0.0) - 0.2) < 0.05, w
    assert abs(sum(w.values()) - 1.0) < 1e-6
    pre_gaps = [g for t, _, _, g in res["series"] if t < t0]
    assert max(abs(g) for g in pre_gaps) < 0.1
    assert abs(res["att_post"] - 2.0) < 0.1
    assert res["rmspe_ratio"] > 10

    # determinism: a different partitioning yields identical weights
    res2 = synthetic_control(panel8.repartition(13), treated_id=0, t0=t0, donor_k=8)
    assert res2["weights"] == w

    # wide pool (underdetermined weights): the FIT still must be right
    panel50 = build(50)
    res50 = synthetic_control(panel50, treated_id=0, t0=t0, donor_k=50)
    pre_gaps = [g for t, _, _, g in res50["series"] if t < t0]
    assert max(abs(g) for g in pre_gaps) < 0.15
    assert abs(res50["att_post"] - 2.0) < 0.15
    assert res50["rmspe_ratio"] > 10


def test_synthetic_control_placebo_inference(spark):
    """In-space placebo test: with a REAL planted effect the treated
    unit's post/pre RMSPE ratio must beat every placebo donor's
    (p = 1/(K+1)); with NO effect the treated ratio must sit inside
    the placebo distribution (p not small). The placebo loop reuses
    the screened donor matrix — zero extra Spark jobs is the design
    claim; here we just pin the inference behavior."""
    import numpy as np

    from csdid_pyspark_spark.did.synth import placebo_test

    rng = np.random.default_rng(11)
    T, t0, D = 14, 10, 12
    base = {}
    rows = []
    for d in range(1, D + 1):
        lvl, slope = rng.normal(10, 2), rng.normal(0.2, 0.05)
        base[d] = [lvl + slope * t + rng.normal(0, 0.05) for t in range(T)]
        rows += [(d, t, base[d][t]) for t in range(T)]

    def with_treated(effect):
        treated = [
            0.6 * base[1][t] + 0.4 * base[2][t]
            + (effect if t >= t0 else 0.0)
            for t in range(T)
        ]
        return spark.createDataFrame(
            rows + [(0, t, treated[t]) for t in range(T)],
            "id bigint, period int, y double",
        )

    hit = placebo_test(with_treated(3.0), treated_id=0, t0=t0, donor_k=D)
    assert hit["p_value"] == 1.0 / (len(hit["placebo_ratios"]) + 1)
    assert hit["treated_ratio"] > max(hit["placebo_ratios"].values())
    assert abs(hit["att_post"] - 3.0) < 0.15

    null = placebo_test(with_treated(0.0), treated_id=0, t0=t0, donor_k=D)
    assert null["p_value"] > 0.2


def test_sunab_se_matches_numpy_influence_formula(spark):
    """sunab_event_se_frame vs a literal numpy transcription of the
    influence representation on a random balanced panel — including
    the cross-cohort covariance through shared never-treated units
    that naive per-cell SE combination drops (verified: the naive
    formula differs from the correct one on this panel, so the test
    would catch an implementation that quietly dropped the
    covariance)."""
    import numpy as np

    from csdid_pyspark_spark.did.robust_cells import (
        sunab_event_frame,
        sunab_event_se_frame,
    )

    rng = np.random.default_rng(3)
    periods = list(range(1, 7))
    units = [(i, [0, 3, 4, 5][i % 4]) for i in range(120)]
    y = {}
    rows = []
    for i, g in units:
        fe = rng.normal(0, 1)
        for t in periods:
            v = fe + 0.2 * t + (0.8 if 0 < g <= t else 0.0) + rng.normal(0, 0.3)
            y[(i, t)] = v
            rows.append((i, t, g, v))
    panel = spark.createDataFrame(rows, "id bigint, period int, g int, y double")

    got = {
        r["e"]: (r["att_iw"], r["se"], r["n_treated"])
        for r in sunab_event_se_frame(panel).collect()
    }
    base = {
        r["e"]: r["att_iw"] for r in sunab_event_frame(panel).collect()
    }
    assert set(got) == set(base)
    for e in base:
        assert got[e][0] == base[e]  # identical point estimates

    gs = [3, 4, 5]
    never = [i for i, g in units if g == 0]
    n0 = len(never)
    coh = {g: [i for i, gg in units if gg == g] for g in gs}
    for e in got:
        cells = [g for g in gs if (g + e) in periods and e != -1]
        n_e = sum(len(coh[g]) for g in cells)
        psi = {}
        naive_var = 0.0
        for g in cells:
            w = len(coh[g]) / n_e
            d_tr = {i: y[(i, g + e)] - y[(i, g - 1)] for i in coh[g]}
            d_c = {i: y[(i, g + e)] - y[(i, g - 1)] for i in never}
            mu_g = np.mean(list(d_tr.values()))
            mu_0 = np.mean(list(d_c.values()))
            for i, d in d_tr.items():
                psi[i] = psi.get(i, 0.0) + w * (d - mu_g) / len(coh[g])
            for i, d in d_c.items():
                psi[i] = psi.get(i, 0.0) - w * (d - mu_0) / n0
            naive_var += w * w * (
                np.var(list(d_tr.values())) / len(coh[g])
                + np.var(list(d_c.values())) / n0
            )
        se_np = float(np.sqrt(sum(v * v for v in psi.values())))
        assert abs(got[e][1] - round(se_np, 6)) < 2e-6, (e, got[e][1], se_np)
        assert got[e][2] == n_e
        if len(cells) > 1:
            # the shared-control covariance is REAL on this panel: the
            # naive independent-cell combination disagrees measurably
            assert abs(np.sqrt(naive_var) - se_np) > 1e-4


def _balanced_panel(spark, cohorts=(0, 3, 4), periods=range(1, 6), n_per=6):
    rows = []
    uid = 0
    for g in cohorts:
        for _ in range(n_per):
            for t in periods:
                tau = 0.5 if 0 < g <= t else 0.0
                rows.append((uid, int(t), int(g), 0.1 * t + tau + 0.01 * uid))
            uid += 1
    return spark.createDataFrame(rows, "id bigint, period int, g int, y double")


def test_robust_cells_raise_on_missing_required_cells(spark):
    """The r8 completeness guards (did/robust_cells.py::_req): absent
    never-treated cells / cohort base cells / unit base rows must RAISE
    instead of silently dropping cohorts through inner joins — the
    failure mode the round-7 advice flagged (plausible-but-wrong
    estimates on unbalanced input)."""
    import pytest

    # NOT pyspark.errors.SparkRuntimeException: when AQE materializes
    # two stages concurrently, BOTH guards fire and Spark wraps them in
    # a SparkException [STAGE_MATERIALIZATION_MULTIPLE_FAILURES] whose
    # type differs while the message survives — under host load the
    # type-strict assertion flaked. The guard's contract is the
    # MESSAGE, so that is what these match on.
    from csdid_pyspark_spark.did.robust_cells import (
        dcdh_frame,
        sunab_event_frame,
        sunab_event_se_frame,
    )

    import pyspark.sql.functions as F

    ok = _balanced_panel(spark)
    # healthy input: all three frames evaluate without raising
    assert sunab_event_frame(ok).collect()
    assert dcdh_frame(ok).collect()
    assert sunab_event_se_frame(ok).collect()

    # 1. no never-treated cohort at all -> control cells absent
    no_ctrl = ok.filter(F.col("g") != 0)
    with pytest.raises(Exception, match="never-treated"):
        sunab_event_frame(no_ctrl).collect()
    with pytest.raises(Exception, match="never-treated"):
        sunab_event_se_frame(no_ctrl).collect()

    # 2. a cohort missing its base period (g-1) cell
    no_base = ok.filter(~((F.col("g") == 4) & (F.col("period") == 3)))
    with pytest.raises(Exception, match="base-period"):
        sunab_event_frame(no_base).collect()
    with pytest.raises(Exception, match="pre-switch"):
        dcdh_frame(no_base).collect()

    # 3. dCDH: control pool exhausted at a switch period (drop every
    # control cell pair at t=4: never-treated AND not-yet-treated)
    no_pair = ok.filter(
        ~((F.col("g").isin(0, 5)) & (F.col("period").isin(3, 4)))
    )
    with pytest.raises(Exception, match="control"):
        dcdh_frame(no_pair).collect()

    # 4. SE path: one unit missing its base-period row
    drop_unit_row = ok.filter(
        ~((F.col("id") == 6) & (F.col("period") == 2) & (F.col("g") == 3))
    )
    with pytest.raises(Exception, match="missing its base-period"):
        sunab_event_se_frame(drop_unit_row).collect()


def test_sunab_band_covers_planted_profile(spark):
    """sunab_event_band_frame on a planted DGP (0.8 effect on lags, 0
    on leads): point estimates identical to the SE frame's, bootstrap
    SEs agree with the analytic plug-in within multiplier-bootstrap
    tolerance, the sup-t critical value dominates the pointwise 1.96
    (it must — the band covers |E| looks at once), the uniform band
    covers the planted truth at every event time, and the whole output
    is partitioning-invariant (seeded unit-hash draws)."""
    import numpy as np

    from csdid_pyspark_spark.did.robust_cells import (
        sunab_event_band_frame,
        sunab_event_se_frame,
    )

    rng = np.random.default_rng(3)
    periods = list(range(1, 7))
    units = [(i, [0, 3, 4, 5][i % 4]) for i in range(120)]
    rows = []
    for i, g in units:
        fe = rng.normal(0, 1)
        for t in periods:
            v = fe + 0.2 * t + (0.8 if 0 < g <= t else 0.0) + rng.normal(0, 0.3)
            rows.append((i, t, g, v))
    panel = spark.createDataFrame(rows, "id bigint, period int, g int, y double")

    band = {r["e"]: r.asDict() for r in sunab_event_band_frame(panel).collect()}
    se = {r["e"]: r.asDict() for r in sunab_event_se_frame(panel).collect()}
    assert set(band) == set(se)
    crit = next(iter(band.values()))["crit_val"]
    assert crit > 1.96, crit  # sup-t over several event times
    for e in band:
        assert band[e]["att_iw"] == se[e]["att_iw"]
        assert band[e]["n_treated"] == se[e]["n_treated"]
        # multiplier-bootstrap sigma vs analytic plug-in: same scale
        assert abs(band[e]["se_boot"] - se[e]["se"]) / se[e]["se"] < 0.25, (
            e, band[e]["se_boot"], se[e]["se"],
        )
        truth = 0.8 if e >= 0 else 0.0
        assert band[e]["band_lo"] <= truth <= band[e]["band_hi"], (e, band[e])

    again = {
        r["e"]: r.asDict()
        for r in sunab_event_band_frame(panel.repartition(13)).collect()
    }
    assert again == band  # seeded draws are partitioning-invariant


def test_honest_bounds_planted_violation(spark):
    """honest_bounds_frame on a DGP with a PLANTED linear parallel-
    trends violation (treated units drift by gamma per period relative
    to controls, on top of a true effect of 0.8): the naive M=0 CI
    excludes the truth (the violation biases every post coefficient by
    (e+1)*gamma), while the relative-magnitudes M=1 interval — whose
    width is calibrated from the observed pre-period slopes — covers
    it. Also: widths grow monotonically in both M and e, M=0
    reproduces the pointwise CI, and a profile without e <= -2 raises
    (nothing to calibrate s_pre from)."""
    import numpy as np
    import pytest

    from csdid_pyspark_spark.did.honest import honest_bounds_frame
    from csdid_pyspark_spark.did.robust_cells import sunab_event_se_frame

    gamma = 0.3
    rng = np.random.default_rng(11)
    periods = list(range(1, 7))
    units = [(i, [0, 3, 4, 5][i % 4]) for i in range(160)]
    rows = []
    for i, g in units:
        fe = rng.normal(0, 1)
        for t in periods:
            v = fe + 0.2 * t + rng.normal(0, 0.1)
            if g > 0:
                v += gamma * t  # the violation: a differential trend
                if g <= t:
                    v += 0.8  # the true effect
            rows.append((i, t, g, v))
    panel = spark.createDataFrame(rows, "id bigint, period int, g int, y double")

    prof = sunab_event_se_frame(panel)
    got = {
        (r["e"], r["mbar"]): r.asDict()
        for r in honest_bounds_frame(prof).collect()
    }
    es = sorted({e for e, _ in got})
    assert es and all(e >= 0 for e in es)
    for e in es:
        r0, r1 = got[(e, 0.0)], got[(e, 1.0)]
        # M=0 = pointwise CI: the planted bias (e+1)*gamma pushes it
        # off the truth entirely
        assert r0["set_lo"] == r0["set_hi"] == r0["att"]
        assert r0["ci_lo"] > 0.8, (e, r0)
        # M=1: pre-slope-calibrated set reaches back to the truth
        assert r1["ci_lo"] <= 0.8 <= r1["ci_hi"], (e, r1)
        # monotone widths in mbar and e
        widths = [
            got[(e, m)]["set_hi"] - got[(e, m)]["set_lo"]
            for m in (0.0, 0.5, 1.0, 1.5, 2.0)
        ]
        assert widths == sorted(widths)
    for m in (0.5, 1.0, 2.0):
        we = [got[(e, m)]["set_hi"] - got[(e, m)]["set_lo"] for e in es]
        assert we == sorted(we)

    # a profile without observed pre coefficients (nothing to
    # calibrate s_pre from) -> loud raise, not silent NULL widths
    lags_only = spark.createDataFrame(
        [(0, 0.8, 0.05), (1, 0.82, 0.05)], "e int, att_iw double, se double"
    )
    with pytest.raises(Exception, match="calibrate"):
        honest_bounds_frame(lags_only).collect()


def test_honest_smoothness_planted_curvature(spark):
    """honest_smoothness_frame separates the two violation shapes:

    (a) PLANTED LINEAR violation (gamma*t differential trend): Delta^SD
        extrapolates the boundary slope, so even the mbar = 0
        (zero-curvature) CI covers the truth — the case Delta^RM's
        M = 0 gets wrong (see test_honest_bounds_planted_violation).
    (b) PLANTED QUADRATIC violation (gamma*t^2) on a SINGLE cohort
        (multi-cohort aggregation with equal weights makes the
        aggregated pre profile exactly linear — composition shifts
        cancel the curvature, a fact this test tripped over): the
        linear extrapolation is biased and the mbar = 0 CI excludes
        the truth, while the observed pre-period curvature is exactly
        2*gamma, making the quadratic path the KNIFE-EDGE extremal
        path of Delta^SD(1) — so coverage is asserted at mbar = 1.5
        and the mbar = 1 set boundary is asserted to sit near the
        truth (the calibration is tight, not just wide).

    Plus: widths monotone in mbar and e, mbar = 0 is a point set, and
    degenerate profiles raise instead of emitting NULL bounds."""
    import numpy as np
    import pytest

    from csdid_pyspark_spark.did.honest import honest_smoothness_frame
    from csdid_pyspark_spark.did.robust_cells import sunab_event_se_frame

    def dgp(trend, cohorts):
        rng = np.random.default_rng(23)
        rows = []
        for i in range(400):
            g = cohorts[i % len(cohorts)]
            fe = rng.normal(0, 1)
            for t in range(1, 7):
                v = fe + 0.2 * t + rng.normal(0, 0.1)
                if g > 0:
                    v += trend(t)
                    if g <= t:
                        v += 0.8
                rows.append((i, t, g, v))
        return spark.createDataFrame(
            rows, "id bigint, period int, g int, y double"
        )

    # (a) linear violation: Delta^SD(0) debiases it away
    prof_lin = sunab_event_se_frame(dgp(lambda t: 0.3 * t, [0, 3, 4, 5]))
    got_lin = {
        (r["e"], r["mbar"]): r.asDict()
        for r in honest_smoothness_frame(prof_lin).collect()
    }
    es = sorted({e for e, _ in got_lin})
    assert es and all(e >= 0 for e in es)
    for e in es:
        r0 = got_lin[(e, 0.0)]
        assert r0["set_lo"] == r0["set_hi"]
        assert r0["ci_lo"] <= 0.8 <= r0["ci_hi"], (e, r0)

    # (b) quadratic violation, single cohort g = 4
    gamma = 0.15
    prof_quad = sunab_event_se_frame(
        dgp(lambda t: gamma * t * t, [0, 4])
    )
    got = {
        (r["e"], r["mbar"]): r.asDict()
        for r in honest_smoothness_frame(prof_quad).collect()
    }
    es = sorted({e for e, _ in got})
    assert es == [0, 1, 2]
    for e in es:
        r0 = got[(e, 0.0)]
        assert r0["set_lo"] == r0["set_hi"]  # mbar = 0 is a point
        assert r0["ci_lo"] > 0.8 or r0["ci_hi"] < 0.8, (e, r0)
        # mbar = 1.5: the quadratic path is the extremal (knife-edge)
        # member of Delta^SD(c_pre), so coverage is asserted strictly
        # above mbar = 1 — calibration noise is amplified by
        # (e+1)(e+2)/2, so the mbar = 1 boundary itself is only
        # checked at e = 0 below
        r15 = got[(e, 1.5)]
        assert r15["ci_lo"] <= 0.8 <= r15["ci_hi"], (e, r15)
        widths = [
            got[(e, m)]["set_hi"] - got[(e, m)]["set_lo"]
            for m in (0.0, 0.5, 1.0, 1.5, 2.0)
        ]
        assert widths == sorted(widths)
    for m in (0.5, 1.0, 2.0):
        we = [got[(e, m)]["set_hi"] - got[(e, m)]["set_lo"] for e in es]
        assert we == sorted(we)
    # knife-edge tightness at e = 0 (amplification factor 1): the
    # mbar = 1 set boundary lands essentially ON the truth
    assert abs(got[(0, 1.0)]["set_lo"] - 0.8) < 0.1, got[(0, 1.0)]

    # degenerate profiles raise loudly
    no_curvature = spark.createDataFrame(
        [(-2, 0.1, 0.05), (0, 0.8, 0.05)], "e int, att_iw double, se double"
    )
    with pytest.raises(Exception, match="curvature"):
        honest_smoothness_frame(no_curvature).collect()
    no_boundary_slope = spark.createDataFrame(
        [(-3, 0.1, 0.05), (0, 0.8, 0.05)], "e int, att_iw double, se double"
    )
    with pytest.raises(Exception, match="honest_smoothness_frame"):
        honest_smoothness_frame(no_boundary_slope).collect()


def test_bjs_imputation_matches_dummy_lstsq(spark):
    """bjs_imputation_frame (analytic unit-FE absorption + driver-side
    T x T solve) must equal the FULL-DUMMY least-squares brute force —
    unit + period dummies lstsq on untreated observations, impute,
    average by event time — to 6dp, and recover planted dynamic
    effects. Also: the two imputability guards raise on designs BJS
    itself calls unidentified."""
    import collections

    import numpy as np
    import pytest

    from csdid_pyspark_spark.did.imputation import bjs_imputation_frame

    rng = np.random.default_rng(7)
    rows = []
    true = {0: 0.5, 1: 0.9, 2: 1.3, 3: 1.7}
    for i in range(300):
        g = [0, 3, 4, 5][i % 4]
        a = rng.normal(0, 1)
        for t in range(1, 7):
            lam = 0.3 * t + 0.1 * (t % 2)  # non-linear time effects
            v = a + lam + rng.normal(0, 0.05)
            if g > 0 and t >= g:
                v += true[t - g]
            rows.append((i, t, g, v))
    panel = spark.createDataFrame(rows, "id bigint, period int, g int, y double")
    got = {r["e"]: r["att"] for r in bjs_imputation_frame(panel).collect()}

    unt = [(i, t, y) for (i, t, g, y) in rows if g == 0 or t < g]
    ids = sorted({i for i, _, _ in unt})
    ts = sorted({t for _, t, _ in unt})
    im = {v: k for k, v in enumerate(ids)}
    tm = {v: k for k, v in enumerate(ts)}
    X = np.zeros((len(unt), len(ids) + len(ts) - 1))
    yv = np.zeros(len(unt))
    for r, (i, t, y) in enumerate(unt):
        X[r, im[i]] = 1
        if tm[t] > 0:
            X[r, len(ids) + tm[t] - 1] = 1
        yv[r] = y
    coef, *_ = np.linalg.lstsq(X, yv, rcond=None)
    al = {i: coef[im[i]] for i in ids}
    lm = {ts[0]: 0.0}
    lm.update({t: coef[len(ids) + tm[t] - 1] for t in ts if tm[t] > 0})
    acc = collections.defaultdict(list)
    for (i, t, g, y) in rows:
        if g > 0 and t >= g:
            acc[t - g].append(y - al[i] - lm[t])
    for e, vals in acc.items():
        assert abs(got[e] - round(float(np.mean(vals)), 6)) < 1e-6, e
        assert abs(got[e] - true[e]) < 0.05, (e, got[e])

    # guard 1: treated unit with no untreated period (g = 1 treats
    # from the first period on)
    bad1 = spark.createDataFrame(
        [(1, t, 1, 1.0) for t in range(1, 4)]
        + [(2, t, 0, 0.0) for t in range(1, 4)],
        "id bigint, period int, g int, y double",
    )
    with pytest.raises(ValueError, match="no untreated"):
        bjs_imputation_frame(bad1).collect()

    # guard 2: a treated period no untreated unit reaches (all units
    # treated by t = 3, no never-treated cohort)
    bad2 = spark.createDataFrame(
        [(1, t, 2, 1.0) for t in range(1, 4)]
        + [(2, t, 3, 0.0) for t in range(1, 4)],
        "id bigint, period int, g int, y double",
    )
    with pytest.raises(ValueError, match="unidentified"):
        bjs_imputation_frame(bad2).collect()


def test_bjs_imputation_singular_design_raises(spark):
    """Two disconnected untreated period blocks (units observed
    untreated ONLY in periods {1,2} or ONLY in {3,4}, never both):
    time effects are not jointly identified and the lambda system is
    singular — the estimator must raise its named error, not emit
    numpy's bare LinAlgError or silent garbage."""
    import pytest

    from csdid_pyspark_spark.did.imputation import bjs_imputation_frame

    rows = []
    # block A: never-treated units observed only in periods 1-2
    for i in range(10):
        rows += [(i, 1, 0, 1.0), (i, 2, 0, 1.1)]
    # block B: never-treated units observed only in periods 3-4
    for i in range(10, 20):
        rows += [(i, 3, 0, 2.0), (i, 4, 0, 2.1)]
    # a treated unit anchored in block A, treated in period 3
    rows += [(30, 1, 3, 1.0), (30, 2, 3, 1.0), (30, 3, 3, 9.9)]
    panel = spark.createDataFrame(rows, "id bigint, period int, g int, y double")
    with pytest.raises(ValueError, match="singular"):
        bjs_imputation_frame(panel).collect()


def test_estimator_triad_agrees_on_planted_dgp(spark):
    """Triangulation across the four staggered-DiD estimators on ONE
    planted DGP (parallel trends hold, dynamic effect
    tau_e = 0.4*(e+1), homogeneous across cohorts): Callaway-
    Sant'Anna dynamic aggregation, Sun-Abraham IW, BJS imputation, and
    Wooldridge ETWFE (cells aggregated to event time with cell-size
    weights) must each recover the truth AND sit within noise of each
    other. They weight cohorts differently, so exact equality is not
    expected — but on a homogeneous-effect DGP disagreement beyond
    sampling noise means one implementation is wrong."""
    import collections

    import numpy as np

    from csdid_pyspark_spark.did.attgt import ATTgt, aggte
    from csdid_pyspark_spark.did.etwfe import etwfe_frame
    from csdid_pyspark_spark.did.imputation import bjs_imputation_frame
    from csdid_pyspark_spark.did.robust_cells import sunab_event_frame

    rng = np.random.default_rng(31)
    rows = []
    for i in range(400):
        g = [0, 3, 4, 5][i % 4]
        fe = rng.normal(0, 1)
        for t in range(1, 7):
            v = fe + 0.25 * t + 0.1 * (t % 3) + rng.normal(0, 0.1)
            if g > 0 and t >= g:
                v += 0.4 * (t - g + 1)
            rows.append((i, float(t), float(g), v))
    panel = spark.createDataFrame(rows, "id bigint, period double, g double, y double")

    est = ATTgt(panel, "y", "period", "id", "g", allow_unbalanced_panel=False)
    est.fit(est_method="dr")
    dyn = aggte(est, "dynamic")
    cs = {int(e): a for e, a in zip(dyn.egt, dyn.att_egt) if e >= 0}

    ipanel = panel.selectExpr(
        "id", "CAST(period AS INT) AS period", "CAST(g AS INT) AS g", "y"
    )
    sa = {
        int(r["e"]): float(r["att_iw"])
        for r in sunab_event_frame(ipanel).collect()
        if int(r["e"]) >= 0
    }
    bjs = {int(r["e"]): float(r["att"]) for r in bjs_imputation_frame(ipanel).collect()}

    acc = collections.defaultdict(lambda: [0.0, 0])
    for r in etwfe_frame(ipanel).collect():
        acc[int(r["e"])][0] += float(r["att"]) * int(r["n_cell"])
        acc[int(r["e"])][1] += int(r["n_cell"])
    etw = {e: s / n for e, (s, n) in acc.items()}

    es = sorted(cs)
    assert es == sorted(sa) == sorted(bjs) == sorted(etw) == [0, 1, 2, 3]
    for e in es:
        truth = 0.4 * (e + 1)
        for name, got in (("cs", cs), ("sa", sa), ("bjs", bjs), ("etwfe", etw)):
            assert abs(got[e] - truth) < 0.05, (name, e, got[e], truth)
        assert abs(cs[e] - sa[e]) < 0.05, (e, cs[e], sa[e])
        assert abs(cs[e] - bjs[e]) < 0.05, (e, cs[e], bjs[e])
        assert abs(cs[e] - etw[e]) < 0.05, (e, cs[e], etw[e])


def test_etwfe_matches_saturated_lstsq(spark):
    """etwfe_frame (one Gram aggregation + driver solve) must equal a
    numpy lstsq on the explicitly materialized saturated design to
    1e-6 per cell, and recover planted HETEROGENEOUS cell effects
    (tau varies by both cohort and event time — the case single-dummy
    TWFE garbles). Degenerate designs raise: all-treated panels have
    no untreated information."""
    import numpy as np
    import pytest

    from csdid_pyspark_spark.did.etwfe import etwfe_frame

    rng = np.random.default_rng(5)
    rows = []
    true = {}
    for i in range(200):
        g = [0, 3, 4, 5][i % 4]
        fe = rng.normal(0, 1)
        for t in range(1, 7):
            v = fe + 0.2 * t + 0.15 * (t % 2) + rng.normal(0, 0.1)
            if g > 0 and t >= g:
                tau = 0.3 * (t - g + 1) + 0.1 * g
                true[(g, t)] = tau
                v += tau
            rows.append((i, t, g, v))
    panel = spark.createDataFrame(rows, "id bigint, period int, g int, y double")
    got = {(r["g"], r["t"]): r["att"] for r in etwfe_frame(panel).collect()}
    assert set(got) == set(true)

    cohorts = [0, 3, 4, 5]
    periods = [1, 2, 3, 4, 5, 6]
    cells = sorted(true)

    def feat(g, t):
        x = [1.0 if g == c else 0.0 for c in cohorts]
        x += [1.0 if t == tt else 0.0 for tt in periods[1:]]
        x += [1.0 if (g, t) == c else 0.0 for c in cells]
        return x

    X = np.array([feat(g, t) for (i, t, g, y) in rows])
    Y = np.array([y for (i, t, g, y) in rows])
    coef, *_ = np.linalg.lstsq(X, Y, rcond=None)
    off = len(cohorts) + len(periods) - 1
    for k, (g, t) in enumerate(cells):
        assert abs(round(float(coef[off + k]), 6) - got[(g, t)]) < 2e-6, (g, t)
        assert abs(got[(g, t)] - true[(g, t)]) < 0.06, (g, t)

    all_treated = spark.createDataFrame(
        [(1, t, 1, 1.0) for t in range(1, 4)] + [(2, t, 1, 1.0) for t in range(1, 4)],
        "id bigint, period int, g int, y double",
    )
    with pytest.raises(ValueError, match="untreated"):
        etwfe_frame(all_treated).collect()


def test_bjs_se_matches_weight_bruteforce(spark):
    """bjs_imputation_se_frame's closed-form per-observation weights
    are verified by brute force: the estimator is LINEAR in y, so
    perturbing one observation at a time through the full-dummy lstsq
    reference implementation extracts every att_e weight numerically
    (att(y + e_k) - att(y) = c_k, exact for a linear map). The BJS
    conservative clustered variance rebuilt from those numerical
    weights and the same residual definitions must equal the Spark
    SEs to 6dp. Point estimates must equal bjs_imputation_frame's."""
    import collections

    import numpy as np

    from csdid_pyspark_spark.did.imputation import (
        bjs_imputation_frame,
        bjs_imputation_se_frame,
    )

    rng = np.random.default_rng(17)
    rows = []
    for i in range(80):
        g = [0, 3, 4, 5][i % 4]
        fe = rng.normal(0, 1)
        for t in range(1, 7):
            v = fe + 0.2 * t + rng.normal(0, 0.3)
            if g > 0 and t >= g:
                v += 0.5 * (t - g + 1)
            rows.append((i, t, g, v))
    panel = spark.createDataFrame(rows, "id bigint, period int, g int, y double")
    got = {
        int(r["e"]): (float(r["att"]), float(r["se"]))
        for r in bjs_imputation_se_frame(panel).collect()
    }
    pt = {int(r["e"]): float(r["att"]) for r in bjs_imputation_frame(panel).collect()}
    assert set(got) == set(pt)
    for e in pt:
        assert abs(got[e][0] - pt[e]) < 2e-6, e

    # ---- numpy reference: estimator as an explicit linear map -------
    unt_idx = [k for k, (i, t, g, y) in enumerate(rows) if g == 0 or t < g]
    ids = sorted({i for i, _, _, _ in rows})
    ts = sorted({t for _, t, _, _ in rows})
    im = {v: k for k, v in enumerate(ids)}
    tm = {v: k for k, v in enumerate(ts)}

    def att_of(yvec):
        X = np.zeros((len(unt_idx), len(ids) + len(ts) - 1))
        Y = np.zeros(len(unt_idx))
        for r, k in enumerate(unt_idx):
            i, t, g, _ = rows[k]
            X[r, im[i]] = 1
            if tm[t] > 0:
                X[r, len(ids) + tm[t] - 1] = 1
            Y[r] = yvec[k]
        coef, *_ = np.linalg.lstsq(X, Y, rcond=None)
        al = {i: coef[im[i]] for i in ids}
        lm = {ts[0]: 0.0}
        lm.update({t: coef[len(ids) + tm[t] - 1] for t in ts if tm[t] > 0})
        acc = collections.defaultdict(list)
        for k, (i, t, g, _) in enumerate(rows):
            if g > 0 and t >= g:
                acc[t - g].append(yvec[k] - al[i] - lm[t])
        return {e: float(np.mean(v)) for e, v in acc.items()}, al, lm

    y0 = np.array([y for (_, _, _, y) in rows])
    base_att, al0, lm0 = att_of(y0)
    events = sorted(base_att)
    n = len(rows)
    C = {e: np.zeros(n) for e in events}
    for k in range(n):
        yp = y0.copy()
        yp[k] += 1.0
        pert, _, _ = att_of(yp)
        for e in events:
            C[e][k] = pert[e] - base_att[e]

    # residuals, same definitions as the operator
    cellsum = collections.defaultdict(list)
    for k, (i, t, g, y) in enumerate(rows):
        if g > 0 and t >= g:
            cellsum[(g, t)].append(y - al0[i] - lm0[t])
    cellbar = {c: float(np.mean(v)) for c, v in cellsum.items()}
    eps = np.zeros(n)
    for k, (i, t, g, y) in enumerate(rows):
        if g == 0 or t < g:
            eps[k] = y - al0[i] - lm0[t]
        else:
            eps[k] = (y - al0[i] - lm0[t]) - cellbar[(g, t)]

    for e in events:
        unit_score = collections.defaultdict(float)
        for k, (i, t, g, y) in enumerate(rows):
            unit_score[i] += C[e][k] * eps[k]
        v_np = sum(s * s for s in unit_score.values())
        se_np = round(float(np.sqrt(v_np)), 6)
        assert abs(base_att[e] - got[e][0]) < 2e-6, e
        assert abs(se_np - got[e][1]) < 2e-5, (e, se_np, got[e][1])
        assert got[e][1] > 0


def test_augmented_synthetic_control_extrapolates_outside_hull(spark):
    """ASCM (Ben-Michael et al. 2021): a treated unit built as
    2*donor1 - 1*donor2 + effect sits OUTSIDE the donors' convex hull,
    so simplex SCM cannot close the pre-period imbalance — the ridge
    augmentation must (negative weights allowed), and the augmented
    post-period gap must recover the planted effect where SCM's is
    biased. Weights still sum to 1 (centered correction columns)."""
    import numpy as np

    rng = np.random.default_rng(11)
    T, t0 = 14, 10
    rows, base = [], {}
    for d in range(1, 9):
        lvl, slope = rng.normal(10, 3), rng.normal(0.2, 0.1)
        base[d] = [lvl + slope * t + rng.normal(0, 0.05) for t in range(T)]
        rows += [(d, t, base[d][t]) for t in range(T)]
    treated = [
        2.0 * base[1][t] - 1.0 * base[2][t] + (3.0 if t >= t0 else 0.0)
        for t in range(T)
    ]
    rows += [(0, t, treated[t]) for t in range(T)]
    panel = spark.createDataFrame(rows, "id bigint, period int, y double")

    from csdid_pyspark_spark.did.synth import (
        augmented_synthetic_control,
        synthetic_control,
    )

    scm = synthetic_control(panel, treated_id=0, t0=t0, donor_k=8)
    res = augmented_synthetic_control(
        panel, treated_id=0, t0=t0, donor_k=8, lam=0.1
    )
    # ridge correction closes the pre-window imbalance SCM cannot
    assert res["pre_rmspe"] < 0.2 * scm["pre_rmspe"], (
        res["pre_rmspe"], scm["pre_rmspe"],
    )
    assert abs(res["att_post"] - 3.0) < 0.25, res["att_post"]
    # SCM alone is materially biased on this DGP (that's the point)
    assert abs(res["att_post"] - 3.0) < abs(res["att_post_scm"] - 3.0)
    w = res["weights"]
    assert abs(sum(w.values()) - 1.0) < 1e-8
    assert min(w.values()) < -0.05  # genuinely extrapolating

    # determinism across partitionings
    res2 = augmented_synthetic_control(
        panel.repartition(13), treated_id=0, t0=t0, donor_k=8, lam=0.1
    )
    assert res2["weights"] == w


def test_synthetic_did_immune_to_level_shifts(spark):
    """SDID signature property (Arkhangelsky et al. 2021): a DGP with
    two-way structure y = alpha_i + beta_t + tau*D, where the treated
    unit's LEVEL sits far outside the donor hull. Plain SC cannot match
    the level (biased); SDID differences it out and recovers tau. Also
    pins: omega/lambda on the simplex, determinism across partitions."""
    import numpy as np

    from csdid_pyspark_spark.did.synth import synthetic_control, synthetic_did

    rng = np.random.default_rng(5)
    T, t0, tau = 14, 10, 4.0
    beta = rng.normal(0, 2, T)
    rows = []
    for d in range(1, 13):
        a = rng.normal(10, 3)
        for t in range(T):
            rows.append((d, t, float(a + beta[t] + rng.normal(0, 0.05))))
    # treated: level FAR above every donor + the same time effects
    for t in range(T):
        rows.append((0, t, float(100.0 + beta[t] + (tau if t >= t0 else 0.0)
                     + rng.normal(0, 0.05))))
    panel = spark.createDataFrame(rows, "id bigint, period int, y double")

    res = synthetic_did(panel, treated_id=0, t0=t0, donor_k=12)
    assert abs(res["att"] - tau) < 0.15, res["att"]
    assert abs(sum(res["omega"].values()) - 1.0) < 1e-9
    assert abs(sum(res["lam"].values()) - 1.0) < 1e-9
    assert all(w >= -1e-12 for w in res["omega"].values())
    assert all(w >= -1e-12 for w in res["lam"].values())
    # plain SC is materially biased on this DGP (the point of SDID)
    scm = synthetic_control(panel, treated_id=0, t0=t0, donor_k=12)
    assert abs(scm["att_post"] - tau) > 10 * abs(res["att"] - tau)

    res2 = synthetic_did(panel.repartition(13), treated_id=0, t0=t0, donor_k=12)
    assert res2["att"] == res["att"]
    assert res2["omega"] == res["omega"]


def test_synthetic_did_requires_post_periods(spark):
    import pytest as _pytest

    from csdid_pyspark_spark.did.synth import synthetic_did

    rows = [(d, t, float(d + t)) for d in range(3) for t in range(4)]
    panel = spark.createDataFrame(rows, "id bigint, period int, y double")
    with _pytest.raises(ValueError, match="no post-treatment"):
        synthetic_did(panel, treated_id=0, t0=99)


def test_synthetic_did_placebo_se(spark):
    """SDID placebo variance (Arkhangelsky et al. 2021 §4, Algorithm 4,
    N_tr = 1): with a planted effect well above the donor noise the
    two-sided p must be small and the planted tau must sit inside
    att +/- 3*se; with NO effect the p must not be small. Also pins:
    the point estimate is UNCHANGED by turning inference on (the
    oversampled screen does not move the real fit's donor set), and
    the whole thing is partition-invariant."""
    import numpy as np

    from csdid_pyspark_spark.did.synth import synthetic_did

    rng = np.random.default_rng(23)
    T, t0 = 14, 10
    beta = rng.normal(0, 2, T)
    rows = []
    for d in range(1, 25):
        a = rng.normal(10, 3)
        for t in range(T):
            rows.append((d, t, float(a + beta[t] + rng.normal(0, 0.3))))

    tr_noise = rng.normal(0, 0.3, T)  # drawn ONCE: with_treated must be
    # deterministic so repeated calls build the identical panel

    def with_treated(tau):
        out = list(rows)
        for t in range(T):
            out.append(
                (0, t, float(50.0 + beta[t] + (tau if t >= t0 else 0.0)
                             + tr_noise[t]))
            )
        return spark.createDataFrame(out, "id bigint, period int, y double")

    hit = synthetic_did(
        with_treated(6.0), treated_id=0, t0=t0, donor_k=12, placebo_se=True
    )
    assert hit["n_placebo"] >= 10
    assert hit["se"] > 0
    assert abs(hit["att"] - 6.0) < 3 * hit["se"] + 0.3
    assert hit["p_value"] < 0.05, (hit["att"], hit["se"], hit["p_value"])
    # point estimate identical to the no-inference fit
    base = synthetic_did(with_treated(6.0), treated_id=0, t0=t0, donor_k=12)
    assert hit["att"] == base["att"]
    # determinism across partitionings
    hit2 = synthetic_did(
        with_treated(6.0).repartition(13),
        treated_id=0, t0=t0, donor_k=12, placebo_se=True,
    )
    assert hit2["att"] == hit["att"] and hit2["se"] == hit["se"]

    null = synthetic_did(
        with_treated(0.0), treated_id=0, t0=t0, donor_k=12, placebo_se=True
    )
    assert null["p_value"] > 0.2, (null["att"], null["se"], null["p_value"])


def test_synthetic_did_staggered_recovers_cohort_effects(spark):
    """Staggered SDID: two adoption cohorts with DIFFERENT planted
    effects on a two-way-FE DGP; each cohort's SDID must recover its
    own tau and the overall att must be the N_g*T_post-weighted mean.
    Deterministic across partitionings."""
    import numpy as np

    from csdid_pyspark_spark.did.synth import synthetic_did_staggered

    rng = np.random.default_rng(31)
    T = 16
    beta = rng.normal(0, 2, T)
    taus = {10: 3.0, 12: -2.0}
    sizes = {10: 6, 12: 4}
    rows = []
    uid = 0
    for g, n in [(0, 30), (10, sizes[10]), (12, sizes[12])]:
        for _ in range(n):
            a = rng.normal(10, 3)
            for t in range(T):
                y = a + beta[t] + (taus[g] if g and t >= g else 0.0)
                rows.append((uid, int(g), t, float(y + rng.normal(0, 0.05))))
            uid += 1
    panel = spark.createDataFrame(rows, "id bigint, g int, period int, y double")

    res = synthetic_did_staggered(panel, donor_k=20)
    assert set(res["cohorts"]) == {10, 12}
    for g, tau in taus.items():
        c = res["cohorts"][g]
        assert abs(c["att"] - tau) < 0.15, (g, c)
        assert c["n_units"] == sizes[g]
        assert c["n_post"] == T - g
        assert c["weight"] == sizes[g] * (T - g)
    w10, w12 = sizes[10] * (T - 10), sizes[12] * (T - 12)
    expect = (
        w10 * res["cohorts"][10]["att"] + w12 * res["cohorts"][12]["att"]
    ) / (w10 + w12)
    assert abs(res["att"] - expect) < 1e-12

    res2 = synthetic_did_staggered(panel.repartition(13), donor_k=20)
    assert res2["att"] == res["att"]


def test_synthetic_did_staggered_guards(spark):
    import pytest as _pytest

    from csdid_pyspark_spark.did.synth import synthetic_did_staggered

    # only cohort g=1 (one pre period) -> no usable cohort
    rows = [(d, 0, t, float(d + t)) for d in range(5) for t in range(4)]
    rows += [(9, 1, t, float(t)) for t in range(4)]
    panel = spark.createDataFrame(rows, "id bigint, g int, period int, y double")
    with _pytest.raises(ValueError, match="no cohort"):
        synthetic_did_staggered(panel)


def test_synthetic_did_staggered_notyettreated(spark):
    """Every unit eventually treated (no never-treated pool): with
    control='notyettreated' the earlier cohorts use LATER adopters as
    donors over a post window truncated before the donors' own
    adoption, recover their planted effects, and placebo_se runs; the
    latest cohort is dropped (no donors for its treated periods).
    control='nevertreated' must raise on the same panel."""
    import numpy as np
    import pytest as _pytest

    from csdid_pyspark_spark.did.synth import synthetic_did_staggered

    rng = np.random.default_rng(37)
    T = 16
    beta = rng.normal(0, 2, T)
    taus = {6: 3.0, 8: -2.0, 14: 1.0}
    sizes = {6: 6, 8: 5, 14: 40}  # the late mass adopters are the pool
    rows = []
    uid = 0
    for g, n in sizes.items():
        for _ in range(n):
            a = rng.normal(10, 3)
            for t in range(T):
                y = a + beta[t] + (taus[g] if t >= g else 0.0)
                rows.append((uid, int(g), t, float(y + rng.normal(0, 0.05))))
            uid += 1
    panel = spark.createDataFrame(rows, "id bigint, g int, period int, y double")

    with _pytest.raises(ValueError, match="notyettreated"):
        synthetic_did_staggered(panel, donor_k=20)

    res = synthetic_did_staggered(panel, donor_k=20, control="notyettreated")
    # cohorts 6 and 8 estimable over the window [g, 13] (latest g=14
    # adopts at 14, so t_end = 13); cohort 14 itself has no donors
    assert set(res["cohorts"]) == {6, 8}
    for g in (6, 8):
        c = res["cohorts"][g]
        assert abs(c["att"] - taus[g]) < 0.15, (g, c)
        assert c["n_post"] == 14 - g  # [g, 13]
        assert c["weight"] == sizes[g] * (14 - g)

    # placebo inference over the not-yet-treated pools
    res_se = synthetic_did_staggered(
        panel, donor_k=12, n_placebo=20, placebo_se=True,
        control="notyettreated",
    )
    assert res_se["se"] > 0 and 0.0 <= res_se["p_value"] <= 1.0
    for g in (6, 8):
        assert res_se["cohorts"][g]["se"] >= 0.0

    # determinism across partitionings
    res2 = synthetic_did_staggered(
        panel.repartition(11), donor_k=20, control="notyettreated"
    )
    assert res2["att"] == res["att"]

    # mixed design: adding never-treated units keeps the full window
    # and the never-treated pool under BOTH control modes
    extra = []
    for _ in range(25):
        a = rng.normal(10, 3)
        for t in range(T):
            extra.append((uid, 0, t, float(a + beta[t] + rng.normal(0, 0.05))))
        uid += 1
    panel2 = spark.createDataFrame(
        rows + extra, "id bigint, g int, period int, y double"
    )
    m_nev = synthetic_did_staggered(panel2, donor_k=20)
    m_nyt = synthetic_did_staggered(
        panel2, donor_k=20, control="notyettreated"
    )
    assert m_nev["att"] == m_nyt["att"]
    assert m_nev["cohorts"][14]["n_post"] == T - 14


def test_ife_att_bands_cover_planted_effect(spark):
    """ife_att_bands on a noisy rank-1 factor DGP with a planted
    constant tau: the att path must be bit-identical to ife_att, the
    placebo se positive, every 95% band must cover the truth within a
    3-se slack, and the replicate machinery must be deterministic
    across partitionings."""
    import numpy as np

    from csdid_pyspark_spark.did.ife import ife_att, ife_att_bands

    rng = np.random.default_rng(41)
    f = [1.0, 0.5, -0.3, 0.8, -0.6, 0.2]
    periods = list(range(1, 7))
    tau = 2.5
    rows = []
    uid = 0
    for g, n in [(0, 40), (3, 10), (4, 8), (5, 6)]:
        for _ in range(n):
            a = rng.normal(1.0, 2.0)
            lam = rng.normal(1.5, 0.8)
            for j, t in enumerate(periods):
                y = a + lam * f[j] + (tau if 0 < g <= t else 0.0)
                rows.append((uid, t, int(g), float(y + rng.normal(0, 0.2))))
            uid += 1
    panel = spark.createDataFrame(rows, "id bigint, period int, g int, y double")

    base = {r["e"]: (r["att_ife"], r["n_units"]) for r in ife_att(panel).collect()}
    out = ife_att_bands(panel, b_reps=80).collect()
    assert {r["e"] for r in out} == set(base)
    for r in out:
        att, n = base[r["e"]]
        assert r["att_ife"] == att and r["n_units"] == n
        assert r["se_placebo"] > 0
        assert r["lo95"] < r["att_ife"] < r["hi95"]
        assert r["lo95"] - 3 * r["se_placebo"] < tau < r["hi95"] + 3 * r["se_placebo"], (
            r["e"], r["att_ife"], r["se_placebo"],
        )

    out2 = ife_att_bands(panel.repartition(13), b_reps=80).collect()
    assert sorted(map(tuple, out2)) == sorted(map(tuple, out))


def test_ife_att_bands_guard(spark):
    import pytest as _pytest

    from csdid_pyspark_spark.did.ife import ife_att_bands

    # controls only — ife_att itself would return an empty path, and
    # there is no cohort distribution to draw pseudo-adoptions from
    rows = [(u, t, 0, float(u + t)) for u in range(4) for t in range(1, 5)]
    panel = spark.createDataFrame(rows, "id bigint, period int, g int, y double")
    with _pytest.raises(ValueError, match="placebo bands"):
        ife_att_bands(panel, b_reps=10)


def test_synthetic_did_staggered_placebo_se(spark):
    """Staggered SDID Algorithm-4 placebo variance: pseudo-cohorts
    drawn per cohort from the oversampled screen pool, combined with
    the real weights per replicate. Point estimates must be unchanged
    by turning inference on; with planted effects far above the noise
    the overall p must be small; se positive overall and per cohort;
    deterministic across partitionings."""
    import numpy as np

    from csdid_pyspark_spark.did.synth import synthetic_did_staggered

    rng = np.random.default_rng(31)
    T = 16
    beta = rng.normal(0, 2, T)
    taus = {10: 3.0, 12: -2.0}
    sizes = {10: 6, 12: 4}
    rows = []
    uid = 0
    for g, n in [(0, 30), (10, sizes[10]), (12, sizes[12])]:
        for _ in range(n):
            a = rng.normal(10, 3)
            for t in range(T):
                y = a + beta[t] + (taus[g] if g and t >= g else 0.0)
                rows.append((uid, int(g), t, float(y + rng.normal(0, 0.05))))
            uid += 1
    panel = spark.createDataFrame(rows, "id bigint, g int, period int, y double")

    base = synthetic_did_staggered(panel, donor_k=20)
    res = synthetic_did_staggered(
        panel, donor_k=20, placebo_se=True, n_placebo=40
    )
    assert res["att"] == base["att"]
    for g in taus:
        assert res["cohorts"][g]["att"] == base["cohorts"][g]["att"]
        assert res["cohorts"][g]["se"] > 0
    assert res["se"] > 0
    assert res["n_placebo"] == 40
    assert res["p_value"] < 0.05, (res["att"], res["se"])

    res2 = synthetic_did_staggered(
        panel.repartition(13), donor_k=20, placebo_se=True, n_placebo=40
    )
    assert res2["se"] == res["se"] and res2["att"] == res["att"]


def test_conformal_test_rejects_real_effect_not_null(spark):
    """CWZ conformal test: with a large planted effect, H0: theta=0
    must be rejected at the 1/T-floor level while H0: theta=truth is
    not; the no-effect panel must not reject the true null. Also pins
    determinism across partitionings."""
    import numpy as np

    from csdid_pyspark_spark.did.synth import conformal_test

    rng = np.random.default_rng(17)
    T, t0 = 30, 24  # T1/T = 0.2 -> attainable p floor 1/30
    beta = rng.normal(0, 1.5, T)
    rows = []
    for d in range(1, 13):
        a = rng.normal(10, 2)
        for t in range(T):
            rows.append((d, t, float(a + beta[t] + rng.normal(0, 0.15))))

    def with_treated(tau):
        out = list(rows)
        # treated = convex donor combo + effect (inside the hull)
        for t in range(T):
            base = 0.5 * rows[t][2] + 0.5 * rows[T + t][2]
            out.append((0, t, float(base + (tau if t >= t0 else 0.0))))
        return spark.createDataFrame(out, "id bigint, period int, y double")

    hit = conformal_test(with_treated(8.0), treated_id=0, t0=t0)
    assert hit["p_value"] <= 2.0 / 30 + 1e-9, hit["p_value"]
    at_truth = conformal_test(with_treated(8.0), treated_id=0, t0=t0, theta0=8.0)
    assert at_truth["p_value"] > 0.2, at_truth["p_value"]
    null = conformal_test(with_treated(0.0), treated_id=0, t0=t0)
    assert null["p_value"] > 0.2, null["p_value"]

    again = conformal_test(
        with_treated(8.0).repartition(13), treated_id=0, t0=t0
    )
    assert again["p_value"] == hit["p_value"]
    assert again["stat"] == hit["stat"]


def test_conformal_interval_covers_planted_effect(spark):
    """Test inversion: the 90% conformal interval must cover the
    planted constant effect and exclude zero when the effect is far
    from it; the SDID point estimate sits inside."""
    import numpy as np

    from csdid_pyspark_spark.did.synth import conformal_interval

    rng = np.random.default_rng(29)
    T, t0, tau = 30, 24, 6.0
    beta = rng.normal(0, 1.5, T)
    rows = []
    for d in range(1, 13):
        a = rng.normal(10, 2)
        for t in range(T):
            rows.append((d, t, float(a + beta[t] + rng.normal(0, 0.15))))
    for t in range(T):
        base = 0.5 * rows[t][2] + 0.5 * rows[T + t][2]
        rows.append((0, t, float(base + (tau if t >= t0 else 0.0)
                                 + rng.normal(0, 0.15))))
    panel = spark.createDataFrame(rows, "id bigint, period int, y double")

    ci = conformal_interval(panel, treated_id=0, t0=t0, model="sdid")
    assert ci["lo"] <= tau <= ci["hi"], ci
    assert ci["lo"] > 0.0, ci  # excludes zero
    assert ci["lo"] <= ci["theta_hat"] <= ci["hi"]
    assert ci["p_at_hat"] > ci["alpha"]


def test_conformal_staggered_multi_treated(spark):
    """CWZ 2021 §4 multi-treated conformal: two cohorts of SEVERAL
    treated units with different planted constant effects; per cohort
    the test at theta0=0 rejects at the floor, the test at the truth
    does not, and the inverted interval covers the truth and excludes
    zero. Determinism across partitionings. Also: pooling shrinks the
    mean's noise — the multi-unit interval is no wider than the
    single-unit one on the same panel."""
    import numpy as np

    from csdid_pyspark_spark.did.synth import (
        conformal_staggered,
        conformal_test,
    )

    rng = np.random.default_rng(43)
    T = 30
    beta = rng.normal(0, 1.5, T)
    taus = {22: 6.0, 25: -4.0}
    rows = []
    uid = 100
    donor_y = {}
    for d in range(1, 15):
        a = rng.normal(10, 2)
        for t in range(T):
            y = float(a + beta[t] + rng.normal(0, 0.15))
            donor_y.setdefault(d, []).append(y)
            rows.append((d, 0, t, y))
    for g, tau in taus.items():
        for _ in range(5):
            w = rng.dirichlet(np.ones(4))
            picks = rng.choice(range(1, 15), size=4, replace=False)
            for t in range(T):
                base = float(sum(w[j] * donor_y[int(picks[j])][t] for j in range(4)))
                rows.append(
                    (uid, int(g), t,
                     float(base + (tau if t >= g else 0.0)
                           + rng.normal(0, 0.15)))
                )
            uid += 1
    panel = spark.createDataFrame(rows, "id bigint, g int, period int, y double")

    res = conformal_staggered(panel, donor_k=14)
    assert set(res["cohorts"]) == {22, 25}
    for g, tau in taus.items():
        c = res["cohorts"][g]
        assert c["n_units"] == 5
        assert c["p_value"] <= 2.0 / T + 1e-9, (g, c)  # rejects theta0=0
        assert c["lo"] <= tau <= c["hi"], (g, c)
        assert (c["lo"] > 0.0) if tau > 0 else (c["hi"] < 0.0), (g, c)
        assert abs(c["theta_hat"] - tau) < 1.0

    at_truth = conformal_staggered(
        panel, theta0=6.0, donor_k=14, interval=False
    )
    assert at_truth["cohorts"][22]["p_value"] > 0.2

    again = conformal_staggered(panel.repartition(13), donor_k=14)
    assert again["cohorts"][22]["p_value"] == res["cohorts"][22]["p_value"]
    assert again["cohorts"][22]["lo"] == res["cohorts"][22]["lo"]

    # single treated unit through the cohort path == conformal_test's
    # p-value on the same series (cohort mean of one unit is the unit)
    solo = [r for r in rows if r[1] == 0 or (r[1] == 22 and r[0] == 100)]
    spanel = spark.createDataFrame(
        solo, "id bigint, g int, period int, y double"
    )
    cs = conformal_staggered(spanel, donor_k=14, interval=False)
    ct = conformal_test(
        spanel.selectExpr("id", "period", "y"), treated_id=100, t0=22,
        donor_k=14, model="sdid",
    )
    assert cs["cohorts"][22]["p_value"] == ct["p_value"]


def test_conformal_trace_pointwise_bands(spark):
    """CWZ §4.2 per-period trace: with a planted TIME-VARYING effect
    path, each post period's pointwise conformal interval covers that
    period's true effect, the point gaps track the path, and periods
    with a large effect exclude zero. Other post periods' effects
    never contaminate a period's test (they are excluded from its
    refit)."""
    import numpy as np

    from csdid_pyspark_spark.did.synth import conformal_trace

    rng = np.random.default_rng(47)
    T, g = 30, 24
    path = {24: 2.0, 25: 4.0, 26: 6.0, 27: 6.0, 28: 8.0, 29: 10.0}
    beta = rng.normal(0, 1.5, T)
    rows = []
    donor_y = {}
    for d in range(1, 15):
        a = rng.normal(10, 2)
        for t in range(T):
            y = float(a + beta[t] + rng.normal(0, 0.15))
            donor_y.setdefault(d, []).append(y)
            rows.append((d, 0, t, y))
    for uid in (100, 101, 102, 103):
        w = rng.dirichlet(np.ones(4))
        picks = rng.choice(range(1, 15), size=4, replace=False)
        for t in range(T):
            base = float(sum(w[j] * donor_y[int(picks[j])][t] for j in range(4)))
            rows.append(
                (uid, g, t,
                 float(base + path.get(t, 0.0) + rng.normal(0, 0.15)))
            )
    panel = spark.createDataFrame(rows, "id bigint, g int, period int, y double")

    res = conformal_trace(panel, donor_k=14, alpha=0.1)
    trace = {s: (th, lo, hi) for s, e, th, lo, hi in res["cohorts"][g]}
    assert set(trace) == set(path)
    covered = 0
    for s, tau_s in path.items():
        th, lo, hi = trace[s]
        assert abs(th - tau_s) < 0.8, (s, th, tau_s)
        assert lo is not None and lo < hi and lo <= th <= hi, (s, lo, th, hi)
        if lo <= tau_s <= hi:
            covered += 1
        if tau_s >= 4.0:
            assert lo > 0.0, (s, lo)
    # pointwise 90% CIs: coverage is a distributional statement, so on
    # one draw allow a single miss across the six periods
    assert covered >= len(path) - 1, trace

    # determinism across partitionings
    res2 = conformal_trace(panel.repartition(11), donor_k=14, alpha=0.1)
    assert res2["cohorts"][g] == res["cohorts"][g]


def test_conformal_staggered_nyt_donor_pools(spark):
    """All-eventually-treated panel (no never-treated units): with
    control='notyettreated' the conformal family reuses staggered
    SDID's pool rule — later adopters as donors over a post window
    truncated before their own adoption — so exact conformal inference
    extends to designs the never-treated path must raise on. The
    latest (mass-adopter) cohort drops out; each earlier cohort's test
    rejects theta0=0, its interval covers the planted effect, and the
    per-period trace tracks it. On a MIXED panel (never-treated added)
    both control modes must coincide exactly."""
    import numpy as np
    import pytest as _pytest

    from csdid_pyspark_spark.did.synth import (
        conformal_staggered,
        conformal_trace,
    )

    rng = np.random.default_rng(37)
    # late adoption keeps T1 well under T0 after truncation — the
    # moving-block test needs the post block to be a MINORITY of the
    # window (CWZ's T1/T -> 0 regime); an early cohort whose truncated
    # window is majority-post would lose power by construction
    T = 24
    beta = rng.normal(0, 2, T)
    taus = {14: 3.0, 16: -2.0, 22: 1.0}
    sizes = {14: 6, 16: 5, 22: 40}
    rows = []
    uid = 0
    for g, n in sizes.items():
        for _ in range(n):
            a = rng.normal(10, 3)
            for t in range(T):
                y = a + beta[t] + (taus[g] if t >= g else 0.0)
                rows.append((uid, int(g), t, float(y + rng.normal(0, 0.05))))
            uid += 1
    panel = spark.createDataFrame(rows, "id bigint, g int, period int, y double")

    with _pytest.raises(ValueError, match="notyettreated"):
        conformal_staggered(panel, donor_k=20)
    with _pytest.raises(ValueError, match="notyettreated"):
        conformal_trace(panel, donor_k=20)

    res = conformal_staggered(panel, donor_k=20, control="notyettreated")
    # cohorts 14 and 16 over windows [g, 21] (t_end = 22 - 1); cohort
    # 22 has no donors and drops out
    assert set(res["cohorts"]) == {14, 16}
    for g in (14, 16):
        c = res["cohorts"][g]
        win_len = 22  # periods 0..21
        assert c["n_units"] == sizes[g]
        assert c["p_value"] <= 2.0 / win_len + 1e-9, (g, c)  # rejects 0
        assert abs(c["theta_hat"] - taus[g]) < 0.3, (g, c)
        assert c["lo"] is not None and c["lo"] <= taus[g] <= c["hi"], (g, c)
        assert (c["lo"] > 0.0) if taus[g] > 0 else (c["hi"] < 0.0), (g, c)

    tr = conformal_trace(panel, donor_k=20, control="notyettreated")
    assert set(tr["cohorts"]) == {14, 16}
    covered = total = 0
    for g in (14, 16):
        ss = [s for s, e, th, lo, hi in tr["cohorts"][g]]
        assert ss == list(range(g, 22))  # truncated: 21 is the last
        for s, e, th, lo, hi in tr["cohorts"][g]:
            assert abs(th - taus[g]) < 0.5, (g, s, th)
            assert lo is not None and lo < hi, (g, s)
            total += 1
            if lo <= taus[g] <= hi:
                covered += 1
    # pointwise 80% CIs over 14 periods: a distributional statement —
    # require well above half covered on this one draw
    assert covered >= 0.6 * total, (covered, total)

    # determinism across partitionings
    res2 = conformal_staggered(
        panel.repartition(11), donor_k=20, control="notyettreated"
    )
    assert res2["cohorts"][14] == res["cohorts"][14]

    # mixed design: with never-treated units both modes coincide
    # exactly (full windows, never-treated pools) and cohort 14 is back
    extra = []
    for _ in range(25):
        a = rng.normal(10, 3)
        for t in range(T):
            extra.append((uid, 0, t, float(a + beta[t] + rng.normal(0, 0.05))))
        uid += 1
    panel2 = spark.createDataFrame(
        rows + extra, "id bigint, g int, period int, y double"
    )
    m_nev = conformal_staggered(panel2, donor_k=20)
    m_nyt = conformal_staggered(panel2, donor_k=20, control="notyettreated")
    assert m_nev["cohorts"] == m_nyt["cohorts"]
    assert set(m_nev["cohorts"]) == {14, 16, 22}
    t_nev = conformal_trace(panel2, donor_k=20)
    t_nyt = conformal_trace(panel2, donor_k=20, control="notyettreated")
    assert t_nev["cohorts"] == t_nyt["cohorts"]

    with _pytest.raises(ValueError, match="control must be"):
        conformal_staggered(panel2, control="sideways")


def test_conformal_trace_pooled_power_on_heterogeneous_effects(spark):
    """CWZ §4 pooled-residual trace (r10 verdict item 8): a small
    cohort with OPPOSITE-SIGNED unit effects (+3 / -3, mean 0) is
    invisible to the mean-series trace — its per-period CIs cover 0 —
    but the pooled statistic S_t = sum_j |u_{j,t}| is inflated at
    every effect period regardless of sign, so the pooled p-value at
    c = 0 rejects: the power gain the pooled variant exists for.
    Under heterogeneity no constant sharp null fits all units, so the
    pooled pointwise CI is empty (None) — itself the diagnostic. On a
    HOMOGENEOUS cohort the pooled CI covers the common effect and
    excludes zero. Deterministic; max_units guard raises."""
    import numpy as np
    import pytest as _pytest

    from csdid_pyspark_spark.did.synth import (
        conformal_trace,
        conformal_trace_pooled,
    )

    rng = np.random.default_rng(53)
    T, g = 30, 24
    beta = rng.normal(0, 1.5, T)
    rows = []
    donor_y = {}
    for d in range(1, 15):
        a = rng.normal(10, 2)
        for t in range(T):
            y = float(a + beta[t] + rng.normal(0, 0.15))
            donor_y.setdefault(d, []).append(y)
            rows.append((d, 0, t, y))
    uid = 100
    taus = [3.0, 3.0, 3.0, -3.0, -3.0, -3.0]
    het_rows = list(rows)
    hom_rows = list(rows)
    for tau in taus:
        w = rng.dirichlet(np.ones(4))
        picks = rng.choice(range(1, 15), size=4, replace=False)
        for t in range(T):
            base = float(sum(w[j] * donor_y[int(picks[j])][t] for j in range(4)))
            noise = float(rng.normal(0, 0.15))
            het_rows.append(
                (uid, g, t, base + (tau if t >= g else 0.0) + noise)
            )
            hom_rows.append(
                (uid, g, t, base + (3.0 if t >= g else 0.0) + noise)
            )
        uid += 1
    het = spark.createDataFrame(het_rows, "id bigint, g int, period int, y double")
    hom = spark.createDataFrame(hom_rows, "id bigint, g int, period int, y double")

    # mean-series trace on the heterogeneous cohort: blind (covers 0)
    mean_tr = conformal_trace(het, donor_k=14, alpha=0.2, fw_iters=300)
    for s, e, th, lo, hi in mean_tr["cohorts"][g]:
        # effects cancel in the mean: the point gap and the ENTIRE CI
        # sit within noise scale of zero — nothing reveals the true
        # +-3 unit effects
        assert abs(th) < 0.8, (s, th)
        if lo is not None:
            assert abs(lo) < 0.8 and abs(hi) < 0.8, (s, lo, hi)

    pooled = conformal_trace_pooled(
        het, donor_k=14, alpha=0.2, fw_iters=300, grid_points=41
    )
    p_floor = 1.0 / (24 + 1)
    for s, e, th, lo, hi, p0 in pooled["cohorts"][g]:
        assert p0 <= p_floor + 1e-9, (s, p0)  # pooled stat detects
        assert lo is None and hi is None, (s, lo, hi)  # no constant fits

    # homogeneous cohort: pooled CI covers the common effect, excludes 0
    pooled_hom = conformal_trace_pooled(
        hom, donor_k=14, alpha=0.2, fw_iters=300, grid_points=41
    )
    covered = 0
    for s, e, th, lo, hi, p0 in pooled_hom["cohorts"][g]:
        assert p0 <= p_floor + 1e-9, (s, p0)
        assert abs(th - 3.0) < 0.8, (s, th)
        if lo is not None:
            assert lo > 0.0, (s, lo)
            # the pooled acceptance region is SHARPER than the grid
            # step (often a single accepted point), so coverage is a
            # grid-resolution statement
            if lo - 0.2 <= 3.0 <= hi + 0.2:
                covered += 1
    assert covered >= len(pooled_hom["cohorts"][g]) - 2

    again = conformal_trace_pooled(
        het.repartition(9), donor_k=14, alpha=0.2, fw_iters=300,
        grid_points=41,
    )
    assert again["cohorts"] == pooled["cohorts"]

    with _pytest.raises(ValueError, match="max_units"):
        conformal_trace_pooled(het, donor_k=14, max_units=3)


def test_conformal_staggered_pooled_constant_null(spark):
    """Full-window pooled moving-block test (CWZ §4): on the
    heterogeneous ±3 cohort the MEAN test cannot reject theta0=0 (the
    cohort-mean series is ~untreated) while the POOLED statistic
    rejects at the block floor and reports an EMPTY interval (no
    constant effect fits every unit); on the homogeneous cohort the
    pooled CI covers the common effect and excludes 0; with a single
    treated unit the pooled and mean p-values coincide exactly."""
    import numpy as np
    import pytest as _pytest

    from csdid_pyspark_spark.did.synth import (
        conformal_staggered,
        conformal_staggered_pooled,
    )

    rng = np.random.default_rng(59)
    T, g = 30, 24
    beta = rng.normal(0, 1.5, T)
    rows = []
    donor_y = {}
    for d in range(1, 15):
        a = rng.normal(10, 2)
        for t in range(T):
            y = float(a + beta[t] + rng.normal(0, 0.15))
            donor_y.setdefault(d, []).append(y)
            rows.append((d, 0, t, y))
    uid = 100
    het_rows, hom_rows = list(rows), list(rows)
    for tau in (3.0, 3.0, 3.0, -3.0, -3.0, -3.0):
        w = rng.dirichlet(np.ones(4))
        picks = rng.choice(range(1, 15), size=4, replace=False)
        for t in range(T):
            base = float(sum(w[j] * donor_y[int(picks[j])][t] for j in range(4)))
            noise = float(rng.normal(0, 0.15))
            het_rows.append((uid, g, t, base + (tau if t >= g else 0.0) + noise))
            hom_rows.append((uid, g, t, base + (3.0 if t >= g else 0.0) + noise))
        uid += 1
    het = spark.createDataFrame(het_rows, "id bigint, g int, period int, y double")
    hom = spark.createDataFrame(hom_rows, "id bigint, g int, period int, y double")

    mean_p = conformal_staggered(het, donor_k=14, interval=False)
    # mean test is blind: its p stays far above the 1/T block floor
    # the pooled test attains (the cohort-mean series is ~untreated,
    # so the rank is near-uniform — 0.27 on this draw)
    assert mean_p["cohorts"][g]["p_value"] >= 0.2

    pooled = conformal_staggered_pooled(
        het, donor_k=14, fw_iters=300, grid_points=41
    )
    c = pooled["cohorts"][g]
    assert c["p_value"] <= 2.0 / T + 1e-9  # pooled stat detects
    assert c["lo"] is None and c["hi"] is None  # no constant fits

    hom_pooled = conformal_staggered_pooled(
        hom, donor_k=14, fw_iters=300, grid_points=41
    )
    ch = hom_pooled["cohorts"][g]
    assert ch["p_value"] <= 2.0 / T + 1e-9
    assert ch["lo"] is not None and ch["lo"] > 0.0
    assert ch["lo"] - 0.3 <= 3.0 <= ch["hi"] + 0.3  # grid resolution

    # single treated unit: pooled == mean machinery exactly
    solo = [r for r in het_rows if r[1] == 0 or r[0] == 100]
    spanel = spark.createDataFrame(solo, "id bigint, g int, period int, y double")
    pm = conformal_staggered(spanel, donor_k=14, interval=False)
    pp = conformal_staggered_pooled(spanel, donor_k=14, interval=False)
    assert pp["cohorts"][g]["p_value"] == pm["cohorts"][g]["p_value"]

    with _pytest.raises(ValueError, match="max_units"):
        conformal_staggered_pooled(het, donor_k=14, max_units=3)


def test_fw_batch_bitwise_parity():
    """_fw_simplex_batch column g must be BIT-IDENTICAL to
    _frank_wolfe_simplex on Y[:, g] — the contract that lets the
    conformal grid inversions batch their refits without changing any
    pinned output. Exercises the shapes the conformal family uses
    (short pre windows, donor_k up to 50, grids up to 81) plus
    degenerate K=1/K=2 and duplicated-column designs."""
    from csdid_pyspark_spark.did.synth import (
        _frank_wolfe_simplex,
        _fw_simplex_batch,
    )

    rng = np.random.default_rng(123)
    shapes = [(4, 14, 41), (6, 25, 41), (8, 50, 81), (21, 50, 81),
              (12, 2, 7), (5, 1, 3)]
    for T, K, G in shapes:
        X = rng.standard_normal((T, K)) * 2.0 + 0.3
        Y = rng.standard_normal((T, G)) * 3.0 - 1.0
        W = _fw_simplex_batch(X, Y, iters=800)
        for g in range(G):
            w = _frank_wolfe_simplex(X, Y[:, g], iters=800)
            assert np.array_equal(W[:, g], w), (T, K, G, g)
    # duplicated donor columns: gradient TIES must break to the lowest
    # index identically in both paths (argmin first-index contract)
    X = rng.standard_normal((9, 6))
    X[:, 3] = X[:, 1]
    Y = rng.standard_normal((9, 11))
    W = _fw_simplex_batch(X, Y, iters=400)
    for g in range(11):
        assert np.array_equal(
            W[:, g], _frank_wolfe_simplex(X, Y[:, g], iters=400)
        )

# Slow tier: deselected by the default `-m "not slow"` (pytest.ini) so the
# driver's time-budgeted gate runs the fast product surfaces; run everything
# with `python -m pytest tests/ -m "slow or not slow"` (round-close practice).
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
