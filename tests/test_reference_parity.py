"""Golden head-to-head parity against the REFERENCE implementation.

Closes VERDICT.md "What's missing" #2: the reference's only published
ground truth (test_usage.ipynb cells 3-4: ATT(2,2)=0.9102, simple
4.3129, group 4.5278, calendar 3.6279) came off a local CSV
(``D:\\...\\5g10t.csv``) that is not in the repo, so the printed numbers
cannot be reproduced directly. The reproducible equivalent implemented
here: run the reference's OWN pipeline (``/root/reference/csdids`` —
orchestration code untouched) on a seeded 5g10t-shaped DGP, and assert
this engine produces the same numbers on the same data.

The reference's external dependencies are absent from this container,
so they are shimmed before import:

* ``tqdm`` / ``matplotlib`` / ``joblib`` — inert stand-ins (progress
  bars, plots, optional parallelism; none affect numerics).
* ``scipy.stats.norm.ppf`` — stdlib ``statistics.NormalDist().inv_cdf``
  (same function, exact).
* ``drdid`` — the external d2cml-ai/DRDID NumPy package the reference
  imports its kernels from (reference ATTgt.py:19). Backed here by
  ``tests/ref_drdid.py``, this repo's independent implementation of the
  same published Sant'Anna-Zhao (2020) formulas. The reference's
  ORCHESTRATION (preprocessing, cell slicing, IF scatter, aggte
  weighting — everything VERDICT flagged as unverified-against-the-
  reference) runs unmodified.

What is asserted:

* every ATT(g,t) point estimate matches to 1e-7 (45 cells, 5g10t);
* simple / group / calendar overall ATTs and per-egt estimates match
  to 1e-7 — the four headline golden quantities of the notebook;
* bootstrap SEs agree within a Monte-Carlo band where the two
  pipelines define the same inference units.

The engine runs with ``rc_slice="reference"`` because the reference's
RC slice keeps every unit's pre-period row (``GmC & post | tPret``,
ATTgt.py:381-389 — ``&`` binds tighter than ``|``); the engine's
default slice implements the R ``did`` semantics (treated ∪ control
only). Point estimates under the default slice are also checked to
agree on a single-treated-cohort design, where the two slices coincide.
"""

from __future__ import annotations

import math
import os
import statistics
import sys
import types

import numpy as np
import pandas as pd
import pytest

REF_DIR = "/root/reference"

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF_DIR, "csdids")),
        reason="reference checkout not available",
    ),
    # slow tier: deselected by the default `-m "not slow"` (pytest.ini)
    pytest.mark.slow,
]


# ---------------------------------------------------------------------------
# shims for the reference's absent dependencies
# ---------------------------------------------------------------------------

def _install_shims():
    if "tqdm" not in sys.modules:
        tq = types.ModuleType("tqdm")
        tq.tqdm = lambda it, *a, **k: it
        sys.modules["tqdm"] = tq

    if "matplotlib" not in sys.modules:
        mpl = types.ModuleType("matplotlib")
        plt = types.ModuleType("matplotlib.pyplot")

        def _noop(*a, **k):
            return None

        for name in (
            "figure", "plot", "subplots", "errorbar", "show", "axhline",
            "legend", "title", "scatter", "xticks", "axvline", "ylim",
            "xlabel", "ylabel", "tight_layout", "suptitle",
        ):
            setattr(plt, name, _noop)
        mpl.pyplot = plt
        sys.modules["matplotlib"] = mpl
        sys.modules["matplotlib.pyplot"] = plt

    if "joblib" not in sys.modules:
        jl = types.ModuleType("joblib")
        jl.Parallel = lambda *a, **k: (lambda tasks: [t() for t in tasks])
        jl.delayed = lambda fn: (lambda *a, **k: (lambda: fn(*a, **k)))
        sys.modules["joblib"] = jl

    if "scipy" not in sys.modules:
        nd = statistics.NormalDist()

        class _Norm:
            @staticmethod
            def ppf(q):
                if np.isscalar(q):
                    return nd.inv_cdf(float(q))
                return np.array([nd.inv_cdf(float(v)) for v in np.ravel(q)])

        sp = types.ModuleType("scipy")
        st = types.ModuleType("scipy.stats")
        st.norm = _Norm()
        st.mstats = types.SimpleNamespace()
        sp.stats = st
        sys.modules["scipy"] = sp
        sys.modules["scipy.stats"] = st

    if "drdid" not in sys.modules:
        import ref_drdid  # tests/ dir is on sys.path via conftest

        dr = types.ModuleType("drdid")
        drm = types.ModuleType("drdid.drdid")
        reg = types.ModuleType("drdid.reg_did")

        # reference call shapes (ATTgt.py:369-371, 432):
        #   panel: f(ypost, ypre, G, i_weights=w, covariates=X)
        #   rc:    f(y=Y, post=post, D=G, i_weights=w, covariates=X)
        def _panel(kern):
            def f(y1, y0, D, i_weights=None, covariates=None):
                return kern(
                    np.asarray(y1, float), np.asarray(y0, float),
                    np.asarray(D, float), np.asarray(covariates, float),
                    np.asarray(i_weights, float),
                )
            return f

        def _rc(kern):
            def f(y=None, post=None, D=None, i_weights=None, covariates=None):
                return kern(
                    np.asarray(y, float), np.asarray(post, float),
                    np.asarray(D, float), np.asarray(covariates, float),
                    np.asarray(i_weights, float),
                )
            return f

        drm.drdid_panel = _panel(ref_drdid.drdid_panel)
        drm.drdid_rc = _rc(ref_drdid.drdid_rc)
        reg.reg_did_panel = _panel(ref_drdid.reg_did_panel)
        reg.reg_did_rc = _rc(ref_drdid.reg_did_rc)
        dr.drdid = drm
        dr.reg_did = reg
        sys.modules["drdid"] = dr
        sys.modules["drdid.drdid"] = drm
        sys.modules["drdid.reg_did"] = reg


# ---------------------------------------------------------------------------
# seeded 5g10t-shaped DGP (5 treated cohorts x 10 periods + never-treated)
# ---------------------------------------------------------------------------

def _dgp_5g10t(n_per_cohort: int = 40, seed: int = 20260813) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    cohorts = [0, 2, 3, 4, 5, 6]
    periods = list(range(1, 11))
    rows = []
    uid = 0
    for g in cohorts:
        for _ in range(n_per_cohort):
            uid += 1
            eta = rng.normal(0.0, 1.0)
            for t in periods:
                delta = 0.1 * t
                tau = (1.0 + 0.5 * (t - g)) if (g > 0 and t >= g) else 0.0
                y = eta + delta + tau + rng.normal(0.0, 0.3)
                rows.append((uid, t, float(y), g))
    return pd.DataFrame(rows, columns=["id", "period", "Y", "G"])


def _dgp_1g(n_per_cohort: int = 60, seed: int = 7) -> pd.DataFrame:
    df = _dgp_5g10t(n_per_cohort, seed)
    return df[df["G"].isin([0, 4])].reset_index(drop=True)


def _run_reference(spark, pdf: pd.DataFrame):
    _install_shims()
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    from csdids.ATTgt import ATTgt as RefATTgt

    # The reference was written against Spark<4 legacy coercion
    # (boolean == 1 comparisons, ATTgt.py:382); restore it for the run.
    ansi_before = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        sdf = spark.createDataFrame(pdf)
        est = RefATTgt(yname="Y", tname="period", idname="id", gname="G", data=sdf)
        np.random.seed(20260813)  # reference mboot uses the global RNG
        est.fit(est_method="dr", bstrap=True)
        return _collect_reference(est)
    finally:
        if ansi_before is not None:
            spark.conf.set("spark.sql.ansi.enabled", ansi_before)


def _collect_reference(est):
    out = {
        "attgt": pd.DataFrame(
            {
                "g": est.output["group"],
                "t": est.output["time"],
                "att": est.output["att"],
                "se": est.output["se"],
            }
        )
    }
    for typec in ("simple", "group", "calendar"):
        est.compute_aggte(na_rm=False, typec=typec, print_=False)
        agg = est.summary_aggte[typec]
        out[typec] = {
            "overall_att": float(np.asarray(agg["overall_att"]).ravel()[0]),
            "overall_se": float(np.asarray(agg["overall_se"]).ravel()[0]),
            "egt": None if agg["egt"] is None else list(np.ravel(agg["egt"])),
            "att_egt": None if agg["att_egt"] is None else list(np.ravel(agg["att_egt"])),
            "se_egt": None if agg["se_egt"] is None else list(np.ravel(agg["se_egt"])),
        }
    return out


def _run_engine(spark, pdf: pd.DataFrame, rc_slice: str):
    from csdid_pyspark_spark.did import ATTgt

    sdf = spark.createDataFrame(pdf)
    est = ATTgt(
        sdf,
        yname="Y",
        tname="period",
        idname="id",
        gname="G",
        panel=False,  # the reference flips to RC under its defaults
        # reference default control_group is the LIST ['nevertreated',
        # 'notyettreated']; fit's `control_group == 'nevertreated'`
        # check is therefore always False, so its defaults actually run
        # the not-yet-treated control branch (ATTgt.py:268-270, 309-325)
        control_group="notyettreated",
        rc_slice=rc_slice,
        biters=1000,
    )
    est.fit(est_method="dr", bstrap=True)
    out = {"attgt": est.fit_result.table[["g", "t", "att", "se"]].copy()}
    for typec in ("simple", "group", "calendar"):
        agg = est.compute_aggte(typec=typec)
        out[typec] = {
            "overall_att": agg.overall_att,
            "overall_se": agg.overall_se,
            "egt": agg.egt,
            "att_egt": agg.att_egt,
            "se_egt": agg.se_egt,
        }
    est.unpersist()
    return out


@pytest.fixture(scope="module")
def head_to_head(spark):
    pdf = _dgp_5g10t()
    return _run_reference(spark, pdf), _run_engine(spark, pdf, rc_slice="reference")


def _att_map(df: pd.DataFrame) -> dict[tuple[int, int], float]:
    return {
        (int(r.g), int(r.t)): float(r.att)
        for r in df.itertuples()
        if not math.isnan(float(r.att))
    }


def test_attgt_point_estimates_match_reference(head_to_head):
    ref, eng = head_to_head
    rmap, emap = _att_map(ref["attgt"]), _att_map(eng["attgt"])
    assert set(rmap) == set(emap)
    assert len(rmap) == 45  # 5 cohorts x 9 varying-base cells
    for key in rmap:
        assert emap[key] == pytest.approx(rmap[key], abs=1e-7), key


def test_aggte_point_estimates_match_reference(head_to_head):
    ref, eng = head_to_head
    for typec in ("simple", "group", "calendar"):
        assert eng[typec]["overall_att"] == pytest.approx(
            ref[typec]["overall_att"], abs=1e-7
        ), typec
    for typec in ("group", "calendar"):
        assert list(map(float, eng[typec]["egt"])) == pytest.approx(
            list(map(float, ref[typec]["egt"]))
        )
        assert list(map(float, eng[typec]["att_egt"])) == pytest.approx(
            list(map(float, ref[typec]["att_egt"])), abs=1e-7
        )


def test_bootstrap_ses_same_scale(head_to_head):
    """SEs are NOT expected to be equal: the reference's RC path sums
    IFs per id (rowid=idname, ATTgt.py:186-189) while this engine's
    true-RC path treats each observation row as the inference unit, and
    both are Monte-Carlo draws (biters=1000). Assert the reference SEs
    are finite/positive and within a loose common-scale band of ours —
    a guard against either side being off by an n-scaling factor."""
    ref, eng = head_to_head
    merged = ref["attgt"].merge(eng["attgt"], on=["g", "t"], suffixes=("_r", "_e"))
    merged = merged[merged["att_r"].notna()]
    ratios = (merged["se_e"] / merged["se_r"]).to_numpy(dtype=float)
    assert np.isfinite(ratios).all()
    assert (ratios > 0.4).all() and (ratios < 2.5).all(), ratios


def test_default_slice_matches_reference_when_single_cohort(spark):
    """With one treated cohort + never-treated, the reference's
    pre-period slice quirk is inert, so the engine's DEFAULT (R did)
    slice must reproduce the reference numbers too."""
    pdf = _dgp_1g()
    ref = _run_reference(spark, pdf)
    eng = _run_engine(spark, pdf, rc_slice="did")
    rmap, emap = _att_map(ref["attgt"]), _att_map(eng["attgt"])
    assert set(rmap) == set(emap)
    for key in rmap:
        assert emap[key] == pytest.approx(rmap[key], abs=1e-7), key
    assert eng["simple"]["overall_att"] == pytest.approx(
        ref["simple"]["overall_att"], abs=1e-7
    )
