"""RR conditional/hybrid inference for Δ^SDRM
(did/honest.py::honest_sdrm_ci_frame) — polyhedral-decomposition
correctness vs the published definition, planted-noise coverage for
both test variants, power outside the identified set, convergence to
the plug-in set as noise -> 0, shape-restriction tightening, and
determinism of the frame."""

import numpy as np
import pytest

from csdid_pyspark_spark.did.honest import (
    _arp_accepts,
    _cone_tests,
    _sdrm_polyhedra,
)

# DGP: k=3 observed pre coefficients, m=3 posts. delta (pre ascending
# [-4,-3,-2], posts ascending [0,1,2]; delta_{-1} == 0): pre
# curvatures c_{-3} = 0.3, c_{-2} = -0.2 (max |c_pre| = 0.3); post
# deltas built with every restricted curvature AT the +0.3 boundary of
# Delta^SDRM(1): s_last = -0.1, slopes 0.2/0.5/0.8 -> deltas
# 0.2/0.7/1.5. tau_post = (1,1,1). Plug-in identified set for the
# event-1 effect: center 1.7 + 2*0.1 = 1.9, half 0.3*3 = 0.9 ->
# [1.0, 2.8].
K, M_POST = 3, 3
DELTA = np.array([0.2, 0.0, 0.1, 0.2, 0.7, 1.5])
TAU = np.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0])
BETA = DELTA + TAU
SET_E1 = (1.0, 2.8)


def _sdrm_accepts(beta, Sig, mbar, j_t, theta0, alpha=0.05, hybrid=False,
                  rng=None, lf_sims=400):
    """Numpy-level harness mirroring honest_sdrm_ci_frame's inner
    loop (shared _cone_tests builder)."""
    kappa = alpha / 10.0 if hybrid else 0.0
    polys = _sdrm_polyhedra(K, M_POST, mbar)
    tests = _cone_tests(
        polys, beta, Sig, K, M_POST, j_t, hybrid, kappa, lf_sims, rng
    )
    return any(
        _arp_accepts(y0 - theta0 * a_t, Sy, verts, alpha, lf_cv, kappa)
        for (y0, a_t, Sy, verts, lf_cv) in tests
    )


def test_sdrm_polyhedra_characterize_the_union():
    """delta is in Delta^SDRM(mbar) iff SOME cone holds — brute force
    against the published definition on random draws."""
    rng = np.random.default_rng(3)
    mbar = 1.0
    polys = _sdrm_polyhedra(K, M_POST, mbar)
    assert len(polys) == 2 * (K - 1)

    def in_sdrm(x):
        d = {-4: x[0], -3: x[1], -2: x[2], -1: 0.0,
             0: x[3], 1: x[4], 2: x[5]}

        def c(t):
            return d[t + 1] - 2 * d[t] + d[t - 1]

        pre = [abs(c(s)) for s in range(-K, -1)]
        res = [abs(c(t)) for t in range(-1, M_POST - 1)]
        return max(res) <= mbar * max(pre) + 1e-12

    for _ in range(20_000):
        x = rng.standard_normal(6)
        assert in_sdrm(x) == any((A @ x <= 1e-12).all() for A in polys)


def test_sdrm_boundary_dgp_is_in_the_union():
    assert any((A @ DELTA <= 1e-12).all()
               for A in _sdrm_polyhedra(K, M_POST, 1.0))
    # and strictly OUTSIDE a tighter restriction
    assert not any((A @ DELTA <= 1e-12).all()
                   for A in _sdrm_polyhedra(K, M_POST, 0.5))


def test_sdrm_needs_one_observed_pre_curvature():
    with pytest.raises(ValueError, match="k >= 2"):
        _sdrm_polyhedra(1, 2, 1.0)


@pytest.mark.parametrize("hybrid", [False, True])
def test_sdrm_coverage_at_true_theta(hybrid):
    """Rejection rate at the TRUE theta with delta on the boundary of
    Delta^SDRM(1) stays within alpha + 3 binomial SEs."""
    Sig = 0.04 * np.eye(6) + 0.01
    L = np.linalg.cholesky(Sig)
    rng = np.random.Generator(np.random.PCG64(13))
    n, rej = 150, 0
    for _ in range(n):
        b = BETA + L @ rng.standard_normal(6)
        if not _sdrm_accepts(b, Sig, 1.0, 1, 1.0, hybrid=hybrid, rng=rng):
            rej += 1
    assert rej / n <= 0.05 + 3 * np.sqrt(0.05 * 0.95 / n)


def test_sdrm_power_outside_identified_set():
    """theta0 well outside [1.0, 2.8] rejects most draws; the interior
    essentially never does."""
    Sig = 0.0025 * np.eye(6)
    L = np.linalg.cholesky(Sig)
    rng = np.random.Generator(np.random.PCG64(17))
    rej_out = rej_in = 0
    n = 60
    for _ in range(n):
        b = BETA + L @ rng.standard_normal(6)
        if not _sdrm_accepts(b, Sig, 1.0, 1, 4.2):
            rej_out += 1
        if not _sdrm_accepts(b, Sig, 1.0, 1, 1.9):
            rej_in += 1
    assert rej_out / n >= 0.8
    assert rej_in / n <= 0.05


def test_sdrm_ci_converges_to_identified_set(spark):
    """With se -> 0 the accepted hull equals the plug-in identified
    set (grid-step tolerance) — the Delta^SD set at M = mbar * c_pre,
    which is what the docstring promises the grid is anchored on."""
    from csdid_pyspark_spark.did.honest import honest_sdrm_ci_frame

    rows = [
        (int(e), float(b), 1e-5)
        for e, b in zip([-4, -3, -2, 0, 1, 2], BETA)
    ]
    prof = spark.createDataFrame(rows, "e int, att_iw double, se double")
    out = {
        (r["e"], r["mbar"]): r
        for r in honest_sdrm_ci_frame(
            prof, mbars=(1.0,), hybrid=False, grid_points=481
        ).collect()
    }
    r1 = out[(1, 1.0)]
    # grid spans center +- (|shift| + 0.9 + 1e-4): step ~ 2*1.1/480
    step = 2 * (0.2 + 0.9 + 1e-4) / 480
    assert r1["ci_lo"] == pytest.approx(SET_E1[0], abs=3 * step)
    assert r1["ci_hi"] == pytest.approx(SET_E1[1], abs=3 * step)


def test_sdrm_frame_deterministic_and_min_k(spark):
    from csdid_pyspark_spark.did.honest import honest_sdrm_ci_frame

    rows = [(-3, 0.05, 0.02), (-2, -0.03, 0.02), (0, 1.0, 0.03),
            (1, 1.1, 0.03), (2, 0.9, 0.04)]
    prof = spark.createDataFrame(rows, "e int, att_iw double, se double")
    a = honest_sdrm_ci_frame(prof).collect()
    b = honest_sdrm_ci_frame(prof).collect()
    assert a == b
    assert all(r["method"] == "sdrm-hybrid" for r in a)
    # k = 1 (only e = -2 observed) cannot calibrate a pre curvature
    short = spark.createDataFrame(
        [(-2, 0.01, 0.02), (0, 1.0, 0.03)], "e int, att_iw double, se double"
    )
    with pytest.raises(ValueError, match="need >= 2"):
        honest_sdrm_ci_frame(short).collect()


def test_sdrm_shape_restriction_tightens_and_stays_valid(spark):
    """RR §2.4 variants on Delta^SDRM under se -> 0 (where containment
    is an exact SET property): bias_pos (post deltas all >= 0 in the
    DGP) shrinks every CI inside the unrestricted one — for e=1 the
    restricted set is [beta_1 - 0.7, beta_1] = [1.0, 1.7] (delta_1 in
    [0, 0.7] once delta_0 >= 0 binds the descent) — and still covers
    tau = 1; monotone_inc correctly EMPTIES the CI because the DGP's
    pre steps are non-monotone (delta_{-3} - delta_{-4} = -0.2 < 0)."""
    from csdid_pyspark_spark.did.honest import honest_sdrm_ci_frame

    rows = [
        (int(e), float(b), 1e-5)
        for e, b in zip([-4, -3, -2, 0, 1, 2], BETA)
    ]
    prof = spark.createDataFrame(rows, "e int, att_iw double, se double")

    def hull(shape):
        return {
            r["e"]: (r["ci_lo"], r["ci_hi"], r["method"])
            for r in honest_sdrm_ci_frame(
                prof, mbars=(1.0,), hybrid=False, grid_points=481,
                shape=shape,
            ).collect()
        }

    un, bp, mi = hull("none"), hull("bias_pos"), hull("monotone_inc")
    for e in (0, 1, 2):
        # grid step at this e: span = 2*(|shift| + M(e+1)(e+2)/2 + pad)
        step_e = 2 * (0.1 * (e + 1) + 0.3 * (e + 1) * (e + 2) / 2 + 1e-4) / 480
        lo_u, hi_u, _ = un[e]
        lo_b, hi_b, meth = bp[e]
        assert meth == "sdrm-conditional+bias_pos"
        assert lo_b >= lo_u - 1e-6 and hi_b <= hi_u + 1e-6
        # covers tau = 1 up to grid discreteness (tau sits exactly ON
        # the restricted set's boundary at e = 0)
        assert lo_b - 3 * step_e <= 1.0 <= hi_b + 3 * step_e
        lo_m, hi_m, meth_m = mi[e]
        assert meth_m == "sdrm-conditional+monotone_inc"
        assert np.isnan(lo_m) and np.isnan(hi_m)
    # the e=1 restricted hull matches the hand-derived set
    step = 2 * (0.2 + 0.9 + 1e-4) / 480
    assert bp[1][0] == pytest.approx(1.0, abs=3 * step)
    assert bp[1][1] == pytest.approx(1.7, abs=3 * step)
    with pytest.raises(ValueError, match="unknown shape"):
        honest_sdrm_ci_frame(prof, shape="sideways").collect()


def test_sd_shape_restrictions_tighten_and_stay_valid(spark):
    """DeltaSDB/DeltaSDM (shape rows on the SINGLE Delta^SD polytope,
    zero affine offset): under se -> 0 the bias_pos CI is contained in
    the unrestricted one and still covers tau; monotone_inc empties
    the CI on this non-monotone pre path; the default (shape='none')
    output is bit-unchanged by the new parameter."""
    from csdid_pyspark_spark.did.honest import honest_sd_ci_frame

    rows = [
        (int(e), float(b), 1e-5)
        for e, b in zip([-4, -3, -2, 0, 1, 2], BETA)
    ]
    prof = spark.createDataFrame(rows, "e int, att_iw double, se double")

    def hull(shape):
        return {
            r["e"]: (r["ci_lo"], r["ci_hi"], r["method"])
            for r in honest_sd_ci_frame(
                prof, mbars=(1.0,), hybrid=False, grid_points=481,
                shape=shape,
            ).collect()
        }

    un, bp, mi = hull("none"), hull("bias_pos"), hull("monotone_inc")
    for e in (0, 1, 2):
        lo_u, hi_u, meth_u = un[e]
        assert meth_u == "sd-conditional"
        lo_b, hi_b, meth = bp[e]
        assert meth == "sd-conditional+bias_pos"
        assert lo_b >= lo_u - 1e-6 and hi_b <= hi_u + 1e-6
        step_e = 2 * (0.1 * (e + 1) + 0.3 * (e + 1) * (e + 2) / 2 + 1e-4) / 480
        assert lo_b - 3 * step_e <= 1.0 <= hi_b + 3 * step_e
        lo_m, hi_m, meth_m = mi[e]
        assert meth_m == "sd-conditional+monotone_inc"
        assert np.isnan(lo_m) and np.isnan(hi_m)


def test_breakdown_mbar_frame(spark):
    """honest_breakdown_frame (RR §6 sensitivity headline): on the
    planted DGP the Delta^SD breakdown M̄* per event time matches the
    hand-derived |center| / (c_pre·(e+1)(e+2)/2) up to se padding and
    tolerance, and DECREASES with e (longer horizons are less robust);
    an insignificant profile breaks down at 0; a capped mbar_max that
    never covers yields NULL; unknown family raises."""
    from csdid_pyspark_spark.did.honest import honest_breakdown_frame

    rows = [
        (int(e), float(b), 1e-4)
        for e, b in zip([-4, -3, -2, 0, 1, 2], BETA)
    ]
    prof = spark.createDataFrame(rows, "e int, att_iw double, se double")
    out = {
        r["e"]: r["mbar_breakdown"]
        for r in honest_breakdown_frame(
            prof, family="sd", hybrid=False, grid_points=161, tol=0.02
        ).collect()
    }
    # hand-derived (se -> 0): center_e = att_e + (e+1)*0.1, half =
    # 0.3*(e+1)(e+2)/2 * mbar -> mbar* = center/half
    want = {0: 1.3 / 0.3, 1: 1.9 / 0.9, 2: 2.8 / 1.8}
    for e, w in want.items():
        assert out[e] == pytest.approx(w, rel=0.05), (e, out[e], w)
    assert out[0] > out[1] > out[2]

    # insignificant effect: CI at mbar=0 already covers 0
    flat = spark.createDataFrame(
        [(-4, 0.01, 0.5), (-3, -0.02, 0.5), (-2, 0.01, 0.5),
         (0, 0.05, 0.5), (1, -0.03, 0.5), (2, 0.02, 0.5)],
        "e int, att_iw double, se double",
    )
    z = honest_breakdown_frame(flat, family="sd", hybrid=False).collect()
    assert all(r["mbar_breakdown"] == 0.0 for r in z)

    # cap below the true breakdown: NULL (still significant at the cap)
    capped = {
        r["e"]: r["mbar_breakdown"]
        for r in honest_breakdown_frame(
            prof, family="sd", hybrid=False, mbar_max=0.5, tol=0.02
        ).collect()
    }
    assert capped[0] is None

    # rm family smoke: breakdown positive and finite on this profile
    rm = {
        r["e"]: r["mbar_breakdown"]
        for r in honest_breakdown_frame(
            prof, family="rm", hybrid=False, grid_points=81, tol=0.05,
            mbar_max=20.0,
        ).collect()
    }
    assert all(v is not None and v > 0 for v in rm.values()), rm

    with pytest.raises(ValueError, match="family must be"):
        honest_breakdown_frame(prof, family="sideways").collect()


def test_target_frame_basis_case_equals_per_event_frame(spark):
    """honest_target_ci_frame with l = e_j must reproduce the
    per-event frame's (e=j) row EXACTLY under hybrid=False (identical
    matrices through _cone_tests_dir; no rng consumed), for all three
    families."""
    from csdid_pyspark_spark.did.honest import (
        honest_rm_ci_frame,
        honest_sd_ci_frame,
        honest_sdrm_ci_frame,
        honest_target_ci_frame,
    )

    rows = [
        (int(e), float(b), 0.02)
        for e, b in zip([-4, -3, -2, 0, 1, 2], BETA)
    ]
    prof = spark.createDataFrame(rows, "e int, att_iw double, se double")
    per_event = {
        "rm": honest_rm_ci_frame,
        "sd": honest_sd_ci_frame,
        "sdrm": honest_sdrm_ci_frame,
    }
    l = [0.0, 1.0, 0.0]
    for fam, fn in per_event.items():
        ref = {
            r["e"]: r
            for r in fn(
                prof, mbars=(1.0,), hybrid=False, grid_points=121
            ).collect()
        }[1]
        got = honest_target_ci_frame(
            prof, l, family=fam, mbars=(1.0,), hybrid=False,
            grid_points=121,
        ).collect()[0]
        assert got["target"] == ref["att"], fam
        # the inversion grids differ only in their anchor for sd/sdrm
        # (same center/half formulas) and rm — all identical for e=1,
        # so the hulls must agree exactly
        assert got["ci_lo"] == ref["ci_lo"], (fam, got, ref)
        assert got["ci_hi"] == ref["ci_hi"], (fam, got, ref)


def test_target_frame_average_effect_identified_set(spark):
    """l = (1/3,1/3,1/3) (the average post effect) under Delta^RM with
    se -> 0 on the boundary DGP of test_honest_rm: post steps are
    independently bounded by mbar*s_pre = 0.5, and the average's step
    coefficients are the tails (1, 2/3, 1/3), so the identified set is
    l'att +- 0.5*2 = [mean(att) - 1, mean(att) + 1] — the accepted
    hull must converge to it (grid tolerance). Also: the hybrid run
    is deterministic and contained in a wider-mbar run."""
    from csdid_pyspark_spark.did.honest import honest_target_ci_frame

    # test_honest_rm's DGP: pre steps max 0.5, tau = 1 per post
    att = {-4: -0.5, -3: 0.0, -2: -0.5,
           0: 1.0 - 0.5, 1: 1.0 + 0.0, 2: 1.0 + 0.5}
    rows = [(e, a, 1e-5) for e, a in att.items()]
    prof = spark.createDataFrame(rows, "e int, att_iw double, se double")
    l = [1.0 / 3] * 3
    out = honest_target_ci_frame(
        prof, l, family="rm", mbars=(1.0,), hybrid=False,
        grid_points=481,
    ).collect()[0]
    mean_att = sum(att[e] for e in (0, 1, 2)) / 3.0
    assert out["target"] == pytest.approx(mean_att, abs=1e-9)
    step = 2 * (0.5 * 2 + 1e-4) / 480
    assert out["ci_lo"] == pytest.approx(mean_att - 1.0, abs=3 * step)
    assert out["ci_hi"] == pytest.approx(mean_att + 1.0, abs=3 * step)

    hyb = honest_target_ci_frame(
        prof, l, family="rm", mbars=(0.5, 1.0), grid_points=121
    ).collect()
    again = honest_target_ci_frame(
        prof, l, family="rm", mbars=(0.5, 1.0), grid_points=121
    ).collect()
    assert hyb == again
    by_m = {r["mbar"]: r for r in hyb}
    assert by_m[0.5]["ci_lo"] >= by_m[1.0]["ci_lo"] - 1e-9
    assert by_m[0.5]["ci_hi"] <= by_m[1.0]["ci_hi"] + 1e-9

    import pytest as _pytest
    with _pytest.raises(ValueError, match="one weight per"):
        honest_target_ci_frame(prof, [1.0], family="rm").collect()
    with _pytest.raises(ValueError, match="all zeros"):
        honest_target_ci_frame(prof, [0.0, 0.0, 0.0]).collect()
    with _pytest.raises(ValueError, match="family must be"):
        honest_target_ci_frame(prof, l, family="x").collect()


def test_breakdown_lvec_average_target(spark):
    """Breakdown of the AVERAGE post effect (l_vec path): on the SD
    DGP the average's curvature-tail width is 0.3*(1+3+6)/3 = 1.0 per
    mbar and the average center is mean(att_e + (e+1)*0.1), so
    M̄* ≈ center/1.0; reported as the single e = -1 sentinel row."""
    from csdid_pyspark_spark.did.honest import honest_breakdown_frame

    rows = [
        (int(e), float(b), 1e-4)
        for e, b in zip([-4, -3, -2, 0, 1, 2], BETA)
    ]
    prof = spark.createDataFrame(rows, "e int, att_iw double, se double")
    l = [1.0 / 3] * 3
    out = honest_breakdown_frame(
        prof, family="sd", hybrid=False, grid_points=161, tol=0.02,
        l_vec=l,
    ).collect()
    assert len(out) == 1 and out[0]["e"] == -1
    center = (1.3 + 1.9 + 2.8) / 3.0
    width_per_mbar = 0.3 * (1 + 3 + 6) / 3.0
    assert out[0]["att"] == pytest.approx((1.2 + 1.7 + 2.5) / 3.0, abs=1e-6)
    assert out[0]["mbar_breakdown"] == pytest.approx(
        center / width_per_mbar, rel=0.05
    )

# Slow tier: deselected by the default `-m "not slow"` (pytest.ini) so the
# driver's time-budgeted gate runs the fast product surfaces; run everything
# with `python -m pytest tests/ -m "slow or not slow"` (round-close practice).
import pytest as _pytest_tier  # noqa: E402

pytestmark = _pytest_tier.mark.slow
