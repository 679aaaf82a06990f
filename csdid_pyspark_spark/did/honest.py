"""Rambachan-Roth "Honest DiD" sensitivity bounds (Rambachan & Roth
2023, "A More Credible Approach to Parallel Trends", Review of Economic
Studies 90(5)) under the RELATIVE-MAGNITUDES restriction Δ^RM(M̄) and
the SMOOTHNESS restriction Δ^SD(M).

The referee question after a pre-trend test passes is "how wrong could
parallel trends be before the conclusion flips?". RR's Δ^RM answer:
allow the post-period differential trend to drift, per period, by at
most M̄ times the LARGEST observed pre-period violation. With the
event-study profile normalized to the e = -1 baseline (δ_{-1} = 0),
the post-period violation after e+1 steps is bounded by
(e+1)·M̄·s_pre where

    s_pre = max over consecutive observed pre event times
            |β_t − β_{t-1}|          (β_{-1} ≡ 0)

so the IDENTIFIED SET for the causal effect at event time e ≥ 0 is

    [β̂_e − (e+1)·M̄·s_pre,  β̂_e + (e+1)·M̄·s_pre]

and a confidence interval for the PARTIALLY identified effect pads
each end with z·se_e. Simplifications vs RR's exact procedures, stated
so the caller knows what they get: s_pre is the PLUG-IN maximum of the
estimated pre-period slopes (RR's FLCI/conditional-hybrid procedures
also account for noise in the pre coefficients), and the padding uses
the plain normal quantile on both ends (conservative for an interval
bound in the Imbens-Manski sense when the set has positive width).
M̄ = 0 reproduces the standard pointwise CI; the smallest grid M̄
whose CI covers 0 is the reported "breakdown" sensitivity.

Scale shape: pure RESULT-SIZED algebra — the input is an event-study
profile (|E| rows) that already carries the data-scale work (cell
aggregation + influence SEs); everything here is window/join/cross
operations on frames of a few dozen rows, executed declaratively so
the same code serves any profile source (SA, CS dynamic, stacked).

Reference scope: the reference package (d2cml-ai/csdid-pyspark) has no
sensitivity-analysis path; built from the published method.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csdid_pyspark_spark.cache import attach_cache

# z_{0.975}: fixed literal so Spark and the SQL oracle feed identical
# doubles into identical arithmetic
Z975 = 1.959964


def honest_bounds_frame(
    profile: DataFrame,
    mbars: tuple[float, ...] = (0.0, 0.5, 1.0, 1.5, 2.0),
    att_col: str = "att_iw",
    se_col: str = "se",
    z: float = Z975,
) -> DataFrame:
    """Δ^RM(M̄) identified sets + padded CIs for every post event time
    of an event-study ``profile`` — a DataFrame with columns
    (e, ``att_col``, ``se_col``), e = -1 omitted (the baseline).

    Output: (e, mbar, att, set_lo, set_hi, ci_lo, ci_hi) for each
    e ≥ 0 × M̄ in ``mbars``, rounded 6dp, ordered (e, mbar).

    Raises (declaratively) when the profile has no pre-period steps to
    calibrate s_pre from — Δ^RM is meaningless without an observed
    pre-trend magnitude."""
    spark = profile.sparkSession
    # the |E|-row profile rides FOUR independent subtrees below (main,
    # s_pre, and both sides of the steps self-join); its lineage is the
    # caller's full data-scale event-study plan, which Spark would
    # re-execute per subtree — pin it for the consumer's action
    # (attach_cache → caller/bench releases after the final action)
    prof = profile.select(
        F.col("e").cast("int").alias("e"),
        F.col(att_col).cast("double").alias("att"),
        F.col(se_col).cast("double").alias("se"),
    ).unionByName(
        spark.createDataFrame([(-1, 0.0, 0.0)], "e int, att double, se double")
    ).persist()
    # consecutive observed pre-period slopes (β_{-1} ≡ 0 included) via
    # a tiny self-join on e-1 — no ordered window, so no single-
    # reducer exchange even appears in the plan
    pre = prof.filter(F.col("e") <= -1)
    steps = pre.alias("t").join(
        F.broadcast(
            pre.select(
                F.col("e").alias("e_prev"), F.col("att").alias("att_prev")
            )
        ),
        F.col("e_prev") == F.col("e") - 1,
    ).select(F.abs(F.col("att") - F.col("att_prev")).alias("step"))
    s_pre = steps.agg(F.max("step").alias("s_pre"))
    guard = F.when(
        F.col("s_pre").isNull(),
        F.raise_error(
            F.lit(
                "honest_bounds_frame: no consecutive pre-period event-"
                "study coefficients to calibrate the relative-magnitudes "
                "restriction from (need at least e = -2 observed)"
            )
        ),
    ).otherwise(F.col("s_pre"))
    grid = spark.createDataFrame([(float(m),) for m in mbars], "mbar double")
    width = (F.col("e") + 1) * F.col("mbar") * guard
    return attach_cache(
        prof.filter(F.col("e") >= 0)
        .crossJoin(F.broadcast(s_pre))
        .crossJoin(F.broadcast(grid))
        .select(
            "e",
            "mbar",
            F.round("att", 6).alias("att"),
            F.round(F.col("att") - width, 6).alias("set_lo"),
            F.round(F.col("att") + width, 6).alias("set_hi"),
            F.round(F.col("att") - width - F.lit(z) * F.col("se"), 6).alias("ci_lo"),
            F.round(F.col("att") + width + F.lit(z) * F.col("se"), 6).alias("ci_hi"),
        )
        .orderBy("e", "mbar"),
        prof,
    )


def honest_smoothness_frame(
    profile: DataFrame,
    mbars: tuple[float, ...] = (0.0, 0.5, 1.0, 1.5, 2.0),
    att_col: str = "att_iw",
    se_col: str = "se",
    z: float = Z975,
) -> DataFrame:
    """Δ^SD(M) identified sets + padded CIs for every post event time
    of an event-study ``profile`` (columns e, ``att_col``,
    ``se_col``; e = -1 is the omitted baseline).

    Δ^SD bounds the SECOND DIFFERENCE of the differential trend:
    |δ_{t+1} − 2δ_t + δ_{t−1}| ≤ M. With δ_{-1} ≡ 0 and the pre-period
    δ's plugged in from the estimated pre coefficients, the slope
    entering the post period is s_last = β_{-1} − β_{-2} = −β_{-2} and
    each subsequent per-period slope can drift by at most M more, so
    the bias at event time e ≥ 0 lies in

        (e+1)·s_last  ±  M·(e+1)(e+2)/2

    and the identified set for the causal effect is β̂_e minus that
    interval. M = 0 is the LINEAR-EXTRAPOLATION debiased estimate (a
    point, unlike Δ^RM's M̄ = 0 which is the raw pointwise estimate) —
    Δ^SD(0) says "trends may differ but only linearly". M is
    self-calibrated as mbar × c_pre where c_pre is the largest OBSERVED
    pre-period second difference |β_{t+1} − 2β_t + β_{t−1}| (t+1 ≤ −1,
    β_{-1} ≡ 0), mirroring Δ^RM's s_pre plug-in: mbar = 1 allows
    exactly as much post-period curvature per period as the worst
    observed pre-period curvature. Plug-in simplifications (estimated
    pre coefficients treated as δ_pre; plain z padding) are the same
    ones documented on :func:`honest_bounds_frame`.

    Output: (e, mbar, att, set_lo, set_hi, ci_lo, ci_hi), rounded 6dp,
    ordered (e, mbar). Raises declaratively when fewer than two
    consecutive pre-period slopes exist (nothing to calibrate c_pre —
    Δ^SD needs curvature evidence, one step more than Δ^RM).

    Scale shape: identical to :func:`honest_bounds_frame` — pure
    result-sized algebra over a |E|-row profile; every join input is
    broadcast."""
    spark = profile.sparkSession
    # pin: the profile subtree appears SEVEN times below (main, both
    # sides of the slopes self-join, both sides of the curvature
    # self-join over slopes, and the two calibration aggregates) —
    # without the pin the caller's data-scale lineage executes 7×
    prof = profile.select(
        F.col("e").cast("int").alias("e"),
        F.col(att_col).cast("double").alias("att"),
        F.col(se_col).cast("double").alias("se"),
    ).unionByName(
        spark.createDataFrame([(-1, 0.0, 0.0)], "e int, att double, se double")
    ).persist()
    pre = prof.filter(F.col("e") <= -1)
    # per-event-time pre slopes β_e − β_{e−1} via an e−1 self-join
    slopes = pre.alias("t").join(
        F.broadcast(
            pre.select(
                F.col("e").alias("e_prev"), F.col("att").alias("att_prev")
            )
        ),
        F.col("e_prev") == F.col("e") - 1,
    ).select("e", (F.col("att") - F.col("att_prev")).alias("slope"))
    # the slope entering the post period: β_{-1} − β_{-2}
    s_last_agg = slopes.filter(F.col("e") == -1).agg(
        F.max("slope").alias("s_last")
    )
    s_last = F.when(
        F.col("s_last").isNull(),
        F.raise_error(
            F.lit(
                "honest_smoothness_frame: e = -2 not observed — no "
                "boundary slope to extrapolate the differential trend "
                "from under the smoothness restriction"
            )
        ),
    ).otherwise(F.col("s_last"))
    # observed pre-period curvature: consecutive-slope differences
    curv = slopes.alias("s").join(
        F.broadcast(
            slopes.select(
                F.col("e").alias("e_prev2"), F.col("slope").alias("slope_prev")
            )
        ),
        F.col("e_prev2") == F.col("e") - 1,
    ).select(F.abs(F.col("slope") - F.col("slope_prev")).alias("curv"))
    c_pre_agg = curv.agg(F.max("curv").alias("c_pre"))
    c_pre = F.when(
        F.col("c_pre").isNull(),
        F.raise_error(
            F.lit(
                "honest_smoothness_frame: fewer than two consecutive "
                "pre-period slopes (need e = -3 observed, or e = -2 "
                "plus the baseline) — no observed curvature to "
                "calibrate the smoothness bound M from"
            )
        ),
    ).otherwise(F.col("c_pre"))
    grid = spark.createDataFrame([(float(m),) for m in mbars], "mbar double")
    shift = (F.col("e") + 1) * s_last
    width = (
        F.col("mbar")
        * c_pre
        * (((F.col("e") + 1) * (F.col("e") + 2)).cast("double") / F.lit(2.0))
    )
    return attach_cache(
        prof.filter(F.col("e") >= 0)
        .crossJoin(F.broadcast(s_last_agg))
        .crossJoin(F.broadcast(c_pre_agg))
        .crossJoin(F.broadcast(grid))
        .select(
            "e",
            "mbar",
            F.round("att", 6).alias("att"),
            F.round(F.col("att") - shift - width, 6).alias("set_lo"),
            F.round(F.col("att") - shift + width, 6).alias("set_hi"),
            F.round(
                F.col("att") - shift - width - F.lit(z) * F.col("se"), 6
            ).alias("ci_lo"),
            F.round(
                F.col("att") - shift + width + F.lit(z) * F.col("se"), 6
            ).alias("ci_hi"),
        )
        .orderBy("e", "mbar"),
        prof,
    )


def _moment_profile(profile, att_col, se_col, cov, min_k, caller):
    """Shared profile parsing for the ARP conditional frames: collect
    the event-study rows, find the maximal consecutive pre chain,
    require consecutive posts, and assemble (att, se, k, m, posts,
    pre_asc, beta, Sig) with Sig = cov (validated) or diag(se²)."""
    import numpy as np

    rows = profile.select(
        F.col("e").cast("int").alias("e"),
        F.col(att_col).cast("double").alias("att"),
        F.col(se_col).cast("double").alias("se"),
    ).collect()
    att = {int(r["e"]): float(r["att"]) for r in rows}
    se = {int(r["e"]): float(r["se"]) for r in rows}
    k = 0
    while (-2 - k) in att:
        k += 1
    if k < min_k:
        raise ValueError(
            f"{caller}: need >= {min_k} consecutive pre-period "
            f"coefficients (e = -2{' and e = -3' if min_k >= 2 else ''}"
            " observed)"
        )
    posts = sorted(e for e in att if e >= 0)
    m = len(posts)
    if posts != list(range(m)):
        raise ValueError(
            f"{caller}: post event times must be consecutive "
            f"0..{m - 1} (got {posts}) — the restriction bounds every "
            "intermediate post-period step"
        )
    pre_asc = list(range(-1 - k, -1))  # [-(k+1), ..., -2]
    coords = pre_asc + posts
    beta = np.asarray([att[t] for t in coords])
    if cov is None:
        Sig = np.diag(np.asarray([se[t] for t in coords]) ** 2)
    else:
        Sig = np.asarray(cov, dtype=float)
        if Sig.shape != (k + m, k + m):
            raise ValueError(
                f"{caller}: cov must be {(k + m, k + m)} over "
                f"{coords}, got {Sig.shape}"
            )
    return att, se, k, m, posts, pre_asc, beta, Sig


def _invert_grid(accepted, center: float, half: float, grid_points: int):
    """Shared test-inversion grid for the ARP CI frames: scan
    ``grid_points`` values over [center − half, center + half], widen
    (×2 span, ≤5 times) while the accepted hull touches a boundary.
    Returns (ci_lo, ci_hi): (nan, nan) when no θ0 is accepted, and
    ``None`` for an endpoint whose acceptance STILL touches the
    repeatedly-doubled grid edge — the region is effectively unbounded
    on that side (e.g. a caller-supplied covariance that dwarfs the
    profile-se grid scale), so reporting the arbitrary boundary would
    silently understate the interval. Mirrors conformal_staggered's
    unbounded-endpoint rule."""
    import numpy as np

    lo_b, hi_b = center - half, center + half
    acc: list = []
    grid = np.linspace(lo_b, hi_b, grid_points)
    for _ in range(6):
        grid = np.linspace(lo_b, hi_b, grid_points)
        acc = [t0 for t0 in grid if accepted(float(t0))]
        if not acc:
            return float("nan"), float("nan")
        if acc[0] > grid[0] and acc[-1] < grid[-1]:
            return float(acc[0]), float(acc[-1])
        span = hi_b - lo_b
        lo_b, hi_b = lo_b - span / 2, hi_b + span / 2
    return (
        float(acc[0]) if acc[0] > grid[0] else None,
        float(acc[-1]) if acc[-1] < grid[-1] else None,
    )


def _r6(x):
    """round(x, 6) passing None (NULL CI endpoint) through."""
    return None if x is None else round(x, 6)


def _sd_constraints(k: int, m: int):
    """Δ^SD(M) as ONE polytope {δ : A δ ≤ M·1} over the observed
    coordinates [δ_{-(k+1)}, ..., δ_{-2}, δ_0, ..., δ_{m-1}]
    (δ_{-1} ≡ 0 substituted out): ± every second difference
    δ_{t+1} − 2δ_t + δ_{t−1} over consecutive event-time triples,
    pre, boundary and post — 2(k + m − 1) rows."""
    import numpy as np

    n = k + m

    def coord(e: int):
        v = np.zeros(n)
        if e == -1:
            return v  # δ_{-1} ≡ 0
        v[e + k + 1 if e <= -2 else k + e] = 1.0
        return v

    rows = []
    for t in range(-k, m - 1):  # centers with both neighbors observed
        c = coord(t + 1) - 2.0 * coord(t) + coord(t - 1)
        rows.append(c)
        rows.append(-c)
    return np.asarray(rows)


def honest_sd_ci_frame(
    profile: DataFrame,
    mbars: tuple[float, ...] = (0.5, 1.0, 2.0),
    att_col: str = "att_iw",
    se_col: str = "se",
    cov=None,
    alpha: float = 0.05,
    hybrid: bool | str = True,
    grid_points: int = 241,
    lf_sims: int = 1000,
    seed: int = 20231015,
    shape: str = "none",
) -> DataFrame:
    """ARP conditional/hybrid CI for the SMOOTHNESS restriction Δ^SD —
    the moment-inequality companion of :func:`honest_flci_frame` (RR
    2023 §5.3 also covers Δ^SD; RR recommend conditional-hybrid when
    the FLCI's worst-case-bias pricing is conservative, i.e. away from
    small M). Δ^SD(M) is ONE polytope Aδ ≤ M·1 (no union), so the test
    at θ0 is a single ARP conditional test with the other post-period
    effects profiled out — the same vertex-enumerated dual and
    truncated-normal conditioning as :func:`honest_rm_ci_frame`, the
    moments just carry the affine offset d = M·1 (Y(θ0) = Aβ̂ − d −
    θ0·a). M is self-calibrated per mbar as mbar × c_pre (largest
    observed pre second difference — the same rule as the plug-in and
    FLCI frames). Same inputs, output shape (method = "sd-hybrid" /
    "sd-conditional" / "sd-hybrid-flci"), grid policy and scale story
    as the Δ^RM frame.

    ``hybrid``: True/'lf' (default) = the κ = α/10 least-favorable
    first stage; ``'flci'`` = HonestDiD's DEFAULT hybrid for Δ^SD —
    the first stage rejects θ0 outside the κ-level FLCI [θ̂_w ± χ_κ]
    (weights and half-length optimized at level κ via
    ``_flci_halflength``; tighter than the LF stage when the FLCI is
    near-optimal, i.e. at small M where worst-case bias dominates),
    and the conditional second stage at level (α−κ)/(1−κ) conditions
    on BOTH the optimal dual vertex and the first-stage event (the
    FLCI statistic's projection on η̂ adds interval bounds to the
    truncation — see ``_arp_accepts``'s ``flci`` parameter); False =
    pure conditional.

    ``shape`` intersects Δ^SD(M) with RR §2.4's sign / monotonicity
    rows (HonestDiD's DeltaSDB / DeltaSDM): the shape rows carry a
    ZERO affine offset (they are cones) while the curvature rows keep
    d = M·1, so the single polytope simply gains rows — extra moments
    can only tighten the CI; the method column records the variant.
    Under ``hybrid='flci'`` the first-stage FLCI is built for the
    UNRESTRICTED Δ^SD(M) (valid, conservatively, on the subset)."""
    import numpy as np

    att, se, k, m, posts, pre_asc, beta, Sig = _moment_profile(
        profile, att_col, se_col, cov, min_k=2,
        caller="honest_sd_ci_frame",
    )
    path = [att[t] for t in pre_asc] + [0.0]
    c_pre = max(
        abs(path[i + 1] - 2.0 * path[i] + path[i - 1])
        for i in range(1, len(path) - 1)
    )
    s_last = -att[-2]
    se_max = max(se[t] for t in pre_asc + posts)
    if hybrid is True:
        mode = "lf"
    elif hybrid is False:
        mode = "none"
    elif hybrid in ("lf", "flci"):
        mode = hybrid
    else:
        raise ValueError(
            "honest_sd_ci_frame: hybrid must be True/'lf' (least-"
            f"favorable), 'flci', or False, got {hybrid!r}"
        )
    kappa = alpha / 10.0 if mode != "none" else 0.0
    rng = np.random.Generator(np.random.PCG64(seed))
    A_sd = _sd_constraints(k, m)
    D_pre, D_post = _step_matrices(k, m)
    srows = _shape_rows(k, m, shape, D_pre, D_post)
    if srows:
        A = np.vstack([A_sd, np.asarray(srows)])
        # curvature rows are bounded by M; shape rows are cones (≤ 0)
        d_mask = np.concatenate(
            [np.ones(A_sd.shape[0]), np.zeros(len(srows))]
        )
    else:
        A = A_sd
        d_mask = np.ones(A.shape[0])
    Sy = A @ Sig @ A.T
    sig = np.sqrt(np.maximum(np.diag(Sy), 0.0))
    sig = np.maximum(sig, 1e-9 * (sig.max() if sig.max() > 0 else 1.0))
    method = {
        "lf": "sd-hybrid", "none": "sd-conditional",
        "flci": "sd-hybrid-flci",
    }[mode] + ("" if shape == "none" else f"+{shape}")
    # FLCI machinery inputs (mode == "flci"): the κ-level FLCI is the
    # first stage, so its weights/half-length are optimized AT level κ
    sig_pre_idx = list(range(k))
    slopes = [
        (att[t] if t != -1 else 0.0) - att[t - 1]
        for t in range(-1, -k - 1, -1)
    ]  # slope_{-1}, slope_{-2}, ... (β_{-1} ≡ 0)
    out = []
    for j_t, e in enumerate(posts):
        other = [k + j for j in range(m) if j != j_t]
        verts = _dual_vertices(A[:, other], sig)
        a_t = A[:, k + j_t]
        y0 = A @ beta
        lf_cv = None
        if mode == "lf" and len(verts):
            lam, U = np.linalg.eigh(Sy)
            L = U * np.sqrt(np.maximum(lam, 0.0))
            draws = rng.standard_normal((lf_sims, Sy.shape[0]))
            stats = (draws @ L.T) @ verts.T
            lf_cv = float(
                np.quantile(stats.max(axis=1), 1.0 - kappa, method="higher")
            )
        sig_f = Sig[np.ix_(sig_pre_idx + [k + j_t],
                           sig_pre_idx + [k + j_t])]
        for mbar in mbars:
            M = float(mbar) * c_pre
            d = M * d_mask

            if mode == "flci":
                # κ-level FLCI first stage (ARP 2023 §5.3 / HonestDiD's
                # Δ^SD default): reject outright when θ0 falls outside
                # [θ̂_w ± χ_κ]; the second stage is the conditional test
                # at level (α−κ)/(1−κ) with the first-stage event
                # entering the polyhedral truncation via flci=(...)
                def obj(theta, _e=e, _M=M, _sf=sig_f):
                    w = np.concatenate(
                        [theta, [1.0 - float(np.sum(theta))]]
                    )
                    return _flci_halflength(w, _e, _M, _sf, kappa)[0]

                x0 = np.zeros(k - 1)
                x0[0] = 1.0
                best_t, _val = _nelder_mead(obj, x0)
                w_best = np.concatenate(
                    [best_t, [1.0 - float(np.sum(best_t))]]
                )
                chi_k, _bias, _sdf, v = _flci_halflength(
                    w_best, e, M, sig_f, kappa
                )
                theta_w = att[e] - (e + 1) * float(
                    np.dot(w_best, np.asarray(slopes))
                )
                l_full = np.zeros(k + m)
                l_full[:k] = v[:k]
                l_full[k + j_t] = v[k]
                w_T = A @ (Sig @ l_full)
                alpha2 = (alpha - kappa) / (1.0 - kappa)

                def accepted(theta0: float) -> bool:
                    t_obs = theta_w - theta0
                    if abs(t_obs) > chi_k:
                        return False
                    return _arp_accepts(
                        y0 - d - theta0 * a_t, Sy, verts, alpha2,
                        None, 0.0, flci=(w_T, t_obs, chi_k),
                    )

            else:
                def accepted(theta0: float) -> bool:
                    return _arp_accepts(
                        y0 - d - theta0 * a_t, Sy, verts, alpha, lf_cv,
                        kappa,
                    )

            shift = (e + 1) * s_last
            half = (
                abs(shift)
                + M * (e + 1) * (e + 2) / 2.0
                + 10.0 * se_max
            )
            center = att[e] - shift
            ci_lo, ci_hi = _invert_grid(
                accepted, center, half, grid_points
            )
            out.append(
                (
                    int(e),
                    float(mbar),
                    round(att[e], 6),
                    method,
                    _r6(ci_lo),
                    _r6(ci_hi),
                    int(grid_points),
                )
            )
    return profile.sparkSession.createDataFrame(
        sorted(out),
        "e int, mbar double, att double, method string, ci_lo double,"
        " ci_hi double, grid_points int",
    ).orderBy("e", "mbar")


# ---------------------------------------------------------------------------
# Exact fixed-length CI (FLCI) for the smoothness restriction
# ---------------------------------------------------------------------------


def _norm_cdf(x: float) -> float:
    import math

    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def _cv_folded(t: float, alpha: float) -> float:
    """cv_alpha(t): the 1-alpha quantile of |N(t, 1)| — the folded-
    normal critical value the FLCI pads with (Armstrong & Kolesar
    2018 eq. 2.5; Rambachan & Roth 2023 §5.2). Monotone in c, solved
    by bisection to 1e-10 (deterministic)."""
    lo, hi = abs(t), abs(t) + 8.0
    target = 1.0 - alpha
    for _ in range(80):
        c = 0.5 * (lo + hi)
        if _norm_cdf(c - t) - _norm_cdf(-c - t) < target:
            lo = c
        else:
            hi = c
    return 0.5 * (lo + hi)


def _flci_halflength(w, e, M, cov, alpha):
    """Half-length and components of the FLCI for the affine estimator
    theta_hat = beta_e - (e+1) * sum_t w_t * slope_t over Delta^SD(M).

    Worst-case bias (closed form): write the estimator's coefficient
    a_j on each SLOPE sigma_j of the differential trend (a_j = 1 for
    post slopes j in [0, e], a_j = -(e+1) w_j for the k pre slopes);
    expressing every slope through the bounded second-difference
    increments u_i (|u_i| <= M, the constant-slope direction is
    annihilated because sum_j a_j = 0 when sum w = 1) gives

        bias_max = M * sum_i | sum_{j > i} a_j |.

    Variance: v' cov v with v the estimator's coefficients on the
    OBSERVED coordinates (beta_{-1} == 0 is deterministic).
    Returns (chi, bias_max, sd, v)."""
    import numpy as np

    k = len(w)
    # slope coefficients, ordered [sigma_{-k}, ..., sigma_{-1},
    # sigma_0, ..., sigma_e]; w is ordered [w_{-1}, w_{-2}, ...]
    a = np.concatenate(
        [-(e + 1) * np.asarray(w[::-1], dtype=float), np.ones(e + 1)]
    )
    tails = np.cumsum(a[::-1])[::-1]  # tails[i] = sum_{j >= i} a_j
    bias = M * float(np.sum(np.abs(tails[1:])))
    # coefficient vector on observed coords [beta_{-(k+1)}, ...,
    # beta_{-2}, beta_e]: slope_{-1} = -beta_{-2}; slope_t =
    # beta_t - beta_{t-1} for t <= -2
    v = np.zeros(k + 1)
    v[k] = 1.0
    for j, t in enumerate(range(-1, -k - 1, -1)):  # w[j] weights slope_t
        cw = -(e + 1) * w[j]
        # slope_t = beta_t - beta_{t-1}; beta_{-1} deterministic 0
        if t <= -2:
            v[k - 1 - (-t - 2)] += cw
        v[k - 1 - (-t - 1)] -= cw
    sd = float(np.sqrt(max(v @ cov @ v, 0.0)))
    if sd <= 0:
        return bias, bias, 0.0, v
    return sd * _cv_folded(bias / sd, alpha), bias, sd, v


def _nelder_mead(f, x0, iters=400):
    """Compact deterministic Nelder-Mead (fixed init simplex, standard
    1/2/0.5/0.5 coefficients, no randomness) for the low-dimensional
    FLCI weight search."""
    import numpy as np

    n = len(x0)
    if n == 0:
        return np.zeros(0), f(np.zeros(0))
    sim = [np.array(x0, dtype=float)]
    for i in range(n):
        p = np.array(x0, dtype=float)
        p[i] += 0.25 if p[i] == 0 else 0.25 * abs(p[i])
        sim.append(p)
    vals = [f(p) for p in sim]
    for _ in range(iters):
        order = sorted(range(n + 1), key=lambda i: (vals[i], i))
        sim = [sim[i] for i in order]
        vals = [vals[i] for i in order]
        cen = np.mean(sim[:-1], axis=0)
        xr = cen + (cen - sim[-1])
        fr = f(xr)
        if fr < vals[0]:
            xe = cen + 2.0 * (cen - sim[-1])
            fe = f(xe)
            sim[-1], vals[-1] = (xe, fe) if fe < fr else (xr, fr)
        elif fr < vals[-2]:
            sim[-1], vals[-1] = xr, fr
        else:
            xc = cen + 0.5 * (sim[-1] - cen)
            fc = f(xc)
            if fc < vals[-1]:
                sim[-1], vals[-1] = xc, fc
            else:
                for i in range(1, n + 1):
                    sim[i] = sim[0] + 0.5 * (sim[i] - sim[0])
                    vals[i] = f(sim[i])
    order = sorted(range(n + 1), key=lambda i: (vals[i], i))
    return sim[order[0]], vals[order[0]]


# ---------------------------------------------------------------------------
# Conditional / hybrid inference for the relative-magnitudes restriction
# ---------------------------------------------------------------------------


def _step_matrices(k: int, m: int):
    """First-difference (step) operators over the observed coordinates
    [δ_{-(k+1)}, ..., δ_{-2}, δ_0, ..., δ_{m-1}] with δ_{-1} ≡ 0
    substituted out: D_pre rows give d^pre_1..d^pre_k ascending in
    time (d^pre_k = δ_{-1} − δ_{-2} = −x[k−1]); D_post rows give
    d^post_1..d^post_m (d^post_1 = δ_0 − δ_{-1} = x[k])."""
    import numpy as np

    n = k + m
    D_pre = np.zeros((k, n))
    for i in range(k - 1):
        D_pre[i, i] = -1.0
        D_pre[i, i + 1] = 1.0
    D_pre[k - 1, k - 1] = -1.0
    D_post = np.zeros((m, n))
    D_post[0, k] = 1.0
    for j in range(1, m):
        D_post[j, k + j - 1] = -1.0
        D_post[j, k + j] = 1.0
    return D_pre, D_post


def _shape_rows(k: int, m: int, shape: str, D_pre, D_post):
    """RR 2023 §2.4 sign / monotonicity moment rows (HonestDiD's B/M
    variants), appended to every cone of a union restriction:
    "bias_pos"/"bias_neg" sign every POST LEVEL δ_e, "monotone_inc"/
    "monotone_dec" sign EVERY step of the differential trend. Raises
    on an unknown shape."""
    import numpy as np

    if shape not in (
        "none", "bias_pos", "bias_neg", "monotone_inc", "monotone_dec"
    ):
        raise ValueError(f"_shape_rows: unknown shape {shape!r}")
    n = k + m
    rows = []
    if shape in ("bias_pos", "bias_neg"):
        sgn_b = 1.0 if shape == "bias_pos" else -1.0
        for j in range(m):
            lvl = np.zeros(n)
            lvl[k + j] = 1.0
            rows.append(-sgn_b * lvl)  # sgn_b·δ_e ≥ 0
    elif shape in ("monotone_inc", "monotone_dec"):
        sgn_m = 1.0 if shape == "monotone_inc" else -1.0
        for s in range(k):
            rows.append(-sgn_m * D_pre[s])
        for j in range(m):
            rows.append(-sgn_m * D_post[j])
    return rows


def _rm_polyhedra(k: int, m: int, mbar: float, shape: str = "none"):
    """Δ^RM(M̄) as a finite union of polyhedral cones {δ : A δ ≤ 0}
    over the observed coordinates [δ_{-(k+1)}, ..., δ_{-2}, δ_0, ...,
    δ_{m-1}] (δ_{-1} ≡ 0 substituted out).

    Δ^RM(M̄) = {δ : |δ_t − δ_{t−1}| ≤ M̄·max_{s<0}|δ_s − δ_{s−1}| ∀t≥0}
    is a union over WHICH pre-period step attains the max and with
    WHICH sign (2k cases, RR 2023 §5.3 / HonestDiD's DeltaRM): in the
    (s*, σ) cone,  σ·d^pre_{s*} ≥ |d^pre_s| for all s  and
    |d^post_j| ≤ M̄·σ·d^pre_{s*} for all j. Yields 2k matrices of
    shape (2k + 2m − 1 [+ shape rows], k + m).

    ``shape`` intersects each cone with RR 2023 §2.4's sign /
    monotonicity restrictions (HonestDiD's DeltaRMB / DeltaRMM):
    "bias_pos"/"bias_neg" bound every POST LEVEL δ_e ≥ 0 / ≤ 0 (the
    researcher signs the confound), "monotone_inc"/"monotone_dec"
    bound EVERY step d_t ≥ 0 / ≤ 0 (secular trend direction). Extra
    moments can only tighten the identified set / CI."""
    import numpy as np

    D_pre, D_post = _step_matrices(k, m)
    shape_rows = _shape_rows(k, m, shape, D_pre, D_post)
    out = []
    for s_star in range(k):
        for sgn in (1.0, -1.0):
            ref = sgn * D_pre[s_star]
            rows = []
            for s in range(k):
                if s == s_star:
                    rows.append(-ref)  # σ·d*_{s*} ≥ 0
                else:
                    rows.append(D_pre[s] - ref)
                    rows.append(-D_pre[s] - ref)
            for j in range(m):
                rows.append(D_post[j] - mbar * ref)
                rows.append(-D_post[j] - mbar * ref)
            rows.extend(shape_rows)
            out.append(np.asarray(rows))
    return out


def _sdrm_polyhedra(k: int, m: int, mbar: float, shape: str = "none"):
    """Δ^SDRM(M̄) as a finite union of polyhedral cones {δ : A δ ≤ 0}
    over the observed coordinates (δ_{-1} ≡ 0 substituted out) —
    RR 2023 §2.4.1's combined smoothness-and-relative-magnitudes
    restriction (HonestDiD's DeltaSDRM):

        Δ^SDRM(M̄) = {δ : |c_t(δ)| ≤ M̄ · max_{pre s} |c_s(δ)| ∀ t ≥ −1}

    where c_t = δ_{t+1} − 2δ_t + δ_{t−1} is the SECOND difference
    centered at t — the Δ^RM construction with curvature playing the
    role Δ^RM gives to steps: the post-period deviation from
    linearity is bounded, per period, by M̄ times the worst OBSERVED
    pre-period deviation from linearity. Pre centers are
    s ∈ {−k, ..., −2} (all three coordinates of the triple observed,
    δ_{-1} ≡ 0 included — the same k−1 curvatures honest_sd_ci_frame
    calibrates c_pre from, so k ≥ 2 is required); restricted centers
    t ∈ {−1, ..., m−2} (every triple touching a post coordinate,
    boundary included). The union is over WHICH pre curvature attains
    the max and with WHICH sign — 2(k−1) cones of
    1 + 2(k−2) + 2m [+ shape] rows each; in the (s*, σ) cone
    σ·c_{s*} ≥ |c_s| for every pre s and |c_t| ≤ M̄·σ·c_{s*} for every
    restricted t. ``shape`` appends the §2.4 sign / monotonicity rows
    (HonestDiD's DeltaSDRMB / DeltaSDRMM)."""
    import numpy as np

    if k < 2:
        raise ValueError(
            "_sdrm_polyhedra: need k >= 2 pre coefficients — at least "
            "one fully-observed pre-period second difference"
        )
    n = k + m

    def coord(e: int):
        v = np.zeros(n)
        if e == -1:
            return v  # δ_{-1} ≡ 0
        v[e + k + 1 if e <= -2 else k + e] = 1.0
        return v

    def c_at(t: int):
        return coord(t + 1) - 2.0 * coord(t) + coord(t - 1)

    pre_centers = list(range(-k, -1))  # [−k, ..., −2]
    res_centers = list(range(-1, m - 1))  # [−1, ..., m−2]
    D_pre, D_post = _step_matrices(k, m)
    shape_rows = _shape_rows(k, m, shape, D_pre, D_post)
    out = []
    for s_star in pre_centers:
        ref0 = c_at(s_star)
        for sgn in (1.0, -1.0):
            ref = sgn * ref0
            rows = []
            for s in pre_centers:
                if s == s_star:
                    rows.append(-ref)  # σ·c_{s*} ≥ 0
                else:
                    rows.append(c_at(s) - ref)
                    rows.append(-c_at(s) - ref)
            for t in res_centers:
                rows.append(c_at(t) - mbar * ref)
                rows.append(-c_at(t) - mbar * ref)
            rows.extend(shape_rows)
            out.append(np.asarray(rows))
    return out


def _dual_vertices(X, sig):
    """All basic feasible solutions (vertices) of the ARP dual polytope
    Γ = {γ ≥ 0 : X'γ = 0, σ̃'γ = 1}. With q = X.shape[1] + 1 equality
    rows, every vertex has support ≤ q: enumerate C(M, q) supports,
    batch-screen singular bases by determinant, solve the rest in one
    batched ``np.linalg.solve``. Deterministic (fixed combination
    order, fixed dedup rounding). Returns an (n_vert, M) array —
    possibly empty when Γ = ∅ (dual infeasible ⇒ the primal test
    statistic is −∞ and the test never rejects)."""
    import itertools

    import numpy as np

    M = len(sig)
    E = np.vstack([X.T, sig[None, :]])  # (q, M)
    q = E.shape[0]
    if q > M:
        return np.zeros((0, M))
    combos = np.asarray(list(itertools.combinations(range(M), q)))
    bases = E[:, combos.T].transpose(2, 0, 1)  # (C, q, q)
    dets = np.abs(np.linalg.det(bases))
    ok = dets > 1e-12 * (1.0 + np.abs(bases).max())
    if not ok.any():
        return np.zeros((0, M))
    b = np.zeros(q)
    b[-1] = 1.0
    sols = np.linalg.solve(bases[ok], np.broadcast_to(b, (int(ok.sum()), q)))
    feas = (sols >= -1e-11).all(axis=1)
    verts = np.zeros((int(feas.sum()), M))
    rows = np.nonzero(feas)[0]
    cidx = combos[ok][feas]
    for r, (sol, cols) in enumerate(zip(sols[feas], cidx)):
        verts[r, cols] = np.maximum(sol, 0.0)
    if len(verts) == 0:
        return verts
    # dedup (degenerate bases reproduce the same vertex)
    seen: dict[tuple, int] = {}
    keep = []
    for i, v in enumerate(verts):
        key = tuple(np.round(v, 11))
        if key not in seen:
            seen[key] = i
            keep.append(i)
    return verts[keep]


def _truncnorm_sf(eta: float, sd: float, vlo: float, vup: float) -> float:
    """P(Z > eta | vlo ≤ Z ≤ vup), Z ~ N(0, sd²) — the ARP conditional
    p-value. Survival functions via erfc; far-tail ratios are computed
    with the Mills-ratio asymptotic so a truncation window deep in the
    tail doesn't hit 0/0."""
    import math

    def sf(x: float) -> float:
        return 0.5 * math.erfc(x / math.sqrt(2.0))

    lo, up, t = vlo / sd, vup / sd, eta / sd
    t = min(max(t, lo), up)
    if up < -8.0:
        # whole window in the far LOWER tail: sf(lo) and sf(up) both
        # round to 1.0 and the plain ratio degenerates to 0/0 → a
        # spurious p = 0. Reflect: P(Z > η | lo ≤ Z ≤ up) =
        # 1 − P(Z > −η | −up ≤ Z ≤ −lo), which lands the recursive
        # call in the upper-tail log-Mills branch below.
        return 1.0 - _truncnorm_sf(-eta, sd, -vup, -vlo)
    if lo > 8.0:  # whole window in the far upper tail: use log-Mills
        # sf(x) ≈ φ(x)/x ⇒ ratio = exp((lo²−t²)/2)·(lo/t) etc.
        def lsf(x: float) -> float:
            return -0.5 * x * x - math.log(max(x, 1e-12))

        den = _log1mexp(lsf(up) - lsf(lo)) + lsf(lo) if math.isfinite(up) else lsf(lo)
        num = _log1mexp(lsf(up) - lsf(t)) + lsf(t) if math.isfinite(up) else lsf(t)
        return math.exp(min(num - den, 0.0))
    den = sf(lo) - (sf(up) if math.isfinite(up) else 0.0)
    if den <= 0.0:
        return 0.0
    num = sf(t) - (sf(up) if math.isfinite(up) else 0.0)
    return min(max(num / den, 0.0), 1.0)


def _log1mexp(x: float) -> float:
    import math

    if x >= 0.0:
        return -math.inf
    return math.log1p(-math.exp(x)) if x < -0.693 else math.log(-math.expm1(x))


def _arp_accepts(y, Sy, verts, alpha: float, lf_cv: float | None,
                 kappa: float, flci=None) -> bool:
    """One polyhedron's test of H0 at the current θ0: ACCEPT (True) or
    reject. ``y`` = Y(θ0) = Aβ̂ − θ0·a; the test statistic is the dual
    form η̂ = max_γ∈Γ γ'y (primal: min η s.t. y − Xξ ≤ ησ̃). Conditional
    critical value à la ARP 2023: condition on the optimal vertex γ̂ —
    with c = Σ_Y γ̂ / γ̂'Σ_Y γ̂ and S = y − c·η̂ (independent of η̂), γ̂
    stays optimal iff η̂ ∈ [v_lo, v_up] where the bounds are ratio
    tests over the OTHER vertices, so η̂ | conditioning ~ TN(γ̂'μ,
    γ̂'Σ_Yγ̂; [v_lo, v_up]) and γ̂'μ ≤ 0 under H0. Hybrid (lf_cv not
    None): reject outright if η̂ > lf_cv (the κ-level least-favorable
    first stage), else run the conditional test at level
    (α−κ)/(1−κ) with v_up capped at lf_cv (RR 2023 §5.3).

    ``flci=(w_T, t_obs, chi)`` — the FLCI-hybrid's SECOND stage
    (ARP 2023 §5.3 / HonestDiD's default for Δ^SD): the caller already
    verified the κ-level first stage |T| ≤ χ_κ with T = θ̂_w − θ0 the
    FLCI affine statistic, and passes the ADJUSTED level as ``alpha``.
    Exactness requires conditioning on that first-stage event too:
    with slope = γ̂'w_T / var(η̂) (w_T = A Σ l, so slope·η̂ is T's
    projection on η̂) and S_T = t_obs − slope·η̂ independent of η̂, the
    event |S_T + slope·η̂| ≤ χ adds interval bounds on η̂ that are
    intersected into [v_lo, v_up]."""
    import math

    if len(verts) == 0:
        return True  # dual infeasible: no binding information
    etas = verts @ y
    i = int(etas.argmax())
    eta = float(etas[i])
    g = verts[i]
    if lf_cv is not None:
        if eta > lf_cv:
            return False
        alpha = (alpha - kappa) / (1.0 - kappa)
    var_eta = float(g @ Sy @ g)
    if var_eta <= 1e-22:
        return eta <= 1e-10
    c = Sy @ g / var_eta
    S = y - c * eta
    rho = verts @ c
    num = verts @ S
    mask_lo = rho < 1.0 - 1e-9
    mask_up = rho > 1.0 + 1e-9
    vlo = float((num[mask_lo] / (1.0 - rho[mask_lo])).max()) if mask_lo.any() else -math.inf
    vup = float((num[mask_up] / (1.0 - rho[mask_up])).min()) if mask_up.any() else math.inf
    if lf_cv is not None:
        vup = min(vup, lf_cv)
    sd = math.sqrt(var_eta)
    if flci is not None:
        w_T, t_obs, chi = flci
        slope = float(g @ w_T) / var_eta
        if abs(slope) > 1e-12 * (abs(t_obs) + chi + sd):
            s_t = t_obs - slope * eta
            b1 = (-chi - s_t) / slope
            b2 = (chi - s_t) / slope
            vlo = max(vlo, min(b1, b2))
            vup = min(vup, max(b1, b2))
        # |slope| ~ 0: the first-stage event is independent of η̂ —
        # no truncation to add
    p = _truncnorm_sf(eta, sd, vlo, vup)
    return p > alpha


def _cone_tests_dir(polys, beta, Sig, k, m, u, B, hybrid, kappa,
                    lf_sims, rng):
    """Per-cone ARP test inputs for a GENERAL target direction in the
    post-effect space: the null is l'τ = θ0 with τ = θ·u + B·ξ
    (l'u = 1, B a basis of l's orthogonal complement), so the target
    column is a_t = A_post u and the profiled-out nuisances enter
    through X = A_post B. With u = e_j and B = the identity columns
    of the other posts this reduces EXACTLY to the per-event frames'
    inputs (same matrices, same dual vertices — the pinned goldens'
    path). rng draws are consumed in cone order."""
    import numpy as np

    tests = []
    for A in polys:
        Sy = A @ Sig @ A.T
        sig = np.sqrt(np.maximum(np.diag(Sy), 0.0))
        floor = 1e-9 * (sig.max() if sig.max() > 0 else 1.0)
        sig = np.maximum(sig, floor)
        A_post = A[:, k:]
        verts = _dual_vertices(A_post @ B, sig)
        a_t = A_post @ u
        y0 = A @ beta
        lf_cv = None
        if hybrid and len(verts):
            lam, U = np.linalg.eigh(Sy)
            L = U * np.sqrt(np.maximum(lam, 0.0))
            draws = rng.standard_normal((lf_sims, Sy.shape[0]))
            stats = (draws @ L.T) @ verts.T
            lf_cv = float(
                np.quantile(stats.max(axis=1), 1.0 - kappa,
                            method="higher")
            )
        tests.append((y0, a_t, Sy, verts, lf_cv))
    return tests


def _cone_tests(polys, beta, Sig, k, m, j_t, hybrid, kappa, lf_sims, rng):
    """Per-cone ARP test inputs shared by the union CI frames
    (Δ^RM, Δ^SDRM) for the single-event target τ_{e_j} — the e-basis
    specialization of :func:`_cone_tests_dir` (u = e_{j_t}, B = the
    other posts' identity columns: A_post u and A_post B are then the
    exact column selections the pinned goldens were produced with)."""
    import numpy as np

    u = np.zeros(m)
    u[j_t] = 1.0
    B = np.zeros((m, m - 1))
    for c, j in enumerate(j for j in range(m) if j != j_t):
        B[j, c] = 1.0
    return _cone_tests_dir(
        polys, beta, Sig, k, m, u, B, hybrid, kappa, lf_sims, rng
    )


def honest_rm_ci_frame(
    profile: DataFrame,
    mbars: tuple[float, ...] = (0.5, 1.0, 2.0),
    att_col: str = "att_iw",
    se_col: str = "se",
    cov=None,
    alpha: float = 0.05,
    hybrid: bool = True,
    grid_points: int = 241,
    lf_sims: int = 1000,
    seed: int = 20231015,
    shape: str = "none",
) -> DataFrame:
    """Rambachan-Roth CONDITIONAL (and hybrid) confidence intervals for
    the relative-magnitudes restriction Δ^RM(M̄) — RR 2023 §5.3, the
    published completion :func:`honest_bounds_frame`'s plug-in sets
    point to and the one the FLCI docstring defers to (every affine
    estimator has infinite worst-case bias over the Δ^RM cone, so the
    §5.2 FLCI construction is unavailable; honest.py:377-381).

    Method: Δ^RM(M̄) is a union of 2k polyhedral cones (one per
    attaining pre-step × sign, ``_rm_polyhedra``). For each cone
    {Aδ ≤ 0}, H0: τ_{e*} = θ0 is a linear moment-inequality system
    with nuisance parameters (the other post-period effects enter
    through X = the corresponding columns of A), tested with the
    Andrews-Roth-Pakes conditional test: the profiled statistic
    η̂ = min{η : Y(θ0) − Xξ ≤ ησ̃} is computed by enumerating the dual
    polytope's vertices (no LP solver; deterministic), and the
    truncated-normal conditional critical value follows from
    polyhedral conditioning on the optimal vertex. θ0 is in the CI if
    ANY cone accepts (the union's CI is the union of cone CIs); the
    reported interval is the hull of the accepted grid. The HYBRID
    variant first applies a κ = α/10 least-favorable test (critical
    value = the 1−κ quantile of max_γ γ'ε over seeded N(0, Σ_Y)
    draws) and runs the conditional stage at level (α−κ)/(1−κ) with
    the truncation capped at the LF value — RR's recommended default
    (better length than pure conditional when the binding moment is
    near-degenerate, exact size κ + (1−κ)·(α−κ)/(1−κ) = α).

    ``cov``: full (k+m)×(k+m) covariance of the OBSERVED profile
    coordinates ordered [pre ascending (−(k+1)..−2), posts ascending
    (0..m−1)] — pass ``sunab_event_cov``'s matrix sliced to those
    rows; default diag(se²). Posts must be consecutive from 0 (the
    step structure of Δ^RM needs every intermediate post step).

    ``shape`` intersects Δ^RM with RR §2.4's sign / monotonicity
    restrictions (HonestDiD's DeltaRMB / DeltaRMM): "bias_pos" /
    "bias_neg" (every post-period violation δ_e signed) or
    "monotone_inc" / "monotone_dec" (every step of the differential
    trend signed) — extra moment rows on every cone, so the CI can
    only tighten; the method column records the variant.

    Output: (e, mbar, att, method, ci_lo, ci_hi, grid_points) rounded
    6dp, ordered (e, mbar). The grid spans the plug-in identified set
    padded by ±10·max-se and auto-widens (×2, ≤5 times) if the
    accepted hull touches a boundary; an endpoint whose acceptance
    STILL touches the widened edge is reported as NULL (effectively
    unbounded), never as the arbitrary grid boundary.

    Scale shape: the profile is |E| rows and everything here is
    result-sized driver numpy (vertex enumeration is C(2k+2m−1, m)
    batched 4-to-8-square solves); the data-scale work (influence
    aggregation for the profile + covariance) happened upstream.
    Reference scope: the reference package has no sensitivity-analysis
    path; built from RR 2023 §5.3 + ARP 2023."""
    import numpy as np

    att, se, k, m, posts, pre_asc, beta, Sig = _moment_profile(
        profile, att_col, se_col, cov, min_k=1,
        caller="honest_rm_ci_frame",
    )
    # plug-in s_pre (β_{-1} ≡ 0 included) for the inversion grid only
    path = [att[t] for t in pre_asc] + [0.0]  # ascending, β_{-1} ≡ 0 last
    s_pre = max(abs(path[i + 1] - path[i]) for i in range(len(path) - 1))
    se_max = max(se[t] for t in pre_asc + posts)
    kappa = alpha / 10.0 if hybrid else 0.0
    rng = np.random.Generator(np.random.PCG64(seed))
    method = ("hybrid" if hybrid else "conditional") + (
        "" if shape == "none" else f"+{shape}"
    )
    out = []
    for mbar in mbars:
        polys = _rm_polyhedra(k, m, float(mbar), shape=shape)
        for j_t, e in enumerate(posts):
            tests = _cone_tests(
                polys, beta, Sig, k, m, j_t, hybrid, kappa, lf_sims, rng
            )

            def accepted(theta0: float) -> bool:
                return any(
                    _arp_accepts(y0 - theta0 * a_t, Sy, verts, alpha,
                                 lf_cv, kappa)
                    for (y0, a_t, Sy, verts, lf_cv) in tests
                )

            half = (e + 1) * float(mbar) * s_pre + 10.0 * se_max
            ci_lo, ci_hi = _invert_grid(
                accepted, att[e], half, grid_points
            )
            out.append(
                (
                    int(e),
                    float(mbar),
                    round(att[e], 6),
                    method,
                    _r6(ci_lo),
                    _r6(ci_hi),
                    int(grid_points),
                )
            )
    return profile.sparkSession.createDataFrame(
        out,
        "e int, mbar double, att double, method string, ci_lo double,"
        " ci_hi double, grid_points int",
    ).orderBy("e", "mbar")


def honest_sdrm_ci_frame(
    profile: DataFrame,
    mbars: tuple[float, ...] = (0.5, 1.0, 2.0),
    att_col: str = "att_iw",
    se_col: str = "se",
    cov=None,
    alpha: float = 0.05,
    hybrid: bool = True,
    grid_points: int = 241,
    lf_sims: int = 1000,
    seed: int = 20231015,
    shape: str = "none",
) -> DataFrame:
    """ARP conditional/hybrid CI for the COMBINED smoothness-and-
    relative-magnitudes restriction Δ^SDRM(M̄) (RR 2023 §2.4.1;
    HonestDiD's ``DeltaSDRM``) — the restriction practitioners default
    to when neither pure Δ^SD (M must be chosen in outcome units) nor
    pure Δ^RM (level drift priced by the worst pre STEP, often loose)
    matches the design: the post-period deviation from LINEARITY is
    bounded, per period, by M̄ times the worst OBSERVED pre-period
    deviation from linearity. Formally |c_t(δ)| ≤ M̄·max_{pre s}
    |c_s(δ)| for every post-touching second difference c_t — a finite
    union of 2(k−1) polyhedral cones over which pre curvature attains
    the max and with which sign (``_sdrm_polyhedra``), so the exact
    machinery of :func:`honest_rm_ci_frame` applies: per cone, the
    Andrews-Roth-Pakes conditional test with the other post effects
    profiled out via the vertex-enumerated dual, a κ = α/10 seeded
    least-favorable first stage when ``hybrid``, and θ0 ∈ CI iff ANY
    cone accepts. Because Δ^SDRM is a CONE (like Δ^RM), every affine
    estimator has infinite worst-case bias and no FLCI exists — the
    conditional/hybrid test is RR's recommended inference here.

    The plug-in identified set that anchors the inversion grid equals
    :func:`honest_smoothness_frame`'s with M = M̄·c_pre (c_pre = the
    largest observed pre second difference, β_{-1} ≡ 0 included):
    center att_e − (e+1)·s_last, half-width M·(e+1)(e+2)/2 — what
    Δ^SDRM adds over plug-in Δ^SD is pricing the NOISE in both the
    attaining pre curvature and the boundary slope. Needs k ≥ 2
    consecutive pre coefficients (one fully-observed pre curvature)
    and consecutive posts; ``cov``/``shape``/output schema/grid policy
    (NULL endpoint when acceptance still touches the widened grid
    edge) are exactly :func:`honest_rm_ci_frame`'s, with method =
    "sdrm-hybrid" / "sdrm-conditional" (+shape).

    Scale shape: result-sized driver algebra over the |E|-row profile
    — identical to the Δ^RM frame. Reference scope: the reference
    package (d2cml-ai/csdid-pyspark) has no sensitivity-analysis path;
    built from RR 2023 + ARP 2023."""
    import numpy as np

    att, se, k, m, posts, pre_asc, beta, Sig = _moment_profile(
        profile, att_col, se_col, cov, min_k=2,
        caller="honest_sdrm_ci_frame",
    )
    # plug-in calibration for the inversion grid only: worst observed
    # pre curvature + the boundary slope entering the post window
    path = [att[t] for t in pre_asc] + [0.0]
    c_pre = max(
        abs(path[i + 1] - 2.0 * path[i] + path[i - 1])
        for i in range(1, len(path) - 1)
    )
    s_last = -att[-2]
    se_max = max(se[t] for t in pre_asc + posts)
    kappa = alpha / 10.0 if hybrid else 0.0
    rng = np.random.Generator(np.random.PCG64(seed))
    method = ("sdrm-hybrid" if hybrid else "sdrm-conditional") + (
        "" if shape == "none" else f"+{shape}"
    )
    out = []
    for mbar in mbars:
        polys = _sdrm_polyhedra(k, m, float(mbar), shape=shape)
        for j_t, e in enumerate(posts):
            tests = _cone_tests(
                polys, beta, Sig, k, m, j_t, hybrid, kappa, lf_sims, rng
            )

            def accepted(theta0: float) -> bool:
                return any(
                    _arp_accepts(y0 - theta0 * a_t, Sy, verts, alpha,
                                 lf_cv, kappa)
                    for (y0, a_t, Sy, verts, lf_cv) in tests
                )

            M = float(mbar) * c_pre
            shift = (e + 1) * s_last
            half = (
                abs(shift)
                + M * (e + 1) * (e + 2) / 2.0
                + 10.0 * se_max
            )
            ci_lo, ci_hi = _invert_grid(
                accepted, att[e] - shift, half, grid_points
            )
            out.append(
                (
                    int(e),
                    float(mbar),
                    round(att[e], 6),
                    method,
                    _r6(ci_lo),
                    _r6(ci_hi),
                    int(grid_points),
                )
            )
    return profile.sparkSession.createDataFrame(
        out,
        "e int, mbar double, att double, method string, ci_lo double,"
        " ci_hi double, grid_points int",
    ).orderBy("e", "mbar")


def honest_target_ci_frame(
    profile: DataFrame,
    l_vec,
    family: str = "rm",
    mbars: tuple[float, ...] = (0.5, 1.0, 2.0),
    att_col: str = "att_iw",
    se_col: str = "se",
    cov=None,
    alpha: float = 0.05,
    hybrid: bool = True,
    grid_points: int = 241,
    lf_sims: int = 1000,
    seed: int = 20231015,
    shape: str = "none",
) -> DataFrame:
    """ARP conditional/hybrid CI for a LINEAR COMBINATION l'τ of the
    post-period effects — HonestDiD's ``l_vec`` target (the common
    use: l = 1/m·1, the AVERAGE post-period effect — the robust
    analogue of aggte("simple") — or a weighted horizon average) —
    under ``family`` ∈ {"rm", "sd", "sdrm"} with the same calibration,
    shape rows and hybrid machinery as the per-event frames. The null
    l'τ = θ0 is reparameterized τ = θ·u + B·ξ with u = l/(l'l) and B
    an orthonormal basis of l's complement (deterministic sign-fixed
    SVD), so the target column is A_post·u and the nuisances are
    profiled out through X = A_post·B — the exact generalization the
    per-event frames are the e-basis case of (``_cone_tests_dir``).

    The inversion grid is anchored at the plug-in identified set of
    l'τ: for "rm", width = M̄·s_pre·Σ_j|Σ_{e≥j} l̃_e| over post steps
    (l̃ = l re-indexed by event time; the steps are independently
    bounded so the bound is attained); for "sd"/"sdrm", center shifts
    by Σ_e l_e(e+1)·s_last and width = M·Σ_j|Σ_{e≥j} l̃_e (e−j+2)|
    -ish is bounded above by M·Σ_e |l_e|(e+1)(e+2)/2 (used,
    conservative — the auto-widening loop absorbs slack). Output:
    (mbar, family, target, method, ci_lo, ci_hi, grid_points) with
    ``target`` = l'att̂, NULL-endpoint semantics as the per-event
    frames. ``hybrid`` is the LF/conditional pair (the FLCI first
    stage stays per-event). Scale shape: result-sized driver algebra."""
    import numpy as np

    if family not in ("rm", "sd", "sdrm"):
        raise ValueError(
            f"honest_target_ci_frame: family must be 'rm', 'sd' or "
            f"'sdrm', got {family!r}"
        )
    min_k = 1 if family == "rm" else 2
    att, se, k, m, posts, pre_asc, beta, Sig = _moment_profile(
        profile, att_col, se_col, cov, min_k=min_k,
        caller="honest_target_ci_frame",
    )
    l = np.asarray(l_vec, dtype=float)
    if l.shape != (m,):
        raise ValueError(
            f"honest_target_ci_frame: l_vec must have one weight per "
            f"post event time 0..{m - 1} (need shape ({m},), got "
            f"{l.shape})"
        )
    if not np.any(l != 0.0):
        raise ValueError("honest_target_ci_frame: l_vec is all zeros")
    u = l / float(l @ l)
    if m > 1:
        proj = np.eye(m) - np.outer(l, l) / float(l @ l)
        U_, s_, _ = np.linalg.svd(proj)
        B = U_[:, : m - 1]
        # deterministic sign: largest-|entry| coordinate positive
        for j in range(B.shape[1]):
            i = int(np.argmax(np.abs(B[:, j])))
            if B[i, j] < 0:
                B[:, j] = -B[:, j]
    else:
        B = np.zeros((1, 0))
    # plug-in calibration for the grid
    path = [att[t] for t in pre_asc] + [0.0]
    s_pre = max(abs(path[i + 1] - path[i]) for i in range(len(path) - 1))
    c_pre = (
        max(
            abs(path[i + 1] - 2.0 * path[i] + path[i - 1])
            for i in range(1, len(path) - 1)
        )
        if len(path) >= 3
        else 0.0
    )
    s_last = -att[-2]
    se_max = max(se[t] for t in pre_asc + posts)
    target = float(sum(l[j] * att[e] for j, e in enumerate(posts)))
    kappa = alpha / 10.0 if hybrid else 0.0
    rng = np.random.Generator(np.random.PCG64(seed))
    method = (
        f"{family}-" + ("hybrid" if hybrid else "conditional")
        + ("" if shape == "none" else f"+{shape}")
    )
    # |coefficient of post step j| in l'delta: tails of l over events
    tails = np.abs(np.cumsum(l[::-1]))[::-1]
    out = []
    for mbar in mbars:
        if family == "rm":
            polys = _rm_polyhedra(k, m, float(mbar), shape=shape)
            d_mask = None
            center = target
            half = float(mbar) * s_pre * float(tails.sum()) + 10.0 * se_max
        elif family == "sdrm":
            polys = _sdrm_polyhedra(k, m, float(mbar), shape=shape)
            d_mask = None
            shift = s_last * float(
                sum(l[j] * (e + 1) for j, e in enumerate(posts))
            )
            center = target - shift
            half = (
                abs(shift)
                + float(mbar) * c_pre * float(
                    sum(
                        abs(l[j]) * (e + 1) * (e + 2) / 2.0
                        for j, e in enumerate(posts)
                    )
                )
                + 10.0 * se_max
            )
        else:  # sd: one polytope with affine offset on curvature rows
            A_sd = _sd_constraints(k, m)
            D_pre, D_post = _step_matrices(k, m)
            srows = _shape_rows(k, m, shape, D_pre, D_post)
            if srows:
                A = np.vstack([A_sd, np.asarray(srows)])
                d_mask = np.concatenate(
                    [np.ones(A_sd.shape[0]), np.zeros(len(srows))]
                )
            else:
                A = A_sd
                d_mask = np.ones(A.shape[0])
            polys = [A]
            shift = s_last * float(
                sum(l[j] * (e + 1) for j, e in enumerate(posts))
            )
            center = target - shift
            half = (
                abs(shift)
                + float(mbar) * c_pre * float(
                    sum(
                        abs(l[j]) * (e + 1) * (e + 2) / 2.0
                        for j, e in enumerate(posts)
                    )
                )
                + 10.0 * se_max
            )
        tests = _cone_tests_dir(
            polys, beta, Sig, k, m, u, B, hybrid, kappa, lf_sims, rng
        )
        M = float(mbar) * c_pre

        def accepted(theta0: float) -> bool:
            for i, (y0, a_t, Sy, verts, lf_cv) in enumerate(tests):
                d = (
                    M * d_mask
                    if d_mask is not None
                    else np.zeros(len(y0))
                )
                if _arp_accepts(
                    y0 - d - theta0 * a_t, Sy, verts, alpha, lf_cv, kappa
                ):
                    return True
            return False

        ci_lo, ci_hi = _invert_grid(accepted, center, half, grid_points)
        out.append(
            (
                float(mbar),
                family,
                round(target, 6),
                method,
                _r6(ci_lo),
                _r6(ci_hi),
                int(grid_points),
            )
        )
    return profile.sparkSession.createDataFrame(
        out,
        "mbar double, family string, target double, method string,"
        " ci_lo double, ci_hi double, grid_points int",
    ).orderBy("mbar")


def honest_breakdown_frame(
    profile: DataFrame,
    family: str = "rm",
    att_col: str = "att_iw",
    se_col: str = "se",
    cov=None,
    alpha: float = 0.05,
    hybrid: bool | str = True,
    grid_points: int = 121,
    lf_sims: int = 500,
    seed: int = 20231015,
    shape: str = "none",
    mbar_max: float = 10.0,
    tol: float = 0.01,
    l_vec=None,
) -> DataFrame:
    """BREAKDOWN sensitivity M̄* per post event time — the headline
    number of an honest-DiD application (RR 2023 §6; HonestDiD's
    sensitivity plots report exactly this): the smallest M̄ at which
    the robust CI under the chosen restriction ``family`` ("rm" /
    "sd" / "sdrm") includes 0, i.e. how much parallel-trends
    violation the SIGNIFICANCE of the effect survives. Found by
    bisection on M̄ over [0, ``mbar_max``] to absolute tolerance
    ``tol`` — the CI under each family widens with M̄ (the restriction
    set is monotone in M̄), so coverage of 0 is monotone up to grid
    resolution; each probe is one call of the corresponding ARP/
    conditional frame with a singleton mbar grid. An endpoint
    reported NULL (unbounded) counts as covering on that side; an
    empty CI (NaN) covers nothing.

    Output: (e, att, mbar_breakdown, family) rounded to ``tol``
    resolution, ordered by e; ``mbar_breakdown`` is 0.0 when even
    M̄ = 0 fails to exclude 0 (the effect is insignificant before any
    robustness is demanded) and NULL when 0 is still excluded at
    ``mbar_max``. Pure driver algebra: |posts| × log2(range/tol)
    result-sized frame probes; zero data-scale Spark work beyond what
    the caller's profile already did.

    ``l_vec``: probe :func:`honest_target_ci_frame` instead of the
    per-event frame — ONE row (e = -1 sentinel, att = l'att̂) giving
    the breakdown M̄* of a linear-combination target such as the
    average post effect (the sensitivity number usually quoted for
    the headline estimate rather than each horizon)."""
    frames = {
        "rm": honest_rm_ci_frame,
        "sd": honest_sd_ci_frame,
        "sdrm": honest_sdrm_ci_frame,
    }
    if family not in frames:
        raise ValueError(
            f"honest_breakdown_frame: family must be one of "
            f"{sorted(frames)}, got {family!r}"
        )
    fn = frames[family]

    def ci_map(mbar: float) -> dict:
        if l_vec is not None:
            rows = honest_target_ci_frame(
                profile,
                l_vec,
                family=family,
                mbars=(float(mbar),),
                att_col=att_col,
                se_col=se_col,
                cov=cov,
                alpha=alpha,
                hybrid=bool(hybrid),
                grid_points=grid_points,
                lf_sims=lf_sims,
                seed=seed,
                shape=shape,
            ).collect()
            # single target: report under the e = -1 sentinel
            return {-1: {**rows[0].asDict(), "att": rows[0]["target"]}}
        rows = fn(
            profile,
            mbars=(float(mbar),),
            att_col=att_col,
            se_col=se_col,
            cov=cov,
            alpha=alpha,
            hybrid=hybrid,
            grid_points=grid_points,
            lf_sims=lf_sims,
            seed=seed,
            shape=shape,
        ).collect()
        return {int(r["e"]): r for r in rows}

    def covers_zero(r) -> bool:
        lo, hi = r["ci_lo"], r["ci_hi"]
        if lo is not None and lo != lo:  # NaN: empty CI
            return False
        lo_ok = lo is None or lo <= 0.0
        hi_ok = hi is None or hi >= 0.0
        return lo_ok and hi_ok

    at0 = ci_map(0.0)
    at_max = ci_map(mbar_max)
    out = []
    for e in sorted(at0):
        att = at0[e]["att"]
        if covers_zero(at0[e]):
            out.append((int(e), float(att), 0.0, family))
            continue
        if not covers_zero(at_max[e]):
            out.append((int(e), float(att), None, family))
            continue
        lo_b, hi_b = 0.0, float(mbar_max)
        while hi_b - lo_b > tol:
            mid = 0.5 * (lo_b + hi_b)
            if covers_zero(ci_map(mid)[e]):
                hi_b = mid
            else:
                lo_b = mid
        out.append((int(e), float(att), round(hi_b, 6), family))
    return profile.sparkSession.createDataFrame(
        out, "e int, att double, mbar_breakdown double, family string"
    ).orderBy("e")


def honest_flci_frame(
    profile: DataFrame,
    mbars: tuple[float, ...] = (0.0, 0.5, 1.0, 1.5, 2.0),
    att_col: str = "att_iw",
    se_col: str = "se",
    cov=None,
    alpha: float = 0.05,
) -> DataFrame:
    """Rambachan-Roth EXACT fixed-length CI for the smoothness
    restriction Δ^SD(M) (RR 2023 §5.2, the Armstrong-Kolesar 2018
    affine-FLCI construction) — the completion of
    :func:`honest_smoothness_frame`'s plug-in bounds that ACCOUNTS FOR
    NOISE in the pre-period coefficients.

    Construction (driver algebra over the result-sized profile): any
    affine estimator of the event-e effect with finite worst-case bias
    over Δ^SD(M) can be written  beta_e − (e+1)·Σ_t w_t·slope_t  with
    Σ_t w_t = 1 over the k observed consecutive pre-period slopes
    (weighting any OTHER post coordinate gives infinite bias because
    tau_post is unrestricted; the slope parameterization spans the
    remaining (k−1)-dim affine class exactly). Its worst-case bias has
    the closed form  M·Σ_i |Σ_{j>i} a_j|  (see ``_flci_halflength``),
    its sd is  sqrt(v' Σ v), and the CI  [θ̂_w − χ, θ̂_w + χ]  with
    χ = sd·cv_α(bias/sd)  (folded-normal critical value) has exact
    1−α coverage for every δ ∈ Δ^SD(M). The weights minimize χ —
    a deterministic Nelder-Mead over k−1 dims (k is single digits).
    FLCIs are valid for Δ^SD because it is convex and centrosymmetric
    with bounded bias; for Δ^RM the worst-case bias of EVERY affine
    estimator is infinite (the restriction is a cone), which is why
    :func:`honest_bounds_frame` keeps the plug-in/identified-set form
    there (RR recommend conditional-hybrid inference for Δ^RM).

    ``M`` is self-calibrated per ``mbar`` as mbar × c_pre (the largest
    observed pre-period second difference — same rule as
    :func:`honest_smoothness_frame`, kept for API parity; the FLCI is
    exact GIVEN M). ``cov``: optional k+1-square covariance of the
    observed coordinates (pre coords ascending event time, then
    beta_e) per post e — pass the bootstrap covariance for correlated
    profiles; default diag(se²) (exact when cells are independent).
    Note χ depends on beta_hat only through Σ — the LENGTH is fixed,
    hence the name.

    Output: (e, mbar, theta, flci_lo, flci_hi, halflength, bias_max,
    sd) rounded 6dp, ordered (e, mbar). ``theta`` is the optimal-w
    debiased point estimate (at M=0 it is the GLS linear
    extrapolation, NOT the raw att — unlike Δ^RM's mbar=0 row).

    Scale: the profile is |E| rows; everything here is driver numpy.
    """
    import numpy as np

    rows = profile.select(
        F.col("e").cast("int").alias("e"),
        F.col(att_col).cast("double").alias("att"),
        F.col(se_col).cast("double").alias("se"),
    ).collect()
    att = {int(r["e"]): float(r["att"]) for r in rows}
    se = {int(r["e"]): float(r["se"]) for r in rows}
    att[-1], se[-1] = 0.0, 0.0
    # maximal CONSECUTIVE pre chain ending at -1: -2, -3, ..., -(k+1)
    k = 0
    while (-2 - k) in att:
        k += 1
    if k < 2:
        raise ValueError(
            "honest_flci_frame: need >= 2 consecutive pre-period "
            "coefficients (e = -2 and e = -3 observed) — one slope to "
            "extrapolate with and one more to calibrate c_pre from"
        )
    pre_es = list(range(-2, -2 - k, -1))  # [-2, ..., -(k+1)]
    # c_pre: largest observed second difference over the pre path
    # (beta_{-1} == 0 included) — same calibration as the plug-in frame
    path = [att[t] for t in range(-1 - k, 0)]  # ascending e: -(k+1)..-1
    c_pre = max(
        abs(path[i + 1] - 2.0 * path[i] + path[i - 1])
        for i in range(1, len(path) - 1)
    ) if len(path) >= 3 else None
    if c_pre is None:
        raise ValueError(
            "honest_flci_frame: no observed pre-period curvature to "
            "calibrate M from"
        )
    posts = sorted(e for e in att if e >= 0)
    out = []
    for e in posts:
        if cov is None:
            sig = np.diag(
                [se[t] ** 2 for t in sorted(pre_es)] + [se[e] ** 2]
            )
        else:
            sig = np.asarray(cov[e] if isinstance(cov, dict) else cov,
                             dtype=float)
            if sig.shape != (k + 1, k + 1):
                raise ValueError(
                    f"honest_flci_frame: cov for e={e} must be "
                    f"{(k + 1, k + 1)}, got {sig.shape}"
                )
        slopes = [
            att[t] - att[t - 1] for t in range(-1, -k - 1, -1)
        ]  # slope_{-1}, slope_{-2}, ...

        for mbar in mbars:
            M = float(mbar) * c_pre

            def w_of(theta):
                w = np.concatenate([theta, [1.0 - float(np.sum(theta))]])
                return w

            def obj(theta):
                return _flci_halflength(
                    w_of(theta), e, M, sig, alpha
                )[0]

            # start at last-slope-only (the minimum-bias corner) —
            # theta parameterizes w[0..k-2], w[k-1] = 1 - sum
            x0 = np.zeros(k - 1)
            x0[0] = 1.0
            best_t, _ = _nelder_mead(obj, x0)
            w = w_of(best_t)
            chi, bias, sd, v = _flci_halflength(
                w, e, M, sig, alpha
            )
            theta_hat = att[e] - (e + 1) * float(
                np.dot(w, np.asarray(slopes))
            )
            out.append(
                (
                    int(e),
                    float(mbar),
                    round(theta_hat, 6),
                    round(theta_hat - chi, 6),
                    round(theta_hat + chi, 6),
                    round(chi, 6),
                    round(bias, 6),
                    round(sd, 6),
                )
            )
    return profile.sparkSession.createDataFrame(
        out,
        "e int, mbar double, theta double, flci_lo double,"
        " flci_hi double, halflength double, bias_max double, sd double",
    ).orderBy("e", "mbar")
