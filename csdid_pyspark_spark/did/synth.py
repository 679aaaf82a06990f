"""Synthetic control (Abadie & Gardeazabal 2003; Abadie, Diamond &
Hainmueller 2010) — the comparative-case-study companion of the DiD
robustness suite: ONE treated unit, a donor pool of untreated units,
and a simplex-weighted combination of donors fitted on PRE-treatment
outcomes that serves as the counterfactual after treatment.

Reference scope: the reference package (d2cml-ai/csdid-pyspark,
ATTgt.py) has no synthetic-control path; this is part of the engine's
beyond-reference estimator surface, built from the published method.

Scale design — the donor pool is the data-scale object (millions of
candidate units at 100 TB), the fitted problem is not:

1. PRE-SCREEN distributedly: one broadcast join of the treated unit's
   pre-period series against the panel + one groupBy(id) aggregation
   ranks every donor by pre-period squared distance; only the top
   ``donor_k`` survive (classical SC uses tens of donors — past that
   the simplex weights are sparse anyway, and interpolation bias from
   far-away donors grows: Abadie 2021 §4).
2. COLLECT only the K surviving donor series (K × T scalars).
3. SOLVE the simplex-constrained least squares driver-side with
   Frank-Wolfe (deterministic: fixed iterations, 2/(k+2) steps,
   lowest-index tie-breaks — no dependence on partitioning).
4. The synthetic series / gap table is T rows — result-sized.

The whole executor→driver traffic is O(K·T) floats, independent of
panel rows — the same contract as the estimator's Gram passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _frank_wolfe_simplex(X, y, iters: int = 800):
    """min_w ||X w - y||² s.t. w ≥ 0, Σw = 1, via Frank-Wolfe.
    X: (T0 × K) numpy array, y: (T0,). Deterministic: w₀ = e₀, the
    linear-minimization oracle picks the LOWEST gradient index (ties →
    lowest index), step 2/(k+2)."""
    import numpy as np

    K = X.shape[1]
    w = np.zeros(K)
    w[0] = 1.0
    for k in range(iters):
        grad = 2.0 * X.T @ (X @ w - y)
        j = int(np.argmin(grad))  # argmin returns the first (lowest) index
        step = 2.0 / (k + 2.0)
        w *= 1.0 - step
        w[j] += step
    return w


def _fw_simplex_batch(X, Y, iters: int = 800):
    """Batched :func:`_frank_wolfe_simplex`: ONE (T0 × K) design, G
    independent targets Y (T0 × G), fitted simultaneously — ``iters``
    iterations of two GEMMs instead of G × ``iters`` GEMVs, which
    collapses the Python/numpy per-call overhead that dominates the
    conformal grid inversions (61-81 grid points × cyclic-block refits
    per cohort, all sharing the donor design). Column g of the result
    is BIT-IDENTICAL to ``_frank_wolfe_simplex(X, Y[:, g])``: the
    returned weights are a pure function of the per-iteration argmin
    index sequence and the exact steps 2/(k+2), and the argmin over the
    GEMM-computed gradient column equals the GEMV gradient's argmin
    unless two entries tie within reassociation error ~1e-13 of each
    other AND straddle the two evaluation orders — distinct donor
    series exclude exact ties, and parity is pytest-asserted on the
    shapes the conformal family uses
    (tests/test_did_api.py::test_fw_batch_bitwise_parity)."""
    import numpy as np

    K = X.shape[1]
    G = Y.shape[1]
    W = np.zeros((K, G))
    W[0, :] = 1.0
    cols = np.arange(G)
    for k in range(iters):
        Grad = 2.0 * X.T @ (X @ W - Y)
        j = Grad.argmin(axis=0)  # first (lowest) index per column
        step = 2.0 / (k + 2.0)
        W *= 1.0 - step
        W[j, cols] += step
    return W


def _screen_and_collect(
    panel: DataFrame,
    treated_id,
    t0,
    yname: str,
    tname: str,
    idname: str,
    donor_ids: DataFrame | None,
    donor_k: int,
    screen_k: int | None = None,
    return_screen_order: bool = False,
):
    """Distributed part shared by the fit and the placebo test: treated
    series collect, donor pre-screen (one aggregation over the pool),
    and the bounded K-series collect. ``screen_k`` (default =
    ``donor_k``) controls how many donor series are COLLECTED — the
    placebo test oversamples here so each placebo can be re-screened
    against its own nearest donors driver-side. Returns (periods,
    y_tr, series, donor_list, pre, post); with
    ``return_screen_order=True`` a 7th element carries the
    coverage-filtered donor ids in the SCREEN'S OWN (dist, id) order,
    so a caller that oversampled can recover exactly the set the
    un-oversampled screen would have kept (a driver-side re-rank over
    float sums can flip near-ties at the donor_k boundary)."""
    screen_k = donor_k if screen_k is None else max(screen_k, donor_k)
    p = panel.select(
        F.col(idname).alias("id"),
        F.col(tname).alias("t"),
        F.col(yname).alias("y"),
    )
    treated = p.filter(F.col("id") == treated_id)
    tr_rows = treated.orderBy("t").collect()
    if not tr_rows:
        raise ValueError(f"treated unit {treated_id!r} not in panel")
    periods = [r["t"] for r in tr_rows]
    y_tr = {r["t"]: float(r["y"]) for r in tr_rows}
    pre = [t for t in periods if t < t0]
    post = [t for t in periods if t >= t0]
    if len(pre) < 2:
        raise ValueError(
            f"synthetic control needs >=2 pre-treatment periods before "
            f"t0={t0!r}; the treated unit has {len(pre)}"
        )

    donors = p.filter(F.col("id") != treated_id)
    if donor_ids is not None:
        pool = donor_ids.toDF("id")
        donors = donors.join(F.broadcast(pool), "id", "left_semi")
    # distributed pre-screen: squared pre-period distance per donor via
    # a broadcast of the T0 treated values — one agg over the panel
    tr_pre = F.create_map(
        *[x for t in pre for x in (F.lit(t), F.lit(y_tr[t]))]
    )
    scored = (
        donors.filter(F.col("t") < t0)
        .select(
            "id",
            ((F.col("y") - tr_pre[F.col("t")]) ** 2).alias("d2"),
            F.lit(1).alias("one"),
        )
        .groupBy("id")
        .agg(F.sum("d2").alias("dist"), F.sum("one").alias("n_pre"))
        # complete pre-window only: a donor missing pre periods would
        # fake a small distance by absence
        .filter(F.col("n_pre") == len(pre))
        .orderBy("dist", "id")
        .limit(screen_k)
    )
    # TakeOrdered collect (screen_k rows): preserves the screen's own
    # (dist, id) ranking for callers that need it
    screen_ids = [r["id"] for r in scored.select("id").collect()]
    keep_df = panel.sparkSession.createDataFrame(
        [(i,) for i in screen_ids], "id " + dict(p.dtypes)["id"]
    )
    kept = (
        donors.join(F.broadcast(keep_df), "id", "left_semi")
        .orderBy("id", "t")
        .collect()
    )
    series: dict = {}
    for r in kept:
        series.setdefault(r["id"], {})[r["t"]] = float(r["y"])
    # donors must also cover the post window to form the counterfactual
    covered = {
        d for d, s in series.items() if all(t in s for t in periods)
    }
    donor_list = sorted(covered)
    if not donor_list:
        raise ValueError("no donor covers the full observation window")
    if return_screen_order:
        screen_order = [d for d in screen_ids if d in covered]
        return periods, y_tr, series, donor_list, pre, post, screen_order
    return periods, y_tr, series, donor_list, pre, post


def _nearest(y_map, series, candidates, pre, k):
    """The ``k`` candidates nearest to ``y_map`` by pre-window squared
    distance (ties -> lower id), returned SORTED BY ID so the fit's
    design-matrix column order is deterministic. Driver-side over
    already-collected series — zero Spark jobs."""
    scored = sorted(
        (sum((series[d][t] - y_map[t]) ** 2 for t in pre), d)
        for d in candidates
    )
    return sorted(d for _, d in scored[:k])


def _fit_one(y_map, donor_series, donor_list, periods, pre, post, fw_iters):
    """Driver-side FW fit + gap/RMSPE readouts for one (pseudo-)treated
    series against a donor list already in memory."""
    import numpy as np

    X = np.array([[donor_series[d][t] for d in donor_list] for t in pre])
    yv = np.array([y_map[t] for t in pre])
    w = _frank_wolfe_simplex(X, yv, iters=fw_iters)
    out_series = []
    for t in periods:
        synth = float(
            sum(w[j] * donor_series[d][t] for j, d in enumerate(donor_list))
        )
        out_series.append((t, y_map[t], synth, y_map[t] - synth))
    gaps = {t: g for t, _, _, g in out_series}
    pre_rmspe = float(np.sqrt(np.mean([gaps[t] ** 2 for t in pre])))
    post_rmspe = (
        float(np.sqrt(np.mean([gaps[t] ** 2 for t in post]))) if post else 0.0
    )
    return w, out_series, gaps, pre_rmspe, post_rmspe


def synthetic_control(
    panel: DataFrame,
    treated_id,
    t0,
    yname: str = "y",
    tname: str = "period",
    idname: str = "id",
    donor_ids: DataFrame | None = None,
    donor_k: int = 50,
    fw_iters: int = 800,
) -> dict:
    """Fit a synthetic control for ``treated_id`` treated from period
    ``t0`` (first treated period; all periods < t0 are the fit window).

    ``donor_ids``: optional single-column DataFrame restricting the
    donor pool (e.g. never-treated units); default = every other unit.

    Returns a dict:
      ``weights``   {donor_id: weight} for weights > 1e-6, simplex;
      ``series``    list of (period, actual, synthetic, gap) over ALL
                    periods, sorted;
      ``att_post``  mean post-period gap (the SC treatment estimate);
      ``pre_rmspe`` / ``post_rmspe`` and their ratio — the
                    Abadie-style placebo-test statistic.
    """
    import numpy as np

    periods, y_tr, series, donor_list, pre, post = _screen_and_collect(
        panel, treated_id, t0, yname, tname, idname, donor_ids, donor_k
    )
    w, out_series, gaps, pre_rmspe, post_rmspe = _fit_one(
        y_tr, series, donor_list, periods, pre, post, fw_iters
    )
    return {
        "weights": {
            d: float(w[j]) for j, d in enumerate(donor_list) if w[j] > 1e-6
        },
        "series": out_series,
        "att_post": float(np.mean([gaps[t] for t in post])) if post else 0.0,
        "pre_rmspe": pre_rmspe,
        "post_rmspe": post_rmspe,
        "rmspe_ratio": float(post_rmspe / pre_rmspe) if pre_rmspe > 0 else float("inf"),
    }


def placebo_test(
    panel: DataFrame,
    treated_id,
    t0,
    yname: str = "y",
    tname: str = "period",
    idname: str = "id",
    donor_ids: DataFrame | None = None,
    donor_k: int = 50,
    fw_iters: int = 800,
) -> dict:
    """Abadie-style IN-SPACE placebo inference: refit the synthetic
    control pretending each screened donor were the treated unit, and
    rank the REAL treated unit's post/pre RMSPE ratio among the
    placebo ratios. A treated ratio that no placebo matches is the SC
    analogue of a small p-value; p = (1 + #{placebo >= treated}) /
    (1 + n_placebos) — the standard permutation form.

    Donor screening: the distributed screen collects an OVERSAMPLED
    pool (3x ``donor_k`` nearest to the real treated unit); the real
    fit then uses its ``donor_k`` nearest within that pool (= the
    original screen set) and EVERY PLACEBO IS RE-SCREENED driver-side
    against its own ``donor_k`` nearest pool members, so a placebo is
    never forced to fit through donors chosen for someone else (which
    would inflate its pre-RMSPE and bias the permutation p-value
    toward significance). Deviation from Abadie's full-pool
    procedure: placebo donor pools are restricted to the collected 3x
    sample, so placebos get the nearest of a NEIGHBORHOOD of the
    treated unit rather than of the full pool — the returned p-value
    is exact for that neighborhood permutation, conservative-leaning
    as screen_k grows.

    Cost shape: the distributed screen+collect runs ONCE (3·K series);
    every placebo re-screen + Frank-Wolfe fit is driver-side over the
    series already in memory, so inference adds ZERO Spark jobs — at
    100 TB the placebo loop costs the same as at 100 MB.

    Returns ``{treated_ratio, placebo_ratios: {id: ratio}, p_value,
    att_post, weights}``. ``placebo_ratios`` covers the ``donor_k``
    units of the REAL fit's donor set (the classical count), each fit
    on its own re-screened pool."""
    import numpy as np

    periods, y_tr, series, pool, pre, post = _screen_and_collect(
        panel, treated_id, t0, yname, tname, idname, donor_ids, donor_k,
        screen_k=3 * donor_k,
    )
    donor_list = _nearest(y_tr, series, pool, pre, donor_k)
    w, out_series, gaps, pre_rmspe, post_rmspe = _fit_one(
        y_tr, series, donor_list, periods, pre, post, fw_iters
    )
    treated_ratio = (
        float(post_rmspe / pre_rmspe) if pre_rmspe > 0 else float("inf")
    )
    placebo_ratios: dict = {}
    for d in donor_list:
        rest = _nearest(
            series[d], series, [x for x in pool if x != d], pre, donor_k
        )
        if not rest:
            continue
        _, _, _, pre_r, post_r = _fit_one(
            series[d], series, rest, periods, pre, post, fw_iters
        )
        placebo_ratios[d] = float(post_r / pre_r) if pre_r > 0 else float("inf")
    n_ge = sum(1 for r in placebo_ratios.values() if r >= treated_ratio)
    return {
        "treated_ratio": treated_ratio,
        "placebo_ratios": placebo_ratios,
        "p_value": (1 + n_ge) / (1 + len(placebo_ratios)),
        "att_post": float(np.mean([gaps[t] for t in post])) if post else 0.0,
        "weights": {
            d: float(w[j]) for j, d in enumerate(donor_list) if w[j] > 1e-6
        },
    }


def augmented_synthetic_control(
    panel: DataFrame,
    treated_id,
    t0,
    yname: str = "y",
    tname: str = "period",
    idname: str = "id",
    donor_ids: DataFrame | None = None,
    donor_k: int = 50,
    fw_iters: int = 800,
    lam: float = 1.0,
) -> dict:
    """Ridge-augmented synthetic control (Ben-Michael, Feller &
    Rothstein 2021, JASA, "The Augmented Synthetic Control Method").

    Classical SC (``synthetic_control`` above) restricts weights to
    the simplex, so when the treated unit sits OUTSIDE the donors'
    convex hull the fit carries irreducible pre-period imbalance that
    propagates into the post-period gap as bias. ASCM corrects the
    estimate with an outcome model: with donor pre-period matrix
    ``X`` (K x T0, columns centered across donors) and treated
    pre-vector ``x``,

        w_aug = w_scm + X_c (X_c' X_c + lam I)^{-1} (x_c - X_c' w_scm)

    i.e. the SCM weights plus a ridge-regression extrapolation that
    closes the residual imbalance ``x - X' w_scm``. Column centering
    makes each correction column sum to zero, so ``sum(w_aug) = 1``
    still — but individual weights may now be negative (the
    documented, intentional extrapolation of the method; lam -> inf
    recovers plain SCM).

    Scale shape: identical to ``synthetic_control`` — the ONLY
    distributed work is the shared donor pre-screen + bounded K-series
    collect (one aggregation over the pool, O(K*T) floats to the
    driver); the ridge solve is a T0 x T0 driver inversion. The
    placebo machinery applies unchanged.

    Returns the ``synthetic_control`` dict plus ``series_scm`` (the
    un-augmented series for comparison), ``imbalance_pre`` (L2 norm of
    the SCM pre-fit residual the ridge term corrects), and
    ``att_post_scm``. No counterpart in the reference package
    (d2cml-ai/csdid-pyspark) — beyond-reference robustness surface.
    """
    import numpy as np

    periods, y_tr, series, donor_list, pre, post = _screen_and_collect(
        panel, treated_id, t0, yname, tname, idname, donor_ids, donor_k
    )
    w_scm, scm_series, scm_gaps, pre_rmspe, post_rmspe = _fit_one(
        y_tr, series, donor_list, periods, pre, post, fw_iters
    )
    # donors x pre matrix, centered across donors per pre-period
    X = np.array([[series[d][t] for t in pre] for d in donor_list])
    x_tr = np.array([y_tr[t] for t in pre])
    mu = X.mean(axis=0)
    Xc = X - mu
    xc = x_tr - mu
    resid = xc - Xc.T @ w_scm
    T0 = len(pre)
    gamma = np.linalg.solve(Xc.T @ Xc + lam * np.eye(T0), resid)
    w_aug = w_scm + Xc @ gamma
    out_series = []
    for t in periods:
        synth = float(
            sum(w_aug[j] * series[d][t] for j, d in enumerate(donor_list))
        )
        out_series.append((t, y_tr[t], synth, y_tr[t] - synth))
    gaps = {t: g for t, _, _, g in out_series}
    return {
        "weights": {d: float(w_aug[j]) for j, d in enumerate(donor_list)},
        "series": out_series,
        "series_scm": scm_series,
        "att_post": float(np.mean([gaps[t] for t in post])) if post else 0.0,
        "att_post_scm": (
            float(np.mean([scm_gaps[t] for t in post])) if post else 0.0
        ),
        "imbalance_pre": float(np.sqrt(np.sum(resid**2))),
        "pre_rmspe": float(np.sqrt(np.mean([gaps[t] ** 2 for t in pre]))),
        "post_rmspe": (
            float(np.sqrt(np.mean([gaps[t] ** 2 for t in post])))
            if post
            else 0.0
        ),
    }


def _fw_simplex_reg(X, y, reg, iters):
    """min_w ||X w - y||^2 + reg * ||w||^2 over the simplex, via the
    same deterministic Frank-Wolfe as ``_frank_wolfe_simplex`` (lowest-
    index ties, 2/(k+2) steps). ``reg`` = 0 recovers the plain fit."""
    import numpy as np

    K = X.shape[1]
    w = np.zeros(K)
    w[0] = 1.0
    for k in range(iters):
        grad = 2.0 * X.T @ (X @ w - y) + 2.0 * reg * w
        j = int(np.argmin(grad))
        step = 2.0 / (k + 2.0)
        w *= 1.0 - step
        w[j] += step
    return w


def _sdid_core(y_map, series, donor_list, pre, post, fw_iters, n_tr=1):
    """Driver-side SDID algebra for ONE (pseudo-)treated series against
    an in-memory donor list: omega/lambda Frank-Wolfe fits + the
    doubly-weighted 2x2 DiD. ``n_tr`` enters only through the paper's
    zeta rule (eq. 5 uses (N_tr * T_post)^(1/4)). Zero Spark jobs."""
    import numpy as np

    Tpre, Tpost = len(pre), len(post)
    Ypre = np.array([[series[d][t] for t in pre] for d in donor_list])
    Ypost_mean = np.array(
        [np.mean([series[d][t] for t in post]) for d in donor_list]
    )
    ytr_pre = np.array([y_map[t] for t in pre])
    ytr_post = float(np.mean([y_map[t] for t in post]))

    # zeta (eq. 5): sd of donor pre first differences
    diffs = np.diff(Ypre, axis=1).ravel()
    sigma = float(np.std(diffs, ddof=0)) if diffs.size else 0.0
    zeta = (float(n_tr) * Tpost) ** 0.25 * sigma

    # omega: treated pre on donor pre columns. The intercept omega0 is
    # constant across periods, so it is profiled out by centering each
    # series (every donor and the treated) by its own pre-period mean.
    Xo = (Ypre - Ypre.mean(axis=1, keepdims=True)).T  # (Tpre x K)
    yo = ytr_pre - ytr_pre.mean()
    omega = _fw_simplex_reg(Xo, yo, reg=(zeta**2) * Tpre, iters=fw_iters)

    # lambda: donor post-means on donor pre columns (Tpre regressors),
    # intercept profiled by centering each donor's pre row and its
    # post mean by the same cross-donor means
    Xl = Ypre - Ypre.mean(axis=0, keepdims=True)  # (K x Tpre)
    yl = Ypost_mean - Ypost_mean.mean()
    lam = _fw_simplex_reg(Xl, yl, reg=0.0, iters=fw_iters)

    tau = (ytr_post - float(lam @ ytr_pre)) - float(
        omega @ (Ypost_mean - Ypre @ lam)
    )
    resid = yo - Xo @ omega
    return {
        "att": float(tau),
        "omega": omega,
        "lam": lam,
        "zeta": float(zeta),
        "pre_rmse": float(np.sqrt(np.mean(resid**2))),
    }


def synthetic_did(
    panel: DataFrame,
    treated_id,
    t0,
    yname: str = "y",
    tname: str = "period",
    idname: str = "id",
    donor_ids: DataFrame | None = None,
    donor_k: int = 50,
    fw_iters: int = 800,
    placebo_se: bool = False,
) -> dict:
    """Synthetic difference-in-differences (Arkhangelsky, Athey,
    Hirshberg, Imbens & Wager 2021, AER): the estimator that nests both
    neighbors in this module — unit weights omega re-weight controls to
    parallel the treated unit's PRE trend (like SC, but only up to a
    level shift: the intercept is profiled out), time weights lambda
    re-weight pre-periods to predict the post window, and the effect is
    the doubly-weighted two-by-two DiD

        tau = (ybar_tr,post - sum_t lambda_t y_tr,t)
            - sum_i omega_i (ybar_i,post - sum_t lambda_t y_it)

    Unlike SC, a pure level difference between treated and donors does
    NOT bias SDID (the DiD differences it out); unlike plain DiD, a
    non-parallel donor pool is re-weighted until it IS parallel.

    Weights follow the paper: omega solves the intercept-profiled
    (column-centered) simplex ridge fit of the treated pre series on
    donor pre series with zeta^2 * T_pre regularization,
    zeta = (N_tr * T_post)^(1/4) * sigma_hat and sigma_hat = the sd of
    first differences of donor pre outcomes (eq. 5); lambda solves the
    unregularized intercept-profiled simplex fit of donor post-means
    on donor pre columns. Both run the deterministic Frank-Wolfe.

    Scale shape — identical contract to ``synthetic_control``: the
    donor pool is the data-scale object, pre-screened distributedly in
    ONE aggregation; only ``donor_k`` series (K x T floats) reach the
    driver, where both weight fits and the tau readout are tiny dense
    algebra. Deviation from the paper (documented): weights are fitted
    over the screened top-K pool, not the full pool — same bounded-K
    trade-off as the SC/ASCM fits.

    Returns ``{"att": tau, "omega": {donor: w}, "lam": {period: w},
    "zeta": zeta, "pre_rmse": weighted pre-fit rmse}``.

    ``placebo_se=True`` adds the paper's placebo variance (§4,
    Algorithm 4 with N_tr = 1): re-run the whole estimator pretending
    each screened donor were the treated unit (its own re-screened
    ``donor_k``-nearest pool, same as ``placebo_test``'s discipline —
    a placebo is never forced through donors chosen for someone
    else), and estimate  Var(tau) = mean_b (tau_b - taubar)^2  over
    the placebo taus. Adds ``se``, ``p_value`` (two-sided normal),
    ``placebo_taus`` and ``n_placebo`` to the returned dict. The
    distributed screen simply oversamples to 3x ``donor_k`` (same
    single aggregation); every placebo refit is driver-side algebra
    over the already-collected series — inference adds ZERO Spark
    jobs, so at 100 TB it costs the same as at 100 MB. The REAL fit
    is unchanged: its donor set is the ``donor_k`` nearest, i.e.
    exactly the set the un-oversampled screen would have kept.
    """
    import math

    periods, y_tr, series, pool, pre, post, screen_order = (
        _screen_and_collect(
            panel, treated_id, t0, yname, tname, idname, donor_ids,
            donor_k,
            screen_k=(3 * donor_k) if placebo_se else donor_k,
            return_screen_order=True,
        )
    )
    if not post:
        raise ValueError("synthetic_did: no post-treatment periods")
    # the real fit's donor set is the SCREEN's own (dist, id)-ordered
    # top donor_k — identical to the un-oversampled screen's keep set
    # WHEN all of the raw top donor_k pass the full-window coverage
    # filter (the common case; screen_order is post-coverage, so if
    # some of the raw top-k lack coverage, the un-oversampled screen
    # keeps FEWER donors while the oversampled one backfills from the
    # next ranks — toggling placebo_se can then move att). Chosen over
    # a driver-side float re-rank, which could flip near-ties at the
    # donor_k boundary; sorted for deterministic design-matrix column
    # order
    donor_list = sorted(screen_order[:donor_k]) if placebo_se else pool
    core = _sdid_core(y_tr, series, donor_list, pre, post, fw_iters)
    out = {
        "att": core["att"],
        "omega": {
            d: float(core["omega"][j]) for j, d in enumerate(donor_list)
        },
        "lam": {int(t): float(core["lam"][k]) for k, t in enumerate(pre)},
        "zeta": core["zeta"],
        "pre_rmse": core["pre_rmse"],
    }
    if placebo_se:
        taus = {}
        for d in donor_list:
            rest = _nearest(
                series[d], series, [x for x in pool if x != d], pre, donor_k
            )
            if not rest:
                continue
            taus[d] = _sdid_core(
                series[d], series, rest, pre, post, fw_iters
            )["att"]
        if len(taus) < 2:
            raise ValueError(
                "synthetic_did: placebo_se needs >=2 placebo-fittable "
                "donors"
            )
        vals = list(taus.values())
        tbar = sum(vals) / len(vals)
        se = math.sqrt(sum((v - tbar) ** 2 for v in vals) / len(vals))
        z = abs(core["att"]) / se if se > 0 else float("inf")
        out.update(
            se=float(se),
            p_value=float(2.0 * (1.0 - _phi(z))),
            placebo_taus={d: float(v) for d, v in taus.items()},
            n_placebo=len(taus),
        )
    return out


def _phi(z: float) -> float:
    """Standard normal CDF via erf — driver-side scalar."""
    import math

    return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))


def synthetic_did_staggered(
    panel: DataFrame,
    gname: str = "g",
    yname: str = "y",
    tname: str = "period",
    idname: str = "id",
    donor_k: int = 50,
    fw_iters: int = 800,
    placebo_se: bool = False,
    n_placebo: int = 50,
    seed: int = 7,
    control: str = "nevertreated",
) -> dict:
    """Staggered-adoption SDID (Arkhangelsky et al. 2021, Appendix A):
    run the estimator ONCE PER ADOPTION COHORT — cohort g's treated
    series is the cross-unit mean of its members, the donor pool is
    the never-treated units (g = 0), the pre window is t < g — and
    average the cohort taus with weights proportional to the number
    of treated unit-periods  N_g * T_post,g  (the paper's
    recommendation for staggered designs).

    ``control="notyettreated"`` admits LATER-ADOPTING units into each
    cohort's donor pool (the analogue of the CS estimator's
    not-yet-treated control group, for panels where every unit is
    eventually treated): cohort g's post window is truncated to end
    BEFORE its donors' own adoption — if never-treated units exist the
    window stays [g, max_t] and the pool is g' = 0 or g' > max_t;
    otherwise the window ends at (latest adoption) − 1 and the pool is
    every unit with g' > that end, so a donor's OWN treated periods
    are never read by the fit (pre t < g ≤ post ≤ window end < g').
    The latest cohort itself then has no donors and is dropped from
    the average (its treated periods exist only where no control
    exists). Weights still N_g × |post window| with the truncated
    window.

    Multi-unit form: with N_g treated units, the paper's uniform
    1/N_g treated weights make the treated side exactly the cohort
    MEAN series, and zeta scales as (N_g * T_post)^(1/4) — both
    handled by ``_sdid_core(n_tr=N_g)``.

    Distributed shape (the cohort count |G| is tiny, the pool is
    not): ONE aggregation collects every cohort's mean series
    (|G| x T decimal-exact rows); ONE groupBy(id) aggregation scores
    every donor's squared pre-distance against ALL cohorts
    simultaneously (|G| distance columns); per-cohort top-k is a
    TakeOrdered over that id-level score frame (no full sort); the
    union of survivors is collected once (<= |G| * donor_k series).
    Every fit is then driver-side Frank-Wolfe.

    Returns ``{"att": weighted tau, "cohorts": {g: {"att", "zeta",
    "pre_rmse", "n_units", "n_post", "weight"}}}``.

    ``placebo_se=True`` adds Algorithm-4 placebo variance generalized
    to the staggered design: each of ``n_placebo`` replicates draws,
    per cohort g, a PSEUDO-COHORT of min(N_g, pool/2) never-treated
    units (deterministic seeded sampling from the 3x-oversampled
    screen pool), fits SDID on the pseudo-cohort's MEAN series against
    its own re-screened donors, and combines the per-cohort placebo
    taus with the REAL weights — so the replicate-level sd prices the
    CROSS-COHORT correlation through shared donors that per-cohort
    placebo loops would miss. Adds ``se``/``p_value`` overall and
    ``se`` per cohort; every replicate is driver algebra over the
    already-collected series (zero extra Spark jobs — the screen just
    collects 3x donor_k series per cohort instead of donor_k).
    """
    p = panel.select(
        F.col(idname).alias("id"),
        F.col(gname).alias("g"),
        F.col(tname).alias("t"),
        F.col(yname).alias("y"),
    )
    periods = sorted(r["t"] for r in p.select("t").distinct().collect())
    # cohort mean series: one decimal-exact agg, |G| x T rows
    DEC = "decimal(38,12)"
    mrows = (
        p.filter(F.col("g") > 0)
        .groupBy("g", "t")
        .agg(
            (F.sum(F.col("y").cast(DEC)).cast("double") / F.count("*")).alias(
                "m"
            ),
            F.count_distinct("id").alias("n"),
        )
        .collect()
    )
    cmean: dict = {}
    csize: dict = {}
    for r in mrows:
        cmean.setdefault(r["g"], {})[r["t"]] = float(r["m"])
        csize[r["g"]] = max(csize.get(r["g"], 0), int(r["n"]))
    if control not in ("nevertreated", "notyettreated"):
        raise ValueError(
            "synthetic_did_staggered: control must be 'nevertreated' or "
            f"'notyettreated', got {control!r}"
        )
    max_t = periods[-1]
    n_never = p.filter(F.col("g") == 0).select("id").distinct().count()
    all_gs = sorted(cmean)  # every adoption cohort present in the data
    # per-cohort post-window end + donor-pool threshold: donors are
    # units with g' == 0 or g' > t_end (their own treated periods lie
    # strictly after every period the fit reads)
    t_end: dict = {}
    for g in cmean:
        if n_never > 0 or control == "nevertreated":
            t_end[g] = max_t
        else:
            later = [x for x in all_gs if x > g]
            t_end[g] = (max(later) - 1) if later else (g - 1)
    cohorts = sorted(
        g
        for g in cmean
        if len([t for t in periods if t < g]) >= 2
        and any(g <= t <= t_end[g] for t in periods)
        and all(t in cmean[g] for t in periods)
    )
    if not cohorts:
        raise ValueError(
            "synthetic_did_staggered: no cohort has >=2 pre periods, a "
            "post window with an available donor pool, and full period "
            "coverage"
            + (
                " (with control='nevertreated' and no never-treated "
                "units, consider control='notyettreated')"
                if control == "nevertreated" and n_never == 0
                else ""
            )
        )
    if control == "notyettreated":
        # any potential donor for SOME cohort: never-treated, or
        # adopting after the earliest cohort's window could end
        donors = p.filter(
            (F.col("g") == 0) | (F.col("g") > min(cohorts))
        )
    else:
        donors = p.filter(F.col("g") == 0)
    # one groupBy(id) pass scoring every donor against every cohort's
    # pre window; coverage over the FULL window required (same rule as
    # _screen_and_collect, applied once for all cohorts)
    aggs = [F.count("*").alias("n_all"), F.max("g").alias("g_unit")]
    for g in cohorts:
        pre_g = [t for t in periods if t < g]
        m = cmean[g]
        dist = F.sum(
            F.when(
                F.col("t") < g,
                (
                    F.col("y")
                    - F.coalesce(
                        F.create_map(
                            *[
                                x
                                for t in pre_g
                                for x in (F.lit(t), F.lit(m[t]))
                            ]
                        )[F.col("t")],
                        F.lit(0.0),
                    )
                )
                ** 2,
            ).otherwise(F.lit(0.0))
        )
        aggs.append(dist.alias(f"d_{g}"))
    scored = donors.groupBy("id").agg(*aggs).filter(
        F.col("n_all") == len(periods)
    )
    scored = scored.persist()
    screen_k = (3 * donor_k) if placebo_se else donor_k
    keep: set = set()
    pools: dict = {}
    real_pool: dict = {}
    for g in cohorts:
        ids = [
            r["id"]
            for r in scored.filter(
                (F.col("g_unit") == 0) | (F.col("g_unit") > t_end[g])
            )
            .orderBy(f"d_{g}", "id")
            .limit(screen_k)
            .collect()
        ]
        # the real fit keeps the screen's OWN distributed ranking (the
        # first donor_k in (dist, id) order) — a driver-side re-rank
        # over float sums could flip near-ties at the donor_k boundary
        # and perturb att when placebo_se toggles
        real_pool[g] = ids[:donor_k]
        pools[g] = sorted(ids)
        keep.update(ids)
    scored.unpersist(blocking=False)
    empty = [g for g in cohorts if not real_pool[g]]
    if empty:
        raise ValueError(
            "synthetic_did_staggered: no donor with full period coverage "
            f"for cohort(s) {empty}"
            + (
                " (no never-treated units in the panel; consider "
                "control='notyettreated')"
                if control == "nevertreated" and n_never == 0
                else ""
            )
        )
    keep_df = p.sparkSession.createDataFrame(
        [(i,) for i in sorted(keep)], "id " + dict(p.dtypes)["id"]
    )
    kept = (
        donors.join(F.broadcast(keep_df), "id", "left_semi")
        .orderBy("id", "t")
        .collect()
    )
    series: dict = {}
    for r in kept:
        series.setdefault(r["id"], {})[r["t"]] = float(r["y"])

    cohort_out: dict = {}
    wsum = tsum = 0.0
    windows = {
        g: (
            [t for t in periods if t < g],
            [t for t in periods if g <= t <= t_end[g]],
        )
        for g in cohorts
    }
    for g in cohorts:
        pre, post = windows[g]
        # the real fit's donor set: the screen's own (dist, id)-ordered
        # top donor_k — identical whether or not the pool was
        # oversampled for placebo_se; sorted so the Frank-Wolfe column
        # order (and hence the placebo_se=False output) is unchanged
        donor_list = sorted(real_pool[g])
        core = _sdid_core(
            cmean[g], series, donor_list, pre, post, fw_iters,
            n_tr=csize[g],
        )
        w = float(csize[g] * len(post))
        cohort_out[int(g)] = {
            "att": core["att"],
            "zeta": core["zeta"],
            "pre_rmse": core["pre_rmse"],
            "n_units": int(csize[g]),
            "n_post": len(post),
            "weight": w,
        }
        wsum += w
        tsum += w * core["att"]
    out = {"att": tsum / wsum, "cohorts": cohort_out}
    if placebo_se:
        import math
        import random

        if n_placebo < 2:
            raise ValueError(
                "synthetic_did_staggered: n_placebo must be >= 2"
            )
        # feasibility is b-independent: check every cohort's pool ONCE
        # before the replicate loop instead of aborting mid-replicate
        for g in cohorts:
            k_ps = min(csize[g], len(pools[g]) // 2)
            if k_ps < 1 or len(pools[g]) - k_ps < 2:
                raise ValueError(
                    "synthetic_did_staggered: placebo_se needs every "
                    "cohort's donor pool to support a pseudo-cohort draw "
                    f"plus >= 2 remaining donors (cohort g={g}: pool "
                    f"{len(pools[g])}, N_g {csize[g]})"
                )
        overall_taus = []
        cohort_taus: dict = {g: [] for g in cohorts}
        for b in range(n_placebo):
            rng = random.Random(seed * 1_000_003 + b)
            tb = wb = 0.0
            for g in cohorts:
                pre, post = windows[g]
                pool = pools[g]
                k_ps = min(csize[g], len(pool) // 2)
                pseudo = rng.sample(pool, k_ps)
                pmean = {
                    t: sum(series[d][t] for d in pseudo) / k_ps
                    for t in periods
                }
                rest = _nearest(
                    pmean,
                    series,
                    [d for d in pool if d not in set(pseudo)],
                    pre,
                    donor_k,
                )
                tau_g = _sdid_core(
                    pmean, series, rest, pre, post, fw_iters, n_tr=k_ps
                )["att"]
                cohort_taus[g].append(tau_g)
                w = float(csize[g] * len(post))
                tb += w * tau_g
                wb += w
            overall_taus.append(tb / wb)
        mu = sum(overall_taus) / len(overall_taus)
        se = math.sqrt(
            sum((x - mu) ** 2 for x in overall_taus) / len(overall_taus)
        )
        z = abs(out["att"]) / se if se > 0 else float("inf")
        out["se"] = float(se)
        out["p_value"] = float(2.0 * (1.0 - _phi(z)))
        out["n_placebo"] = len(overall_taus)
        for g in cohorts:
            v = cohort_taus[g]
            m_g = sum(v) / len(v)
            cohort_out[int(g)]["se"] = float(
                math.sqrt(sum((x - m_g) ** 2 for x in v) / len(v))
            )
    return out


# ---------------------------------------------------------------------------
# Conformal counterfactual inference (Chernozhukov, Wüthrich & Zhu 2021)
# ---------------------------------------------------------------------------


def _conformal_cohort_screen(p, donor_k, control, caller):
    """Shared distributed head of the conformal family
    (:func:`conformal_staggered` / :func:`conformal_trace`): cohort
    mean series (ONE decimal-exact aggregation), per-cohort post-window
    ends under the chosen ``control`` group, cohort eligibility, donor
    pools (ONE groupBy(id) pass scoring every donor against ALL
    cohorts + per-cohort TakeOrdered), and one bounded collect of the
    union of surviving donor series.

    ``control="nevertreated"`` keeps the historical pool (g' = 0 over
    the full period range). ``control="notyettreated"`` reuses the
    exact rule :func:`synthetic_did_staggered` ships (synth.py:684-
    717): if never-treated units exist the window stays [g, max_t] and
    the pool is g' = 0 or g' > max_t; otherwise cohort g's window ends
    at (latest adoption) − 1 and its pool is every unit with
    g' > window end — a donor's OWN treated periods are never read
    (pre t < g ≤ post ≤ t_end < g'), and the latest cohort drops out
    (no donors exist for its treated periods).

    Returns (periods, cmean, csize, cohorts, t_end, pools, series)."""
    if control not in ("nevertreated", "notyettreated"):
        raise ValueError(
            f"{caller}: control must be 'nevertreated' or "
            f"'notyettreated', got {control!r}"
        )
    periods = sorted(r["t"] for r in p.select("t").distinct().collect())
    DEC = "decimal(38,12)"
    mrows = (
        p.filter(F.col("g") > 0)
        .groupBy("g", "t")
        .agg(
            (F.sum(F.col("y").cast(DEC)).cast("double") / F.count("*")).alias("m"),
            F.count_distinct("id").alias("n"),
        )
        .collect()
    )
    cmean: dict = {}
    csize: dict = {}
    for r in mrows:
        cmean.setdefault(r["g"], {})[r["t"]] = float(r["m"])
        csize[r["g"]] = max(csize.get(r["g"], 0), int(r["n"]))
    max_t = periods[-1]
    n_never = p.filter(F.col("g") == 0).select("id").distinct().count()
    all_gs = sorted(cmean)
    t_end: dict = {}
    for g in cmean:
        if n_never > 0 or control == "nevertreated":
            t_end[g] = max_t
        else:
            later = [x for x in all_gs if x > g]
            t_end[g] = (max(later) - 1) if later else (g - 1)
    cohorts = sorted(
        g
        for g in cmean
        if len([t for t in periods if t < g]) >= 2
        and any(g <= t <= t_end[g] for t in periods)
        and all(t in cmean[g] for t in periods if t <= t_end[g])
    )
    if not cohorts:
        raise ValueError(
            f"{caller}: no cohort has >=2 pre periods, a post window "
            "with an available donor pool, and full window coverage"
            + (
                " (no never-treated units in the panel; consider "
                "control='notyettreated')"
                if control == "nevertreated" and n_never == 0
                else ""
            )
        )
    if control == "notyettreated":
        donors = p.filter(
            (F.col("g") == 0) | (F.col("g") > min(cohorts))
        )
    else:
        donors = p.filter(F.col("g") == 0)
    aggs = [F.count("*").alias("n_all"), F.max("g").alias("g_unit")]
    for g in cohorts:
        pre_g = [t for t in periods if t < g]
        m = cmean[g]
        dist = F.sum(
            F.when(
                F.col("t") < g,
                (
                    F.col("y")
                    - F.coalesce(
                        F.create_map(
                            *[x for t in pre_g for x in (F.lit(t), F.lit(m[t]))]
                        )[F.col("t")],
                        F.lit(0.0),
                    )
                )
                ** 2,
            ).otherwise(F.lit(0.0))
        )
        aggs.append(dist.alias(f"d_{g}"))
    scored = donors.groupBy("id").agg(*aggs).filter(
        F.col("n_all") == len(periods)
    )
    scored = scored.persist()
    keep: set = set()
    pools: dict = {}
    for g in cohorts:
        ids = [
            r["id"]
            for r in scored.filter(
                (F.col("g_unit") == 0) | (F.col("g_unit") > t_end[g])
            )
            .orderBy(f"d_{g}", "id")
            .limit(donor_k)
            .collect()
        ]
        pools[g] = sorted(ids)
        keep.update(ids)
    scored.unpersist(blocking=False)
    empty = [g for g in cohorts if not pools[g]]
    if empty:
        raise ValueError(
            f"{caller}: no donor with full period coverage for "
            f"cohort(s) {empty}"
            + (
                " (no never-treated units in the panel; consider "
                "control='notyettreated')"
                if control == "nevertreated" and n_never == 0
                else ""
            )
        )
    keep_df = p.sparkSession.createDataFrame(
        [(i,) for i in sorted(keep)], "id " + dict(p.dtypes)["id"]
    )
    kept = (
        donors.join(F.broadcast(keep_df), "id", "left_semi")
        .orderBy("id", "t")
        .collect()
    )
    series: dict = {}
    for r in kept:
        series.setdefault(r["id"], {})[r["t"]] = float(r["y"])
    return periods, cmean, csize, cohorts, t_end, pools, series


def _conformal_p(y_adj, series, donor_list, periods, post, model, fw_iters, q):
    """CWZ moving-block p-value for ONE hypothesized effect already
    subtracted from ``y_adj``: refit the counterfactual model on ALL
    periods (under H0 the adjusted series is untreated everywhere),
    compute residuals, and rank the post-block test statistic among
    all |T| cyclic blocks. Driver numpy over collected series."""
    import numpy as np

    X = np.array([[series[d][t] for t in periods] for d in donor_list]).T
    y = np.array([y_adj[t] for t in periods])
    if model == "sdid":
        # intercept profiled out: center every series by its own mean
        Xf = X - X.mean(axis=0, keepdims=True)
        yf = y - y.mean()
    else:
        Xf, yf = X, y
    w = _frank_wolfe_simplex(Xf, yf, iters=fw_iters)
    u = yf - Xf @ w
    T = len(periods)
    T1 = len(post)
    post_set = {t for t in post}
    # the observed post block is the LAST T1 indices (periods sorted)
    s_obs = float(np.mean(np.abs(u[T - T1 :]) ** q)) ** (1.0 / q)
    ge = 0
    for j in range(T):
        idx = [(j + k) % T for k in range(T1)]
        s_j = float(np.mean(np.abs(u[idx]) ** q)) ** (1.0 / q)
        if s_j >= s_obs - 1e-15:
            ge += 1
    return ge / T, u


def _conformal_p_grid(
    y_adjs, series, donor_list, periods, post, model, fw_iters, q
):
    """:func:`_conformal_p` for MANY hypothesized adjustments sharing
    one donor design (a test-inversion grid): the Frank-Wolfe refits
    run as ONE batched stream (:func:`_fw_simplex_batch`), then each
    column's centering, residuals and cyclic-block statistics use the
    EXACT scalar-path arithmetic (per-column 1-D construction, the
    same GEMV, the same block loop), so every (p, u) is bit-identical
    to a `_conformal_p` call for that column. Returns a list aligned
    with ``y_adjs``."""
    import numpy as np

    X = np.array([[series[d][t] for t in periods] for d in donor_list]).T
    if model == "sdid":
        Xf = X - X.mean(axis=0, keepdims=True)
    else:
        Xf = X
    yfs = []
    for y_adj in y_adjs:
        y = np.array([y_adj[t] for t in periods])
        yfs.append(y - y.mean() if model == "sdid" else y)
    W = _fw_simplex_batch(Xf, np.column_stack(yfs), iters=fw_iters)
    T = len(periods)
    T1 = len(post)
    out = []
    for g, yf in enumerate(yfs):
        u = yf - Xf @ np.ascontiguousarray(W[:, g])
        s_obs = float(np.mean(np.abs(u[T - T1 :]) ** q)) ** (1.0 / q)
        ge = 0
        for j in range(T):
            idx = [(j + k) % T for k in range(T1)]
            s_j = float(np.mean(np.abs(u[idx]) ** q)) ** (1.0 / q)
            if s_j >= s_obs - 1e-15:
                ge += 1
        out.append((ge / T, u))
    return out


def conformal_test(
    panel: DataFrame,
    treated_id,
    t0,
    theta0: float = 0.0,
    yname: str = "y",
    tname: str = "period",
    idname: str = "id",
    donor_ids: DataFrame | None = None,
    donor_k: int = 50,
    fw_iters: int = 800,
    model: str = "sc",
    q: float = 1.0,
) -> dict:
    """Exact-in-finite-samples conformal test (Chernozhukov, Wüthrich
    & Zhu 2021, JASA, "An Exact and Robust Conformal Inference Method
    for Counterfactual and Synthetic Controls") of the sharp null
    H0: the treatment effect equals ``theta0`` in every post period.

    Procedure: subtract theta0 from the treated unit's post outcomes,
    REFIT the counterfactual model on ALL T periods (under H0 the
    adjusted series is untreated everywhere), and rank the post-block
    residual statistic  (mean |u|^q)^(1/q)  among all T moving
    (cyclic) blocks — exact at level alpha under block
    exchangeability/stationarity of the residuals, ROBUST to the
    weights being estimated (CWZ Thm 1-2), and complementary to the
    in-space placebo inference (``placebo_test`` permutes UNITS; this
    permutes TIME). ``model``: "sc" (plain simplex fit) or "sdid"
    (intercept profiled by centering — the level-shift-immune
    variant). The attainable p floor is 1/T — with few periods the
    test cannot reject at conventional levels, by design.

    Distributed shape: ONE screen + bounded K-series collect (the
    same `_screen_and_collect` contract as every fit in this module);
    the refit + T block statistics are driver numpy.

    Returns ``{"p_value", "stat", "theta0", "residuals": {period: u}}``.
    """
    periods, y_tr, series, donor_list, pre, post = _screen_and_collect(
        panel, treated_id, t0, yname, tname, idname, donor_ids, donor_k
    )
    if not post:
        raise ValueError("conformal_test: no post-treatment periods")
    y_adj = {t: y_tr[t] - (theta0 if t >= t0 else 0.0) for t in periods}
    p, u = _conformal_p(
        y_adj, series, donor_list, periods, post, model, fw_iters, q
    )
    T1 = len(post)
    import numpy as np

    s_obs = float(np.mean(np.abs(u[len(periods) - T1 :]) ** q)) ** (1.0 / q)
    return {
        "p_value": float(p),
        "stat": s_obs,
        "theta0": float(theta0),
        "residuals": {int(t): float(v) for t, v in zip(periods, u)},
    }


def conformal_interval(
    panel: DataFrame,
    treated_id,
    t0,
    yname: str = "y",
    tname: str = "period",
    idname: str = "id",
    donor_ids: DataFrame | None = None,
    donor_k: int = 50,
    fw_iters: int = 800,
    model: str = "sc",
    q: float = 1.0,
    alpha: float = 0.1,
    grid_points: int = 81,
) -> dict:
    """Conformal confidence interval for a CONSTANT post-period effect
    by test inversion (CWZ 2021 §3): the set of theta whose
    ``conformal_test`` p-value exceeds ``alpha``, scanned over a
    deterministic grid centered at the SDID point estimate with
    half-width 6x the pre-fit residual scale (widened adaptively if
    the boundary is hit). The grid loop is pure driver algebra — the
    screen + collect runs ONCE and every inversion step refits
    Frank-Wolfe on the in-memory matrices, so the interval costs the
    same one Spark aggregation as the point estimate.

    alpha defaults to 0.1: the p floor is 1/T, so ten-percent
    inversion stays meaningful on short panels. Returns ``{"lo",
    "hi", "theta_hat", "alpha", "grid_lo", "grid_hi", "p_at_hat"}``.
    """
    import numpy as np

    periods, y_tr, series, donor_list, pre, post = _screen_and_collect(
        panel, treated_id, t0, yname, tname, idname, donor_ids, donor_k
    )
    if not post:
        raise ValueError("conformal_interval: no post-treatment periods")
    core = _sdid_core(y_tr, series, donor_list, pre, post, fw_iters)
    theta_hat = core["att"]
    # residual scale from the omega pre-fit (always > 0 under noise;
    # floor at 1e-9 to keep a degenerate exact fit from collapsing
    # the grid)
    scale = max(core["pre_rmse"], 1e-9)

    def pval(theta):
        y_adj = {
            t: y_tr[t] - (theta if t >= t0 else 0.0) for t in periods
        }
        return _conformal_p(
            y_adj, series, donor_list, periods, post, model, fw_iters, q
        )[0]

    half = 6.0 * scale + abs(theta_hat) * 0.5
    for _ in range(6):  # widen if the acceptance region hits the edge
        grid = np.linspace(theta_hat - half, theta_hat + half, grid_points)
        # whole grid refit as ONE batched Frank-Wolfe stream; p-values
        # bit-identical to per-point pval() (see _conformal_p_grid)
        y_adjs = [
            {t: y_tr[t] - (float(th) if t >= t0 else 0.0) for t in periods}
            for th in grid
        ]
        ps = _conformal_p_grid(
            y_adjs, series, donor_list, periods, post, model, fw_iters, q
        )
        acc = [float(th) for th, (pv, _u) in zip(grid, ps) if pv > alpha]
        if acc and (acc[0] > grid[0] + 1e-12) and (acc[-1] < grid[-1] - 1e-12):
            break
        half *= 2.0
    if not acc:
        # no theta accepted (possible when T1/T makes the floor p
        # exceed alpha impossible) — degenerate, return the point
        acc = [theta_hat]
    return {
        "lo": float(min(acc)),
        "hi": float(max(acc)),
        "theta_hat": float(theta_hat),
        "alpha": float(alpha),
        "grid_lo": float(grid[0]),
        "grid_hi": float(grid[-1]),
        "p_at_hat": float(pval(theta_hat)),
    }


def conformal_staggered(
    panel: DataFrame,
    gname: str = "g",
    yname: str = "y",
    tname: str = "period",
    idname: str = "id",
    theta0: float = 0.0,
    donor_k: int = 50,
    fw_iters: int = 800,
    model: str = "sdid",
    q: float = 1.0,
    alpha: float = 0.1,
    grid_points: int = 81,
    interval: bool = True,
    control: str = "nevertreated",
) -> dict:
    """Conformal inference for MULTI-TREATED / staggered designs (CWZ
    2021 §4): with N_g treated units adopting at g, the sharp null
    H0: effect = theta0 for every treated unit in every post period
    implies the cohort MEAN series minus theta0·1{t >= g} is an
    untreated series, so the single-treated moving-block machinery
    (:func:`conformal_test`) applies to the cohort mean — CWZ's own
    multi-treated prescription (averaging also shrinks the mean's
    idiosyncratic noise by 1/N_g, sharpening the test). Runs per
    adoption cohort; ``control`` picks the donor pool:
    "nevertreated" (default) uses the g' = 0 units over the full
    period range, "notyettreated" admits LATER adopters with the
    post window truncated before the donors' own adoption — the exact
    pool rule :func:`synthetic_did_staggered` ships (the latest cohort
    then drops out; with never-treated units present the two modes
    coincide), extending exact conformal inference to panels where
    every unit is eventually treated. All block statistics and refits
    then run over the truncated window only, so a donor's own treated
    periods are never read.

    Distributed shape — the staggered-SDID screen pattern: ONE
    decimal-exact aggregation collects every cohort's mean series,
    ONE groupBy(id) pass scores every donor against ALL cohorts
    simultaneously, per-cohort top-k via TakeOrdered, one bounded
    collect of the union of survivors; every refit (T cyclic blocks x
    grid inversion x cohorts) is driver Frank-Wolfe over the collected
    K x T matrices — inference adds ZERO Spark jobs beyond the point
    estimate's.

    Returns ``{"cohorts": {g: {"p_value", "stat", "theta_hat",
    "n_units" [, "lo", "hi"]}}, "theta0", "alpha"}``. ``interval``
    adds the per-cohort test-inversion CI for a constant effect
    (p floor is 1/T — alpha defaults to 0.1 as in
    :func:`conformal_interval`).
    """
    import numpy as np

    p = panel.select(
        F.col(idname).alias("id"),
        F.col(gname).alias("g"),
        F.col(tname).alias("t"),
        F.col(yname).alias("y"),
    )
    periods, cmean, csize, cohorts, t_end, pools, series = (
        _conformal_cohort_screen(p, donor_k, control, "conformal_staggered")
    )

    out: dict = {"cohorts": {}, "theta0": float(theta0), "alpha": float(alpha)}
    for g in cohorts:
        win = [t for t in periods if t <= t_end[g]]
        pre = [t for t in win if t < g]
        post = [t for t in win if t >= g]
        pool = pools[g]

        def pval(th, _g=g, _win=win, _post=post, _pool=pool):
            y_adj = {
                t: cmean[_g][t] - (th if t >= _g else 0.0) for t in _win
            }
            return _conformal_p(
                y_adj, series, _pool, _win, _post, model, fw_iters, q
            )
        p_at, u = pval(theta0)
        T1 = len(post)
        s_obs = float(np.mean(np.abs(u[len(win) - T1:]) ** q)) ** (1.0 / q)
        core = _sdid_core(
            cmean[g], series, pool, pre, post, fw_iters, n_tr=csize[g]
        )
        row = {
            "p_value": float(p_at),
            "stat": s_obs,
            "theta_hat": float(core["att"]),
            "n_units": int(csize[g]),
        }
        if interval:
            theta_hat = core["att"]
            scale = max(core["pre_rmse"], 1e-9)
            half = 6.0 * scale + abs(theta_hat) * 0.5
            acc: list = []
            interior = False
            for _ in range(6):
                grid = np.linspace(
                    theta_hat - half, theta_hat + half, grid_points
                )
                # one batched Frank-Wolfe stream for the whole grid;
                # bit-identical to per-point pval() (_conformal_p_grid)
                y_adjs = [
                    {
                        t: cmean[g][t] - (float(th) if t >= g else 0.0)
                        for t in win
                    }
                    for th in grid
                ]
                ps = _conformal_p_grid(
                    y_adjs, series, pool, win, post, model, fw_iters, q
                )
                acc = [
                    float(th)
                    for th, (pv, _u) in zip(grid, ps)
                    if pv > alpha
                ]
                if acc and acc[0] > grid[0] + 1e-12 and acc[-1] < grid[-1] - 1e-12:
                    interior = True
                    break
                half *= 2.0
            if not acc:
                acc = [theta_hat]
                interior = True  # degenerate point, still bounded
            # acceptance still touching the (repeatedly doubled) grid
            # edge means the region is effectively unbounded — the
            # moving-block p need NOT be monotone in theta (e.g. with
            # T1 = T/2 and intercept centering a constant shift splits
            # +-theta/2 across the blocks and every block ties, p -> 1
            # as |theta| grows), so report the bound as None instead of
            # an arbitrary grid edge
            row["lo"] = float(min(acc)) if interior else None
            row["hi"] = float(max(acc)) if interior else None
        out["cohorts"][int(g)] = row
    return out


def conformal_trace(
    panel: DataFrame,
    gname: str = "g",
    yname: str = "y",
    tname: str = "period",
    idname: str = "id",
    donor_k: int = 50,
    fw_iters: int = 800,
    model: str = "sdid",
    alpha: float = 0.2,
    grid_points: int = 61,
    control: str = "nevertreated",
) -> dict:
    """Per-PERIOD conformal effect trace for staggered designs (CWZ
    2021 §4.2): for each cohort g and each post period s, the
    pointwise null H0: theta_s = c is tested by adjusting ONLY period
    s of the cohort-mean series, refitting the counterfactual on the
    pre window PLUS the adjusted s (the other post periods are treated
    as missing — their unspecified effects never enter), and ranking
    |u_s| among the fit's residuals (moving blocks of length 1); the
    pointwise CI inverts that test over a grid. The result is a
    conformal analogue of an event-study band — exact pointwise
    coverage under residual exchangeability, no Gaussian or
    variance-estimation input.

    Same distributed shape as :func:`conformal_staggered` (one
    cohort-mean aggregation + one all-cohorts screen + one bounded
    collect; refits are driver Frank-Wolfe), including the ``control``
    donor-pool modes — "notyettreated" truncates each cohort's traced
    window before its donors' own adoption, so the trace runs on
    all-eventually-treated panels too (the latest cohort drops out).
    ``alpha`` must clear the attainable p floor 1/(T0+1). Returns
    ``{"cohorts": {g: [(s, e, theta_hat_s, lo, hi), ...]}, "alpha"}``
    where ``theta_hat_s`` is the gap at s under the unadjusted refit
    and (lo, hi) the pointwise conformal interval (None when
    acceptance never becomes interior)."""
    import numpy as np

    p = panel.select(
        F.col(idname).alias("id"),
        F.col(gname).alias("g"),
        F.col(tname).alias("t"),
        F.col(yname).alias("y"),
    )
    periods, cmean, _csize, cohorts, t_end, pools, series = (
        _conformal_cohort_screen(p, donor_k, control, "conformal_trace")
    )

    out: dict = {"cohorts": {}, "alpha": float(alpha)}
    for g in cohorts:
        pre = [t for t in periods if t < g]
        post = [t for t in periods if g <= t <= t_end[g]]
        pool = pools[g]
        rows_g = []
        for s in post:
            win = pre + [s]  # other post periods excluded entirely

            # pre+s donor design, built ONCE per (g, s): every grid
            # point refits against the same Xf, so the whole grid runs
            # as one batched Frank-Wolfe stream (_fw_simplex_batch);
            # per-point arithmetic (column construction, centering,
            # GEMV residual, rank) is the exact scalar path, so each
            # pointwise p is bit-identical to a per-point refit.
            Xw = np.array([[series[d][t] for t in win] for d in pool]).T
            Xfw = (
                Xw - Xw.mean(axis=0, keepdims=True)
                if model == "sdid"
                else Xw
            )

            def pointwise_p_grid(cs, _g=g, _s=s, _win=win, _Xfw=Xfw):
                """Rank of |u_s| among the pre+s refit's residuals,
                for every hypothesized c in ``cs`` at once."""
                yfs = []
                for c in cs:
                    y = np.array(
                        [
                            cmean[_g][t] - (c if t == _s else 0.0)
                            for t in _win
                        ]
                    )
                    yfs.append(y - y.mean() if model == "sdid" else y)
                W = _fw_simplex_batch(
                    _Xfw, np.column_stack(yfs), iters=fw_iters
                )
                ps = []
                for i, yf in enumerate(yfs):
                    u = np.abs(yf - _Xfw @ np.ascontiguousarray(W[:, i]))
                    ps.append(
                        float((u >= u[-1] - 1e-15).sum()) / len(_win)
                    )
                return ps

            # unadjusted gap at s from the pre-only fit = theta_hat_s
            Xp = np.array([[series[d][t] for t in pre] for d in pool]).T
            yp = np.array([cmean[g][t] for t in pre])
            if model == "sdid":
                mu_x = Xp.mean(axis=0, keepdims=True)
                mu_y = yp.mean()
                w0 = _frank_wolfe_simplex(Xp - mu_x, yp - mu_y, iters=fw_iters)
                x_s = np.array([series[d][s] for d in pool])
                yhat_s = float((x_s - mu_x[0]) @ w0) + mu_y
                res_pre = (yp - mu_y) - (Xp - mu_x) @ w0
            else:
                w0 = _frank_wolfe_simplex(Xp, yp, iters=fw_iters)
                yhat_s = float(
                    np.array([series[d][s] for d in pool]) @ w0
                )
                res_pre = yp - Xp @ w0
            th_hat = cmean[g][s] - yhat_s
            # grid scale from the PRE-FIT RESIDUALS: the acceptance
            # region's width is a residual-magnitude quantile, so the
            # grid must resolve at residual scale (a value-scale grid
            # can step right over it)
            scale = max(float(np.max(np.abs(res_pre))), 1e-9)
            half = 8.0 * scale + 0.1 * abs(th_hat)
            lo = hi = None
            for _ in range(6):
                grid = np.linspace(th_hat - half, th_hat + half, grid_points)
                ps = pointwise_p_grid([float(c) for c in grid])
                acc = [
                    float(c) for c, pv in zip(grid, ps) if pv > alpha
                ]
                if acc and acc[0] > grid[0] + 1e-12 and acc[-1] < grid[-1] - 1e-12:
                    lo, hi = float(acc[0]), float(acc[-1])
                    break
                half *= 2.0
            rows_g.append((int(s), int(s - g), float(th_hat), lo, hi))
        out["cohorts"][int(g)] = rows_g
    return out


def conformal_staggered_pooled(
    panel: DataFrame,
    gname: str = "g",
    yname: str = "y",
    tname: str = "period",
    idname: str = "id",
    theta0: float = 0.0,
    donor_k: int = 50,
    fw_iters: int = 800,
    model: str = "sdid",
    q: float = 1.0,
    alpha: float = 0.1,
    grid_points: int = 81,
    interval: bool = True,
    control: str = "nevertreated",
    max_units: int = 50,
) -> dict:
    """Moving-block conformal test for a CONSTANT cohort effect with
    the POOLED-residual statistic across treated units (CWZ 2021 §4)
    — the full-window counterpart of :func:`conformal_trace_pooled`:
    under H0: θ_{j,t} = θ0 for every unit j and post t, EACH treated
    unit's adjusted series is untreated, so each is refit separately
    over the (possibly NYT-truncated) window and the block statistic
    pools residual magnitudes across units,
    S(block) = (mean_{t∈block} Σ_j |u_{j,t}|^q)^{1/q}, ranked over
    all |win| cyclic blocks. Versus the cohort-MEAN test
    (:func:`conformal_staggered`): pooling |residuals| instead of
    averaging SERIES keeps power when unit effects are heterogeneous
    or opposite-signed (they cancel in the mean, never in S), at the
    cost of N_g driver refits per evaluation — hence the ``max_units``
    guard (small-cohort tool; the mean test is the large-cohort
    shape). With one treated unit the two tests coincide (pytest-
    pinned). Test inversion can return an EMPTY interval (lo = hi =
    None with a rejected ``p_value``) when no constant θ fits every
    unit — the constant-sharp-null diagnostic.

    Same screen/``control`` modes as the mean test plus one bounded
    treated-series collect. Returns ``{"cohorts": {g: {"p_value",
    "theta_hat", "n_units" [, "lo", "hi"]}}, "theta0", "alpha"}``
    (``theta_hat`` = the cohort-mean SDID estimate, the same point
    the mean test reports)."""
    import numpy as np

    p = panel.select(
        F.col(idname).alias("id"),
        F.col(gname).alias("g"),
        F.col(tname).alias("t"),
        F.col(yname).alias("y"),
    )
    periods, cmean, csize, cohorts, t_end, pools, series = (
        _conformal_cohort_screen(
            p, donor_k, control, "conformal_staggered_pooled"
        )
    )
    big = [g for g in cohorts if csize[g] > max_units]
    if big:
        raise ValueError(
            "conformal_staggered_pooled: cohort(s) "
            f"{big} exceed max_units={max_units} — use "
            "conformal_staggered (the cohort-mean test) for large "
            "cohorts"
        )
    trows = (
        p.filter(F.col("g").isin([g for g in cohorts]))
        .orderBy("id", "t")
        .collect()
    )
    tser: dict = {}
    for r in trows:
        tser.setdefault(r["g"], {}).setdefault(r["id"], {})[r["t"]] = float(
            r["y"]
        )

    out: dict = {"cohorts": {}, "theta0": float(theta0), "alpha": float(alpha)}
    for g in cohorts:
        win = [t for t in periods if t <= t_end[g]]
        pre = [t for t in win if t < g]
        post = [t for t in win if t >= g]
        pool = pools[g]
        units = sorted(tser.get(g, {}))
        X = np.array([[series[d][t] for t in win] for d in pool]).T
        Xf = X - X.mean(axis=0, keepdims=True) if model == "sdid" else X
        T, T1 = len(win), len(post)

        def pvals(thetas, _g=g, _win=win, _Xf=Xf, _T=T, _T1=T1):
            """Pooled moving-block p for every theta in ``thetas``:
            all (theta × unit) refits share Xf, so they run as ONE
            batched Frank-Wolfe stream; each unit's residual column
            and the S accumulation keep the scalar path's arithmetic
            and unit order — p-values bit-identical to per-theta
            evaluation."""
            yfs = []
            for th in thetas:
                for uid in units:
                    y = np.array(
                        [
                            tser[_g][uid][t] - (th if t >= _g else 0.0)
                            for t in _win
                        ]
                    )
                    yfs.append(y - y.mean() if model == "sdid" else y)
            W = _fw_simplex_batch(_Xf, np.column_stack(yfs), iters=fw_iters)
            out_ps = []
            for a in range(len(thetas)):
                S = np.zeros(_T)
                for b in range(len(units)):
                    i = a * len(units) + b
                    u = yfs[i] - _Xf @ np.ascontiguousarray(W[:, i])
                    S += np.abs(u) ** q
                s_obs = float(np.mean(S[_T - _T1:])) ** (1.0 / q)
                ge = 0
                for j in range(_T):
                    idx = [(j + kk) % _T for kk in range(_T1)]
                    if float(np.mean(S[idx])) ** (1.0 / q) >= s_obs - 1e-15:
                        ge += 1
                out_ps.append(ge / _T)
            return out_ps

        core = _sdid_core(
            cmean[g], series, pool, pre, post, fw_iters, n_tr=csize[g]
        )
        row = {
            "p_value": float(pvals([theta0])[0]),
            "theta_hat": float(core["att"]),
            "n_units": int(csize[g]),
        }
        if interval:
            theta_hat = core["att"]
            scale = max(core["pre_rmse"], 1e-9)
            half = 6.0 * scale + abs(theta_hat) * 0.5
            acc: list = []
            interior = False
            for _ in range(6):
                grid = np.linspace(
                    theta_hat - half, theta_hat + half, grid_points
                )
                ps = pvals([float(th) for th in grid])
                acc = [
                    float(th) for th, pv in zip(grid, ps) if pv > alpha
                ]
                if acc and acc[0] > grid[0] + 1e-12 and acc[-1] < grid[-1] - 1e-12:
                    interior = True
                    break
                half *= 2.0
            if not acc:
                # no constant effect fits every unit: empty interval,
                # reported as None/None (the heterogeneity diagnostic)
                row["lo"] = row["hi"] = None
            else:
                row["lo"] = float(min(acc)) if interior else None
                row["hi"] = float(max(acc)) if interior else None
        out["cohorts"][int(g)] = row
    return out


def conformal_trace_pooled(
    panel: DataFrame,
    gname: str = "g",
    yname: str = "y",
    tname: str = "period",
    idname: str = "id",
    donor_k: int = 50,
    fw_iters: int = 800,
    model: str = "sdid",
    alpha: float = 0.2,
    grid_points: int = 61,
    control: str = "nevertreated",
    max_units: int = 50,
) -> dict:
    """Per-period conformal trace with the POOLED-RESIDUAL rank
    statistic across treated units (CWZ 2021 §4's multiple-treated
    prescription applied pointwise) — the power-variant of
    :func:`conformal_trace` for SMALL cohorts with heterogeneous
    effects: the mean-series test averages unit effects before
    testing, so opposite-signed effects CANCEL and go undetected;
    here each treated unit j is refit separately under the sharp null
    θ_{j,s} = c, the statistic is the pooled absolute residual
    S_t = Σ_j |u_{j,t}| over the window, and the p-value is S's rank
    at the adjusted period — heterogeneity inflates S_s no matter the
    signs. Under genuinely heterogeneous effects NO constant c fits
    every unit, so the pointwise CI can be EMPTY (lo = hi = None with
    ``p_zero`` small) — itself the diagnostic that the sharp constant
    null is wrong.

    Same screen (and ``control`` donor-pool modes) as the mean-series
    trace, plus ONE extra bounded collect of the treated-unit series —
    bounded because ``max_units`` caps each cohort (raises beyond it:
    the pooled refit loop is driver-side numpy per unit, the RIGHT
    shape only for small cohorts; large cohorts should use the
    mean-series trace, where averaging is the power TOOL not a loss).

    Returns ``{"cohorts": {g: [(s, e, theta_hat_s, lo, hi, p_zero),
    ...]}, "alpha"}``: ``theta_hat_s`` = the cross-unit mean gap at s
    under pre-only per-unit refits, (lo, hi) the inverted pooled
    pointwise CI, ``p_zero`` the pooled p-value of c = 0."""
    import numpy as np

    p = panel.select(
        F.col(idname).alias("id"),
        F.col(gname).alias("g"),
        F.col(tname).alias("t"),
        F.col(yname).alias("y"),
    )
    periods, cmean, csize, cohorts, t_end, pools, series = (
        _conformal_cohort_screen(p, donor_k, control, "conformal_trace_pooled")
    )
    big = [g for g in cohorts if csize[g] > max_units]
    if big:
        raise ValueError(
            "conformal_trace_pooled: cohort(s) "
            f"{big} exceed max_units={max_units} — the pooled per-unit "
            "refit loop is for small cohorts; use conformal_trace (the "
            "cohort-mean test) for large ones"
        )
    glist = [g for g in cohorts]
    trows = (
        p.filter(F.col("g").isin(glist)).orderBy("id", "t").collect()
    )
    tser: dict = {}
    for r in trows:
        tser.setdefault(r["g"], {}).setdefault(r["id"], {})[r["t"]] = float(
            r["y"]
        )

    out: dict = {"cohorts": {}, "alpha": float(alpha)}
    for g in cohorts:
        pre = [t for t in periods if t < g]
        post = [t for t in periods if g <= t <= t_end[g]]
        pool = pools[g]
        units = sorted(tser.get(g, {}))
        rows_g = []
        for s in post:
            win = pre + [s]
            X = np.array([[series[d][t] for t in win] for d in pool]).T
            if model == "sdid":
                Xf = X - X.mean(axis=0, keepdims=True)
            else:
                Xf = X

            def pooled_p_grid(cs, _g=g, _s=s, _win=win, _Xf=Xf):
                """Pooled rank p for every hypothesized c in ``cs``:
                all (c × unit) refits share Xf → ONE batched
                Frank-Wolfe stream; per-column arithmetic and the
                unit-ordered S accumulation match the scalar path
                bit-for-bit."""
                yfs = []
                for c in cs:
                    for uid in units:
                        y = np.array(
                            [
                                tser[_g][uid][t] - (c if t == _s else 0.0)
                                for t in _win
                            ]
                        )
                        yfs.append(y - y.mean() if model == "sdid" else y)
                W = _fw_simplex_batch(
                    _Xf, np.column_stack(yfs), iters=fw_iters
                )
                ps = []
                for a in range(len(cs)):
                    S = np.zeros(len(_win))
                    for b in range(len(units)):
                        i = a * len(units) + b
                        S += np.abs(
                            yfs[i] - _Xf @ np.ascontiguousarray(W[:, i])
                        )
                    ps.append(
                        float((S >= S[-1] - 1e-15).sum()) / len(_win)
                    )
                return ps

            # cross-unit mean gap at s from per-unit PRE-ONLY fits —
            # one batched Frank-Wolfe over the units (shared design)
            Xp = np.array([[series[d][t] for t in pre] for d in pool]).T
            mu_x = Xp.mean(axis=0, keepdims=True)
            x_s = np.array([series[d][s] for d in pool])
            yps = [
                np.array([tser[g][uid][t] for t in pre]) for uid in units
            ]
            if model == "sdid":
                Xp_f = Xp - mu_x
                yfs0 = [yp - yp.mean() for yp in yps]
            else:
                Xp_f = Xp
                yfs0 = yps
            W0 = _fw_simplex_batch(
                Xp_f, np.column_stack(yfs0), iters=fw_iters
            )
            gaps = []
            res_scale = 0.0
            for i, uid in enumerate(units):
                w0 = np.ascontiguousarray(W0[:, i])
                if model == "sdid":
                    mu_y = yps[i].mean()
                    yhat_s = float((x_s - mu_x[0]) @ w0) + mu_y
                else:
                    yhat_s = float(x_s @ w0)
                res = yfs0[i] - Xp_f @ w0
                gaps.append(tser[g][uid][s] - yhat_s)
                res_scale = max(res_scale, float(np.max(np.abs(res))))
            th_hat = float(np.mean(gaps))
            p0 = pooled_p_grid([0.0])[0]
            scale = max(res_scale, 1e-9)
            half = 8.0 * scale + 0.1 * abs(th_hat)
            lo = hi = None
            for _ in range(6):
                grid = np.linspace(th_hat - half, th_hat + half, grid_points)
                ps = pooled_p_grid([float(c) for c in grid])
                acc = [
                    float(c) for c, pv in zip(grid, ps) if pv > alpha
                ]
                if acc and acc[0] > grid[0] + 1e-12 and acc[-1] < grid[-1] - 1e-12:
                    lo, hi = float(acc[0]), float(acc[-1])
                    break
                half *= 2.0
            rows_g.append(
                (int(s), int(s - g), th_hat, lo, hi, float(p0))
            )
        out["cohorts"][int(g)] = rows_g
    return out
