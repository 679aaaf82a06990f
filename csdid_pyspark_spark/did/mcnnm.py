"""Matrix-completion counterfactual estimator (MC-NNM).

Athey, Bayati, Doudchenko, Imbens & Khosravi (2021, JASA, "Matrix
Completion Methods for Causal Panel Data Models"): treat the treated
cells (i, t >= g_i) of the outcome matrix as MISSING, complete the
matrix under a two-way-fixed-effects + nuclear-norm-regularized
low-rank model fitted on the observed (untreated) cells, and read
treatment effects off ``y - y_hat`` on the treated cells:

    min_{L, a, b}  sum_{(i,t) in O} (y_it - a_i - b_t - L_it)^2
                   + lam * ||L||_*

solved by the paper's own block scheme — alternate the fixed-effect
updates with SOFT-IMPUTE singular-value thresholding (Mazumder,
Hastie & Tibshirani 2010) on  R = P_O(y - a - b) + P_O^c(L).

This generalizes the estimators around it: lam -> inf gives the
two-way-FE imputation estimator (did/imputation.py, BJS), a rank-r
unpenalized L is gsynth (did/ife.py), and unit-convex-combination
structure is synthetic control (did/synth.py). Reference scope: the
reference package (d2cml-ai/csdid-pyspark) has no factor/completion
estimator at all — beyond-reference surface.

Distributed shape — what survives 100 TB:

* The panel is held WIDE (one row per unit, T outcome columns — T is
  calendar time, tiny) and cached once.
* Per-unit state is the r-vector ``a_i`` (the unit's row-factor of
  L = A V'): an ``array<double>`` COLUMN, refreshed each iteration by
  a NARROW projection (no shuffle) and truncated from the lineage
  with ``localCheckpoint`` — the same executor-side iteration pattern
  MLlib's ALS uses. Nothing per-unit ever reaches the driver.
* Driver state per iteration is O(T^2): the time fixed effects b_t,
  the right factors V (T x T) and the shrunk spectrum. Each
  iteration runs ONE aggregation — per-period FE sums plus the upper
  triangle of the T x T Gram of the working matrix, every sum cast
  to decimal(38,12) so the result is BIT-IDENTICAL across partition
  counts and session shapes (the same determinism contract as
  did/ife.py's factor extraction).
* The T x T eigendecomposition + soft-threshold runs on the driver
  (numpy, microseconds); the new A = M V diag(s) is the narrow
  projection above.

Iteration count is FIXED (no data-dependent stopping) and the
eigenvectors are sign-fixed, so the whole fit is deterministic —
pinned-golden-safe. The unit FE a_i is profiled out in closed form
inside every pass (it is the observed-cell row mean of y - b - L), so
it needs no stored state at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(38,12)"


class UnidentifiedPeriodError(ValueError):
    """A period lost its last untreated observation (either in the raw
    panel or under a CV holdout mask), leaving its time fixed effect
    unidentified. ``mc_nnm_cv`` treats THIS error as an infeasible
    candidate; any other ValueError is a data-integrity problem and
    propagates."""


def _eig_svt(gram, lam):
    """Driver-side SVT factors from the T x T Gram G = M'M: returns
    (V, s) with V the sign-fixed eigenvectors and s_j the SOFT-IMPUTE
    scale  max(sigma_j - lam, 0) / sigma_j  so that
    A = M V diag(s)  gives  L = A V' = SVT_lam(M)."""
    import numpy as np

    vals, vecs = np.linalg.eigh(gram)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    sig = np.sqrt(np.clip(vals, 0.0, None))
    # deterministic sign: largest-|entry| coordinate positive
    for j in range(vecs.shape[1]):
        k = int(np.argmax(np.abs(vecs[:, j])))
        if vecs[k, j] < 0:
            vecs[:, j] = -vecs[:, j]
    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.where(sig > 0, np.maximum(sig - lam, 0.0) / np.where(sig > 0, sig, 1.0), 0.0)
    return vecs, s


def _mcnnm_pivot(p: DataFrame, n_x: int):
    """Shared head of the MC-NNM fits: period discovery, the panel
    integrity guard (duplicate (id, t) cells / multi-g units raise),
    and the ONE data-scale pivot to the wide frame
    (id, g, y0..y{T-1}[, x{k}_{i}..]). ``p`` must already carry
    normalized column names (id, g, t, y[, x_0..]). Returns
    (periods, wide)."""
    periods = sorted(r["t"] for r in p.select("t").distinct().collect())
    T = len(periods)
    if T < 2:
        raise ValueError(f"mc_nnm: {T} period(s) observed; need >= 2")
    # integrity guard, ONE panel pass: duplicate (id, t) observations
    # would make the pivot cell partition-order-dependent (breaking the
    # bit-determinism contract), and a unit with two g values would
    # silently split into two rows — both raise instead
    chk = (
        p.groupBy("id")
        .agg(
            F.count("*").alias("nr"),
            F.count_distinct("t").alias("nt"),
            F.count_distinct("g").alias("ng"),
        )
        .filter((F.col("nr") > F.col("nt")) | (F.col("ng") > 1))
        .limit(1)
        .collect()
    )
    if chk:
        r = chk[0]
        raise ValueError(
            f"mc_nnm: unit {r['id']!r} has "
            + (
                "multiple g values"
                if r["ng"] > 1
                else "duplicate (id, period) observations"
            )
            + " — aggregate the panel to one row per (unit, period, "
            "cohort) upstream"
        )
    ycols = [f"y{i}" for i in range(T)]
    if n_x == 0:
        wide = (
            p.groupBy("id", "g")
            .pivot("t", periods)
            # max = the single value after the duplicate guard above; a
            # deterministic reducer keeps the golden contract honest
            # even if the guard is ever bypassed
            .agg(F.max("y"))
            .select(
                "id",
                "g",
                *[F.col(str(t)).alias(c) for t, c in zip(periods, ycols)],
            )
        )
    else:
        wide = (
            p.groupBy("id", "g")
            .pivot("t", periods)
            .agg(
                F.max("y").alias("y"),
                *[F.max(f"x_{k}").alias(f"x{k}") for k in range(n_x)],
            )
            .select(
                "id",
                "g",
                *[F.col(f"{t}_y").alias(c) for t, c in zip(periods, ycols)],
                *[
                    F.col(f"{t}_x{k}").alias(f"x{k}_{i}")
                    for k in range(n_x)
                    for i, t in enumerate(periods)
                ],
            )
        )
    return periods, wide


def mc_nnm(
    panel: DataFrame,
    yname: str = "y",
    tname: str = "period",
    idname: str = "id",
    gname: str = "g",
    shrink_frac: float = 0.1,
    iters: int = 25,
    placebo_b: int = 0,
    placebo_seed: int = 9,
    holdout: tuple | None = None,
    xnames: tuple = (),
    _prebuilt: tuple | None = None,
    tol: float = 0.0,
    _warm_in: dict | None = None,
    _warm_out: bool = False,
) -> dict:
    """Fit MC-NNM on a staggered-adoption panel (``g`` = first treated
    period, 0 = never treated) and return the event-time effect path.

    ``shrink_frac``: the nuclear-norm threshold lam is set to
    ``shrink_frac * sigma_max`` of the INITIAL working matrix (L = 0,
    FE-only residuals) — a deterministic data-scaled rule standing in
    for the paper's cross-validated lam.

    Returns ``{"att": [(e, att_e, n_e), ...] sorted by event time,
    "att_overall": float, "lam": float, "sigma": [final spectrum],
    "rank": effective rank}``.

    ``placebo_b > 0`` adds in-space placebo bands (the gsynth-style
    nonparametric placebo / Chernozhukov et al. 2021 cross-sectional
    permutation idea, under the no-refit approximation): each of B
    replicates deterministically hash-assigns NEVER-TREATED units
    pseudo-adoption cohorts in the real cohorts' unit-count
    proportions, reads their pseudo-effect paths off the SAME
    converged fit (y - alpha - beta - L on pseudo-post cells), and the
    per-event placebo sd over replicates is the band. Cost: ONE extra
    aggregation over the final cached projection (the replicate
    dimension is a generate + map-side-combinable grouped sum — B x E
    result rows), zero refits. Approximation, documented: control
    cells were IN the fit, so residuals are in-sample — bands tighten
    slightly as the fit's effective dof grows; with fewer controls
    than treated units the pseudo-cohort probabilities are scaled down
    (each replicate under-fills the design, widening the bands —
    conservative). Adds ``"bands": [(e, att_e, se_e, lo, hi)]`` and
    ``"placebo_b"`` to the dict (normal 95% bands).

    ``holdout=(seed, frac)`` (the CV machinery of :func:`mc_nnm_cv`):
    a deterministic hash-selected ``frac`` of the observed control
    cells is EXCLUDED from the fit — never a unit's first observed
    cell, so no unit loses identification — and their squared
    prediction error against the converged alpha + beta + L is
    returned as ``"holdout_mse"``/``"holdout_n"`` (one extra decimal
    aggregation). A held-out period can still lose its last untreated
    observation; that raises :class:`UnidentifiedPeriodError`, which
    the CV loop treats as an infeasible lambda.

    ``xnames``: optional (unit, period)-varying covariate columns —
    the covariate-augmented model of Athey et al. 2021 §8.3,
    ``y = alpha_i + beta_t + L + x'theta``, fitted RESIDUALIZE-THEN-
    IMPUTE: theta is the EXACT two-way-FE OLS of y on x over the
    observed (untreated) cells — one aggregation collecting the
    within-unit-demeaned normal equations over [period dummies, x],
    one (T-1+p)-square driver solve — then FROZEN, and the standard
    soft-impute loop runs on y - x'theta. (Interleaving theta updates
    with the L updates is an unstable Jacobi alternation — theta and L
    chase the same interaction structure, since any unit x time
    covariate pattern is low-rank, and the fit was observed to
    oscillate and diverge; the freeze trades that for a documented
    approximation: covariate variation INSIDE the low-rank space is
    attributed to theta, not L.) Treated-cell effects are read off
    y - x'theta - alpha - beta - L; ``"theta"`` is returned per
    covariate.

    ``_prebuilt``: internal — ``(periods, wide_base)`` with
    ``wide_base`` an ALREADY-PERSISTED pivot (id, g, y0.., x{k}_{i}..)
    built by :func:`mc_nnm_cv`, so the |grid|+1 CV fits share ONE
    data-scale pivot instead of each rebuilding (and re-integrity-
    checking) their own. Callers passing it own its lifecycle.

    ``tol > 0`` enables soft-impute EARLY STOPPING: the iteration
    loop exits as soon as max(|Δbeta|, |Δsigma|) ≤ tol · sigma_max —
    the standard convergence rule for the soft-impute fixed point.
    The exit reuses the fixed-iteration path's own break point, so
    the returned (alpha, beta, theta, L) tuple is exactly a converged
    shorter run; tol = 0 (default) keeps the bit-pinned fixed-``iters``
    behavior. ``_warm_in``/``_warm_out`` (internal, CV machinery):
    ``_warm_out=True`` attaches ``"_state"`` — the loop-top tuple
    (cur frame, V, beta, theta, sigma0_max) at exit — and
    ``_warm_in`` resumes from a previous fit's state at a DIFFERENT
    shrink_frac (soft-impute path warm start): the data-scale guards,
    theta phase and FE-only lam calibration are skipped (all are
    lam-independent and already ran in the cold fit; lam is
    shrink_frac × the passed sigma0_max) and the loop starts at the
    warm factors. Requires ``_prebuilt`` and an identical holdout
    mask."""
    import numpy as np

    P = len(xnames)
    if _prebuilt is not None:
        periods, wide = _prebuilt
    else:
        p = panel.select(
            F.col(idname).alias("id"),
            F.col(gname).alias("g"),
            F.col(tname).alias("t"),
            F.col(yname).alias("y"),
            *[F.col(x).alias(f"x_{k}") for k, x in enumerate(xnames)],
        )
        periods, wide = _mcnnm_pivot(p, P)
    T = len(periods)
    ycols = [f"y{i}" for i in range(T)]
    xcols = [[f"x{k}_{i}" for i in range(T)] for k in range(P)]

    # observed mask (SQL-string form, shared with the per-pass
    # expressions below): untreated cell AND outcome present; under a
    # CV holdout, ALSO not hash-held-out (a unit's first raw-observed
    # cell is never held, so every unit keeps >= 1 fitting cell)
    def raw_s(i):
        return f"((g = 0 OR {periods[i]} < g) AND {ycols[i]} IS NOT NULL)"

    extra_cols = []
    if holdout is not None:
        h_seed, h_frac = int(holdout[0]), float(holdout[1])
        if not (0.0 < h_frac < 1.0):
            raise ValueError("mc_nnm: holdout frac must be in (0, 1)")
        thr = int(h_frac * 1_000_000)
        fobs = (
            "CASE "
            + " ".join(f"WHEN {raw_s(i)} THEN {i}" for i in range(T))
            + " ELSE -1 END"
        )
        if _warm_in is None:  # a warm frame already carries _fobs
            wide = wide.withColumn("_fobs", F.expr(fobs))
        extra_cols = ["_fobs"]

        def held_s(i):
            return (
                f"({raw_s(i)} AND _fobs <> {i} AND "
                f"pmod(xxhash64(id, {periods[i]}, {h_seed}), 1000000)"
                f" < {thr})"
            )

        def obs_s(i):
            return f"({raw_s(i)} AND NOT {held_s(i)})"

    else:
        held_s = None
        obs_s = raw_s

    if _warm_in is not None and _prebuilt is None:
        raise ValueError("mc_nnm: _warm_in requires _prebuilt")
    n_obs = F.expr(
        " + ".join(f"CAST({obs_s(i)} AS INT)" for i in range(T))
    )
    if _warm_in is None:
        wide = wide.withColumn("_nobs", n_obs).withColumn(
            "a", F.array(*[F.lit(0.0) for _ in range(T)])
        )
    # ONE pivot computation before the iterations: persist, then a
    # single agg both materializes the cache and returns (unit count,
    # zero-observed-cell count) — the guard and the row count no longer
    # each pay their own pivot pass. Under _prebuilt the base pivot is
    # already persisted (and right-sized) by the CV caller: the derived
    # mask columns are narrow casts recomputed from that cache, so no
    # second copy is stored.
    if _prebuilt is None:
        wide = wide.persist()
    # a raw-observed cell with a NULL covariate would silently zero its
    # x'theta contribution — count and raise instead. A warm resume
    # skips the guards: they are lam-independent and already ran in
    # the cold fit on the identical mask.
    if _warm_in is not None:
        row0 = {"n": -1, "nbad": 0, "nxnull": 0}
        n_units = -1
    else:
        xnull = (
            F.expr(
                " + ".join(
                    f"CAST(({raw_s(i)} AND ({' OR '.join(f'{xcols[k][i]} IS NULL' for k in range(P))})) AS LONG)"
                    for i in range(T)
                )
            )
            if P
            else F.lit(0)
        )
        row0 = wide.agg(
            F.count("*").alias("n"),
            F.sum((F.col("_nobs") == 0).cast("long")).alias("nbad"),
            F.sum(xnull).alias("nxnull"),
        ).collect()[0]
        n_units = int(row0["n"])
    if row0["nbad"]:
        bad = wide.filter(F.col("_nobs") == 0).limit(1).collect()
        if _prebuilt is None:
            wide.unpersist(blocking=False)
        raise ValueError(
            f"mc_nnm: unit {bad[0]['id']!r} has zero observed (untreated, "
            "non-null) cells — its fixed effect is unidentified; drop such "
            "units upstream"
        )
    if P and int(row0["nxnull"] or 0):
        if _prebuilt is None:
            wide.unpersist(blocking=False)
        raise ValueError(
            f"mc_nnm: {int(row0['nxnull'])} observed cell(s) have a NULL "
            f"covariate ({', '.join(xnames)}) — impute or drop upstream"
        )
    # iteration frame partitioning targets CORES (2 waves over default
    # parallelism, 20k rows minimum) rather than the scan-oriented
    # rows-per-partition default: this frame is re-aggregated iters+1
    # times with decimal-heavy CPU work. The coalesce reads the cache
    # just materialized (no recompute, no shuffle); the oversized raw
    # cache is dropped once the compact copy materializes (dropq).
    raw = None
    if _prebuilt is None:
        par = wide.sparkSession.sparkContext.defaultParallelism
        target = max(20_000, n_units // max(2 * par, 1))
        npart = max(1, -(-n_units // target))
        if npart < wide.rdd.getNumPartitions():
            raw = wide
            wide = wide.coalesce(npart)
            wide.persist()

    beta = [0.0] * T
    V = np.zeros((T, T))
    s = np.zeros(T)
    lam = None
    sig0 = None
    sigma = np.zeros(T)
    last_sigma = sigma

    # All per-pass expressions are built as SQL STRINGS (one py4j call
    # per selectExpr/expr instead of hundreds of Column-object
    # round-trips — the Column-tree version spent ~1 s of DRIVER time
    # per iteration just constructing the plan). Float constants are
    # rendered with an exponent ("%.17e") so Spark SQL parses them as
    # DOUBLE literals (plain decimals would become DECIMAL) with exact
    # bit round-trip.
    def _f(x):
        return f"{float(x):.17e}"

    theta = np.zeros(P)
    xflat = [c for sub in xcols for c in sub]

    def yadj(i, th):
        """Covariate-adjusted outcome expression y_i - x_i'theta (the
        soft-impute pass runs on this; Athey et al. 2021 §8.3)."""
        if not P:
            return ycols[i]
        return (
            f"({ycols[i]} - ("
            + " + ".join(f"{_f(th[k])} * {xcols[k][i]}" for k in range(P))
            + "))"
        )

    def project(df, bl, ya, Vc, first):
        """ONE narrow projection computing this pass's working
        columns — L, the profiled-out unit FE alpha, and the working
        matrix M — so the downstream agg / factor refresh are LINEAR
        in T instead of nesting these trees 21x inside the Gram."""
        L = [
            (
                " + ".join(f"a[{j}] * {_f(Vc[i, j])}" for j in range(T))
                if not first
                else "CAST(0.0 AS DOUBLE)"
            )
            for i in range(T)
        ]
        alpha = (
            "("
            + " + ".join(
                f"(CASE WHEN {obs_s(i)} THEN {ya[i]} - {_f(bl[i])}"
                f" - ({L[i]}) ELSE 0.0 END)"
                for i in range(T)
            )
            + ") / _nobs"
        )
        exprs = ["id", "g", "_nobs", "a", *ycols, *xflat, *extra_cols]
        exprs.append(f"({alpha}) AS _al")
        exprs += [f"({L[i]}) AS _l{i}" for i in range(T)]
        return df.selectExpr(*exprs).selectExpr(
            "*",
            *[
                f"(CASE WHEN {obs_s(i)} THEN {ya[i]} - _al - {_f(bl[i])}"
                f" ELSE _l{i} END) AS _m{i}"
                for i in range(T)
            ],
        )

    # ------------------------------------------------------------------
    # Covariate phase (residualize-then-impute, Athey et al. 2021 §8.3):
    # theta = the EXACT two-way-FE OLS of y on x over the observed
    # cells, from ONE aggregation of within-unit-demeaned normal
    # equations (demeaning profiles the unit FE out in closed form; the
    # period FE enters as T-1 demeaned dummies), then FROZEN for the
    # soft-impute loop on y - x'theta. Interleaving theta updates WITH
    # the L updates is an unstable Jacobi alternation: theta and L
    # chase the same interaction structure (any unit x time covariate
    # pattern is low-rank) and the fit was observed to oscillate and
    # diverge (theta 1.44 -> -0.91 -> 3.3 -> -58 on a planted DGP).
    # The freeze trades that instability for a documented
    # approximation: covariate variation INSIDE the low-rank space is
    # attributed to theta, not L.
    if P and _warm_in is None:
        # regressors: period dummies for periods[1:] (period 0 is the
        # omitted baseline; the full dummy set is collinear after
        # within-unit demeaning) followed by the P covariates — all
        # within-unit demeaned over each unit's OBSERVED cells, which
        # profiles the unit FE out exactly. ONE aggregation collects
        # the (T-1+P)-square normal matrix + response cross-products;
        # theta is the last P coordinates of the driver solve.
        q = (T - 1) + P
        dm = wide.selectExpr(
            "*",
            *[
                "(("
                + " + ".join(
                    f"(CASE WHEN {obs_s(i)} THEN {xcols[k][i]}"
                    " ELSE 0.0 END)"
                    for i in range(T)
                )
                + f") / _nobs) AS _xb{k}"
                for k in range(P)
            ],
            "(("
            + " + ".join(
                f"(CASE WHEN {obs_s(i)} THEN {ycols[i]} ELSE 0.0 END)"
                for i in range(T)
            )
            + ") / _nobs) AS _yb",
        )

        def _reg(j, i):
            """Row value of demeaned regressor j at cell i (0 when the
            cell is unobserved): dummy_t - obs(t)/nobs for j < T-1
            (t = periods[j+1]), x_k - x̄_k for the covariate block."""
            if j < T - 1:
                tdx = j + 1
                return (
                    f"(CASE WHEN {obs_s(i)} THEN (CASE WHEN {i} = {tdx}"
                    f" THEN 1.0 ELSE 0.0 END) - (CASE WHEN {obs_s(tdx)}"
                    " THEN 1.0 ELSE 0.0 END) / _nobs ELSE 0.0 END)"
                )
            k = j - (T - 1)
            return (
                f"(CASE WHEN {obs_s(i)} THEN {xcols[k][i]} - _xb{k}"
                " ELSE 0.0 END)"
            )

        aggs0 = []
        for j1 in range(q):
            for j2 in range(j1, q):
                terms = " + ".join(
                    f"({_reg(j1, i)}) * ({_reg(j2, i)})" for i in range(T)
                )
                aggs0.append(
                    F.expr(f"sum(CAST(({terms}) AS {DEC})) AS n{j1}_{j2}")
                )
            terms = " + ".join(
                f"({_reg(j1, i)}) * (CASE WHEN {obs_s(i)} THEN"
                f" {ycols[i]} - _yb ELSE 0.0 END)"
                for i in range(T)
            )
            aggs0.append(
                F.expr(f"sum(CAST(({terms}) AS {DEC})) AS c{j1}")
            )
        row0x = dm.agg(*aggs0).collect()[0]
        N = np.empty((q, q))
        for j1 in range(q):
            for j2 in range(j1, q):
                N[j1, j2] = N[j2, j1] = float(row0x[f"n{j1}_{j2}"])
        cvec = np.asarray([float(row0x[f"c{j}"]) for j in range(q)])
        try:
            sol = np.linalg.solve(N, cvec)
        except np.linalg.LinAlgError:
            sol = np.linalg.lstsq(N, cvec, rcond=None)[0]
        theta = sol[T - 1 :]

    if _warm_in is not None:
        # resume the soft-impute path from another lam's converged
        # loop-top state: (cur, V, beta) with cur's row factor in V's
        # basis, theta frozen, lam re-derived from the shared FE-only
        # spectrum top
        # _nobs MUST match THIS fit's observation mask: the stored
        # column was computed under the donor fit's mask, and resuming
        # with a stale denominator makes the alpha step a non-
        # projection whose iteration diverges geometrically when the
        # masks differ (warm_final: masked candidate -> full fit).
        # Recomputing is a narrow expression over cached columns; for
        # the identical-mask candidate chain it reproduces the stored
        # value bit-for-bit.
        cur = _warm_in["cur"].withColumn("_nobs", n_obs)
        V = np.asarray(_warm_in["V"], dtype=float)
        beta = [float(b) for b in _warm_in["beta"]]
        theta = np.asarray(_warm_in["theta"], dtype=float)
        sig0 = float(_warm_in["sig0"])
        lam = shrink_frac * sig0
    else:
        cur = wide
    dropq = raw  # oversized raw cache, dropped after the first agg
    proj = None
    tl = [float(x) for x in theta]  # frozen through the main loop
    ya_l = [yadj(i, theta) for i in range(T)]
    for it in range(iters + 1):
        bl = [float(b) for b in beta]
        # checkpoint the PROJECTION (lazy; materialized by the agg
        # below): both this pass's Gram agg and the next pass's factor
        # refresh + projection then read the STORED _al/_l/_m blocks,
        # so the heavy expression trees evaluate exactly ONCE per
        # iteration (checkpointing the narrow factor frame instead
        # made every projection run twice — once for the agg, again
        # when the next iteration materialized the refresh).
        # localCheckpoint is the ONLY correct lineage cut here: a plain
        # persist leaves the LOGICAL plan intact, and CollapseProject
        # then inlines every iteration's projection into an
        # exponentially growing expression tree — measured as a JVM
        # heap OOM just RENDERING the cache name by iteration ~20. The
        # checkpoint's LogicalRDD truncates the plan for real; its
        # blocks are reclaimed by the ContextCleaner on GC.
        proj = project(
            cur, bl, ya_l, V, first=(it == 0 and _warm_in is None)
        ).localCheckpoint(eager=False)
        aggs = []
        for i in range(T):
            aggs.append(
                F.expr(
                    f"sum(CAST(CASE WHEN {obs_s(i)} THEN {ya_l[i]} - _al"
                    f" - _l{i} END AS {DEC})) AS bs{i}"
                )
            )
            aggs.append(
                F.expr(f"sum(CAST({obs_s(i)} AS LONG)) AS bn{i}")
            )
        for i in range(T):
            for j in range(i, T):
                aggs.append(
                    F.expr(
                        f"sum(CAST(_m{i} * _m{j} AS {DEC})) AS g{i}_{j}"
                    )
                )
        row = proj.agg(*aggs).collect()[0]
        if dropq is not None:
            # the agg materialized this pass's checkpoint; the
            # oversized pre-coalesce cache is no longer reachable
            dropq.unpersist(blocking=False)
            dropq = None
        gram = np.empty((T, T))
        for i in range(T):
            for j in range(i, T):
                gram[i, j] = gram[j, i] = float(row[f"g{i}_{j}"])
        # a period with ZERO untreated observations leaves its time FE
        # unidentified — defaulting beta_t to 0 would leak the unmodeled
        # time effect into y - y_hat and bias att(e) for that period;
        # raise loudly instead (the same condition imputation.py's
        # _bjs_core rejects as "treated periods have no untreated
        # observations")
        dead = [periods[i] for i in range(T) if not row[f"bn{i}"]]
        if dead:
            if _prebuilt is None:
                wide.unpersist(blocking=False)
            if dropq is not None:
                dropq.unpersist(blocking=False)
            raise UnidentifiedPeriodError(
                f"mc_nnm: period(s) {dead} have zero untreated "
                "observations — their time fixed effects are "
                "unidentified; add a never-treated cohort or drop those "
                "periods upstream"
            )
        beta = [float(row[f"bs{i}"]) / row[f"bn{i}"] for i in range(T)]
        if lam is None:
            vals = np.linalg.eigvalsh(gram)
            sig0 = float(np.sqrt(max(float(vals[-1]), 0.0)))
            lam = shrink_frac * sig0
        sigma = np.sqrt(np.clip(np.linalg.eigvalsh(gram)[::-1], 0.0, None))
        if it == iters:
            # last pass refreshes beta only: the stored row factor `a`
            # is in the PREVIOUS V's basis, so V/s must not move past it
            break
        if tol > 0.0 and it >= 1:
            # soft-impute convergence: the factor/FE updates have
            # stalled at tol x the current spectral scale — exit
            # through the SAME break point as the fixed-iters path, so
            # the returned tuple is a converged shorter run
            db = max(abs(b - p) for b, p in zip(beta, bl))
            ds = float(np.max(np.abs(sigma - last_sigma)))
            if max(db, ds) <= tol * max(float(sigma[0]), 1e-12):
                break
        last_sigma = sigma
        V, s = _eig_svt(gram, lam)
        # narrow refresh of the row factor: a_new = M V diag(s)
        VS = V * s  # (T x T), column j scaled
        newa = (
            "array("
            + ", ".join(
                " + ".join(f"_m{i} * {_f(VS[i, j])}" for i in range(T))
                for j in range(T)
            )
            + ") AS a"
        )
        # narrow select over the stored projection — no checkpoint
        # needed: the next pass's projection sits a bounded 3 plan
        # layers above proj's LogicalRDD
        cur = proj.selectExpr(
            "id", "g", *ycols, *xflat, "_nobs", *extra_cols, newa
        )

    # final readout: event-time means of y - x'theta - (alpha + beta +
    # L) on treated, non-null cells, from the LAST projection (its
    # _al/_l columns are exactly the converged FE + low-rank fit).
    # `bl`/`ya_l` are still the beta/theta the final projection was
    # built with — the consistent tuple (alpha, beta, theta, L); the
    # last agg's refreshes are deliberately NOT read. One decimal-exact
    # grouped aggregation.
    # per (cohort, period) treated-cell gap sums: ONE grouped agg with
    # |G| result rows, unpivoted to event time driver-side
    gaggs = []
    for i in range(T):
        t = periods[i]
        ok = f"({t} >= g AND {ycols[i]} IS NOT NULL)"
        gaggs.append(
            F.expr(
                f"sum(CAST(CASE WHEN {ok} THEN {ya_l[i]} - _al"
                f" - {_f(bl[i])} - _l{i} END AS {DEC})) AS s{i}"
            )
        )
        gaggs.append(F.expr(f"sum(CAST({ok} AS LONG)) AS n{i}"))
    grows = (
        proj.filter(F.col("g") > 0).groupBy("g").agg(*gaggs).collect()
    )

    hold_mse = hold_n = None
    if holdout is not None:
        haggs = []
        for i in range(T):
            diff = f"{ya_l[i]} - _al - {_f(bl[i])} - _l{i}"
            haggs.append(
                F.expr(
                    f"sum(CAST(CASE WHEN {held_s(i)} THEN ({diff}) *"
                    f" ({diff}) END AS {DEC})) AS hs{i}"
                )
            )
            haggs.append(
                F.expr(f"sum(CAST({held_s(i)} AS LONG)) AS hn{i}")
            )
        hrow = proj.agg(*haggs).collect()[0]
        hold_n = sum(int(hrow[f"hn{i}"] or 0) for i in range(T))
        hold_mse = (
            sum(float(hrow[f"hs{i}"] or 0.0) for i in range(T)) / hold_n
            if hold_n
            else float("nan")
        )

    bands = None
    if placebo_b > 0:
        bands = _placebo_bands(
            proj, periods, ycols, ya_l, xflat, bl, placebo_b, placebo_seed
        )

    # persist-balance hygiene (shared long-lived sessions): the one
    # Python-level persist this fit holds is internal — release it
    # (checkpoint blocks are GC-reclaimed by the ContextCleaner);
    # a _prebuilt base belongs to the CV caller
    if _prebuilt is None:
        wide.unpersist(blocking=False)
    esum: dict = {}
    ecnt: dict = {}
    for r in grows:
        gval = r["g"]
        for i in range(T):
            t = periods[i]
            if r[f"n{i}"]:
                e = t - gval
                esum[e] = esum.get(e, 0.0) + float(r[f"s{i}"])
                ecnt[e] = ecnt.get(e, 0) + int(r[f"n{i}"])
    att = [(int(e), esum[e] / ecnt[e], ecnt[e]) for e in sorted(esum)]
    tot_n = sum(ecnt.values())
    overall = sum(esum.values()) / tot_n if tot_n else 0.0
    out = {
        "att": att,
        "att_overall": float(overall),
        "lam": float(lam),
        "sigma": [float(x) for x in sigma],
        "rank": int(np.sum(s > 0)),
    }
    if P:
        # the theta the final projection was built with (consistent
        # with the readout), keyed by covariate name
        out["theta"] = {
            x: float(tl[k]) for k, x in enumerate(xnames)
        }
    if hold_mse is not None:
        out["holdout_mse"] = float(hold_mse)
        out["holdout_n"] = int(hold_n)
    if _warm_out:
        out["_state"] = {
            "cur": cur,
            "V": V,
            "beta": [float(b) for b in beta],
            "theta": np.asarray(tl, dtype=float),
            "sig0": float(sig0),
        }
    if bands is not None:
        amap = {e: a for e, a, _ in att}
        out["bands"] = [
            (
                e,
                amap[e],
                se,
                amap[e] - 1.959963984540054 * se,
                amap[e] + 1.959963984540054 * se,
            )
            for e, se in bands
            if e in amap
        ]
        out["placebo_b"] = int(placebo_b)
    return out


def _placebo_bands(proj, periods, ycols, yexprs, xsel, bl, B, seed):
    """In-space placebo se(e) from the converged MC-NNM projection:
    B hash-deterministic replicates assign control units (g = 0)
    pseudo-cohorts in the real cohorts' unit-count proportions; each
    replicate's pseudo att(e) is read off y - x'theta - alpha - beta -
    L on the pseudo-post cells (``yexprs`` = the covariate-adjusted
    outcome expressions, == ``ycols`` when no covariates; ``xsel`` =
    the raw covariate columns those expressions read); se(e) = sd over
    replicates. ONE grouped aggregation: the replicate axis is a
    sequence-explode, the (replicate, event) gap rows an
    inline-explode, both map-side combinable down to B x E decimal
    sums."""
    import math

    T = len(periods)
    # cohort unit counts + control count: one tiny agg over the cached
    # projection (one row per unit)
    crow = proj.groupBy("g").agg(F.count("*").alias("n")).collect()
    n_by_g = {int(r["g"]): int(r["n"]) for r in crow}
    n_ctrl = n_by_g.get(0, 0)
    gs = sorted(g for g in n_by_g if g > 0)
    if n_ctrl < 2 or not gs:
        raise ValueError(
            "mc_nnm: placebo bands need >= 2 never-treated units and "
            ">= 1 treated cohort"
        )
    tot_tr = sum(n_by_g[g] for g in gs)
    scale = min(1.0, n_ctrl / tot_tr)  # under-fill if controls scarce
    cuts, acc = [], 0.0
    for g in gs:
        acc += (n_by_g[g] / n_ctrl) * scale
        cuts.append((g, acc))
    u = "(pmod(xxhash64(id, b, {s}), 1000000) / 1e6)".format(s=int(seed))
    pg = "CASE " + " ".join(
        f"WHEN {u} < {c:.17e} THEN {g}" for g, c in cuts
    ) + " ELSE 0 END"
    # per (unit, replicate) row: pseudo-cohort, then an array of
    # (event, gap) structs for the pseudo-post observed cells
    gaps = ", ".join(
        f"named_struct('e', {periods[i]} - _pg, 'gap', "
        f"CASE WHEN _pg > 0 AND {periods[i]} >= _pg AND {ycols[i]} IS NOT "
        f"NULL THEN {yexprs[i]} - _al - ({float(bl[i]):.17e}) - _l{i} END)"
        for i in range(T)
    )
    rows = (
        proj.filter(F.col("g") == 0)
        .selectExpr(
            "id", "_al", *[f"_l{i}" for i in range(T)], *ycols, *xsel,
            f"explode(sequence(0, {B - 1})) AS b",
        )
        .selectExpr("b", f"{pg} AS _pg", *ycols, *xsel, "_al",
                    *[f"_l{i}" for i in range(T)])
        .selectExpr("b", f"array({gaps}) AS _g")
        .selectExpr("b", "inline(filter(_g, x -> x.gap IS NOT NULL))")
        .groupBy("b", "e")
        .agg(
            F.expr(f"sum(CAST(gap AS {DEC})) AS s"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    taus: dict = {}
    # sort by (e, b): collect order is partition-dependent and the
    # float accumulation below must be bit-deterministic
    for r in sorted(rows, key=lambda r: (int(r["e"]), int(r["b"]))):
        taus.setdefault(int(r["e"]), []).append(float(r["s"]) / int(r["n"]))
    out = []
    for e in sorted(taus):
        v = taus[e]
        if len(v) < 2:
            continue
        m = sum(v) / len(v)
        out.append((e, math.sqrt(sum((x - m) ** 2 for x in v) / len(v))))
    return out


def mc_nnm_cv(
    panel: DataFrame,
    yname: str = "y",
    tname: str = "period",
    idname: str = "id",
    gname: str = "g",
    shrink_fracs: tuple = (0.02, 0.05, 0.1, 0.2, 0.4, 0.8),
    iters: int = 25,
    holdout_frac: float = 0.1,
    holdout_seed: int = 11,
    placebo_b: int = 0,
    xnames: tuple = (),
    warm_start: bool = True,
    warm_tol: float = 1e-6,
    warm_final: bool = False,
) -> dict:
    """MC-NNM with the paper's CROSS-VALIDATED nuclear-norm penalty
    (Athey et al. 2021 §4 prescribe choosing lambda by held-out
    prediction error on observed cells; ``mc_nnm``'s fixed
    ``shrink_frac`` is the deterministic stand-in this completes):
    for each candidate fraction, fit with a hash-deterministic
    ``holdout_frac`` of observed control cells masked out and score
    their squared prediction error; refit ONCE on all observed cells
    at the winning fraction (ties -> smaller penalty, i.e. the first
    minimum in ascending order). A candidate whose mask leaves a
    period with zero untreated observations is infeasible and skipped
    (the unidentified-period guard).

    Cost: ONE data-scale pivot (built, right-sized and persisted here,
    SHARED by the |grid| masked fits and the final full fit — each fit
    is then the established iters-aggregation soft-impute over the
    cached wide frame); driver state stays O(T^2) per fit. Fully
    deterministic (hash mask, fixed grid order), so the result is
    pinned-golden-safe. ``xnames`` passes through to the
    covariate-augmented model.

    Error discipline: only :class:`UnidentifiedPeriodError` (a holdout
    mask stripping a period's last untreated cell) marks a candidate
    infeasible. The holdout mask is the SAME for every candidate, so
    feasibility cannot actually differ across the grid — any
    data-integrity ValueError (duplicate cells, multi-g units,
    zero-observed units, NULL covariates) is raised by the shared
    pivot/first fit and PROPAGATES instead of being rebranded as "no
    feasible candidate".

    ``warm_start=True`` (default) runs the CANDIDATE fits as a
    soft-impute PATH: each lambda's iteration resumes from the
    previous candidate's converged factors and stops early at
    ``warm_tol`` (relative to the spectral scale) — the standard
    soft-impute path trick, cutting most of the grid's iteration cost
    at large n. Approximation contract, documented: the candidate
    holdout MSEs are tol-converged rather than fixed-``iters`` values
    (selection is unaffected unless two candidates' MSEs differ by
    less than the tolerance), while the WINNER'S final refit is by
    default a cold full-``iters`` fit on all observed cells —
    bit-identical to a direct ``mc_nnm(shrink_frac=winner)`` with or
    without ``warm_start`` (pytest-pinned). ``warm_final=True`` trades
    that bit-identity pin for the cheapest full path: the final fit
    resumes from the WINNING candidate's converged factors with the
    same tol stop (the masked and full objectives share a fixed point
    up to the held-out 10% of cells, so the warm final converges in a
    few passes). Documented deviations under ``warm_final``: the
    result is tol-converged rather than fixed-``iters``, and theta /
    the lam calibration sigma0 are inherited from the MASKED fit
    (both differ from their full-data values at O(holdout_frac)
    relative) — pytest-bounded against the cold path. Fully
    deterministic either way.

    Returns the final ``mc_nnm`` dict plus ``"cv"`` ({frac: holdout
    mse, inf where infeasible}), ``"shrink_frac"`` (winner) and
    ``"holdout_frac"``."""
    p = panel.select(
        F.col(idname).alias("id"),
        F.col(gname).alias("g"),
        F.col(tname).alias("t"),
        F.col(yname).alias("y"),
        *[F.col(x).alias(f"x_{k}") for k, x in enumerate(xnames)],
    )
    periods, base = _mcnnm_pivot(p, len(xnames))
    base = base.persist()
    n_units = base.count()
    # right-size once for the whole CV run (same rule as mc_nnm's own
    # iteration-frame coalesce)
    par = base.sparkSession.sparkContext.defaultParallelism
    target = max(20_000, n_units // max(2 * par, 1))
    npart = max(1, -(-n_units // target))
    if npart < base.rdd.getNumPartitions():
        raw = base
        base = base.coalesce(npart).persist()
        base.count()
        raw.unpersist(blocking=False)
    try:
        cv: dict = {}
        state = None
        states: dict = {}
        for f in shrink_fracs:
            try:
                r = mc_nnm(
                    panel,
                    shrink_frac=float(f),
                    iters=iters,
                    holdout=(holdout_seed, holdout_frac),
                    xnames=xnames,
                    _prebuilt=(periods, base),
                    tol=(warm_tol if warm_start else 0.0),
                    _warm_in=state,
                    _warm_out=warm_start,
                )
                cv[float(f)] = float(r["holdout_mse"])
                state = r.get("_state") if warm_start else None
                if state is not None:
                    states[float(f)] = state
            except UnidentifiedPeriodError:
                cv[float(f)] = float("inf")
        feas = [
            (m, f) for f, m in cv.items() if m == m and m != float("inf")
        ]
        if not feas:
            raise UnidentifiedPeriodError(
                "mc_nnm_cv: the holdout mask strips some period's last "
                "untreated observation — lower holdout_frac"
            )
        best = min(feas, key=lambda t: (t[0], t[1]))[1]
        use_warm_final = (
            warm_start and warm_final and states.get(best) is not None
        )
        out = mc_nnm(
            panel,
            shrink_frac=best,
            iters=iters,
            placebo_b=placebo_b,
            xnames=xnames,
            _prebuilt=(periods, base),
            tol=(warm_tol if use_warm_final else 0.0),
            _warm_in=(states[best] if use_warm_final else None),
        )
    finally:
        base.unpersist(blocking=False)
    out["cv"] = cv
    out["shrink_frac"] = float(best)
    out["holdout_frac"] = float(holdout_frac)
    return out
