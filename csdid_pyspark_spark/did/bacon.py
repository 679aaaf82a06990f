"""Goodman-Bacon (2021) decomposition of the two-way-fixed-effects DiD
estimate under staggered adoption.

The TWFE regression y_it = a_i + a_t + beta * D_it is still what many
practitioners run first; Goodman-Bacon's theorem shows its beta-hat is
exactly a weighted average of every 2x2 DiD comparison the panel
contains — treated-vs-never, early-vs-late (late acts as control
before it treats), and the problematic late-vs-EARLY comparisons whose
controls are already treated (the source of TWFE's sign flips under
dynamic effects). This module computes the full decomposition table,
the diagnostic a staggered-adoption analysis publishes NEXT TO the
Callaway-Sant'Anna ATT(g,t) table (which replaces TWFE precisely
because of what this decomposition reveals).

Scale design: everything derives from ONE aggregation pass over the
panel — the (cohort, period) cell means plus per-cohort unit counts —
so executor->driver traffic is O(|G|·|T|) scalars; the pair algebra
runs driver-side over at most |G|² comparisons (the same result-sized
collect discipline as the estimator, did/attgt.py). The decomposition
is EXACT on a balanced panel: weights sum to 1 and sum(weight *
estimate) equals the directly-computed TWFE beta-hat (Frisch-Waugh on
the double-demeaned treatment dummy) to float precision — both
identities are asserted by tests/test_did_api.py and double-checked by
the DuckDB oracle of the `did_bacon_decomposition` query.

Reference scope note: the reference package (ATTgt.py) has no TWFE
diagnostic at all; this is part of the engine's beyond-reference DiD
surface (with the pretrend Wald test), built from the published paper:
Goodman-Bacon, "Difference-in-differences with variation in treatment
timing", Journal of Econometrics 225(2), 2021.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell_stats(
    panel: DataFrame, yname: str, tname: str, idname: str, gname: str
) -> tuple[dict[tuple[float, int], float], dict[float, int], list[int]]:
    """One aggregation pass: (cohort, period) outcome means, cohort
    unit counts, sorted period list. The panel must be balanced —
    callers filter to complete units first (mirroring the estimator's
    preprocessing)."""
    cells = (
        panel.groupBy(gname, tname)
        .agg(F.avg(yname).alias("ybar"), F.countDistinct(idname).alias("n"))
        .collect()
    )
    ymeans: dict[tuple[float, int], float] = {}
    ncoh: dict[float, int] = {}
    periods: set[int] = set()
    for r in cells:
        g, t = float(r[gname]), int(r[tname])
        ymeans[(g, t)] = float(r["ybar"])
        n = int(r["n"])
        # balance check: every (g, t) cell of a cohort must report the
        # same unit count, or the decomposition's weights — which take
        # ncoh[g] from ONE cell — would silently depend on collect
        # order and the sum(w)=1 / sum(w·est)=beta identities break.
        prev = ncoh.setdefault(g, n)
        if prev != n:
            raise ValueError(
                f"bacon_decompose requires a balanced panel: cohort "
                f"{g!r} has {prev} units in one period and {n} in "
                f"period {t} (filter to complete units first, as the "
                f"estimator's preprocessing does)."
            )
        periods.add(t)
    # a balanced panel also observes every cohort in every period
    missing = [
        (g, t) for g in ncoh for t in sorted(periods) if (g, t) not in ymeans
    ]
    if missing:
        raise ValueError(
            f"bacon_decompose requires a balanced panel: missing "
            f"(cohort, period) cells {missing[:5]}"
            f"{'...' if len(missing) > 5 else ''}."
        )
    return ymeans, ncoh, sorted(periods)


def bacon_decompose(
    panel: DataFrame,
    yname: str = "y",
    tname: str = "period",
    idname: str = "id",
    gname: str = "g",
) -> tuple[list[tuple[str, float, float, float, float]], float]:
    """Return ``(rows, beta_twfe)`` where rows are
    ``(comp_type, g_treat, g_ctrl, weight, estimate)`` for every 2x2
    comparison with positive weight, and ``beta_twfe`` is the directly
    computed TWFE coefficient. sum(weight) == 1 and
    sum(weight*estimate) == beta_twfe exactly (balanced panel).

    Cohort convention follows the estimator: ``gname`` holds the first
    treated period; 0 (or any value past the observed window) = never
    treated, and multiple never cohorts pool into one unit-weighted
    comparison group. ALWAYS-treated cohorts (first treated at or
    before the first observed period, Dbar = 1) never appear as the
    treated side of a comparison (their pre window is empty) but DO
    serve as the already-treated comparison group of late-vs-early
    rows with positive weight — the paper's formula, and required for
    the identities to hold."""
    ymeans, ncoh, periods = _cell_stats(panel, yname, tname, idname, gname)
    T = len(periods)
    N = sum(ncoh.values())

    def treated(g: float) -> bool:
        return g > 0 and g <= periods[-1]

    # share of periods spent treated, per cohort
    dbar = {
        g: (sum(1 for t in periods if treated(g) and t >= g) / T) for g in ncoh
    }
    share = {g: n / N for g, n in ncoh.items()}

    def wmean(g: float, ts: list[int]) -> float:
        return sum(ymeans[(g, t)] for t in ts) / len(ts)

    # ---- direct TWFE via Frisch-Waugh on the double-demeaned dummy:
    # D-tilde(g,t) = D - Dbar_g - Dbar_t + Dbar; beta = sum(n_g * Dt *
    # ybar) / sum(n_g * Dt^2). D is cell-constant, so cell sums suffice.
    def D(g: float, t: int) -> float:
        return 1.0 if treated(g) and t >= g else 0.0

    dbar_t = {t: sum(share[g] * D(g, t) for g in ncoh) for t in periods}
    dbar_all = sum(share[g] * dbar[g] for g in ncoh)
    num = den = 0.0
    for g in ncoh:
        for t in periods:
            dt = D(g, t) - dbar[g] - dbar_t[t] + dbar_all
            num += ncoh[g] * dt * ymeans[(g, t)]
            den += ncoh[g] * dt * dt
    beta_twfe = num / den
    vhat_d = den / (N * T)  # variance of the demeaned dummy

    # ---- the 2x2 comparisons (Goodman-Bacon 2021, Thm 1)
    rows: list[tuple[str, float, float, float, float]] = []
    never = [g for g in ncoh if not treated(g)]
    # ALWAYS-treated cohorts (Dbar = 1) stay in the pair set: they carry
    # zero weight as the treated side of kU / early-vs-late (the
    # (1 - Dbar_k) factor, realized below by their empty pre window) but
    # POSITIVE weight as the already-treated comparison group of
    # late-vs-early — dropping them breaks the sum(w)=1 identity.
    ks = sorted(g for g in ncoh if treated(g) and dbar[g] > 0.0)
    n_u = sum(ncoh[g] for g in never) / N if never else 0.0
    if never and n_u > 0:
        # pooled never-treated cell means (unit-weighted across all
        # never cohorts — g = 0 and any g past the observed window)
        nev_n = sum(ncoh[g] for g in never)
        nev_mean = {
            t: sum(ncoh[g] * ymeans[(g, t)] for g in never) / nev_n
            for t in periods
        }

        def y_u(ts: list[int]) -> float:
            return sum(nev_mean[t] for t in ts) / len(ts)

    for k in ks:
        pre = [t for t in periods if t < k]
        post = [t for t in periods if t >= k]
        if never and n_u > 0 and pre and post:
            nk, dk = share[k], dbar[k]
            nku = nk / (nk + n_u)
            w = (nk + n_u) ** 2 * nku * (1 - nku) * dk * (1 - dk) / vhat_d
            est = (wmean(k, post) - wmean(k, pre)) - (
                y_u(post) - y_u(pre)
            )
            rows.append(("treated_vs_never", k, 0.0, w, est))
        for l in ks:
            if l <= k:
                continue
            # k treats strictly before l
            pre_k = [t for t in periods if t < k]
            mid = [t for t in periods if k <= t < l]
            post_l = [t for t in periods if t >= l]
            nk, nl, dk, dl = share[k], share[l], dbar[k], dbar[l]
            nkl = nk / (nk + nl)
            if pre_k and mid:
                w = (
                    ((nk + nl) * (1 - dl)) ** 2
                    * nkl
                    * (1 - nkl)
                    * ((dk - dl) / (1 - dl))
                    * ((1 - dk) / (1 - dl))
                    / vhat_d
                )
                est = (wmean(k, mid) - wmean(k, pre_k)) - (
                    wmean(l, mid) - wmean(l, pre_k)
                )
                rows.append(("early_vs_late", k, l, w, est))
            if mid and post_l:
                w = (
                    ((nk + nl) * dk) ** 2
                    * nkl
                    * (1 - nkl)
                    * (dl / dk)
                    * ((dk - dl) / dk)
                    / vhat_d
                )
                est = (wmean(l, post_l) - wmean(l, mid)) - (
                    wmean(k, post_l) - wmean(k, mid)
                )
                rows.append(("late_vs_early", l, k, w, est))
    return rows, beta_twfe
