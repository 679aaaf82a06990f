"""Distributed Sant'Anna-Zhao DiD kernels (reg / std-ipw / doubly-robust,
panel and repeated cross-section).

The reference delegates these to the external d2cml-ai/DRDID NumPy
package after collecting every column to the driver (reference
ATTgt.py:346-372, 424-432; SURVEY.md §2.6 K1-K3). Here each kernel is a
fixed number of aggregation passes over the cached cell table — all
(g,t) cells estimated simultaneously — plus O(|cells|·p³) driver-side
solves, and influence functions emitted as column expressions. Exact
formula parity with ``tests/ref_drdid.py`` (same published math) is
asserted in tests.

Data movement per fit: O(|cells| · p²) Gram scalars to the driver and
one broadcast of O(|cells| · p) coefficients back. Nothing scales
with the number of units.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from csdid_pyspark_spark.did.linalg import (
    consts_df,
    dot,
    gram_aggs,
    inv_safe,
    irls_logit,
    sigmoid,
    solve_safe,
    unpack_gram,
    unpack_vec,
    vec_aggs,
)

PS_CLAMP = 1.0 - 1e-16


@dataclass
class CellEstimate:
    cid: int
    att: float  # NaN when skipped
    n1: float  # rows (RC) / units (panel) participating in the cell
    skipped: bool
    message: str = ""


# ---------------------------------------------------------------------------
# Panel kernels
# ---------------------------------------------------------------------------

def estimate_panel(
    cell_df: DataFrame,
    xcols: list[str],
    est_method: str,
    spark: SparkSession,
) -> tuple[list[CellEstimate], DataFrame]:
    """Estimate every (g,t) cell of a panel cell table.

    Returns (per-cell estimates, influence-function DataFrame with
    columns cid, uid, inf) — inf is the per-unit IF *within* the cell;
    scaling to the unit universe happens in attgt."""
    p = len(xcols)
    w, d, dy = F.col("w"), F.col("d"), F.col("dy")
    w_t = w * d
    w_c = w * (1 - d)

    base = [
        F.count("*").alias("n"),
        F.sum(d).alias("n_tr"),
        F.sum(1 - d).alias("n_co"),
        F.sum(w_t).alias("sw_t"),
        F.sum(w_t * dy).alias("swdy_t"),
        *vec_aggs("m1", w_t, xcols),
        *gram_aggs("org", w_c, xcols, dy),
    ]
    pass1 = {r["cid"]: r for r in cell_df.groupBy("cid").agg(*base).collect()}
    cids = sorted(pass1)

    skipped: dict[int, str] = {}
    for cid, r in pass1.items():
        if not r["n_tr"] or not r["n_co"] or not r["sw_t"]:
            skipped[cid] = "no treated or no control units in cell"

    beta: dict[int, np.ndarray] = {}
    xpx_inv: dict[int, np.ndarray] = {}
    if est_method in ("reg", "dr"):
        for cid in cids:
            if cid in skipped:
                continue
            Gm, b = unpack_gram(pass1[cid], "org", p)
            bb = solve_safe(Gm, b)
            XpXi = inv_safe(Gm / pass1[cid]["n"])
            if bb is None or XpXi is None:
                skipped[cid] = "singular outcome-regression design"
                continue
            beta[cid], xpx_inv[cid] = bb, XpXi

    gamma: dict[int, np.ndarray | None] = {}
    if est_method in ("ipw", "dr"):
        # warm-start the intercept at logit of the cell's treated share
        init = {
            cid: np.array([math.log(pass1[cid]["n_tr"] / pass1[cid]["n_co"])] + [0.0] * (p - 1))
            for cid in cids
            if cid not in skipped
        }
        gamma = irls_logit(cell_df, xcols, spark, [c for c in cids if c not in skipped], init=init)
        for cid, gm in gamma.items():
            if gm is None and cid not in skipped:
                skipped[cid] = "propensity-score logit did not converge"

    consts: dict[int, dict] = {}

    if est_method == "reg":
        for cid in cids:
            if cid in skipped:
                continue
            r = pass1[cid]
            n, sw_t = r["n"], r["sw_t"]
            m1 = unpack_vec(r, "m1", p)
            eta_t = r["swdy_t"] / sw_t
            eta_c = float(beta[cid] @ m1) / sw_t
            a_ols = xpx_inv[cid] @ m1 / sw_t
            consts[cid] = {
                "att": eta_t - eta_c,
                "eta_t": eta_t,
                "eta_c": eta_c,
                "m_wt": sw_t / n,
                "m_wc": 0.0,
                "beta": list(beta[cid]),
                "gma": [0.0] * p,
                "a_ols": list(a_ols),
                "a_ps": [0.0] * p,
            }
    else:
        # second aggregation pass with coefficients joined in
        cdf = consts_df(
            spark,
            {
                cid: {
                    "beta": list(beta.get(cid, np.zeros(p))),
                    "gma": list(gamma.get(cid) if gamma.get(cid) is not None else np.zeros(p)),
                }
                for cid in cids
                if cid not in skipped
            },
            [],
            ["beta", "gma"],
        )
        it = cell_df.join(F.broadcast(cdf), "cid")
        ps = F.least(sigmoid(dot(xcols, "gma")), F.lit(PS_CLAMP))
        wc = w * ps * (1 - d) / (1 - ps)
        resid = dy - dot(xcols, "beta") if est_method == "dr" else dy
        aggs = [
            F.sum(wc).alias("swc"),
            F.sum(wc * resid).alias("swcr"),
            *vec_aggs("v2", wc * resid, xcols),
            *vec_aggs("v3", wc, xcols),
            *gram_aggs("info", w * ps * (1 - ps), xcols, None),
        ]
        passf = {r["cid"]: r for r in it.groupBy("cid").agg(*aggs).collect()}
        for cid in cids:
            if cid in skipped:
                continue
            r1, rf = pass1[cid], passf[cid]
            n, sw_t = r1["n"], r1["sw_t"]
            m1 = unpack_vec(r1, "m1", p)
            swc = rf["swc"]
            if not swc:
                skipped[cid] = "zero control weight mass"
                continue
            info_inv = inv_safe(unpack_gram(rf, "info", p)[0] / n)
            if info_inv is None:
                skipped[cid] = "singular propensity information matrix"
                continue
            m_wt, m_wc = sw_t / n, swc / n
            eta_c = rf["swcr"] / swc
            v2 = unpack_vec(rf, "v2", p)
            v3 = unpack_vec(rf, "v3", p)
            M2 = (v2 - eta_c * v3) / n
            a_ps = info_inv @ M2 / m_wc
            if est_method == "ipw":
                eta_t = r1["swdy_t"] / sw_t
                a_ols = np.zeros(p)
                bvec = np.zeros(p)
            else:  # dr
                bvec = beta[cid]
                eta_t = (r1["swdy_t"] - float(bvec @ m1)) / sw_t
                M1 = m1 / n
                M3 = v3 / n
                a_ols = xpx_inv[cid] @ (M1 / m_wt - M3 / m_wc)
            consts[cid] = {
                "att": eta_t - eta_c,
                "eta_t": eta_t,
                "eta_c": eta_c,
                "m_wt": m_wt,
                "m_wc": m_wc,
                "beta": list(bvec),
                "gma": list(gamma[cid]),
                "a_ols": list(a_ols),
                "a_ps": list(a_ps),
            }

    # --- influence-function pass -------------------------------------------
    cdf = consts_df(
        spark,
        consts,
        ["eta_t", "eta_c", "m_wt", "m_wc"],
        ["beta", "gma", "a_ols", "a_ps"],
    )
    it = cell_df.join(F.broadcast(cdf), "cid")
    et, ec, m_wt, m_wc = (F.col(c) for c in ("eta_t", "eta_c", "m_wt", "m_wc"))
    if est_method == "reg":
        xb = dot(xcols, "beta")
        inf = (
            (w_t * (dy - et)) / m_wt
            - (w_t * (xb - ec)) / m_wt
            - w_c * (dy - xb) * dot(xcols, "a_ols")
        )
    elif est_method == "ipw":
        ps = F.least(sigmoid(dot(xcols, "gma")), F.lit(PS_CLAMP))
        wc = w * ps * (1 - d) / (1 - ps)
        inf = (
            (w_t * (dy - et)) / m_wt
            - (wc * (dy - ec)) / m_wc
            - w * (d - ps) * dot(xcols, "a_ps")
        )
    else:  # dr
        ps = F.least(sigmoid(dot(xcols, "gma")), F.lit(PS_CLAMP))
        wc = w * ps * (1 - d) / (1 - ps)
        resid = dy - dot(xcols, "beta")
        inf = (
            (w_t * (resid - et)) / m_wt
            - (wc * (resid - ec)) / m_wc
            - w_c * resid * dot(xcols, "a_ols")
            - w * (d - ps) * dot(xcols, "a_ps")
        )
    if_df = it.select("cid", "uid", inf.alias("inf"))

    results = []
    for cid in cids:
        if cid in skipped:
            results.append(CellEstimate(cid, math.nan, float(pass1[cid]["n"]), True, skipped[cid]))
        else:
            results.append(CellEstimate(cid, float(consts[cid]["att"]), float(pass1[cid]["n"]), False))
    return results, if_df


# ---------------------------------------------------------------------------
# Repeated cross-section kernels
# ---------------------------------------------------------------------------

def estimate_rc(
    cell_df: DataFrame,
    xcols: list[str],
    est_method: str,
    spark: SparkSession,
) -> tuple[list[CellEstimate], DataFrame]:
    """Estimate every (g,t) cell of a repeated-cross-section cell table
    (columns cid, uid, ut, d, pst, w, y, x…). Locally-efficient DR per
    Sant'Anna & Zhao (2020) eq. 3.4 (the reference's drdid_rc path,
    ATTgt.py:424-432)."""
    p = len(xcols)
    w, d, y, pst = F.col("w"), F.col("d"), F.col("y"), F.col("pst")
    wt1, wt0 = w * d * pst, w * d * (1 - pst)
    wc1w, wc0w = w * (1 - d) * pst, w * (1 - d) * (1 - pst)  # OLS weights
    wd = w * d

    base = [
        F.count("*").alias("n"),
        F.sum(d * pst).alias("n_t1"),
        F.sum(d * (1 - pst)).alias("n_t0"),
        F.sum((1 - d) * pst).alias("n_c1"),
        F.sum((1 - d) * (1 - pst)).alias("n_c0"),
        F.sum(wt1).alias("sw_t1"),
        F.sum(wt0).alias("sw_t0"),
        F.sum(wd).alias("sw_d"),
        F.sum(wt1 * y).alias("swy_t1"),
        F.sum(wt0 * y).alias("swy_t0"),
        *vec_aggs("md", wd, xcols),
        *vec_aggs("mdt1", wt1, xcols),
        *vec_aggs("mdt0", wt0, xcols),
        *gram_aggs("gc0", wc0w, xcols, y),
        *gram_aggs("gc1", wc1w, xcols, y),
        *gram_aggs("gt0", wt0, xcols, y),
        *gram_aggs("gt1", wt1, xcols, y),
    ]
    pass1 = {r["cid"]: r for r in cell_df.groupBy("cid").agg(*base).collect()}
    cids = sorted(pass1)

    skipped: dict[int, str] = {}
    for cid, r in pass1.items():
        empty = [
            k
            for k, v in (("t-post", r["n_t1"]), ("t-pre", r["n_t0"]), ("c-post", r["n_c1"]), ("c-pre", r["n_c0"]))
            if not v
        ]
        if empty:
            skipped[cid] = f"empty D×post cells: {empty}"

    # outcome regressions
    beta: dict[int, dict[str, np.ndarray]] = {}
    xpxi: dict[int, dict[str, np.ndarray]] = {}
    need_t = est_method == "dr"
    for cid in cids:
        if cid in skipped:
            continue
        r = pass1[cid]
        n = r["n"]
        bs, xs = {}, {}
        blocks = ["gc0", "gc1"] + (["gt0", "gt1"] if need_t else [])
        ok = True
        for blk in blocks:
            Gm, b = unpack_gram(r, blk, p)
            bb = solve_safe(Gm, b)
            Xi = inv_safe(Gm / n)
            if bb is None or Xi is None:
                skipped[cid] = f"singular regression design in block {blk}"
                ok = False
                break
            bs[blk], xs[blk] = bb, Xi
        if ok:
            beta[cid], xpxi[cid] = bs, xs

    gamma: dict[int, np.ndarray | None] = {}
    if est_method in ("ipw", "dr"):
        init = {
            cid: np.array(
                [
                    math.log(
                        (pass1[cid]["n_t1"] + pass1[cid]["n_t0"])
                        / (pass1[cid]["n_c1"] + pass1[cid]["n_c0"])
                    )
                ]
                + [0.0] * (p - 1)
            )
            for cid in cids
            if cid not in skipped
        }
        gamma = irls_logit(cell_df, xcols, spark, [c for c in cids if c not in skipped], init=init)
        for cid, gm in gamma.items():
            if gm is None and cid not in skipped:
                skipped[cid] = "propensity-score logit did not converge"

    consts: dict[int, dict] = {}

    if est_method == "reg":
        for cid in cids:
            if cid in skipped:
                continue
            r = pass1[cid]
            n = r["n"]
            b0, b1 = beta[cid]["gc0"], beta[cid]["gc1"]
            md = unpack_vec(r, "md", p)
            m_wt1, m_wt0, m_wd = r["sw_t1"] / n, r["sw_t0"] / n, r["sw_d"] / n
            eta_tp = r["swy_t1"] / r["sw_t1"]
            eta_tr = r["swy_t0"] / r["sw_t0"]
            eta_c = float((b1 - b0) @ md) / r["sw_d"]
            Mv = md / n
            a_post = xpxi[cid]["gc1"] @ Mv / m_wd
            a_pre = xpxi[cid]["gc0"] @ Mv / m_wd
            consts[cid] = {
                "att": (eta_tp - eta_tr) - eta_c,
                "eta_tp": eta_tp,
                "eta_tr": eta_tr,
                "eta_cp": eta_c,  # reused slot: the single control eta
                "eta_cr": 0.0,
                "m_wt1": m_wt1,
                "m_wt0": m_wt0,
                "m_wc1": m_wd,  # reused slot: mean(w·d)
                "m_wc0": 0.0,
                "e1": 0.0,
                "e2": 0.0,
                "e3": 0.0,
                "e4": 0.0,
                "bc0": list(b0),
                "bc1": list(b1),
                "bt0": [0.0] * p,
                "bt1": [0.0] * p,
                "gma": [0.0] * p,
                "a_c0": list(a_pre),
                "a_c1": list(a_post),
                "a_t0": [0.0] * p,
                "a_t1": [0.0] * p,
                "a_ps": [0.0] * p,
            }
    else:
        cdf = consts_df(
            spark,
            {
                cid: {
                    "bc0": list(beta[cid]["gc0"]) if cid in beta else [0.0] * p,
                    "bc1": list(beta[cid]["gc1"]) if cid in beta else [0.0] * p,
                    "gma": list(gamma.get(cid) if gamma.get(cid) is not None else np.zeros(p)),
                }
                for cid in cids
                if cid not in skipped
            },
            [],
            ["bc0", "bc1", "gma"],
        )
        it = cell_df.join(F.broadcast(cdf), "cid")
        ps = F.least(sigmoid(dot(xcols, "gma")), F.lit(PS_CLAMP))
        odds = ps * (1 - d) / (1 - ps)
        wc1 = w * odds * pst
        wc0 = w * odds * (1 - pst)
        if est_method == "dr":
            resid = y - (pst * dot(xcols, "bc1") + (1 - pst) * dot(xcols, "bc0"))
        else:
            resid = y
        aggs = [
            F.sum(wc1).alias("swc1"),
            F.sum(wc0).alias("swc0"),
            F.sum(wc1 * resid).alias("swc1r"),
            F.sum(wc0 * resid).alias("swc0r"),
            F.sum(wt1 * resid).alias("swt1r"),
            F.sum(wt0 * resid).alias("swt0r"),
            *vec_aggs("v1r", wc1 * resid, xcols),
            *vec_aggs("v1", wc1, xcols),
            *vec_aggs("v0r", wc0 * resid, xcols),
            *vec_aggs("v0", wc0, xcols),
            *gram_aggs("info", w * ps * (1 - ps), xcols, None),
        ]
        passf = {r["cid"]: r for r in it.groupBy("cid").agg(*aggs).collect()}
        for cid in cids:
            if cid in skipped:
                continue
            r1, rf = pass1[cid], passf[cid]
            n = r1["n"]
            if not rf["swc1"] or not rf["swc0"]:
                skipped[cid] = "zero control weight mass"
                continue
            info_inv = inv_safe(unpack_gram(rf, "info", p)[0] / n)
            if info_inv is None:
                skipped[cid] = "singular propensity information matrix"
                continue
            m_wt1, m_wt0, m_wd = r1["sw_t1"] / n, r1["sw_t0"] / n, r1["sw_d"] / n
            m_wc1, m_wc0 = rf["swc1"] / n, rf["swc0"] / n
            eta_cp = rf["swc1r"] / rf["swc1"]
            eta_cr = rf["swc0r"] / rf["swc0"]
            M2p = (unpack_vec(rf, "v1r", p) - eta_cp * unpack_vec(rf, "v1", p)) / n / m_wc1
            M2r = (unpack_vec(rf, "v0r", p) - eta_cr * unpack_vec(rf, "v0", p)) / n / m_wc0
            a_ps = info_inv @ (M2p - M2r)
            if est_method == "ipw":
                eta_tp = r1["swy_t1"] / r1["sw_t1"]
                eta_tr = r1["swy_t0"] / r1["sw_t0"]
                consts[cid] = {
                    "att": (eta_tp - eta_tr) - (eta_cp - eta_cr),
                    "eta_tp": eta_tp,
                    "eta_tr": eta_tr,
                    "eta_cp": eta_cp,
                    "eta_cr": eta_cr,
                    "m_wt1": m_wt1,
                    "m_wt0": m_wt0,
                    "m_wc1": m_wc1,
                    "m_wc0": m_wc0,
                    "e1": 0.0,
                    "e2": 0.0,
                    "e3": 0.0,
                    "e4": 0.0,
                    "bc0": [0.0] * p,
                    "bc1": [0.0] * p,
                    "bt0": [0.0] * p,
                    "bt1": [0.0] * p,
                    "gma": list(gamma[cid]),
                    "a_c0": [0.0] * p,
                    "a_c1": [0.0] * p,
                    "a_t0": [0.0] * p,
                    "a_t1": [0.0] * p,
                    "a_ps": list(a_ps),
                }
                continue
            # doubly robust, locally efficient
            b = beta[cid]
            md = unpack_vec(r1, "md", p)
            mdt1 = unpack_vec(r1, "mdt1", p)
            mdt0 = unpack_vec(r1, "mdt0", p)
            eta_tp = rf["swt1r"] / r1["sw_t1"]
            eta_tr = rf["swt0r"] / r1["sw_t0"]
            d_post = b["gt1"] - b["gc1"]
            d_pre = b["gt0"] - b["gc0"]
            eta_d_post = float(d_post @ md) / r1["sw_d"]
            eta_dt1_post = float(d_post @ mdt1) / r1["sw_t1"]
            eta_d_pre = float(d_pre @ md) / r1["sw_d"]
            eta_dt0_pre = float(d_pre @ mdt0) / r1["sw_t0"]
            att = (
                (eta_tp - eta_tr)
                - (eta_cp - eta_cr)
                + (eta_d_post - eta_dt1_post)
                - (eta_d_pre - eta_dt0_pre)
            )
            # asy-lin-rep coefficient vectors (see module docstring):
            m_tp = (mdt1 / n) / m_wt1
            m_tr = (mdt0 / n) / m_wt0
            m_cp = (unpack_vec(rf, "v1", p) / n) / m_wc1
            m_cr = (unpack_vec(rf, "v0", p) / n) / m_wc0
            mom_d = (md / n) / m_wd
            mom_dt1 = (mdt1 / n) / m_wt1
            mom_dt0 = (mdt0 / n) / m_wt0
            v_c1 = -m_tp + m_cp - (mom_d - mom_dt1)
            v_c0 = m_tr - m_cr + (mom_d - mom_dt0)
            v_t1 = mom_d - mom_dt1
            v_t0 = -(mom_d - mom_dt0)
            consts[cid] = {
                "att": att,
                "eta_tp": eta_tp,
                "eta_tr": eta_tr,
                "eta_cp": eta_cp,
                "eta_cr": eta_cr,
                "m_wt1": m_wt1,
                "m_wt0": m_wt0,
                "m_wc1": m_wc1,
                "m_wc0": m_wc0,
                "e1": eta_d_post,
                "e2": eta_dt1_post,
                "e3": eta_d_pre,
                "e4": eta_dt0_pre,
                "bc0": list(b["gc0"]),
                "bc1": list(b["gc1"]),
                "bt0": list(b["gt0"]),
                "bt1": list(b["gt1"]),
                "gma": list(gamma[cid]),
                "a_c0": list(xpxi[cid]["gc0"] @ v_c0),
                "a_c1": list(xpxi[cid]["gc1"] @ v_c1),
                "a_t0": list(xpxi[cid]["gt0"] @ v_t0),
                "a_t1": list(xpxi[cid]["gt1"] @ v_t1),
                "a_ps": list(a_ps),
            }

    # --- influence-function pass -------------------------------------------
    cdf = consts_df(
        spark,
        consts,
        ["eta_tp", "eta_tr", "eta_cp", "eta_cr", "m_wt1", "m_wt0", "m_wc1", "m_wc0", "e1", "e2", "e3", "e4"],
        ["bc0", "bc1", "bt0", "bt1", "gma", "a_c0", "a_c1", "a_t0", "a_t1", "a_ps"],
    )
    it = cell_df.join(F.broadcast(cdf), "cid")
    C = {c: F.col(c) for c in ("eta_tp", "eta_tr", "eta_cp", "eta_cr", "m_wt1", "m_wt0", "m_wc1", "m_wc0", "e1", "e2", "e3", "e4")}

    if est_method == "reg":
        xb0, xb1 = dot(xcols, "bc0"), dot(xcols, "bc1")
        inf = (
            (wt1 * (y - C["eta_tp"])) / C["m_wt1"]
            - (wt0 * (y - C["eta_tr"])) / C["m_wt0"]
            - (wd * ((xb1 - xb0) - C["eta_cp"])) / C["m_wc1"]
            - wc1w * (y - xb1) * dot(xcols, "a_c1")
            + wc0w * (y - xb0) * dot(xcols, "a_c0")
        )
    elif est_method == "ipw":
        ps = F.least(sigmoid(dot(xcols, "gma")), F.lit(PS_CLAMP))
        odds = ps * (1 - d) / (1 - ps)
        wc1 = w * odds * pst
        wc0 = w * odds * (1 - pst)
        inf = (
            (wt1 * (y - C["eta_tp"])) / C["m_wt1"]
            - (wt0 * (y - C["eta_tr"])) / C["m_wt0"]
            - (
                (wc1 * (y - C["eta_cp"])) / C["m_wc1"]
                - (wc0 * (y - C["eta_cr"])) / C["m_wc0"]
                + w * (d - ps) * dot(xcols, "a_ps")
            )
        )
    else:  # dr
        ps = F.least(sigmoid(dot(xcols, "gma")), F.lit(PS_CLAMP))
        odds = ps * (1 - d) / (1 - ps)
        wc1 = w * odds * pst
        wc0 = w * odds * (1 - pst)
        xbc0, xbc1 = dot(xcols, "bc0"), dot(xcols, "bc1")
        xbt0, xbt1 = dot(xcols, "bt0"), dot(xcols, "bt1")
        resid = y - (pst * xbc1 + (1 - pst) * xbc0)
        dpost = xbt1 - xbc1
        dpre = xbt0 - xbc0
        inf_treat_cont = (
            (wt1 * (resid - C["eta_tp"])) / C["m_wt1"]
            - (wt0 * (resid - C["eta_tr"])) / C["m_wt0"]
            - (wc1 * (resid - C["eta_cp"])) / C["m_wc1"]
            + (wc0 * (resid - C["eta_cr"])) / C["m_wc0"]
            - w * (d - ps) * dot(xcols, "a_ps")
        )
        m_wd = C["m_wt1"] + C["m_wt0"]  # mean(w·d·post) + mean(w·d·(1-post))
        inf_eff = (
            (wd * (dpost - C["e1"])) / m_wd
            - (wt1 * (dpost - C["e2"])) / C["m_wt1"]
            - (wd * (dpre - C["e3"])) / m_wd
            + (wt0 * (dpre - C["e4"])) / C["m_wt0"]
        )
        inf_or = (
            wt1 * (y - xbt1) * dot(xcols, "a_t1")
            + wt0 * (y - xbt0) * dot(xcols, "a_t0")
            + wc1w * (y - xbc1) * dot(xcols, "a_c1")
            + wc0w * (y - xbc0) * dot(xcols, "a_c0")
        )
        inf = inf_treat_cont + inf_eff + inf_or

    if_df = it.select("cid", "uid", "ut", inf.alias("inf"))

    results = []
    for cid in cids:
        if cid in skipped:
            results.append(CellEstimate(cid, math.nan, float(pass1[cid]["n"]), True, skipped[cid]))
        else:
            results.append(CellEstimate(cid, float(consts[cid]["att"]), float(pass1[cid]["n"]), False))
    return results, if_df


# ---------------------------------------------------------------------------
# Custom (callable) kernels — reference API parity (ATTgt.py:362-363,
# 424-425: est_method may be a callable). The callable runs per cell
# inside applyInPandas with the reference's signature:
#   panel: fn(ypost, ypre, D, i_weights=w, covariates=X) -> (att, inf)
#   rc:    fn(y=y, post=post, D=D, i_weights=w, covariates=X) -> (att, inf)
# ---------------------------------------------------------------------------

def estimate_custom(
    cell_df: DataFrame,
    xcols: list[str],
    fn,
    spark: SparkSession,
    rc: bool,
) -> tuple[list[CellEstimate], DataFrame]:
    """Run a user-supplied NumPy kernel per (g,t) cell. Each cell's rows
    arrive as one pandas group (Arrow-batched); cells execute in
    parallel across the cluster. Scales while any single cell fits in
    one task — the escape hatch for estimators the aggregation kernels
    don't cover."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    uid_type = cell_df.schema["uid"].dataType
    fields = [
        StructField("cid", IntegerType()),
        StructField("uid", uid_type),
    ]
    if rc:
        fields.append(StructField("ut", cell_df.schema["ut"].dataType))
    fields += [StructField("inf", DoubleType()), StructField("att", DoubleType())]
    out_schema = StructType(fields)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        X = pdf[xcols].to_numpy()
        D = pdf["d"].to_numpy()
        w = pdf["w"].to_numpy()
        try:
            if rc:
                att, inf = fn(y=pdf["y"].to_numpy(), post=pdf["pst"].to_numpy(), D=D,
                              i_weights=w, covariates=X)
            else:
                att, inf = fn(pdf["y1"].to_numpy(), pdf["y0"].to_numpy(), D,
                              i_weights=w, covariates=X)
        except Exception:
            return pd.DataFrame({f.name: [] for f in fields})
        out = {"cid": pdf["cid"], "uid": pdf["uid"], "inf": inf, "att": float(att)}
        if rc:
            out["ut"] = pdf["ut"]
        return pd.DataFrame(out)[[f.name for f in fields]]

    if_df = cell_df.groupBy("cid").applyInPandas(run, out_schema)
    stats = (
        if_df.groupBy("cid")
        .agg(F.first("att").alias("att"), F.count("*").alias("n1"))
        .collect()
    )
    all_cids = [r["cid"] for r in cell_df.select("cid").distinct().collect()]
    by_cid = {r["cid"]: r for r in stats}
    results = []
    for cid in sorted(all_cids):
        r = by_cid.get(cid)
        if r is None:
            results.append(CellEstimate(cid, math.nan, 0.0, True, "custom kernel failed"))
        else:
            results.append(CellEstimate(cid, float(r["att"]), float(r["n1"]), False))
    cols = ["cid", "uid"] + (["ut"] if rc else []) + ["inf"]
    return results, if_df.select(*cols)
