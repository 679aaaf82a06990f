"""NumPy reference implementations of the Sant'Anna & Zhao (2020)
DiD estimators (outcome regression, standardized IPW, doubly robust),
panel and repeated-cross-section, with per-unit influence functions.

Derived from the published formulas (Sant'Anna & Zhao 2020, J.
Econometrics; the same math the external d2cml-ai/DRDID package the
reference imports implements — see SURVEY.md §2.6 K1-K3). These are
the parity oracle for the distributed Spark kernels in
``csdid_pyspark_spark.did.kernels``: tests assert att and influence
functions agree to ~1e-8 on collected cell data.
"""

from __future__ import annotations

import numpy as np


def _logit_fit(D, X, w, maxiter=100, tol=1e-10):
    """Weighted logistic regression via IRLS. Returns gamma-hat."""
    p = X.shape[1]
    gamma = np.zeros(p)
    for _ in range(maxiter):
        eta = X @ gamma
        mu = 1.0 / (1.0 + np.exp(-eta))
        s = w * mu * (1 - mu)
        s = np.maximum(s, 1e-12)
        z = eta + (D - mu) / np.maximum(mu * (1 - mu), 1e-12)
        H = (X * s[:, None]).T @ X
        r = (X * s[:, None]).T @ z
        new = np.linalg.solve(H, r)
        if np.max(np.abs(new - gamma)) < tol:
            gamma = new
            break
        gamma = new
    return gamma


def _wls(y, X, w):
    """Weighted least squares beta-hat."""
    H = (X * w[:, None]).T @ X
    r = (X * w[:, None]).T @ y
    return np.linalg.solve(H, r)


# ---------------------------------------------------------------------------
# Panel estimators: inputs y1, y0 (post/pre outcomes per unit), D, X, w
# ---------------------------------------------------------------------------

def reg_did_panel(y1, y0, D, X, w):
    dy = y1 - y0
    n = len(D)
    ctrl = D == 0
    beta = _wls(dy[ctrl], X[ctrl], w[ctrl])
    out_delta = X @ beta
    w_treat = w * D
    reg_att_treat = w_treat * dy
    reg_att_cont = w_treat * out_delta
    eta_treat = reg_att_treat.mean() / w_treat.mean()
    eta_cont = reg_att_cont.mean() / w_treat.mean()
    att = eta_treat - eta_cont

    wols = w * (1 - D)
    XpX_inv = np.linalg.inv((X * wols[:, None]).T @ X / n)
    asy_ols = (wols * (dy - out_delta))[:, None] * (X @ XpX_inv)
    inf_treat = (reg_att_treat - w_treat * eta_treat) / w_treat.mean()
    M = (w_treat[:, None] * X).mean(axis=0)
    inf_cont = (reg_att_cont - w_treat * eta_cont + asy_ols @ M) / w_treat.mean()
    return att, inf_treat - inf_cont


def std_ipw_did_panel(y1, y0, D, X, w):
    dy = y1 - y0
    n = len(D)
    gamma = _logit_fit(D, X, w)
    ps = 1.0 / (1.0 + np.exp(-(X @ gamma)))
    ps = np.minimum(ps, 1 - 1e-16)
    w_treat = w * D
    w_cont = w * ps * (1 - D) / (1 - ps)
    att_treat = w_treat * dy
    att_cont = w_cont * dy
    eta_treat = att_treat.mean() / w_treat.mean()
    eta_cont = att_cont.mean() / w_cont.mean()
    att = eta_treat - eta_cont

    score_ps = (w * (D - ps))[:, None] * X
    info = (X * (w * ps * (1 - ps))[:, None]).T @ X / n
    asy_ps = score_ps @ np.linalg.inv(info)
    M2 = (w_cont * (dy - eta_cont))[:, None] * X
    M2 = M2.mean(axis=0)
    inf_treat = (att_treat - w_treat * eta_treat) / w_treat.mean()
    inf_cont = (att_cont - w_cont * eta_cont + asy_ps @ M2) / w_cont.mean()
    return att, inf_treat - inf_cont


def drdid_panel(y1, y0, D, X, w):
    dy = y1 - y0
    n = len(D)
    gamma = _logit_fit(D, X, w)
    ps = 1.0 / (1.0 + np.exp(-(X @ gamma)))
    ps = np.minimum(ps, 1 - 1e-16)
    ctrl = D == 0
    beta = _wls(dy[ctrl], X[ctrl], w[ctrl])
    out_delta = X @ beta

    w_treat = w * D
    w_cont = w * ps * (1 - D) / (1 - ps)
    dr_att_treat = w_treat * (dy - out_delta)
    dr_att_cont = w_cont * (dy - out_delta)
    eta_treat = dr_att_treat.mean() / w_treat.mean()
    eta_cont = dr_att_cont.mean() / w_cont.mean()
    att = eta_treat - eta_cont

    wols = w * (1 - D)
    XpX_inv = np.linalg.inv((X * wols[:, None]).T @ X / n)
    asy_ols = (wols * (dy - out_delta))[:, None] * (X @ XpX_inv)
    score_ps = (w * (D - ps))[:, None] * X
    info = (X * (w * ps * (1 - ps))[:, None]).T @ X / n
    asy_ps = score_ps @ np.linalg.inv(info)

    M1 = (w_treat[:, None] * X).mean(axis=0)
    M2 = (w_cont * (dy - out_delta - eta_cont))[:, None] * X
    M2 = M2.mean(axis=0)
    M3 = (w_cont[:, None] * X).mean(axis=0)

    inf_treat = (dr_att_treat - w_treat * eta_treat - asy_ols @ M1) / w_treat.mean()
    inf_cont = (dr_att_cont - w_cont * eta_cont + asy_ps @ M2 - asy_ols @ M3) / w_cont.mean()
    return att, inf_treat - inf_cont


# ---------------------------------------------------------------------------
# Repeated cross-section estimators: inputs y, post, D, X, w (one row per obs)
# ---------------------------------------------------------------------------

def reg_did_rc(y, post, D, X, w):
    n = len(D)
    c_pre = (D == 0) & (post == 0)
    c_post = (D == 0) & (post == 1)
    beta_pre = _wls(y[c_pre], X[c_pre], w[c_pre])
    beta_post = _wls(y[c_post], X[c_post], w[c_post])
    out_y = post * (X @ beta_post) + (1 - post) * (X @ beta_pre)

    w_treat_pre = w * D * (1 - post)
    w_treat_post = w * D * post
    w_cont = w * D
    reg_att_treat_pre = w_treat_pre * y
    reg_att_treat_post = w_treat_post * y
    reg_att_cont = w_cont * out_y
    eta_treat_pre = reg_att_treat_pre.mean() / w_treat_pre.mean()
    eta_treat_post = reg_att_treat_post.mean() / w_treat_post.mean()
    eta_cont = (w_cont * ((X @ beta_post) - (X @ beta_pre))).mean() / w_cont.mean()
    att = (eta_treat_post - eta_treat_pre) - eta_cont

    # influence function
    inf_treat_pre = (reg_att_treat_pre - w_treat_pre * eta_treat_pre) / w_treat_pre.mean()
    inf_treat_post = (reg_att_treat_post - w_treat_post * eta_treat_post) / w_treat_post.mean()

    wols_pre = w * (1 - D) * (1 - post)
    wols_post = w * (1 - D) * post
    XpX_inv_pre = np.linalg.inv((X * wols_pre[:, None]).T @ X / n)
    XpX_inv_post = np.linalg.inv((X * wols_post[:, None]).T @ X / n)
    asy_pre = (wols_pre * (y - X @ beta_pre))[:, None] * (X @ XpX_inv_pre)
    asy_post = (wols_post * (y - X @ beta_post))[:, None] * (X @ XpX_inv_post)
    M = (w_cont[:, None] * X).mean(axis=0)
    delta_out = (X @ beta_post) - (X @ beta_pre)
    inf_cont_1 = (w_cont * delta_out - w_cont * eta_cont) / w_cont.mean()
    inf_cont_2 = (asy_post @ M - asy_pre @ M) / w_cont.mean()
    return att, (inf_treat_post - inf_treat_pre) - (inf_cont_1 + inf_cont_2)


def std_ipw_did_rc(y, post, D, X, w):
    n = len(D)
    gamma = _logit_fit(D, X, w)
    ps = 1.0 / (1.0 + np.exp(-(X @ gamma)))
    ps = np.minimum(ps, 1 - 1e-16)
    lam = (w * post).mean() / w.mean()  # P(post)

    # standardized weights for the four cells
    w_t_post = w * D * post
    w_t_pre = w * D * (1 - post)
    odds = ps * (1 - D) / (1 - ps)
    w_c_post = w * odds * post
    w_c_pre = w * odds * (1 - post)

    eta_t_post = (w_t_post * y).mean() / w_t_post.mean()
    eta_t_pre = (w_t_pre * y).mean() / w_t_pre.mean()
    eta_c_post = (w_c_post * y).mean() / w_c_post.mean()
    eta_c_pre = (w_c_pre * y).mean() / w_c_pre.mean()
    att = (eta_t_post - eta_t_pre) - (eta_c_post - eta_c_pre)

    # influence: treat parts are simple standardized means
    inf_t_post = (w_t_post * y - w_t_post * eta_t_post) / w_t_post.mean()
    inf_t_pre = (w_t_pre * y - w_t_pre * eta_t_pre) / w_t_pre.mean()

    inf_c_post_1 = (w_c_post * y - w_c_post * eta_c_post) / w_c_post.mean()
    inf_c_pre_1 = (w_c_pre * y - w_c_pre * eta_c_pre) / w_c_pre.mean()

    # pscore estimation effect
    score_ps = (w * (D - ps))[:, None] * X
    info = (X * (w * ps * (1 - ps))[:, None]).T @ X / n
    asy_ps = score_ps @ np.linalg.inv(info)
    M_post = ((w_c_post * (y - eta_c_post))[:, None] * X).mean(axis=0) / w_c_post.mean()
    M_pre = ((w_c_pre * (y - eta_c_pre))[:, None] * X).mean(axis=0) / w_c_pre.mean()
    inf_cont = inf_c_post_1 - inf_c_pre_1 + asy_ps @ (M_post - M_pre)
    return att, (inf_t_post - inf_t_pre) - inf_cont


def drdid_rc(y, post, D, X, w):
    """Locally-efficient DR estimator for repeated cross sections
    (Sant'Anna & Zhao 2020 eq. 3.4): four outcome regressions (one per
    D×post cell) + propensity score."""
    n = len(D)
    gamma = _logit_fit(D, X, w)
    ps = 1.0 / (1.0 + np.exp(-(X @ gamma)))
    ps = np.minimum(ps, 1 - 1e-16)

    masks = {
        ("c", 0): (D == 0) & (post == 0),
        ("c", 1): (D == 0) & (post == 1),
        ("t", 0): (D == 1) & (post == 0),
        ("t", 1): (D == 1) & (post == 1),
    }
    beta = {k: _wls(y[m], X[m], w[m]) for k, m in masks.items()}
    oyc_post = X @ beta[("c", 1)]
    oyc_pre = X @ beta[("c", 0)]
    oyt_post = X @ beta[("t", 1)]
    oyt_pre = X @ beta[("t", 0)]
    out_y_cont = post * oyc_post + (1 - post) * oyc_pre

    w_treat_pre = w * D * (1 - post)
    w_treat_post = w * D * post
    odds = ps * (1 - D) / (1 - ps)
    w_cont_pre = w * odds * (1 - post)
    w_cont_post = w * odds * post
    w_d = w * D
    w_dt1 = w * D * post
    w_dt0 = w * D * (1 - post)

    # "traditional" DR components
    dr_att_treat_pre = w_treat_pre * (y - out_y_cont)
    dr_att_treat_post = w_treat_post * (y - out_y_cont)
    dr_att_cont_pre = w_cont_pre * (y - out_y_cont)
    dr_att_cont_post = w_cont_post * (y - out_y_cont)
    eta_treat_pre = dr_att_treat_pre.mean() / w_treat_pre.mean()
    eta_treat_post = dr_att_treat_post.mean() / w_treat_post.mean()
    eta_cont_pre = dr_att_cont_pre.mean() / w_cont_pre.mean()
    eta_cont_post = dr_att_cont_post.mean() / w_cont_post.mean()

    # local-efficiency adjustment: post-regression and pre-regression
    # contrasts evaluated on all-treated vs within-period treated rows
    dr_att_d_post = w_d * (oyt_post - oyc_post)
    dr_att_dt1_post = w_dt1 * (oyt_post - oyc_post)
    dr_att_d_pre = w_d * (oyt_pre - oyc_pre)
    dr_att_dt0_pre = w_dt0 * (oyt_pre - oyc_pre)
    eta_d_post = dr_att_d_post.mean() / w_d.mean()
    eta_dt1_post = dr_att_dt1_post.mean() / w_dt1.mean()
    eta_d_pre = dr_att_d_pre.mean() / w_d.mean()
    eta_dt0_pre = dr_att_dt0_pre.mean() / w_dt0.mean()

    att = (
        (eta_treat_post - eta_treat_pre)
        - (eta_cont_post - eta_cont_pre)
        + (eta_d_post - eta_dt1_post)
        - (eta_d_pre - eta_dt0_pre)
    )

    # --- influence function ---
    def xpx_inv(wv):
        return np.linalg.inv((X * wv[:, None]).T @ X / n)

    wols = {
        ("c", 0): w * (1 - D) * (1 - post),
        ("c", 1): w * (1 - D) * post,
        ("t", 0): w * D * (1 - post),
        ("t", 1): w * D * post,
    }
    asy = {}
    for k in masks:
        resid = y - X @ beta[k]
        asy[k] = (wols[k] * resid)[:, None] * (X @ xpx_inv(wols[k]))

    # pscore estimation effect
    score_ps = (w * (D - ps))[:, None] * X
    info = (X * (w * ps * (1 - ps))[:, None]).T @ X / n
    asy_ps = score_ps @ np.linalg.inv(info)

    # 1) treated components (w_treat_* are single-period weights, so the
    #    beta effect of out_y_cont routes to that period's control reg)
    inf_treat_post = (dr_att_treat_post - w_treat_post * eta_treat_post) / w_treat_post.mean()
    inf_treat_pre = (dr_att_treat_pre - w_treat_pre * eta_treat_pre) / w_treat_pre.mean()
    m_tp = (w_treat_post[:, None] * X).mean(axis=0) / w_treat_post.mean()
    m_tr = (w_treat_pre[:, None] * X).mean(axis=0) / w_treat_pre.mean()
    inf_treat = inf_treat_post - inf_treat_pre - asy[("c", 1)] @ m_tp + asy[("c", 0)] @ m_tr

    # 2) control components
    inf_cont_post = (dr_att_cont_post - w_cont_post * eta_cont_post) / w_cont_post.mean()
    inf_cont_pre = (dr_att_cont_pre - w_cont_pre * eta_cont_pre) / w_cont_pre.mean()
    M2_post = ((w_cont_post * (y - out_y_cont - eta_cont_post))[:, None] * X).mean(axis=0) / w_cont_post.mean()
    M2_pre = ((w_cont_pre * (y - out_y_cont - eta_cont_pre))[:, None] * X).mean(axis=0) / w_cont_pre.mean()
    inf_cont_ps = asy_ps @ (M2_post - M2_pre)
    m_cp = (w_cont_post[:, None] * X).mean(axis=0) / w_cont_post.mean()
    m_cr = (w_cont_pre[:, None] * X).mean(axis=0) / w_cont_pre.mean()
    inf_cont_or = asy[("c", 1)] @ m_cp - asy[("c", 0)] @ m_cr
    inf_cont = inf_cont_post - inf_cont_pre + inf_cont_ps - inf_cont_or

    # 3) efficiency-adjustment components
    inf_eff = (
        (dr_att_d_post - w_d * eta_d_post) / w_d.mean()
        - (dr_att_dt1_post - w_dt1 * eta_dt1_post) / w_dt1.mean()
        - (dr_att_d_pre - w_d * eta_d_pre) / w_d.mean()
        + (dr_att_dt0_pre - w_dt0 * eta_dt0_pre) / w_dt0.mean()
    )
    mom_d = (w_d[:, None] * X).mean(axis=0) / w_d.mean()
    mom_dt1 = (w_dt1[:, None] * X).mean(axis=0) / w_dt1.mean()
    mom_dt0 = (w_dt0[:, None] * X).mean(axis=0) / w_dt0.mean()
    inf_eff_or = (asy[("t", 1)] - asy[("c", 1)]) @ (mom_d - mom_dt1) - (
        asy[("t", 0)] - asy[("c", 0)]
    ) @ (mom_d - mom_dt0)

    return att, inf_treat - inf_cont + inf_eff + inf_eff_or
