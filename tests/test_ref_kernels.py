"""Validate the NumPy reference kernels themselves (no Spark):
consistency against a known-truth DGP and analytic-SE accuracy against
the Monte-Carlo sampling distribution. If these hold, the reference is
a sound parity oracle for the distributed kernels."""

from __future__ import annotations

import numpy as np
import pytest

from tests.ref_drdid import (
    drdid_panel,
    drdid_rc,
    reg_did_panel,
    reg_did_rc,
    std_ipw_did_panel,
    std_ipw_did_rc,
)

TRUE_ATT = 1.5


def _panel_dgp(rng, n=600):
    x = rng.normal(size=n)
    X = np.column_stack([np.ones(n), x])
    ps = 1 / (1 + np.exp(-(0.5 * x - 0.2)))
    D = (rng.uniform(size=n) < ps).astype(float)
    y0 = 1.0 + 0.8 * x + rng.normal(size=n)
    trend = 0.5 + 0.4 * x
    y1 = y0 + trend + TRUE_ATT * D + rng.normal(size=n)
    w = rng.uniform(0.5, 1.5, size=n)
    return y1, y0, D, X, w


def _rc_dgp(rng, n=1200):
    x = rng.normal(size=n)
    X = np.column_stack([np.ones(n), x])
    ps = 1 / (1 + np.exp(-(0.5 * x - 0.2)))
    D = (rng.uniform(size=n) < ps).astype(float)
    post = (rng.uniform(size=n) < 0.5).astype(float)
    base = 1.0 + 0.8 * x + 0.3 * D
    trend = 0.5 + 0.4 * x
    y = base + post * (trend + TRUE_ATT * D) + rng.normal(size=n)
    w = rng.uniform(0.5, 1.5, size=n)
    return y, post, D, X, w


PANEL_KERNELS = [reg_did_panel, std_ipw_did_panel, drdid_panel]
RC_KERNELS = [reg_did_rc, std_ipw_did_rc, drdid_rc]


@pytest.mark.parametrize("kernel", PANEL_KERNELS)
def test_panel_kernel_consistency_and_se(kernel):
    rng = np.random.default_rng(7)
    reps = 400
    atts, ses = [], []
    for _ in range(reps):
        y1, y0, D, X, w = _panel_dgp(rng)
        att, inf = kernel(y1, y0, D, X, w)
        n = len(D)
        atts.append(att)
        ses.append(np.sqrt(np.mean(inf**2) / n))
        assert abs(inf.mean()) < 0.2  # IF approximately mean-zero
    atts, ses = np.array(atts), np.array(ses)
    assert abs(atts.mean() - TRUE_ATT) < 0.03, f"bias: {atts.mean() - TRUE_ATT}"
    # analytic SE should track the MC sampling std within ~12%
    assert abs(ses.mean() / atts.std() - 1) < 0.12, (ses.mean(), atts.std())


@pytest.mark.parametrize("kernel", RC_KERNELS)
def test_rc_kernel_consistency_and_se(kernel):
    rng = np.random.default_rng(11)
    reps = 400
    atts, ses = [], []
    for _ in range(reps):
        y, post, D, X, w = _rc_dgp(rng)
        att, inf = kernel(y, post, D, X, w)
        n = len(D)
        atts.append(att)
        ses.append(np.sqrt(np.mean(inf**2) / n))
        assert abs(inf.mean()) < 0.3
    atts, ses = np.array(atts), np.array(ses)
    assert abs(atts.mean() - TRUE_ATT) < 0.04, f"bias: {atts.mean() - TRUE_ATT}"
    assert abs(ses.mean() / atts.std() - 1) < 0.12, (ses.mean(), atts.std())


def test_dr_equals_reg_and_ipw_without_covariates():
    """Intercept-only: dr, reg, and std-ipw all collapse to the simple
    weighted difference of Δy means."""
    rng = np.random.default_rng(3)
    y1, y0, D, _, w = _panel_dgp(rng)
    X = np.ones((len(D), 1))
    a_reg, _ = reg_did_panel(y1, y0, D, X, w)
    a_ipw, _ = std_ipw_did_panel(y1, y0, D, X, w)
    a_dr, _ = drdid_panel(y1, y0, D, X, w)
    dy = y1 - y0
    manual = np.average(dy[D == 1], weights=w[D == 1]) - np.average(
        dy[D == 0], weights=w[D == 0]
    )
    assert a_reg == pytest.approx(manual, rel=1e-10)
    assert a_ipw == pytest.approx(manual, rel=1e-10)
    assert a_dr == pytest.approx(manual, rel=1e-10)
