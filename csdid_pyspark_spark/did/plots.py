"""Event-study / group-effect plots (reference plots.py:3-96 gplot &
splot semantics: point estimates with error bars, pre/post coloring).

matplotlib is optional in this environment — import is gated; the
data-preparation functions are pure pandas and always available.
"""

from __future__ import annotations

import pandas as pd


def attgt_plot_data(table: pd.DataFrame) -> pd.DataFrame:
    """Per-(g,t) errorbar data, one facet per cohort (reference
    plot_attgt, ATTgt.py:881-938)."""
    out = table.copy()
    out["phase"] = out["post"].map({1: "post", 0: "pre"})
    return out[["g", "t", "att", "se", "lower", "upper", "phase"]]


def aggte_plot_data(result) -> pd.DataFrame:
    """Errorbar data for an AggteResult (reference plot_aggte /
    gplot; fixes the reference bug of always plotting the 'group'
    aggregation regardless of type — ATTgt.py:951)."""
    t = result.table.copy() if result.table is not None else pd.DataFrame()
    if not t.empty and result.typec == "dynamic":
        t["phase"] = (t["egt"] >= 0).map({True: "post", False: "pre"})
    return t


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError as e:  # matplotlib absent in some deployments
        raise ImportError(
            "matplotlib is required for rendering; use attgt_plot_data()/"
            "aggte_plot_data() to get the plot-ready frame instead"
        ) from e


def plot_attgt(table: pd.DataFrame, title: str = "ATT(g,t)"):
    plt = _plt()

    data = attgt_plot_data(table)
    cohorts = sorted(data["g"].unique())
    fig, axes = plt.subplots(len(cohorts), 1, figsize=(8, 3 * len(cohorts)), squeeze=False)
    for ax, g in zip(axes[:, 0], cohorts):
        sub = data[data["g"] == g]
        for phase, color in (("pre", "#5B8DB8"), ("post", "#C44E52")):
            s = sub[sub["phase"] == phase]
            ax.errorbar(
                s["t"], s["att"],
                yerr=[s["att"] - s["lower"], s["upper"] - s["att"]],
                fmt="o", color=color, label=phase, capsize=3,
            )
        ax.axhline(0, color="gray", lw=0.8)
        ax.axvline(g - 0.5, color="gray", lw=0.8, ls="--")
        ax.set_title(f"group {g:g}")
        ax.legend()
    fig.suptitle(title)
    fig.tight_layout()
    return fig


def plot_aggte(result, title: str | None = None):
    plt = _plt()

    data = aggte_plot_data(result)
    fig, ax = plt.subplots(figsize=(8, 4))
    if data.empty:
        ax.text(0.5, 0.5, f"overall ATT = {result.overall_att:.4f} (se {result.overall_se:.4f})",
                ha="center")
    else:
        colors = data.get("phase", pd.Series(["post"] * len(data))).map(
            {"pre": "#5B8DB8", "post": "#C44E52"}
        )
        ax.errorbar(
            data["egt"], data["att"],
            yerr=[data["att"] - data["lower"], data["upper"] - data["att"]],
            fmt="none", ecolor=colors, capsize=3,
        )
        ax.scatter(data["egt"], data["att"], c=colors, zorder=3)
        ax.axhline(0, color="gray", lw=0.8)
    ax.set_title(title or f"{result.typec} aggregation")
    fig.tight_layout()
    return fig
