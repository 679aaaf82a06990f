"""As-of (most-recent-match) join — a temporal operator the reference
lacks (it has zero joins at all, SURVEY.md §2.3) but any event/panel
engine needs: for each left row, attach the latest right row with
``right.ts <= left.ts`` (backward) or the earliest with
``right.ts >= left.ts`` (forward) sharing the join key.

Spark-first plan: instead of a range join (which explodes to
O(|L|·|R|) per key before picking one match), tag both sides, union
them, and carry the right side's values forward with
``last(..., ignorenulls=True)`` over a single
``Window.partitionBy(key).orderBy(ts, side)``. That is ONE shuffle per
side on the join key and a per-partition sort — the same cost as a
sort-merge join, with no intermediate blow-up, and it scales to any
number of rows per key. DuckDB's native ASOF JOIN is the oracle.

Tie semantics: right rows sort before left rows at equal timestamps,
so the match is inclusive (<= / >=). If the right side can hold
several rows at the same (key, ts), pre-aggregate it — the operator
picks the last one in (ts, side) window order, which is otherwise
nondeterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_RTS = "__asof_right_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    ts_col: str = "ts",
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    right_suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right row's
    ``value_cols`` (suffixed) and ``<ts_col><right_suffix>`` — null
    when no right row qualifies (or the match exceeds ``tolerance_us``
    microseconds).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*keys, ts_col)]
    out_vals = {c: f"{c}{right_suffix}" if c in left.columns else c for c in value_cols}
    rts_out = f"{ts_col}{right_suffix}"

    lt = left.withColumn(_SIDE, F.lit(1))
    rt = right.select(
        *keys,
        F.col(ts_col),
        F.col(ts_col).alias(_RTS),
        *[F.col(c).alias(out_vals[c]) for c in value_cols],
    ).withColumn(_SIDE, F.lit(0))
    both = lt.unionByName(rt, allowMissingColumns=True)

    if direction == "backward":
        order = [F.col(ts_col).asc(), F.col(_SIDE).asc()]
    else:
        order = [F.col(ts_col).desc(), F.col(_SIDE).asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    carried = both.select(
        "*",
        F.last(F.col(_RTS), ignorenulls=True).over(w).alias(f"{_RTS}2"),
        *[
            F.last(F.col(out_vals[c]), ignorenulls=True).over(w).alias(f"{out_vals[c]}2")
            for c in value_cols
        ],
    )

    matched = F.col(f"{_RTS}2").isNotNull()
    if tolerance_us is not None:
        gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col(f"{_RTS}2"))
        if direction == "forward":
            gap = -gap
        matched = matched & (gap <= int(tolerance_us))

    keep = [c for c in left.columns]
    return carried.filter(F.col(_SIDE) == 1).select(
        *keep,
        F.when(matched, F.col(f"{_RTS}2")).alias(rts_out),
        *[F.when(matched, F.col(f"{out_vals[c]}2")).alias(out_vals[c]) for c in value_cols],
    )
