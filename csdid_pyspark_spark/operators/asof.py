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
    return asof_join_tagged(
        both,
        on=keys,
        ts_col=ts_col,
        value_cols=[out_vals[c] for c in value_cols],
        left_cols=list(left.columns),
        direction=direction,
        tolerance_us=tolerance_us,
        right_suffix=right_suffix,
    )


def asof_join_tagged(
    both: DataFrame,
    on: Sequence[str] | str,
    ts_col: str = "ts",
    value_cols: Sequence[str] | None = None,
    left_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    right_suffix: str = "_right",
) -> DataFrame:
    """As-of join over a PRE-TAGGED union: ``both`` carries left and
    right rows in ONE DataFrame — ``SIDE_COL`` 1 on left rows / 0 on
    right rows, ``RTS_COL`` = the right row's timestamp (null on left
    rows), ``value_cols`` already under their OUTPUT names (null on
    left rows), and ``left_cols`` the left row's payload (null on
    right rows).

    This is the entry point for callers whose two sides derive from
    the SAME table: building them as separate DataFrames and unioning
    (``asof_join``) plans one scan per side — a filter on each branch
    does not make the scans shareable — while a single conditional
    projection (and, if the right side needs pre-aggregation, one
    grouped pass keyed so left rows stay singleton groups) feeds this
    function from ONE scan (guide §6/§2.4). Identical window, tie and
    tolerance semantics to :func:`asof_join`: carried values come only
    from right rows, so equal-timestamp left rows can't observe each
    other regardless of their relative order."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None or left_cols is None:
        raise ValueError("asof_join_tagged requires value_cols and left_cols")
    rts_out = f"{ts_col}{right_suffix}"

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
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"{c}2")
            for c in value_cols
        ],
    )

    matched = F.col(f"{_RTS}2").isNotNull()
    if tolerance_us is not None:
        gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col(f"{_RTS}2"))
        if direction == "forward":
            gap = -gap
        matched = matched & (gap <= int(tolerance_us))

    return carried.filter(F.col(_SIDE) == 1).select(
        *left_cols,
        F.when(matched, F.col(f"{_RTS}2")).alias(rts_out),
        *[F.when(matched, F.col(f"{c}2")).alias(c) for c in value_cols],
    )


# public names for callers assembling a pre-tagged union frame
SIDE_COL = _SIDE
RTS_COL = _RTS
