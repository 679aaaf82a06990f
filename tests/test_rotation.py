"""Correctness-window rotation invariants.

The external driver checks the FIRST 50 queries in registration order.
``csdid_pyspark_spark.queries`` auto-rotates that order from the
CORRECTNESS_r*.json verdicts in the repo root: last-check-failed
queries first, then never-checked queries, then green sentinels. These
tests pin the invariant so a registry edit can't silently push a red
or new query out of the checked window.
"""

from __future__ import annotations

import glob
import json
import os

from csdid_pyspark_spark.queries import QUERIES

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _verdict_classes():
    green, failed = set(), set()
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            verdicts = json.load(f)
        for name, v in verdicts.items():
            if not isinstance(v, dict):
                continue
            ok = v.get("hash_match") is True or (
                v.get("err") == "no_oracle" and v.get("spark_rows") is not None
            )
            if ok:
                green.add(name)
                failed.discard(name)
            else:
                failed.add(name)
    return green, failed


def test_failed_and_unchecked_queries_front_loaded():
    green, failed = _verdict_classes()
    names = list(QUERIES)
    window = set(names[:WINDOW])

    in_registry_failed = {n for n in failed if n in names}
    missing = in_registry_failed - window
    assert not missing, f"last-check-failed queries outside the checked window: {missing}"

    never_checked = [n for n in names if n not in green and n not in failed]
    # Every never-checked query must precede every green sentinel.
    first_green_pos = min(
        (names.index(n) for n in names if n in green), default=len(names)
    )
    stragglers = [n for n in never_checked if names.index(n) > first_green_pos]
    assert not stragglers, f"never-checked queries ranked after green ones: {stragglers}"


def test_window_covers_all_non_green_queries_or_registry_is_small():
    green, failed = _verdict_classes()
    names = list(QUERIES)
    non_green = [n for n in names if n not in green]
    if len(non_green) <= WINDOW:
        assert set(non_green) <= set(names[: len(non_green)])
