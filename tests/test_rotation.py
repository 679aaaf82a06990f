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
    green, failed, hash_green = set(), set(), set()
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
                if v.get("hash_match") is True:
                    hash_green.add(name)
            else:
                failed.add(name)
    return green, failed, hash_green


def test_failed_and_unchecked_queries_front_loaded():
    green, failed, hash_green = _verdict_classes()
    names = list(QUERIES)
    window = set(names[:WINDOW])

    in_registry_failed = {n for n in failed if n in names}
    missing = in_registry_failed - window
    assert not missing, f"last-check-failed queries outside the checked window: {missing}"

    never_checked = [n for n in names if n not in green and n not in failed]
    # Every never-checked query must precede every HASH-green sentinel.
    # (Rows-only-green queries that newly gained an oracle share the
    # front-loaded tier with never-checked ones, so they may interleave.)
    first_sentinel_pos = min(
        (names.index(n) for n in names if n in hash_green), default=len(names)
    )
    stragglers = [n for n in never_checked if names.index(n) > first_sentinel_pos]
    assert not stragglers, f"never-checked queries ranked after hash-green ones: {stragglers}"


def test_window_covers_all_non_green_queries_or_registry_is_small():
    green, failed, hash_green = _verdict_classes()
    names = list(QUERIES)
    # everything outside the hash-green sentinel class still needs a
    # (first or re-) hash check: failed, never-checked, and rows-only
    # queries that now carry an oracle — all must fit the front window
    pending = [n for n in names if n not in hash_green]
    if len(pending) <= WINDOW:
        assert set(pending) <= set(names[: len(pending)])


def test_rows_only_queries_with_new_oracles_front_loaded():
    """A query whose external checks were all rows-only but which now
    carries an oracle (pinned VALUES golden) has its first HASH check
    outstanding — it must outrank EVERY hash-green sentinel. When more
    first-checks are outstanding than the window holds (a burst of new
    operators), the overflow is bounded by registration order and
    drains on the following round — but no sentinel may consume a slot
    a pending first-check needs."""
    from csdid_pyspark_spark.queries import ORACLES

    hash_green = set()
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name, v in json.load(f).items():
                if isinstance(v, dict) and v.get("hash_match") is True:
                    hash_green.add(name)
    names = list(QUERIES)
    pending_first_hash = [
        n for n in names if n in ORACLES and n not in hash_green
    ]
    if len(pending_first_hash) <= WINDOW:
        window = set(names[:WINDOW])
        outside = [n for n in pending_first_hash if n not in window]
        assert not outside, (
            f"queries awaiting their first hash check outside window: {outside}"
        )
    else:
        # overflow burst: every window slot must go to a pending check,
        # never a green sentinel
        sentinels_inside = [n for n in names[:WINDOW] if n in hash_green]
        assert not sentinels_inside, (
            f"green sentinels occupying slots while first checks overflow: "
            f"{sentinels_inside}"
        )


def test_green_sentinels_rotate_oldest_first():
    """Within the green-sentinel tier, last-checked round must be
    non-decreasing down the registry — the staleness bound that makes
    every query re-checked within ceil(registry/window) rounds."""
    green, failed, _hash_green = _verdict_classes()
    last = {}
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        with open(path) as f:
            for name, v in json.load(f).items():
                if isinstance(v, dict):
                    last[name] = max(rnd, last.get(name, 0))
    from csdid_pyspark_spark.queries import ORACLES

    hash_green = set()
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name, v in json.load(f).items():
                if isinstance(v, dict) and v.get("hash_match") is True:
                    hash_green.add(name)
    names = list(QUERIES)
    sentinels = [
        n for n in names
        if n in green and n not in failed and (n in hash_green or n not in ORACLES)
    ]
    rounds = [last[n] for n in sentinels]
    assert rounds == sorted(rounds), (
        f"green sentinels not oldest-first: {list(zip(sentinels, rounds))[:10]}"
    )


def test_folded_names_map_to_registered_representatives():
    """Every FOLDED key is a withdrawn-but-still-implemented query
    (present in ALL_QUERIES, absent from the exported surface) and
    every representative named in its fold-map value is REGISTERED —
    so the folded logic always has a live externally-checked cover.
    A representative that is itself folded (or deleted) would silently
    orphan the folded query's external coverage."""
    from csdid_pyspark_spark.queries import ALL_QUERIES, FOLDED, ORACLES, QUERIES

    for folded, reps in FOLDED.items():
        assert folded in ALL_QUERIES, f"FOLDED key not implemented: {folded}"
        assert folded not in QUERIES, f"FOLDED key still exported: {folded}"
        assert folded not in ORACLES, f"FOLDED key still in ORACLES: {folded}"
        for rep in reps.split(" + "):
            assert rep in QUERIES, (
                f"fold representative {rep!r} (covering {folded!r}) is not "
                "a registered query"
            )
