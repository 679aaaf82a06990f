"""Scale rehearsal: reproducible large-input measurements off the bench path.

Two modes, both synthesizing their input entirely executor-side (no
driver materialization) so the only driver traffic is the estimator's
O(cells·p²) Grams / the dedup pipeline's scalar counts:

``panel`` (default) — a staggered-adoption panel (8 cohorts, known
dynamic treatment effects, one confounding covariate); runs the
doubly-robust fit + dynamic event-study aggregation and reports wall
times and max |ATT(g,t) − truth|. DGP: cohort g treated from period g
with effect tau·(t − g + 1); y_it = unit_fe + 0.5·x_i + 0.1·t + effect
+ noise. x shifts cohort assignment so the unadjusted contrast is
biased — the DR kernel must actually use the covariate.

``docs`` — a document corpus with planted near-duplicate cliques (one
mutated token per copy); runs the production dedup pipeline
(MinHash-LSH candidates → exact-Jaccard verification → connected
components → keep-list) and the two sequence-packing operators, and
reports per-stage wall times plus planted-clique recall.

Both report driver peak RSS (Python driver AND the Spark JVM child) so
"no driver growth at N×" is a measured number, not a claim.

Usage:
    python stress.py panel [n_units] [n_periods]   # default 200k x 20 = 4M rows
    python stress.py docs  [n_docs]                # default 25_000
    python stress.py clf   [n_rows]                # default 10_000_000
    python stress.py rank  [n_rows]                # default 20_000_000
    python stress.py [n_units] [n_periods]         # legacy: panel mode

Further modes (each a scale-critical operator family; see the run_*
docstrings): tokens, spans [minlen], srm, er, cm, stream, streamcdc,
streamrefresh (the last two inject a mid-stream crash and verify
exactly-once recovery), cdc, hll, cic, conformal, pit, stats, ivfpq,
synth.
"""

from __future__ import annotations

import json
import resource
import sys
import time

from pyspark.sql import functions as F

from csdid_pyspark_spark.did import ATTgt
from csdid_pyspark_spark.operators import dedup, packing
from csdid_pyspark_spark.session import get_spark

TAU = 0.1


def _driver_memory() -> dict:
    """Peak RSS in MiB: the Python driver process (ru_maxrss, KiB on
    Linux) and the live local-mode JVM child (VmHWM from /proc — the
    JVM hasn't exited, so RUSAGE_CHILDREN would miss it)."""
    import os
    import re

    self_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    jvm_kb = 0
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            if int(parts[3]) != me or "java" not in parts[1]:
                continue
            with open(f"/proc/{pid}/status") as f:
                m = re.search(r"VmHWM:\s+(\d+) kB", f.read())
            if m:
                jvm_kb = max(jvm_kb, int(m.group(1)))
        except (OSError, IndexError, ValueError):
            continue
    return {
        "driver_py_peak_mib": round(self_kb / 1024, 1),
        "jvm_peak_mib": round(jvm_kb / 1024, 1),
    }


def synth_panel(spark, n_units: int, n_periods: int):
    cohorts = [0] + list(range(4, n_periods, 2))  # 0 = never treated
    u = spark.range(n_units).select(
        F.col("id"),
        # deterministic unit covariate and noise seeds (no rand() — runs
        # are bit-identical and partition-count independent)
        (F.pmod(F.xxhash64("id"), 1000) / 1000.0 - 0.5).alias("x"),
        (F.pmod(F.xxhash64("id", F.lit("fe")), 1000) / 500.0 - 1.0).alias("fe"),
    )
    # covariate-shifted cohort assignment: high-x units adopt earlier
    k = len(cohorts)
    gidx = F.pmod(F.xxhash64("id", F.lit("g")) + (F.col("x") * 6).cast("long"), k)
    u = u.withColumn("g", F.element_at(F.array(*[F.lit(c) for c in cohorts]), gidx.cast("int") + 1))
    t = spark.range(1, n_periods + 1).select(F.col("id").alias("t"))
    noise = F.pmod(F.xxhash64("id", "t"), 10000) / 10000.0
    eff = F.when(
        (F.col("g") > 0) & (F.col("t") >= F.col("g")),
        TAU * (F.col("t") - F.col("g") + 1),
    ).otherwise(0.0)
    return (
        u.crossJoin(t)
        .select(
            "id",
            F.col("t").cast("int").alias("t"),
            F.col("g").cast("int").alias("g"),
            "x",
            (
                F.col("fe")
                + 0.5 * F.col("x")
                + 0.1 * F.col("t")
                + eff
                + (noise - 0.5) * 2.0
            ).alias("y"),
        )
    )


CLIQUE = 4  # planted near-duplicate clique size


def synth_docs(spark, n_docs: int, vocab: int = 5000):
    """Deterministic corpus with planted near-dup cliques: doc ids
    {b, b+1, .., b+CLIQUE-1} share base text derived from b; the non-base
    members mutate exactly one token, so pairwise shingle Jaccard stays
    well above the 0.5 threshold and ground-truth components are the
    cliques themselves. Built with sequence/transform — no driver rows."""
    d = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (F.col("id") - F.col("id") % CLIQUE).alias("base"),
        F.concat(F.lit("src_"), F.pmod(F.xxhash64("id", F.lit("s")), 10).cast("string")).alias(
            "source"
        ),
    )
    d = d.withColumn("len", (F.pmod(F.xxhash64("base", F.lit("L")), 60) + 40).cast("int"))
    mut_pos = F.pmod(F.xxhash64("doc_id", F.lit("m")), F.col("len"))
    idx = F.sequence(F.lit(0), F.col("len") - 1)
    tok = F.transform(
        idx,
        lambda i: F.when(
            (F.col("doc_id") % CLIQUE != 0) & (i == mut_pos),
            F.concat(F.lit("mut"), F.col("doc_id").cast("string")),
        ).otherwise(
            F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("base") * 1000 + i), vocab).cast("string"),
            )
        ),
    )
    return d.select(
        "doc_id",
        "source",
        F.array_join(tok, " ").alias("text"),
        F.col("len").cast("long").alias("tok_len"),
    )


def run_panel(spark, n_units: int, n_periods: int, bstrap: bool = False) -> dict:
    panel = synth_panel(spark, n_units, n_periods).persist()
    n_rows = panel.count()

    t0 = time.perf_counter()
    est = ATTgt(
        panel,
        yname="y", tname="t", idname="id", gname="g",
        xfmla="y ~ x", panel=True, allow_unbalanced_panel=False,
    )
    table = est.fit(est_method="dr", bstrap=bstrap, cband=bstrap)
    fit_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    dyn = est.compute_aggte("dynamic")
    agg_s = time.perf_counter() - t0

    post = table[table["post"] == 1].dropna(subset=["att"])
    truth = TAU * (post["t"] - post["g"] + 1)
    max_err = float((post["att"] - truth).abs().max())

    # robustness companions on the same planted panel: SA must recover
    # tau*(e+1) on the lags and ~0 on the leads (the DGP's confounder is
    # time-invariant, so the fixed-baseline cell differences remove it);
    # dCDH's instantaneous DID_M must recover tau.
    from csdid_pyspark_spark.did.robust_cells import dcdh_frame, sunab_event_frame

    t0 = time.perf_counter()
    sa = sunab_event_frame(panel, yname="y", tname="t", gname="g").collect()
    sa_err = max(
        abs(r["att_iw"] - (TAU * (r["e"] + 1) if r["e"] >= 0 else 0.0))
        for r in sa
    )
    dc = dcdh_frame(panel, yname="y", tname="t", gname="g").collect()
    dcdh_m = next(r["did_plus"] for r in dc if r["t"] == -1)
    robust_s = time.perf_counter() - t0

    return {
        "metric": "stress_panel_bstrap" if bstrap else "stress_panel",
        "rows": n_rows,
        "cells": int(len(table)),
        "event_times": len(dyn.egt),
        "fit_dr_sec": round(fit_s, 1),
        "aggte_dynamic_sec": round(agg_s, 1),
        "max_abs_att_error": round(max_err, 4),
        "sunab_dcdh_sec": round(robust_s, 1),
        "sunab_event_times": len(sa),
        "sunab_max_abs_error": round(float(sa_err), 4),
        "dcdh_did_m": round(float(dcdh_m), 4),
        "dcdh_abs_error": round(abs(float(dcdh_m) - TAU), 4),
        **_driver_memory(),
    }


def run_docs(spark, n_docs: int) -> dict:
    docs = synth_docs(spark, n_docs).persist()
    n = docs.count()

    t0 = time.perf_counter()
    pairs = dedup.minhash_lsh_pairs(
        docs, n=3, num_hashes=16, bands=4, threshold=0.5
    ).persist()
    n_pairs = pairs.count()
    lsh_s = time.perf_counter() - t0

    # ground truth: every within-clique pair should be found (near-dups
    # differ by ONE token out of >=40 so Jaccard >> 0.5); recall is
    # found-in-clique pairs / planted pairs
    planted = n // CLIQUE * (CLIQUE * (CLIQUE - 1) // 2)
    in_clique = pairs.filter(
        (F.col("id_a") - F.col("id_a") % CLIQUE) == (F.col("id_b") - F.col("id_b") % CLIQUE)
    ).count()

    t0 = time.perf_counter()
    comp = dedup.components(pairs).persist()
    n_comp_nodes = comp.count()
    n_comps = comp.select("comp").distinct().count()
    comp_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    keep = docs.join(
        comp, on=docs["doc_id"] == comp["node"], how="left"
    ).filter(F.col("comp").isNull() | (F.col("comp") == F.col("doc_id")))
    n_keep = keep.count()
    keep_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    offs = packing.packed_offsets(docs, "tok_len", "source", "doc_id", budget=2048)
    n_offs = offs.count()
    off_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    bins = packing.pack_greedy(docs, "tok_len", "source", "doc_id", budget=2048)
    n_bins = bins.select("source", "bin").distinct().count()
    pack_s = time.perf_counter() - t0

    pairs.unpersist()
    comp.unpersist()
    docs.unpersist()
    return {
        "metric": "stress_docs",
        "docs": n,
        "lsh_pairs": n_pairs,
        "planted_pair_recall": round(in_clique / planted, 4) if planted else None,
        "components": n_comps,
        "component_nodes": n_comp_nodes,
        "kept_docs": n_keep,
        "offset_rows": n_offs,
        "pack_bins": n_bins,
        "minhash_lsh_sec": round(lsh_s, 1),
        "components_sec": round(comp_s, 1),
        "keeplist_sec": round(keep_s, 1),
        "packed_offsets_sec": round(off_s, 1),
        "pack_greedy_sec": round(pack_s, 1),
        **_driver_memory(),
    }




def run_tokens(spark, n_tokens: int) -> dict:
    """Heavy-hitter rehearsal: a skewed token stream (8 hot tokens
    carrying ~30% of mass over a ~5M-term tail vocabulary). The MG
    candidate path must return byte-exactly the naive GROUP BY/HAVING
    answer; both wall times are recorded. Locally the naive plan is
    competitive (a 5M-key vocab fits executor memory and the shuffle
    is in-process) — the MG path's O(partitions·k) shuffle vs
    O(vocabulary) is the claim that matters on a real cluster where
    distinct terms exceed aggregation-hash-map memory; this mode
    pins the exactness half of that claim at 50M rows and shows the
    Python-side sketch costs ≈ one scan, not a multiple of it."""
    from csdid_pyspark_spark.operators.heavyhitters import heavy_hitters
    from csdid_pyspark_spark.operators.packing import release_cache

    t = (
        spark.range(n_tokens)
        .select(
            F.when(
                F.pmod(F.xxhash64("id"), 100) < 30,
                F.concat(
                    F.lit("hot"), F.pmod(F.xxhash64("id", F.lit("h")), 8).cast("string")
                ),
            )
            .otherwise(
                F.concat(
                    F.lit("t"),
                    F.pmod(F.xxhash64("id", F.lit("t")), 5_000_000).cast("string"),
                )
            )
            .alias("tok")
        )
        .persist()
    )
    n = t.count()
    k = 1000

    t0 = time.perf_counter()
    hh = heavy_hitters(t, "tok", k)
    got = {(r["tok"], r["freq"]) for r in hh.collect()}
    hh_s = time.perf_counter() - t0
    release_cache(hh)

    t0 = time.perf_counter()
    exact = {
        (r["tok"], r["freq"])
        for r in t.groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .filter(F.col("freq") * k > F.lit(n))
        .collect()
    }
    naive_s = time.perf_counter() - t0
    t.unpersist()

    return {
        "metric": "stress_tokens",
        "tokens": n,
        "hitters": len(got),
        "exact_match": got == exact,
        "mg_sec": round(hh_s, 1),
        "naive_groupby_sec": round(naive_s, 1),
        **_driver_memory(),
    }


def run_spans(spark, n_docs: int, minlen: bool = False) -> dict:
    """Exact-substring span-cut rehearsal: the synth corpus's planted
    cliques share (nearly) their whole text, so every clique member
    carries cross-doc repeated spans; the report should cover ~all
    clique docs. Records wall time + peak driver memory so the
    ~linear-in-corpus claim of the one-explode/one-shuffle design is
    measured, not asserted."""
    import time

    from csdid_pyspark_spark.cache import release_cache
    from csdid_pyspark_spark.queries.pipeline_ext import span_cut_frame

    docs = synth_docs(spark, n_docs).persist()
    docs.count()
    t0 = time.time()
    # minlen=True drives the published-formulation variant (total
    # occurrences incl. within-doc; max-region readout) — same
    # one-explode/one-shuffle machinery, different dup rule
    rep = span_cut_frame(
        docs, 10, count_within_doc=minlen, emit_max_region=minlen
    ).persist()
    n_rep = rep.count()
    agg = rep.agg(
        F.sum("removed_tok").alias("removed"), F.sum("n_tok").alias("tot")
    ).collect()[0]
    span_sec = round(time.time() - t0, 1)
    # span_cut_frame attaches its span-table persist to rep; release it
    # along with rep's own persist so the driver-memory reading below
    # measures the operator, not a leaked cache
    release_cache(rep)
    rep.unpersist()
    docs.unpersist()
    return {
        "metric": "stress_spans",
        "docs": n_docs,
        "docs_with_repeats": n_rep,
        "removed_tok": int(agg["removed"]),
        "scanned_tok": int(agg["tot"]),
        "span_cut_sec": span_sec,
        **_driver_memory(),
    }


def run_clf(spark, n_rows: int) -> dict:
    """Logistic-regression stress: train the IRLS classifier
    (operators/logreg.py) on n_rows synthetic rows with a known true
    coefficient vector and logistic label noise. Evidence target: each
    iteration is ONE aggregation pass (wall time linear in n), driver
    memory flat (O(p²) traffic), and the true betas are recovered."""
    import math

    from csdid_pyspark_spark.operators.logreg import logistic_irls

    true_beta = [-0.5, 2.0, -1.5, 1.0, 0.5]
    # deterministic pseudo-uniforms from xxhash64 (no rand(): rerunnable)
    u = spark.range(n_rows)
    feats = {"intercept": F.lit(1.0)}
    cols = {}
    for j in range(1, len(true_beta)):
        cols[f"x{j}"] = (
            F.pmod(F.xxhash64(F.col("id") * (2 * j + 1), F.lit(j)), F.lit(1 << 20))
            / F.lit(float(1 << 20))
        )
    df = u.select("id", *[c.alias(n) for n, c in cols.items()])
    eta = F.lit(true_beta[0])
    for j in range(1, len(true_beta)):
        eta = eta + F.lit(true_beta[j]) * F.col(f"x{j}")
        feats[f"x{j}"] = F.col(f"x{j}")
    u_label = F.pmod(F.xxhash64(F.col("id"), F.lit(99)), F.lit(1 << 20)) / F.lit(
        float(1 << 20)
    )
    label = (u_label < F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))).cast("double")
    df = df.withColumn("y", label)

    t0 = time.time()
    iters = 6
    coef = logistic_irls(df, feats, F.col("y"), iters=iters)
    fit_s = time.time() - t0
    err = max(
        abs(coef[n] - b)
        for n, b in zip(["intercept", "x1", "x2", "x3", "x4"], true_beta)
    )
    return {
        "metric": "stress_clf",
        "rows": n_rows,
        "iters": iters,
        "fit_sec": round(fit_s, 1),
        "sec_per_iter": round(fit_s / iters, 2),
        "max_coef_abs_err": round(err, 4),
        **_driver_memory(),
    }


def run_rank(spark, n_rows: int) -> dict:
    """Ordered-scan stress for the two-phase rank+running-total
    (operators/packing.py::global_rank_cumsum) and the one-pass Poisson
    bootstrap shape: n_rows synthetic (entity, value) rows, fully
    executor-side. Evidence targets: wall linear in n (no
    single-reducer window), driver memory flat (only the P-row
    base-offset collect), and the Pareto cut + bootstrap SE computed
    end-to-end."""
    from csdid_pyspark_spark.queries.analytics_ext import _POIS1_CDF

    v = F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(1 << 20)) / F.lit(
        float(1 << 20)
    )
    # heavy-tailed values so the Pareto cut is non-trivial
    df = spark.range(n_rows).select(
        F.col("id"), (F.lit(1.0) / (F.lit(0.001) + v)).alias("value")
    )

    t0 = time.time()
    ranked = packing.global_rank_cumsum(
        df.withColumn("v_neg", -F.col("value").cast("decimal(30,6)")),
        ["v_neg", "id"],
        "value",
    ).df
    tot = df.agg(
        F.sum(F.col("value").cast("decimal(30,6)")).alias("tot"),
        F.count("*").alias("n"),
    )
    cut = (
        ranked.crossJoin(F.broadcast(tot))
        .filter(F.col("cum").cast("double") / F.col("tot").cast("double") >= 0.8)
        .agg(F.min("rn").alias("n_top"))
        .collect()[0]
    )
    packing.release_cache(ranked)
    rank_s = time.time() - t0

    t0 = time.time()
    reps = 20
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws("-", F.col("id"), F.col("rep"))), 1, 6),
            16,
            10,
        ).cast("bigint")
        / 16777216.0
    )
    k = F.when(u < _POIS1_CDF[0], 0)
    for i, cdf in enumerate(_POIS1_CDF[1:], start=1):
        k = k.when(u < cdf, i)
    k = k.otherwise(6)
    rep_means = (
        df.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .withColumn("k", k)
        .groupBy("rep")
        .agg(
            (
                F.sum((F.col("k") * F.col("value")).cast("decimal(30,6)")).cast("double")
                / F.sum("k")
            ).alias("m")
        )
    )
    boot = rep_means.agg(
        F.avg("m").alias("mean"), F.stddev_samp("m").alias("se")
    ).collect()[0]
    boot_s = time.time() - t0

    # grouped weighted order statistics (grouped_rank + sum_col): the
    # weighted-median path over 16 groups — one range shuffle, bases
    # broadcast, per-group totals from the light stats pass.
    t0 = time.time()
    byv = (
        df.select(
            F.pmod(F.xxhash64("id"), F.lit(16)).alias("g"),
            F.round(F.col("value"), 3).alias("v"),
        )
        .groupBy("g", "v")
        .agg(F.count("*").cast("decimal(18,6)").alias("w"))
    )
    gr = packing.grouped_rank(byv, ["g"], ["v"], sum_col="w")
    tot = F.broadcast(
        spark.createDataFrame(
            [(int(k[0]), val) for k, val in sorted(gr.group_sums.items())],
            "g bigint, tot decimal(38,6)",
        )
    )
    wmed = (
        gr.df.join(tot, "g")
        .groupBy("g")
        .agg(F.min(F.when(F.col("cum_w") * 2 >= F.col("tot"), F.col("v"))).alias("m"))
        .collect()
    )
    packing.release_cache(gr.df)
    wmedian_s = time.time() - t0

    return {
        "metric": "stress_rank",
        "rows": n_rows,
        "pareto_n_top": int(cut["n_top"]),
        "rank_cumsum_sec": round(rank_s, 1),
        "poisson_boot_reps": reps,
        "poisson_boot_sec": round(boot_s, 1),
        "boot_se": round(float(boot["se"]), 4),
        "wmedian_groups": len(wmed),
        "wmedian_sec": round(wmedian_s, 1),
        **_driver_memory(),
    }


def run_srm(spark, n_users: int) -> dict:
    """A/B sample-ratio-mismatch gate rehearsal: the SRM chi-square
    over a synthetic distinct-user population (ids synthesized
    executor-side, including ids past 2^31 — the range where the
    unmasked Knuth multiply used to overflow int64). The gate is two
    aggregation passes over n rows with a 2-row driver result; wall
    must be ~linear and the hash split must stay within chi2 bounds
    while the planted mod-3 bias is flagged."""
    from csdid_pyspark_spark.queries.pipeline_ext import srm_frame

    users = spark.range(n_users).select(
        # irregular 62-bit ids (an arithmetic progression is exactly
        # balanced through the affine split hash — chi2 = 0, which
        # rehearses nothing): xxhash64 scatters them across the full
        # range, so most sit far above 2^31 and exercise the
        # overflow-masked hash path while the healthy split lands at
        # a genuine chi2 ~ O(1)
        F.abs(F.xxhash64("id")).alias("user_id")
    )
    t0 = time.perf_counter()
    rows = {r["split"]: r.asDict() for r in srm_frame(users).collect()}
    srm_sec = round(time.perf_counter() - t0, 1)
    return {
        "metric": "stress_srm",
        "users": n_users,
        "hash_chi2": float(rows["hash_uniform"]["chi2"]),
        "hash_flagged": bool(rows["hash_uniform"]["srm_detected"]),
        "mod3_chi2": float(rows["mod3_biased"]["chi2"]),
        "mod3_flagged": bool(rows["mod3_biased"]["srm_detected"]),
        "srm_sec": srm_sec,
        **_driver_memory(),
    }


def run_er(spark, n_rows: int) -> dict:
    """Entity-resolution rehearsal: blocked fuzzy self-join over a
    synthetic catalog of n rows built from a bounded name vocabulary
    (so block sizes grow with n — the skew that matters). Pairing is
    block-local (sum of block², never n²) with the max_block guard
    live; reports candidate-pair count, matches, wall, and that the
    driver stayed flat (the pair list is never collected — only its
    count)."""
    from csdid_pyspark_spark.operators.linkage import blocked_fuzzy_pairs

    words = ["alpha", "bravo", "coral", "delta", "ember", "frost", "gleam", "honey"]
    colors = ["red", "blue", "green", "ivory", "khaki", "lemon"]
    w = F.array(*[F.lit(x) for x in words])
    c = F.array(*[F.lit(x) for x in colors])
    df = spark.range(n_rows).select(
        F.col("id").alias("rid"),
        F.concat_ws(
            " ",
            F.element_at(w, (F.pmod(F.xxhash64("id", F.lit(1)), 8) + 1).cast("int")),
            F.element_at(c, (F.pmod(F.xxhash64("id", F.lit(2)), 6) + 1).cast("int")),
            F.pmod(F.xxhash64("id", F.lit(3)), 500).cast("string"),
        ).alias("name"),
        F.element_at(w, (F.pmod(F.xxhash64("id", F.lit(1)), 8) + 1).cast("int")).alias(
            "brand"
        ),
        # discriminative second key: ~125 rows/block at the 2M default.
        # (First attempt used 200 buckets → 1250 rows/block → 2.5e9
        # Levenshtein evals, 518 s: a measured demonstration that block
        # GRANULARITY, not corpus size, is the er cost driver.)
        F.pmod(F.xxhash64("id", F.lit(4)), 2000).cast("int").alias("bucket2"),
    )
    t0 = time.perf_counter()
    pairs = blocked_fuzzy_pairs(
        df, ["brand", "bucket2"], "rid", "name", max_dist=3, max_block=200_000
    )
    n_pairs = pairs.count()
    n_close = pairs.filter(F.col("dist") <= 1).count()
    er_sec = round(time.perf_counter() - t0, 1)
    return {
        "metric": "stress_er",
        "rows": n_rows,
        "candidate_pairs": n_pairs,
        "pairs_dist_le1": n_close,
        "er_sec": er_sec,
        **_driver_memory(),
    }


def run_cm(spark, n_tokens: int) -> dict:
    """Count-Min rehearsal at a 50M-token stream: the same skewed
    vocabulary as the MG rehearsal (8 hot tokens ≈ 30% of mass over a
    ~5M-term tail). The sketch build is one count aggregation plus a
    vocabulary-sized hash pass into a FIXED 4×16 bucket table; the
    top-k readout must satisfy the CM guarantee est ≥ true on every
    probed token."""
    from csdid_pyspark_spark.queries.pipeline_ext import countmin_readout

    t = spark.range(n_tokens).select(
        F.when(
            F.pmod(F.xxhash64("id"), 100) < 30,
            F.concat(
                F.lit("hot"), F.pmod(F.xxhash64("id", F.lit("h")), 8).cast("string")
            ),
        )
        .otherwise(
            F.concat(
                F.lit("t"),
                F.pmod(F.xxhash64("id", F.lit("t")), 5_000_000).cast("string"),
            )
        )
        .alias("token")
    )
    t0 = time.perf_counter()
    counts = t.groupBy("token").agg(F.count("*").alias("true_n"))
    rows = countmin_readout(counts).collect()
    cm_sec = round(time.perf_counter() - t0, 1)
    return {
        "metric": "stress_cm",
        "tokens": n_tokens,
        "topk": len(rows),
        "cm_guarantee_holds": all(r["overcount"] >= 0 for r in rows),
        "max_overcount": max(r["overcount"] for r in rows),
        "cm_sec": cm_sec,
        **_driver_memory(),
    }


def run_cdc(spark, n_ops: int, n_keys: int | None = None) -> dict:
    """CDC log-apply rehearsal: an n-op change log over n/10 keys
    (10 % delete tombstones planted via hash) materialized to current
    state with the REAL operator (queries.estimation_ext.
    cdc_state_frame — one window pass keyed by user). The state table
    is never collected; the forcing action is a 3-scalar aggregate.
    Evidence targets: wall ~linear in ops, driver flat."""
    from csdid_pyspark_spark.queries.estimation_ext import cdc_state_frame

    n_keys = n_keys or max(1, n_ops // 10)
    h = F.pmod(F.xxhash64("id", F.lit(7)), 10)
    log = spark.range(n_ops).select(
        F.pmod(F.xxhash64("id", F.lit(3)), n_keys).alias("user_id"),
        F.timestamp_seconds(F.lit(1700000000) + (F.col("id") / n_keys)).alias("ts"),
        F.col("id").alias("event_id"),
        F.when(h == 0, "D").when(h == 1, "I").otherwise("U").alias("op"),
        (F.pmod(F.xxhash64("id", F.lit(5)), 100000) / 100.0).alias("value"),
    )
    t0 = time.perf_counter()
    row = (
        cdc_state_frame(log)
        .agg(
            F.count("*").alias("live_keys"),
            F.sum("n_ops").alias("ops_on_live_keys"),
            F.sum("n_deletes").alias("deletes_on_live_keys"),
        )
        .collect()[0]
    )
    cdc_sec = round(time.perf_counter() - t0, 1)
    return {
        "metric": "stress_cdc",
        "ops": n_ops,
        "keys": n_keys,
        "live_keys": int(row["live_keys"]),
        "ops_on_live_keys": int(row["ops_on_live_keys"]),
        "deletes_on_live_keys": int(row["deletes_on_live_keys"]),
        "cdc_sec": cdc_sec,
        **_driver_memory(),
    }


def run_hll(spark, n_ids: int) -> dict:
    """HLL set-algebra rehearsal: two 60 %-of-population id sets with a
    planted 20 % overlap (ids scattered to 62 bits by xxhash64, so the
    portable register mix sees adversarially wide inputs). Runs the
    REAL report SQL (queries.estimation_ext.hll_intersection_sql):
    per-set estimates, register-max union, inclusion-exclusion
    intersection AND the exact distinct-intersect for the error
    column. Evidence targets: per-set estimate within HLL's ~6.5 %
    (m=256) band, wall dominated by the exact check, driver flat."""
    from csdid_pyspark_spark.queries.estimation_ext import hll_intersection_sql

    spark.range(n_ids).select(
        F.col("id").alias("rid"), F.abs(F.xxhash64("id")).alias("user_id")
    ).createOrReplaceTempView("stress_ids")
    half_a = "(SELECT DISTINCT user_id FROM stress_ids WHERE rid % 10 < 6)"
    half_b = "(SELECT DISTINCT user_id FROM stress_ids WHERE rid % 10 >= 4)"
    t0 = time.perf_counter()
    row = spark.sql(hll_intersection_sql(half_a, half_b, spark_side=True)).collect()[0]
    hll_sec = round(time.perf_counter() - t0, 1)
    true_a = 0.6 * n_ids
    return {
        "metric": "stress_hll",
        "ids": n_ids,
        "est_a": float(row["est_a"]),
        "est_b": float(row["est_b"]),
        "est_union": float(row["est_union"]),
        "est_intersection": float(row["est_intersection"]),
        "exact_intersection": int(row["exact_intersection"]),
        "set_rel_err_a": round(abs(float(row["est_a"]) - true_a) / true_a, 4),
        "intersection_rel_err": float(row["rel_err"]),
        "hll_sec": hll_sec,
        **_driver_memory(),
    }


def run_cic(spark, n_units: int) -> dict:
    """Changes-in-changes rehearsal with a planted constant QTE: both
    groups draw U(0,1) pre-period outcomes, the period transform is
    h(y) = 2y (applied to the control post draw), and treatment adds
    +1.0 on top — so the true QTE(tau) is 1.0 at every decile. Runs
    the REAL operator (queries.estimation_ext.cic_qte_frame: three
    two-phase global ranks + one probe-count aggregate) on four
    n_units-row distributions. Evidence targets: max |QTE - 1| within
    sampling noise, wall ~linear, driver flat (ranks collect only
    per-partition totals)."""
    from csdid_pyspark_spark.cache import release_cache
    from csdid_pyspark_spark.queries.estimation_ext import cic_qte_frame

    def u(seed: int):
        return (F.pmod(F.xxhash64("id", F.lit(seed)), 1000000) + 0.5) / 1000000.0

    y00 = spark.range(n_units).select("id", u(11).alias("y"))
    y10 = spark.range(n_units).select("id", u(12).alias("y"))
    y01 = spark.range(n_units).select("id", (u(13) * 2.0).alias("y"))
    y11 = spark.range(n_units).select("id", (u(14) * 2.0 + 1.0).alias("y"))
    t0 = time.perf_counter()
    out = cic_qte_frame(spark, y10, y11, y00, y01)
    rows = out.collect()
    release_cache(out)
    cic_sec = round(time.perf_counter() - t0, 1)
    max_err = max(abs(float(r["qte"]) - 1.0) for r in rows)
    return {
        "metric": "stress_cic",
        "units_per_cell": n_units,
        "deciles": len(rows),
        "max_qte_err_vs_planted": round(max_err, 4),
        "cic_sec": cic_sec,
        **_driver_memory(),
    }


def run_conformal(spark, n_events: int) -> dict:
    """Split-conformal rehearsal: n synthetic events over 5 metric
    groups with uniform noise around group means, hash-split 2:1:1.
    Runs the REAL operator (queries.estimation_ext.conformal_frame).
    With alpha = 0.1 the held-out coverage must land at ~0.90 per
    group — the finite-sample guarantee measured, not assumed.
    Evidence targets: coverage in [0.89, 0.91] at this n, wall
    ~linear, driver flat."""
    from csdid_pyspark_spark.queries.estimation_ext import conformal_frame

    etype = F.element_at(
        F.array(*[F.lit(x) for x in ["a", "b", "c", "d", "e"]]),
        (F.pmod(F.xxhash64("id", F.lit(21)), 5) + 1).cast("int"),
    )
    tagged = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        etype.alias("event_type"),
        (
            (F.pmod(F.xxhash64("id", F.lit(21)), 5) + 1) * 10.0
            + (F.pmod(F.xxhash64("id", F.lit(22)), 1000000) / 1000000.0 - 0.5) * 8.0
        ).alias("value"),
        F.pmod(F.xxhash64("id", F.lit(23)), 4).alias("bkt"),
    )
    t0 = time.perf_counter()
    rows = conformal_frame(tagged).collect()
    conf_sec = round(time.perf_counter() - t0, 1)
    covs = [float(r["coverage"]) for r in rows]
    return {
        "metric": "stress_conformal",
        "events": n_events,
        "groups": len(rows),
        "coverage_min": round(min(covs), 4),
        "coverage_max": round(max(covs), 4),
        "conformal_sec": conf_sec,
        **_driver_memory(),
    }


def run_pit(spark, n_facts: int, n_keys: int | None = None) -> dict:
    """Point-in-time (as-of) join rehearsal: n facts against a
    versioned dimension (5 versions per key, planted values = version
    index) through the REAL operator (operators/asof.py::asof_join —
    union + per-key forward-fill, ONE shuffle on the dimension key,
    never a fact x versions range join). Correctness is checked
    in-flight: each fact's timestamp deterministically selects a known
    version index, and the rehearsal asserts ZERO mismatches on the
    full join. Evidence targets: wall ~linear in facts, driver flat."""
    from csdid_pyspark_spark.operators.asof import asof_join

    n_keys = n_keys or max(1, n_facts // 50)
    versions = spark.range(n_keys * 5).select(
        (F.col("id") % n_keys).alias("k"),
        # version v of key k effective from t = 1000*v
        F.timestamp_seconds(
            F.lit(1600000000) + (F.col("id") / n_keys).cast("int") * 1000
        ).alias("vts"),
        (F.col("id") / n_keys).cast("int").alias("version"),
    )
    facts = spark.range(n_facts).select(
        F.pmod(F.xxhash64("id", F.lit(31)), n_keys).alias("k"),
        # fact time lands mid-version-window v at offset 500
        F.timestamp_seconds(
            F.lit(1600000000)
            + F.pmod(F.xxhash64("id", F.lit(32)), 5).cast("int") * 1000
            + 500
        ).alias("vts"),
        F.pmod(F.xxhash64("id", F.lit(32)), 5).cast("int").alias("want_version"),
    )
    t0 = time.perf_counter()
    out = asof_join(facts, versions, on="k", ts_col="vts", direction="backward")
    row = out.agg(
        F.count("*").alias("n"),
        F.sum((F.col("version") != F.col("want_version")).cast("bigint")).alias(
            "mismatches"
        ),
    ).collect()[0]
    pit_sec = round(time.perf_counter() - t0, 1)
    return {
        "metric": "stress_pit",
        "facts": n_facts,
        "keys": n_keys,
        "versions_per_key": 5,
        "joined": int(row["n"]),
        "mismatches": int(row["mismatches"]),
        "pit_sec": pit_sec,
        **_driver_memory(),
    }


def _land_time_ordered(ev, work: str, n_files: int, base: int, span_s: int) -> str:
    """Land ``ev`` (any schema with an event-time ``ts`` column monotone
    in generation order) as ``n_files`` time-sliced parquet file groups
    under ``work/in``, every file with a DISTINCT mtime in slice order.
    FileStreamSource processes files by mtime, so this guarantees
    per-user nondecreasing event time across micro-batches — the
    precondition the stateful operators' batch-parity claims rest on
    (an mtime TIE would let a later time-subrange drain first)."""
    import glob as _glob
    import os
    import shutil

    watch = os.path.join(work, "in")
    os.makedirs(watch)
    slice_len = span_s // n_files + 1
    for i in range(n_files):
        lo = base + i * slice_len
        hi = lo + slice_len
        part = ev.filter(
            (F.unix_timestamp("ts") >= lo) & (F.unix_timestamp("ts") < hi)
        )
        stage = os.path.join(work, f"stage{i}")
        part.coalesce(4).write.mode("overwrite").parquet(stage)
        dst_i = 0
        for src in sorted(_glob.glob(stage + "/part-*.parquet")):
            dst = os.path.join(watch, f"f{i:02d}_{dst_i}.parquet")
            shutil.copy(src, dst)
            mt = 1_000_000 + i * 1000 + dst_i
            os.utime(dst, (mt, mt))
            dst_i += 1
        shutil.rmtree(stage)
    return watch


def run_stream(spark, n_events: int, n_files: int = 8) -> dict:
    """Structured Streaming rehearsal: n synthetic events land as
    ``n_files`` time-ordered parquet files (distinct mtimes, so
    ``maxFilesPerTrigger=1`` yields one micro-batch per file in event-
    time order), then the REAL stateful sessionizer
    (applyInPandasWithState, per-user tuple state) drains them with
    availableNow. Evidence targets: wall ~linear in events, state =
    one tuple per user (bounded), driver flat, and the multi-batch
    streaming result equals the batch sessionizer EXACTLY — the
    parity claim the sf0.001 pytest makes, demonstrated at rehearsal
    scale across genuine micro-batch boundaries."""
    import os
    import shutil
    import tempfile
    import uuid

    from csdid_pyspark_spark.operators.sessionize import session_stats
    from csdid_pyspark_spark.streaming.events import sessionize_stream

    n_users = max(1000, n_events // 200)
    span_s = 30 * 86400
    base = 1_700_000_000
    ev = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id", F.lit("u")), n_users).alias("user_id"),
        F.timestamp_seconds(
            F.lit(base) + (F.col("id") * span_s / n_events).cast("bigint")
        ).alias("ts"),
    )
    work = tempfile.mkdtemp(prefix="stress_stream_")
    try:
        watch = _land_time_ordered(ev, work, n_files, base, span_s)

        stream = (
            spark.readStream.schema("event_id bigint, user_id bigint, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(watch)
        )
        name = f"ss_{uuid.uuid4().hex[:8]}"
        t0 = time.perf_counter()
        q = (
            sessionize_stream(stream, gap_minutes=30.0)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(560):
            q.stop()
            raise TimeoutError("stream rehearsal drain did not finish in 560s")
        got = (
            spark.table(name)
            .groupBy("user_id")
            .agg(F.max("n_sessions").alias("ns"), F.max("n_events").alias("ne"))
        )
        g = {r["user_id"]: (r["ns"], r["ne"]) for r in got.collect()}
        stream_sec = round(time.perf_counter() - t0, 1)
        n_batches = len(q.recentProgress)

        t0 = time.perf_counter()
        batch = session_stats(
            spark.read.parquet(watch), gap_minutes=30.0
        ).collect()
        b = {r["user_id"]: r["n_sessions"] for r in batch}
        batch_sec = round(time.perf_counter() - t0, 1)
        parity = set(g) == set(b) and all(g[u][0] == b[u] for u in b)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return {
        "metric": "stress_stream",
        "events": n_events,
        "users": n_users,
        "micro_batches": n_batches,
        "stream_sessionize_sec": stream_sec,
        "batch_sessionize_sec": batch_sec,
        "batch_parity": parity,
        **_driver_memory(),
    }


def _synth_oplog(spark, n_events: int, base: int, span_s: int):
    """CDC-shaped synthetic op log: monotone event time, 1-in-10
    inserts ('signup'), 1-in-10 delete tombstones ('error'), the rest
    updates, deterministic values."""
    n_users = max(1000, n_events // 200)
    ev = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id", F.lit("u")), n_users).alias("user_id"),
        F.timestamp_seconds(
            F.lit(base) + (F.col("id") * span_s / n_events).cast("bigint")
        ).alias("ts"),
        F.when(F.pmod("id", 10) == 0, "signup")
        .when(F.pmod("id", 10) == 9, "error")
        .otherwise("click")
        .alias("event_type"),
        (F.pmod("id", 1000) / 10.0).alias("value"),
    )
    return ev, n_users


_STREAM_EV_SCHEMA = (
    "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"
)


def run_stream_cdc(spark, n_events: int, n_files: int = 8) -> dict:
    """Streaming CDC rehearsal WITH A MID-STREAM CRASH: the op log
    lands as time-ordered files, cdc_state_stream
    (applyInPandasWithState, one latest-wins tuple per key) drains it
    one file per micro-batch through a foreachBatch sink that writes
    idempotent batch_id partitions — and the sink RAISES after writing
    batch n_files/2 (write landed, commit didn't: the at-least-once
    window). A restart from the same checkpoint replays that batch;
    exactly-once holds iff (a) the overwrite-by-batch-id sink dedups
    the replayed write and (b) the state store rolled back to the last
    committed version so n_ops counts every op EXACTLY once. Parity
    leg: every user's final (last_op, current_value, n_ops, n_deletes)
    must equal the batch latest-wins computation over the same files —
    an off-by-one-batch replay would inflate n_ops and fail it."""
    import os
    import shutil
    import tempfile

    from csdid_pyspark_spark.streaming.events import (
        cdc_state_stream,
        write_idempotent_batch,
    )

    span_s = 30 * 86400
    base = 1_700_000_000
    ev, n_users = _synth_oplog(spark, n_events, base, span_s)
    work = tempfile.mkdtemp(prefix="stress_scdc_")
    try:
        watch = _land_time_ordered(ev, work, n_files, base, span_s)
        data_dir = os.path.join(work, "state_out")
        ckpt = os.path.join(work, "ckpt")
        crash_at = n_files // 2
        crashed = {"fired": False}

        def on_batch(bdf, batch_id: int) -> None:
            write_idempotent_batch(bdf, data_dir, batch_id)
            if batch_id == crash_at and not crashed["fired"]:
                crashed["fired"] = True
                raise RuntimeError(
                    "injected crash: sink write landed, batch not committed"
                )

        def start():
            stream = (
                spark.readStream.schema(_STREAM_EV_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(watch)
            )
            return (
                cdc_state_stream(stream)
                .writeStream.foreachBatch(on_batch)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        t0 = time.perf_counter()
        q1 = start()
        try:
            q1.awaitTermination(560)
        except Exception:
            pass  # the injected crash surfaces here, by design
        assert crashed["fired"], "crash injection never reached its batch"
        q2 = start()
        if not q2.awaitTermination(560):
            q2.stop()
            raise TimeoutError("restart drain did not finish in 560s")
        stream_sec = round(time.perf_counter() - t0, 1)
        n_batches = len(q2.recentProgress)

        # latest snapshot per user: n_ops strictly grows on every
        # emission for that user, so max_by(n_ops) is the final state
        snap = spark.read.parquet(data_dir)
        final = snap.groupBy("user_id").agg(
            F.max_by(
                F.struct("last_op", "current_value", "n_ops", "n_deletes"),
                "n_ops",
            ).alias("s")
        ).select("user_id", "s.*")

        t0 = time.perf_counter()
        raw = spark.read.parquet(watch)
        op = (
            F.when(F.col("event_type") == "signup", "I")
            .when(F.col("event_type") == "error", "D")
            .otherwise("U")
        )
        truth = raw.groupBy("user_id").agg(
            F.count("*").alias("t_ops"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
                "t_deletes"
            ),
            F.max_by(F.struct(op.alias("op"), "value"), F.struct("ts", "event_id")).alias(
                "last"
            ),
        )
        bad = (
            final.join(truth, "user_id", "full_outer")
            .filter(
                F.col("t_ops").isNull()
                | F.col("n_ops").isNull()
                | (F.col("n_ops") != F.col("t_ops"))
                | (F.col("n_deletes") != F.col("t_deletes"))
                | (F.col("last_op") != F.col("last.op"))
                | (F.col("current_value") != F.col("last.value"))
            )
            .count()
        )
        batch_sec = round(time.perf_counter() - t0, 1)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return {
        "metric": "stress_stream_cdc",
        "events": n_events,
        "users": n_users,
        "micro_batches_after_restart": n_batches,
        "crash_injected": True,
        "stream_sec": stream_sec,
        "batch_check_sec": batch_sec,
        "mismatched_users": bad,
        "exactly_once_parity": bad == 0,
        **_driver_memory(),
    }


def run_stream_refresh(spark, n_events: int, n_files: int = 8) -> dict:
    """Incremental-refresh rehearsal WITH A MID-STREAM CRASH: each
    micro-batch lands in its batch_id partition then the (day x type)
    materialized view recomputes over everything accumulated; the
    callback RAISES right after batch n_files/2's data write (the
    exact failure window test_streaming pins at small scale). The
    restart replays that batch — its overwrite replaces the earlier
    attempt — and after the drain the LAST refresh must equal the
    direct batch aggregation over the input files. An append-mode sink
    would double the replayed batch's rows and fail the count parity."""
    import os
    import shutil
    import tempfile

    from csdid_pyspark_spark.streaming.events import (
        accumulated_batches,
        write_idempotent_batch,
    )

    span_s = 30 * 86400
    base = 1_700_000_000
    ev, n_users = _synth_oplog(spark, n_events, base, span_s)
    work = tempfile.mkdtemp(prefix="stress_srefresh_")
    try:
        watch = _land_time_ordered(ev, work, n_files, base, span_s)
        data_dir = os.path.join(work, "data")
        ckpt = os.path.join(work, "ckpt")
        crash_at = n_files // 2
        crashed = {"fired": False}
        out: dict = {}

        def on_batch(bdf, batch_id: int) -> None:
            write_idempotent_batch(bdf, data_dir, batch_id)
            if batch_id == crash_at and not crashed["fired"]:
                crashed["fired"] = True
                raise RuntimeError(
                    "injected crash: data written, refresh + commit skipped"
                )
            out["rows"] = (
                accumulated_batches(spark, data_dir)
                .groupBy(F.to_date("ts").alias("day"), "event_type")
                .agg(F.count("*").cast("bigint").alias("n_events"))
                .collect()
            )

        def start():
            stream = (
                spark.readStream.schema(_STREAM_EV_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(watch)
            )
            return (
                stream.writeStream.foreachBatch(on_batch)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        t0 = time.perf_counter()
        q1 = start()
        try:
            q1.awaitTermination(560)
        except Exception:
            pass  # injected crash
        assert crashed["fired"], "crash injection never reached its batch"
        q2 = start()
        if not q2.awaitTermination(560):
            q2.stop()
            raise TimeoutError("restart drain did not finish in 560s")
        stream_sec = round(time.perf_counter() - t0, 1)
        n_batches = len(q2.recentProgress)

        got = {
            (str(r["day"]), r["event_type"]): r["n_events"] for r in out["rows"]
        }
        t0 = time.perf_counter()
        want = {
            (str(r["day"]), r["event_type"]): r["n_events"]
            for r in spark.read.parquet(watch)
            .groupBy(F.to_date("ts").alias("day"), "event_type")
            .agg(F.count("*").cast("bigint").alias("n_events"))
            .collect()
        }
        batch_sec = round(time.perf_counter() - t0, 1)
        parity = got == want
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return {
        "metric": "stress_stream_refresh",
        "events": n_events,
        "users": n_users,
        "view_cells": len(got),
        "micro_batches_after_restart": n_batches,
        "crash_injected": True,
        "stream_sec": stream_sec,
        "batch_check_sec": batch_sec,
        "refresh_parity": parity,
        **_driver_memory(),
    }


def run_ivfpq(spark, n_vecs: int, dim: int = 64, n_clusters: int = 50) -> dict:
    """IVF-PQ rehearsal on a CLUSTERED synthetic corpus — the regime
    the index is built for (the sf0.01 gate corpus is near-uniform,
    IVF's worst case, and needs 6/8 probes; here neighbors share
    cells, so few probes suffice). n_vecs vectors in `dim`-d: each is
    one of ``n_clusters`` seeded hash-derived cluster centers plus
    small per-coordinate jitter, all generated executor-side (no
    driver materialization). Query = a fresh jitter of cluster 0's
    center; ground truth = exact L2 top-10 (brute force). Evidence:
    recall@10 of the 16-cell/3-probe residual-PQ pipeline, wall time,
    flat driver memory."""
    from csdid_pyspark_spark.operators.ivfpq import ivfpq_topk

    # center(c, j) and jitter derive from splitmix-style integer hashes
    # -> deterministic, executor-side, no numpy broadcast
    def center_expr(cvar: str) -> str:
        return (
            f"transform(sequence(0, {dim - 1}), j -> "
            f"cast(pmod(hash({cvar} * 1000 + j, 42), 1000) as double) / 100.0)"
        )

    # per-vector jitter MAGNITUDE varies (0..~0.5 per coord): the true
    # neighbors of a center query are the low-jitter members, so the
    # rehearsal demands the PQ codes rank WITHIN the probed cluster,
    # not just find it (constant jitter would make the top-10 an
    # unrankable tie set for any quantizer)
    emb = (
        spark.range(n_vecs)
        .select(
            F.col("id").alias("vec_id"),
            F.pmod(F.xxhash64("id", F.lit("c")), n_clusters).alias("c"),
            (F.pmod(F.xxhash64("id", F.lit("s")), 97) / 97.0 * 0.5).alias("scale"),
        )
        .select(
            "vec_id",
            F.expr(
                f"zip_with({center_expr('c')}, "
                f"transform(sequence(0, {dim - 1}), j -> "
                f"scale * cast(pmod(hash(vec_id * {dim} + j, 7), 1000) as double) / 1000.0), "
                f"(a, b) -> a + b)"
            ).alias("embedding"),
        )
    )
    q_row = (
        spark.range(1)
        .select(F.expr(center_expr("cast(0 as bigint)")).alias("q"))
        .first()
    )
    q = [float(x) for x in q_row["q"]]
    # explicit core-count partitioning: rightsizing by bytes would
    # coalesce 20k small rows onto 1 partition and serialize every
    # k-means/PQ pass of the index build onto one core
    cores = spark.sparkContext.defaultParallelism
    emb = emb.repartition(cores).persist()
    emb.count()
    qarr = F.array(*[F.lit(x) for x in q])
    d2 = F.aggregate(
        F.zip_with(F.col("embedding"), qarr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    t0 = time.perf_counter()
    exact = {
        r["vec_id"]
        for r in emb.select("vec_id", d2.alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(10)
        .collect()
    }
    exact_sec = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    # rerank pool = 2.5% of the corpus: PQ codes quantize away tiny
    # distance differences, so the vectors nearest a cluster center
    # form an ADC TIE GROUP sharing the minimal code tuple, and the
    # group grows WITH the corpus (members per planted cluster) — the
    # exact-rerank pool must exceed it or the deterministic id-tiebreak
    # crowds the true top-k out (measured at 20k: recall 0.1 with pool
    # 100, 1.0 with pool 500; at 100k: 0.6 with 500, green at 2500).
    # The pool is still a bounded exact pass — 2.5% of probed codes.
    n_cand = max(500, n_vecs // 40)
    got = {
        r["vec_id"]
        for r in ivfpq_topk(
            emb, q, n_cells=16, n_probe=3, m=16, k_codes=32, iters=3,
            n_candidates=n_cand, k_out=10,
        ).collect()
    }
    ivfpq_sec = round(time.perf_counter() - t0, 1)
    emb.unpersist()
    return {
        "metric": "stress_ivfpq",
        "vectors": n_vecs,
        "dim": dim,
        "clusters": n_clusters,
        "probe_fraction": round(3 / 16, 3),
        "rerank_pool": n_cand,
        "recall_at_10": round(len(exact & got) / 10, 2),
        "exact_bruteforce_sec": exact_sec,
        "ivfpq_total_sec": ivfpq_sec,
        **_driver_memory(),
    }


def run_lm(spark, n_docs: int, vocab: int = 5000) -> dict:
    """N-gram LM perplexity rehearsal (queries/llm_ops.py::
    quality_lm_perplexity shape at scale): train the interpolated
    bigram model on the md5-fingerprint half of n_docs synthetic
    documents (~75 tokens each -> ~75·n_docs/2 training tokens), score
    EVERY document, gate. The model is two count tables whose size is
    bounded by observed vocab (unigrams) and observed bigram types —
    independent of corpus size once the vocab saturates — so the
    doc-side scoring join is the only data-scale stage. Evidence:
    wall time for train+score, count-table sizes, kept fraction, flat
    driver memory."""
    docs = synth_docs(spark, n_docs, vocab=vocab).select("doc_id", "text")
    tk = F.split(F.lower(F.trim("text")), r"\s+")
    toks = docs.filter(F.size(tk) >= 2).select(
        "doc_id",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8", 1
        ).otherwise(0).alias("is_ref"),
        tk.alias("tokens"),
    )
    t0 = time.perf_counter()
    uni = (
        toks.filter(F.col("is_ref") == 1)
        .select(F.explode("tokens").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    tot = uni.agg(
        F.sum("c1").cast("bigint").alias("n_tok"),
        F.count("*").cast("bigint").alias("v"),
    )
    pairs = F.transform(
        F.sequence(F.lit(0), F.size("tokens") - 2),
        lambda i: F.struct(
            F.element_at("tokens", i + 1).alias("w1"),
            F.element_at("tokens", i + 2).alias("w2"),
        ),
    )
    grams = toks.select("doc_id", "is_ref", F.explode(pairs).alias("p")).select(
        "doc_id", "is_ref", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    big = (
        grams.filter(F.col("is_ref") == 1)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )
    scored = (
        grams.join(big, ["w1", "w2"], "left")
        .join(uni.select(F.col("w").alias("w1"), F.col("c1").alias("c1_w1")), "w1", "left")
        .join(uni.select(F.col("w").alias("w2"), F.col("c1").alias("c1_w2")), "w2", "left")
        .crossJoin(F.broadcast(tot))
    )
    p_big = F.when(
        F.col("c2").isNotNull() & F.col("c1_w1").isNotNull(),
        F.col("c2") / F.col("c1_w1"),
    ).otherwise(F.lit(0.0))
    p_uni = (F.coalesce(F.col("c1_w2"), F.lit(0)) + F.lit(0.5)) / (
        F.col("n_tok") + F.lit(0.5) * (F.col("v") + 1)
    )
    lp = F.log(F.lit(0.9) * p_big + F.lit(0.1) * p_uni)
    per_doc = scored.groupBy("doc_id").agg(
        F.exp(-F.avg(lp)).alias("ppl"), F.count("*").alias("n_bigrams")
    )
    summary = per_doc.agg(
        F.count("*").alias("n_scored"),
        F.round(F.min("ppl"), 2).alias("ppl_min"),
        F.round(F.expr("percentile_approx(ppl, 0.5)"), 2).alias("ppl_med"),
        F.round(F.max("ppl"), 2).alias("ppl_max"),
        F.sum(F.when(F.col("ppl") <= 2000.0, 1).otherwise(0)).alias("kept"),
    ).first()
    score_sec = round(time.perf_counter() - t0, 1)
    n_uni = uni.count()
    n_big = big.count()
    return {
        "metric": "stress_lm_perplexity",
        "docs": n_docs,
        "vocab": vocab,
        "train_unigrams": n_uni,
        "train_bigram_types": n_big,
        "scored_docs": int(summary["n_scored"]),
        "kept": int(summary["kept"]),
        "ppl_min": float(summary["ppl_min"]),
        "ppl_med": float(summary["ppl_med"]),
        "ppl_max": float(summary["ppl_max"]),
        "train_score_sec": score_sec,
        **_driver_memory(),
    }


def run_dsir(spark, n_docs: int) -> dict:
    """DSIR importance-resampling rehearsal at corpus scale: hashed-
    bigram likelihood-ratio weights for EVERY document (the
    sample_dsir_importance plan — one bigram explode, 256-bucket count
    state independent of corpus size, broadcast LR table, one per-doc
    sum shuffle, TakeOrdered top-k) over n_docs synthetic documents
    with a PLANTED target domain: docs whose source is src_0/src_1
    rewrite their tokens into a CONCENTRATED 5-token vocabulary (a
    hashed bag-of-bigrams model only separates distributions whose
    bucket mass differs — uniform synthetic vocab is the adversarial
    case where every bucket share is 1/B on both sides and all
    likelihood ratios collapse to ~0; this rehearsal's first version
    proved that by selecting at the 0.2 base rate), and the target
    slice is source = src_0. Evidence: selection wall,
    target-vocabulary share of the top-k (should be ~1.0 — src_1 docs
    share the concentrated vocabulary), flat driver memory."""
    B = 256
    K = 1000
    docs = synth_docs(spark, n_docs).select("doc_id", "source", "text")
    # plant the domain: sources src_0/src_1 rewrite tokens into a
    # disjoint vocabulary block by prefixing
    is_dom = F.col("source").isin("src_0", "src_1")
    tk = F.split(F.lower(F.trim("text")), r"\s+")
    toks = docs.select(
        "doc_id",
        (F.col("source") == "src_0").alias("is_tgt"),
        F.when(
            is_dom,
            F.transform(
                tk,
                lambda w: F.concat(
                    F.lit("dom_"), F.pmod(F.xxhash64(w), F.lit(5)).cast("string")
                ),
            ),
        ).otherwise(tk).alias("tokens"),
        is_dom.alias("is_dom"),
    )
    t0 = time.perf_counter()
    big = toks.select(
        "doc_id",
        "is_tgt",
        "is_dom",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tokens) - 1), "
                "i -> tokens[i-1] || ' ' || tokens[i])"
            )
        ).alias("bg"),
    ).select(
        "doc_id",
        "is_tgt",
        "is_dom",
        F.pmod(
            F.conv(F.substring(F.md5("bg"), 1, 4), 16, 10).cast("long"), B
        ).alias("b"),
    )
    raw_c = big.groupBy("b").agg(
        F.count("*").alias("c_r"),
        F.sum(F.when(F.col("is_tgt"), 1).otherwise(0)).alias("c_t"),
    )
    totals = raw_c.agg(F.sum("c_r").alias("n_r"), F.sum("c_t").alias("n_t"))
    lr_tbl = raw_c.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("c_t").cast("double") + 0.5) / (F.col("n_t").cast("double") + 128.0))
            - F.log((F.col("c_r").cast("double") + 0.5) / (F.col("n_r").cast("double") + 128.0))
        ).alias("lr"),
    )
    logw = (
        big.join(F.broadcast(lr_tbl), "b")
        .groupBy("doc_id", "is_dom")
        .agg(F.sum("lr").alias("logw"))
    )
    u = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|dsir"))), 1, 8), 16, 10).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    top = (
        logw.select("doc_id", "is_dom", (F.col("logw") - F.log(-F.log(u))).alias("key"))
        .orderBy(F.col("key").desc())
        .limit(K)
        .collect()
    )
    sel_sec = round(time.perf_counter() - t0, 1)
    dom_share = sum(1 for r in top if r["is_dom"]) / len(top)
    return {
        "metric": "stress_dsir",
        "n_docs": n_docs,
        "k": K,
        "sel_sec": sel_sec,
        "target_vocab_share_of_topk": round(dom_share, 4),
        **_driver_memory(),
    }


def run_etwfe(spark, n_units: int, n_periods: int = 20) -> dict:
    """ETWFE rehearsal on the staggered synthetic panel: the saturated
    pooled OLS has p = n_cohorts + (T-1) + n_treated_cells indicator
    columns — at 20 periods and 9 cohorts that is p ~ 100, i.e. a
    SINGLE aggregation with ~p^2/2 ~ 5000 sum expressions. This is the
    stress point: whole-stage codegen has per-method size limits, and
    a wide Gram either compiles into split methods or falls back to
    interpreted mode — either way it must complete and stay exact.
    Evidence: p, wall, max |tau_gt - planted|, flat driver memory."""
    from csdid_pyspark_spark.did.etwfe import etwfe_frame

    panel = synth_panel(spark, n_units, n_periods)
    t0_s = time.perf_counter()
    rows = etwfe_frame(panel, yname="y", tname="t", gname="g", idname="id").collect()
    fit_sec = round(time.perf_counter() - t0_s, 1)
    max_err = max(
        abs(float(r["att"]) - TAU * (int(r["t"]) - int(r["g"]) + 1)) for r in rows
    )
    return {
        "metric": "stress_etwfe",
        "n_units": n_units,
        "n_periods": n_periods,
        "rows": n_units * n_periods,
        "n_cells": len(rows),
        "max_att_err_vs_planted": round(max_err, 4),
        "fit_sec": fit_sec,
        **_driver_memory(),
    }


def run_lpa(spark, n_nodes: int) -> dict:
    """Label-propagation rehearsal on a planted-community graph:
    n_nodes/5 disjoint 5-cliques (10 internal edges each) with a
    single bridge edge between every 100th clique and its neighbor —
    the structure where connected components over-merge and LPA must
    not. 4 synchronous voting rounds = 4x (edge-join + vote-count +
    argmax) shuffles over ~2.2x n_nodes edges. Evidence: every
    recovered community has EXACTLY 5 members (bridges never merge),
    community count equals the planted clique count, wall per round,
    flat driver memory (only the size histogram collects)."""
    from csdid_pyspark_spark.operators.graph import label_propagation

    n_cliques = n_nodes // 5
    cl = spark.range(n_cliques).select(F.col("id").alias("c"))
    intra = cl.select(
        "c",
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, 3), a -> "
                "transform(sequence(a + 1, 4), b -> named_struct('a', a, 'b', b))))"
            )
        ).alias("p"),
    ).select(
        (F.col("c") * 5 + F.col("p.a")).alias("id_a"),
        (F.col("c") * 5 + F.col("p.b")).alias("id_b"),
    )
    bridges = cl.filter((F.col("c") % 100 == 0) & (F.col("c") < n_cliques - 1)).select(
        (F.col("c") * 5 + 4).alias("id_a"), ((F.col("c") + 1) * 5).alias("id_b")
    )
    pairs = intra.unionByName(bridges)
    t0 = time.perf_counter()
    lab = label_propagation(pairs, iters=4)
    sizes = (
        lab.groupBy("label")
        .count()
        .groupBy("count")
        .agg(F.count("*").alias("n_comm"))
        .collect()
    )
    lpa_sec = round(time.perf_counter() - t0, 1)
    lab.unpersist()
    hist = {int(r["count"]): int(r["n_comm"]) for r in sizes}
    return {
        "metric": "stress_lpa",
        "n_nodes": n_nodes,
        # bridges: multiples of 100 strictly below n_cliques - 1
        "n_edges": n_cliques * 10
        + ((n_cliques - 2) // 100 + 1 if n_cliques >= 2 else 0),
        "community_size_histogram": hist,
        "all_cliques_exact": hist == {5: n_cliques},
        "lpa_sec": lpa_sec,
        **_driver_memory(),
    }


def run_ivfpq_index(spark, n_vecs: int, dim: int = 64, n_clusters: int = 50) -> dict:
    """Persisted-index rehearsal (r8): same clustered corpus as
    run_ivfpq, but the index is TRAINED + WRITTEN once
    (write_ivfpq_index — codes partitioned by cell) and then probed
    from storage repeatedly (probe_ivfpq_index). Evidence the verdict
    asked for: build cost and probe cost reported SEPARATELY — the
    probe path reads centroid/codebook side tables plus a
    partition-pruned scan of 3/16 of the code partitions, so its
    latency is what a steady-state serving deployment pays per query,
    independent of training."""
    import shutil
    import tempfile

    from csdid_pyspark_spark.operators.ivfpq import (
        probe_ivfpq_index,
        write_ivfpq_index,
    )

    def center_expr(cvar: str) -> str:
        return (
            f"transform(sequence(0, {dim - 1}), j -> "
            f"cast(pmod(hash({cvar} * 1000 + j, 42), 1000) as double) / 100.0)"
        )

    emb = (
        spark.range(n_vecs)
        .select(
            F.col("id").alias("vec_id"),
            F.pmod(F.xxhash64("id", F.lit("c")), n_clusters).alias("c"),
            (F.pmod(F.xxhash64("id", F.lit("s")), 97) / 97.0 * 0.5).alias("scale"),
        )
        .select(
            "vec_id",
            F.expr(
                f"zip_with({center_expr('c')}, "
                f"transform(sequence(0, {dim - 1}), j -> "
                f"scale * cast(pmod(hash(vec_id * {dim} + j, 7), 1000) as double) / 1000.0), "
                f"(a, b) -> a + b)"
            ).alias("embedding"),
        )
    )
    q_row = (
        spark.range(1)
        .select(F.expr(center_expr("cast(0 as bigint)")).alias("q"))
        .first()
    )
    q = [float(x) for x in q_row["q"]]
    cores = spark.sparkContext.defaultParallelism
    emb = emb.repartition(cores).persist()
    emb.count()

    qarr = F.array(*[F.lit(x) for x in q])
    d2 = F.aggregate(
        F.zip_with(F.col("embedding"), qarr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    exact = {
        r["vec_id"]
        for r in emb.select("vec_id", d2.alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(10)
        .collect()
    }

    idx = tempfile.mkdtemp(prefix="spark_graft_stress_ivfpq_")
    try:
        t0 = time.perf_counter()
        write_ivfpq_index(emb, idx, n_cells=16, m=16, k_codes=32, iters=3)
        build_sec = round(time.perf_counter() - t0, 1)

        n_cand = max(500, n_vecs // 40)
        probe_secs = []
        got: set = set()
        for _ in range(3):
            t0 = time.perf_counter()
            got = {
                r["vec_id"]
                for r in probe_ivfpq_index(
                    spark, idx, q, emb,
                    n_probe=3, n_candidates=n_cand, k_out=10,
                ).collect()
            }
            probe_secs.append(round(time.perf_counter() - t0, 2))
    finally:
        emb.unpersist()
        shutil.rmtree(idx, ignore_errors=True)
    return {
        "metric": "stress_ivfpq_index",
        "vectors": n_vecs,
        "dim": dim,
        "clusters": n_clusters,
        "probe_fraction": round(3 / 16, 3),
        "rerank_pool": n_cand,
        "recall_at_10": round(len(exact & got) / 10, 2),
        "build_write_sec": build_sec,
        "probe_secs": probe_secs,
        "probe_median_sec": sorted(probe_secs)[1],
        **_driver_memory(),
    }


def run_ivfpq_batch(spark, n_vecs: int, n_queries: int = 200,
                    dim: int = 64, n_clusters: int = 50) -> dict:
    """Batched-probe rehearsal (r9): the same persisted index as
    run_ivfpq_index, probed by ONE probe_ivfpq_index_batch call with
    n_queries query vectors vs the single-query loop. The claim under
    test: per-query cost amortizes — Q queries cost one bounded
    fan-out scan, so batch_sec / Q must land well under the
    single-probe median. Also spot-checks per-query parity against
    the single-query path."""
    import shutil
    import tempfile

    from csdid_pyspark_spark.operators.ivfpq import (
        probe_ivfpq_index,
        probe_ivfpq_index_batch,
        write_ivfpq_index,
    )

    def center_expr(cvar: str) -> str:
        return (
            f"transform(sequence(0, {dim - 1}), j -> "
            f"cast(pmod(hash({cvar} * 1000 + j, 42), 1000) as double) / 100.0)"
        )

    emb = (
        spark.range(n_vecs)
        .select(
            F.col("id").alias("vec_id"),
            F.pmod(F.xxhash64("id", F.lit("c")), n_clusters).alias("c"),
            (F.pmod(F.xxhash64("id", F.lit("s")), 97) / 97.0 * 0.5).alias("scale"),
        )
        .select(
            "vec_id",
            F.expr(
                f"zip_with({center_expr('c')}, "
                f"transform(sequence(0, {dim - 1}), j -> "
                f"scale * cast(pmod(hash(vec_id * {dim} + j, 7), 1000) as double) / 1000.0), "
                f"(a, b) -> a + b)"
            ).alias("embedding"),
        )
    )
    cores = spark.sparkContext.defaultParallelism
    emb = emb.repartition(cores).persist()
    emb.count()
    queries = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.orderBy("vec_id").limit(n_queries).collect()
    ]

    idx = tempfile.mkdtemp(prefix="spark_graft_stress_ivfpqb_")
    try:
        t0 = time.perf_counter()
        write_ivfpq_index(emb, idx, n_cells=16, m=16, k_codes=32, iters=3)
        build_sec = round(time.perf_counter() - t0, 1)

        n_cand = max(500, n_vecs // 40)
        kw = dict(n_probe=3, n_candidates=n_cand, k_out=10)
        single_secs = []
        singles = {}
        for qid, qv in queries[:3]:
            t0 = time.perf_counter()
            singles[qid] = [
                (r["vec_id"], r["d2"])
                for r in probe_ivfpq_index(spark, idx, qv, emb, **kw).collect()
            ]
            single_secs.append(round(time.perf_counter() - t0, 2))

        t0 = time.perf_counter()
        brows = probe_ivfpq_index_batch(spark, idx, queries, emb, **kw).collect()
        batch_sec = round(time.perf_counter() - t0, 2)
        got: dict = {}
        for r in brows:
            got.setdefault(r["query_id"], []).append((r["vec_id"], r["d2"]))
        parity = all(got[qid] == singles[qid] for qid in singles)
    finally:
        emb.unpersist()
        shutil.rmtree(idx, ignore_errors=True)
    single_med = sorted(single_secs)[len(single_secs) // 2]
    return {
        "metric": "stress_ivfpq_batch",
        "vectors": n_vecs,
        "n_queries": n_queries,
        "build_write_sec": build_sec,
        "single_probe_median_sec": single_med,
        "batch_sec": batch_sec,
        "batch_per_query_sec": round(batch_sec / n_queries, 4),
        "amortization_x": round(single_med * n_queries / batch_sec, 1),
        "parity_spotcheck": parity,
        **_driver_memory(),
    }


def run_bjs(spark, n_units: int, n_periods: int = 20, with_se: bool = False) -> dict:
    """BJS imputation rehearsal on the staggered synthetic panel
    (planted dynamic effect TAU*(e+1), unit FE + covariate trend +
    cohort-shifted adoption): runs bjs_imputation_frame on
    n_units x n_periods rows. Evidence targets: max |att_e -
    TAU*(e+1)| within sampling noise, wall dominated by the TWO
    data-scale shuffles (groupBy id, treated-join id), driver memory
    flat (only the T x T lambda system and tiny aggregates come back,
    independent of n_units)."""
    from csdid_pyspark_spark.did.imputation import (
        bjs_imputation_frame,
        bjs_imputation_se_frame,
    )

    panel = synth_panel(spark, n_units, n_periods)
    fn = bjs_imputation_se_frame if with_se else bjs_imputation_frame
    t0_s = time.perf_counter()
    rows = fn(panel, yname="y", tname="t", gname="g", idname="id").collect()
    fit_sec = round(time.perf_counter() - t0_s, 1)
    max_err = max(
        abs(float(r["att"]) - TAU * (int(r["e"]) + 1)) for r in rows
    )
    extra = {}
    if with_se:
        ses = [float(r["se"]) for r in rows]
        extra = {
            "with_se": True,
            "se_min": round(min(ses), 6),
            "se_max": round(max(ses), 6),
            "all_se_positive": all(s > 0 for s in ses),
        }
    return {
        "metric": "stress_bjs",
        **extra,
        "n_units": n_units,
        "n_periods": n_periods,
        "rows": n_units * n_periods,
        "event_times": len(rows),
        "max_att_err_vs_planted": round(max_err, 4),
        "fit_sec": fit_sec,
        **_driver_memory(),
    }


def run_synth(spark, n_donors: int, n_periods: int = 20, t0: int = 14) -> dict:
    """Synthetic-control rehearsal: the DONOR POOL is the data-scale
    object (n_donors × n_periods rows, executor-side synthesis); the
    treated unit is donor 1's latent series plus tiny noise plus a
    +2.0 effect from t0, so the distributed pre-screen must surface
    donor 1 out of the whole pool before the bounded Frank-Wolfe fit.
    Evidence: weight mass on donor 1, att_post ≈ 2.0, wall dominated
    by ONE aggregation over the pool, flat driver memory."""
    from csdid_pyspark_spark.did.synth import synthetic_control

    lvl = (F.pmod(F.xxhash64("id", F.lit("l")), 1000) / 50.0).alias("lvl")
    slope = (F.pmod(F.xxhash64("id", F.lit("s")), 100) / 100.0).alias("slope")
    t = spark.range(n_periods).select(F.col("id").alias("t"))
    donors = (
        spark.range(1, n_donors + 1)
        .select("id", lvl, slope)
        .crossJoin(t)
        .select(
            "id",
            F.col("t").cast("int").alias("period"),
            (
                F.col("lvl")
                + F.col("slope") * F.col("t")
                + F.pmod(F.xxhash64("id", "t"), 100) / 1000.0
            ).alias("y"),
        )
    )
    d1 = [
        (r["period"], float(r["y"]))
        for r in donors.filter(F.col("id") == 1).orderBy("period").collect()
    ]
    treated = spark.createDataFrame(
        [
            (0, p, y + 0.003 * ((p * 7) % 3) + (2.0 if p >= t0 else 0.0))
            for p, y in d1
        ],
        "id bigint, period int, y double",
    )
    panel = donors.unionAll(treated)
    t_start = time.perf_counter()
    res = synthetic_control(panel, treated_id=0, t0=t0, donor_k=25)
    wall = round(time.perf_counter() - t_start, 1)
    return {
        "metric": "stress_synth",
        "donors": n_donors,
        "panel_rows": n_donors * n_periods + n_periods,
        "donor_k": 25,
        "w_donor1": round(res["weights"].get(1, 0.0), 4),
        "att_post": round(res["att_post"], 4),
        "att_abs_error": round(abs(res["att_post"] - 2.0), 4),
        "rmspe_ratio": round(res["rmspe_ratio"], 1),
        "fit_sec": wall,
        **_driver_memory(),
    }


def run_stats(spark, n_events: int) -> dict:
    """Distribution-statistics rehearsal: the stats_ext family (daily
    ACF, user-concentration deciles, Welch t) executed through the
    REAL query entry points over a synthetic events table written to a
    temp dir in the testdata layout — covering load_table
    normalization, the hash-arm split, and the exact-BIGINT/DECIMAL
    aggregation paths at n_events scale. A weekly intensity modulation
    (weekend days keep 2x the rows) plants a true lag-7
    autocorrelation the ACF must recover as the max over lags 1..7;
    1-in-50 users emit a single event_type so the decile-10 automation
    bucket is populated. Every query returns O(10) rows, so the driver
    must stay flat and wall ~linear in n_events."""
    import shutil
    import tempfile

    from csdid_pyspark_spark.queries import stats_ext

    tmp = tempfile.mkdtemp(prefix="stress_stats_")
    try:
        h = lambda k: F.abs(F.xxhash64("id", F.lit(k)))  # noqa: E731
        n_users = max(n_events // 50, 100)
        day = F.pmod(h(0), F.lit(364))
        uid = F.pmod(h(4), F.lit(n_users))
        events = (
            spark.range(n_events)
            # weekend (dow 0/1) keeps 8/10 rows, weekdays 4/10: an
            # exactly period-7 daily-count series
            .filter(
                F.pmod(h(1), F.lit(10))
                < F.when(F.pmod(day, F.lit(7)) < 2, 8).otherwise(4)
            )
            .select(
                F.col("id").alias("event_id"),
                F.timestamp_seconds(
                    F.lit(1735689600)
                    + day * 86400
                    + F.pmod(h(2), F.lit(86400))
                ).alias("ts"),
                uid.alias("user_id"),
                F.concat(
                    F.lit("type_"),
                    # 1-in-50 users are single-type automation
                    F.when(F.pmod(uid, F.lit(50)) == 0, F.lit(0)).otherwise(
                        F.pmod(h(3), F.lit(8))
                    ),
                ).alias("event_type"),
                (F.pmod(h(5), F.lit(100000)) / F.lit(7.0)).alias("value"),
                F.lit("{}").alias("props"),
            )
        )
        t0 = time.perf_counter()
        events.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        write_sec = round(time.perf_counter() - t0, 1)

        t0 = time.perf_counter()
        acf = {r["lag"]: r["acf"] for r in
               stats_ext.events_autocorrelation(spark, tmp).collect()}
        acf_sec = round(time.perf_counter() - t0, 1)

        t0 = time.perf_counter()
        conc = {r["decile"]: r["n_users"] for r in
                stats_ext.events_user_concentration(spark, tmp).collect()}
        conc_sec = round(time.perf_counter() - t0, 1)

        t0 = time.perf_counter()
        welch = stats_ext.events_welch_ttest(spark, tmp).collect()
        welch_sec = round(time.perf_counter() - t0, 1)

        return {
            "metric": "stress_stats",
            "events_kept": int(
                spark.read.parquet(f"{tmp}/events.parquet").count()
            ),
            "write_sec": write_sec,
            "acf_sec": acf_sec,
            "acf_lag7": acf.get(7),
            "acf_max_lag": max(acf, key=lambda k: acf[k]),
            "conc_sec": conc_sec,
            "decile10_users": int(conc.get(10, 0)),
            "welch_sec": welch_sec,
            "welch_rows": len(welch),
            "max_abs_t": max(abs(r["t_stat"]) for r in welch),
            **_driver_memory(),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_mcnnm(spark, n_units: int, n_periods: int = 10) -> dict:
    """MC-NNM rehearsal: a staggered panel with a PLANTED rank-1
    factor whose loadings differ by cohort — the DGP where plain TWFE
    imputation is biased and the completion estimator must not be.
    The unit dimension is the data-scale axis (executor-side
    synthesis); every iteration is one T x T Gram aggregation + a
    narrow factor refresh, so iteration wall should be flat in
    n_units up to scan cost and driver memory flat. Evidence:
    att_overall ~ tau (=2.0), per-iteration seconds, flat RSS."""
    from csdid_pyspark_spark.did.mcnnm import mc_nnm

    T = n_periods
    t = spark.range(1, T + 1).select(F.col("id").alias("period"))
    units = (
        spark.range(1, n_units + 1)
        .select("id", F.pmod(F.xxhash64("id", F.lit("g")), 4).alias("gsel"))
        .select(
            "id",
            F.when(F.col("gsel") < 2, 0)
            .otherwise((T - 3 + F.col("gsel") - 2).cast("int"))
            .alias("g"),
            (F.pmod(F.xxhash64("id", F.lit("a")), 1000) / 100.0).alias("fe"),
            ((F.pmod(F.xxhash64("id", F.lit("l")), 200) - 100) / 50.0).alias("lam"),
        )
    )
    panel = units.crossJoin(t).select(
        "id",
        F.col("period").cast("int").alias("period"),
        "g",
        (
            F.col("fe")
            + 0.3 * F.col("period")
            + F.col("lam") * F.sin(F.col("period").cast("double"))
            + F.when(
                (F.col("g") > 0) & (F.col("period") >= F.col("g")), 2.0
            ).otherwise(0.0)
            + F.pmod(F.xxhash64("id", "period"), 100) / 1000.0
        ).alias("y"),
    )
    t0 = time.perf_counter()
    res = mc_nnm(panel, shrink_frac=0.5, iters=12)
    wall = round(time.perf_counter() - t0, 1)
    # r9 placebo bands: ONE extra aggregation over the converged fit —
    # timed separately so the inference surcharge is visible
    t0 = time.perf_counter()
    res_b = mc_nnm(panel, shrink_frac=0.5, iters=12, placebo_b=100)
    bands_wall = round(time.perf_counter() - t0, 1)
    ses = [b[2] for b in res_b["bands"]]
    # NOTE the bands price SAMPLING noise only (placebo replication);
    # the nuclear-norm SHRINKAGE bias (controlled by shrink_frac,
    # ~4e-4 here) is deliberately not in them — at 1M units with this
    # DGP's tiny noise the bias dominates the se, so tau can sit just
    # outside a +-1e-3 band while att_abs_error stays ~4e-4. Report
    # both magnitudes instead of a misleading coverage boolean.
    halfw = max(hi - a for _, a, _, _, hi in res_b["bands"])
    return {
        "metric": "stress_mcnnm",
        "units": n_units,
        "panel_rows": n_units * T,
        "periods": T,
        "iters": 12,
        "fit_sec": wall,
        "sec_per_iter": round(wall / 13.0, 2),
        "att_overall": round(res["att_overall"], 4),
        "att_abs_error": round(abs(res["att_overall"] - 2.0), 4),
        "rank": res["rank"],
        "fit_with_bands_sec": bands_wall,
        "bands_surcharge_sec": round(bands_wall - wall, 1),
        "placebo_b": 100,
        "band_se_range": [round(min(ses), 6), round(max(ses), 6)],
        "band_max_halfwidth": round(halfw, 6),
        "shrinkage_bias_vs_band": round(
            abs(res_b["att_overall"] - 2.0) / max(halfw, 1e-12), 2
        ),
        **_driver_memory(),
    }


def run_mcnnm_cov(spark, n_units: int, n_periods: int = 10) -> dict:
    """Covariate-augmented MC-NNM rehearsal (r10): the run_mcnnm DGP
    plus a CONFOUNDED covariate — x = m_i·t + noise with a steeper
    slope for treated cohorts and theta·x in y — so the covariate-free
    fit is badly biased and the xnames fit must recover both theta
    (exact two-way-FE OLS over observed cells: ONE extra aggregation
    of within-unit-demeaned normal equations + a (T-1+p)-square driver
    solve) and att. Evidence: theta/att errors, the theta-phase
    surcharge over the plain fit, flat driver RSS."""
    from csdid_pyspark_spark.did.mcnnm import mc_nnm

    T = n_periods
    tau, theta = 2.0, 1.5
    t = spark.range(1, T + 1).select(F.col("id").alias("period"))
    units = (
        spark.range(1, n_units + 1)
        .select("id", F.pmod(F.xxhash64("id", F.lit("g")), 4).alias("gsel"))
        .select(
            "id",
            F.when(F.col("gsel") < 2, 0)
            .otherwise((T - 3 + F.col("gsel") - 2).cast("int"))
            .alias("g"),
            (F.pmod(F.xxhash64("id", F.lit("a")), 1000) / 100.0).alias("fe"),
        )
    )
    panel = (
        units.crossJoin(t)
        .withColumn(
            "slope",
            F.when(F.col("g") > 0, 3.0).otherwise(1.0)
            + F.pmod(F.xxhash64("id", F.lit("m")), 100) / 500.0,
        )
        .withColumn(
            "x",
            F.col("slope") * F.col("period")
            + F.pmod(F.xxhash64("id", "period", F.lit("x")), 100) / 100.0,
        )
        .select(
            "id",
            F.col("period").cast("int").alias("period"),
            "g",
            "x",
            (
                F.col("fe")
                + 0.3 * F.col("period")
                + F.lit(theta) * F.col("x")
                + F.when(
                    (F.col("g") > 0) & (F.col("period") >= F.col("g")),
                    tau,
                ).otherwise(0.0)
                + F.pmod(F.xxhash64("id", "period"), 100) / 1000.0
            ).alias("y"),
        )
    )
    t0 = time.perf_counter()
    plain = mc_nnm(panel, shrink_frac=0.5, iters=12)
    plain_wall = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    cov = mc_nnm(panel, shrink_frac=0.5, iters=12, xnames=("x",))
    cov_wall = round(time.perf_counter() - t0, 1)
    return {
        "metric": "stress_mcnnm_cov",
        "units": n_units,
        "panel_rows": n_units * T,
        "periods": T,
        "iters": 12,
        "plain_fit_sec": plain_wall,
        "cov_fit_sec": cov_wall,
        "theta_phase_surcharge_sec": round(cov_wall - plain_wall, 1),
        "omitted_x_att_error": round(abs(plain["att_overall"] - tau), 4),
        "cov_att_error": round(abs(cov["att_overall"] - tau), 4),
        "theta_error": round(abs(cov["theta"]["x"] - theta), 6),
        **_driver_memory(),
    }


def run_conformal_nyt(spark, n_donors: int, n_periods: int = 20) -> dict:
    """NYT-pool conformal rehearsal (r11): an all-eventually-treated
    panel whose donor pool is n_donors LATE adopters (g = 18) carrying
    a PLANTED +50 jump from their own adoption — if the not-yet-
    treated window truncation ever read a donor's treated periods the
    fits would be visibly poisoned. Two small early cohorts (g=13:
    +2.0, g=15: -1.5, 5 units each, built as noisy copies of specific
    donors' latent series) must be recovered by conformal_staggered
    (control='notyettreated') over windows truncated at 17: ONE
    groupBy(id) screen over the n_donors x T pool, bounded donor_k
    collect, driver-side inversion. Evidence: theta_hat within noise
    of the planted effects, p(theta0=0) at the block floor, CIs cover
    and sign, wall dominated by the single screen aggregation, driver
    flat."""
    from csdid_pyspark_spark.did.synth import conformal_staggered

    T = n_periods
    g_late = 18
    lvl = (F.pmod(F.xxhash64("id", F.lit("l")), 1000) / 50.0).alias("lvl")
    slope = (F.pmod(F.xxhash64("id", F.lit("s")), 100) / 100.0).alias("slope")
    t = spark.range(T).select(F.col("id").alias("t"))
    donors = (
        spark.range(1, n_donors + 1)
        .select("id", lvl, slope)
        .crossJoin(t)
        .select(
            "id",
            F.lit(g_late).alias("g"),
            F.col("t").cast("int").alias("period"),
            (
                F.col("lvl")
                + F.col("slope") * F.col("t")
                + F.pmod(F.xxhash64("id", "t"), 100) / 1000.0
                # the donors' OWN treatment: a huge jump the truncated
                # window must never see
                + F.when(F.col("t") >= g_late, 50.0).otherwise(0.0)
            ).alias("y"),
        )
    )
    brows = (
        donors.filter(F.col("id") <= 4)
        .filter(F.col("period") < g_late)
        .collect()
    )
    base = {}
    for r in brows:
        base.setdefault(int(r["id"]), {})[int(r["period"])] = float(r["y"])
    taus = {13: 2.0, 15: -1.5}
    rows = []
    uid = n_donors + 1
    for gg, tau in taus.items():
        for j in range(5):
            src = 1 + (j % 4)
            for p in range(T):
                yb = base[src].get(p)
                if yb is None:  # p >= g_late: treated unit keeps its
                    # own (untreated-donor-latent) extrapolation
                    yb = base[src][g_late - 1]
                rows.append(
                    (
                        uid,
                        int(gg),
                        p,
                        float(
                            yb
                            + 0.002 * ((p * 11 + j) % 5)
                            + (tau if p >= gg else 0.0)
                        ),
                    )
                )
            uid += 1
    treated = spark.createDataFrame(
        rows, "id bigint, g int, period int, y double"
    )
    panel = donors.unionByName(treated)
    t0 = time.perf_counter()
    res = conformal_staggered(
        panel, donor_k=25, control="notyettreated", alpha=0.1
    )
    wall = round(time.perf_counter() - t0, 1)
    c8, c10 = res["cohorts"][13], res["cohorts"][15]
    return {
        "metric": "stress_conformal_nyt",
        "donors": n_donors,
        "panel_rows": n_donors * T + 10 * T,
        "cohorts": sorted(res["cohorts"]),
        "theta13": round(c8["theta_hat"], 4),
        "theta15": round(c10["theta_hat"], 4),
        "theta_abs_err": round(
            max(abs(c8["theta_hat"] - 2.0), abs(c10["theta_hat"] + 1.5)), 4
        ),
        "p13_at_zero": c8["p_value"],
        "p15_at_zero": c10["p_value"],
        "ci13": [c8["lo"], c8["hi"]],
        "ci15": [c10["lo"], c10["hi"]],
        "covers": bool(
            c8["lo"] is not None
            and c8["lo"] <= 2.0 <= c8["hi"]
            and c10["lo"] is not None
            and c10["lo"] <= -1.5 <= c10["hi"]
        ),
        "fit_sec": wall,
        **_driver_memory(),
    }


def run_stream_psi(spark, n_events: int, n_files: int = 8) -> dict:
    """Append-mode watermarked PSI monitor rehearsal (r11): n synthetic
    events land as time-ordered files so ``maxFilesPerTrigger=1``
    drains them as GENUINE multi-batch micro-batches — the watermark
    advances BETWEEN batches, so per-window bin-count state emits and
    EVICTS incrementally (the single-batch pytest can only show the
    end state). Evidence targets: (1) every emitted window's counts
    equal the batch recomputation EXACTLY (distributed anti-join, 0
    mismatches); (2) max state rows observed across the drain stays
    near one batch's worth of open windows x types x bins — far below
    the total-windows product an unwatermarked/complete-mode monitor
    would hold; (3) wall ~linear in events."""
    import json as _json
    import shutil
    import tempfile
    import uuid

    n_types = 6
    span_s = 30 * 86400
    base = 1_700_000_000
    ev = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.concat(
            F.lit("t"), F.pmod(F.xxhash64("id", F.lit("e")), n_types)
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit("v")), 500) * 1.0).alias("value"),
        F.timestamp_seconds(
            F.lit(base) + (F.col("id") * span_s / n_events).cast("bigint")
        ).alias("ts"),
    )
    work = tempfile.mkdtemp(prefix="stress_streampsi_")
    try:
        watch = _land_time_ordered(ev, work, n_files, base, span_s)
        stream = (
            spark.readStream.schema(
                "event_id bigint, event_type string, value double, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(watch)
        )
        bin_col = F.least(F.lit(9), F.floor(F.col("value") / 50.0)).cast("int")
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(
                F.window("ts", "6 hours").alias("w"),
                "event_type",
                bin_col.alias("b"),
            )
            .count()
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
                "event_type",
                "b",
                F.col("count").alias("c"),
            )
        )
        name = f"sp_{uuid.uuid4().hex[:8]}"
        t0 = time.perf_counter()
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(560):
            q.stop()
            raise TimeoutError("streampsi drain did not finish in 560s")
        stream_sec = round(time.perf_counter() - t0, 1)
        state_rows = []
        removed = 0
        for pr in q.recentProgress:
            d = _json.loads(pr.json) if not isinstance(pr, dict) else pr
            for op in d.get("stateOperators") or []:
                state_rows.append(int(op.get("numRowsTotal", 0)))
                removed += int(op.get("numRowsRemoved", 0))
        sink = spark.table(name)
        emitted_windows = sink.select("w_start").distinct().count()
        # distributed bit-equality of every emitted window vs batch
        batch = (
            spark.read.parquet(watch)
            .groupBy(
                F.date_format(
                    F.window("ts", "6 hours").start, "yyyy-MM-dd HH:mm:ss"
                ).alias("w_start"),
                "event_type",
                bin_col.alias("b"),
            )
            .agg(F.count("*").alias("cb"))
        )
        total_windows = batch.select("w_start").distinct().count()
        wset = sink.select("w_start").distinct()
        mism = (
            sink.join(
                batch.join(wset, "w_start", "left_semi"),
                ["w_start", "event_type", "b"],
                "full",
            )
            .filter(
                F.col("c").isNull()
                | F.col("cb").isNull()
                | (F.col("c") != F.col("cb"))
            )
            .count()
        )
        assert mism == 0, f"{mism} emitted-window count mismatches vs batch"
        max_state = max(state_rows) if state_rows else -1
        unwatermarked_bound = total_windows * n_types * 10
        return {
            "metric": "stress_stream_psi_append",
            "events": n_events,
            "files": n_files,
            "batches": len(q.recentProgress),
            "stream_sec": stream_sec,
            "emitted_windows": emitted_windows,
            "total_windows": total_windows,
            "mismatches": mism,
            "max_state_rows": max_state,
            "state_rows_removed": removed,
            "unwatermarked_state_bound": unwatermarked_bound,
            "state_vs_unwatermarked": round(
                max_state / max(unwatermarked_bound, 1), 3
            ),
            **_driver_memory(),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_mcnnm_cv(spark, n_units: int, n_periods: int = 10) -> dict:
    """mc_nnm_cv pivot-hoist rehearsal (r10 verdict item 5): the CV
    loop now builds, right-sizes and persists ONE wide pivot shared by
    every candidate fit + the final fit; before, each of the |grid|+1
    mc_nnm calls re-pivoted (and re-integrity-checked) the panel.
    Evidence: total CV wall, the measured one-off pivot cost (build +
    persist + count), and the implied per-run saving |grid| x pivot
    cost that the shared frame eliminates."""
    from csdid_pyspark_spark.did.mcnnm import _mcnnm_pivot, mc_nnm_cv

    T = n_periods
    t = spark.range(1, T + 1).select(F.col("id").alias("period"))
    units = (
        spark.range(1, n_units + 1)
        .select("id", F.pmod(F.xxhash64("id", F.lit("g")), 4).alias("gsel"))
        .select(
            "id",
            F.when(F.col("gsel") < 2, 0)
            .otherwise((T - 3 + F.col("gsel") - 2).cast("int"))
            .alias("g"),
            (F.pmod(F.xxhash64("id", F.lit("a")), 1000) / 100.0).alias("fe"),
            ((F.pmod(F.xxhash64("id", F.lit("l")), 200) - 100) / 50.0).alias("lam"),
        )
    )
    panel = units.crossJoin(t).select(
        "id",
        F.col("period").cast("int").alias("period"),
        "g",
        (
            F.col("fe")
            + 0.3 * F.col("period")
            + F.col("lam") * F.sin(F.col("period").cast("double"))
            + F.when(
                (F.col("g") > 0) & (F.col("period") >= F.col("g")), 2.0
            ).otherwise(0.0)
            + F.pmod(F.xxhash64("id", "period"), 100) / 1000.0
        ).alias("y"),
    )
    # measure the pivot cost in isolation (what each candidate used to
    # pay): build + persist + materialize, then drop
    p = panel.select("id", "g", F.col("period").alias("t"), "y")
    t0 = time.perf_counter()
    _, base = _mcnnm_pivot(p, 0)
    base = base.persist()
    base.count()
    pivot_sec = round(time.perf_counter() - t0, 1)
    base.unpersist(blocking=True)

    grid = (0.1, 0.3, 0.6)
    t0 = time.perf_counter()
    res_cold = mc_nnm_cv(
        panel, shrink_fracs=grid, iters=12, warm_start=False
    )
    cv_cold_sec = round(time.perf_counter() - t0, 1)
    # r11 verdict item 4: candidate fits as a warm-started soft-impute
    # path with tol early stop; the winner's final refit stays a cold
    # full-iters fit, so att must be BIT-IDENTICAL across modes
    t0 = time.perf_counter()
    res = mc_nnm_cv(panel, shrink_fracs=grid, iters=12)
    cv_warm_sec = round(time.perf_counter() - t0, 1)
    assert res["shrink_frac"] == res_cold["shrink_frac"], (
        res["cv"], res_cold["cv"],
    )
    assert res["att"] == res_cold["att"]
    return {
        "metric": "stress_mcnnm_cv",
        "units": n_units,
        "panel_rows": n_units * T,
        "grid": list(grid),
        "fits": len(grid) + 1,
        "cv_total_sec": cv_cold_sec,
        "cv_warm_total_sec": cv_warm_sec,
        "warm_speedup": round(cv_cold_sec / max(cv_warm_sec, 1e-9), 2),
        "warm_att_bit_identical": res["att"] == res_cold["att"],
        "pivot_once_sec": pivot_sec,
        "saved_vs_per_fit_pivot_sec": round(pivot_sec * len(grid), 1),
        "winner": res["shrink_frac"],
        "att_abs_error": round(abs(res["att_overall"] - 2.0), 4),
        **_driver_memory(),
    }


def run_ife(spark, n_units: int, n_periods: int = 10, b_reps: int = 100) -> dict:
    """IFE/gsynth rehearsal (r9): same planted rank-1-factor staggered
    DGP as run_mcnnm. ife_att is one control pivot + one T x T
    covariance agg + one groupBy(id) loading pass; ife_att_bands adds
    ONE aggregation whose replicate axis is a sequence-explode over
    the wide control frame (B x n_ctrl rows map-side combined to
    B x E sums) with per-replicate loading REFITS as row-local 2x2
    solves. Evidence: att error, bands covering the planted tau,
    band-pass wall scaling linearly in B x n_ctrl, flat driver."""
    from csdid_pyspark_spark.did.ife import ife_att, ife_att_bands

    T = n_periods
    t = spark.range(1, T + 1).select(F.col("id").alias("period"))
    units = (
        spark.range(1, n_units + 1)
        .select("id", F.pmod(F.xxhash64("id", F.lit("g")), 4).alias("gsel"))
        .select(
            "id",
            F.when(F.col("gsel") < 2, 0)
            .otherwise((T - 3 + F.col("gsel") - 2).cast("int"))
            .alias("g"),
            (F.pmod(F.xxhash64("id", F.lit("a")), 1000) / 100.0).alias("fe"),
            ((F.pmod(F.xxhash64("id", F.lit("l")), 200) - 100) / 50.0).alias("lam"),
        )
    )
    panel = units.crossJoin(t).select(
        "id",
        F.col("period").cast("int").alias("period"),
        "g",
        (
            F.col("fe")
            + F.col("lam") * F.sin(F.col("period").cast("double"))
            + F.when(
                (F.col("g") > 0) & (F.col("period") >= F.col("g")), 2.0
            ).otherwise(0.0)
            + F.pmod(F.xxhash64("id", "period"), 100) / 1000.0
        ).alias("y"),
    )
    t0 = time.perf_counter()
    point = {r["e"]: r["att_ife"] for r in ife_att(panel).collect()}
    fit_sec = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    bands = ife_att_bands(panel, b_reps=b_reps).collect()
    bands_sec = round(time.perf_counter() - t0, 1)
    err = max(abs(v - 2.0) for v in point.values())
    covered = all(r["lo95"] <= 2.0 <= r["hi95"] for r in bands)
    ses = [r["se_placebo"] for r in bands]
    return {
        "metric": "stress_ife",
        "units": n_units,
        "panel_rows": n_units * T,
        "periods": T,
        "b_reps": b_reps,
        "fit_sec": fit_sec,
        "bands_sec": bands_sec,
        "att_max_abs_error": round(err, 4),
        "band_se_range": [round(min(ses), 4), round(max(ses), 4)],
        "bands_cover_tau": covered,
        **_driver_memory(),
    }


def run_fs(spark, n_rows: int, n_blocks: int | None = None) -> dict:
    """Fellegi-Sunter rehearsal: n_rows catalog records in bounded
    blocks (~40 rows each). ~5% of rows are planted duplicates that all
    share the constant field triple (0, 0, 0), so duplicate pairs agree
    on every field; independent rows agree per field with probability
    1/8, 1/30, 1/50 (type/size/token cardinalities) plus the mass the
    constant-dupe values add. The distributed reduction must shrink all
    candidate pairs to <= 8 pattern counts in one agg; EM is driver-
    side. Evidence: pattern-agg wall, EM wall ~0, posterior(111) >>
    posterior(000), flat driver memory."""
    from csdid_pyspark_spark.operators.linkage import (
        agreement_patterns,
        fellegi_sunter_em,
    )

    n_blocks = n_blocks or max(n_rows // 40, 1)
    rec = spark.range(n_rows).select(
        F.col("id"),
        F.pmod(F.xxhash64("id", F.lit("b")), n_blocks).alias("blk"),
        # ~5%% of rows are near-duplicates of a base record: they copy
        # its fields; the rest draw fields independently
        (F.pmod(F.xxhash64("id", F.lit("d")), 20) == 0).alias("dup"),
    ).select(
        "id",
        "blk",
        F.when(F.col("dup"), F.lit(0)).otherwise(F.pmod(F.xxhash64("id", F.lit("t")), 8)).alias("f_type"),
        F.when(F.col("dup"), F.lit(0)).otherwise(F.pmod(F.xxhash64("id", F.lit("s")), 30)).alias("f_size"),
        F.when(F.col("dup"), F.lit(0)).otherwise(F.pmod(F.xxhash64("id", F.lit("k")), 50)).alias("f_tok"),
    )
    t0 = time.perf_counter()
    pats = agreement_patterns(
        rec, ["blk"], "id", ["f_type", "f_size", "f_tok"], max_block=200
    ).collect()
    agg_sec = round(time.perf_counter() - t0, 1)
    counts = [((r["a0"], r["a1"], r["a2"]), int(r["n_pairs"])) for r in pats]
    t1 = time.perf_counter()
    fit = fellegi_sunter_em(counts)
    em_sec = round(time.perf_counter() - t1, 3)
    return {
        "metric": "stress_fs",
        "rows": n_rows,
        "blocks": n_blocks,
        "candidate_pairs": int(sum(n for _, n in counts)),
        "patterns": len(counts),
        "agg_sec": agg_sec,
        "em_sec": em_sec,
        "posterior_111": round(fit["posterior"].get((1, 1, 1), 0.0), 4),
        "posterior_000": round(fit["posterior"].get((0, 0, 0), 0.0), 4),
        "pi": round(fit["pi"], 4),
        **_driver_memory(),
    }


def main() -> None:
    args = sys.argv[1:]
    mode = "panel"
    if args and args[0] in (
        "panel", "docs", "clf", "tokens", "rank", "spans", "srm", "er", "cm",
        "stream", "streamcdc", "streamrefresh", "streampsi", "conformalnyt",
        "cdc", "hll", "cic",
        "conformal", "pit", "stats", "ivfpq", "ivfpqidx", "synth", "lm",
        "bjs", "dsir", "lpa", "etwfe", "bjsse", "mcnnm", "mcnnmcov", "mcnnmcv", "fs",
        "ivfpqbatch", "ife",
    ):
        mode = args.pop(0)
    spark = get_spark("csdid-pyspark-stress")
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "spans":
        minlen = "minlen" in args
        args = [a for a in args if a != "minlen"]
        n_docs = int(args[0]) if args else 100_000
        out = run_spans(spark, n_docs, minlen=minlen)
    elif mode == "srm":
        n_users = int(args[0]) if args else 10_000_000
        out = run_srm(spark, n_users)
    elif mode == "er":
        n_rows = int(args[0]) if args else 2_000_000
        out = run_er(spark, n_rows)
    elif mode == "cm":
        n_tokens = int(args[0]) if args else 50_000_000
        out = run_cm(spark, n_tokens)
    elif mode == "stream":
        n_events = int(args[0]) if args else 10_000_000
        out = run_stream(spark, n_events)
    elif mode == "streamcdc":
        n_events = int(args[0]) if args else 10_000_000
        out = run_stream_cdc(spark, n_events)
    elif mode == "streamrefresh":
        n_events = int(args[0]) if args else 10_000_000
        out = run_stream_refresh(spark, n_events)
    elif mode == "streampsi":
        n_events = int(args[0]) if args else 10_000_000
        out = run_stream_psi(spark, n_events)
    elif mode == "conformalnyt":
        n_donors = int(args[0]) if args else 1_000_000
        out = run_conformal_nyt(spark, n_donors)
    elif mode == "ivfpq":
        n_vecs = int(args[0]) if args else 100_000
        out = run_ivfpq(spark, n_vecs)
    elif mode == "ivfpqidx":
        n_vecs = int(args[0]) if args else 100_000
        out = run_ivfpq_index(spark, n_vecs)
    elif mode == "ivfpqbatch":
        n_vecs = int(args[0]) if args else 100_000
        n_q = int(args[1]) if len(args) > 1 else 200
        out = run_ivfpq_batch(spark, n_vecs, n_q)
    elif mode == "lm":
        n_docs = int(args[0]) if args else 1_000_000
        out = run_lm(spark, n_docs)
    elif mode == "synth":
        n_donors = int(args[0]) if args else 1_000_000
        out = run_synth(spark, n_donors)
    elif mode == "bjs":
        n_units = int(args[0]) if args else 200_000
        out = run_bjs(spark, n_units)
    elif mode == "dsir":
        n_docs = int(args[0]) if args else 1_000_000
        out = run_dsir(spark, n_docs)
    elif mode == "lpa":
        n_nodes = int(args[0]) if args else 2_000_000
        out = run_lpa(spark, n_nodes)
    elif mode == "etwfe":
        n_units = int(args[0]) if args else 200_000
        out = run_etwfe(spark, n_units)
    elif mode == "bjsse":
        n_units = int(args[0]) if args else 200_000
        out = run_bjs(spark, n_units, with_se=True)
    elif mode == "ife":
        n_units = int(args[0]) if args else 1_000_000
        out = run_ife(spark, n_units)
    elif mode == "mcnnmcov":
        n_units = int(args[0]) if args else 1_000_000
        out = run_mcnnm_cov(spark, n_units)
    elif mode == "mcnnmcv":
        n_units = int(args[0]) if args else 1_000_000
        out = run_mcnnm_cv(spark, n_units)
    elif mode == "mcnnm":
        n_units = int(args[0]) if args else 1_000_000
        out = run_mcnnm(spark, n_units)
    elif mode == "fs":
        n_rows = int(args[0]) if args else 2_000_000
        out = run_fs(spark, n_rows)
    elif mode == "cdc":
        n_ops = int(args[0]) if args else 50_000_000
        out = run_cdc(spark, n_ops)
    elif mode == "hll":
        n_ids = int(args[0]) if args else 100_000_000
        out = run_hll(spark, n_ids)
    elif mode == "cic":
        n_units = int(args[0]) if args else 2_000_000
        out = run_cic(spark, n_units)
    elif mode == "conformal":
        n_events = int(args[0]) if args else 50_000_000
        out = run_conformal(spark, n_events)
    elif mode == "pit":
        n_facts = int(args[0]) if args else 50_000_000
        out = run_pit(spark, n_facts)
    elif mode == "stats":
        n_events = int(args[0]) if args else 50_000_000
        out = run_stats(spark, n_events)
    elif mode == "docs":
        n_docs = int(args[0]) if args else 25_000
        out = run_docs(spark, n_docs)
    elif mode == "clf":
        n_rows = int(args[0]) if args else 10_000_000
        out = run_clf(spark, n_rows)
    elif mode == "tokens":
        n_tokens = int(args[0]) if args else 50_000_000
        out = run_tokens(spark, n_tokens)
    elif mode == "rank":
        n_rows = int(args[0]) if args else 20_000_000
        out = run_rank(spark, n_rows)
    else:
        bstrap = "bstrap" in args
        args = [a for a in args if a != "bstrap"]
        n_units = int(args[0]) if args else 200_000
        n_periods = int(args[1]) if len(args) > 1 else 20
        out = run_panel(spark, n_units, n_periods, bstrap=bstrap)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
