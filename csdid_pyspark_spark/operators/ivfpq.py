"""IVF-PQ: inverted-file coarse quantizer + residual product
quantization — the composition that actually runs billion-scale ANN
(the Faiss ``IVFxx,PQyy`` index family, Jégou-Douze-Schmid 2011,
"Product quantization for nearest neighbor search").

The two halves already exist separately in this engine (IVF probing in
operators/mllib_lsh.py, PQ/ADC in operators/pq.py); composing them is
what changes the asymptotics: a probe reads ``n_probe / n_cells`` of
the corpus (partition pruning on the cell id at real scale), and
within the probed cells the scan touches M-byte codes instead of
float vectors. Residual encoding — PQ codes quantize
``vec - centroid(cell)``, not the raw vector — is the part that makes
the composition beat either half alone: residuals are centered near
zero, so the same codebook budget spends its resolution where the
probed vectors actually live.

Query path (mirrors Faiss's ADC flow):
1. rank cells by centroid distance driver-side (k·p floats), keep
   ``n_probe``;
2. per probed cell, the query's OWN residual (q - centroid) yields a
   per-cell M×K ADC table — all probed tables union into one
   broadcast (cell, m, code, d2) frame;
3. codes of vectors in probed cells join that broadcast and sum per
   id: approximate distances without touching a float vector;
4. the top ``n_candidates`` ids are exact-reranked against the
   original vectors (broadcast semi-join; bounded rows regardless of
   corpus size).

Everything is deterministic on fixed data: coarse init = k lowest-id
vectors, decimal-exact centroid means (partial-sum-order independent),
fixed iteration counts, min_by (distance, id) tiebreaks — so the
query output pins a VALUES golden, and recall vs the exact baseline
is pytest-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csdid_pyspark_spark.operators.pq import (
    assign_codes_arrow,
    encode_pq,
    train_pq,
)


def _assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    id_col: str,
    with_vec: bool = False,
) -> DataFrame:
    """Cell assignment = the PQ Arrow kernel in its degenerate m=1
    form (one "subspace" spanning the whole vector): same per-dim
    IEEE distance fold, same low-id argmin tiebreak — bit-identical
    cells to the old posexplode + interpreted zip_with/aggregate +
    min_by pipeline, with zero shuffles (narrow map). ``with_vec``
    passes the vector through in its input dtype, so consumers
    (centroid update, residual encoding) need no corpus self-join."""
    cb = {0: dict(enumerate(centroids))}
    out = assign_codes_arrow(df, cb, vec_col, id_col, with_sub=with_vec)
    cols = [F.col(id_col), F.col("code").alias("cell")]
    if with_vec:
        cols.append(F.col("sub").alias(vec_col))
    return out.select(*cols)


def coarse_kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 4,
    _with_vec: bool = False,
) -> tuple[DataFrame, list[list[float]]]:
    """Deterministic Lloyd's coarse quantizer: returns ((id, cell)
    assignments, centroid list). Assignment runs through the Arrow
    NumPy kernel (operators/pq.py::assign_codes_arrow — guide §4.2),
    update keeps the one k·p-cell shuffle with DECIMAL-exact centroid
    means so the centroids — and therefore every downstream code — are
    independent of partial-aggregation order (required for the pinned
    golden). ``_with_vec=True`` adds the pass-through vector column to
    the returned assignment (internal; callers that need residuals
    avoid re-joining the corpus)."""
    init = df.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [[float(x) for x in r[0]] for r in init]
    vec = df.select(id_col, vec_col)

    for _ in range(iters):
        asg = _assign_cells(vec, centroids, vec_col, id_col, with_vec=True)
        upd = (
            asg.select("cell", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(38,12)")).cast("double")
                    / F.count("*")
                ).alias("m")
            )
            .collect()
        )
        new: dict[int, dict[int, float]] = {}
        for r in upd:
            new.setdefault(r["cell"], {})[r["dim"]] = r["m"]
        centroids = [
            [new[c][d] for d in sorted(new[c])] if c in new else centroids[c]
            for c in range(k)
        ]
    # final assignment against the POST-update centroids: the stored
    # cell membership and the query-time probe ranking (which sees the
    # returned centroids) must agree, or a vector can live in a cell
    # whose centroid is no longer its nearest — silently costing recall
    # at small n_probe.
    return _assign_cells(vec, centroids, vec_col, id_col, with_vec=_with_vec), centroids


def build_ivfpq_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 8,
    m: int = 16,
    k_codes: int = 32,
    iters: int = 3,
):
    """Train coarse + residual codebooks and encode the corpus.
    Returns (codes, assigned, centroids, codebook) where codes is the
    (id, m, code) frame and assigned the (id, cell) frame — at real
    scale both are written out partitioned/clustered by cell so a
    probe is a partition-pruned scan."""
    assigned_v, centroids = coarse_kmeans(
        df, vec_col, id_col, k=n_cells, iters=iters, _with_vec=True
    )
    assigned = assigned_v.select(id_col, "cell")
    cen_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)],
            "cell int, cen array<double>",
        )
    )
    # the assignment kernel passes the vector through, so the residual
    # projection is a broadcast join on `cell` only — the old corpus
    # self-join on the id (one full shuffle of the vectors) is gone
    resid = assigned_v.join(cen_df, "cell").select(
        id_col,
        "cell",
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col("cen"),
            lambda a, b: a - b,
        ).alias("resid"),
    )
    # the residual frame feeds EVERY train_pq iteration (eager collect
    # per iteration) plus the final encode — uncached, its lineage
    # (coarse kernel + residual projection) re-executes once per
    # consumer (guide §2.4). Pinned here, attached to the returned
    # codes frame for the standard release_cache lifecycle.
    from csdid_pyspark_spark.cache import attach_cache

    resid = resid.persist()
    codebook = train_pq(
        resid, vec_col="resid", id_col=id_col, m=m, k=k_codes, iters=iters
    )
    codes = encode_pq(resid, codebook, vec_col="resid", id_col=id_col)
    codes = attach_cache(codes, resid)
    return codes, assigned, centroids, codebook


def _rank_probes(centroids: dict[int, list[float]], q: list[float], n_probe: int) -> list[int]:
    """Driver-side probe selection: the n_probe cells nearest to the
    query by centroid L2 (k·p floats of work, ties -> lower cell)."""
    dists = sorted(
        (sum((a - b) * (a - b) for a, b in zip(cen, q)), i)
        for i, cen in centroids.items()
    )
    return [i for _, i in dists[:n_probe]]


def _adc_table(
    spark,
    q: list[float],
    centroids: dict[int, list[float]],
    codebook: dict[int, dict[int, list[float]]],
    probes: list[int],
):
    """Per-probed-cell ADC tables from the query's cell residuals —
    one broadcast (cell, m, code, d2) frame of n_probe·M·K rows."""
    m = len(codebook)
    d_sub = len(codebook[0][0])
    rows = []
    for cell in probes:
        qr = [a - b for a, b in zip(q, centroids[cell])]
        for j in range(m):
            qs = qr[j * d_sub : (j + 1) * d_sub]
            for c, cen in codebook[j].items():
                d2 = sum((a - b) * (a - b) for a, b in zip(qs, cen))
                rows.append((cell, j, c, float(d2)))
    return F.broadcast(
        spark.createDataFrame(rows, "cell int, m int, code int, d2 double")
    )


def _adc_candidates(cell_codes: DataFrame, dtable, id_col: str, n_candidates: int) -> DataFrame:
    """ADC scoring of (id, m, code, cell) rows against the broadcast
    distance table: approximate distances without touching a float
    vector; decimal-exact sums keep the ranking partial-order
    independent. Returns the bounded candidate id frame."""
    return (
        cell_codes.join(dtable, ["cell", "m", "code"])
        .groupBy(id_col)
        .agg(
            F.sum(F.col("d2").cast("decimal(38,12)")).cast("double").alias("adc_d2")
        )
        .orderBy("adc_d2", id_col)
        .limit(n_candidates)
        .select(id_col)
    )


def _exact_rerank(
    df: DataFrame, cand: DataFrame, q: list[float], vec_col: str, id_col: str, k_out: int
) -> DataFrame:
    """Exact L2 re-rank of the bounded candidate set against the
    original vectors (broadcast semi-join; rows bounded regardless of
    corpus size). Deterministic (d2, id) order."""
    qarr = F.array(*[F.lit(x) for x in q])
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"), qarr, lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        df.join(F.broadcast(cand), id_col, "semi")
        .select(id_col, F.round(d2, 6).alias("d2"))
        .orderBy("d2", id_col)
        .limit(k_out)
    )


def ivfpq_topk(
    df: DataFrame,
    query: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 8,
    n_probe: int = 3,
    m: int = 16,
    k_codes: int = 32,
    iters: int = 3,
    n_candidates: int = 50,
    k_out: int = 10,
) -> DataFrame:
    """End-to-end IVF-PQ search: probe → per-cell residual ADC →
    exact re-rank. Returns (id, d2) exact squared-L2 of the final
    top-k, deterministic (d2, id) order."""
    codes, assigned, centroids, codebook = build_ivfpq_index(
        df, vec_col, id_col, n_cells=n_cells, m=m, k_codes=k_codes, iters=iters
    )
    q = [float(x) for x in query]
    cen_map = dict(enumerate(centroids))
    # 1. probe selection: k centroid distances, driver-side
    probes = _rank_probes(cen_map, q, n_probe)
    # 2. per-probed-cell ADC tables from the query's cell residual
    dtable = _adc_table(df.sparkSession, q, cen_map, codebook, probes)
    # 3. ADC scoring over probed cells only — at real scale the codes
    # live PARTITIONED BY cell (write_ivfpq_index below), so the cell
    # restriction is a partition-pruned scan, not a join filter
    cand = _adc_candidates(
        codes.join(assigned.select(id_col, "cell"), id_col),
        dtable,
        id_col,
        n_candidates,
    )
    # 4. exact re-rank of the bounded candidate set; carry the pinned
    # residual intermediate onto the returned frame so the caller's
    # release_cache after its final action reclaims it
    from csdid_pyspark_spark.cache import carry_cache

    return carry_cache(
        _exact_rerank(df, cand, q, vec_col, id_col, k_out), codes
    )


def write_ivfpq_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 8,
    m: int = 16,
    k_codes: int = 32,
    iters: int = 3,
) -> None:
    """Train and PERSIST an IVF-PQ index at ``path``: the (id, m,
    code, cell) code table written PARTITIONED BY cell — so a probe is
    a partition-pruned scan reading ``n_probe / n_cells`` of the index
    — plus the tiny centroid and codebook side tables. This is the
    Faiss on-disk contract re-expressed as a parquet layout: build
    cost (k-means + PQ training + encode, the expensive part) is paid
    ONCE; every query afterwards touches only probed partitions of
    M-byte codes. At 100 TB the code table is ~M bytes/vector — three
    orders of magnitude under the float vectors — and the cell
    partitioning keeps each probe's scan bounded by cell size, not
    corpus size."""
    codes, assigned, centroids, codebook = build_ivfpq_index(
        df, vec_col, id_col, n_cells=n_cells, m=m, k_codes=k_codes, iters=iters
    )
    spark = df.sparkSession
    (
        codes.join(assigned, id_col)
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/codes")
    )
    # the codes write was the last consumer of the pinned residual
    # intermediate — release it before the tiny side-table writes
    from csdid_pyspark_spark.cache import release_cache

    release_cache(codes)
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, cen array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [
            (j, c, [float(x) for x in cen])
            for j, d in codebook.items()
            for c, cen in d.items()
        ],
        "m int, code int, cen array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebook")


def probe_ivfpq_index(
    spark,
    path: str,
    query: list[float],
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe: int = 3,
    n_candidates: int = 50,
    k_out: int = 10,
) -> DataFrame:
    """Search a PERSISTED IVF-PQ index (written by
    :func:`write_ivfpq_index`) — the steady-state query path, with the
    build cost amortized away. The centroid/codebook side tables (k·p
    + M·K·d_sub floats) are collected driver-side; the code scan is
    restricted to the probed cells via a filter on the PARTITION
    column, so the physical plan prunes to ``n_probe`` of ``n_cells``
    partitions (PartitionFilters in the scan — pytest-asserted), and
    the exact re-rank touches only the bounded candidate set of
    ``vectors``. Same result contract as :func:`ivfpq_topk` run with
    identical parameters."""
    centroids = {
        int(r["cell"]): [float(x) for x in r["cen"]]
        for r in spark.read.parquet(f"{path}/centroids").collect()
    }
    codebook: dict[int, dict[int, list[float]]] = {}
    for r in spark.read.parquet(f"{path}/codebook").collect():
        codebook.setdefault(int(r["m"]), {})[int(r["code"])] = [
            float(x) for x in r["cen"]
        ]
    q = [float(x) for x in query]
    probes = _rank_probes(centroids, q, n_probe)
    dtable = _adc_table(spark, q, centroids, codebook, probes)
    cell_codes = spark.read.parquet(f"{path}/codes").filter(
        F.col("cell").isin([int(p) for p in probes])
    )
    cand = _adc_candidates(cell_codes, dtable, id_col, n_candidates)
    return _exact_rerank(vectors, cand, q, vec_col, id_col, k_out)


def probe_ivfpq_index_batch(
    spark,
    path: str,
    queries: list[tuple],
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe: int = 3,
    n_candidates: int = 50,
    k_out: int = 10,
) -> DataFrame:
    """Batched search of a PERSISTED IVF-PQ index — the production
    retrieval pass, where thousands of queries amortize one scan.
    ``queries``: list of (query_id, vector).

    Per-query work that stays driver-side is unchanged in SEMANTICS
    (probe ranking, ADC tables) but fully vectorized: probe ranking is
    one (Q, n_cells) distance matrix + stable argsort, the ADC tables
    one batched norm-expansion matmul, and the result ships to the JVM
    zero-copy through Arrow as ONE broadcast (qid, cell,
    d2arr array<double>) frame — Q·n_probe ROWS (each row carries the
    flattened M x K table; the payload is Q·n_probe·M·K doubles
    either way — keep it broadcast-sized; chunk the query list
    upstream if Q grows past ~10^4). The code scan reads the UNION of
    probed cells ONCE (still a partition-pruned scan on the ``cell``
    partition column), and the cell join fans each code row out to
    exactly the queries probing its cell, extracting the single
    (m, code) ADC element inside the join projection. Candidate selection is a per-query top-k
    via a qid-partitioned window (many partitions — never the banned
    single-reducer sort): each qid group sorts the query's ADC rows
    (~corpus x n_probe/n_cells — the same rows the single-probe
    TakeOrdered heaps over, here one sort per query, spill-safe and
    AQE-splittable); the exact re-rank window then runs over the
    BOUNDED Q·n_candidates rows. So Q queries cost ONE bounded-fan-out
    scan instead of Q scans — the per-query latency amortizes toward
    the marginal join cost.

    Per-query results are IDENTICAL to :func:`probe_ivfpq_index` with
    the same parameters (pytest-asserted parity). Returns
    (query_id, ``id_col``, d2) ordered (query_id, d2, id)."""
    from pyspark.sql import Window

    if not queries:
        raise ValueError("probe_ivfpq_index_batch: empty query list")
    centroids = {
        int(r["cell"]): [float(x) for x in r["cen"]]
        for r in spark.read.parquet(f"{path}/centroids").collect()
    }
    codebook: dict[int, dict[int, list[float]]] = {}
    for r in spark.read.parquet(f"{path}/codebook").collect():
        codebook.setdefault(int(r["m"]), {})[int(r["code"])] = [
            float(x) for x in r["cen"]
        ]
    m = len(codebook)
    d_sub = len(codebook[0][0])
    # ---- vectorized ADC construction (numpy + Arrow) ----------------
    # A Python triple loop building the Q·n_probe·M·K tuples was the
    # driver bottleneck well before the broadcast limit: at Q = 10^4,
    # n_probe=3, M=8, K=256 that is 6·10^7 tuple allocations. All of it
    # is dense array algebra: probe ranking is a (Q, n_cells) distance
    # matrix with a stable argsort (ties -> lower cell id, same rule as
    # _rank_probes), and the per-subspace code distances are one
    # batched norm-expansion matmul. The result goes to Spark through
    # ONE Arrow table, zero-copy.
    import numpy as np

    n_probe = min(n_probe, len(centroids))
    cent_ids = np.asarray(sorted(centroids), dtype=np.int64)
    cmat = np.asarray([centroids[int(c)] for c in cent_ids])
    K = len(codebook[0])
    cb = np.asarray(
        [[codebook[j][c] for c in range(K)] for j in range(m)]
    )  # (m, K, d_sub)
    qids = np.asarray([int(qid) for qid, _ in queries], dtype=np.int64)
    qmat = np.asarray([[float(x) for x in qv] for _, qv in queries])
    Q = len(qids)
    qrows = [(int(qid), [float(x) for x in qv]) for qid, qv in queries]
    # probe ranking: stable argsort over cells sorted ascending == the
    # (dist, cell) tie-break of _rank_probes
    d2qc = ((qmat[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
    idx = np.argsort(d2qc, axis=1, kind="stable")[:, :n_probe]
    probes = cent_ids[idx]  # (Q, n_probe)
    all_cells = set(int(c) for c in np.unique(probes))
    # residuals per (query, probe), split into subspaces
    rsub = (qmat[:, None, :] - cmat[idx]).reshape(Q * n_probe, m, d_sub)
    # ||r - c||^2 = ||r||^2 - 2 r·c + ||c||^2 — the cross term is ONE
    # broadcast-batched matmul (x, m, 1, d_sub) @ (m, d_sub, K); the
    # remaining terms are added IN PLACE so the only full-size
    # allocation is the result itself. (A direct squared-difference
    # einsum over the 5-D view was ~60x slower; the expansion's
    # cancellation error is O(eps·scale), irrelevant for ranking.)
    rc = (rsub[:, :, None, :] @ cb.transpose(0, 2, 1)[None])[:, :, 0, :]
    rc *= -2.0
    rc += (rsub * rsub).sum(axis=2)[:, :, None]
    rc += (cb * cb).sum(axis=2)[None]
    np.maximum(rc, 0.0, out=rc)  # (Q·n_probe, m, K)
    # ONE broadcast row per (query, probed cell) carrying the whole
    # (m x K) ADC table as a flat array<double> — Q·n_probe rows, not
    # Q·n_probe·M·K: the join below extracts the single (m, code)
    # element in its projection, so no per-output-row array copy
    # survives whole-stage codegen. Shipped zero-copy via Arrow.
    import pyarrow as pa

    # pa.ListArray offsets are int32: past 2^31 − 1 flat elements the
    # arange would wrap silently and ship CORRUPT ADC tables — refuse
    # loudly and point at the documented chunking instead
    if Q * n_probe * m * K > 2**31 - 1:
        raise ValueError(
            "probe_ivfpq_index_batch: Q*n_probe*m*K = "
            f"{Q * n_probe * m * K} exceeds the int32 Arrow list-offset "
            "range — chunk the query list upstream (the broadcast-size "
            "guidance above caps Q near 10^4 anyway)"
        )
    vals = pa.array(rc.reshape(-1))
    offsets = pa.array(
        np.arange(0, (Q * n_probe + 1) * m * K, m * K, dtype=np.int32)
    )
    atab = pa.table(
        {
            "qid": pa.array(np.repeat(qids, n_probe)),
            "cell": pa.array(probes.reshape(-1).astype(np.int32)),
            "d2arr": pa.ListArray.from_arrays(offsets, vals),
        }
    )
    try:
        dt_raw = spark.createDataFrame(atab)
    except Exception:  # vanilla sessions without Arrow-table support
        dt_raw = spark.createDataFrame(
            atab.to_pandas(), "qid bigint, cell int, d2arr array<double>"
        )
    dtable = F.broadcast(
        dt_raw.select(
            F.col("qid").cast("bigint").alias("qid"),
            F.col("cell").cast("int").alias("cell"),
            F.col("d2arr").cast("array<double>").alias("d2arr"),
        )
    )
    cell_codes = spark.read.parquet(f"{path}/codes").filter(
        F.col("cell").isin([int(c) for c in sorted(all_cells)])
    )
    w_cand = Window.partitionBy("qid").orderBy("adc_d2", id_col)
    cand = (
        cell_codes.join(dtable, ["cell"])
        .select(
            "qid",
            id_col,
            F.element_at(
                "d2arr",
                (F.col("m") * F.lit(K) + F.col("code") + F.lit(1)).cast(
                    "int"
                ),
            ).alias("d2"),
        )
        .groupBy("qid", id_col)
        .agg(
            F.sum(F.col("d2").cast("decimal(38,12)"))
            .cast("double")
            .alias("adc_d2")
        )
        .withColumn("rn", F.row_number().over(w_cand))
        .filter(F.col("rn") <= n_candidates)
        .select("qid", id_col)
    )
    qdf = F.broadcast(
        spark.createDataFrame(qrows, "qid bigint, qvec array<double>")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col("qvec"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w_out = Window.partitionBy("qid").orderBy("d2", id_col)
    return (
        vectors.join(F.broadcast(cand), id_col)
        .join(qdf, "qid")
        .select("qid", id_col, F.round(d2, 6).alias("d2"))
        .withColumn("rn", F.row_number().over(w_out))
        .filter(F.col("rn") <= k_out)
        .select(F.col("qid").alias("query_id"), id_col, "d2")
        .orderBy("query_id", "d2", id_col)
    )
