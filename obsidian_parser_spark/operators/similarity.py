"""Approximate-nearest-neighbor search over an embedding column.

Two paths over ``embeddings(vec_id, embedding: array<float>, label)``:

* ``brute_force_topk``  — exact top-k by inner product, the correctness
  baseline.  Embeddings are quantized to integers (round(x·10⁴)) so the
  score is an exact 64-bit integer — bit-identical across engines (the
  DuckDB oracle recomputes it) and immune to float summation-order drift.
  Plan shape: broadcast the (small) query set, JVM-side zip_with/aggregate
  dot product, per-query top-k via window — no Python, no shuffle of the
  big side.
* ``lsh_topk``          — the scale path: random-hyperplane LSH.  h
  deterministic ±1 hyperplanes (md5-parity-derived in the driver, inlined
  as literals) bucket vectors by sign pattern; candidates = same bucket;
  exact integer re-rank inside buckets.  At 10^12 rows the bucket join
  replaces the full cross product; recall is measured against the brute
  baseline in tests.

For cosine rather than MIPS semantics, L2-normalize upstream.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_QUANT = "transform({col}, x -> cast(round(cast(x AS double) * 10000) AS bigint))"
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"


def quantize(embeddings: DataFrame, col: str = "embedding") -> DataFrame:
    return embeddings.withColumn("q", F.expr(_QUANT.format(col=col)))


def brute_force_topk(
    embeddings: DataFrame,
    k: int = 10,
    n_queries: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors by quantized inner product for the first
    ``n_queries`` vec_ids: (query_id, neighbor_id, rank, score)."""
    q = quantize(embeddings, "embedding").select(F.col(id_col).alias("qid"), F.col("q").alias("qv"))
    queries = q.filter(F.col("qid") < n_queries)
    base = quantize(embeddings, "embedding").select(
        F.col(id_col).alias("neighbor_id"), F.col("q").alias("nv")
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("qid"))
        .select(
            F.col("qid").alias("query_id"),
            "neighbor_id",
            F.expr(_DOT.format(a="qv", b="nv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def hyperplanes(n_planes: int, dim: int, table: int = 0) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5 parity — no RNG, reproducible
    by any engine/driver.  ``table`` seeds independent hash tables."""
    planes = []
    for j in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane:{table}:{j}:{d}".encode()).digest()[0]
            row.append(1 if h % 2 == 0 else -1)
        planes.append(row)
    return planes


def bucket_expr(n_planes: int, dim: int, vec: str = "q", table: int = 0) -> str:
    """SQL: LSH sign-pattern bucket id (0..2^n_planes-1) of quantized vector
    ``vec`` — integer arithmetic only."""
    planes = hyperplanes(n_planes, dim, table=table)
    bits = []
    for j, row in enumerate(planes):
        arr = f"array({', '.join(str(v) + 'L' for v in row)})"
        dot = _DOT.format(a=vec, b=arr)
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(bits)


def ivf_topk(
    embeddings: DataFrame,
    k: int = 10,
    n_queries: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF (inverted-file) ANN — the second scale path besides sign-LSH.

    Coarse quantizer: the first ``n_centroids`` vectors serve as centroids
    (k-means++-style data-point seeding WITHOUT iterative refinement — no
    RNG, so any engine reproduces the cells bit-for-bit; swap in a trained
    codebook for recall in production).  Every vector is assigned to its
    exact-integer-L2-nearest centroid; a query probes its ``n_probe``
    nearest cells and exact-reranks the union of those inverted lists.

    Plan shape at 10^12 rows: assignment is a BROADCAST crossJoin with the
    tiny centroid table followed by a map-side-combinable
    ``groupBy(id).agg(min(struct(d2, cid)))`` argmin — no window shuffle of
    the big side; candidate search joins only the probed cells.
    """
    d2 = "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"
    qz = quantize(embeddings, "embedding").select(F.col(id_col).alias("vid"), "q")
    cent = qz.filter(F.col("vid") < n_centroids).select(
        F.col("vid").alias("cid"), F.col("q").alias("cq")
    )
    pairs = qz.crossJoin(F.broadcast(cent)).withColumn(
        "d2", F.expr(d2.format(a="q", b="cq"))
    )
    # base side: exact argmin per vector, map-side combinable (no window)
    cells = (
        pairs.groupBy("vid")
        .agg(
            F.min(F.struct("d2", "cid")).alias("_m"),
            F.first("q").alias("q"),
        )
        .select(F.col("vid").alias("neighbor_id"), F.col("q").alias("nv"), F.col("_m.cid").alias("cid"))
    )
    # query side: top-n_probe cells (tiny frame — window is fine here)
    wq = Window.partitionBy("vid").orderBy(F.asc("d2"), F.asc("cid"))
    qcells = (
        pairs.filter(F.col("vid") < n_queries)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select(F.col("vid").alias("query_id"), F.col("q").alias("qv"), "cid")
    )
    scored = (
        cells.join(F.broadcast(qcells), "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(_DOT.format(a="qv", b="nv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def lsh_topk(
    embeddings: DataFrame,
    dim: int,
    k: int = 10,
    n_queries: int = 10,
    n_planes: int = 6,
    n_tables: int = 1,
    id_col: str = "vec_id",
) -> DataFrame:
    """LSH-bucketed top-k: same output schema as brute_force_topk, but only
    same-bucket candidates are scored (approximate — measure recall against
    ``brute_force_topk``).  ``n_tables`` independent hash tables union their
    candidate sets — the standard recall lever (recall grows ~1-(1-p)^L).

    ``dim`` is the embedding width, passed by the caller (the plane
    literals are generated driver-side; no ``.first()`` probe in the query
    path).  A row whose vector width differs raises at execution time
    rather than silently bucketing on a truncated dot product."""
    qz = quantize(embeddings, "embedding").withColumn(
        "q",
        F.expr(
            f"CASE WHEN size(q) = {dim} THEN q ELSE "
            f"raise_error(concat('embedding dim mismatch: expected {dim}, got ', "
            f"size(q))) END"
        ),
    )
    bucket_cols = [
        F.expr(bucket_expr(n_planes, dim, "q", table=t)).alias(f"bkt{t}")
        for t in range(n_tables)
    ]
    qz = qz.select(F.col(id_col), F.col("q"), *bucket_cols)
    tabled = qz.select(
        id_col,
        "q",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), F.col(f"bkt{t}").alias("bucket"))
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select(id_col, "q", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    queries = tabled.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col("q").alias("qv"), "tbl", "bucket"
    )
    base = tabled.select(
        F.col(id_col).alias("neighbor_id"), F.col("q").alias("nv"), "tbl", "bucket"
    )
    scored = (
        base.join(F.broadcast(queries), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(_DOT.format(a="qv", b="nv")).alias("score"),
        )
        .distinct()  # candidate may collide in several tables
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Distributed Lloyd's k-means over the quantized integer embedding
    space: deterministic first-k-ids init (the IVF codebook rule), exact
    integer squared-L2 assignment (ties → smaller cid), integer
    truncated-division centroid update (sum DIV count per dimension —
    Spark DIV and DuckDB // both truncate toward zero, verified), empty
    clusters keep their previous centroid.  ``n_iter`` FIXED rounds (the
    fixed count is part of the deterministic contract, as in pagerank).
    → (vec_id, cid, d2): the final assignment with its exact distance.

    Scale shape: per round, assignment is a broadcast of the k×dim
    centroid table against the (never-shuffled) vector set + one map-side
    combinable argmin agg; the update is posexplode → groupBy(cid, pos)
    sum — k·dim result rows regardless of corpus size.  Centroids are
    lineage-cut per round like every other fixpoint.  The sum accumulator
    holds to ~10^11 rows per cluster at 10^4-quantization; past that,
    lower the quantization scale.
    """
    qz = quantize(embeddings, "embedding").select(F.col(id_col).alias("vid"), "q")
    _, assign = _lloyd(qz, k, n_iter)
    return assign.select(
        F.col("vid").alias(id_col), "cid", "d2"
    )


def _lloyd(qz: DataFrame, k: int, n_iter: int) -> tuple[DataFrame, DataFrame]:
    """The Lloyd's loop shared by kmeans_assign and pq_topk: ``qz`` is a
    (vid, q) integer-vector frame → (codebook, assignment) where the
    codebook is the centroid table the FINAL assignment was scored
    against (n_iter assigns, n_iter−1 updates — the fixed deterministic
    contract the SQL oracle unrolls)."""
    from ..checkpointing import cut_lineage

    # Materialize the quantized vectors ONCE: every round references qz
    # 1-3× (assignment scoring + the update join), so an unmaterialized
    # input re-derives its upstream projection (quantize, and for the PQ
    # path the md5-heavy structured_embeddings) ~3·n_iter times per call
    # (measured at the driver embedding table: ann_pq_structured
    # 10.2 s → ~3 s, ann_kmeans 2.4 s → ~1 s).
    qz = cut_lineage(qz)
    cent = qz.filter(F.col("vid") < k).select(
        F.col("vid").cast("long").alias("cid"), F.col("q").alias("c")
    )
    d2 = "aggregate(zip_with(q, c, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"
    assign = None
    for i in range(n_iter):
        scored = qz.crossJoin(F.broadcast(cent)).select(
            "vid", "cid", F.expr(d2).alias("d2")
        )
        assign = (
            scored.groupBy("vid")
            .agg(F.min(F.struct("d2", "cid")).alias("b"))
            .select(
                "vid",
                F.col("b.cid").alias("cid"),
                F.col("b.d2").cast("long").alias("d2"),
            )
        )
        if i == n_iter - 1:
            break
        sums = (
            qz.join(assign.select("vid", "cid"), "vid")
            .select("cid", F.posexplode("q").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", F.expr("s DIV n").alias("v")))
                    ),
                    lambda st: st["v"],
                ).alias("c_new")
            )
        )
        cent = cut_lineage(
            cent.join(sums, "cid", "left").select(
                "cid", F.coalesce("c_new", "c").alias("c")
            )
        )
    return cent, assign


def pq_topk(
    embeddings: DataFrame,
    dim: int,
    m: int = 2,
    k_cb: int = 8,
    n_iter: int = 4,
    k: int = 10,
    n_queries: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization ADC search (Jégou et al. 2011) — the memory-
    compression path FAISS-style systems take at 10^12 vectors: split
    each vector into ``m`` subspaces, train an independent ``k_cb``-entry
    codebook per subspace (the same deterministic Lloyd's contract as
    ``kmeans_assign``), ENCODE every vector as its m nearest-centroid
    code tuple, and answer queries by Asymmetric Distance Computation —
    the query's per-subspace distances to every centroid form an m×k_cb
    lookup table, so scoring a database vector costs m table lookups +
    adds instead of a dim-length dot product.  → (query_id, neighbor_id,
    rank, adc_d2): top-``k`` per query by ADC distance (ties → smaller
    neighbor_id), all exact integers.

    Scale shape: codebook training is the bounded-state Lloyd's loop
    (broadcast centroids, map-side argmin, k_cb·dim-row update);
    encoding is one broadcast-scored argmin per subspace; query scoring
    joins the code table against the TINY broadcast LUT (n_queries ×
    k_cb rows per subspace) — the vectors themselves are never read
    again at query time, which is the entire point of PQ.  Codes are m
    small ints per vector: at 10^12 vectors × m=16 that is ~16 TB of
    codes vs 512 TB of float32 vectors."""
    qz = quantize(embeddings, "embedding").select(F.col(id_col).alias("vid"), "q")
    codes, luts = _pq_codebooks(qz, dim, m, k_cb, n_iter, n_queries, "pq_topk")
    scored = codes
    for s, lut in enumerate(luts):
        on = [f"code{s}"] if s == 0 else ["qid", f"code{s}"]
        scored = scored.join(F.broadcast(lut), on)
    adc = sum(F.col(f"d{s}") for s in range(m))  # noqa: B905 — column sum
    scored = scored.filter(F.col("vid") != F.col("qid")).select(
        F.col("qid").alias("query_id"),
        F.col("vid").alias("neighbor_id"),
        adc.cast("long").alias("adc_d2"),
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"),
                "adc_d2")
    )


def _pq_codebooks(
    qz: DataFrame,
    dim: int,
    m: int,
    k_cb: int,
    n_iter: int,
    n_queries: int,
    caller: str,
) -> tuple[DataFrame, list[DataFrame]]:
    """The PQ encode/LUT contract shared by ``pq_topk`` and
    ``ivfpq_topk`` (mirrors the oracle side's ``_pq_parts``): per
    subspace slice, train a codebook with ``_lloyd``, encode every
    vector as code{s} = its nearest-centroid id, and build the query
    LUT (qid, code{s}, d{s}) against the FINAL codebook.  Returns
    (codes, luts): codes = (vid, code0..code{m-1}), luts = one small
    broadcastable frame per subspace."""
    if dim % m != 0:
        raise ValueError(f"{caller}: dim {dim} not divisible by m {m}")
    from ..checkpointing import cut_lineage

    # one materialization of the full quantized table; the m subspace
    # slices (each re-read by every Lloyd round via _lloyd's own cut) then
    # slice stored blocks instead of re-deriving the embedding projection
    qz = cut_lineage(qz)
    sub_dim = dim // m
    d2q = (
        "aggregate(zip_with(qv, c, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, v) -> acc + v)"
    )
    codes = None
    luts = []
    for s in range(m):
        sub = qz.select("vid", F.slice("q", s * sub_dim + 1, sub_dim).alias("q"))
        cent, assign = _lloyd(sub, k_cb, n_iter)
        c = assign.select("vid", F.col("cid").alias(f"code{s}"))
        codes = c if codes is None else codes.join(c, "vid")
        qs = sub.filter(F.col("vid") < n_queries).select(
            F.col("vid").alias("qid"), F.col("q").alias("qv")
        )
        luts.append(
            qs.crossJoin(F.broadcast(cent)).select(
                "qid",
                F.col("cid").alias(f"code{s}"),
                F.expr(d2q).cast("long").alias(f"d{s}"),
            )
        )
    return codes, luts


def brute_force_topk_l2(
    embeddings: DataFrame,
    k: int = 10,
    n_queries: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors by quantized SQUARED-L2 distance for the
    first ``n_queries`` vec_ids: (query_id, neighbor_id, rank, d2) —
    the ground truth the PQ/ADC family is measured against (PQ
    approximates L2, not inner product, so it gets its own exact
    baseline)."""
    q = quantize(embeddings, "embedding").select(
        F.col(id_col).alias("qid"), F.col("q").alias("qv")
    )
    queries = q.filter(F.col("qid") < n_queries)
    base = quantize(embeddings, "embedding").select(
        F.col(id_col).alias("neighbor_id"), F.col("q").alias("nv")
    )
    d2 = (
        "aggregate(zip_with(qv, nv, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, v) -> acc + v)"
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("qid"))
        .select(
            F.col("qid").alias("query_id"),
            "neighbor_id",
            F.expr(d2).cast("long").alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "d2")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    dim: int,
    m: int = 2,
    k_cb: int = 8,
    n_iter: int = 4,
    n_centroids: int = 8,
    n_probe: int = 2,
    k: int = 10,
    n_queries: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ — the production composition (the FAISS IVFPQ index shape):
    the IVF coarse quantizer PRUNES (each query probes its ``n_probe``
    nearest cells, so only those inverted lists are candidates) and the
    PQ code table SCORES (ADC lookups + adds — the raw vectors are never
    read at query time).  → (query_id, neighbor_id, rank, adc_d2),
    top-``k`` per query among probed-cell candidates.

    This differs from ``ivf_topk`` (exact re-rank inside probed cells —
    reads vectors) and ``pq_topk`` (ADC over ALL vectors — no pruning):
    IVF-PQ does both, which is what makes 10^12-vector search tractable —
    candidate count drops by ~n_centroids/n_probe AND each candidate
    costs m lookups instead of a dim-length dot product.  Codebooks here
    quantize the full vectors, not IVF residuals (residual PQ is the
    refinement; the plumbing is identical).

    Scale shape: cell assignment and PQ encoding are the bounded-state
    broadcast-argmin passes of ``ivf_topk``/``pq_topk``; query scoring
    joins the candidate (cell-pruned) code rows against the broadcast
    LUT — every join is key-partitioned or broadcast, nothing touches
    the vector column after indexing."""
    qz = quantize(embeddings, "embedding").select(F.col(id_col).alias("vid"), "q")
    d2c = "aggregate(zip_with(q, cq, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"
    cent = qz.filter(F.col("vid") < n_centroids).select(
        F.col("vid").alias("cid"), F.col("q").alias("cq")
    )
    pairs = qz.crossJoin(F.broadcast(cent)).withColumn("d2", F.expr(d2c))
    cells = (
        pairs.groupBy("vid")
        .agg(F.min(F.struct("d2", "cid")).alias("_m"))
        .select("vid", F.col("_m.cid").alias("cid"))
    )
    wq = Window.partitionBy("vid").orderBy(F.asc("d2"), F.asc("cid"))
    qcells = (
        pairs.filter(F.col("vid") < n_queries)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select(F.col("vid").alias("qid"), "cid")
    )
    codes, luts = _pq_codebooks(qz, dim, m, k_cb, n_iter, n_queries, "ivfpq_topk")
    cand = (
        cells.join(F.broadcast(qcells), "cid")
        .filter(F.col("vid") != F.col("qid"))
        .select("qid", "vid")
        .join(codes, "vid")
    )
    scored = cand
    for s, lut in enumerate(luts):
        scored = scored.join(F.broadcast(lut), ["qid", f"code{s}"])
    adc = sum(F.col(f"d{s}") for s in range(m))
    scored = scored.select(
        F.col("qid").alias("query_id"),
        F.col("vid").alias("neighbor_id"),
        adc.cast("long").alias("adc_d2"),
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.col("rank").cast("long").alias("rank"), "adc_d2")
    )


# ---------------------------------------------------------------------------
# Structured (product-clusterable) embeddings — the PQ certification corpus
# ---------------------------------------------------------------------------


def structured_centroid_tables(
    dim: int, m: int = 4, n_clusters: int = 8
) -> list[list[list[int]]]:
    """CENT[s][c][d] ∈ 0..255, md5-derived — deterministic, engine-neutral
    (inlined as literals on both the Spark and DuckDB sides)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    return [
        [
            [
                hashlib.md5(f"pqcent:{s}:{c}:{d}".encode()).digest()[0]
                for d in range(sub)
            ]
            for c in range(n_clusters)
        ]
        for s in range(m)
    ]


def structured_cluster_expr(s: int, n_clusters: int = 8, id_col: str = "vec_id") -> str:
    """SQL (Spark + DuckDB-compatible idea; Spark form here): the subspace-s
    cluster id of a vector.  ``(vec_id + H(vec_id div 8, s)) mod n`` — the
    ``vec_id mod n`` term guarantees the first ``n`` ids cover every
    cluster (so Lloyd's first-k init never starts blind to a cluster),
    while the md5 term decorrelates the per-subspace ids across blocks of
    ``n`` (two vectors are near iff they agree in EVERY subspace — the
    product structure PQ exploits)."""
    h = (
        f"CAST(conv(substr(md5(concat('pqh:{s}:',"
        f" CAST({id_col} div 8 AS STRING))), 1, 4), 16, 10) AS BIGINT)"
    )
    return f"pmod({id_col} + {h}, {n_clusters})"


def structured_embeddings(
    embeddings: DataFrame,
    dim: int,
    m: int = 4,
    n_clusters: int = 8,
    cent_scale: int = 100,
    noise_div: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Derive a PRODUCT-STRUCTURED embedding table from the (near-random)
    driver embeddings: per subspace s, vector v sits at md5-derived
    integer centroid CENT[s][cs(v)] (scaled ×``cent_scale``) plus a small
    noise term (the original quantized coordinates ÷``noise_div``).  Real
    corpus embeddings are compressible — hierarchical topic structure is
    WHY product quantization works (Jégou et al. 2011 §2); near-random
    vectors are the one regime where no 2^(m·log2 k) code can preserve
    neighborhoods, so certifying PQ recall requires data with structure
    to find.  All arithmetic is exact integers scaled back to doubles
    that survive the engine's round(x·10⁴) quantization bit-for-bit,
    and the DuckDB oracle re-derives the same vectors independently.

    → (vec_id, embedding: array<double>): same schema contract as the
    driver table, so every ANN operator runs on it unchanged.

    Scale shape: one narrow projection — zip_with over the vector column
    with a broadcast-literal centroid row, no shuffle, no Python."""
    cents = structured_centroid_tables(dim, m, n_clusters)
    sub = dim // m

    def arr2(table: list[list[int]]) -> str:
        rows = ", ".join(
            "array(" + ", ".join(f"{v}L" for v in row) + ")" for row in table
        )
        return f"array({rows})"

    row_parts = []
    for s in range(m):
        cs = structured_cluster_expr(s, n_clusters, id_col)
        row_parts.append(f"element_at({arr2(cents[s])}, CAST({cs} AS INT) + 1)")
    centrow = "concat(" + ", ".join(row_parts) + ")"
    sv = (
        f"zip_with({_QUANT.format(col='embedding')}, {centrow},"
        f" (x, c) -> c * {cent_scale} + (x div {noise_div}))"
    )
    out = f"transform({sv}, v -> CAST(v AS DOUBLE) / 10000.0)"
    return embeddings.select(F.col(id_col), F.expr(out).alias("embedding"))
