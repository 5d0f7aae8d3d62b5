"""Document deduplication for training-data pipelines.

Four detectors over a ``documents(doc_id, text)`` table, scale-shaped:

* exact          — hash-groupBy on the full text; one shuffle, map-side
                   partial agg, no UDF.
* ngram_jaccard  — shingle explode → self-join on shingle → pairwise
                   Jaccard ≥ τ.  The shingle join is the classic inverted-
                   index candidate generator; frequent-shingle skew is
                   handled by dropping shingles above a document-frequency
                   cap (stop-shingles carry no discriminative signal) —
                   without the cap one hot shingle produces a quadratic
                   join blowup at 100 TB.
* minhash_lsh    — k MinHash signatures banded into b buckets; candidate
                   pairs = same (band, key).  Hashes are md5-based and
                   lexicographic-min over hex strings, so an independent
                   engine (the DuckDB oracle) reproduces them bit-for-bit;
                   no RNG, no engine-specific hash.
* simhash        — 64-bit SimHash over md5 token bits (Arrow-vectorized
                   pandas stage), near-dups = hamming distance ≤ r via
                   4-band blocking (pigeonhole: r ≤ 3 ⇒ one identical
                   16-bit band).

All detectors emit deterministic, order-insensitive pair/group frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------- exact


def exact_duplicates(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Rows that are exact-text duplicates of an earlier (smaller-id) row:
    (doc_id, keeper).  groupBy(md5) keeps the shuffle payload tiny."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col).asc())
    return (
        documents.select(id_col, text_col)
        .withColumn("keeper", F.first(id_col).over(w))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select(F.col(id_col).alias("doc_id"), "keeper")
    )


# ---------------------------------------------------------------- shingles

_TOKENS = "filter(split(lower({text}), '\\\\s+'), t -> t != '')"


def shingle_expr(text: str = "text", n: int = 3) -> str:
    """Word n-gram shingles as a SQL expression (array<string>); whole text
    as a single shingle when shorter than n tokens.

    NOTE for large texts: inline use re-evaluates the tokenizer inside the
    per-shingle lambda (no CSE across lambda boundaries ⇒ O(tokens²) per
    doc).  ``distinct_shingles`` below materializes the token array first —
    use that for anything bigger than oracle-scale inputs."""
    t = _TOKENS.format(text=text)
    return f"""
    CASE WHEN size({t}) >= {n}
         THEN transform(sequence(1, size({t}) - {n - 1}),
                        i -> array_join(slice({t}, i, {n}), ' '))
         ELSE array(array_join({t}, ' '))
    END
    """


def _shingles_from_tokens(tokens_col: str, n: int) -> str:
    return f"""
    CASE WHEN size({tokens_col}) >= {n}
         THEN transform(sequence(1, size({tokens_col}) - {n - 1}),
                        i -> array_join(slice({tokens_col}, i, {n}), ' '))
         ELSE array(array_join({tokens_col}, ' '))
    END
    """


def distinct_shingles(
    documents: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, shingle) distinct pairs — tokens materialized ONCE as a
    column so shingle construction is linear in tokens."""
    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.expr(_TOKENS.format(text=text_col)).alias("_t"),
    )
    return toks.select(
        "doc_id", F.explode(F.expr(_shingles_from_tokens("_t", n))).alias("shingle")
    ).distinct()


def ngram_jaccard_pairs(
    documents: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    max_shingle_df: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(a, b, jaccard) for distinct-shingle Jaccard ≥ threshold, a < b."""
    sh = distinct_shingles(documents, n=n, id_col=id_col, text_col=text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    # stop-shingle cap: bound the per-shingle fanout (skew guard)
    df_cap = sh.groupBy("shingle").agg(F.count("*").alias("df")).filter(
        F.col("df") <= max_shingle_df
    )
    sh = sh.join(df_cap.select("shingle"), "shingle")
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------- minhash-lsh


def minhash_signatures(
    documents: DataFrame,
    k: int = 12,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """(doc_id, h0..h{k-1}): h_i = min over shingles of hash(i ':' shingle).

    hash_fn='md5'  — hex-string min; reproducible in any engine with md5
                     (the DuckDB oracle recomputes it bit-for-bit).
    hash_fn='xxh'  — Spark-native xxhash64 (no per-call allocation, ~5×
                     faster); same algorithm, engine-local hash family —
                     the scale default when no cross-engine oracle needed.

    Plan shape (the 100 TB one): explode → k min aggregations in ONE
    groupBy.  NO distinct and NO shingle shuffle: min() is insensitive to
    duplicate shingles, and map-side partial aggregation reduces each input
    partition to (docs × k) rows before the (tiny) exchange — a boilerplate
    shingle shared by millions of docs never concentrates anywhere."""
    toks = documents.select(
        F.col(id_col).alias("doc_id"),
        F.expr(_TOKENS.format(text=text_col)).alias("_t"),
    )
    sh = toks.select(
        "doc_id", F.explode(F.expr(_shingles_from_tokens("_t", n))).alias("shingle")
    )
    if hash_fn == "md5":
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
            for i in range(k)
        ]
    elif hash_fn == "xxh":
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).cast("string").alias(f"h{i}")
            for i in range(k)
        ]
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn}")
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    documents: DataFrame,
    k: int = 12,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int = 200,
    hash_fn: str = "md5",
) -> DataFrame:
    """Candidate near-duplicate pairs (a, b) sharing ≥ 1 LSH band.

    rows-per-band r = k/bands; band key = md5 of '|'-joined minhashes.
    Buckets larger than ``max_bucket_size`` are skipped — a bucket holding
    thousands of docs is non-discriminative boilerplate and would make the
    self-join quadratic (the 100 TB kill switch); real pipelines route such
    buckets to exact-hash grouping instead.  Downstream pipelines verify
    candidates with ``ngram_jaccard_pairs`` on the candidate subset.
    """
    assert k % bands == 0
    r = k // bands
    sig = minhash_signatures(
        documents, k=k, n=n, id_col=id_col, text_col=text_col, hash_fn=hash_fn
    )
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"h{b * r + j}") for j in range(r)])).alias(
            f"b{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols).select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"b{b}").alias("key"))
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # banded is tiny (bands rows/doc) but expensive to derive — persist AND
    # eagerly materialize it: a self-join on a lazily-cached frame computes
    # the upstream pipeline once per side (the cache populates too late).
    # Bucket-size cap via window count: one shuffle on (band, key) — the
    # same partitioning the join needs — and no bucket-list broadcast
    # (which would not fit the driver at 10^12 docs).
    banded = banded.persist()
    banded.count()
    banded_kept = banded.withColumn(
        "_n", F.count("*").over(Window.partitionBy("band", "key"))
    ).filter(F.col("_n") <= max_bucket_size)
    a = banded_kept.select(F.col("doc_id").alias("a"), "band", "key")
    b = banded_kept.select(F.col("doc_id").alias("b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


# ---------------------------------------------------------------- simhash


def simhash_near_dups(
    documents: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(a, b, hamming) pairs with SimHash hamming distance ≤ max_hamming.

    SimHash: 64-bit, bit j set iff the token-weighted sum of (±1 per token
    md5 bit j) is positive.  Computed in one Arrow-vectorized pandas stage
    (hashlib md5 is C); candidate blocking splits the 64 bits into 4 bands
    of 16 — pigeonhole guarantees distance ≤ 3 pairs share a full band, so
    the join only compares same-band candidates (no quadratic pass).
    """
    import hashlib
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def sim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_sh = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = (text or "").lower().split()
                acc = np.zeros(64, dtype=np.int64)
                for t in toks:
                    bits = np.unpackbits(
                        np.frombuffer(hashlib.md5(t.encode()).digest()[:8], dtype=np.uint8)
                    )
                    acc += bits.astype(np.int64) * 2 - 1
                sh_bytes = np.packbits((acc > 0).astype(np.uint8)).tobytes()
                out_ids.append(doc_id)
                out_sh.append(int.from_bytes(sh_bytes, "big", signed=True))
            yield pd.DataFrame({"doc_id": out_ids, "simhash": out_sh})

    sig = documents.select(id_col, text_col).mapInPandas(
        sim, schema=f"doc_id {dict(documents.dtypes)[id_col]}, simhash long"
    )
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), b -> struct(b AS band, "
                "shiftright(simhash, b * 16) & 65535 AS key))"
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = bands.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), "band", "key")
    b = bands.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), "band", "key")
    pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.expr("ha ^ hb")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs
