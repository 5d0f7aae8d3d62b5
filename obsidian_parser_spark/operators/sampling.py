"""Deterministic sampling / dataset splitting for training pipelines.

Hash-based, not RNG-based: a row's split is a pure function of its id, so
it is stable under re-runs, partitioning changes, and cluster size — the
property a 10^12-document train/val/test split actually needs (Spark's
``randomSplit`` is partition-order-dependent).  The hash is md5 (first 4
hex nibbles → 0..65535 → bucket 0..99), reproducible in any engine, so the
split itself is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: str = "doc_id", buckets: int = 100, salt: str = ""):
    """0..buckets-1 bucket from the first 16 bits of
    md5(cast(col AS string) || salt); pure JVM expression.

    ``salt`` decorrelates independent uses: the train/valid/test split uses
    the unsalted bucket, SAMPLING uses salt='sample' — with one shared
    bucket, any sample of pct ≤ train_pct would land ENTIRELY inside the
    train split (valid/test silently empty after sample→split)."""
    h16 = F.conv(
        F.substring(F.md5(F.concat(F.col(col).cast("string"), F.lit(salt))), 1, 4),
        16,
        10,
    )
    return F.pmod(h16.cast("long"), F.lit(buckets))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    valid_pct: int = 10,
) -> DataFrame:
    """Add a ``split`` column ∈ {train, valid, test} by deterministic hash
    bucket: [0, train_pct) → train, [train_pct, train_pct+valid_pct) →
    valid, rest → test."""
    b = hash_bucket(id_col)
    return df.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + valid_pct, F.lit("valid"))
        .otherwise(F.lit("test")),
    )


def hash_sample(
    df: DataFrame, pct: int, id_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic ~pct% sample (same rows every run, any
    cluster); salted independently of ``hash_split`` so sampling composes
    with splitting instead of aliasing into the train bucket range."""
    return df.filter(hash_bucket(id_col, salt=salt) < pct)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    pcts: dict[str, int],
    default_pct: int = 100,
    id_col: str = "doc_id",
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sample: keep ~``pcts[stratum]``% of each
    stratum (``default_pct`` for unlisted strata) by the same md5 hash
    bucket FAMILY as ``hash_split`` but with an independent salt — e.g.
    downsample a dominant language while keeping rare ones whole.  A pure
    filter (no shuffle, no RNG): the kept set is a function of
    (id, stratum) only, stable across runs and cluster sizes.  The salt is
    load-bearing TWICE: sharing the split's bucket would put every sampled
    row (pct ≤ train_pct) inside the train range, leaving valid/test empty
    after a sample→split composition; and sharing ``hash_sample``'s salt
    ('sample') would alias the two samplers — any stratum pct ≤ the sample
    pct would keep exactly the rows the sample kept (nested min-pct
    semantics, not independent sampling).  Hence the distinct default
    'strata'; override via ``salt`` to decorrelate repeated uses."""
    pct = F.lit(default_pct)
    for k in sorted(pcts):
        pct = F.when(F.col(strata_col) == k, F.lit(pcts[k])).otherwise(pct)
    return df.filter(hash_bucket(id_col, salt=salt) < pct)


def domain_mixture(
    docs: DataFrame,
    rate_bp: int = 2500,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    domain_col: str | None = None,
) -> DataFrame:
    """Uniform domain mixing under a corpus token budget — the data-mixing
    pass a training pipeline runs to flatten domain skew: the corpus-wide
    budget is ``total_tokens * rate_bp / 10000`` tokens, split EQUALLY
    across domains, and each domain keeps documents in deterministic
    md5(doc_id) order until its budget is exhausted.  Over-represented
    domains are downsampled hard; small domains keep everything.

    → (doc_id, domain, n_tokens, cum_tokens, budget_tokens, selected);
    ``cum_tokens`` is the inclusive running token total in selection
    order and ``selected = cum_tokens <= budget_tokens``.  All arithmetic
    is integer ``div`` — bit-deterministic across engines.

    ``domain_col=None`` derives the domain from the id's first path
    segment ('root' when the id has no '/').

    Scale shape — the per-domain prefix sum is the hazard (a single
    window per domain serializes a mega-domain through one task).  It is
    computed skew-free in two phases over deterministic md5-PREFIX
    buckets (first byte of the same md5 that orders the scan, so bucket
    ranges are contiguous in selection order and uniformly sized):
    (1) a window per (domain, bucket) — 256-way parallel within every
    domain; (2) per-(domain, bucket) totals (≤ 256 × n_domains rows)
    cumulated by a window over that TINY frame and broadcast-joined back
    as offsets.  No spark_partition_id / repartitionByRange dependence —
    the bucket is a pure row function, so the plan is deterministic under
    AQE and re-execution.  Budget scalars ride a 1-row broadcast
    cross join."""
    from pyspark.sql import Window

    key = F.md5(F.col(id_col).cast("string"))
    domain = (
        F.col(domain_col)
        if domain_col is not None
        else F.when(
            F.col(id_col).cast("string").contains("/"),
            F.split_part(F.col(id_col).cast("string"), F.lit("/"), F.lit(1)),
        ).otherwise(F.lit("root"))
    )
    d = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        domain.alias("domain"),
        key.alias("_key"),
        F.conv(F.substring(key, 1, 2), 16, 10).cast("int").alias("_bkt"),
    )
    # three consumers read this narrow frame (budget scalars, the in-bucket
    # window, the offsets rollup): persist so an expensive upstream
    # ``tokens_col`` projection (typically a full-text tokenize) runs one
    # pass instead of three.  Lazy persist, not an eager checkpoint — the
    # frame is consumed within single actions, where the block manager
    # dedups concurrent partition computation; an eager cut was measured
    # to cost more in barrier latency than the saved passes at sf0.1.
    d = d.persist()

    scalars = d.agg(
        F.sum("n_tokens").cast("long").alias("_total"),
        F.countDistinct("domain").cast("long").alias("_nd"),
    ).select(
        F.expr(f"((_total * {int(rate_bp)}) div 10000) div _nd")
        .cast("long")
        .alias("budget_tokens")
    )

    w_in = (
        Window.partitionBy("domain", "_bkt")
        .orderBy("_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("_cum_in", F.sum("n_tokens").over(w_in).cast("long"))

    w_off = (
        Window.partitionBy("domain")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        d.groupBy("domain", "_bkt")
        .agg(F.sum("n_tokens").cast("long").alias("_bkt_tokens"))
        .withColumn(
            "_offset",
            F.coalesce(F.sum("_bkt_tokens").over(w_off), F.lit(0)).cast("long"),
        )
        .select("domain", "_bkt", "_offset")
    )

    out = (
        d.join(F.broadcast(offsets), ["domain", "_bkt"])
        .crossJoin(F.broadcast(scalars))
        .withColumn(
            "cum_tokens", (F.col("_cum_in") + F.col("_offset")).cast("long")
        )
    )
    return out.select(
        "doc_id",
        "domain",
        "n_tokens",
        "cum_tokens",
        "budget_tokens",
        (F.col("cum_tokens") <= F.col("budget_tokens")).alias("selected"),
    )
