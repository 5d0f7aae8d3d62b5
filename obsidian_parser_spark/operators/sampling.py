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
