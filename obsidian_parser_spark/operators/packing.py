"""Token-budget sequence packing for training pipelines.

Pre-training consumes fixed-length sequences; feeding one short document
per sequence wastes most of the context window, so pipelines PACK chunks
back-to-back into a token budget (the standard "sequence packing" /
"document packing" step).  This operator assigns every chunk a
``(shard, pack_id)`` deterministically:

* ``shard`` — md5 hash bucket of the document id (same reproducible
  bucket family as ``sampling.hash_bucket``, salt ``'pack'``).  Packing
  runs WITHIN a shard, so the window partition is bounded by the shard
  size — never a global ordered window, which would serialize 10^12 rows
  through one partition (the 100 TB kill switch for naive cumsum
  packing).  Shards map 1:1 onto output training files.  ``n_shards``
  defaults to AUTO: sized from the measured corpus token volume so each
  shard carries ≈ ``budget_tokens × target_packs_per_shard`` tokens — a
  bounded single-reducer sort at ANY corpus size (a fixed shard count
  would grow linearly with the corpus and re-create the kill switch at
  1/n_shards scale).
* ``pack_id`` — greedy in-order fill: chunks are ordered by
  (doc_id, chunk_id) inside the shard and a running token total assigns
  ``floor(preceding_tokens / budget)``.  Chunks are never split; a pack
  may overrun the budget by at most one chunk (the standard approximation
  — exact bin packing needs sequential state and destroys determinism
  and parallelism).  Document chunks stay adjacent and ordered, so
  packs preserve intra-document continuity.

Every output is a pure function of (doc_id, chunk_id, chunk token count)
— reproducible in any engine (DuckDB oracle: ``ts_pack``), stable across
cluster sizes and re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket


def auto_shard_count(
    chunks: DataFrame,
    budget_tokens: int,
    text_col: str = "chunk_text",
    target_packs_per_shard: int = 4096,
) -> int:
    """Shard count sized from the MEASURED corpus token volume: each shard
    targets ``budget_tokens × target_packs_per_shard`` tokens, floored at
    the cluster's default parallelism (never fewer shards than cores).
    One map-side-combined scalar aggregation — the honest price of not
    guessing; at 10^12 chunks a guessed constant is off by orders of
    magnitude in one direction or the other."""
    total = chunks.select(
        F.sum(_ws_token_count(text_col)).alias("t")
    ).first()["t"] or 0
    target = budget_tokens * target_packs_per_shard
    floor = chunks.sparkSession.sparkContext.defaultParallelism
    return max(floor, -(-total // target), 1)


def _ws_token_count(text_col: str):
    return F.size(
        F.expr(f"filter(split({text_col}, '\\\\s+'), t -> t != '')")
    ).cast("long")


def pack_chunks(
    chunks: DataFrame,
    budget_tokens: int,
    n_shards: int | None = None,
    id_col: str = "doc_id",
    chunk_ord_col: str = "chunk_id",
    text_col: str = "chunk_text",
    group_cols: tuple[str, ...] = (),
    target_packs_per_shard: int = 4096,
    max_shard_tokens: int | None = None,
) -> DataFrame:
    """chunks(doc_id, chunk_id, chunk_text) → + (n_tokens, shard, pack_id).

    ``n_tokens`` is the whitespace token count of the chunk (consistent
    with ``textstats.token_counts``' ws family).  One shuffle on the
    window partition (``group_cols`` + shard); everything else is codegen.

    ``n_shards=None`` (default) auto-sizes via ``auto_shard_count`` —
    bounded shards at any corpus size.  Pass an explicit count only for
    reproducibility pins (oracles, fixed output-file layouts); with an
    explicit count set ``max_shard_tokens`` to get a LOUD failure instead
    of a silent one-reducer mega-sort when the corpus outgrows the pin
    (the same fail-don't-degrade contract as ``minhash_lsh_pairs``'
    ``max_bucket_size``, which can filter because dropping a candidate
    bucket is lossy-but-sound — packing cannot drop data, so it raises).

    ``group_cols``: extra partition columns the packs must not straddle —
    e.g. ``('split',)`` so a training sequence never mixes train and
    valid/test chunks (a pack is a model input; crossing the split
    boundary would leak eval data into training sequences)."""
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    n_tok = _ws_token_count(text_col)
    if n_shards is None:
        n_shards = auto_shard_count(
            chunks, budget_tokens, text_col, target_packs_per_shard
        )
    if max_shard_tokens is not None:
        worst = (
            chunks.groupBy(hash_bucket(id_col, buckets=n_shards, salt="pack"))
            .agg(F.sum(n_tok).alias("t"))
            .agg(F.max("t").alias("m"))
            .first()["m"]
        )
        if worst is not None and worst > max_shard_tokens:
            raise ValueError(
                f"largest pack shard holds {worst} tokens > max_shard_tokens="
                f"{max_shard_tokens} with n_shards={n_shards}; raise n_shards "
                "(or drop it to auto-size) — a shard is a single-reducer sort"
            )
    w = (
        Window.partitionBy(*group_cols, "shard")
        .orderBy(F.col(id_col).asc(), F.col(chunk_ord_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        chunks.withColumn(
            "shard", hash_bucket(id_col, buckets=n_shards, salt="pack")
        )
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "_prior", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        # integral DIV, not floor(double /): a double quotient loses
        # integer precision past 2^53 cumulative tokens and could disagree
        # with the oracle's exact `//` — same reasoning as the HITS DIV
        .withColumn("pack_id", F.expr(f"_prior DIV {budget_tokens}"))
        .drop("_prior")
    )


def pack_stats(packed: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Per-pack audit: (*group_cols, shard, pack_id, n_chunks, n_docs,
    pack_tokens) — the fill-efficiency view (mean pack_tokens / budget =
    packing efficiency).  Pass the SAME ``group_cols`` the chunks were
    packed with (pack_id is only unique per (group, shard) — grouping
    without them would merge e.g. the train and test packs that share a
    (shard, pack_id))."""
    return packed.groupBy(*group_cols, "shard", "pack_id").agg(
        F.count("*").alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
    )
