"""Structured-Streaming forms of the engine's pipelines.

The reference is batch-only (SURVEY.md §2.5: streaming absent); these are
engine extensions for continuously-arriving vaults/events:

* ``incremental_graph`` — new span-document files appear in a directory;
  each micro-batch is tokenized + resolved against the alias dictionary —
  either a static one the caller provides, or (default) a per-epoch
  MAINTAINED dictionary upserted inside the batch so notes arriving
  mid-stream become resolvable targets from the next epoch on — and
  written to the edges table via ``foreachBatch``,
  partitioned by epoch with dynamic partition overwrite: a crash between
  the write and the checkpoint commit replays the epoch, and the replay
  REPLACES its own partition instead of appending a duplicate — idempotent
  per epoch, hence exactly-once end-to-end.  This mirrors the
  lineage-manifest resume story at the micro-batch granularity: the
  checkpoint directory is the lineage.
* ``windowed_event_counts`` — watermarked tumbling-window aggregation over
  an event stream (late data dropped past the watermark).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.linking import (
    alias_candidates,
    dedup_alias_dict,
    resolve_mentions,
)
from ..operators.tokenize import mentions_from_notes, tokenize_documents
from ..sources.schema import DOCUMENTS_SCHEMA, EVENTS_SCHEMA


def incremental_graph(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    alias_dict: DataFrame | None = None,
    include_mdlinks: bool = True,
    use_aliases: bool = True,
    max_files_per_trigger: int = 8,
):
    """Start an availableNow stream: span-document parquet files in
    ``input_dir`` → edges appended under ``out_dir/edges``.

    Returns the StreamingQuery (caller awaits termination).

    Dictionary modes:

    * ``alias_dict`` given — STATIC broadcast side; a note arriving
      mid-stream cannot become a link TARGET until the dict is rebuilt
      and the query restarted.
    * ``alias_dict=None`` (default) — per-epoch MAINTAINED dictionary:
      each micro-batch appends its notes' candidate rows (alias, kind,
      canonical, n_segments) under ``out_dir/alias_dict`` partitioned by
      epoch (dynamic overwrite ⇒ a replayed epoch replaces its own
      candidates — idempotent), then resolves against the first-wins
      dedup of ALL accumulated candidates.  A note arriving in epoch N is
      resolvable from epoch N+1 on, without restart.  The first-wins rule
      (fewest segments, then lexicographic id) is a pure function of the
      candidate SET, so the dictionary is arrival-order-independent —
      identical to a batch rebuild over the same notes.  Already-emitted
      epochs are NOT rewritten when the dict grows (their dangling
      mentions stay dangling until a batch reconcile; same trade as the
      reference's build-once Index).
    """
    edges_path = os.path.join(out_dir, "edges")
    dict_path = os.path.join(out_dir, "alias_dict")
    checkpoint = os.path.join(out_dir, "_checkpoint")

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        # An empty micro-batch (e.g. the first trigger before any file
        # lands) must be a no-op: writing an EMPTY dynamic-overwrite would
        # create dict_path with zero data files, and the immediate
        # read-back would die with UNABLE_TO_INFER_SCHEMA.  Nothing to
        # resolve and nothing to upsert — skipping is also replay-safe
        # (a replayed empty epoch skips again).
        if batch_df.isEmpty():
            return
        notes = tokenize_documents(batch_df, include_mdlinks=include_mdlinks)
        if alias_dict is None:
            # 1. upsert this epoch's candidates (idempotent per epoch)
            (
                alias_candidates(notes, use_aliases=use_aliases)
                .withColumn("epoch", F.lit(epoch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch")
                .parquet(dict_path)
            )
            # 2. resolve against the accumulated dictionary (reads the
            # just-written epoch too — the batch self-resolves)
            d = dedup_alias_dict(spark.read.parquet(dict_path))
        else:
            d = alias_dict
        mentions = mentions_from_notes(notes)
        edges, _ = resolve_mentions(mentions, d, use_aliases=use_aliases)
        # idempotent per-epoch replace (Iceberg overwritePartitions
        # semantics): a replayed epoch rewrites its own partition
        (
            edges.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(edges_path)
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "ev_counts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    checkpoint: str | None = None,
    output_path: str | None = None,
    max_files_per_trigger: int | None = None,
):
    """Watermarked tumbling-window counts per event type, memory sink
    (smoke/demo; swap the sink for kafka/parquet in production).

    With ``output_path`` set the sink is a parquet FILE sink (recoverable:
    the aggregation state AND watermark survive restarts via ``checkpoint``,
    so a restarted query DROPS events older than the persisted watermark
    instead of re-aggregating already-emitted windows).  The memory sink
    (default) is demo-only and cannot recover from a checkpoint."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        # one file per micro-batch: lets a replay STAGE late data behind
        # the watermark (the late-data gate) instead of co-arriving with
        # it in batch 0, where the initial watermark (0) drops nothing
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
    )
    writer = agg.writeStream.outputMode("append")
    if output_path is not None:
        if checkpoint is None:
            raise ValueError("a file sink needs an explicit checkpoint dir")
        writer = writer.format("parquet").option("path", output_path).option(
            "checkpointLocation", checkpoint
        )
    else:
        writer = writer.format("memory").queryName(query_name)
        if checkpoint is not None:
            writer = writer.option("checkpointLocation", checkpoint)
    return writer.trigger(availableNow=True).start()


def dedup_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication: keep the FIRST arrival of each
    content hash, dropping later copies that arrive within the watermark
    horizon of the first (``dropDuplicatesWithinWatermark`` — state for a
    hash is evictable once the watermark passes its first-seen event time,
    so state size is bounded by the dedup horizon, not the stream length —
    the property that makes streaming dedup viable on an unbounded
    corpus).  Copies arriving later than the horizon are treated as new —
    the standard at-scale trade; route survivors through the batch
    ``dedup.exact_duplicates`` for a full-history sweep.

    Input must carry an event-time column ``ts_col``; the content hash is
    computed JVM-side (md5, matching the batch detector's grouping key)."""
    return (
        stream.withColumn("_h", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_h"])
        .drop("_h")
    )


def attribution_join_stream(
    stream: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    horizon: str = "6 hours",
    ts_col: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream EVENT-TIME INTERVAL JOIN — the attribution query
    (which click does a purchase follow?) as a real Structured Streaming
    two-sided join: both sides carry a watermark and the join condition
    bounds the event-time gap, so the join-state store is EVICTABLE —
    a left row can be dropped once the watermark passes
    ``l_ts + horizon`` and a right row once it passes ``r_ts``.  Without
    the time bound the state would grow with the stream; with it, state
    is bounded by horizon × arrival rate regardless of stream length —
    the property that makes stream-stream joins viable on an unbounded
    event feed.

    → (l_id, r_id, user_id, lag_us): every ``right_type`` event paired
    with every same-user ``left_type`` event in the preceding
    ``horizon`` (strict ``r_ts > l_ts``).  INNER join (default): pairs
    emit as soon as both sides have arrived (no watermark hold on
    emission — that applies to outer sides only), so an availableNow
    replay over event-time-ordered epochs reproduces the batch range
    join exactly.  ``how='left_outer'``: additionally emits
    (l_id, NULL, user_id, NULL) for a left event once the watermark
    proves no match can still arrive (passes ``l_ts + horizon``) — the
    row arrives in a LATER micro-batch than the event, and left events
    too close to the end of the stream stay unemitted (their no-match
    proof never lands); the ev_stream_join_outer oracle encodes that
    closure rule.

    Self-join of one source stream is fine (Spark plans two scans)."""
    l = (
        stream.filter(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("l_id"),
            F.col("user_id").alias("l_user"),
            F.col(ts_col).alias("l_ts"),
        )
        .withWatermark("l_ts", horizon)
    )
    r = (
        stream.filter(F.col("event_type") == right_type)
        .select(
            F.col("event_id").alias("r_id"),
            F.col("user_id").alias("r_user"),
            F.col(ts_col).alias("r_ts"),
        )
        .withWatermark("r_ts", horizon)
    )
    joined = l.join(
        r,
        F.expr(
            "l_user = r_user AND r_ts > l_ts "
            f"AND r_ts <= l_ts + interval {horizon}"
        ),
        how,
    )
    return joined.select(
        "l_id",
        "r_id",
        F.col("l_user").alias("user_id"),
        (F.unix_micros("r_ts") - F.unix_micros("l_ts"))
        .cast("long")
        .alias("lag_us"),
    )


def session_stream(
    spark: SparkSession,
    input_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    checkpoint: str | None = None,
    output_path: str | None = None,
):
    """Streaming SESSION WINDOWS per user (``F.session_window`` — the
    streaming-native form of the batch gaps-and-islands ``sessionize``):
    a session extends while successive same-user events arrive within
    ``gap``; two events exactly ``gap`` apart DO merge (the merge test is
    end-INCLUSIVE — empirically pinned in
    tests/test_fertility_streamjoin.py — i.e. the same strict-``>`` split
    rule as the batch ``sessionize``).  Append mode emits a session
    only once the watermark passes its end (last event time + gap), so
    the session-state store is evictable and bounded by the number of
    OPEN sessions — not the stream length.

    → (session_window(start, end), user_id, n_events, value_cents);
    cents are integer (round ×100) so the emitted rows are
    bit-deterministic and SQL-checkable.  Parquet file sink + checkpoint
    = recoverable: a restart resumes open-session state and the
    persisted watermark."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    agg = (
        stream.withColumn(
            "cents", F.round(F.col("value") * 100).cast("long")
        )
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("value_cents"),
        )
    )
    if output_path is None or checkpoint is None:
        raise ValueError("session_stream needs output_path and checkpoint")
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
