"""Event-stream operators: sessionization + tumbling-window aggregates.

Batch forms here (driver-oracle-checkable, exact cross-engine arithmetic:
timestamps as epoch microseconds, money as integer cents); the streaming
forms (watermark + window / foreachBatch) live in ``streaming/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min
WINDOW_US = 3_600 * 1_000_000  # 1 h tumbling


def sessionize(events: DataFrame) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts after a
    >30-min silence per user.  → (user_id, session_idx, session_start_us,
    n_events, value_cents)."""
    e = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    wo = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = e.withColumn("prev_us", F.lag("ts_us").over(wo)).withColumn(
        "new_s",
        (
            F.col("prev_us").isNull()
            | ((F.col("ts_us") - F.col("prev_us")) > SESSION_GAP_US)
        ).cast("long"),
    )
    sess = marked.withColumn(
        "session_idx",
        F.sum("new_s").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.min("ts_us").alias("session_start_us"),
        F.count("*").alias("n_events"),
        F.sum("cents").alias("value_cents"),
    )


def windowed_counts(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows per event type →
    (window_start_us, event_type, n_events, value_cents)."""
    e = events.select(
        F.col("event_type"),
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / WINDOW_US) * WINDOW_US)
        .cast("long")
        .alias("window_start_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return e.groupBy("window_start_us", "event_type").agg(
        F.count("*").alias("n_events"), F.sum("cents").alias("value_cents")
    )


def top_users_by_value(events: DataFrame, k: int = 10) -> DataFrame:
    """Top-k users by total integer-cents value (deterministic tie-break)."""
    return (
        events.select(
            "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
        )
        .groupBy("user_id")
        .agg(F.sum("cents").alias("value_cents"), F.count("*").alias("n_events"))
        .orderBy(F.desc("value_cents"), F.asc("user_id"))
        .limit(k)
    )


def props_json_stats(events: DataFrame) -> DataFrame:
    """Semi-structured projection: extract the integer ``k`` field from the
    JSON ``props`` column and aggregate per event type — the engine's JSON
    scalar-function surface (Spark ``get_json_object`` / DuckDB
    ``json_extract``, both JVM/native-side; no UDF).
    → (event_type, n_events, sum_k, max_k)."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )
