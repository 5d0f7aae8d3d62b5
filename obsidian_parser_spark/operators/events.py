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


def sessionize(events: DataFrame, include_end: bool = False) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts after a
    >30-min silence per user.  → (user_id, session_idx, session_start_us,
    n_events, value_cents); ``include_end`` appends ``session_end_us``
    (the interval form consumed by ``interval_overlap_counts``)."""
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
    aggs = [
        F.min("ts_us").alias("session_start_us"),
        F.count("*").alias("n_events"),
        F.sum("cents").alias("value_cents"),
    ]
    if include_end:
        aggs.append(F.max("ts_us").alias("session_end_us"))
    return sess.groupBy("user_id", "session_idx").agg(*aggs)


def windowed_counts(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows per event type →
    (window_start_us, event_type, n_events, value_cents)."""
    e = events.select(
        F.col("event_type"),
        (F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {WINDOW_US}") * WINDOW_US)
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts_us",
    payload: tuple[str, ...] = ("event_id",),
    prefix: str = "matched_",
) -> DataFrame:
    """As-of join: attach to each ``left`` row the most recent ``right``
    row (per ``key``) whose ``ts`` is at-or-before the left row's — the
    point-in-time lookup Spark has no built-in operator for (DuckDB: the
    native ``ASOF JOIN``, which is exactly what the driver oracle uses).

    Implementation is the union-scan scheme, not a join: tag both sides,
    union them, and run ONE window pass per key ordered by (ts, side,
    tie-break) with ``last(payload, ignorenulls=True)`` carrying the
    latest right payload forward onto every left row.  Scale shape: a
    single shuffle on ``key`` + an in-partition sort — compared with the
    join-then-filter-then-argmax formulation this never materializes the
    quadratic (left × earlier-rights) intermediate, and partial windows
    stream through each partition.  Right rows at a left row's exact ts
    sort BEFORE it (at-or-before semantics, matching ASOF's ``>=``); ties
    inside the right side break by the first payload column (largest
    wins), so the output is deterministic even with duplicate (key, ts)
    right rows.  Unmatched left rows keep NULL payloads (left-outer ASOF).

    Returns ``left``'s columns plus ``<prefix><payload_i>`` and
    ``<prefix><ts>``.
    """
    r_types = dict(right.dtypes)
    l_types = dict(left.dtypes)
    carried = list(payload) + [ts]
    left_only = [c for c in left.columns if c not in (key, ts)]
    # the right payload rides as ONE struct, not per-column: last(ignorenulls)
    # over independent columns could mix fields from DIFFERENT right rows
    # when a payload field is NULL — the struct keeps each row's fields
    # together (a right row's struct is non-null even with null fields)
    r_struct_ddl = (
        "struct<" + ",".join(f"{c}:{r_types[c]}" for c in carried) + ">"
    )
    l = left.select(
        F.col(key),
        F.col(ts),
        *[F.col(c) for c in left_only],
        F.lit(1).alias("_is_l"),
        F.lit(None).cast(r_struct_ddl).alias("_r"),
    )
    r = right.select(
        F.col(key),
        F.col(ts),
        *[F.lit(None).cast(l_types[c]).alias(c) for c in left_only],
        F.lit(0).alias("_is_l"),
        F.struct(*[F.col(c).alias(c) for c in carried]).alias("_r"),
    )
    u = l.unionByName(r)
    order = [F.col(ts).asc(), F.col("_is_l").asc()]
    if payload:
        order.append(F.col(f"_r.{payload[0]}").asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        F.col(key),
        F.col(ts),
        *[F.col(c) for c in left_only],
        F.col("_is_l"),
        F.last("_r", ignorenulls=True).over(w).alias("_m"),
    )
    return filled.filter(F.col("_is_l") == 1).select(
        F.col(key),
        F.col(ts),
        *[F.col(c) for c in left_only],
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in carried],
    )


def interval_overlap_counts(
    intervals: DataFrame,
    points: DataFrame,
    bucket_us: int = WINDOW_US,
) -> DataFrame:
    """Range join: aggregate ``points`` (ts_us, cents) falling inside each
    interval [start_us, end_us] — per interval → (interval keys…,
    n_overlap_events, overlap_cents).

    Spark has no native range-join operator; the naive formulation is a
    cross join + BETWEEN filter (quadratic — the oracle does exactly that,
    which is fine for DuckDB at driver scale).  The scale path here is
    time-bucket blocking: each interval explodes into the ``bucket_us``
    buckets it spans, each point keys by its own bucket, and the match is
    a plain equi-join on the bucket + an exact BETWEEN residual filter.
    Every (interval, point) match is produced exactly once (a point's
    bucket is in the interval's span list iff the point can be inside it),
    so no dedup pass is needed.  Pick ``bucket_us`` near the median
    interval length: the per-interval bucket list stays O(1) and each
    bucket's population is bounded, so the join never degenerates toward
    the cross product it replaces.

    ``intervals`` needs (start_us, end_us) plus any identifying columns
    (all non-bound columns become the group keys); ``points`` needs
    (ts_us, cents)."""
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                (F.col("start_us") / bucket_us).cast("long"),
                (F.col("end_us") / bucket_us).cast("long"),
            )
        ),
    )
    pt = points.select(
        (F.col("ts_us") / bucket_us).cast("long").alias("_b"), "ts_us", "cents"
    )
    hits = iv.join(pt, "_b").filter(
        F.col("ts_us").between(F.col("start_us"), F.col("end_us"))
    )
    keys = [c for c in intervals.columns if c not in ("start_us", "end_us")]
    return hits.groupBy(*keys, "start_us", "end_us").agg(
        F.count(F.lit(1)).alias("n_overlap_events"),
        F.sum("cents").alias("overlap_cents"),
    )


def copresence_edges(
    events: DataFrame,
    unit: str = "hour",
    min_windows: int = 3,
    max_users_per_window: int = 64,
) -> DataFrame:
    """Entity co-occurrence graph construction from the event stream →
    (user_a, user_b, n_windows): pairs of users active in the same
    ``unit``-truncated time window in ≥ ``min_windows`` distinct windows
    (user_a < user_b) — the standard "events → KG edges" projection
    (co-presence implies relationship, weighted by recurrence).

    Scale shape: presence is reduced to DISTINCT (window, user) BEFORE
    pairing, so per-user event volume never multiplies; pairs are
    generated per window (an equi-self-join on the window key, the
    inverted-index scheme of ``related_notes``), and windows holding more
    than ``max_users_per_window`` users are excluded from pair GENERATION
    — a flash-crowd window relates nobody in particular and would emit
    O(users²) pairs (same df-cap rule both engines implement).  The final
    weight is one map-side-combined count."""
    pres = (
        events.select(
            F.date_trunc(unit, F.col("ts")).alias("w"),
            F.col("user_id").alias("u"),
        )
        .distinct()
    )
    from ..checkpointing import cut_lineage

    pres = cut_lineage(pres)  # referenced twice by the pair self-join
    small = (
        pres.groupBy("w")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_users_per_window)
        .select("w")
    )
    kept = cut_lineage(pres.join(small, "w", "left_semi"))
    a = kept.select("w", F.col("u").alias("user_a"))
    b = kept.select("w", F.col("u").alias("user_b"))
    return (
        a.join(b, "w")
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).alias("n_windows"))
        .filter(F.col("n_windows") >= min_windows)
    )


WEEK_US = 7 * 86_400 * 1_000_000  # epoch week (anchor 1970-01-01, integer div)


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: cohort = a user's first-activity epoch
    week → (cohort_week, week_offset, n_active, cohort_size), one row per
    cohort × offset with ≥ 1 active user.

    Weeks are epoch-microsecond integer divisions (``ts_us div WEEK_US``),
    NOT calendar ``date_trunc`` — integer arithmetic is bit-identical
    across engines and timezones, which is the whole point of an
    oracle-checked retention matrix.

    Scale shape: the (user, week) activity set is deduped map-side before
    any join; cohorts are a partial-aggregatable min per user; the final
    matrix groupBy is (weeks × offsets)-sized — tiny at any corpus scale —
    and the cohort-size attach is a broadcast of a ≤ n_weeks-row frame.
    """
    act = (
        events.select(
            "user_id",
            F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {WEEK_US}").alias("week"),
        )
        .distinct()
    )
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        act.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_counts(events: DataFrame, steps: tuple = FUNNEL_STEPS) -> DataFrame:
    """Strictly-ordered conversion funnel → (step, event_type, n_users):
    a user reaches step k when their earliest step-k event is STRICTLY
    after the timestamp at which they reached step k-1 (equal-timestamp
    events do not count as ordered — a deterministic rule both engines
    can evaluate without tie ambiguity).

    Scale shape: each step is one user-keyed pre-aggregation joined to
    the previous step's (user, t) frame on user_id — k shuffles of
    user-cardinality frames for a k-step funnel, never an event-level
    self-join.  The per-step branches share lineage; at driver scale the
    recomputation is trivial, at cluster scale persist the step frames.
    """
    e = events.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    reached = None
    outs = []
    for i, step in enumerate(steps):
        f = e.filter(F.col("event_type") == step)
        if reached is None:
            cur = f.groupBy("user_id").agg(F.min("ts_us").alias("t"))
        else:
            cur = (
                f.join(reached, "user_id")
                .filter(F.col("ts_us") > F.col("t"))
                .groupBy("user_id")
                .agg(F.min("ts_us").alias("t"))
            )
        reached = cur
        outs.append(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).cast("long").alias("step"),
                F.lit(step).alias("event_type"),
                "n_users",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def transition_counts(events: DataFrame) -> DataFrame:
    """First-order Markov transition counts over each user's event-type
    sequence: → (prev_type, next_type, n) exact integers, ordered within
    a user by (ts, event_id) — the event_id tie-break makes simultaneous
    events deterministic across engines.  The user-journey transition
    matrix is the sufficient statistic for session simulators, anomaly
    scoring (surprise = -log p(next|prev)), and next-action models.

    Scale shape: ONE window pass partitioned by user_id (users are the
    natural partition key; no global sort), then a map-side combinable
    groupBy of the (prev, next) pairs.  Hot users are bounded by their
    own event counts — the window never crosses users.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )


def distinct_sketch(events: DataFrame, m: int = 1024) -> DataFrame:
    """Linear (probabilistic) counting sketch per event type
    (Whang et al. 1990): hash every user into an ``m``-bucket bitmap and
    report → (event_type, n_exact, n_buckets_hit) — the estimator
    −m·ln(1 − hit/m) is the caller's one float; the ENGINE emits only
    exact integers, so the sketch itself is bit-identical across engines
    (the md5-derived bucket is the deterministic hash family every
    sampling/split operator here shares).  n_exact rides along as the
    ground truth the sketch's error is judged against.

    Scale shape: the real point of the sketch — count-distinct state is
    capped at ``m`` bits per group regardless of cardinality, so a
    10^12-event stream rolls up map-side to ≤ m rows per type (the exact
    column is the expensive one; drop it in production and keep only the
    bitmap).  Both aggregations here are distinct-style groupBys on
    bounded-key domains, map-side combinable.
    """
    from .sampling import hash_bucket

    b = events.select(
        "event_type",
        "user_id",
        hash_bucket("user_id", buckets=m, salt="sketch").alias("bkt"),
    )
    return b.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact"),
        F.countDistinct("bkt").cast("long").alias("n_buckets_hit"),
    )


def heavy_hitters_cms(
    events: DataFrame,
    d: int = 4,
    w: int = 512,
    k: int = 10,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) heavy hitters:
    → (user_id, n_exact, n_est) for the top-``k`` users by event count
    (ties → smaller user_id), with the CMS estimate beside the exact
    truth.  n_est ≥ n_exact always (CMS errs one-sided); the gap is the
    collision error a production deployment would tolerate in exchange
    for bounded state.  Hash family = the engine's shared md5 bucket
    (salts 'cm0'..'cm{d-1}'), so the sketch is a pure integer function of
    the data — bit-identical across engines and SQL-oracle-verifiable.

    Scale shape: the sketch is d·w counters REGARDLESS of key cardinality
    — the whole point.  One scan computes all d buckets per event
    (posexplode of a d-array, no d× re-scan), the counter build is a
    map-side-combined groupBy over a ≤ d·w key domain, and the tiny
    sketch broadcast-joins back onto the k query keys.  The exact column
    is the expensive one (full per-key groupBy) and rides along here only
    because it is the ground truth the sketch's error is judged against —
    production keeps the sketch alone."""
    from .sampling import hash_bucket

    buckets = F.array(*[hash_bucket("user_id", w, f"cm{r}") for r in range(d)])
    hashed = events.select(
        F.posexplode(buckets).alias("row", "bkt")
    )
    sketch = hashed.groupBy("row", "bkt").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    top = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), "user_id")
        .limit(k)
    )
    probes = top.select(
        "user_id", "n_exact", F.posexplode(buckets).alias("row", "bkt")
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bkt"])
        .groupBy("user_id", "n_exact")
        .agg(F.min("cnt").cast("long").alias("n_est"))
    )


def burst_windows(events: DataFrame) -> DataFrame:
    """→ (event_type, peak_window_start_us, peak_events): the single
    busiest tumbling hour per event type — burst detection as one
    deterministic argmax (max of the (n, window) struct: ties break to
    the LATER window, a total order both engines share).

    Scale shape: reuses the tumbling-window rollup (map-side-combined
    count per (type, window)), then one ≤-|windows|-row max per type —
    no event-level window function, no sort."""
    per = events.select(
        "event_type",
        (
            F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {WINDOW_US}")
            * WINDOW_US
        ).cast("long").alias("w"),
    ).groupBy("event_type", "w").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return per.groupBy("event_type").agg(
        F.max(F.struct("n", "w")).alias("_m")
    ).select(
        "event_type",
        F.col("_m.w").alias("peak_window_start_us"),
        F.col("_m.n").alias("peak_events"),
    )
