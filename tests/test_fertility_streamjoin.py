"""bpe_fertility and attribution_join_stream — round-5 additions.
Cross-engine witnesses: the ts_fertility / ev_stream_join DuckDB oracles
(the latter replays a REAL availableNow 3-epoch stream in the driver
query; here the join semantics are pinned in batch mode, where
withWatermark is a no-op and the interval join runs as a plain range
join — same plan semantics, no stream scaffolding)."""

import datetime as dt

from pyspark.sql import functions as F

from obsidian_parser_spark.operators.textstats import bpe_fertility
from obsidian_parser_spark.streaming.incremental import attribution_join_stream


# -------------------------------------------------------------- fertility


def test_bpe_fertility_hand_checked(spark):
    # corpus: 'aaab' x4, 'ab' x2 -> merges learn 'aa' etc.; '!' is OOV
    d = spark.createDataFrame(
        [(1, "aaab aaab ab"), (2, "aaab ! !")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in bpe_fertility(d, n_merges=2).collect()}
    r1, r2 = out[1], out[2]
    assert r1.n_words == 3 and r1.n_covered == 3 and r1.n_oov_tokens == 0
    assert r2.n_words == 3 and r2.n_covered == 1 and r2.n_oov_tokens == 2
    # covered_chars: doc1 = 4+4+2, doc2 = 4
    assert r1.covered_chars == 10 and r2.covered_chars == 4
    # ratio identities hold regardless of what the merges learned
    assert r1.fertility_x100 == (r1.n_pieces * 100) // r1.n_covered
    assert r1.chars_per_piece_x100 == (r1.covered_chars * 100) // r1.n_pieces
    # doc2's single covered word is 'aaab', so its piece total must equal
    # one occurrence's share of doc1's 'aaab aaab' plus-'ab' total
    assert r2.fertility_x100 == (r2.n_pieces * 100) // 1


def test_bpe_fertility_zero_guards(spark):
    # all-OOV doc: n_covered = 0 -> both ratios 0, no division error
    d = spark.createDataFrame(
        [(1, "ok ok ok ok"), (2, "!! ?? ..")], "doc_id int, text string"
    )
    out = {r.doc_id: r for r in bpe_fertility(d, n_merges=1).collect()}
    assert out[2].n_covered == 0
    assert out[2].fertility_x100 == 0 and out[2].chars_per_piece_x100 == 0


# ------------------------------------------------------- stream-stream join


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, t)
            for i, (m, u, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_attribution_join_batch_semantics(spark):
    rows = [
        (0, 1, "click"),  # id 0
        (30, 1, "purchase"),  # id 1: within 6h of click 0 -> pair
        (0, 2, "click"),  # id 2
        (60 * 7, 2, "purchase"),  # id 3: 7h later -> NO pair
        (100, 3, "purchase"),  # id 4: purchase before any click -> none
        (120, 3, "click"),  # id 5
        (50, 1, "click"),  # id 6: second click also precedes purchase 1
        (30, 4, "view"),  # other types ignored
    ]
    got = sorted(
        (r.l_id, r.r_id, r.user_id, r.lag_us)
        for r in attribution_join_stream(_ev(spark, rows)).collect()
    )
    assert got == [(0, 1, 1, 30 * 60 * 1_000_000)]
    # strict r_ts > l_ts: a purchase at the exact click instant is no pair
    rows2 = [(10, 9, "click"), (10, 9, "purchase")]
    assert attribution_join_stream(_ev(spark, rows2)).count() == 0


def test_attribution_join_multiple_clicks_all_pair(spark):
    rows = [
        (0, 1, "click"),
        (10, 1, "click"),
        (20, 1, "purchase"),
    ]
    got = sorted(
        (r.l_id, r.r_id) for r in attribution_join_stream(_ev(spark, rows)).collect()
    )
    assert got == [(0, 2), (1, 2)]


# ------------------------------------------------------- session windows


def test_session_stream_merge_and_watermark_closure(spark, tmp_path):
    """session_stream merges same-user events with gap <= 30 min (an exact
    30-min gap MERGES — Spark's session windows are end-inclusive on the
    merge test, the same strict-> split rule as the batch sessionize),
    splits at > 30 min, and append mode withholds sessions the final
    watermark (max ts - 2 h) has not passed — the 'closer' user's own
    session stays unemitted."""
    import datetime as dt

    from obsidian_parser_spark.streaming.incremental import session_stream

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, minutes, uid, val):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, "click", val, "{}")

    rows = [
        ev(0, 0, 1, 1.0),
        ev(1, 10, 1, 2.0),  # gap 10 min: same session
        ev(2, 40, 1, 3.0),  # gap 30 min EXACTLY: merges (end-inclusive)
        ev(4, 71, 1, 4.0),  # gap 31 min: NEW session
        ev(3, 600, 99, 5.0),  # closer: watermark -> t0+8h, own session open
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    in_dir = str(tmp_path / "in")
    df.coalesce(1).write.parquet(in_dir)
    q = session_stream(
        spark,
        in_dir,
        checkpoint=str(tmp_path / "ckpt"),
        output_path=str(tmp_path / "out"),
    )
    assert q.awaitTermination(300)
    got = sorted(
        (
            r.user_id,
            r["session_window"].start,
            r["session_window"].end,
            r.n_events,
            r.value_cents,
        )
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    gap = dt.timedelta(minutes=30)
    assert got == [
        (1, t0, t0 + dt.timedelta(minutes=40) + gap, 3, 600),
        (
            1,
            t0 + dt.timedelta(minutes=71),
            t0 + dt.timedelta(minutes=71) + gap,
            1,
            400,
        ),
    ]


def test_outer_join_closure_rule(spark, tmp_path):
    """Pins the left-outer emission rule the ev_stream_join_outer oracle
    encodes: each leg's watermark advances on its OWN filtered events;
    eviction is STRICT — a click whose no-match proof lands exactly ON
    the final watermark (or 500 µs past it) does NOT emit, one strictly
    inside does; a final flush batch runs because the watermark advanced
    in the last data batch."""
    import datetime as dt
    import glob
    import os

    from obsidian_parser_spark.streaming.incremental import (
        attribution_join_stream,
    )

    t0 = dt.datetime(2024, 1, 1)
    H = 6 * 3600 * 1_000_000

    def evus(eid, us, uid, typ):
        return (eid, t0 + dt.timedelta(microseconds=us), uid, typ)

    M = 40 * 3600 * 1_000_000  # final max of both legs, ms-aligned
    wm_us = (M // 1000) * 1000 - H
    epochs = [
        [
            evus(0, wm_us - H + 500, 1, "click"),  # 500us past boundary: no
            evus(1, wm_us - H, 2, "click"),  # == boundary: no
            evus(2, 0, 3, "click"),  # matched below -> pair, no NULL
            evus(3, 1_000_000, 3, "purchase"),  # pair with click 2
        ],
        [
            evus(4, 20 * 3600 * 1_000_000, 8, "click"),  # closed: NULL row
            evus(5, 20 * 3600 * 1_000_000, 9, "purchase"),
        ],
        [evus(6, M, 98, "click"), evus(7, M, 99, "purchase")],
    ]
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, rows in enumerate(epochs):
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string",
        )
        stage = str(tmp_path / f"stage{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        dst = os.path.join(in_dir, f"epoch_{i}.parquet")
        os.replace(glob.glob(os.path.join(stage, "part-*.parquet"))[0], dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        attribution_join_stream(stream, how="left_outer")
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("parquet")
        .outputMode("append")
        .start(str(tmp_path / "out"))
    )
    assert q.awaitTermination(300)
    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    pairs = sorted((r.l_id, r.r_id) for r in rows if r.r_id is not None)
    nulls = sorted(r.l_id for r in rows if r.r_id is None)
    assert pairs == [(2, 3)]
    # click 2 matched so no NULL; 0 and 1 sit on/past the strict boundary
    assert nulls == [4]
