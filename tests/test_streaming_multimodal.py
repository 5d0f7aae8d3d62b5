"""Streaming incremental ingest, windowed stream aggs, multimodal plumbing,
write-back render round-trip."""

import pyspark.sql.functions as F

from obsidian_parser_spark.operators.linking import build_alias_dict
from obsidian_parser_spark.operators.multimodal import (
    decode_media,
    extract_features,
    sample_frames,
)
from obsidian_parser_spark.operators.render import render_raw
from obsidian_parser_spark.operators.tokenize import media_refs, tokenize_documents
from obsidian_parser_spark.plans.pipeline import build_graph, reference_parity_options
from obsidian_parser_spark.sources.corpus import ensure_vault_corpus, micro_vault_rows
from obsidian_parser_spark.streaming.incremental import (
    incremental_graph,
    windowed_event_counts,
)
from tests.util import spans_df


def test_incremental_graph_stream(spark, tmp_path):
    path = ensure_vault_corpus("sf0.0002", base=str(tmp_path / "c"))
    docs = spark.read.parquet(path)
    input_dir = str(tmp_path / "in")
    docs.write.parquet(input_dir)

    notes = tokenize_documents(docs)
    alias_dict = build_alias_dict(notes).persist()
    out_dir = str(tmp_path / "out")

    q = incremental_graph(spark, input_dir, out_dir, alias_dict)
    q.awaitTermination(120)

    streamed = spark.read.parquet(f"{out_dir}/edges")
    batch = build_graph(docs).edges.filter(F.col("pred") != "tagged")
    assert streamed.count() == batch.count()
    # restart with no new files → no duplicates (checkpoint replay safety)
    q2 = incremental_graph(spark, input_dir, out_dir, alias_dict)
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{out_dir}/edges").count() == batch.count()


def test_windowed_event_counts(spark, tmp_path):
    q = windowed_event_counts(
        spark, "/root/testdata/sf0.001", query_name="evt_test"
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM evt_test")
    # append mode emits only watermark-closed windows; just check shape+rows
    assert {"window", "event_type", "n_events", "total_value"} <= set(out.columns)
    assert out.count() > 0


def test_windowed_late_data_dropped(spark, tmp_path):
    """An event arriving past the watermark must be DROPPED: its (already
    watermark-closed) window never re-emits (incremental.py watermark
    semantics — VERDICT r1 item 10)."""
    from datetime import datetime, timezone

    from obsidian_parser_spark.sources.schema import EVENTS_SCHEMA

    def ts(h, m=0):
        return datetime(2024, 1, 1, h, m, tzinfo=timezone.utc)

    in_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "win")
    win0 = "window.start = timestamp'2024-01-01 00:00:00+00'"
    # batch 1: events at 00:30 and 10:00 → watermark advances to 08:00,
    # closing (and emitting) the 00:00-01:00 window
    rows1 = [
        (1, ts(0, 30), 100, "click", 1.0, None),
        (2, ts(10), 101, "click", 1.0, None),
    ]
    spark.createDataFrame(rows1, EVENTS_SCHEMA).write.mode("append").parquet(in_dir)
    q = windowed_event_counts(spark, in_dir, checkpoint=ckpt, output_path=out)
    q.awaitTermination(120)
    first = spark.read.parquet(out).filter(win0).collect()
    assert [r.n_events for r in first] == [1]

    # restart from the SAME checkpoint: one LATE event back at 00:45 (behind
    # the persisted 08:00 watermark) and one fresh event; the 00:00 window
    # must NOT re-emit — the late event is dropped
    rows2 = [
        (3, ts(0, 45), 102, "click", 1.0, None),
        (4, ts(11), 103, "click", 1.0, None),
    ]
    spark.createDataFrame(rows2, EVENTS_SCHEMA).write.mode("append").parquet(in_dir)
    q2 = windowed_event_counts(spark, in_dir, checkpoint=ckpt, output_path=out)
    q2.awaitTermination(120)
    after = spark.read.parquet(out).filter(win0).collect()
    assert [r.n_events for r in after] == [1]  # unchanged: late event dropped


def test_multimodal_plumbing(spark, tmp_path):
    path = ensure_vault_corpus("sf0.0002", base=str(tmp_path / "c"))
    media = media_refs(spark.read.parquet(path))
    assert media.count() > 0

    dec = decode_media(media, fake=True)
    rows = dec.collect()
    assert all(r.media_type in ("image", "video", "audio", "unknown") for r in rows)
    assert {r.media_type for r in rows} >= {"image", "video"}

    feats = extract_features(media, dim=16).collect()
    assert all(len(r.features) == 16 for r in feats)
    # deterministic: same ref ⇒ same features
    by_ref = {}
    for r in feats:
        assert by_ref.setdefault(r.media_ref, r.features) == r.features

    frames = sample_frames(media).collect()
    assert all(len(r.frame_ms) >= 1 for r in frames)

    import pytest

    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        decode_media(media, fake=False).collect()


def test_render_roundtrip_micro_vault(spark, micro_vault):
    """S6 write-back: render → re-ingest raw → identical triples."""
    from obsidian_parser_spark.plans.pipeline import build_graph

    raw = render_raw(micro_vault)
    g = build_graph(raw, reference_parity_options(), raw_text=True)
    triples = sorted((r.subj, r.pred, r.obj) for r in g.edges.collect())
    assert triples == [
        ("data/main", "links_to", "link"),
        ("link", "links_to", "main"),
        ("main", "links_to", "data/main"),
    ]


def test_dedup_stream_drops_within_horizon(spark, tmp_path):
    """Streaming exact dedup: a copy arriving within the watermark horizon
    of the first occurrence is dropped; distinct content passes."""
    from datetime import datetime, timezone

    from obsidian_parser_spark.streaming.incremental import dedup_stream

    ts = lambda m: datetime(2026, 1, 1, 10, m, tzinfo=timezone.utc)  # noqa: E731
    rows = [
        (1, "same text", ts(0)),
        (2, "same text", ts(5)),  # dup within 10-min horizon → dropped
        (3, "other text", ts(1)),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, ts timestamp")
    indir = str(tmp_path / "in")
    df.coalesce(1).write.parquet(indir)
    stream = spark.readStream.schema(
        "doc_id int, text string, ts timestamp"
    ).parquet(indir)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dd_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.sql("SELECT * FROM dd_stream").collect()}
    assert got == {1, 3}


def test_decode_media_real_png_wav(spark):
    """REAL header decode: PNG IHDR width/height, WAV RIFF duration,
    corrupt payload -> ok=false error-channel row (never a thrown task)."""
    from obsidian_parser_spark.operators.multimodal import decode_media
    from obsidian_parser_spark.sources.corpus import png_bytes, wav_bytes

    rows = [
        ("a.png", png_bytes(640, 480)),
        ("b.wav", wav_bytes(16000, n_frames=16000)),  # exactly 1 s
        ("c.png", b"\x89PNGnope-not-a-real-signature"),
    ]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    got = {
        r.media_ref: r
        for r in decode_media(df, fake=False, payload_col="payload").collect()
    }
    a = got["a.png"]
    assert (a.media_type, a.width, a.height, a.duration_ms, a.ok) == (
        "image", 640, 480, 0, True,
    )
    b = got["b.wav"]
    assert (b.media_type, b.width, b.height, b.duration_ms, b.ok) == (
        "audio", 0, 0, 1000, True,
    )
    c = got["c.png"]
    assert (c.ok, c.width, c.height, c.duration_ms) == (False, None, None, None)


def test_decode_media_unsupported_extension_is_declared_stub(spark):
    import pytest

    from obsidian_parser_spark.operators.multimodal import decode_media

    df = spark.createDataFrame(
        [("v.mp4", b"\x00\x00\x00\x18ftypmp42")], "media_ref string, payload binary"
    )
    with pytest.raises(Exception, match="PIL/ffmpeg"):
        decode_media(df, fake=False, payload_col="payload").collect()
    # and a payload-less fake=False still refuses loudly
    refs = spark.createDataFrame([("x", "a.png")], "doc_id string, media_ref string")
    with pytest.raises(Exception, match="payload"):
        decode_media(refs, fake=False).collect()


def test_incremental_dict_maintenance_across_epochs(spark, tmp_path):
    """alias_dict=None: a note arriving in epoch N becomes a resolvable
    link TARGET for epoch N+1 mentions in the SAME stream run — the
    per-epoch dict upsert (VERDICT r2 item 7).  Epoch ordering is forced
    with maxFilesPerTrigger=1 and distinct file mtimes."""
    import os as _os
    import time as _time

    from obsidian_parser_spark.sources.corpus import spans_from_raw

    input_dir = tmp_path / "in"
    input_dir.mkdir()
    out_dir = str(tmp_path / "out")

    # the file stream source lists FLAT files — write each doc via a temp
    # dir and move the single part-file in, with strictly increasing mtimes
    # (the source's processing order)
    now = _time.time()
    docs = [
        # arrives first: the future link TARGET, itself linking to nothing
        ("f1.parquet", spans_from_raw("target_note", "plain text")),
        # arrives second: links to the note from the earlier epoch
        ("f2.parquet", spans_from_raw("linker", "see [[target_note]]")),
    ]
    for i, (name, row) in enumerate(docs):
        stage = tmp_path / f"stage{i}"
        spans_df(spark, [row]).coalesce(1).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        dest = input_dir / name
        part.rename(dest)
        _os.utime(dest, (now + i, now + i))

    q = incremental_graph(
        spark, str(input_dir), out_dir, alias_dict=None, max_files_per_trigger=1
    )
    q.awaitTermination(120)

    edges = spark.read.parquet(f"{out_dir}/edges")
    rows = {(r.subj, r.obj): r.epoch for r in edges.collect()}
    assert ("linker", "target_note") in rows
    # the link resolved in a LATER epoch than the target's arrival
    assert rows[("linker", "target_note")] >= 1

    # the maintained dict equals a batch rebuild over the same notes
    from obsidian_parser_spark.operators.linking import (
        build_alias_dict,
        dedup_alias_dict,
    )

    all_docs = spark.read.parquet(str(input_dir))
    want = sorted(
        map(tuple, build_alias_dict(tokenize_documents(all_docs)).collect())
    )
    got = sorted(
        map(
            tuple,
            dedup_alias_dict(
                spark.read.parquet(f"{out_dir}/alias_dict")
            ).collect(),
        )
    )
    assert got == want


def test_image_channel_stats_real_pixels(spark):
    """Pixel decoder vs numpy ground truth on a NON-uniform raster —
    every pixel distinct, so any stride/offset/filter slip changes the
    sums; plus subset-violations (corrupt, wrong colortype) → ok=false."""
    import struct
    import zlib

    import numpy as np

    from obsidian_parser_spark.operators.multimodal import image_channel_stats

    def png_raw(px):  # px: ndarray (h, w, 3) uint8, filter-0 rows
        h, w, _ = px.shape
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        raster = b"".join(b"\x00" + px[r].tobytes() for r in range(h))
        out = b"\x89PNG\r\n\x1a\n"
        for tag, data in ((b"IHDR", ihdr), (b"IDAT", zlib.compress(raster)), (b"IEND", b"")):
            out += struct.pack(">I", len(data)) + tag + data
            out += struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        return out

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    gray = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # colortype 0
    bad_ct = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + gray + struct.pack(">I", 0)
    )
    df = spark.createDataFrame(
        [("a.png", png_raw(px)), ("b.png", b"junk"), ("c.png", bad_ct)],
        "media_ref string, payload binary",
    )
    got = {r.media_ref: r for r in image_channel_stats(df).collect()}
    a = got["a.png"]
    want = px.astype(np.int64).sum(axis=(0, 1))
    assert (a.width, a.height, a.n_px) == (7, 5, 35)
    assert (a.sum_r, a.sum_g, a.sum_b) == tuple(int(x) for x in want)
    assert a.ok
    assert not got["b.png"].ok and got["b.png"].sum_r is None
    assert not got["c.png"].ok  # grayscale: outside the declared subset


def test_audio_sample_stats_real_pcm(spark):
    """PCM decoder vs a hand-packed varying waveform (negative values
    exercise the signed int16 little-endian read)."""
    import struct

    from obsidian_parser_spark.operators.multimodal import audio_sample_stats
    from obsidian_parser_spark.sources.corpus import wav_bytes

    samples = [0, 1, -1, 32767, -32768, 1234, -4321]
    hdr = wav_bytes(8000, n_frames=len(samples))  # header only, right sizes
    body = b"".join(struct.pack("<h", s) for s in samples)
    df = spark.createDataFrame(
        [("x.wav", hdr + body), ("y.wav", b"RIFFjunk")],
        "media_ref string, payload binary",
    )
    got = {r.media_ref: r for r in audio_sample_stats(df).collect()}
    x = got["x.wav"]
    assert (x.n_samples, x.sum_amp, x.sample_rate, x.ok) == (
        len(samples), sum(samples), 8000, True,
    )
    assert not got["y.wav"].ok
