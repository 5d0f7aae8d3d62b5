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


def test_decode_media_unsupported_extension_error_channel_and_strict(spark):
    """A stray .mp4 in the payload table must NOT kill the job: the
    default emits an ok=false error-channel row (consistent with corrupt
    payloads); strict=True restores the loud declared codec stub."""
    import pytest

    from obsidian_parser_spark.operators.multimodal import decode_media

    df = spark.createDataFrame(
        [("v.mp4", b"\x00\x00\x00\x18ftypmp42")], "media_ref string, payload binary"
    )
    rows = decode_media(df, fake=False, payload_col="payload").collect()
    assert [(r.media_ref, r.media_type, r.width, r.ok) for r in rows] == [
        ("v.mp4", "video", None, False)
    ]
    with pytest.raises(Exception, match="PIL/ffmpeg"):
        decode_media(df, fake=False, payload_col="payload", strict=True).collect()
    # and a payload-less fake=False still refuses loudly
    refs = spark.createDataFrame([("x", "a.png")], "doc_id string, media_ref string")
    with pytest.raises(Exception, match="payload"):
        decode_media(refs, fake=False).collect()


def test_gif_decode_and_frame_walk(spark):
    """GIF: dims off the logical screen descriptor; frame count by the
    positional block walk (extensions skipped, each image descriptor's
    local color table + LZW sub-blocks skipped).  Independent python
    mirror: the generator's n_frames argument.  Corrupt/truncated/non-gif
    → ok=false rows, never thrown tasks."""
    from obsidian_parser_spark.operators.multimodal import (
        decode_media_payloads,
        gif_frame_stats,
    )
    from obsidian_parser_spark.sources.corpus import gif_bytes

    multi = gif_bytes(33, 21, n_frames=5)
    # graphic-control extension in front of the first image descriptor
    # must be skipped (header = 6 sig + 4 dims + 3 LSD + 12 GCT = 25 bytes)
    gce = multi[:25] + b"\x21\xf9\x04\x00\x00\x00\x00\x00" + multi[25:]
    df = spark.createDataFrame(
        [
            ("one.gif", gif_bytes(7, 9, n_frames=1)),
            ("multi.gif", multi),
            ("ext.gif", gce),
            ("trunc.gif", multi[: len(multi) // 2]),
            ("junk.gif", b"GIFXXa" + b"\x00" * 10),
            ("not.png", b"\x89PNG\r\n\x1a\x0a" + b"\x00" * 20),
        ],
        "media_ref string, payload binary",
    )
    got = {r.media_ref: r for r in gif_frame_stats(df).collect()}
    assert (got["one.gif"].width, got["one.gif"].height, got["one.gif"].n_frames,
            got["one.gif"].ok) == (7, 9, 1, True)
    assert (got["multi.gif"].width, got["multi.gif"].n_frames) == (33, 5)
    assert got["ext.gif"].n_frames == 5  # extension block skipped, not counted
    assert not got["trunc.gif"].ok  # ran off the end without a trailer
    assert not got["junk.gif"].ok
    assert not got["not.png"].ok  # wrong extension → error channel

    # and the header decode path classifies gif as image with real dims
    dec = {r.media_ref: r for r in decode_media_payloads(df).collect()}
    assert (dec["one.gif"].media_type, dec["one.gif"].width,
            dec["one.gif"].height, dec["one.gif"].duration_ms,
            dec["one.gif"].ok) == ("image", 7, 9, 0, True)
    assert not dec["junk.gif"].ok


def test_incremental_stream_empty_first_batch_is_noop(spark, tmp_path):
    """An EMPTY first micro-batch (schema-only parquet before any data
    lands) must not crash the maintained-dict stream: previously the
    empty epoch-0 dynamic overwrite created alias_dict with zero data
    files and the immediate read-back died with UNABLE_TO_INFER_SCHEMA.
    Data arriving in a later run still resolves normally."""
    from obsidian_parser_spark.sources.corpus import spans_from_raw
    from obsidian_parser_spark.sources.schema import DOCUMENTS_SCHEMA

    input_dir = tmp_path / "in"
    input_dir.mkdir()
    out_dir = str(tmp_path / "out")

    empty = spark.createDataFrame([], DOCUMENTS_SCHEMA)
    stage = tmp_path / "stage_empty"
    empty.coalesce(1).write.parquet(str(stage))
    next(stage.glob("part-*.parquet")).rename(input_dir / "f0.parquet")

    q = incremental_graph(spark, str(input_dir), out_dir, alias_dict=None)
    q.awaitTermination(120)
    # no edges table yet and, critically, no schema-less dict wreckage

    row = spans_from_raw("a", "see [[b]]")
    row2 = spans_from_raw("b", "plain")
    stage2 = tmp_path / "stage_data"
    spans_df(spark, [row, row2]).coalesce(1).write.parquet(str(stage2))
    next(stage2.glob("part-*.parquet")).rename(input_dir / "f1.parquet")

    q2 = incremental_graph(spark, str(input_dir), out_dir, alias_dict=None)
    q2.awaitTermination(120)
    edges = spark.read.parquet(f"{out_dir}/edges")
    assert {(r.subj, r.obj) for r in edges.collect()} == {("a", "b")}


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


def test_bmp_channel_stats_real_pixels(spark):
    """BMP decoder vs numpy ground truth on a NON-uniform raster with a
    width forcing nonzero row padding (w=7 -> 21 bytes -> 3 pad bytes),
    so a stride or padding slip changes the sums; BGR order asserted via
    per-channel inequality; corrupt / unsupported-bpp -> ok=false."""
    import struct

    import numpy as np

    from obsidian_parser_spark.operators.multimodal import image_channel_stats

    def bmp_raw(px):  # px: ndarray (h, w, 3) uint8 in RGB image order
        h, w, _ = px.shape
        row = (3 * w + 3) & ~3
        pad = row - 3 * w
        body = b"".join(
            px[y, :, ::-1].tobytes() + b"\x00" * pad for y in reversed(range(h))
        )
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, row * h, 2835, 2835, 0, 0
        )
        return b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54) + info + body

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(4, 7, 3), dtype=np.uint8)
    # 8bpp header: outside the declared 24-bit subset
    info8 = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 16, 0, 0, 0, 0)
    bad8 = b"BM" + struct.pack("<IHHI", 54 + 16, 0, 0, 54) + info8 + bytes(16)
    df = spark.createDataFrame(
        [("a.bmp", bmp_raw(px)), ("b.bmp", b"BMjunk"), ("c.bmp", bad8)],
        "media_ref string, payload binary",
    )
    got = {r.media_ref: r for r in image_channel_stats(df).collect()}
    a = got["a.bmp"]
    want = px.astype(np.int64).sum(axis=(0, 1))  # RGB image order
    assert (a.width, a.height, a.n_px) == (7, 4, 28)
    assert (a.sum_r, a.sum_g, a.sum_b) == tuple(int(x) for x in want)
    assert a.ok
    assert not got["b.bmp"].ok and got["b.bmp"].sum_r is None
    assert not got["c.bmp"].ok  # 8bpp: outside the declared subset


def test_decode_media_real_bmp_header(spark):
    from obsidian_parser_spark.operators.multimodal import decode_media
    from obsidian_parser_spark.sources.corpus import bmp_bytes

    df = spark.createDataFrame(
        [
            ("f.bmp", bmp_bytes(9, 5, (1, 2, 3), (4, 5, 6))),
            ("g.bmp", b"BMBROKEN12345678"),
        ],
        "media_ref string, payload binary",
    )
    got = {
        r.media_ref: r
        for r in decode_media(df, fake=False, payload_col="payload").collect()
    }
    f = got["f.bmp"]
    assert (f.media_type, f.width, f.height, f.duration_ms, f.ok) == (
        "image", 9, 5, 0, True,
    )
    assert not got["g.bmp"].ok
