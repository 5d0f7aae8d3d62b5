"""Multimodal column plumbing: opaque media payloads through the engine.

Media enters as ``kind='media'``/``kind='embed'`` spans carrying an opaque
``media_ref`` (and, in a full deployment, a ``binary`` payload column or an
object-store URI).  The Spark-side plumbing — schema, batch shape,
partitioning, Arrow transfer — is real and tested; the actual codec calls
are STUBBED because no image/audio libraries exist in this container:

* ``decode_media``           — raises NotImplementedError by design when
  ``fake=False``; with ``fake=True`` produces a deterministic md5-derived
  "decode" (width/height/duration) so downstream operators are testable.
* ``extract_features``       — deterministic fake embedding (16 floats from
  md5 bytes), same mapInPandas shape a real CLIP/wav2vec stage would use.
* ``sample_frames``          — deterministic frame-offset plan for videos.

To productionize: replace ``_fake_decode`` with PIL/ffmpeg calls inside the
same ``mapInPandas`` iterator — the schema and partitioning don't change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

DECODED_SCHEMA = (
    "doc_id string, media_ref string, media_type string, "
    "width int, height int, duration_ms long, ok boolean"
)
FEATURES_SCHEMA = "doc_id string, media_ref string, features array<float>"
FRAMES_SCHEMA = "doc_id string, media_ref string, frame_ms array<long>"


def _media_type(ref: str) -> str:
    ext = ref.rsplit(".", 1)[-1].lower() if "." in ref else ""
    return {
        "png": "image", "jpg": "image", "jpeg": "image", "gif": "image",
        "mp3": "audio", "wav": "audio", "flac": "audio",
        "mp4": "video", "mkv": "video", "webm": "video",
    }.get(ext, "unknown")


def _fake_decode(ref: str) -> tuple[int, int, int]:
    h = hashlib.md5(ref.encode()).digest()
    return 16 + h[0] * 8, 16 + h[1] * 8, int.from_bytes(h[2:4], "big")


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """(doc_id, media_ref) → decoded metadata.  fake=False raises (no codec
    libraries in this image — STUB, marked by design)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg (not in this image); "
                    "use fake=True for the deterministic stub"
                )
            rows = []
            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                w, hgt, dur = _fake_decode(ref)
                mt = _media_type(ref)
                rows.append(
                    (doc_id, ref, mt, w, hgt, dur if mt in ("audio", "video") else 0,
                     mt != "unknown")
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_ref", "media_type", "width", "height",
                         "duration_ms", "ok"],
            )

    return media.select("doc_id", "media_ref").mapInPandas(run, DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic fake feature extractor — the Arrow batch shape of a
    real embedding model stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                (np.frombuffer(
                    (hashlib.md5(ref.encode()).digest() * (dim // 16 + 1))[:dim],
                    dtype=np.uint8,
                ).astype(np.float32) / 255.0).tolist()
                for ref in pdf["media_ref"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_ref": pdf["media_ref"],
                 "features": feats}
            )

    return media.select("doc_id", "media_ref").mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video refs (deterministic offsets from the
    fake duration)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                if _media_type(ref) != "video":
                    continue
                _, _, dur = _fake_decode(ref)
                rows.append((doc_id, ref, list(range(0, dur, every_ms))))
            yield pd.DataFrame(rows, columns=["doc_id", "media_ref", "frame_ms"])

    return media.select("doc_id", "media_ref").mapInPandas(run, FRAMES_SCHEMA)


def modality_stats(documents: DataFrame) -> DataFrame:
    """Per-document modality profile straight off the interleaved span
    array — one narrow JVM projection, no explode and no Python:

    (doc_id, n_spans, n_media, n_image, n_audio, n_video, text_bytes,
     media_frac)

    ``n_image``/``n_audio``/``n_video`` classify ``media_ref`` by extension
    (the same table as ``_media_type``); ``text_bytes`` sums the text
    payload of every span; ``media_frac`` = media spans / all spans
    (rounded to 4 — exact in any engine).  The curation signal for a
    text+media corpus: filter docs that are all boilerplate media, or route
    media-heavy docs to the decode pipeline."""
    from pyspark.sql import functions as F

    media = "filter(spans, s -> s.media_ref IS NOT NULL)"

    def n_ext(exts: tuple[str, ...]) -> str:
        conds = " OR ".join(
            f"endswith(lower(s.media_ref), '.{e}')" for e in exts
        )
        return f"size(filter(spans, s -> s.media_ref IS NOT NULL AND ({conds})))"

    return documents.select(
        "doc_id",
        F.expr("size(spans)").cast("long").alias("n_spans"),
        F.expr(f"size({media})").cast("long").alias("n_media"),
        F.expr(n_ext(("png", "jpg", "jpeg", "gif"))).cast("long").alias("n_image"),
        F.expr(n_ext(("mp3", "wav", "flac"))).cast("long").alias("n_audio"),
        F.expr(n_ext(("mp4", "mkv", "webm"))).cast("long").alias("n_video"),
        F.expr(
            "aggregate(spans, 0L, (acc, s) -> acc + octet_length(coalesce(s.text, '')))"
        ).alias("text_bytes"),
        F.expr(
            # guard: ANSI division by zero on a spanless doc
            f"CASE WHEN size(spans) = 0 THEN 0.0 "
            f"ELSE round(size({media}) / size(spans), 4) END"
        ).alias("media_frac"),
    )
