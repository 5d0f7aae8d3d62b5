"""Tokenize stage: interleaved-span documents → note-level frame.

One native (JVM/codegen) reconstruction step + ONE Arrow-batched Python
stage (``mapInPandas``) per job — no per-row Python UDFs anywhere
(BASELINE.json input_hint mandate).

Dataflow:
  documents(doc_id, spans)
    --[native: array filter/sort/transform/join]-->   (doc_id, properties_yaml, content)
    --[mapInPandas: textops.tokenize_batch]-->        notes frame (no raw content)

The heavy span array never crosses the JVM→Python boundary: frontmatter and
content are reconstructed as two strings natively, and raw content is
dropped inside the Python stage (only counts + sha come back).

Reference parity: SURVEY.md §2.2 P1-P12; citations in functions/textops.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textops import split_frontmatter_frame, tokenize_batch

NOTES_SCHEMA = (
    "doc_id string, parse_error string, tags array<string>, "
    "aliases array<string>, is_todo boolean, word_count long, "
    "byte_count long, content_sha string, is_empty boolean, "
    "mentions array<struct<pred:string,target:string>>, "
    "props map<string,string>"
)

# content = concat of non-frontmatter span texts in offset order; media spans
# carry text='' so they contribute nothing (FIXTURES.md §1 invariant).
_CONTENT_EXPR = """
array_join(
  transform(
    array_sort(
      filter(spans, s -> s.kind != 'frontmatter'),
      (l, r) -> CASE WHEN l.offset < r.offset THEN -1
                     WHEN l.offset > r.offset THEN 1 ELSE 0 END
    ),
    s -> coalesce(s.text, '')
  ),
  ''
)
"""

# try_element_at: NULL (no frontmatter) instead of an ANSI error on empty.
_FRONTMATTER_EXPR = "try_element_at(filter(spans, s -> s.kind = 'frontmatter'), 1).text"


def reconstruct_text(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans) → (doc_id, properties_yaml, content), all JVM-side."""
    return documents.select(
        F.col("doc_id"),
        F.expr(_FRONTMATTER_EXPR).alias("properties_yaml"),
        F.expr(_CONTENT_EXPR).alias("content"),
    )


def media_refs(documents: DataFrame) -> DataFrame:
    """(doc_id, media_ref, kind, offset) for spans carrying an opaque media
    payload reference — the multimodal operators' input."""
    s = documents.select(
        "doc_id", F.explode("spans").alias("s")
    ).filter(F.col("s.media_ref").isNotNull())
    return s.select(
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.kind").alias("kind"),
        F.col("s.offset").alias("offset"),
    )


def _with_note_name(notes: DataFrame) -> DataFrame:
    # note_name = file stem (src/note/mod.rs:79-86); doc_id is extension-free.
    parts = F.split(F.col("doc_id"), "/")
    return notes.withColumn("note_name", F.element_at(parts, -1)).withColumn(
        "n_segments", F.size(parts)
    )


def tokenize_documents(
    documents: DataFrame, include_mdlinks: bool = True
) -> DataFrame:
    """Span documents → notes frame (single Arrow-batched Python stage)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield tokenize_batch(pdf, include_mdlinks=include_mdlinks)

    notes = reconstruct_text(documents).mapInPandas(run, schema=NOTES_SCHEMA)
    return _with_note_name(notes)


def tokenize_raw_text(
    raw: DataFrame, include_mdlinks: bool = True
) -> DataFrame:
    """Raw-markdown ingest path: (doc_id, raw_text) → notes frame.

    Runs the reference's frontmatter split (P1, src/note/parser.rs:58-76)
    before tokenizing — used for file-mode vaults and parity fixtures.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            split = split_frontmatter_frame(pdf["raw_text"])
            split.insert(0, "doc_id", pdf["doc_id"])
            yield tokenize_batch(split, include_mdlinks=include_mdlinks)

    return _with_note_name(raw.mapInPandas(run, schema=NOTES_SCHEMA))


def mentions_from_notes(notes: DataFrame) -> DataFrame:
    """Explode ordered mentions: (subj, mention_ord, pred, raw_target).

    One row per link OCCURRENCE — the reference graph is a multigraph with
    self-loops (src/vault/vault_petgraph/graph_builder.rs:213-218)."""
    return notes.select(
        F.col("doc_id").alias("subj"),
        F.posexplode("mentions").alias("mention_ord", "m"),
    ).select("subj", "mention_ord", F.col("m.pred").alias("pred"), F.col("m.target").alias("raw_target"))


def tag_triples(notes: DataFrame) -> DataFrame:
    """(subj, mention_ord, pred='tagged', obj=tag) — frontmatter tags first,
    duplicates kept (src/note/note_tags.rs:60)."""
    return notes.select(
        F.col("doc_id").alias("subj"),
        F.posexplode("tags").alias("mention_ord", "obj"),
    ).select("subj", "mention_ord", F.lit("tagged").alias("pred"), "obj")
