"""Corpus generator: determinism + the FIXTURES.md §1 span-sequence invariant."""

import os

import duckdb
import pandas as pd
import pytest

from obsidian_parser_spark.functions.textops import split_frontmatter
from obsidian_parser_spark.sources.corpus import (
    DOCUMENTS_SCHEMA,
    ensure_vault_corpus,
    generate_vault_corpus,
    micro_vault_rows,
    num_files_for_sf,
    spans_from_raw,
)


def test_num_files_scaling():
    assert num_files_for_sf("sf0.001") == 1000
    assert num_files_for_sf("sf0.01") == 10000
    assert num_files_for_sf("sf0.1") == 100000


def test_spans_from_raw_roundtrip():
    raw = "---\ntags: [a]\n---\nText ![[i.png]] more [[x|y]] [m](z.md) tail"
    row = spans_from_raw("d", raw)
    props, content, _ = split_frontmatter(raw)
    fm = [s for s in row["spans"] if s["kind"] == "frontmatter"]
    assert len(fm) == 1 and fm[0]["offset"] == 0 and fm[0]["text"] == props
    body = "".join(s["text"] for s in row["spans"] if s["kind"] != "frontmatter")
    assert body == content
    kinds = [s["kind"] for s in row["spans"]]
    assert kinds == [
        "frontmatter", "text", "embed", "text", "wikilink", "text", "mdlink", "text",
    ]
    offsets = [s["offset"] for s in row["spans"]]
    assert offsets == list(range(len(offsets)))


def test_micro_vault_rows_shape():
    rows = micro_vault_rows()
    assert [r["doc_id"] for r in rows] == ["main", "link", "data/main"]
    assert all(
        [s["offset"] for s in r["spans"]] == list(range(len(r["spans"])))
        for r in rows
    )


def test_generation_deterministic_and_invariants(tmp_path):
    p1 = tmp_path / "a.parquet"
    p2 = tmp_path / "b.parquet"
    generate_vault_corpus(str(p1), 300, seed=42)
    generate_vault_corpus(str(p2), 300, seed=42)
    assert p1.read_bytes() == p2.read_bytes()

    con = duckdb.connect()
    df = con.sql(f"select * from read_parquet('{p1}')").df()
    n_dups = len([i for i in range(300) if i % 97 == 0])
    n_iso = len(range(0, 300, 199))
    assert len(df) == 300 + n_dups + n_iso

    for _, row in df.iterrows():
        spans = row["spans"]
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
        fm = [s for s in spans if s["kind"] == "frontmatter"]
        assert len(fm) <= 1
        if fm:
            assert fm[0]["offset"] == 0
        for s in spans:
            if s["kind"] == "media":
                assert s["media_ref"] is not None and s["text"] == ""

    # doc_ids unique
    assert df["doc_id"].is_unique


def test_ensure_idempotent(tmp_path):
    p = ensure_vault_corpus("sf0.0001", base=str(tmp_path))
    mtime = os.path.getmtime(p)
    p2 = ensure_vault_corpus("sf0.0001", base=str(tmp_path))
    assert p == p2 and os.path.getmtime(p2) == mtime
