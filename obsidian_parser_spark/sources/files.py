"""File-mode vault scan (S1): a directory of ``.md`` files → raw-text frame.

Reference semantics (src/vault/vault_open/mod.rs:60-151):

* recursive walk; keep regular files with extension ``.md``
  ASCII-case-insensitively (``eq_ignore_ascii_case``, :66-70);
* skip entries whose FILE NAME starts with '.' unless ``include_hidden``
  (builder default false, :86-96) — the reference checks the entry name at
  every level, so a hidden directory hides its subtree;
* ``max_depth`` / ``min_depth`` (defaults ∞ / 1) count path components
  below the vault root;
* a user ``filter_entry`` closure prunes arbitrary entries
  (vault_open/mod.rs:97-124) — mapped here to ``path_filter``, a SQL
  boolean expression over the vault-relative path column ``rel``;
* ``doc_id`` = vault-relative path with the LAST extension dropped
  (graph_builder.rs:65-86: ``with_extension("")`` — ``a.tar.md`` → ``a.tar``).

Two listing modes:

* ``walk`` (default) — driver-side ``os.walk`` pre-listing (file listing is
  a driver-side step in Spark's own file index too); the file CONTENT read
  is distributed: the path list becomes a DataFrame and an Arrow-batched
  ``mapInPandas`` stage opens each file on the executors.  Exact reference
  parity: '_'-prefixed notes kept, dot-files resurfaceable via
  ``include_hidden`` — Spark's Hadoop-side HiddenFileFilter drops both
  unconditionally, even for explicitly enumerated paths.
* ``spark`` — Spark's native text reader with ``recursiveFileLookup``.
  Scales through the standard file-source machinery but inherits the
  HiddenFileFilter divergence (documented + tested).

All semantic filters (depth, hidden, ``path_filter``) are DataFrame
predicates over ``rel`` — one shared code path for both modes, evaluated
before the heavy tokenize.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MD_CASES = "*.{md,MD,Md,mD}"  # every ASCII case mix of 'md'


def _walk_md_files(root: str) -> list[str]:
    """Driver-side recursive listing of *.md ROOT-RELATIVE paths
    (ASCII-case-insensitive extension match, hidden entries INCLUDED —
    filtered later as DataFrame predicates so one code path serves both
    listing modes)."""
    out: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        rel_dir = os.path.relpath(dirpath, root)
        for fn in sorted(filenames):
            if fn.lower().endswith(".md"):
                out.append(fn if rel_dir == "." else f"{rel_dir}/{fn}")
    return out


def read_vault_files(
    spark: SparkSession,
    root: str,
    include_hidden: bool = False,
    min_depth: int = 1,
    max_depth: int | None = None,
    path_filter: str | None = None,
    listing: str = "walk",
) -> DataFrame:
    """→ (doc_id, raw_text).  Feed into ``tokenize_raw_text`` /
    ``build_graph(..., raw_text=True)``.

    ``path_filter``: SQL boolean expression over the column ``rel`` (the
    vault-relative path), e.g. ``"rel NOT LIKE 'archive/%'"`` — the
    Spark-declarative form of the reference's ``filter_entry`` closure.
    The reference's closure can prune whole subtrees during the walk; as a
    post-listing predicate this keeps identical keep/drop semantics (subtree
    pruning is a listing-cost optimization, not a semantic difference).
    """
    root = os.path.abspath(root).rstrip("/")
    if listing == "walk":
        rels = _walk_md_files(root)
        if not rels:
            return spark.createDataFrame([], "doc_id string, raw_text string")
        n_slices = min(len(rels), spark.sparkContext.defaultParallelism)
        paths_df = spark.createDataFrame(
            [(r,) for r in rels], "rel string"
        ).repartition(n_slices)

        def read_files(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                texts = []
                for rp in pdf["rel"]:
                    with open(
                        os.path.join(root, rp), encoding="utf-8"
                    ) as fh:  # UTF-8, hard error on invalid bytes — the
                        # reference's fs::read_to_string contract
                        texts.append(fh.read())
                yield pd.DataFrame({"rel": pdf["rel"], "raw_text": texts})

        df = paths_df.mapInPandas(read_files, "rel string, raw_text string")
    elif listing == "spark":
        if include_hidden:
            raise ValueError(
                "listing='spark' cannot resurface hidden files (Spark's "
                "HiddenFileFilter drops '.'/'_' paths at the index); use "
                "listing='walk'"
            )
        df = (
            spark.read.format("text")
            .option("wholetext", "true")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", _MD_CASES)
            .load(root)
            .select(
                F.input_file_name().alias("_path"),
                F.col("value").alias("raw_text"),
            )
        )
        # input_file_name() is a percent-encoded URI (%20 for spaces etc.).
        # Strip the scheme, protect literal '+' (URLDecoder would turn it
        # into a space), percent-decode, then drop the root PREFIX BY LENGTH
        # — never by regex/substring match, which breaks on regex
        # metacharacters in the root and on a repeated root substring deeper
        # in the tree (/vault/sub/vault/x.md).
        decoded = F.url_decode(
            F.regexp_replace(
                F.regexp_replace(
                    F.col("_path"), "^[a-zA-Z][a-zA-Z0-9+.-]*:(//)?", ""
                ),
                r"\+",
                "%2B",
            )
        )
        df = df.select(
            decoded.substr(F.lit(len(root) + 2), F.lit(2**31 - 1)).alias("rel"),
            "raw_text",
        )
    else:
        raise ValueError(f"unknown listing mode: {listing}")

    parts = F.split(F.col("rel"), "/")
    depth = F.size(parts)
    df = df.filter(depth >= min_depth)
    if max_depth is not None:
        df = df.filter(depth <= max_depth)
    if not include_hidden:
        # any component starting with '.' hides the subtree (walkdir filter)
        df = df.filter(
            F.size(F.filter(parts, lambda p: p.startswith("."))) == 0
        )
    if path_filter is not None:
        df = df.filter(F.expr(path_filter))
    # drop the LAST extension only (graph_builder.rs:65-86)
    doc_id = F.regexp_replace(F.col("rel"), r"\.[^./]*$", "")
    return df.select(doc_id.alias("doc_id"), "raw_text")
