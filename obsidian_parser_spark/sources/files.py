"""File-mode vault scan (S1): a directory of ``.md`` files → raw-text frame.

Reference semantics (src/vault/vault_open/mod.rs:60-151):

* recursive walk; keep regular files with extension ``.md``
  ASCII-case-insensitively (``eq_ignore_ascii_case``, :66-70);
* skip entries whose FILE NAME starts with '.' unless ``include_hidden``
  (builder default false, :86-96) — the reference checks the entry name at
  every level, so a hidden directory hides its subtree;
* ``max_depth`` / ``min_depth`` (defaults ∞ / 1) count path components
  below the vault root;
* ``doc_id`` = vault-relative path with the LAST extension dropped
  (graph_builder.rs:65-86: ``with_extension("")`` — ``a.tar.md`` → ``a.tar``).

Spark mapping: ``spark.read.format("text").option("wholetext", true)`` with
``recursiveFileLookup`` — one file per row, filters applied as DataFrame
predicates on the relative path (evaluated before the heavy tokenize).
Hidden-file filtering is partly done by Spark itself (it skips dot-files at
the source level), so ``include_hidden=True`` cannot resurface them — noted
below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_vault_files(
    spark: SparkSession,
    root: str,
    include_hidden: bool = False,
    min_depth: int = 1,
    max_depth: int | None = None,
) -> DataFrame:
    """→ (doc_id, raw_text).  Feed into ``tokenize_raw_text`` /
    ``build_graph(..., raw_text=True)``.

    Note: Spark's file index always skips paths starting with '.' or '_'
    (driver-side HiddenFileFilter), so ``include_hidden=True`` only disables
    OUR filter and cannot expose files Spark itself hides — a documented
    divergence from the reference's ``include_hidden`` option.
    """
    root = root.rstrip("/")
    df = (
        spark.read.format("text")
        .option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.{md,MD,Md,mD}")
        .load(root)
        .select(
            F.input_file_name().alias("_path"),
            F.col("value").alias("raw_text"),
        )
    )
    rel = F.regexp_replace(
        F.regexp_replace(F.col("_path"), "^file:(//)?", ""), # scheme
        F.lit(root + "/"),
        F.lit(""),
    )
    df = df.withColumn("_rel", rel)
    parts = F.split(F.col("_rel"), "/")
    depth = F.size(parts)
    df = df.filter(depth >= min_depth)
    if max_depth is not None:
        df = df.filter(depth <= max_depth)
    if not include_hidden:
        # any component starting with '.' hides the subtree (walkdir filter)
        df = df.filter(
            F.size(F.filter(parts, lambda p: p.startswith("."))) == 0
        )
    # drop the LAST extension only (graph_builder.rs:65-86)
    doc_id = F.regexp_replace(F.col("_rel"), r"\.[^./]*$", "")
    return df.select(doc_id.alias("doc_id"), "raw_text")
