"""File-mode vault scan (S1): a directory of ``.md`` files → raw-text frame.

Reference semantics (src/vault/vault_open/mod.rs:60-151):

* recursive walk; keep regular files with extension ``.md``
  ASCII-case-insensitively (``eq_ignore_ascii_case``, :66-70);
* skip entries whose FILE NAME starts with '.' unless ``include_hidden``
  (builder default false, :86-96) — the reference checks the entry name at
  every level, so a hidden directory hides its subtree;
* ``follow_links`` (walkdir default false, vault_open/mod.rs:90): symlinks
  are NOT followed — a symlinked subdirectory is not descended and a
  symlinked ``.md`` file is dropped (walkdir's ``file_type().is_file()`` is
  false for an unfollowed symlink).  With ``follow_links=True`` symlinks
  resolve to their targets; loops are detected via the walkdir rule (a
  symlink whose target's (dev, inode) identity matches an ancestor
  directory is skipped — walkdir yields an Err there, which the reference
  drops via ``filter_map(Result::ok)``).
* ``follow_root_links`` (walkdir default TRUE, :91): the vault root itself,
  if a symlink, IS followed even when ``follow_links`` is false; with
  ``follow_root_links=False`` a symlinked root yields nothing below
  ``min_depth`` 1.
* ``max_depth`` / ``min_depth`` (defaults ∞ / 1) count path components
  below the vault root;
* a user ``filter_entry`` closure prunes arbitrary entries
  (vault_open/mod.rs:97-124) — mapped here to ``path_filter``, a SQL
  boolean expression over the vault-relative path column ``rel``;
* ``doc_id`` = vault-relative path with the LAST extension dropped
  (graph_builder.rs:65-86: ``with_extension("")`` — ``a.tar.md`` → ``a.tar``).

Three listing modes:

* ``walk`` (default) — driver-side recursive listing (file listing is a
  driver-side step in Spark's own file index too); the file CONTENT read
  is distributed: the path list becomes a DataFrame and an Arrow-batched
  ``mapInPandas`` stage opens each file on the executors.  Exact reference
  parity: '_'-prefixed notes kept, dot-files resurfaceable via
  ``include_hidden`` — Spark's Hadoop-side HiddenFileFilter drops both
  unconditionally, even for explicitly enumerated paths.
* ``walk_distributed`` — same semantics, but the recursive walk itself
  fans out across executors, one task per TOP-LEVEL directory (the vault's
  first-level dirs partition the tree).  The driver does a single
  ``listdir`` of the root; each executor walks its subtree with the same
  extension/symlink rules.  Crossover: the driver walk is one thread doing
  one ``readdir`` per directory — fine to ~10^6 files; past that (10^8-file
  vaults) the listing itself is hours of driver time, while the
  distributed walk is bounded by the largest single subtree.  Skew note: a
  vault with one giant top-level dir degenerates to one task — shard on a
  deeper prefix in that case (the helper accepts any (dir, rel-prefix)
  seed list).
* ``spark`` — Spark's native text reader with ``recursiveFileLookup``.
  Scales through the standard file-source machinery but inherits the
  HiddenFileFilter divergence (documented + tested).

All semantic filters (depth, hidden, ``path_filter``) are DataFrame
predicates over ``rel`` — one shared code path for all modes, evaluated
before the heavy tokenize.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MD_CASES = "*.{md,MD,Md,mD}"  # every ASCII case mix of 'md'


def _ident(path: str) -> tuple[int, int]:
    """(device, inode) identity — the walkdir loop-check key."""
    st = os.stat(path)
    return (st.st_dev, st.st_ino)


def _walk_subtree(
    dirpath: str,
    prefix: str,
    follow_links: bool,
    ancestors: frozenset[tuple[int, int]],
) -> list[str]:
    """Iterative ``.md`` listing of one directory subtree (explicit stack
    — Python recursion would die at ~1000 nested dirs; walkdir and
    os.walk are iterative); returns ``prefix``-relative paths.  Hidden
    entries INCLUDED — filtered later as DataFrame predicates so one code
    path serves every listing mode.

    Symlink semantics = walkdir's (module docstring): unfollowed symlinks
    are neither descended nor yielded; followed symlinked dirs are skipped
    when their target identity matches an ancestor (loop).  ``ancestors``
    carries the (dev, inode) of every directory on the path INCLUDING the
    seed — callers fanning subtrees out must seed it with the identities
    above the subtree (root, top-level dir) so a symlink pointing back
    above the seed is still caught."""
    out: list[str] = []
    stack: list[tuple[str, str, frozenset[tuple[int, int]]]] = [
        (dirpath, prefix, ancestors)
    ]
    while stack:
        # pop from the END of a reversed-sorted sibling push → children
        # are visited in sorted order, depth-first (same order as the
        # recursive formulation; only the traversal order of SIBLING
        # subtrees affects `out`, which callers treat as a set)
        d, pre, anc = stack.pop()
        try:
            names = sorted(os.listdir(d))
        except OSError:
            continue
        subdirs: list[tuple[str, str, frozenset[tuple[int, int]]]] = []
        for name in names:
            p = os.path.join(d, name)
            is_link = os.path.islink(p)
            if os.path.isdir(p):  # stat follows the link for the type check
                if is_link and not follow_links:
                    continue
                try:
                    iid = _ident(p)
                except OSError:
                    continue
                if is_link and iid in anc:
                    continue  # walkdir loop Err → filter_map drops it
                subdirs.append((p, f"{pre}{name}/", anc | {iid}))
            else:
                if is_link and not follow_links:
                    continue  # unfollowed symlink is not is_file()
                if not os.path.isfile(p):
                    continue  # broken symlink / special file
                if name.lower().endswith(".md"):
                    out.append(pre + name)
        stack.extend(reversed(subdirs))
    return out


def _walk_md_files(
    root: str, follow_links: bool = False, follow_root_links: bool = True
) -> list[str]:
    """Driver-side recursive listing of *.md ROOT-RELATIVE paths
    (ASCII-case-insensitive extension match)."""
    if os.path.islink(root) and not follow_root_links:
        # walkdir yields the root symlink entry itself (depth 0, excluded
        # by min_depth 1) and does not descend
        return []
    try:
        seed = frozenset({_ident(root)})
    except OSError:
        return []
    return _walk_subtree(root, "", follow_links, seed)


def read_vault_files(
    spark: SparkSession,
    root: str,
    include_hidden: bool = False,
    follow_links: bool = False,
    follow_root_links: bool = True,
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
        rels = _walk_md_files(root, follow_links, follow_root_links)
        if not rels:
            return spark.createDataFrame([], "doc_id string, raw_text string")
        n_slices = min(len(rels), spark.sparkContext.defaultParallelism)
        paths_df = spark.createDataFrame(
            [(r,) for r in rels], "rel string"
        ).repartition(n_slices)
    elif listing == "walk_distributed":
        paths_df = _distributed_listing(spark, root, follow_links, follow_root_links)
        if paths_df is None:
            return spark.createDataFrame([], "doc_id string, raw_text string")
        # rebalance before the content read: without this, one giant
        # top-level directory's rels stay in ONE listing partition and a
        # single task would open every file under it
        paths_df = paths_df.repartition(spark.sparkContext.defaultParallelism)
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

    if listing in ("walk", "walk_distributed"):

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


def _distributed_listing(
    spark: SparkSession,
    root: str,
    follow_links: bool,
    follow_root_links: bool,
) -> DataFrame | None:
    """Executor-fanned listing: ONE driver readdir of the root, then each
    top-level directory walked on an executor (``_walk_subtree`` with the
    same symlink rules, loop seed = root + subtree identities).  Top-level
    ``.md`` files are the driver's (they were already listed).  Returns a
    (rel string) frame, or None for an empty vault."""
    if os.path.islink(root) and not follow_root_links:
        return None
    try:
        root_id = _ident(root)
        names = sorted(os.listdir(root))
    except OSError:
        return None
    top_files: list[str] = []
    top_dirs: list[str] = []
    for name in names:
        p = os.path.join(root, name)
        is_link = os.path.islink(p)
        if os.path.isdir(p):
            if is_link and not follow_links:
                continue
            if is_link and _ident(p) == root_id:
                continue  # immediate loop to the root
            top_dirs.append(name)
        elif (
            (not is_link or follow_links)
            and os.path.isfile(p)
            and name.lower().endswith(".md")
        ):
            top_files.append(name)

    frames = []
    if top_files:
        frames.append(spark.createDataFrame([(r,) for r in top_files], "rel string"))
    if top_dirs:
        dirs_df = spark.createDataFrame(
            [(d,) for d in top_dirs], "top string"
        ).repartition(min(len(top_dirs), spark.sparkContext.defaultParallelism))

        def walk_tops(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                rels: list[str] = []
                for top in pdf["top"]:
                    p = os.path.join(root, top)
                    try:
                        seed = frozenset({root_id, _ident(p)})
                    except OSError:
                        continue
                    rels.extend(
                        _walk_subtree(p, f"{top}/", follow_links, seed)
                    )
                yield pd.DataFrame({"rel": rels})

        frames.append(dirs_df.mapInPandas(walk_tops, "rel string"))
    if not frames:
        return None
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out
