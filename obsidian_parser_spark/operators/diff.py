"""Incremental KG maintenance: the edge-level delta between two vault
versions.

The reference engine rebuilds its petgraph from scratch on every run
(src/vault/vault_petgraph/graph_builder.rs — there is no incremental
path); at 100 TB a from-scratch rebuild per edit batch is the wrong
shape, so the engine exposes the delta as a first-class operator:

* ``graph_diff(edges_old, edges_new)`` — per-occurrence edge multisets
  compared by (subj, pred, obj) count; rows where the count changed come
  back with ``n_old``/``n_new`` and ``op`` ∈ {add, del, chg}.

Scale shape: each side collapses to (triple, n) with a map-side-combined
groupBy — the shuffle moves distinct triples, not occurrences — and the
full-outer join runs on the SAME key, so the aggregation exchanges are
reused and the join adds no third shuffle.  Nothing touches the driver.

Why the diff takes two full edge sets rather than re-resolving only
changed docs: link resolution is a JOIN against the first-wins alias
dictionary, and deleting or adding one note can flip a dictionary
winner, silently rewiring edges of UNTOUCHED docs (e.g. removing
``note_7`` re-routes every ``[[note_7]]`` in the vault to dangling).
The expensive per-doc stage (Arrow tokenize) is incremental by nature —
unchanged docs hit the persisted notes frame — but resolution is global
and cheap (one broadcast/shuffle join), so the correct unit of
incrementality is "re-run resolution, diff the result", not "patch the
edge list".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def graph_diff(edges_old: DataFrame, edges_new: DataFrame) -> DataFrame:
    """(subj, pred, obj, n_old, n_new, op) for every triple whose
    occurrence count differs between the two builds."""
    o = edges_old.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).alias("n_old")
    )
    n = edges_new.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    return (
        o.join(n, ["subj", "pred", "obj"], "full_outer")
        .select(
            "subj",
            "pred",
            "obj",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .filter(F.col("n_old") != F.col("n_new"))
        .withColumn(
            "op",
            F.when(F.col("n_old") == 0, F.lit("add"))
            .when(F.col("n_new") == 0, F.lit("del"))
            .otherwise(F.lit("chg")),
        )
    )
