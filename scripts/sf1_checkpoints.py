"""Refresh the BENCH/BASELINE.md appendix: sf1 (1M-doc) operator
checkpoints on local[32] — edge materialization, hub-skew backlinks,
connected components.  Prints one JSON line; paste/update the appendix
table from it (kept manual so the scaling section's writer never races)."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from obsidian_parser_spark.operators import analytics as A
from obsidian_parser_spark.operators.components import (
    component_count,
    connected_components,
)
from obsidian_parser_spark.plans.pipeline import GraphBuildOptions, build_graph
from obsidian_parser_spark.session import get_spark
from obsidian_parser_spark.sources.corpus import ensure_vault_corpus


def main() -> None:
    path = ensure_vault_corpus("sf1")
    spark = get_spark(master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(path).repartition(96).persist()
    n_docs = docs.count()

    out: dict[str, float | int] = {"n_docs": n_docs}

    t0 = time.perf_counter()
    g = build_graph(docs, GraphBuildOptions())
    edges = g.edges.persist()
    out["triples"] = edges.count()
    out["edges_sec"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    top = A.backlink_counts(edges).orderBy(F.desc("backlinks")).first()
    out["top_backlinks"] = top["backlinks"]
    out["backlinks_sec"] = round(time.perf_counter() - t0, 1)

    link_edges = A.link_edges(edges)
    t0 = time.perf_counter()
    out["n_components"] = component_count(
        connected_components(g.nodes, link_edges)
    ).collect()[0][0]
    out["cc_sec"] = round(time.perf_counter() - t0, 1)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
