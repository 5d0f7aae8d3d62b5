"""Per-stage isolation bench + plan capture (guide §1.4/§7.2).

NOT the frozen driver bench — bench.py stays the measured artifact.  This
harness rebuilds the exact same frames bench.py times, then for each
requested stage either

  * times N repeats of the stage action (same action as bench.py), or
  * writes `.explain("formatted")` to plans/r06/<stage>_<tag>.txt.

Usage:
    python bench_extra.py time  [stage ...]          # default: all stages
    python bench_extra.py plan  <tag> [stage ...]    # tag = before|after
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_EXTRA_REPEAT (default 2)
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    tag = None
    args = sys.argv[2:]
    if mode == "plan":
        tag = args[0]
        args = args[1:]
    only = set(args)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeat = int(os.environ.get("BENCH_EXTRA_REPEAT", "2"))
    sf_name = os.path.basename(os.path.normpath(sf_dir))

    from obsidian_parser_spark.operators import analytics as A
    from obsidian_parser_spark.operators import dedup as DD
    from obsidian_parser_spark.operators import events as EV
    from obsidian_parser_spark.operators import graph_metrics as GM
    from obsidian_parser_spark.operators import linking as LK
    from obsidian_parser_spark.operators import similarity as SIM
    from obsidian_parser_spark.operators import structure as ST
    from obsidian_parser_spark.operators import textstats as TS
    from obsidian_parser_spark.operators.components import (
        component_count,
        connected_components,
    )
    from obsidian_parser_spark.operators.sampling import domain_mixture
    from obsidian_parser_spark.operators.tokenize import reconstruct_text
    from obsidian_parser_spark.operators.walks import deterministic_walks
    from obsidian_parser_spark.plans.pipeline import GraphBuildOptions, build_graph
    from obsidian_parser_spark.session import get_spark
    from obsidian_parser_spark.sources.corpus import ensure_vault_corpus

    corpus_path = ensure_vault_corpus(sf_name)
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name=f"bench-extra-{sf_name}",
        shuffle_partitions=cpus * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(corpus_path).repartition(cpus * 3).persist()
    docs.count()

    g = build_graph(docs, GraphBuildOptions())
    g.nodes.count()
    edges = g.edges.persist()
    edges.count()
    vault_text = (
        reconstruct_text(docs)
        .select(F.col("doc_id").alias("doc_id"), F.col("content").alias("text"))
        .persist()
    )
    vault_text.count()

    # stage -> lazy DataFrame factory (the frame whose computation the bench
    # stage times; actions that collect tiny results use the same frame)
    def _mixture_in():
        return vault_text.select(
            "doc_id",
            F.expr("size(filter(split(text, '\\\\s+'), x -> x != ''))")
            .cast("long")
            .alias("n_tokens"),
        )

    stages: dict = {
        "kg_backlinks": lambda: A.backlink_counts(edges),
        "kg_analytics_hub": lambda: A.knowledge_hub(edges),
        "kg_analytics_dupc": lambda: A.duplicates_by_content(g.nodes),
        "kg_analytics_orph": lambda: A.orphans(g.nodes, edges),
        "kg_components": lambda: component_count(
            connected_components(g.nodes, A.link_edges(edges))
        ),
        "kg_triangles": lambda: GM.triangle_counts(A.link_edges(edges)).agg(
            F.sum("n_triangles")
        ),
        "kg_walks": lambda: deterministic_walks(A.link_edges(edges), n_steps=3)
        .groupBy("step")
        .count(),
        "kg_mentions": lambda: LK.unlinked_mentions(
            docs, g.alias_dict, edges.filter(F.col("pred") != "tagged")
        ).agg(F.sum("n_mentions")),
        "dd_minhash_vault": lambda: DD.minhash_lsh_pairs(
            vault_text, k=8, bands=4, id_col="doc_id", hash_fn="xxh"
        ),
        "ts_quality_vault": lambda: TS.quality_scores(vault_text).agg(
            F.sum("quality")
        ),
        "ts_gopher_vault": lambda: TS.gopher_rules(vault_text).agg(
            F.sum(F.col("keep").cast("long")), F.sum("alpha_bp")
        ),
        "ts_c4_vault": lambda: TS.c4_line_stats(vault_text).agg(
            F.sum(F.col("keep").cast("long")), F.sum("cleaned_chars")
        ),
        "ts_mixture_vault": lambda: domain_mixture(_mixture_in(), rate_bp=2500).agg(
            F.sum(F.col("selected").cast("long")), F.max("cum_tokens")
        ),
        "ts_fingerprint_vault": lambda: TS.fingerprints(vault_text).agg(
            F.sum("fingerprint")
        ),
        "dd_dupspans_vault": lambda: DD.duplicated_spans(
            vault_text, n=8, min_docs=2
        ).agg(F.sum("n_docs")),
        "ts_bpe_vault": lambda: TS.bpe_merges(vault_text, n_merges=4).agg(
            F.sum("n")
        ),
        "kg_structure_outline": lambda: ST.outline(
            vault_text.select("doc_id", F.col("text").alias("content"))
        ).agg(F.sum("level")),
        "kg_structure_fields": lambda: ST.inline_fields(
            vault_text.select("doc_id", F.col("text").alias("content"))
        ),
        "dd_incremental_vault": lambda: DD.incremental_jaccard_pairs(
            vault_text.filter(~F.col("doc_id").startswith("dup/")),
            vault_text.filter(F.col("doc_id").startswith("dup/")),
            id_col="doc_id",
        ),
    }
    if os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        stages.update(
            {
                "ann_topk": lambda: SIM.brute_force_topk(
                    emb, k=10, n_queries=10
                ).agg(F.sum("score")),
                "ann_kmeans": lambda: SIM.kmeans_assign(emb, k=8, n_iter=4).agg(
                    F.sum("d2")
                ),
                "ann_pq_structured": lambda: SIM.pq_topk(
                    SIM.structured_embeddings(emb, dim=64),
                    dim=64,
                    m=4,
                    k_cb=16,
                    n_iter=4,
                ).agg(F.sum("adc_d2")),
                "ev_sessionize": lambda: EV.sessionize(ev).agg(
                    F.sum("value_cents")
                ),
            }
        )

    names = [n for n in stages if not only or n in only]

    if mode == "plan":
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            df = stages[name]()
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join("plans/r06", f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(p)
            print(f"wrote {path}")
        spark.stop()
        return

    timings: dict[str, list] = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        for _ in range(repeat):
            t0 = time.perf_counter()
            df = stages[name]()
            # noop sink computes every column (guide §1.4); tiny agg frames
            # cost the same either way
            df.write.format("noop").mode("overwrite").save()
            timings.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: timings[name]}), flush=True)
    print(json.dumps({"stage_times": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
