"""spark-submit entrypoint: vault documents → bucketed KG tables + metrics.

The north-rule deployment shape:

    python scripts/make_pyfiles.py                       # build the zip once
    spark-submit --master <cluster> \\
        --py-files dist/obsidian_parser_spark.zip \\
        scripts/submit_job.py \\
        --input  /path/to/documents.parquet \\
        --output /path/to/kg_out \\
        --run-id run1 --buckets 64

The job is the same code path the library exposes (`materialize_graph`):
tokenize → entity-link → bucketed nodes/edges parquet with a per-bucket
lineage manifest.  Re-submitting with the same (--output, --run-id) resumes,
skipping buckets already marked done.  Prints one JSON metrics line.

Works identically under plain `python` (it builds its own local session
when spark-submit hasn't provided one).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, spans)")
    ap.add_argument("--output", required=True, help="output dir for nodes/edges/manifest")
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--rebuild-dict", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from obsidian_parser_spark.plans.materialize import materialize_graph, read_graph

    spark = SparkSession.builder.appName("kg-materialize").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.perf_counter()
    docs = spark.read.parquet(args.input)
    result = materialize_graph(
        spark,
        docs,
        args.output,
        run_id=args.run_id,
        n_buckets=args.buckets,
        resume=not args.no_resume,
        rebuild_dict=args.rebuild_dict,
    )
    nodes, edges = read_graph(spark, args.output)
    print(
        json.dumps(
            {
                "metric": "kg_materialize",
                "unit": "sec",
                "value": round(time.perf_counter() - t0, 3),
                "run_id": args.run_id,
                "buckets_processed": result.buckets_processed,
                "buckets_skipped": result.buckets_skipped,
                "n_nodes": nodes.count(),
                "n_edges": edges.count(),
                "nodes_path": result.nodes_path,
                "edges_path": result.edges_path,
                "manifest_path": result.manifest_path,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
