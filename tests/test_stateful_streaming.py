"""Stateful streaming: running backlink counts accumulate across micro-batches."""

import pyspark.sql.functions as F
from pyspark.sql import types as T

from obsidian_parser_spark.streaming.stateful import running_backlinks

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
    ]
)


def test_running_backlinks_accumulates(spark, tmp_path):
    in_dir = str(tmp_path / "edges_in")
    batch1 = [("a", "links_to", "x"), ("b", "links_to", "x"), ("a", "tagged", "t")]
    batch2 = [("c", "links_to", "x"), ("c", "embeds", "y")]
    spark.createDataFrame(batch1, EDGE_SCHEMA).write.parquet(f"{in_dir}/b1")
    spark.createDataFrame(batch2, EDGE_SCHEMA).write.parquet(f"{in_dir}/b2")

    stream = (
        spark.readStream.schema(EDGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force at least two micro-batches
        .parquet(f"{in_dir}/*")
    )
    out = running_backlinks(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_bl")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM running_bl").collect()
    # final totals: x=3 (tagged excluded), y=1; memory sink in update mode
    # appends every update, so take the max per key
    totals = {}
    for r in rows:
        totals[r.obj] = max(totals.get(r.obj, 0), r.backlinks)
    assert totals == {"x": 3, "y": 1}
    # x must have been updated across at least two micro-batches
    x_updates = sorted(r.backlinks for r in rows if r.obj == "x")
    assert len(x_updates) >= 2 and x_updates[-1] == 3
    assert any(r.batch_delta < r.backlinks for r in rows if r.obj == "x")
