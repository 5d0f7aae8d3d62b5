"""Deterministic hash sampling / splitting (partition-order independence —
the property randomSplit lacks)."""

from obsidian_parser_spark.operators.sampling import hash_sample, hash_split

SF_DIR = "/root/testdata/sf0.001"


def test_split_is_partition_order_independent(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = {(r.doc_id, r.split) for r in hash_split(docs).collect()}
    b = {
        (r.doc_id, r.split)
        for r in hash_split(docs.repartition(17, "lang")).collect()
    }
    assert a == b
    assert {s for _, s in a} == {"train", "valid", "test"}


def test_split_fractions_roughly_right(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    by = {r.split: r.c for r in hash_split(docs).groupBy("split").count()
          .withColumnRenamed("count", "c").collect()}
    assert abs(by["train"] / n - 0.8) < 0.06
    assert abs(by["valid"] / n - 0.1) < 0.05


def test_sample_is_subset_and_stable(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s1 = {r.doc_id for r in hash_sample(docs, 10).select("doc_id").collect()}
    s2 = {r.doc_id for r in hash_sample(docs, 20).select("doc_id").collect()}
    assert s1 < s2  # nested samples: a bigger pct strictly extends the set
