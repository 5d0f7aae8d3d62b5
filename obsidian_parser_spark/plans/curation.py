"""End-to-end training-data curation plan.

One call composes the curation operators into the standard LLM
data-pipeline shape over a ``documents(doc_id, text)`` corpus:

    quality gate → Gopher repetition gate → exact dedup → MinHash-LSH
    candidates → exact-Jaccard verification (default on — a drop is
    permanent, so band-collision false positives must not drop docs) →
    transitive clusters (keeper-wins) → PII scrub →
    deterministic train/valid/test split → context-window chunking

Every gate records a ``drop_reason`` instead of filtering eagerly, so the
whole audit is ONE aggregation over the annotated frame (no per-gate
count() actions — at 10^12 docs each extra action is a full pipeline
re-execution) and every dropped doc is attributable.  First matching
reason wins, evaluated in gate order — a doc that is both low-quality and
a duplicate reports ``low_quality``.

All stages are the already-oracle-checked operators; this module only
wires them, so the plan inherits their scale shapes (map-side partial
aggs, inverted-index candidate generation, hub caps, no Python in any
plan)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    dedup_clusters,
    exact_duplicates,
    lsh_verified_pairs,
    minhash_lsh_pairs,
)
from ..operators.sampling import hash_split
from ..operators.textstats import (
    chunk_documents,
    quality_scores,
    repetition_stats,
    scrubbed_text,
)


@dataclass
class CurationOptions:
    min_quality: float = 0.2  # composite score gate (quality_scores)
    drop_repetitive: bool = True  # Gopher repetition thresholds
    near_dup: bool = True  # MinHash-LSH transitive clusters
    # verify LSH candidates with the exact distinct-shingle Jaccard before
    # clustering (default ON): raw band collisions include false positives,
    # and a curation drop is PERMANENT — without verification a non-duplicate
    # doc caught in a boilerplate band is lost from the corpus
    near_dup_verify: bool = True
    jaccard_threshold: float = 0.8
    minhash_k: int = 12
    minhash_bands: int = 4
    # 'xxh' (scale default) or 'md5' (cross-engine oracle-portable)
    minhash_hash_fn: str = "xxh" 
    scrub_pii: bool = True
    chunk_chars: int = 2048
    chunk_overlap: int = 128
    # sequence packing of the surviving chunks (operators/packing.py):
    # None = off; an int = token budget per training sequence — adds
    # (shard, n_tokens, pack_id) to the chunk frame so the shard/pack
    # assignment ships with the data
    pack_budget_tokens: int | None = None
    pack_shards: int | None = None  # None = auto-size from token volume
    train_pct: int = 80
    valid_pct: int = 10
    # cache the (doc_id, text) projection: the gates are independent
    # explode/agg pipelines, so the input is scanned ~5x (quality, lines,
    # bigrams, exact-hash, shingles).  On a RAM-comfortable cluster persist
    # pays for itself; at 100 TB leave False and let the columnar scans
    # re-read object storage (caching the corpus is not an option there).
    persist_input: bool = False


@dataclass
class CurationResult:
    docs: DataFrame  # (doc_id, text, drop_reason, split) — full audit frame
    chunks: DataFrame  # (doc_id, split, chunk_id, chunk_text) — survivors only
    metrics: DataFrame  # (drop_reason, n_docs) incl. kept
    # the (possibly persisted) input projection — exposed so a long-lived
    # app can `result.input.unpersist()` after consuming the outputs
    # (otherwise persist_input=True would pin executor storage forever)
    input: DataFrame | None = None


def curate(documents: DataFrame, opts: CurationOptions | None = None) -> CurationResult:
    """Annotate → audit → emit.  Lazy end to end: nothing executes until an
    action on one of the returned frames."""
    opts = opts or CurationOptions()
    d = documents.select("doc_id", "text")
    if opts.persist_input:
        d = d.persist()

    q = quality_scores(d).select("doc_id", "quality")
    r = repetition_stats(d).select("doc_id", "is_repetitive")
    exact = exact_duplicates(d).select("doc_id", F.lit(True).alias("_exact_dup"))
    annotated = (
        d.join(q, "doc_id")
        .join(r, "doc_id")
        .join(exact, "doc_id", "left")
    )
    if opts.near_dup:
        if opts.near_dup_verify:
            pairs = lsh_verified_pairs(
                d,
                threshold=opts.jaccard_threshold,
                k=opts.minhash_k,
                bands=opts.minhash_bands,
                hash_fn=opts.minhash_hash_fn,
            ).select("a", "b")
        else:
            pairs = minhash_lsh_pairs(
                d,
                k=opts.minhash_k,
                bands=opts.minhash_bands,
                hash_fn=opts.minhash_hash_fn,
            )
        near = dedup_clusters(pairs).filter(~F.col("is_keeper")).select(
            "doc_id", F.lit(True).alias("_near_dup")
        )
        annotated = annotated.join(near, "doc_id", "left")
    else:
        annotated = annotated.withColumn("_near_dup", F.lit(None).cast("boolean"))

    reason = (
        F.when(F.col("quality") < opts.min_quality, F.lit("low_quality"))
        .when(
            F.col("is_repetitive") if opts.drop_repetitive else F.lit(False),
            F.lit("repetitive"),
        )
        .when(F.coalesce("_exact_dup", F.lit(False)), F.lit("exact_duplicate"))
        .when(F.coalesce("_near_dup", F.lit(False)), F.lit("near_duplicate"))
        .otherwise(F.lit("kept"))
    )
    docs = annotated.withColumn("drop_reason", reason)
    docs = hash_split(docs, train_pct=opts.train_pct, valid_pct=opts.valid_pct)
    docs = docs.select("doc_id", "text", "drop_reason", "split")

    metrics = docs.groupBy("drop_reason").agg(F.count("*").alias("n_docs"))

    kept = docs.filter(F.col("drop_reason") == "kept")
    if opts.scrub_pii:
        kept = kept.withColumn("text", scrubbed_text("text"))
    chunks = chunk_documents(
        kept, chunk_chars=opts.chunk_chars, overlap=opts.chunk_overlap
    )
    # split is a pure function of doc_id — re-derive it on the chunk frame
    # instead of joining back to `kept`, which would execute the whole
    # annotation pipeline a SECOND time (once as chunk lineage, once as the
    # join's right side) plus a shuffle
    chunks = hash_split(
        chunks, train_pct=opts.train_pct, valid_pct=opts.valid_pct
    ).select("doc_id", "split", "chunk_id", "chunk_text")
    if opts.pack_budget_tokens is not None:
        from ..operators.packing import pack_chunks

        chunks = pack_chunks(
            chunks,
            budget_tokens=opts.pack_budget_tokens,
            n_shards=opts.pack_shards,
            group_cols=("split",),  # a pack never straddles the split
        )

    return CurationResult(docs=docs, chunks=chunks, metrics=metrics, input=d)


def curate_to_shards(
    documents: DataFrame,
    out_path: str,
    opts: CurationOptions | None = None,
    max_docs_per_shard: int = 10_000,
) -> CurationResult:
    """``curate`` + ship: write the surviving chunks as gzip JSONL shards
    partitioned by split (``out_path/split=train/...``), shard size capped
    by ``maxRecordsPerFile`` — the standard training-data layout, readable
    back with ``spark.read.json(out_path)`` (split restored from the
    partition directory).  Idempotent overwrite; returns the audit frames
    so the caller can persist metrics beside the shards."""
    from ..operators.export import write_jsonl_shards

    res = curate(documents, opts)
    write_jsonl_shards(
        res.chunks,
        out_path,
        max_docs_per_shard=max_docs_per_shard,
        partition_by="split",
    )
    return res


def fineweb_annotate(
    documents: DataFrame,
    jaccard_threshold: float = 0.8,
    minhash_k: int = 12,
    minhash_bands: int = 4,
    minhash_hash_fn: str = "md5",
    lang: str = "en",
) -> DataFrame:
    """Per-document audit of the PUBLISHED web-curation pipeline shape
    (FineWeb / RefinedWeb order): language gate → Gopher Table-A1 quality
    rules → C4 line-cleaning keep proxy → exact dedup → MinHash-LSH
    near-dedup with exact-Jaccard verification.  First matching gate
    wins, evaluated in pipeline order, so every drop is attributable to
    the stage that would actually have removed it.

    → (doc_id, pred_lang, gopher_keep, c4_keep, exact_dup, near_dup,
    drop_reason ∈ {language, gopher, c4, exact_duplicate,
    near_duplicate, kept}).

    Differences from the published stacks are environmental and
    deliberate: language id is the n-gram marker heuristic (no fastText
    model in-image) and the text-extraction / URL-filter stages don't
    apply to an already-extracted corpus.  Every stage is an existing
    oracle-checked operator; this function only wires them, so the plan
    inherits their scale shapes (single-projection gates, md5
    hash-partition exact dedup, df-capped banded LSH — never all-pairs,
    candidates-only verification, distributed-CC clusters).

    Like :func:`curate`, gates ANNOTATE instead of filtering, so the
    whole audit is one pass and the near-dup stage still sees docs an
    earlier gate dropped — matching the published pipelines, which dedup
    the post-filter corpus, is a one-line filter before the LSH stage;
    the audit keeps all docs visible so the reason table is complete."""
    from ..operators.textstats import c4_line_stats, gopher_rules, lang_id

    d = documents.select("doc_id", "text")
    li = lang_id(d).select("doc_id", "pred_lang")
    g = gopher_rules(d).select("doc_id", F.col("keep").alias("gopher_keep"))
    c4 = c4_line_stats(d).select("doc_id", F.col("keep").alias("c4_keep"))
    ex = exact_duplicates(d).select("doc_id", F.lit(True).alias("_exact"))
    near = (
        dedup_clusters(
            lsh_verified_pairs(
                d,
                threshold=jaccard_threshold,
                k=minhash_k,
                bands=minhash_bands,
                hash_fn=minhash_hash_fn,
            ).select("a", "b")
        )
        .filter(~F.col("is_keeper"))
        .select("doc_id", F.lit(True).alias("_near"))
    )
    ann = (
        d.select("doc_id")
        .join(li, "doc_id")
        .join(g, "doc_id")
        .join(c4, "doc_id")
        .join(ex, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            "pred_lang",
            "gopher_keep",
            "c4_keep",
            F.coalesce("_exact", F.lit(False)).alias("exact_dup"),
            F.coalesce("_near", F.lit(False)).alias("near_dup"),
        )
    )
    reason = (
        F.when(F.col("pred_lang") != lang, F.lit("language"))
        .when(~F.col("gopher_keep"), F.lit("gopher"))
        .when(~F.col("c4_keep"), F.lit("c4"))
        .when(F.col("exact_dup"), F.lit("exact_duplicate"))
        .when(F.col("near_dup"), F.lit("near_duplicate"))
        .otherwise(F.lit("kept"))
    )
    return ann.withColumn("drop_reason", reason)
