"""Training-data export sinks.

The last stage of a curation pipeline: ship the filtered/deduped/chunked
corpus as sharded JSONL (the de-facto LLM training interchange).  Pure
Spark writers — sharding is delegated to ``maxRecordsPerFile`` so the
executor-parallel write needs no extra shuffle, and every shard is written
atomically by the file-commit protocol (a killed job leaves no partial
shard visible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    max_docs_per_shard: int = 10_000,
    compression: str = "gzip",
    coalesce_to: int | None = None,
    partition_by: str | None = None,
) -> None:
    """Write ``df`` as gzipped JSONL shards of at most
    ``max_docs_per_shard`` rows each.

    ``maxRecordsPerFile`` splits within each task, so shard size is capped
    regardless of partition skew; ``coalesce_to`` optionally bounds the
    shard COUNT from below-fragmentation (many tiny partitions → many tiny
    shards) without a shuffle.  Overwrite mode: re-running a failed export
    is idempotent."""
    w = df.coalesce(coalesce_to) if coalesce_to else df
    writer = (
        w.write.mode("overwrite")
        .option("maxRecordsPerFile", max_docs_per_shard)
        .option("compression", compression)
    )
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.json(path)


def read_jsonl_corpus(spark, path: str, schema=None) -> DataFrame:
    """Read a JSONL corpus — the inverse of ``write_jsonl_shards`` (also
    accepts externally-produced JSONL).  Pass an explicit ``schema``
    (e.g. ``sources.schema.DOCUMENTS_SCHEMA`` for span documents): at
    10^12 documents schema inference is a full extra scan, and on an
    empty/partial shard set it silently infers a wrong shape — never
    infer in production paths."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


_URI_ESCAPES = (
    ("%", "%25"),  # first — escapes must not re-escape their own output
    (" ", "%20"), ("<", "%3C"), (">", "%3E"), ('"', "%22"),
    ("|", "%7C"), ("^", "%5E"), ("`", "%60"),
    ("{", "%7B"), ("}", "%7D"), ("\\", "%5C"),
)


def _uri_escape(col):
    from pyspark.sql import functions as F

    c = col
    for ch, code in _URI_ESCAPES:
        c = F.replace(c, F.lit(ch), F.lit(code))
    return c


def to_ntriples(edges) -> "DataFrame":
    """(subj, pred, obj) edge rows → one-column (line) N-Triples export,
    DISTINCT — the W3C interchange format every RDF/KG toolchain
    ingests, so the engine's triples load straight into a triple store.
    Note ids become ``<urn:note:...>`` URIs (percent-escaped per the
    IRI character rules, '%' first so escapes don't re-escape); tag
    objects are UTF-8 string LITERALS with backslash/quote escaping —
    tags are labels, not nodes.

    Pure string expressions (chained replace + concat, no regex, no
    Python), so the export is byte-identical across engines and the
    whole serialization is SQL-oracle-checkable; the DISTINCT is one
    map-side-combinable shuffle."""
    from pyspark.sql import functions as F

    s = F.concat(F.lit("<urn:note:"), _uri_escape(F.col("subj")), F.lit(">"))
    p = F.concat(F.lit("<urn:rel:"), F.col("pred"), F.lit(">"))
    # ECHAR set: backslash FIRST, then quote and the control characters
    # N-Triples forbids raw inside literals (\n \r \t)
    lit = F.col("obj")
    for ch, esc in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                    ("\r", "\\r"), ("\t", "\\t")):
        lit = F.replace(lit, F.lit(ch), F.lit(esc))
    o = F.when(
        F.col("pred") == "tagged", F.concat(F.lit('"'), lit, F.lit('"'))
    ).otherwise(F.concat(F.lit("<urn:note:"), _uri_escape(F.col("obj")), F.lit(">")))
    return (
        edges.select(
            F.concat(s, F.lit(" "), p, F.lit(" "), o, F.lit(" .")).alias("line")
        ).distinct()
    )
