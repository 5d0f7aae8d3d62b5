"""Write-back sink (S6): re-serialize documents to raw Obsidian markdown.

Reference: ``flush`` / ``flush_content`` / ``flush_properties`` rebuild
``---\\n{yaml}\\n---\\n{content}`` and write to the note path
(src/note/note_write.rs:17-95).  Our sink renders the same raw text as a
column (JVM-native) to be written wherever the caller points it (parquet,
text files, an Iceberg table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.tokenize import reconstruct_text


def edges_to_dot(edges: DataFrame, digraph: bool = True, max_edges: int = 100_000) -> str:
    """Graphviz DOT export (S7; the reference README shows petgraph::dot::Dot,
    README.md:78-80).  Driver-side collect — for small/filtered graphs or
    per-component exports; guard against accidentally collecting a 10^12-edge
    table."""
    rows = (
        edges.filter("pred != 'tagged'")
        .select("subj", "obj")
        .limit(max_edges + 1)
        .collect()
    )
    if len(rows) > max_edges:
        raise ValueError(
            f"edge list exceeds max_edges={max_edges}; filter first "
            "(e.g. one component) — DOT is not a distributed sink"
        )
    arrow = "->" if digraph else "--"
    kind = "digraph" if digraph else "graph"
    body = "\n".join(f'    "{r.subj}" {arrow} "{r.obj}";' for r in rows)
    return f"{kind} vault {{\n{body}\n}}\n"


def render_raw(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans) → (doc_id, raw_text) with frontmatter fences
    restored (note_write.rs:56-62 layout)."""
    r = reconstruct_text(documents)
    return r.select(
        "doc_id",
        F.when(
            F.col("properties_yaml").isNotNull(),
            F.concat(
                F.lit("---\n"),
                F.col("properties_yaml"),
                F.lit("\n---\n"),
                F.col("content"),
            ),
        )
        .otherwise(F.col("content"))
        .alias("raw_text"),
    )
