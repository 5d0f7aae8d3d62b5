"""Write-back sink (S6) + DOT export (S7).

Reference: ``flush`` / ``flush_content`` / ``flush_properties`` rebuild
``---\\n{yaml}\\n---\\n{content}`` and write to the note path
(src/note/note_write.rs:17-95).  Three surfaces here:

* ``render_raw``   — the raw text as a COLUMN (JVM-native), to be written
  wherever the caller points it (parquet, text files, an Iceberg table);
* ``flush_vault``  — per-note ``.md`` FILE write-back, the reference's
  actual flush semantics, distributed via an Arrow-batched writer stage
  (each task writes its partition's files to a shared filesystem — the
  only possible shape for a per-note sink);
* ``edges_to_dot`` — Graphviz export (petgraph::dot::Dot, README.md:78-80),
  including isolated nodes when a nodes frame is supplied.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.tokenize import reconstruct_text


def edges_to_dot(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    digraph: bool = True,
    max_edges: int = 100_000,
) -> str:
    """Graphviz DOT export (S7; the reference README shows petgraph::dot::Dot,
    README.md:78-80).  Driver-side collect — for small/filtered graphs or
    per-component exports; guard against accidentally collecting a 10^12-edge
    table.

    petgraph's ``Dot`` prints EVERY graph node (payload included), so
    isolated notes appear in the export — pass ``nodes`` to match that;
    edges-only output (nodes=None) drops orphans."""
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
    lines = []
    if nodes is not None:
        node_rows = nodes.select("doc_id").limit(max_edges + 1).collect()
        if len(node_rows) > max_edges:
            raise ValueError(
                f"node list exceeds max_edges={max_edges}; filter first"
            )
        lines += [
            f'    "{r.doc_id}" [ label = "{r.doc_id}" ];' for r in node_rows
        ]
    lines += [f'    "{r.subj}" {arrow} "{r.obj}";' for r in rows]
    body = "\n".join(lines)
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


def flush_vault(
    documents: DataFrame, out_root: str, mode: str = "flush"
) -> DataFrame:
    """Write each note back as ``<out_root>/<doc_id>.md`` — the engine's
    ``flush`` family (src/note/note_write.rs:17-95):

    * ``flush``       — write our properties + our content (:76-95);
    * ``content``     — keep the properties already ON DISK at the target,
                        replace the content (:17-38);
    * ``properties``  — keep the content on disk, replace the properties
                        (:42-72).

    The two merge modes re-read + re-parse the existing target file exactly
    like the reference (read_to_string + parse_note); a missing target or a
    NotFoundCloser parse error raises, mirroring the reference's error
    propagation.

    Returns a (doc_id, path) frame of written files — LAZY like every sink
    stage here: run an action (``.count()``/``.collect()``) to execute.
    Idempotent per note (full overwrite), so task retries are safe.
    """
    if mode not in ("flush", "content", "properties"):
        raise ValueError(f"unknown flush mode: {mode}")
    rendered = reconstruct_text(documents)
    root = os.path.abspath(out_root)

    def write_files(batches: Iterator) -> Iterator:
        import pandas as pd

        from ..functions.textops import split_frontmatter

        for pdf in batches:
            paths = []
            for doc_id, fm, content in zip(
                pdf["doc_id"], pdf["properties_yaml"], pdf["content"]
            ):
                path = os.path.join(root, doc_id + ".md")
                os.makedirs(os.path.dirname(path), exist_ok=True)
                out_fm = None if fm is None or pd.isna(fm) else fm
                out_content = content
                if mode != "flush":
                    with open(path, encoding="utf-8") as fh:  # errors like
                        # the reference's read_to_string on a missing target
                        old = fh.read()
                    old_fm, old_content, err = split_frontmatter(old)
                    if err is not None:
                        raise ValueError(f"{doc_id}: {err}")
                    if mode == "content":
                        out_fm = old_fm
                    else:  # properties
                        out_content = old_content
                text = (
                    out_content
                    if out_fm is None
                    else f"---\n{out_fm}\n---\n{out_content}"
                )
                with open(path, "w", encoding="utf-8") as fh:
                    fh.write(text)
                paths.append(path)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "path": paths})

    return rendered.mapInPandas(write_files, "doc_id string, path string")
