"""Generate QUERIES.md — an index of every driver-contract query: name,
one-line description (from the _q_* docstring), backing operator family,
and oracle status.  Run after adding queries: `python scripts/gen_queries_md.py`.
"""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
)
E = importlib.util.module_from_spec(spec)
spec.loader.exec_module(E)


def one_line(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    if not doc:
        return ""
    line = " ".join(doc.split("\n\n")[0].split())
    return line


def main() -> None:
    qs = E.queries()
    oracles = E.oracle_sql()
    fams = {
        "kg": "knowledge graph (vault corpus)",
        "dd": "deduplication",
        "ann": "approximate nearest neighbor",
        "ts": "text stats / curation",
        "ev": "events",
        "pipe": "composed pipelines",
    }
    lines = [
        "# QUERIES — driver-contract index (auto-generated)",
        "",
        f"{len(qs)} queries, {len(oracles)} with independent DuckDB oracles",
        "(triple-checked by the driver: row count + schema + value hash).",
        "Regenerate with `python scripts/gen_queries_md.py`.",
        "",
        "| query | family | oracle | description |",
        "|---|---|---|---|",
    ]
    for name in sorted(qs):
        fam = fams.get(name.split("_")[0], "?")
        orc = "DuckDB" if name in oracles else "—"
        lines.append(f"| `{name}` | {fam} | {orc} | {one_line(qs[name])} |")
    with open(os.path.join(REPO, "QUERIES.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"QUERIES.md: {len(qs)} queries")


if __name__ == "__main__":
    main()
