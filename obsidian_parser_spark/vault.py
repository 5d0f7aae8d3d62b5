"""Vault facade: the reference's public API surface, one-to-one, over the
distributed engine — so a user of ``obsidian_parser`` (Rust) can switch by
name.

Reference method → facade method (citations):

* ``VaultBuilder::new(path)…build_vault()``      → ``Vault.open(spark, path, …)``
  (src/vault/vault_open/mod.rs:60-151; include_hidden/min_depth/max_depth/
  filter_entry map to the same-named arguments)
* ``vault.notes()`` / ``count_notes()``           → ``.notes`` / ``.count_notes()``
  (src/vault/mod.rs:60-76)
* ``get_duplicates_notes_by_name`` / ``have_…``  → same names
  (src/vault/vault_duplicates.rs:21-56)
* ``get_duplicates_notes_by_content`` / ``have_…`` → same names (sha-256
  digest fixed, vault_duplicates.rs:62-100)
* ``get_digraph`` / ``par_get_digraph``          → ``.get_digraph()`` (the
  edges DataFrame — Spark parallelism subsumes the par_ variants,
  vault_petgraph/mod.rs:85-120)
* ``get_ungraph``                                 → ``.get_ungraph()``
  (undirected = symmetric closure, vault_petgraph/mod.rs:122-136)
* analyzer-example metrics (examples/analyzer.rs:65-95) →
  ``.total_word_count()`` / ``.count_components()`` / ``.knowledge_hub()``
  / ``.orphans()``
* ``Note::flush`` family (note_write.rs:17-95)    → ``.flush(out_root, mode)``
* petgraph DOT export (README.md:78-80)           → ``.to_dot()``

Everything returns DataFrames (or driver scalars where the reference
returns scalars); nothing is collected except the scalar methods.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import analytics as _A
from .operators.components import component_count, connected_components
from .operators.render import edges_to_dot, flush_vault
from .plans.pipeline import GraphBuild, GraphBuildOptions, build_graph
from .sources.files import read_vault_files


class Vault:
    """A built vault: notes + link graph, lazily evaluated."""

    def __init__(self, graph: GraphBuild, documents: DataFrame | None = None):
        self._g = graph
        self._documents = documents

    # -- construction --------------------------------------------------

    @classmethod
    def open(
        cls,
        spark: SparkSession,
        path: str,
        include_hidden: bool = False,
        follow_links: bool = False,
        follow_root_links: bool = True,
        min_depth: int = 1,
        max_depth: int | None = None,
        filter_entry: str | None = None,
        options: GraphBuildOptions | None = None,
        listing: str = "walk",
    ) -> "Vault":
        """File-mode open (VaultBuilder semantics, vault_open/mod.rs:60-151).

        ``listing``: 'walk' (driver listing), 'walk_distributed' (executor
        fan-out for 10^8-file vaults), or 'spark' (native file source)."""
        raw = read_vault_files(
            spark,
            path,
            include_hidden=include_hidden,
            follow_links=follow_links,
            follow_root_links=follow_root_links,
            min_depth=min_depth,
            max_depth=max_depth,
            path_filter=filter_entry,
            listing=listing,
        )
        return cls(build_graph(raw, options, raw_text=True))

    @classmethod
    def from_documents(
        cls, documents: DataFrame, options: GraphBuildOptions | None = None
    ) -> "Vault":
        """Span-table open (the engine's native Iceberg/parquet input)."""
        return cls(build_graph(documents, options), documents)

    # -- notes (src/vault/mod.rs:60-76) --------------------------------

    @property
    def notes(self) -> DataFrame:
        return self._g.nodes

    def count_notes(self) -> int:
        return self._g.nodes.count()

    # -- duplicates (vault_duplicates.rs:21-100) ------------------------

    def get_duplicates_notes_by_name(self) -> DataFrame:
        return _A.duplicates_by_name(self._g.nodes)

    def have_duplicates_notes_by_name(self) -> bool:
        return _A.have_duplicates_by_name(self._g.nodes)

    def get_duplicates_notes_by_content(self) -> DataFrame:
        return _A.duplicates_by_content(self._g.nodes)

    def have_duplicates_notes_by_content(self) -> bool:
        return self.get_duplicates_notes_by_content().limit(1).count() > 0

    # -- graphs (vault_petgraph/mod.rs:85-136) ---------------------------

    def get_digraph(self) -> DataFrame:
        """(subj, pred, obj, mention_ord) — direction subj→obj means 'subj
        links to obj' (vault_petgraph/mod.rs:73-75); per-occurrence
        multigraph with self-loops.  Spark parallelism subsumes the
        reference's par_get_digraph."""
        return _A.link_edges(self._g.edges)

    def get_ungraph(self) -> DataFrame:
        """Undirected view: symmetric closure of the digraph."""
        e = self.get_digraph()
        return e.unionByName(
            e.select(
                F.col("obj").alias("subj"),
                F.col("pred"),
                F.col("subj").alias("obj"),
                F.col("mention_ord"),
            )
        )

    @property
    def dangling(self) -> DataFrame:
        """Unresolved mentions (the reference drops them silently,
        graph_builder.rs:160-161 — surfaced here as a quarantine table)."""
        return self._g.dangling

    # -- analyzer metrics (examples/analyzer.rs:65-95) -------------------

    def total_word_count(self) -> int:
        return _A.total_word_count(self._g.nodes).collect()[0][0]

    def count_components(self) -> int:
        cc = connected_components(self._g.nodes, self.get_digraph())
        return component_count(cc).collect()[0][0]

    def knowledge_hub(self) -> DataFrame:
        return _A.knowledge_hub(self._g.edges)

    def orphans(self) -> DataFrame:
        return _A.orphans(self._g.nodes, self._g.edges)

    # -- engine extensions (beyond the reference API) ---------------------

    def pagerank(self, n_iter: int = 10) -> DataFrame:
        """(id, pr) — integer fixed-point PageRank over the link graph
        (engine extension; operators/pagerank.py)."""
        from .operators.pagerank import pagerank as _pr

        return _pr(self._g.nodes, self.get_digraph(), n_iter=n_iter)

    def hits(self, n_iter: int = 10) -> DataFrame:
        """(id, hub, authority) — integer fixed-point HITS (extension)."""
        from .operators.pagerank import hits as _hits

        return _hits(self._g.nodes, self.get_digraph(), n_iter=n_iter)

    def related_notes(
        self, min_shared: int = 2, max_target_df: int = 100
    ) -> DataFrame:
        """(a, b, shared) — bibliographic coupling pairs (extension)."""
        return _A.related_notes(
            self._g.edges, min_shared=min_shared, max_target_df=max_target_df
        )

    # -- sinks ------------------------------------------------------------

    def flush(self, out_root: str, mode: str = "flush") -> int:
        """Write every note back as <out_root>/<doc_id>.md
        (note_write.rs:17-95); returns the number of files written."""
        if self._documents is None:
            raise ValueError(
                "flush needs the span documents frame — open the vault with "
                "from_documents (file-mode vaults already have their files)"
            )
        return flush_vault(self._documents, out_root, mode=mode).count()

    def to_dot(self, digraph: bool = True, max_edges: int = 100_000) -> str:
        return edges_to_dot(
            self._g.edges, nodes=self._g.nodes, digraph=digraph, max_edges=max_edges
        )
