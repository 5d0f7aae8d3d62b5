"""Vault facade: the reference's public API names, end-to-end on both
ingest modes (file directory + span table)."""

import pytest

from obsidian_parser_spark.plans.pipeline import reference_parity_options
from obsidian_parser_spark.vault import Vault


def test_facade_over_span_documents(spark, micro_vault, tmp_path):
    v = Vault.from_documents(micro_vault, reference_parity_options())
    assert v.count_notes() == 3
    assert v.get_digraph().count() == 3  # golden vault_petgraph/mod.rs:155-161
    assert v.get_ungraph().count() == 6
    assert v.have_duplicates_notes_by_name() is True  # main vs data/main
    assert v.have_duplicates_notes_by_content() is False
    assert v.total_word_count() > 0
    assert v.count_components() == 1
    hub = v.knowledge_hub().collect()
    assert len(hub) == 1
    dot = v.to_dot()
    assert dot.startswith("digraph") and '"main"' in dot

    n = v.flush(str(tmp_path / "out"))
    assert n == 3
    assert (tmp_path / "out" / "data" / "main.md").exists()


def test_facade_file_mode(spark, tmp_path):
    (tmp_path / "a.md").write_text("[[b]]")
    (tmp_path / "b.md").write_text("---\ntags: [x]\n---\nhello")
    (tmp_path / "skip.md").write_text("[[a]]")
    v = Vault.open(spark, str(tmp_path), filter_entry="rel <> 'skip.md'")
    assert v.count_notes() == 2
    edges = {(r.subj, r.obj) for r in v.get_digraph().collect()}
    assert edges == {("a", "b")}
    assert v.orphans().count() == 0
    with pytest.raises(ValueError, match="from_documents"):
        v.flush(str(tmp_path / "o"))


def test_vault_extension_analytics(spark, micro_vault):
    """Engine-extension accessors: pagerank / hits / related_notes run off
    the same graph the facade already built."""
    from obsidian_parser_spark.vault import Vault

    v = Vault.from_documents(micro_vault)
    pr = {r.id: r.pr for r in v.pagerank(n_iter=3).collect()}
    assert set(pr) == {"main", "link", "data/main"}
    assert all(p > 0 for p in pr.values())
    h = v.hits(n_iter=3).collect()
    assert {r.id for r in h} == set(pr)
    assert v.related_notes(min_shared=1).count() >= 0
