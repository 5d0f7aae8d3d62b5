"""File-mode vault scan (S1 semantics) + DOT export (S7) + A3 boolean."""

import os

import pytest

from obsidian_parser_spark.operators.analytics import have_duplicates_by_name
from obsidian_parser_spark.operators.render import edges_to_dot
from obsidian_parser_spark.plans.pipeline import build_graph, reference_parity_options
from obsidian_parser_spark.sources.corpus import spans_from_raw
from obsidian_parser_spark.sources.files import read_vault_files
from tests.util import spans_df


@pytest.fixture()
def vault_dir(tmp_path):
    """The reference micro-vault as real files (src/vault/vault_test.rs:13-36)
    plus scan-behavior cases (vault_open/mod.rs:265-537)."""
    (tmp_path / "data").mkdir()
    (tmp_path / ".hidden").mkdir()
    (tmp_path / "main.md").write_text(
        "---\ntopic: work\ncreated: 15-04-2006\n---\nMain data. Other [[data/main|main]]"
    )
    (tmp_path / "link.md").write_text("---\ntopic: kinl\ncreated: 15-04-2006\n---\n[[main]]")
    (tmp_path / "data" / "main.md").write_text("New main. [[link]]")
    (tmp_path / "notmd.txt").write_text("ignored")
    (tmp_path / "upper.MD").write_text("case insensitive [[main]]")
    (tmp_path / "archive.tar.md").write_text("double ext")
    (tmp_path / ".hidden" / "h.md").write_text("[[main]]")
    return str(tmp_path)


def test_file_scan_semantics(spark, vault_dir):
    df = read_vault_files(spark, vault_dir)
    ids = sorted(r.doc_id for r in df.select("doc_id").collect())
    # .md case-insensitive kept; .txt ignored; hidden dir skipped;
    # only LAST extension dropped (a.tar.md -> a.tar)
    assert ids == ["archive.tar", "data/main", "link", "main", "upper"]

    g = build_graph(df, reference_parity_options(), raw_text=True)
    triples = sorted((r.subj, r.obj) for r in g.edges.collect())
    assert ("main", "data/main") in triples and ("link", "main") in triples
    assert ("upper", "main") in triples


def test_file_scan_depth_and_hidden(spark, vault_dir):
    shallow = read_vault_files(spark, vault_dir, max_depth=1)
    ids = {r.doc_id for r in shallow.collect()}
    assert "data/main" not in ids and "main" in ids


def test_include_hidden_resurfaces_dotfiles(spark, vault_dir):
    """vault_open/mod.rs:86-96: include_hidden=true must expose dot-files —
    requires the walk listing (Spark's index hides them unconditionally)."""
    df = read_vault_files(spark, vault_dir, include_hidden=True)
    ids = {r.doc_id for r in df.collect()}
    assert ".hidden/h" in ids and "main" in ids
    with pytest.raises(ValueError, match="resurface"):
        read_vault_files(spark, vault_dir, include_hidden=True, listing="spark")


def test_underscore_files_not_hidden(spark, tmp_path):
    """The reference hides only '.'-prefixed entries; Spark's file index also
    hides '_' — the walk listing restores parity (vault_open/mod.rs:126-151)."""
    (tmp_path / "_draft.md").write_text("underscore note")
    (tmp_path / "plain.md").write_text("plain")
    ids = {
        r.doc_id for r in read_vault_files(spark, str(tmp_path)).collect()
    }
    assert ids == {"_draft", "plain"}
    spark_ids = {
        r.doc_id
        for r in read_vault_files(spark, str(tmp_path), listing="spark").collect()
    }
    assert spark_ids == {"plain"}  # documented Spark-index divergence


def test_path_filter_predicate(spark, vault_dir):
    """filter_entry equivalent (vault_open/mod.rs:97-124): user predicate
    over the vault-relative path."""
    df = read_vault_files(spark, vault_dir, path_filter="rel NOT LIKE 'data/%'")
    ids = {r.doc_id for r in df.collect()}
    assert "data/main" not in ids and "main" in ids


def test_doc_id_derivation_hostile_paths(spark, tmp_path):
    """ADVICE r1: regex metacharacters in the root, a repeated root-name
    segment deeper in the tree, spaces and '+' in file names — none may
    corrupt doc_ids."""
    root = tmp_path / "v+a(ul)t [1]"
    (root / "sub" / root.name).mkdir(parents=True)
    (root / "a b.md").write_text("space name")
    (root / "c+d.md").write_text("plus name")
    (root / "sub" / root.name / "x.md").write_text("repeated root segment")
    ids = sorted(r.doc_id for r in read_vault_files(spark, str(root)).collect())
    assert ids == ["a b", "c+d", f"sub/{root.name}/x"]


def test_dot_export(spark, micro_vault):
    g = build_graph(micro_vault, reference_parity_options())
    dot = edges_to_dot(g.edges)
    assert dot.startswith("digraph")
    assert '"main" -> "data/main";' in dot
    assert dot.count("->") == 3
    undirected = edges_to_dot(g.edges, digraph=False)
    assert undirected.startswith("graph") and "--" in undirected


def test_dot_export_guard(spark, micro_vault):
    g = build_graph(micro_vault, reference_parity_options())
    with pytest.raises(ValueError, match="max_edges"):
        edges_to_dot(g.edges, max_edges=1)


def test_dot_includes_isolated_nodes(spark, micro_vault):
    """petgraph's Dot prints every node (README.md:78-80), so orphans must
    appear when a nodes frame is passed."""
    g = build_graph(micro_vault, reference_parity_options())
    dot = edges_to_dot(g.edges, nodes=g.nodes)
    for r in g.nodes.select("doc_id").collect():
        assert f'"{r.doc_id}" [ label = ' in dot
    assert '"main" -> "data/main";' in dot


def test_flush_roundtrip(spark, micro_vault, tmp_path):
    """S6: flush_vault writes per-note .md files whose re-scan tokenizes to
    the identical notes frame (note_write.rs:76-95 → vault_open)."""
    from obsidian_parser_spark.operators.render import flush_vault
    from obsidian_parser_spark.operators.tokenize import tokenize_documents

    out = tmp_path / "flushed"
    written = flush_vault(micro_vault, str(out)).collect()
    assert len(written) == micro_vault.count()
    rescanned = read_vault_files(spark, str(out))
    cols = ["doc_id", "word_count", "byte_count", "content_sha", "tags"]
    orig = sorted(
        map(tuple, tokenize_documents(micro_vault).select(*cols).collect())
    )
    back = sorted(
        map(
            tuple,
            build_graph(rescanned, reference_parity_options(), raw_text=True)
            .nodes.select(*cols)
            .collect(),
        )
    )
    assert orig == back


def test_flush_content_and_properties_modes(spark, tmp_path):
    """note_write.rs:17-72: 'content' keeps on-disk properties, 'properties'
    keeps on-disk content."""
    from obsidian_parser_spark.operators.render import flush_vault

    out = tmp_path / "vault"
    out.mkdir()
    (out / "n.md").write_text("---\nkept: yes\n---\nold body")
    doc = spans_df(spark, [spans_from_raw("n", "---\nmine: new\n---\nnew body")])
    flush_vault(doc, str(out), mode="content").collect()
    assert (out / "n.md").read_text() == "---\nkept: yes\n---\nnew body"
    flush_vault(doc, str(out), mode="properties").collect()
    assert (out / "n.md").read_text() == "---\nmine: new\n---\nnew body"
    flush_vault(doc, str(out), mode="flush").collect()
    assert (out / "n.md").read_text() == "---\nmine: new\n---\nnew body"


def test_have_duplicates_by_name(spark):
    dup = spans_df(
        spark, [spans_from_raw("file", "x"), spans_from_raw("folder/file", "y")]
    )
    nodup = spans_df(spark, [spans_from_raw("a", "x"), spans_from_raw("b", "y")])
    g1 = build_graph(dup, reference_parity_options())
    g2 = build_graph(nodup, reference_parity_options())
    assert have_duplicates_by_name(g1.nodes) is True
    assert have_duplicates_by_name(g2.nodes) is False


@pytest.fixture()
def symlink_vault(tmp_path):
    """Vault with every symlink case the reference's walkdir options cover
    (vault_open/mod.rs:86-96): symlinked file, symlinked subdir, symlink
    loop back to the root, and a sibling-dir symlink (diamond)."""
    v = tmp_path / "vault"
    outside = tmp_path / "outside"
    v.mkdir()
    outside.mkdir()
    (v / "dira").mkdir()
    (v / "plain.md").write_text("[[x]]")
    (v / "dira" / "a.md").write_text("a")
    (outside / "ext.md").write_text("external")
    (v / "sl.md").symlink_to(v / "plain.md")  # symlinked file
    (v / "linked").symlink_to(outside)  # symlinked dir
    (v / "dira" / "loop").symlink_to(v)  # loop to root
    (v / "dirb").symlink_to(v / "dira")  # sibling diamond
    return str(v)


def _ids(spark, root, **kw):
    return sorted(
        r.doc_id for r in read_vault_files(spark, root, **kw).collect()
    )


def test_symlinks_not_followed_by_default(spark, symlink_vault):
    # walkdir follow_links=false: symlinked FILES dropped (not is_file()),
    # symlinked dirs not descended
    assert _ids(spark, symlink_vault) == ["dira/a", "plain"]


def test_symlinks_followed(spark, symlink_vault):
    # follow_links=true: symlinked file + dir resolve; the root loop is
    # skipped by the ancestor identity check (walkdir Err -> dropped); the
    # sibling diamond duplicates dira's subtree under dirb/ (walkdir parity:
    # a non-ancestor target is traversed again)
    assert _ids(spark, symlink_vault, follow_links=True) == [
        "dira/a",
        "dirb/a",
        "linked/ext",
        "plain",
        "sl",
    ]


def test_follow_root_links(spark, symlink_vault, tmp_path):
    entry = tmp_path / "entry"
    entry.symlink_to(tmp_path / "vault")
    # default follow_root_links=True: a symlinked root is followed
    assert _ids(spark, str(entry)) == ["dira/a", "plain"]
    # =False: nothing below min_depth 1
    assert _ids(spark, str(entry), follow_root_links=False) == []
    # a REAL root is unaffected by the flag
    assert _ids(spark, symlink_vault, follow_root_links=False) == ["dira/a", "plain"]


@pytest.mark.parametrize("follow", [False, True])
def test_distributed_listing_matches_driver_walk(
    spark, symlink_vault, vault_dir, follow
):
    for root in (symlink_vault, vault_dir):
        assert _ids(spark, root, listing="walk_distributed", follow_links=follow) == _ids(
            spark, root, listing="walk", follow_links=follow
        )


def test_walk_survives_pathological_depth(tmp_path):
    """The listing is iterative (explicit stack): a deeply nested vault
    lists fine even under a recursion limit far below its depth — a
    per-level recursive walk would raise RecursionError."""
    import sys

    from obsidian_parser_spark.sources.files import _walk_md_files

    depth = 600
    p = tmp_path / "deep"
    cur = str(p)
    os.mkdir(cur)  # os.makedirs is itself recursive — build iteratively
    for _ in range(depth):
        cur = os.path.join(cur, "d")
        os.mkdir(cur)
    (p / "top.md").write_text("x")
    with open(os.path.join(cur, "leaf.md"), "w") as f:
        f.write("y")
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(200)  # << depth: recursion per level would die
    try:
        rels = _walk_md_files(str(p))
    finally:
        sys.setrecursionlimit(old)
    assert "top.md" in rels
    assert any(r.endswith("/leaf.md") and r.count("/") == depth for r in rels)
