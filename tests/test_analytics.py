"""A1-A11 analytics semantics (SURVEY.md §2.4) on small fixtures."""

from obsidian_parser_spark.operators import analytics as A
from obsidian_parser_spark.plans.pipeline import GraphBuildOptions, build_graph
from obsidian_parser_spark.sources.corpus import spans_from_raw
from tests.util import spans_df


def _graph(spark, rows, **kw):
    opts = GraphBuildOptions(
        include_mdlinks=False, use_aliases=False, include_tag_triples=False, **kw
    )
    return build_graph(spans_df(spark, rows), opts)


def test_backlinks_outdegree_hub(spark):
    rows = [
        spans_from_raw("a", "[[b]] [[b]] [[c]]"),
        spans_from_raw("b", "[[c]]"),
        spans_from_raw("c", ""),
    ]
    g = _graph(spark, rows)
    bl = {r.id: r.backlinks for r in A.backlink_counts(g.edges).collect()}
    assert bl == {"b": 2, "c": 2}
    od = {r.id: r.out_degree for r in A.out_degree(g.edges).collect()}
    assert od == {"a": 3, "b": 1}
    # undirected degrees: a=3, b=3, c=2 → hub = a (tie a/b broken by id)
    hub = A.knowledge_hub(g.edges).collect()[0]
    assert (hub.id, hub.degree) == ("a", 3)


def test_orphans(spark):
    rows = [
        spans_from_raw("a", "[[b]]"),
        spans_from_raw("b", ""),
        spans_from_raw("lonely", "no links"),
        spans_from_raw("ghost_linker", "[[nonexistent]]"),
    ]
    g = _graph(spark, rows)
    assert sorted(r.doc_id for r in A.orphans(g.nodes, g.edges).collect()) == [
        "ghost_linker",
        "lonely",
    ]


def test_duplicates_by_name_and_content(spark):
    """vault_duplicates.rs:119-143 / :195-215: 'file' + 'folder/file', same
    content → both detectors fire; first-seen kept."""
    rows = [
        spans_from_raw("file", "same text"),
        spans_from_raw("folder/file", "same text"),
        spans_from_raw("other", "unique"),
    ]
    g = _graph(spark, rows)
    by_name = A.duplicates_by_name(g.nodes).collect()
    assert [(r.doc_id, r.note_name) for r in by_name] == [("folder/file", "file")]
    by_content = A.duplicates_by_content(g.nodes).collect()
    assert [r.doc_id for r in by_content] == [("folder/file")]


def test_word_counts_and_summary(spark):
    rows = [
        spans_from_raw("a", "---\ntags: [todo]\n---\none two three [[b]]"),
        spans_from_raw("b", "four five"),
    ]
    g = _graph(spark, rows)
    assert A.total_word_count(g.nodes).collect()[0].total_words == 6
    s = A.graph_summary(g.nodes, g.edges, g.dangling).collect()[0]
    assert (s.n_notes, s.n_link_edges, s.n_dangling, s.n_todo) == (2, 1, 0, 1)


def test_degree_distribution(spark):
    rows = [
        spans_from_raw("a", "[[b]]"),
        spans_from_raw("b", "[[a]]"),
        spans_from_raw("c", ""),
    ]
    g = _graph(spark, rows)
    dist = {r.degree: r.n_notes for r in A.degree_distribution(g.edges).collect()}
    assert dist == {2: 2}  # a and b each have undirected degree 2


def test_related_notes_coupling_and_hub_cap(spark):
    from obsidian_parser_spark.operators.analytics import related_notes

    rows = [
        ("n1", "links_to", "t1"), ("n1", "links_to", "t2"),
        ("n2", "links_to", "t1"), ("n2", "links_to", "t2"),
        ("n3", "links_to", "t3"),
        # hub target linked by all three: df 3 > cap 2 → contributes nothing
        ("n1", "links_to", "hub"), ("n2", "links_to", "hub"), ("n3", "links_to", "hub"),
        # duplicate occurrence must not double-count (distinct targets)
        ("n1", "links_to", "t2"),
        ("n9", "tagged", "t1"),  # tag triples excluded from the link graph
    ]
    edges = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {(r.a, r.b): r.shared for r in related_notes(
        edges, min_shared=2, max_target_df=2
    ).collect()}
    assert got == {("n1", "n2"): 2}
