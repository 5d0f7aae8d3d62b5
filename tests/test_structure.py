"""Markdown structure extraction — outline, task items, inline fields,
fuzzy link suggestions — against hand-built fixtures."""

from pyspark.sql import functions as F

from obsidian_parser_spark.operators.structure import (
    fuzzy_link_suggestions,
    inline_fields,
    outline,
    task_items,
)


def _content(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, content string")


def test_outline_levels_and_order(spark):
    c = _content(
        spark,
        [
            ("a", "# top\nfiller\n## mid one\ntext\n### deep\n## mid two\n"),
            ("b", "no headings here\n#tag is not a heading\n"
                  "####### seven hashes is not a heading\n"),
        ],
    )
    got = sorted(map(tuple, outline(c).collect()))
    assert got == [
        ("a", 1, 1, "top"),
        ("a", 2, 2, "mid one"),
        ("a", 3, 3, "deep"),
        ("a", 4, 2, "mid two"),
    ]


def test_task_items_checked_state(spark):
    c = _content(
        spark,
        [
            ("a", "- [ ] first\nplain\n- [x] second\n-[ ] no space no task\n"),
        ],
    )
    got = sorted(map(tuple, task_items(c).collect()))
    assert got == [("a", 1, False, "first"), ("a", 2, True, "second")]


def test_inline_fields_literal_and_resolved(spark):
    c = _content(
        spark,
        [
            ("a", "status:: active\nowner:: [[Note B|shown]]\n"
                  "ghost:: [[missing]]\nNot:: a field (uppercase key)\n"),
        ],
    )
    d = spark.createDataFrame(
        [("Note B", "short", "dir/Note B")], "alias string, kind string, canonical string"
    )
    got = sorted(map(tuple, inline_fields(c, d).collect()))
    assert got == [
        ("a", 1, "status", "active", None),
        ("a", 2, "owner", "[[Note B|shown]]", "dir/Note B"),
        ("a", 3, "ghost", "[[missing]]", None),  # dangling link value
    ]


def test_inline_fields_without_dict(spark):
    c = _content(spark, [("a", "k:: v\n")])
    got = [tuple(r) for r in inline_fields(c).collect()]
    assert got == [("a", 1, "k", "v", None)]


def test_fuzzy_suggestions_typo_match(spark):
    dang = spark.createDataFrame(
        [("d1", 1, "links_to", "note_123x"), ("d2", 1, "links_to", "zzzz_qqq")],
        "subj string, mention_ord int, pred string, raw_target string",
    )
    notes = spark.createDataFrame(
        [("note_123",), ("note_124",), ("other",)], "note_name string"
    )
    got = {
        (r["raw_target"], r["candidate"]): (r["lev"], r["n_shared"])
        for r in fuzzy_link_suggestions(dang, notes).collect()
    }
    assert ("note_123x", "note_123") in got
    lev, shared = got[("note_123x", "note_123")]
    assert lev == 1 and shared >= 2
    assert all(t != "zzzz_qqq" for t, _ in got)  # nothing near the junk


def test_fuzzy_df_cap_drops_boilerplate_grams(spark):
    # with max_gram_df=1 every gram shared by the two stems is capped
    # away, so no pair can reach min_shared — the skew guard fails
    # closed on recall, never on cost
    dang = spark.createDataFrame(
        [("d", 1, "links_to", "note_1x")],
        "subj string, mention_ord int, pred string, raw_target string",
    )
    notes = spark.createDataFrame(
        [("note_1",), ("note_2",)], "note_name string"
    )
    assert fuzzy_link_suggestions(dang, notes, max_gram_df=1).count() == 0
