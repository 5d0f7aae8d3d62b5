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


def test_section_mention_counts(spark):
    c = _content(
        spark,
        [
            ("a", "[[pre1]] text\n# one\n[[x]] and ![[y]]\nnone\n"
                  "## two\n[[z]]\n"),
            ("b", "no headings [[q]]\n"),
        ],
    )
    from obsidian_parser_spark.operators.structure import section_mention_counts

    got = {(r["doc_id"], r["section"]): r["n_mentions"]
           for r in section_mention_counts(c).collect()}
    assert got == {
        ("a", "(preamble)"): 1,
        ("a", "one"): 2,
        ("a", "two"): 1,
        ("b", "(preamble)"): 1,
    }


def test_zipf_ranks_and_ties(spark):
    from obsidian_parser_spark.operators.textstats import zipf_table

    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a c")], "doc_id long, text string"
    )
    got = [tuple(r) for r in zipf_table(docs, k=3).collect()]
    # a and b tie at 3 → lexicographic: a first
    assert got == [(1, "a", 3), (2, "b", 3), (3, "c", 2)]


def test_burst_windows_argmax_tiebreak(spark):
    from datetime import datetime, timedelta

    from obsidian_parser_spark.operators.events import burst_windows

    base = datetime(2024, 1, 1)
    rows = []
    # hour 0: 2 views; hour 2: 2 views (tie → later window wins);
    # hour 1: 3 clicks (unique peak)
    for i, h in enumerate([0, 0, 2, 2]):
        rows.append((i, base + timedelta(hours=h), 1, "view", 1.0, "{}"))
    for i, h in enumerate([1, 1, 1]):
        rows.append((10 + i, base + timedelta(hours=h), 1, "click", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {r["event_type"]: (r["peak_window_start_us"], r["peak_events"])
           for r in burst_windows(ev).collect()}
    us = 3_600 * 1_000_000
    epoch = int(base.timestamp()) * 1_000_000
    assert got["click"] == (epoch + 1 * us, 3)
    assert got["view"] == (epoch + 2 * us, 2)  # tie → later window


def test_ntriples_escaping_and_literals(spark):
    from obsidian_parser_spark.operators.export import to_ntriples

    edges = spark.createDataFrame(
        [("a b", "links_to", "c<d>"), ("a b", "tagged", 'say "hi" \\ there'),
         ("a b", "links_to", "c<d>")],  # duplicate collapses
        "subj string, pred string, obj string",
    )
    got = sorted(r["line"] for r in to_ntriples(edges).collect())
    assert got == [
        '<urn:note:a%20b> <urn:rel:links_to> <urn:note:c%3Cd%3E> .',
        '<urn:note:a%20b> <urn:rel:tagged> "say \\"hi\\" \\\\ there" .',
    ]


def test_ntriples_percent_escape_is_idempotent_safe(spark):
    from obsidian_parser_spark.operators.export import to_ntriples

    # a literal '%20' in an id must NOT collide with an escaped space
    edges = spark.createDataFrame(
        [("x%20y", "links_to", "x y")], "subj string, pred string, obj string"
    )
    (line,) = [r["line"] for r in to_ntriples(edges).collect()]
    assert line.startswith("<urn:note:x%2520y> ")
    assert "<urn:note:x%20y> ." in line


def test_anchor_validation(spark):
    from obsidian_parser_spark.operators.structure import anchor_validation

    q = spark.createDataFrame(
        [("a", "links_to", "b", "heading", "real head"),
         ("a", "links_to", "b", "heading", "ghost head"),
         ("a", "links_to", "b", "block", "blk1"),  # blocks not validated
         ("c", "links_to", "b", "heading", "real head")],
        "subj string, pred string, obj string, qual_kind string,"
        " qualifier string",
    )
    ol = spark.createDataFrame(
        [("b", 1, 1, "real head"), ("b", 2, 2, "other")],
        "doc_id string, heading_ord long, level int, title string",
    )
    got = sorted(map(tuple, anchor_validation(q, ol).collect()))
    assert got == [
        ("a", "b", "ghost head", False),
        ("a", "b", "real head", True),
        ("c", "b", "real head", True),
    ]


def test_crlf_content_extracts_same_as_lf(spark):
    """CRLF vaults must extract identical values to LF vaults (trailing
    CR stripped before the line patterns run)."""
    from obsidian_parser_spark.operators.structure import (
        inline_fields,
        outline,
        task_items,
    )

    lf = _content(spark, [("a", "# top\nk:: v\n- [x] done\n")])
    crlf = _content(spark, [("a", "# top\r\nk:: v\r\n- [x] done\r\n")])
    for fn in (outline, task_items, lambda c: inline_fields(c)):
        assert sorted(map(tuple, fn(lf).collect())) == sorted(
            map(tuple, fn(crlf).collect())
        )


def test_fuzzy_short_strings_are_filtered(spark):
    from obsidian_parser_spark.operators.structure import fuzzy_link_suggestions

    dang = spark.createDataFrame(
        [("d", 1, "links_to", "ab")],  # 2 chars: no gram, never blocked
        "subj string, mention_ord int, pred string, raw_target string",
    )
    notes = spark.createDataFrame([("ab",), ("abc",)], "note_name string")
    assert fuzzy_link_suggestions(dang, notes, min_shared=1).count() == 0


def test_ntriples_control_chars_escaped(spark):
    from obsidian_parser_spark.operators.export import to_ntriples

    edges = spark.createDataFrame(
        [("a", "tagged", "x\ny\tz\rw")], "subj string, pred string, obj string"
    )
    (line,) = [r["line"] for r in to_ntriples(edges).collect()]
    assert "\n" not in line and "\r" not in line and "\t" not in line
    assert '"x\\ny\\tz\\rw"' in line
