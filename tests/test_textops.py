"""Parser-parity tests — every fixture string lifted from the reference
test-suite (see FIXTURES.md; citations per test).  Pure pandas, no Spark."""

import pandas as pd
import pytest

from obsidian_parser_spark.functions.textops import (
    ERR_NOT_FOUND_CLOSER,
    ERR_YAML,
    byte_count,
    extract_inline_tags_series,
    extract_mentions_series,
    parse_frontmatter,
    split_frontmatter,
    tokenize_batch,
    word_count,
)

# ---------------------------------------------------------------- frontmatter
# src/note/parser.rs:84-158, src/note/note_read.rs:75-91


@pytest.mark.parametrize(
    "raw,props,content,err",
    [
        # parser.rs:93-104
        ("---\nproperties data\n---\ntest data", "properties data", "test data", None),
        # parser.rs:84-89 (no frontmatter)
        ("test_data", None, "test_data", None),
        # parser.rs:106-117 (trailing fence only)
        ("test_data---", None, "test_data---", None),
        ("test_data\n---\n", None, "test_data\n---\n", None),
        # parser.rs:127-134 (inline after fence ⇒ no frontmatter)
        ("---properties data", None, "---properties data", None),
        # parser.rs:136-143 (leading spaces kill frontmatter)
        ("   ---\ndata", None, "   ---\ndata", None),
        ("  ---\ntest: test-data\n---\n", None, "  ---\ntest: test-data\n---\n", None),
        # parser.rs:146-158 (CRLF + trim_end on first line)
        ("---\r\nproperties data\r\n---\r   \ntest data", "properties data", "test data", None),
        # note_read.rs:75-81 — a second --- stays in content
        (
            "---\ntopic: life\ncreated: 2025-03-16\n---\nTest data\n---\nTwo test data",
            "topic: life\ncreated: 2025-03-16",
            "Test data\n---\nTwo test data",
            None,
        ),
        # unicode (note_read.rs fixture)
        ("---\ndata: 💩\n---\nSuper data 💩💩💩", "data: 💩", "Super data 💩💩💩", None),
        # closer is a SUBSTRING, not a line (SURVEY §2.6.1)
        ("---\nfoo---bar", "foo", "bar", None),
        # parser.rs:119-125 (unclosed ⇒ error)
        ("---\nproperties data\ntest data", None, "", ERR_NOT_FOUND_CLOSER),
        ("---\n", None, "", ERR_NOT_FOUND_CLOSER),
        ("---", None, "", ERR_NOT_FOUND_CLOSER),
    ],
)
def test_split_frontmatter(raw, props, content, err):
    assert split_frontmatter(raw) == (props, content, err)


# ---------------------------------------------------------------- wikilinks
# src/note/parser.rs:160-169, doc example :14-19


def _targets(text, mdlinks=False):
    [ms] = extract_mentions_series(pd.Series([text]), include_mdlinks=mdlinks)
    return [(m["pred"], m["target"]) for m in ms]


def test_link_formats_all_resolve_to_note():
    text = "[[Note]] [[Note|Alias]] [[Note^block]] [[Note#Heading|Alias]] [[Note^block|Alias]]"
    assert _targets(text) == [("links_to", "Note")] * 5


def test_doc_example():  # parser.rs:17-19
    assert _targets("[[Physics]] and [[Math|Mathematics]]") == [
        ("links_to", "Physics"),
        ("links_to", "Math"),
    ]


def test_overlapping_scan():  # match_indices semantics: "[[a[[b]]" → "a[[b", "b"
    assert _targets("[[a[[b]]") == [("links_to", "a[[b"), ("links_to", "b")]


def test_multiline_target_and_empty():  # SURVEY §2.6.6
    assert _targets("x [[a\nb]] y [[]] z") == [
        ("links_to", "a\nb"),
        ("links_to", ""),
    ]


def test_unclosed_link_dropped():
    assert _targets("foo [[bar") == []


def test_embed_is_link_with_embed_pred():  # P4: ![[x]] — '!' sits outside the match
    assert _targets("see ![[img.png]] and [[n]]") == [
        ("embeds", "img.png"),
        ("links_to", "n"),
    ]


def test_embed_at_start():
    assert _targets("![[x]]") == [("embeds", "x")]


def test_strip_order_hash_caret_pipe():  # parser.rs:26-33
    # split('#')[0] → split('^')[0] → split('|')[0] → trim
    assert _targets("[[N#h^b|a]] [[N^b#h]] [[N|a#h]]") == [
        ("links_to", "N"),
        ("links_to", "N"),
        ("links_to", "N"),
    ]
    assert _targets("[[ N | a ]]") == [("links_to", "N")]


def test_mdlinks_extension():
    text = "[cap](note_5) [url](https://x.y/z) [m](dir/note_7.md) [[w]]"
    assert _targets(text, mdlinks=True) == [
        ("links_to", "note_5"),
        ("links_to", "dir/note_7"),
        ("links_to", "w"),
    ]


# ---------------------------------------------------------------- tags
# src/note/note_tags.rs:72-83


def test_inline_tags_fixture():
    content = "SameData #super_tag ##no_tag and #warning_tag! #two-tag #kek;d #dfds# #all, #татар #d😭"
    [tags] = extract_inline_tags_series(pd.Series([content]))
    assert tags == [
        "super_tag",
        "warning_tag",
        "two-tag",
        "kek",
        "dfds",
        "all",
        "татар",
        "d😭",
    ]


def test_tags_doc_example():  # note_tags.rs:15-19
    [tags] = extract_inline_tags_series(pd.Series(["SameData #super_tag ##no_tag and #warning_tag! #😭"]))
    assert tags == ["super_tag", "warning_tag", "😭"]


def test_tags_word_must_start_with_hash():
    [tags] = extract_inline_tags_series(pd.Series(["a#b #c x#d\n#e\t#f"]))
    assert tags == ["c", "e", "f"]


def test_frontmatter_tags_prepended_with_duplicates():
    props, tags_fm, aliases, err = parse_frontmatter("tags:\n- my_tag\n- b")
    assert tags_fm == ["my_tag", "b"] and err is None
    pdf = tokenize_batch(
        pd.DataFrame(
            {
                "doc_id": ["n"],
                "properties_yaml": ["tags:\n- b\n- my_tag"],
                "content": ["x #my_tag"],
            }
        )
    )
    assert list(pdf["tags"][0]) == ["b", "my_tag", "my_tag"]


# ---------------------------------------------------------------- yaml/aliases/todo
# note_aliases.rs:102-103, note_is_todo.rs:41-42


def test_aliases_and_todo():
    _, _, aliases, err = parse_frontmatter("aliases:\n- my_alias")
    assert aliases == ["my_alias"] and err is None
    pdf = tokenize_batch(
        pd.DataFrame(
            {
                "doc_id": ["a", "b"],
                "properties_yaml": ["tags:\n- todo", "tags:\n- not_todo"],
                "content": ["SameData todo", "SameData"],
            }
        )
    )
    assert list(pdf["is_todo"]) == [True, False]


def test_todo_from_inline_tag():
    pdf = tokenize_batch(
        pd.DataFrame({"doc_id": ["a"], "properties_yaml": [None], "content": ["x #todo y"]})
    )
    assert bool(pdf["is_todo"][0])


def test_broken_yaml():
    _, _, _, err = parse_frontmatter("asdfv:--fs\n    sfsf\n    ---")
    assert err == ERR_YAML


def test_tags_not_a_list_is_error():
    _, tags, _, err = parse_frontmatter("tags: solo")
    assert tags == [] and err is not None


# ---------------------------------------------------------------- counts
# src/note/mod.rs:90-122


def test_word_and_byte_counts():
    raw = "---\ntags:\n- my_tag\n---\n My super note"
    props, content, err = split_frontmatter(raw)
    assert content == "My super note"
    assert word_count(content) == 3
    assert byte_count(content) == 13


def test_byte_count_is_utf8_bytes():
    assert byte_count("татар") == 10  # 5 Cyrillic chars × 2 bytes
    assert byte_count("d😭") == 5
