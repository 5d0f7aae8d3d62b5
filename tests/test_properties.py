"""Hypothesis property tests over the pure text operators (no Spark).

These guard the byte-exact parser against inputs the fixture suite doesn't
enumerate: arbitrary unicode, pathological bracket nesting, CRLF soup.
"""

import hypothesis.strategies as st
import pandas as pd
from hypothesis import given, settings

from obsidian_parser_spark.functions.textops import (
    byte_count,
    extract_inline_tags_series,
    extract_mentions_series,
    split_frontmatter,
    tokenize_batch,
    word_count,
)
from obsidian_parser_spark.sources.corpus import spans_from_raw

text = st.text(max_size=400)
weird = st.text(alphabet="[]#^|!-\n\r \t勢😭💩a", max_size=120)


@given(text | weird)
@settings(max_examples=300, deadline=None)
def test_split_frontmatter_total_and_consistent(raw):
    """Never throws; error cases produce empty content; non-frontmatter
    cases return the input verbatim (reference: whole text is content)."""
    props, content, err = split_frontmatter(raw)
    if err is not None:
        assert props is None and content == ""
    elif props is None:
        assert content == raw
    else:
        # both slices are trimmed and come from disjoint regions of raw
        assert props == props.strip() and content == content.strip()
        assert props in raw and (content == "" or content in raw)


@given(text | weird)
@settings(max_examples=300, deadline=None)
def test_mentions_match_bracket_occurrences(content):
    """Every emitted mention corresponds to a '[[' occurrence followed by a
    later ']]' — wikilink count equals the reference's match_indices scan."""
    [ms] = extract_mentions_series(pd.Series([content]), include_mdlinks=False)
    expected = sum(
        1
        for i in range(len(content) - 1)
        if content[i : i + 2] == "[[" and content.find("]]", i + 2) >= 0
    )
    assert len(ms) == expected


@given(text | weird)
@settings(max_examples=200, deadline=None)
def test_tags_are_substrings_and_wellformed(content):
    [tags] = extract_inline_tags_series(pd.Series([content]))
    for t in tags:
        assert t and "#" not in t and t in content
        assert not any(c.isspace() for c in t)


@given(text | weird)
@settings(max_examples=200, deadline=None)
def test_tokenize_batch_total(raw):
    """The whole batch tokenizer is total over arbitrary raw notes."""
    props, content, err = split_frontmatter(raw)
    pdf = tokenize_batch(
        pd.DataFrame(
            {"doc_id": ["d"], "properties_yaml": [props], "content": [content]}
        )
    )
    row = pdf.iloc[0]
    assert row["word_count"] == word_count(content)
    assert row["byte_count"] == byte_count(content)
    assert isinstance(row["mentions"], list)


@given(text | weird)
@settings(max_examples=400, deadline=None)
def test_mention_scanner_equals_regex(content):
    """The hand-rolled _scan_mentions must replicate the reference regex
    (_MENTION_RE / _WIKILINK_ONLY_RE alternation semantics) EXACTLY —
    including overlapping [[ positions and mdlink whole-match consumption."""
    from obsidian_parser_spark.functions.textops import (
        _MENTION_RE,
        _WIKILINK_ONLY_RE,
        _scan_mentions,
    )

    s = "\n" + content
    got_md = _scan_mentions(s, True)
    want_md = [(p, i, m) for p, i, m in _MENTION_RE.findall(s)]
    assert got_md == want_md
    got_w = [(p, i) for p, i, _ in _scan_mentions(s, False)]
    want_w = _WIKILINK_ONLY_RE.findall(s)
    assert got_w == want_w


@given(text | weird)
@settings(max_examples=400, deadline=None)
def test_tag_scanner_equals_regex(content):
    from obsidian_parser_spark.functions.textops import (
        _INLINE_TAG_RE,
        extract_inline_tags,
    )

    assert extract_inline_tags(content) == _INLINE_TAG_RE.findall(content)


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_spans_roundtrip_reconstruction(raw):
    """FIXTURES.md §1 invariant: concatenating non-frontmatter span text in
    offset order reconstructs the content exactly."""
    _, content, err = split_frontmatter(raw)
    if err is not None:
        return
    row = spans_from_raw("d", raw)
    body = "".join(s["text"] for s in row["spans"] if s["kind"] != "frontmatter")
    assert body == content
    offs = [s["offset"] for s in row["spans"]]
    assert offs == sorted(offs)
