"""Pure pandas/Python text operators — the single Python stage of the engine.

These functions re-create, byte-for-byte, the reference parser semantics
(citations into /root/reference/):

* frontmatter split        — src/note/parser.rs:58-76
* wikilink extraction      — src/note/parser.rs:21-37
* inline tag extraction    — src/note/note_tags.rs:40-58
* frontmatter tags/aliases — src/note/note_tags.rs:34-38, note_aliases.rs:81-92
* word / byte counts       — src/note/mod.rs:100-103, 119-122

Everything here is batch-vectorized over ``pd.Series`` (Arrow batches in
Spark); the only per-row Python is YAML parsing (inherently per-document)
and SHA-256 (C-backed hashlib).  No Spark imports — unit-testable without a
session, and reused verbatim by the Spark ``mapInPandas`` stage in
``operators/tokenize.py``.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import yaml

from .emoji import emoji_regex_class_body

# libyaml C loader is ~20× faster than the pure-Python one and dominates the
# tokenize profile; fall back transparently where libyaml is absent
try:
    _YAML_LOADER = yaml.CSafeLoader
except AttributeError:  # pragma: no cover
    _YAML_LOADER = yaml.SafeLoader

# --------------------------------------------------------------------------
# Frontmatter split (reference: src/note/parser.rs:58-76)
# --------------------------------------------------------------------------

ERR_NOT_FOUND_CLOSER = "NotFoundCloser"
ERR_YAML = "YamlError"
ERR_TAGS_NOT_LIST = "TagsNotAList"
ERR_ALIASES_NOT_LIST = "AliasesNotAList"


def split_frontmatter(raw_text: str) -> tuple[str | None, str, str | None]:
    """Split a raw note into (properties_yaml, content, error).

    Exact reference semantics (src/note/parser.rs:58-76):
    * frontmatter exists iff the FIRST line, right-trimmed, equals "---"
      (leading whitespace on line 1 ⇒ no frontmatter, whole text is content);
    * the closer is the first occurrence of the SUBSTRING "---" at offset
      >= 3 — not required to sit on its own line;
    * missing closer ⇒ hard error NotFoundCloser;
    * both slices are .strip()-ed (Unicode whitespace, both ends).

    "---" is pure ASCII, so Python str indices coincide with the
    reference's byte indices at every boundary used here.
    """
    first_nl = raw_text.find("\n")
    first_line = raw_text if first_nl < 0 else raw_text[:first_nl]
    if first_line.rstrip() != "---":
        return None, raw_text, None
    closed = raw_text.find("---", 3)
    if closed < 0:
        return None, "", ERR_NOT_FOUND_CLOSER
    properties = raw_text[3:closed].strip()
    content = raw_text[closed + 3 :].strip()
    return properties, content, None


def split_frontmatter_frame(raw: pd.Series) -> pd.DataFrame:
    """Vectorized wrapper: Series[str] -> DataFrame(properties_yaml, content,
    parse_error)."""
    rows = [split_frontmatter(t if isinstance(t, str) else "") for t in raw]
    return pd.DataFrame(rows, columns=["properties_yaml", "content", "parse_error"],
                        index=raw.index)


# --------------------------------------------------------------------------
# Mention extraction (reference: src/note/parser.rs:21-37)
# --------------------------------------------------------------------------

PRED_LINKS_TO = "links_to"
PRED_EMBEDS = "embeds"
PRED_TAGGED = "tagged"

# One combined, order-preserving pattern.
#
# Wikilink alternative: the reference scans every occurrence of "[[" and
# pairs it with the next "]]" (src/note/parser.rs:22-24) — occurrences may
# OVERLAP ("[[a[[b]]" emits both "a[[b" and "b"), so we use a zero-width
# lookahead anchored one character before the "[[" (a '\n' sentinel is
# prepended so position 0 has a preceding character; NUL is unusable — numpy
# fixed-width unicode silently drops it in the broadcast concat).  Group 1 =
# preceding char ('!' ⇒ embed, SURVEY §2.2 P4), group 2 = inner text
# (DOTALL: targets may span newlines).
#
# Markdown-link alternative (engine extension, north_star requirement; the
# reference emits no mdlink triples): group 3 = target.  It must consume, so
# nested wikilinks inside a target are not re-scanned — generated corpora
# and parity fixtures contain no such nesting.
_MENTION_RE = re.compile(
    r"(?s)(.)(?=\[\[(.*?)\]\])"  # (prev)(?=[[inner]])
    r"|\[[^\]\[]*\]\(([^()\s]+)\)"  # [caption](target)
)
_WIKILINK_ONLY_RE = re.compile(r"(?s)(.)(?=\[\[(.*?)\]\])")
_MDLINK_BODY_RE = re.compile(r"\[[^\]\[]*\]\(([^()\s]+)\)")
_MD_STRIP = re.compile(r"\.md$", re.IGNORECASE)


def _scan_mentions(s: str, include_mdlinks: bool) -> list[tuple]:
    """Hand-rolled scanner equivalent to ``_MENTION_RE.findall`` /
    ``_WIKILINK_ONLY_RE.findall`` (emits the same (prev, inner, md_target)
    tuples in the same order) but ~10× faster: the regex alternation pays a
    DOTALL lazy lookahead at EVERY character, this jumps between '['
    occurrences with C-level ``str.find``.  Semantics replicated exactly
    (property-tested against the regex in test_properties.py):

    * at position x, the wikilink branch fires iff ``[[`` starts at x+1 and
      a ``]]`` closes somewhere after — consuming ONE char, so consecutive/
      overlapping ``[[`` occurrences all emit (parser.rs:22-24 scan);
    * otherwise the mdlink branch must CONSUME its whole match (nested
      wikilinks inside a consumed target are not re-scanned);
    * positions with no '[' at x or x+1 can match neither branch — skipped.
    """
    out: list[tuple] = []
    x, n = 0, len(s)
    find = s.find
    md_match = _MDLINK_BODY_RE.match
    while x < n:
        p = find("[", x)
        if p == -1:
            break
        if p - 1 > x:
            x = p - 1  # everything before p-1 can match neither branch
        if s[x + 1 : x + 3] == "[[":
            j = find("]]", x + 3)
            if j != -1:
                out.append((s[x], s[x + 3 : j], ""))
                x += 1
                continue
        if include_mdlinks and s[x] == "[":
            m = md_match(s, x)
            if m:
                out.append(("", "", m.group(1)))
                x = m.end()
                continue
        x += 1
    return out


def clean_wikilink_target(inner: str) -> str:
    """#heading / ^block / |alias stripping, in exactly the reference order
    '#' → '^' → '|', then trim (src/note/parser.rs:26-33)."""
    return inner.split("#", 1)[0].split("^", 1)[0].split("|", 1)[0].strip()


def extract_mentions_series(
    content: pd.Series, include_mdlinks: bool = True
) -> pd.Series:
    """Series[str] -> Series[list[dict(pred, target)]], document order.

    Wikilinks/embeds: every ``[[``..``]]`` occurrence (reference parity).
    Markdown links (optional extension): non-URL targets, trailing ``.md``
    stripped case-insensitively (mirrors the scan's ASCII-case-insensitive
    extension match, src/vault/vault_open/mod.rs:66-70).
    """
    found = content.fillna("").map(
        lambda t: _scan_mentions("\n" + t, include_mdlinks)
    )

    def to_mentions(matches: list) -> list[dict]:
        out = []
        for prev, inner, md_target in matches:
            if md_target:
                t = md_target.strip()
                if "://" in t:
                    continue
                out.append(
                    {"pred": PRED_LINKS_TO, "target": _MD_STRIP.sub("", t)}
                )
            else:
                out.append(
                    {
                        "pred": PRED_EMBEDS if prev == "!" else PRED_LINKS_TO,
                        "target": clean_wikilink_target(inner),
                    }
                )
        return out

    return found.map(to_mentions)


# --------------------------------------------------------------------------
# Inline tags (reference: src/note/note_tags.rs:40-58)
# --------------------------------------------------------------------------

# A tag is a whitespace-delimited word starting with '#' whose second char is
# not '#'; the tag value is the longest prefix of chars that are alphanumeric,
# '_', '-', or Emoji=Yes (and != '#'); empty prefix ⇒ no tag.  '#' is never in
# the good class, so the "second byte != '#'" filter and the "empty prefix"
# filter collapse into requiring >= 1 good char after '#'.  (The reference
# checks the second BYTE; multi-byte UTF-8 continuation bytes can never equal
# 0x23, so a char-level check is equivalent.)
_TAG_GOOD_CLASS = r"[\w\-" + emoji_regex_class_body(exclude="#") + r"]"
_INLINE_TAG_RE = re.compile(r"(?:^|(?<=\s))#(" + _TAG_GOOD_CLASS + r"+)", re.UNICODE)
_TAG_PREFIX_RE = re.compile(_TAG_GOOD_CLASS + r"+")


def extract_inline_tags(text: str) -> list[str]:
    """Inline tags of one document, document order.

    Equivalent to ``_INLINE_TAG_RE.findall`` (property-tested) but ~3×
    faster: a '#' matches iff it starts a whitespace-delimited word
    (``(?:^|(?<=\\s))`` ⇔ word start under ``str.split``), so only the
    good-prefix match on each '#'-word pays the huge emoji character class
    — not a scan of the full text.  The split is shared with word_count
    semantics (both are ``split_whitespace``, src/note/note_tags.rs:40-58
    and mod.rs:100-103)."""
    return _tags_from_words(text.split())


def _tags_from_words(words: list[str]) -> list[str]:
    tags = []
    for w in words:
        if w[0] == "#":
            m = _TAG_PREFIX_RE.match(w, 1)
            if m:
                tags.append(m.group(0))
    return tags


def extract_inline_tags_series(content: pd.Series) -> pd.Series:
    """Series[str] -> Series[list[str]] of inline tags, document order."""
    return content.fillna("").map(extract_inline_tags)


# --------------------------------------------------------------------------
# Frontmatter YAML (reference: note_in_memory.rs:163-187, note_tags.rs:34-38,
# note_aliases.rs:81-92)
# --------------------------------------------------------------------------


def parse_frontmatter(
    properties_yaml: str | None,
) -> tuple[dict[str, str], list[str], list[str], str | None]:
    """(props, tags_frontmatter, aliases, error).

    * absent/None frontmatter ⇒ empty everything, no error (the reference's
      ``properties().unwrap_or_default()``);
    * invalid YAML ⇒ YamlError (reference hard-errors on access);
    * ``tags`` / ``aliases`` present but not a list of scalars ⇒ error
      (serde ``Vec<String>`` deserialization failure, note_tags.rs:35-38).
    Props values are stringified for a stable ``map<string,string>`` column.
    """
    if properties_yaml is None:
        return {}, [], [], None
    try:
        data = yaml.load(properties_yaml, Loader=_YAML_LOADER)
    except yaml.YAMLError:
        return {}, [], [], ERR_YAML
    if data is None:
        data = {}
    if not isinstance(data, dict):
        return {}, [], [], ERR_YAML

    props = {str(k): _scalar_str(v) for k, v in data.items()}

    def as_str_list(key: str, err: str) -> tuple[list[str], str | None]:
        v = data.get(key)
        if v is None:
            return [], None
        if not isinstance(v, list) or any(
            not isinstance(x, (str, int, float, bool)) for x in v
        ):
            return [], err
        return [x if isinstance(x, str) else _scalar_str(x) for x in v], None

    tags, terr = as_str_list("tags", ERR_TAGS_NOT_LIST)
    aliases, aerr = as_str_list("aliases", ERR_ALIASES_NOT_LIST)
    return props, tags, aliases, terr or aerr


def _scalar_str(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (dict, list)):
        # json, not yaml.dump: the pure-Python yaml emitter dominates the
        # tokenize profile; this is an opaque pass-through representation
        import json

        return json.dumps(v, ensure_ascii=False, default=str)
    return str(v)


# --------------------------------------------------------------------------
# Counts & digests (reference: src/note/mod.rs:100-122, vault_duplicates.rs:62-95)
# --------------------------------------------------------------------------


def word_count(content: str) -> int:
    """``content.split_whitespace().count()`` — Unicode whitespace split,
    empties dropped (src/note/mod.rs:100-103)."""
    return len(content.split())


def byte_count(content: str) -> int:
    """``content.len()`` — UTF-8 BYTES, not chars (src/note/mod.rs:119-122)."""
    return len(content.encode("utf-8"))


def sha256_hex(content: str) -> str:
    """Digest of content bytes (duplicates-by-content,
    src/vault/vault_duplicates.rs:62-95; digest algo is pluggable there —
    we fix SHA-256 like its test)."""
    return hashlib.sha256(content.encode("utf-8")).hexdigest()


# --------------------------------------------------------------------------
# Whole-note tokenize over a pandas batch (used by the Spark stage)
# --------------------------------------------------------------------------


def tokenize_batch(
    pdf: pd.DataFrame, include_mdlinks: bool = True
) -> pd.DataFrame:
    """Batch tokenizer: input columns (doc_id, properties_yaml, content[,
    parse_error]) -> full note-level frame.

    Output columns: doc_id, parse_error, tags, aliases, is_todo, word_count,
    byte_count, content_sha, is_empty, mentions(list[dict]), props.
    """
    content = pdf["content"].fillna("")
    fm_parsed = [parse_frontmatter(p) for p in pdf["properties_yaml"]]
    props = [x[0] for x in fm_parsed]
    tags_fm = [x[1] for x in fm_parsed]
    aliases = [x[2] for x in fm_parsed]
    fm_err = [x[3] for x in fm_parsed]

    # one whitespace split serves both inline-tag scan (note_tags.rs:40-58)
    # and word_count (mod.rs:100-103) — identical split_whitespace
    # semantics; per-doc transient (holding every split alive at once costs
    # more in allocator churn than the second split saved)
    inline, wcounts = [], []
    for t in content:
        ws = t.split()
        inline.append(_tags_from_words(ws))
        wcounts.append(len(ws))
    # frontmatter tags PREPENDED before inline tags, duplicates kept
    # (note_tags.rs:60: [tags_from_properties, tags_from_content].concat()).
    tags = [f + i for f, i in zip(tags_fm, inline)]
    mentions = extract_mentions_series(content, include_mdlinks=include_mdlinks)

    prior_err = (
        pdf["parse_error"]
        if "parse_error" in pdf.columns
        else pd.Series([None] * len(pdf), index=pdf.index)
    )
    err = [a if a is not None else b for a, b in zip(prior_err, fm_err)]

    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "parse_error": pd.Series(err, index=pdf.index, dtype=object),
            "tags": pd.Series(tags, index=pdf.index, dtype=object),
            "aliases": pd.Series(aliases, index=pdf.index, dtype=object),
            "is_todo": pd.Series(
                ["todo" in t for t in tags], index=pdf.index, dtype=bool
            ),
            "word_count": pd.Series(wcounts, index=pdf.index, dtype="int64"),
            "byte_count": content.map(byte_count).astype("int64"),
            "content_sha": content.map(sha256_hex),
            "is_empty": (content == "").astype(bool),
            "mentions": mentions,
            "props": pd.Series(props, index=pdf.index, dtype=object),
        }
    )
