"""Published-ruleset quality filters: Gopher Table-A1 rules and C4
line-level cleaning (the QUALITY complement to test_curation_ops'
Gopher REPETITION filters).  Expected values computed by eye on
hand-built fixtures; the cross-engine witness is the DuckDB oracle
pair (ts_gopher / ts_c4) run by the driver gate and
scripts/oracle_sweep.py."""

from obsidian_parser_spark.operators.textstats import (
    c4_line_stats,
    gopher_rules,
)

PY_MARKERS = ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "MapInPandas")


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )


def _row(spark, fn, text):
    return fn(_docs(spark, [text])).collect()[0]


# ------------------------------------------------------------------ gopher


def test_gopher_passes_clean_prose(spark):
    # 66 words, all alphabetic, mean len in [3,10], >=2 stop words
    txt = ("the quick brown fox jumps over that lazy dog with style " * 6).strip()
    r = _row(spark, gopher_rules, txt)
    assert r.n_words == 66
    assert (
        r.ok_words
        and r.ok_mean_len
        and r.ok_symbols
        and r.ok_bullets
        and r.ok_ellipsis
        and r.ok_alpha
        and r.ok_stopwords
    )
    assert bool(r.keep)


def test_gopher_word_count_boundaries(spark):
    r49 = _row(spark, gopher_rules, "word " * 49)
    r50 = _row(spark, gopher_rules, "the that " + "word " * 48)
    assert r49.n_words == 49 and not r49.ok_words
    assert r50.n_words == 50 and r50.ok_words and bool(r50.keep)


def test_gopher_mean_word_length_basis_points(spark):
    # words 'ab' (2 chars): mean_x100 = 200 < 300 -> fail
    r = _row(spark, gopher_rules, "ab " * 60)
    assert r.mean_word_len_x100 == 200 and not r.ok_mean_len
    # 11-char words: 1100 > 1000 -> fail
    r2 = _row(spark, gopher_rules, "abcdefghijk " * 60)
    assert r2.mean_word_len_x100 == 1100 and not r2.ok_mean_len


def test_gopher_symbol_ratio_counts_hash_and_ellipses(spark):
    # 7 hashes + '...' + '…' = 9 symbols over 60 words -> 1500 bp > 1000
    txt = "# # # # # # # ... … " + "the that word here fine " * 11
    r = _row(spark, gopher_rules, txt)
    assert r.n_symbols == 9
    assert r.symbol_bp == (9 * 10000) // r.n_words
    assert not r.ok_symbols


def test_gopher_bullet_and_ellipsis_line_fractions(spark):
    # 4 nonempty lines: 2 bullets (-, *), 1 ellipsis ender; blank ignored
    txt = "- first bullet\n* second bullet\n\nplain line\ntrails off..."
    r = _row(spark, gopher_rules, txt)
    assert r.n_lines == 4
    assert r.n_bullet_lines == 2 and r.bullet_bp == 5000 and r.ok_bullets
    assert r.n_ellipsis_lines == 1 and r.ellipsis_bp == 2500 and r.ok_ellipsis
    # 10/10 bullet lines -> 10000 bp > 9000 -> fail
    heavy = "\n".join("- item" for _ in range(10))
    r2 = _row(spark, gopher_rules, heavy)
    assert r2.bullet_bp == 10000 and not r2.ok_bullets


def test_gopher_alpha_fraction_and_stopwords(spark):
    # 3 of 10 words numeric -> 7000 bp < 8000 -> fail alpha
    txt = "11 22 33 the that word here fine good text"
    r = _row(spark, gopher_rules, txt)
    assert r.n_alpha_words == 7 and r.alpha_bp == 7000 and not r.ok_alpha
    # distinct stop words counted once each
    r2 = _row(spark, gopher_rules, "the the the word")
    assert r2.n_stop_distinct == 1 and not r2.ok_stopwords


def test_gopher_empty_doc_all_zero(spark):
    r = _row(spark, gopher_rules, "")
    assert r.n_words == 0 and r.mean_word_len_x100 == 0
    assert not r.keep


# ---------------------------------------------------------------------- c4


def test_c4_line_survival_rules(spark):
    txt = "\n".join(
        [
            "This good sentence has six words.",  # kept
            "Short line.",  # < 5 words
            "no terminal punctuation on this line",  # no ender
            "Ends with a question mark, five words ok?",  # kept
            'He said "stop it right there."',  # kept (quote ender ok: .)
            "This javascript line would otherwise be kept.",  # blocked word
        ]
    )
    r = _row(spark, c4_line_stats, txt)
    assert r.n_lines == 6
    assert r.n_kept_lines == 3
    assert r.kept_words == 6 + 8 + 6
    assert bool(r.keep)


def test_c4_document_blockers(spark):
    good = "One fine sentence with five words.\n" * 3
    r = _row(spark, c4_line_stats, good + "and lorem ipsum appears")
    assert r.has_lorem and not r.keep
    r2 = _row(spark, c4_line_stats, good + "code { brace }")
    assert r2.has_brace and not r2.keep
    r3 = _row(spark, c4_line_stats, good.strip())
    assert r3.n_kept_lines == 3 and bool(r3.keep)


def test_c4_cleaned_chars_is_joined_kept_text(spark):
    a = "First keeper sentence with five words."
    b = "Second keeper sentence with five words."
    r = _row(spark, c4_line_stats, a + "\ndropped\n" + b)
    assert r.cleaned_chars == len(a) + 1 + len(b)
    r0 = _row(spark, c4_line_stats, "nothing kept here")
    assert r0.cleaned_chars == 0


def test_c4_crlf_parity(spark):
    lf = "Keeper sentence number one here ok.\nKeeper sentence number two here ok."
    crlf = lf.replace("\n", "\r\n")
    ra = _row(spark, c4_line_stats, lf)
    rb = _row(spark, c4_line_stats, crlf)
    assert ra.n_kept_lines == rb.n_kept_lines == 2
    assert ra.kept_words == rb.kept_words


# ------------------------------------------------------------- plan shapes


def test_quality_filter_plans_are_jvm_only(spark):
    docs = _docs(spark, ["the quick fox.", "- b\n- c"])
    for df in (gopher_rules(docs), c4_line_stats(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        for marker in PY_MARKERS:
            assert marker not in plan, marker
        assert "Exchange" not in plan  # stateless projection: no shuffle


def test_gopher_c4_invariants_on_random_corpus(spark):
    """Structural invariants over a seeded random corpus (one Spark job,
    per-row checks): ratio columns honor their algebraic definitions,
    bounded ratios stay in [0, 10000] bp, and the composite keep flags
    equal the conjunction of their rule columns.  Complements the
    hand-built boundary fixtures above with breadth."""
    import random

    rng = random.Random(42)
    alphabet = [
        "the", "of", "and", "have", "with", "that", "be", "to",
        "word", "data", "#", "...", "…", "-", "*", "•", "{", "lorem",
        "ipsum", "javascript", "ab", "abcdefghijk", "x1", "!",
    ]
    docs = []
    for i in range(60):
        n = rng.randint(0, 120)
        words = [rng.choice(alphabet) for _ in range(n)]
        text = ""
        for w in words:
            text += w + (rng.choice([" ", " ", " ", "\n", ".\n", "\r\n"]))
        docs.append((i, text))
    d = spark.createDataFrame(docs, "doc_id int, text string")

    for r in gopher_rules(d).collect():
        assert r.mean_word_len_x100 == (
            (r.word_chars * 100) // r.n_words if r.n_words else 0
        )
        assert r.symbol_bp == (
            (r.n_symbols * 10000) // r.n_words if r.n_words else 0
        )
        for col, num, den in (
            ("bullet_bp", r.n_bullet_lines, r.n_lines),
            ("ellipsis_bp", r.n_ellipsis_lines, r.n_lines),
        ):
            v = getattr(r, col)
            assert v == ((num * 10000) // den if den else 0)
            assert 0 <= v <= 10000
        assert 0 <= r.alpha_bp <= 10000 or r.n_words == 0
        assert bool(r.keep) == (
            r.ok_words
            and r.ok_mean_len
            and r.ok_symbols
            and r.ok_bullets
            and r.ok_ellipsis
            and r.ok_alpha
            and r.ok_stopwords
        )

    for r in c4_line_stats(d).collect():
        assert 0 <= r.n_kept_lines <= r.n_lines
        if r.n_kept_lines == 0:
            assert r.kept_words == 0 and r.cleaned_chars == 0
        assert bool(r.keep) == (
            r.n_kept_lines >= 3 and not r.has_lorem and not r.has_brace
        )
