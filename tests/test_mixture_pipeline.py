"""word_ranks / domain_mixture / fineweb_annotate — the round-5 curation
additions.  Expected values computed by hand on tiny frames; the
cross-engine witnesses are the ts_wordrank / ts_mixture / pipe_fineweb
DuckDB oracles run by the driver gate and scripts/oracle_sweep.py."""

import hashlib

from pyspark.sql import functions as F

from obsidian_parser_spark.operators.sampling import domain_mixture
from obsidian_parser_spark.operators.textstats import word_ranks
from obsidian_parser_spark.plans.curation import fineweb_annotate

PY_MARKERS = ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "MapInPandas")


def _docs(spark, rows, schema="doc_id int, text string"):
    return spark.createDataFrame(rows, schema)


# --------------------------------------------------------------- word_ranks


def test_word_ranks_against_hand_zipf(spark):
    # vocab: 'a' x4 (rank 1), 'b' x2 (rank 2), 'c' x2 (rank 3, tie->lex),
    # 'zz' x1 -> rank 4 but k=3 cuts it: OOV
    d = _docs(spark, [(1, "a a b c"), (2, "a b c a zz")])
    out = {r.doc_id: r for r in word_ranks(d, k=3).collect()}
    r1 = out[1]
    assert (r1.n_tokens, r1.n_ranked, r1.n_oov, r1.oov_bp) == (4, 4, 0, 0)
    assert r1.sum_rank == 1 + 1 + 2 + 3
    assert r1.mean_rank_x100 == (7 * 100) // 4
    r2 = out[2]
    assert (r2.n_tokens, r2.n_ranked, r2.n_oov) == (5, 4, 1)
    assert r2.oov_bp == (1 * 10000) // 5
    assert r2.mean_rank_x100 == ((1 + 2 + 3 + 1) * 100) // 4


def test_word_ranks_keeps_empty_docs(spark):
    d = _docs(spark, [(1, "a a"), (2, "   ")])
    out = {r.doc_id: r for r in word_ranks(d, k=2).collect()}
    assert out[2].n_tokens == 0 and out[2].mean_rank_x100 == 0
    assert out[2].oov_bp == 0 and len(out) == 2


def test_word_ranks_plan_is_jvm_only(spark):
    d = _docs(spark, [(1, "a b")])
    plan = word_ranks(d)._jdf.queryExecution().executedPlan().toString()
    assert not any(m in plan for m in PY_MARKERS)


# ----------------------------------------------------------- domain_mixture


def test_domain_mixture_budget_and_selection(spark):
    # two domains, 10 tokens each doc; total=80, rate 50% -> 40, /2 domains
    # -> budget 20 per domain => exactly 2 docs per domain selected
    rows = [(f"x/{i}", 10) for i in range(4)] + [
        (f"y/{i}", 10) for i in range(4)
    ]
    d = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    out = domain_mixture(d, rate_bp=5000).collect()
    assert all(r.budget_tokens == 20 for r in out)
    by_dom = {}
    for r in out:
        by_dom.setdefault(r.domain, []).append(r)
    for dom in ("x", "y"):
        sel = [r for r in by_dom[dom] if r.selected]
        assert len(sel) == 2
        # selection must be the md5-smallest ids of the domain
        order = sorted(
            by_dom[dom],
            key=lambda r: (hashlib.md5(r.doc_id.encode()).hexdigest(), r.doc_id),
        )
        assert sorted(r.doc_id for r in sel) == sorted(
            r.doc_id for r in order[:2]
        )
        # inclusive running totals in that order
        assert [r.cum_tokens for r in order] == [10, 20, 30, 40]


def test_domain_mixture_two_phase_equals_naive_window(spark):
    # many ids so rows genuinely span several md5-prefix buckets
    rows = [(f"d{i % 3}/n{i}", (i % 7) + 1) for i in range(300)]
    d = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    got = {r.doc_id: r.cum_tokens for r in domain_mixture(d).collect()}
    naive = {}
    for dom in ("d0", "d1", "d2"):
        docs = sorted(
            (r for r in rows if r[0].startswith(dom + "/")),
            key=lambda t: (hashlib.md5(t[0].encode()).hexdigest(), t[0]),
        )
        c = 0
        for doc_id, n in docs:
            c += n
            naive[doc_id] = c
    assert got == naive


def test_domain_mixture_root_domain_and_small_domain_keeps_all(spark):
    # 'root' for path-less ids; tiny domain under budget keeps everything
    rows = [("solo", 1)] + [(f"big/{i}", 100) for i in range(10)]
    d = spark.createDataFrame(rows, "doc_id string, n_tokens long")
    out = {r.doc_id: r for r in domain_mixture(d, rate_bp=5000).collect()}
    assert out["solo"].domain == "root"
    # budget = (1001*5000 div 10000) div 2 = 250: solo kept, big truncated
    assert out["solo"].selected
    assert sum(1 for r in out.values() if r.domain == "big" and r.selected) == 2


# ---------------------------------------------------------- fineweb_annotate


def _prose(body: str) -> str:
    return (
        "the value of the table is known.\n"
        "we have that data and it is with us.\n"
        "the scan is fast and the sort is slow.\n" + body + "."
    )


def test_fineweb_first_matching_gate_wins(spark):
    body = "alpha bravo charlie delta echo foxtrot golf hotel " * 8
    rows = [
        (1, _prose(body)),  # kept
        (2, "le la les et pour dans est que " * 20 + body),  # language
        (3, _prose("word " * 10)),  # gopher: < 50 words
        (4, "the data of that have with " * 12 + body),  # c4: no punct lines
        (5, _prose(body)),  # exact duplicate of 1 (larger id drops)
        (6, _prose(body + " zz extra token")),  # near duplicate
    ]
    out = {
        r.doc_id: r.drop_reason
        for r in fineweb_annotate(_docs(spark, rows)).collect()
    }
    assert out[1] == "kept"
    assert out[2] == "language"
    assert out[3] == "gopher"
    assert out[4] == "c4"
    assert out[5] == "exact_duplicate"
    assert out[6] == "near_duplicate"


def test_fineweb_gate_booleans_are_all_reported(spark):
    body = "alpha bravo charlie delta echo foxtrot golf hotel " * 8
    # a doc that is BOTH non-English and an exact duplicate: reason is the
    # first gate, but the exact_dup boolean still surfaces the later stage
    fr = "le la les et pour dans est que " * 20 + body
    out = {
        r.doc_id: r for r in fineweb_annotate(_docs(spark, [(1, fr), (2, fr)])).collect()
    }
    assert out[2].drop_reason == "language"
    assert out[2].exact_dup is True
    assert out[1].exact_dup is False
