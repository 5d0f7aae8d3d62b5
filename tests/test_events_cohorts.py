"""Cohort retention, ordered funnel, reciprocity, and collocation stats —
hand-computed micro fixtures (the sf0.01 oracle parity lives in
test_oracle_parity.py / scripts/oracle_sweep.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from obsidian_parser_spark.operators.events import (
    WEEK_US,
    funnel_counts,
    retention_cohorts,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _t(week: int, hours: int = 0):
    # inside epoch week `week` (anchor 1970-01-01 00:00 UTC)
    return dt.datetime(1970, 1, 1) + dt.timedelta(
        microseconds=week * WEEK_US
    ) + dt.timedelta(hours=hours)


def test_retention_cohorts_matrix(spark):
    rows = [
        # user 1: weeks 100, 101, 103  (cohort 100)
        (1, _t(100), 1, "view"),
        (2, _t(101), 1, "view"),
        (3, _t(103), 1, "view"),
        # user 2: week 100 only (cohort 100); two events same week dedup
        (4, _t(100), 2, "click"),
        (5, _t(100, 5), 2, "view"),
        # user 3: weeks 101, 103 (cohort 101)
        (6, _t(101), 3, "view"),
        (7, _t(103), 3, "view"),
    ]
    out = {
        (r.cohort_week, r.week_offset): (r.n_active, r.cohort_size)
        for r in retention_cohorts(_ev(spark, rows)).collect()
    }
    assert out == {
        (100, 0): (2, 2),
        (100, 1): (1, 2),
        (100, 3): (1, 2),
        (101, 0): (1, 1),
        (101, 2): (1, 1),
    }


def test_funnel_strict_ordering(spark):
    base = dt.datetime(2024, 1, 1)

    def at(mins):
        return base + dt.timedelta(minutes=mins)

    rows = [
        # user 1 completes the funnel in order
        (1, at(0), 1, "view"),
        (2, at(1), 1, "click"),
        (3, at(2), 1, "purchase"),
        # user 2: click BEFORE view → never reaches step 2
        (4, at(0), 2, "click"),
        (5, at(1), 2, "view"),
        (6, at(2), 2, "purchase"),  # purchase needs click-after-view first
        # user 3: click at the SAME timestamp as view → strict > excludes it
        (7, at(0), 3, "view"),
        (8, at(0), 3, "click"),
        # user 4: view + later click, no purchase
        (9, at(0), 4, "view"),
        (10, at(5), 4, "click"),
    ]
    out = {r.event_type: r.n_users for r in funnel_counts(_ev(spark, rows)).collect()}
    assert out == {"view": 4, "click": 2, "purchase": 1}
    steps = {r.step: r.event_type for r in funnel_counts(_ev(spark, rows)).collect()}
    assert steps == {1: "view", 2: "click", 3: "purchase"}


def test_reciprocity_stats(spark):
    from obsidian_parser_spark.operators.graph_metrics import reciprocity_stats

    edges = spark.createDataFrame(
        [
            ("a", "links_to", "b"),
            ("b", "links_to", "a"),  # reciprocated pair
            ("a", "links_to", "c"),  # one-way
            ("a", "links_to", "c"),  # duplicate occurrence → distinct
            ("c", "links_to", "c"),  # self-loop
        ],
        "subj string, pred string, obj string",
    )
    r = reciprocity_stats(edges).collect()[0]
    assert (r.n_directed, r.n_reciprocated, r.n_selfloops, r.n_undirected) == (
        3,
        2,
        1,
        2,
    )


def test_collocation_stats_counts(spark):
    from obsidian_parser_spark.operators.textstats import collocation_stats

    docs = spark.createDataFrame(
        [
            (1, "new york new york city"),
            (2, "new york is big"),
            (3, "one"),  # single token → no pairs
        ],
        "doc_id long, text string",
    )
    out = {
        (r.w1, r.w2): (r.n_pair, r.n_w1, r.n_w2, r.n_tokens)
        for r in collocation_stats(docs, min_pair=3).collect()
    }
    # "new york" appears 3× ; n_w("new") = 3, n_w("york") = 3, total = 10
    assert out == {("new", "york"): (3, 3, 3, 10)}
    # lowering the threshold surfaces "york new" (1×) etc.
    low = collocation_stats(docs, min_pair=2).collect()
    assert {(r.w1, r.w2) for r in low} == {("new", "york")}


def test_winnowing_guarantee_and_density(spark):
    """Winnowing's core guarantee: any shared passage of >= w+k-1 tokens
    (here 8) leaves at least one common fingerprint; unrelated docs with
    disjoint vocabularies share none."""
    from obsidian_parser_spark.operators.textstats import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, "intro words here " + shared + " tail one"),
            (2, shared + " totally different ending phrase"),
            (3, "unrelated corpus vocabulary entirely disjoint tokens"),
            (4, "tiny"),  # < k tokens → whole-text fallback gram
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=4, w=5).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared 8-token passage must share a fp"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    # short doc degrades to exactly one fingerprint (single gram, single window)
    assert len(by_doc[4]) == 1
    # per-doc fps are distinct (array_distinct applied before explode)
    assert len(fps) == sum(len(v) for v in by_doc.values())


def test_textrank_hub_word_ranks_first(spark):
    """A word adjacent to many distinct frequent words accumulates the
    most rank; vocabulary below min_count never appears."""
    from obsidian_parser_spark.operators.textstats import textrank_keywords

    docs = spark.createDataFrame(
        [
            (1, "spark joins spark windows spark streams spark scans"),
            (2, "joins spark windows spark streams spark scans spark"),
            (3, "rare singleton appears once only here"),
        ],
        "doc_id long, text string",
    )
    rows = textrank_keywords(docs, min_count=2, top_n=10).collect()
    words = [r.word for r in rows]
    assert words[0] == "spark"
    assert "singleton" not in words  # below min_count
    # integer fixed-point ranks, descending with word tie-break
    prs = [r.pr for r in rows]
    assert prs == sorted(prs, reverse=True)
    assert all(isinstance(p, int) for p in prs)


def test_transition_counts_order_and_ties(spark):
    """Sequence a: view->click->view; user b: single event (no pairs);
    simultaneous events break ties by event_id."""
    from obsidian_parser_spark.operators.events import transition_counts

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, "view"),
            (2, "2024-01-01 00:01:00", 1, "click"),
            (3, "2024-01-01 00:02:00", 1, "view"),
            (4, "2024-01-01 00:00:00", 2, "view"),
            # user 3: two events at the SAME ts -> event_id order decides
            (6, "2024-01-01 00:00:00", 3, "purchase"),
            (5, "2024-01-01 00:00:00", 3, "click"),
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r.prev_type, r.next_type): r.n for r in transition_counts(ev).collect()
    }
    assert got == {
        ("view", "click"): 1,
        ("click", "view"): 1,
        ("click", "purchase"): 1,
    }


def test_ngram_lm_counts_exact(spark):
    """Trigram and context counts on a hand-checked corpus."""
    from obsidian_parser_spark.operators.textstats import ngram_lm_counts

    docs = spark.createDataFrame(
        [
            (1, "the quick fox the quick fox the quick dog"),
            (2, "the quick fox jumps"),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.w1, r.w2, r.w3): (r.n, r.ctx_n)
        for r in ngram_lm_counts(docs, min_count=2).collect()
    }
    # "the quick fox": 2x in doc1 + 1x in doc2 = 3; context "the quick" = 4
    assert got == {
        ("the", "quick", "fox"): (3, 4),
        ("quick", "fox", "the"): (2, 3),
        ("fox", "the", "quick"): (2, 2),
    }


def test_bpe_merges_hand_checked(spark):
    """'aaab' x3: merge1 (a,a,6) [overlapping pairs], merge2 tie between
    (a,b) and (aa,a) at 3 -> lexicographic smallest left wins, merge3
    joins the remains; left-to-right non-overlap on the aa run."""
    from obsidian_parser_spark.operators.textstats import bpe_merges

    docs = spark.createDataFrame(
        [(1, "aaab aaab aaab")], "doc_id long, text string"
    )
    got = [(r.step, r.left, r.right, r.n) for r in bpe_merges(docs, 3).collect()]
    assert got == [(1, "a", "a", 6), (2, "a", "b", 3), (3, "aa", "ab", 3)]


def test_bpe_greedy_run_semantics_and_encode(spark):
    """'banana': merging (a,n) must produce b,an,an,a (BOTH occurrences,
    the real-BPE greedy rule a single delimiter-replace pass would miss);
    encode reports the final piece counts by vocabulary lookup."""
    from obsidian_parser_spark.operators.textstats import (
        bpe_encode_counts,
        bpe_merges,
    )

    docs = spark.createDataFrame(
        [(1, "banana banana"), (2, "banana ???")], "doc_id long, text string"
    )
    got = [(r.step, r.left, r.right, r.n) for r in bpe_merges(docs, 2).collect()]
    # (a,n) and (n,a) tie at 6 -> lexicographic left wins; after the
    # greedy merge the (an,an) adjacency EXISTS (it wouldn't under a
    # single non-overlapping string replace)
    assert got[0] == (1, "a", "n", 6)
    assert got[1] == (2, "an", "a", 3)
    enc = {
        r.doc_id: (r.n_pieces, r.n_oov_tokens)
        for r in bpe_encode_counts(docs, n_merges=2).collect()
    }
    # after 2 merges banana = [b, an, ana] -> 3 pieces
    assert enc == {1: (6, 0), 2: (3, 1)}


def test_lm_coverage_hand_checked(spark):
    from obsidian_parser_spark.operators.textstats import lm_coverage

    docs = spark.createDataFrame(
        [
            (1, "x y z x y z x y z"),
            (2, "p q"),  # < 3 tokens -> (0, 0)
            (3, "x y z only once here now"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_trigrams, r.n_in_lm)
        for r in lm_coverage(docs, min_count=3).collect()
    }
    # corpus trigram counts: 'x y z' 4x (head), everything else < 3
    assert got == {1: (7, 3), 2: (0, 0), 3: (5, 1)}


def test_distinct_sketch_bounds(spark):
    from obsidian_parser_spark.operators.events import distinct_sketch

    ev = spark.createDataFrame(
        [(i, "2024-01-01 00:00:00", i % 7, "view") for i in range(50)]
        + [(100 + i, "2024-01-01 00:00:00", i, "click") for i in range(3)],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r.event_type: (r.n_exact, r.n_buckets_hit)
        for r in distinct_sketch(ev, m=1024).collect()
    }
    assert got["view"][0] == 7 and got["click"][0] == 3
    # bitmap never exceeds the true cardinality and never empties
    for n_exact, hits in got.values():
        assert 1 <= hits <= n_exact
