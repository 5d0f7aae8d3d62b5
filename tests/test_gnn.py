"""GNN training-data export: sampled ego-nets + dense integer ids."""

import hashlib

from pyspark.sql import functions as F

from obsidian_parser_spark.operators.gnn import (
    dense_ids,
    sampled_adjacency,
    sampled_egonets,
    triples_with_ids,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(u, "links_to", v) for u, v in pairs], "subj string, pred string, obj string"
    )


def _ref_sample(pairs, fanout, hop, salt="ego"):
    """Independent pure-python replay of the hash-argmin top-k rule."""
    adj = {}
    for u, v in sorted(set(pairs)):
        adj.setdefault(u, []).append(v)
    out = set()
    for u, vs in adj.items():
        key = lambda v: (
            hashlib.md5(f"{salt}:{hop}:{u}>{v}".encode()).hexdigest(),
            v,
        )
        for v in sorted(set(vs), key=key)[:fanout]:
            out.add((u, v))
    return out


def test_sampled_adjacency_matches_pure_python(spark):
    pairs = [(f"n{i}", f"n{(i * 7 + j) % 20}") for i in range(20) for j in range(6)]
    got = {
        (r["u"], r["v"])
        for r in sampled_adjacency(_edges(spark, pairs), 3, 1).collect()
    }
    assert got == _ref_sample(pairs, 3, 1)
    # fanout bound holds per source node
    from collections import Counter

    assert max(Counter(u for u, _ in got).values()) <= 3


def test_egonets_hop_structure(spark):
    pairs = [(f"n{i}", f"n{(i * 7 + j) % 20}") for i in range(20) for j in range(6)]
    e = sampled_egonets(_edges(spark, pairs), fanouts=(3, 2), seed_mod=2)
    rows = e.collect()
    assert rows, "seed_mod=2 on 20 sources must select some seeds"
    hop1 = {(r["seed"], r["src"], r["dst"]) for r in rows if r["hop"] == 1}
    hop2 = {(r["seed"], r["src"], r["dst"]) for r in rows if r["hop"] == 2}
    # hop-1 edges start at the seed itself
    assert all(seed == src for seed, src, _ in hop1)
    # every hop-2 source was a hop-1 destination of the same seed
    h1dst = {(s, d) for s, _, d in hop1}
    assert all((s, src) in h1dst for s, src, _ in hop2)
    # hop-2 adjacency obeys its own fanout bound of 2 per (seed, src)
    from collections import Counter

    assert max(Counter((s, src) for s, src, _ in hop2).values()) <= 2
    # determinism: a second run is bit-identical
    again = sampled_egonets(_edges(spark, pairs), fanouts=(3, 2), seed_mod=2)
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in rows}


def test_dense_ids_equals_global_rank(spark):
    vals = [f"v{i:04d}" for i in range(0, 500, 3)] + ["aa", "zz", "mm"]
    df = spark.createDataFrame([(v,) for v in vals * 2], "entity string")
    got = sorted(
        (r["entity"], r["id"]) for r in dense_ids(df, "entity", n_parts=7).collect()
    )
    want = [(v, i) for i, v in enumerate(sorted(set(vals)))]
    assert got == want


def test_dense_ids_single_value_and_nulls(spark):
    df = spark.createDataFrame([("x",), (None,), ("x",)], "entity string")
    assert [tuple(r) for r in dense_ids(df, "entity").collect()] == [("x", 0)]


def test_triples_with_ids_roundtrip(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("a", "b")])
    t = triples_with_ids(e)
    got = sorted(tuple(r) for r in t.collect())
    # entities sorted: a=0, b=1, c=2; one relation id 0; distinct triples
    assert got == [(0, 0, 1), (0, 0, 2), (1, 0, 2)]
