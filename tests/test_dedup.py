"""Dedup detectors: JVM SimHash vs a straight-line Python oracle, plus the
LSH→verify composition.  (The md5-family detectors are additionally
cross-checked against DuckDB by test_oracle_parity.py / the driver gate.)"""

import hashlib

import numpy as np

from obsidian_parser_spark.operators.dedup import (
    simhash_near_dups,
    simhash_signatures,
)

TEXTS = [
    "hello world foo bar",
    "hello world foo baz",
    "",
    "один два три #тест",
    "a a a b",
    "Hello WORLD foo bar",  # lowercased == row 0 → identical signature
    "x" * 5,
    "the quick brown fox jumps over the lazy dog",
]


def _py_simhash(text: str) -> int:
    """Independent per-row implementation (the round-1 engine semantics)."""
    acc = np.zeros(64, dtype=np.int64)
    for t in (text or "").lower().split():
        bits = np.unpackbits(
            np.frombuffer(hashlib.md5(t.encode()).digest()[:8], dtype=np.uint8)
        )
        acc += bits.astype(np.int64) * 2 - 1
    return int.from_bytes(
        np.packbits((acc > 0).astype(np.uint8)).tobytes(), "big", signed=True
    )


def test_simhash_signatures_match_python_oracle(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )
    got = {r.doc_id: r.simhash for r in simhash_signatures(df).collect()}
    want = {i: _py_simhash(t) for i, t in enumerate(TEXTS)}
    assert got == want
    assert got[2] == 0  # zero-token doc → simhash 0 (left-join back)
    assert got[0] == got[5]  # case-folded duplicates collide


def test_simhash_near_dups_banding(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )
    pairs = {
        (r.a, r.b): r.hamming for r in simhash_near_dups(df, max_hamming=3).collect()
    }
    assert pairs[(0, 5)] == 0
    # a true hamming-0 pair must also appear under the xxh hash family
    xpairs = {
        (r.a, r.b): r.hamming
        for r in simhash_near_dups(df, max_hamming=3, hash_fn="xxh").collect()
    }
    assert xpairs[(0, 5)] == 0


def test_simhash_no_python_in_plan(spark):
    """The signature plan must be whole-JVM: no BatchEvalPython / ArrowEval /
    mapInPandas stages (the round-1 implementation's banned pattern)."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    plan = simhash_signatures(df)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "PythonUDF"):
        assert marker not in plan, marker
