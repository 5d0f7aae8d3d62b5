"""Replicates the driver's correctness gate locally: run every queries()
entry AND its oracle_sql() on the same data (sf0.001 for speed; the driver
uses sf0.01) and compare row multisets exactly."""

import math
import os
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"


def _norm(v):
    if isinstance(v, Decimal):
        f = float(v)
        return int(f) if f.is_integer() else round(f, 9)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return int(v) if v.is_integer() else round(v, 9)
    return v


def _rows(cols, data):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in data)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _oracles():
    path = E.ensure_vault_corpus(os.path.basename(SF_DIR))
    out = E._kg_oracles(path)
    out.update(E._datapipe_oracles())
    return out


ORACLE_NAMES = sorted(_oracles())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, con, name):
    spark_df = E.queries()[name](spark, SF_DIR)
    got_cols = [c.lower() for c in spark_df.columns]
    got = _rows(got_cols, [tuple(r) for r in spark_df.collect()])

    rel = con.sql(_oracles()[name])
    want_cols = [c.lower() for c in rel.columns]
    want = _rows(want_cols, rel.fetchall())

    assert sorted(got_cols) == sorted(want_cols), (got_cols, want_cols)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    mism = [(a, b) for a, b in zip(got, want) if a != b]
    assert not mism, f"{name}: first mismatches {mism[:5]}"


def test_every_query_has_oracle_or_reason():
    q = set(E.queries())
    o = set(E.oracle_sql())
    assert o <= q
    # documented rows-only exceptions
    assert q - o == {"kg_components", "kg_component_count", "dd_simhash"}


def test_queries_nonempty(spark):
    """rows-only sanity for the non-oracle queries."""
    for name in ("kg_components", "kg_component_count", "dd_simhash"):
        df = E.queries()[name](spark, SF_DIR)
        assert df.count() >= 0  # executes without error; shape checked below
    cc = E.queries()["kg_components"](spark, SF_DIR)
    assert cc.columns == ["id", "component"]


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
