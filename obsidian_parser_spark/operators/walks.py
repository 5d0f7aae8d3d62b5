"""Deterministic random-walk corpus generation over the link graph.

DeepWalk/node2vec-style training data for graph embeddings: one walk per
start node over the DIRECTED distinct link edges.  The step choice is
hash-argmin instead of RNG — at step t from node u the walk moves to

    argmin over out-neighbors v of  md5('{salt}:{t}:' || u || '>' || v)

(ties, i.e. md5 collisions, break to the smaller v) — so the walk corpus
is a pure function of the edge set: bit-identical across engines, cluster
sizes, and retries, which makes it verifiable by an independent SQL oracle
and reproducible for training.  The hash depends on the step index, so a
walk revisiting a node does not loop deterministically forever.

The reference has no walk generator (its analyzer stops at degree stats,
examples/analyzer.rs:60-96); this is the standard next step for turning a
KG into embedding training data.

Scale shape: the step-t argmin is a function of (t, u) alone, so all
n_steps next-hop choices are precomputed by ONE map-side-combined
aggregation over the edge list (a hub with 10^6 out-edges costs one
partial-min over its adjacency, not a sort); each step is then a
frontier-sized equi-join against that one-row-per-node table — no window
over the full edge list, no driver loop over rows.  The frontier never
exceeds one row per start node.  Walks ending at a sink (no out-edges)
simply stop producing rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpointing import cut_lineage


def deterministic_walks(
    edges: DataFrame,
    n_steps: int = 3,
    salt: str = "w",
) -> DataFrame:
    """(subj, obj) directed edges → (start, step, node) walk rows.

    step 0 is the start node itself; steps 1..n_steps follow the
    hash-argmin rule above.  Self-loops are legitimate moves (the walk
    stays put for that step).  Only nodes with at least one out-edge
    start a walk — a walk of length 0 says nothing.
    """
    e = edges.select(F.col("subj").alias("u"), F.col("obj").alias("v")).distinct()
    # The step-t argmin depends only on (t, u, v) — never on the walk's
    # start — so the next hop from u at step t is the SAME for every walk
    # currently at u.  Precompute all n_steps next-hop columns in ONE
    # map-side-combined pass over the edge list (the distinct and the
    # groupBy share the (u, v)-keyed exchange); each step then becomes a
    # frontier-sized equi-join against this one-row-per-node table instead
    # of an edge-fanout join + corpus-sized re-aggregation per step
    # (measured at sf0.1 / local[32]: 7.7 s → ~1 s for 3 steps).
    aggs = [
        F.min(
            F.struct(
                F.md5(
                    F.concat(
                        F.lit(f"{salt}:{t}:"), F.col("u"), F.lit(">"), F.col("v")
                    )
                ).alias("h"),
                F.col("v"),
            )
        )[("v")].alias(f"_n{t}")
        for t in range(1, n_steps + 1)
    ]
    nxt = cut_lineage(e.groupBy("u").agg(*aggs))
    starts = nxt.select(F.col("u").alias("start"))
    cur = starts.select("start", F.col("start").alias("node"))
    out = [cur.select("start", F.lit(0).alias("step"), "node")]
    for t in range(1, n_steps + 1):
        stepped = (
            cur.join(nxt, cur["node"] == nxt["u"])
            .select("start", F.col(f"_n{t}").alias("node"))
        )
        # each round's frontier is ≤ one row per start; cutting lineage
        # keeps the per-step plan flat instead of n_steps joins deep
        cur = cut_lineage(stepped)
        out.append(cur.select("start", F.lit(t).alias("step"), "node"))
    result = out[0]
    for frame in out[1:]:
        result = result.unionByName(frame)
    return result


def walk_skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(start, step, node) walk rows → (center, context, n) skip-gram
    co-occurrence pairs with 0 < |Δstep| ≤ ``window`` — the word2vec-style
    training pairs DeepWalk feeds to an embedding model, aggregated to
    exact counts.

    Scale shape: a self-join on the walk id (start) — each walk has at
    most n_steps+1 rows, so the per-key fan-out is the constant
    (n_steps+1)·2·window, never data-dependent — followed by one
    map-side-combined count."""
    a = walks.select(
        "start", F.col("step").alias("s1"), F.col("node").alias("center")
    )
    b = walks.select(
        "start", F.col("step").alias("s2"), F.col("node").alias("context")
    )
    d = F.abs(F.col("s1") - F.col("s2"))
    return (
        a.join(b, "start")
        .filter((d > 0) & (d <= window))
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def hash_negative_samples(
    edges: DataFrame,
    n_trials: int = 4,
    n_buckets: int | None = None,
    target_bucket_size: int = 16,
    salt: str = "neg",
) -> DataFrame:
    """→ (u, v, trial): deterministic NON-edge candidates for contrastive
    training (TransE/link-prediction negatives) — per trial each node is
    hashed into a bucket and paired with the bucket-mate minimizing a
    second hash, with true edges (either direction) anti-joined away.
    Pure function of the edge set: reproducible across engines, retries,
    and cluster sizes, and verifiable by the SQL oracle.

    A node gets ≤ 1 candidate per trial (its bucket may hold none that
    survive the self/edge filters).  The bucket join is quadratic WITHIN
    a bucket, so bucket size is the scale knob: with ``n_buckets=None``
    it is derived from one count as |V| / ``target_bucket_size`` —
    expected pair work per trial stays |V| · target_bucket_size, linear
    in the graph, never an all-pairs product."""
    sym = edges.select(F.col("subj").alias("u"), F.col("obj").alias("v"))
    und = cut_lineage(
        sym.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("lu"), F.greatest("u", "v").alias("gu")
        )
        .distinct()
    )
    nodes = cut_lineage(
        sym.select("u")
        .unionByName(sym.select(F.col("v").alias("u")))
        .distinct()
    )
    if n_buckets is None:
        n_buckets = max(32, nodes.count() // target_bucket_size)

    def bkt(col, trial):
        h = F.md5(F.concat(F.lit(f"{salt}:b{trial}:"), col))
        return F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % n_buckets

    out = None
    for t in range(1, n_trials + 1):
        a = nodes.select(
            F.col("u").alias("cu"), bkt(F.col("u"), t).alias("b")
        )
        b = nodes.select(
            F.col("u").alias("cv"), bkt(F.col("u"), t).alias("b")
        )
        pick = F.md5(
            F.concat(F.lit(f"{salt}:p{t}:"), F.col("cu"), F.lit(">"), F.col("cv"))
        )
        cand = (
            a.join(b, "b")
            .filter(F.col("cu") != F.col("cv"))
            .join(
                und,
                (F.least("cu", "cv") == und["lu"])
                & (F.greatest("cu", "cv") == und["gu"]),
                "left_anti",
            )
            .select("cu", "cv", pick.alias("h"))
            .groupBy("cu")
            .agg(F.min(F.struct("h", "cv")).alias("_m"))
            .select(
                F.col("cu").alias("u"),
                F.col("_m.cv").alias("v"),
                F.lit(t).cast("long").alias("trial"),
            )
        )
        out = cand if out is None else out.unionByName(cand)
    return out


def biased_walks(
    edges: DataFrame,
    n_steps: int = 3,
    salt: str = "n2v",
    tier_return: int = 2,
    tier_common: int = 0,
    tier_far: int = 1,
) -> DataFrame:
    """node2vec-style SECOND-ORDER biased walks, deterministic: → (start,
    step, node) like ``deterministic_walks``, but from step 2 on the next
    hop is chosen by argmin of (tier(v), md5('{salt}:{t}:u>v'), v) where

        tier(v) = tier_return  if v == prev           (node2vec 1/p)
                  tier_common  if (prev → v) is an edge (distance-1 stay)
                  tier_far     otherwise                (node2vec 1/q)

    — the deterministic analog of node2vec's p/q biasing (Grover &
    Leskovec 2016): the defaults (2, 0, 1) prefer triangle-closing local
    moves, then exploration, and immediate backtracking last, i.e. a
    BFS-flavored p>1, q<1 regime.  Step 1 has no predecessor and falls
    back to the first-order hash-argmin rule, so walk tables remain a
    pure function of the edge set — bit-identical across engines and
    cluster sizes, SQL-oracle-verifiable.

    Scale shape: the walk state carries (start, prev, node) — still ≤ 1
    row per start.  Per step: one equi-join frontier×edges on the current
    node (key-partitioned), one LEFT join of the candidate (prev, v)
    pairs against the edge list for the tier test (key-partitioned on
    prev), one map-side-combined min-struct per start.  The second-order
    memory costs exactly one extra equi-join per step — no adjacency
    broadcast, no per-row Python."""
    e = cut_lineage(
        edges.select(F.col("subj").alias("u"), F.col("obj").alias("v")).distinct()
    )
    starts = e.select(F.col("u").alias("start")).distinct()
    cur = starts.select(
        "start", F.col("start").alias("node"), F.lit(None).cast("string").alias("prev")
    )
    out = [cur.select("start", F.lit(0).alias("step"), "node")]
    for t in range(1, n_steps + 1):
        h = F.md5(F.concat(F.lit(f"{salt}:{t}:"), F.col("u"), F.lit(">"), F.col("v")))
        cand = cur.join(e, cur["node"] == e["u"]).select(
            "start", "prev", F.col("node").alias("_from"), h.alias("h"), F.col("v")
        )
        if t == 1:
            scored = cand.withColumn("tier", F.lit(tier_far))
        else:
            pe = e.select(F.col("u").alias("prev"), F.col("v").alias("v"),
                          F.lit(1).alias("_pc"))
            scored = cand.join(pe, ["prev", "v"], "left").withColumn(
                "tier",
                F.when(F.col("v") == F.col("prev"), F.lit(tier_return))
                .when(F.col("_pc").isNotNull(), F.lit(tier_common))
                .otherwise(F.lit(tier_far)),
            )
        stepped = (
            scored.groupBy("start")
            .agg(F.min(F.struct("tier", "h", "v", "_from")).alias("_m"))
            .select(
                "start",
                F.col("_m.v").alias("node"),
                F.col("_m._from").alias("prev"),
            )
        )
        cur = cut_lineage(stepped)
        out.append(cur.select("start", F.lit(t).alias("step"), "node"))
    result = out[0]
    for frame in out[1:]:
        result = result.unionByName(frame)
    return result
