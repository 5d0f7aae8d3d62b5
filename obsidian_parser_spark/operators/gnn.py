"""GNN training-data export: sampled ego-nets and dense integer ids.

Two standard steps for turning the KG into graph-neural-network /
KG-embedding training input, neither present in the reference (its
analyzer stops at degree statistics, examples/analyzer.rs:60-96):

* **Fanout-sampled k-hop ego-nets** (GraphSAGE-style neighbor sampling):
  for each seed node, a bounded subgraph — at hop ``t`` at most
  ``fanouts[t-1]`` out-neighbors per frontier node.  Sampling is
  hash-argmin instead of RNG: node ``u``'s sampled adjacency at hop ``t``
  is the ``f`` out-neighbors minimizing ``md5('{salt}:{t}:u>v')`` (ties
  to smaller ``v``) — a pure function of the edge set, bit-identical
  across engines, cluster sizes, and retries, hence verifiable by an
  independent SQL oracle.  The per-node sample is SHARED across egos
  (the hash does not involve the seed) so it is computed once per hop as
  a single per-key top-k over the edge table, not once per (seed, node):
  at 100 TB the sampling cost is O(|E|) per hop, and ego expansion is
  pure equi-joins against the (tiny, ≤ f·|V|-row) sampled adjacency.

* **Dense contiguous integer ids** for entities/relations and the
  id-mapped (h_id, r_id, t_id) triple table that TransE/RotatE-style
  trainers consume.  Dense global ranking is the textbook Spark trap —
  ``row_number()`` over an unpartitioned window is a single-reducer
  sort.  ``dense_ids`` does it scale-correctly: range-repartition on the
  key (ascending partition ids hold ascending key ranges), count rows
  per partition (one tiny aggregate — at most ``n_parts`` rows to the
  driver), broadcast the cumulative offsets back, and rank locally
  within each partition.  Every partition sorts only its own slice; no
  stage sees more than 1/``n_parts`` of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..checkpointing import cut_lineage


def sampled_adjacency(
    edges: DataFrame, fanout: int, hop: int, salt: str = "ego"
) -> DataFrame:
    """(subj, obj) directed edges → (u, v) with at most ``fanout`` rows
    per ``u``: the out-neighbors minimizing ``md5('{salt}:{hop}:u>v')``,
    ties to smaller ``v``.  One window over the distinct edge list,
    partitioned by source node — each partition key's data is one
    adjacency list, so the sort is bounded by max out-degree, the same
    bound as any exact per-node top-k."""
    e = edges.select(
        F.col("subj").alias("u"), F.col("obj").alias("v")
    ).distinct()
    h = F.md5(
        F.concat(F.lit(f"{salt}:{hop}:"), F.col("u"), F.lit(">"), F.col("v"))
    )
    w = Window.partitionBy("u").orderBy(h, F.col("v"))
    return (
        e.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= fanout)
        .drop("_rn")
    )


def sampled_egonets(
    edges: DataFrame,
    fanouts: tuple[int, ...] = (3, 2),
    seed_mod: int = 8,
    salt: str = "ego",
) -> DataFrame:
    """→ (seed, hop, src, dst): the sampled ego-net edge lists.

    Seeds are the deterministic ~1/``seed_mod`` subset of source nodes
    whose ``md5('{salt}:s:node')`` first 4 hex digits, read as an
    integer, are ≡ 0 (mod ``seed_mod``).  Hop ``t`` edges are the
    frontier joined against the hop-``t`` sampled adjacency; the next
    frontier is that hop's distinct destinations.  A destination already
    seen in an earlier hop is expanded again only through its own sampled
    adjacency (standard GraphSAGE semantics: the computation graph may
    revisit nodes; rows are distinct per (seed, hop, src, dst))."""
    first_hop = sampled_adjacency(edges, fanouts[0], 1, salt)
    seed_hash = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:s:"), F.col("u"))), 1, 4),
        16,
        10,
    ).cast("long")
    seeds = (
        first_hop.select("u")
        .distinct()
        .filter(seed_hash % seed_mod == 0)
        .select(F.col("u").alias("seed"))
    )
    out = None
    frontier = seeds.select("seed", F.col("seed").alias("node"))
    for t, f_t in enumerate(fanouts, start=1):
        adj = sampled_adjacency(edges, f_t, t, salt)
        hop_edges = (
            frontier.join(adj, frontier["node"] == adj["u"])
            .select(
                "seed",
                F.lit(t).alias("hop"),
                F.col("u").alias("src"),
                F.col("v").alias("dst"),
            )
            .distinct()
        )
        # the frontier is ≤ prod(fanouts so far) rows per seed; cutting
        # lineage keeps each hop's plan flat instead of k joins deep
        hop_edges = cut_lineage(hop_edges)
        out = hop_edges if out is None else out.unionByName(hop_edges)
        frontier = hop_edges.select("seed", F.col("dst").alias("node")).distinct()
    return out


def dense_ids(
    df: DataFrame, col: str, n_parts: int | None = None
) -> DataFrame:
    """Distinct values of ``df[col]`` → (``col``, id) with ids dense,
    contiguous from 0, ordered by the value ascending — equivalent to
    ``row_number() OVER (ORDER BY col) - 1`` but computed without a
    global single-partition window.

    Range-repartition guarantees partition ``i`` holds only values ≤
    every value in partition ``i+1``, so global rank = (sum of earlier
    partitions' counts) + local rank.  The per-partition counts are the
    only data movement to the driver: ≤ ``n_parts`` rows, small by
    construction (the same class of scalar collect as the CC convergence
    checksum)."""
    vals = df.select(F.col(col).cast("string").alias(col)).where(
        F.col(col).isNotNull()
    ).distinct()
    if n_parts is None:
        n_parts = max(vals.sparkSession.sparkContext.defaultParallelism, 2)
    ranged = cut_lineage(
        vals.repartitionByRange(n_parts, F.col(col)).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    counts = sorted(
        (r["_pid"], r["n"])
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    off = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("_pid").orderBy(col)
    return ranged.select(
        col,
        (
            F.element_at(off, F.col("_pid")) + F.row_number().over(w) - 1
        ).alias("id"),
    )


def triples_with_ids(edges: DataFrame) -> DataFrame:
    """Typed (subj, pred, obj) edges → distinct (h_id, r_id, t_id)
    triples under dense entity/relation ids — the standard integer
    triple file KG-embedding trainers read.  Entity ids span subjects ∪
    objects ordered lexicographically; relation ids likewise.  The
    relation table is small (predicate vocabulary) and broadcast; the
    entity joins are plain shuffle equi-joins on the id key."""
    t = edges.select("subj", "pred", "obj").distinct()
    ents = dense_ids(
        t.select(F.col("subj").alias("entity")).unionByName(
            t.select(F.col("obj").alias("entity"))
        ),
        "entity",
    )
    rels = dense_ids(t.select(F.col("pred").alias("rel")), "rel")
    return (
        t.join(ents.withColumnRenamed("entity", "subj"), "subj")
        .withColumnRenamed("id", "h_id")
        .join(F.broadcast(rels.withColumnRenamed("rel", "pred")), "pred")
        .withColumnRenamed("id", "r_id")
        .join(ents.withColumnRenamed("entity", "obj"), "obj")
        .withColumnRenamed("id", "t_id")
        .select("h_id", "r_id", "t_id")
    )
