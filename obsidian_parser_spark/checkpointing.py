"""Checkpoint policy for the iterative fixpoints (CC, PageRank, HITS, LSH).

Every iterative operator in this engine materializes intermediate frames to
cut lineage — otherwise round N's plan contains rounds 0..N-1 and the
optimizer re-derives the whole history per action.  Two materialization
strategies exist, with very different failure semantics:

* ``localCheckpoint()`` — blocks are stored on EXECUTORS.  Fast (no
  filesystem round-trip), fine on ``local[*]`` where executor loss means
  the whole JVM died anyway.  On a real cluster, losing one executor loses
  its blocks, and because the lineage was truncated there is nothing to
  recompute from: the job dies mid-fixpoint.
* ``checkpoint()`` — blocks are written to the RELIABLE checkpoint
  directory (``SparkContext.setCheckpointDir`` — HDFS/S3/DBFS on a
  cluster).  An executor loss re-reads the checkpoint files; the fixpoint
  survives.  This is the cluster-grade option the north_rule's resumable-
  lineage requirement expects.

``cut_lineage(df)`` picks automatically: if the session has a checkpoint
dir configured it uses reliable ``checkpoint()``, else ``localCheckpoint``.
So a cluster deployment opts in with ONE line::

    spark.sparkContext.setCheckpointDir("s3://bucket/checkpoints")

and every fixpoint in the engine (connected components, PageRank, HITS,
MinHash-LSH banding, identity canonicalization) switches to durable
checkpoints — no per-operator plumbing.  Both variants are EAGER (the
frame is computed at the call), which the callers rely on: a lazily cached
frame referenced from two sides of a self-join races its own cache
population.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def has_reliable_checkpoint(df: DataFrame) -> bool:
    """True iff the owning session has a reliable checkpoint dir set."""
    return df.sparkSession.sparkContext.getCheckpointDir() is not None


def cut_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and truncate its lineage — reliable
    ``checkpoint()`` when a checkpoint dir is configured, else
    ``localCheckpoint()``.  Eager in both modes."""
    if has_reliable_checkpoint(df):
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
