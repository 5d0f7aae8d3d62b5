"""Custom stateful streaming operator: running backlink counts.

``applyInPandasWithState`` keeps one state row per target note across
micro-batches: as edge batches stream in, each target's cumulative backlink
count is updated and the NEW total is emitted — the streaming form of
``analytics.backlink_counts`` (A9) for a continuously-ingested vault.

State schema: (count: long).  Output: (obj, backlinks, batch_delta).
No event-time needed (monotone counter), so NoTimeout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    delta = 0
    for pdf in pdfs:
        delta += len(pdf)
    (prev,) = state.get if state.exists else (0,)
    total = prev + delta
    state.update((total,))
    yield pd.DataFrame(
        {"obj": [key[0]], "backlinks": [total], "batch_delta": [delta]}
    )


def running_backlinks(edge_stream: DataFrame) -> DataFrame:
    """edge_stream: a STREAMING frame with at least (obj, pred) columns.

    Returns the streaming frame of per-batch updated totals; write with
    ``outputMode("update")`` (or "append" — each emitted row is a snapshot)."""
    links = edge_stream.filter("pred != 'tagged'")
    return links.groupBy("obj").applyInPandasWithState(
        _update,
        outputStructType="obj string, backlinks long, batch_delta long",
        stateStructType="count long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
