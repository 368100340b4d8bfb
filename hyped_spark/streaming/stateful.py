"""Stateful cross-batch streaming dedup (applyInPandasWithState).

The CDC merge path does NOT need this — the idempotent LWW merge makes
replayed and out-of-order deliveries harmless (SURVEY §2.9). This operator
serves the OTHER stream shape: event firehoses with no total order and no
natural LWW key (e.g. at-least-once telemetry), where "first observation
wins" must hold across micro-batches.

``dedup_stream`` keys the stream and keeps one boolean marker of state per
key: the first row for a key is emitted, every later row (same batch or any
later batch) is suppressed. With ``ttl_minutes`` the marker expires via a
processing-time timeout, bounding state for unbounded key spaces — the
standard trade: a duplicate arriving after the TTL is re-emitted.

At scale: state lives in the state store partitioned by key (RocksDB-backed
on a real cluster); per-batch work is one shuffle on the key plus an
Arrow-batched python stage per group partition.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Emit only the first-seen row per key across all micro-batches."""
    out_schema = stream.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    ttl_ms = None if ttl_minutes is None else ttl_minutes * 60_000

    def fn(key, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:  # pragma: no cover (executor)
        if state.hasTimedOut:
            state.remove()
            return
        first_seen = not state.exists
        if first_seen:
            state.update((True,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if first_seen:
            for pdf in pdfs:
                if len(pdf):
                    yield pdf.head(1)
                    return

    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_minutes is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        stream.groupBy(*key_cols)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", timeout
        )
    )
