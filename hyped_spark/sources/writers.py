"""Sharded sinks (reference S4/S5/S6 analogues).

The reference's consumer framework (worker pool, shard queue, throughput
meter — /root/reference/src/hyped/common/consumer.py:111-399) collapses into
``df.write``: tasks = workers, partitions = shards, Spark UI/metrics = the
meter. These wrappers add the reference writers' contracts:

- JSONL sink with a schema sidecar (≙ features JSON sidecar,
  writers/base.py:72-101) and one file per task (≙ one shard per worker).
- CSV sink with the primitives-only schema check
  (≙ writers/csv.py:15-103's validation).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_PRIMITIVES = (
    T.StringType, T.BooleanType, T.ByteType, T.ShortType, T.IntegerType,
    T.LongType, T.FloatType, T.DoubleType, T.DecimalType, T.DateType,
    T.TimestampType,
)


def write_jsonl(df: DataFrame, path: str, num_shards: int | None = None,
                mode: str = "overwrite") -> None:
    """Sharded JSONL with a schema sidecar (schema.json next to the data)."""
    out = df.coalesce(num_shards) if num_shards else df
    out.write.mode(mode).json(path)
    # leading underscore => ignored by Spark readers (like _SUCCESS), so the
    # sidecar doesn't pollute a later scan of the directory
    with open(os.path.join(path, "_schema.json"), "w") as f:
        json.dump(df.schema.jsonValue(), f)


def write_csv(df: DataFrame, path: str, num_shards: int | None = None,
              mode: str = "overwrite", header: bool = True) -> None:
    """CSV sink; rejects non-primitive columns up front (prepare-time check,
    like the reference's features validation)."""
    bad = [f.name for f in df.schema.fields if not isinstance(f.dataType, _PRIMITIVES)]
    if bad:
        raise ValueError(f"CSV cannot encode non-primitive columns: {bad}")
    out = df.coalesce(num_shards) if num_shards else df
    out.write.mode(mode).option("header", str(header).lower()).csv(path)
