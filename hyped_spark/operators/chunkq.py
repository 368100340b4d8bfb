"""Canonical chunking query used by the driver contract (X1 analogue)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hyped_spark.operators.sequence import chunk_seq


def chunk_tokens_query(documents: DataFrame, size: int = 8, stride: int = 4) -> DataFrame:
    """Overlapping token windows over documents.text: 1 doc → k chunks."""
    toks = documents.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    chunks = chunk_seq(toks, "toks", "chunk", chunk_size=size,
                       chunk_stride=stride, drop_last=False, with_pos=True)
    return chunks.select(
        "doc_id",
        F.col("chunk_pos").cast("int").alias("chunk_pos"),
        F.array_join(F.col("chunk"), " ").alias("chunk_str"),
    )
