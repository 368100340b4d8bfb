"""Typed readers (reference S1/S2 analogues).

- ``typed_json``  ≙ TypedJsonDataset (/root/reference/src/hyped/data/io/
  datasets/typed_json.py:16-133): schema-enforced JSONL. FAILFAST mode makes
  a type mismatch an error at read time, like the reference's per-chunk
  pydantic validation; PERMISSIVE+corrupt-column is the lenient variant.
- ``read_any``    ≙ the HF load_dataset passthrough (S1): one entry point
  for parquet/json/csv/orc with optional schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def typed_json(spark: SparkSession, path: str, schema: T.StructType,
               strict: bool = True) -> DataFrame:
    """Schema-enforced JSONL reader. strict=True: malformed/mistyped rows
    fail the read (FAILFAST); strict=False: they land in _corrupt_record.

    The permissive frame is returned UNCACHED (round 1 cached the whole
    input to lift Spark's corrupt-only-query restriction — a scale-killer
    that pinned the full dataset). The restriction only bites queries whose
    entire column set is ``_corrupt_record``; use ``corrupt_records`` for
    the error channel — it keeps a data column in the plan, so no cache and
    no restriction."""
    reader = spark.read.schema(
        schema if strict
        else T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    )
    mode = "FAILFAST" if strict else "PERMISSIVE"
    return reader.option("mode", mode).json(path)


def corrupt_records(df: DataFrame, keep_cols: list[str] | None = None) -> DataFrame:
    """Error channel of a ``typed_json(strict=False)`` read: the rows that
    failed typed parsing, with the raw line and (by default) every parsed
    column Spark could salvage. Selecting the data columns alongside
    ``_corrupt_record`` is what keeps the plan legal without caching."""
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"{CORRUPT_COL} not present — read with strict=False")
    cols = keep_cols if keep_cols is not None else [
        c for c in df.columns if c != CORRUPT_COL
    ]
    from pyspark.sql import functions as F

    return df.filter(F.col(CORRUPT_COL).isNotNull()).select(*cols, CORRUPT_COL)


def read_any(spark: SparkSession, fmt: str, path: str,
             schema: T.StructType | None = None, **options) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, str(v))
    if fmt not in {"parquet", "json", "csv", "orc", "text"}:
        raise ValueError(f"unsupported format {fmt!r}")
    return getattr(reader, fmt)(path)
