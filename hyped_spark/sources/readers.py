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
    fail the read (FAILFAST); strict=False: they land in _corrupt_record."""
    reader = spark.read.schema(
        schema if strict
        else T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    )
    mode = "FAILFAST" if strict else "PERMISSIVE"
    df = reader.option("mode", mode).json(path)
    if not strict:
        # Spark refuses queries touching only _corrupt_record on a raw JSON
        # scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN);
        # caching materializes the parse and lifts the restriction.
        df = df.cache()
    return df


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
