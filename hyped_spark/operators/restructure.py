"""Projection / restructuring operators (reference P1–P3).

- ``format_features``  ≙ FormatFeatures (/root/reference/src/hyped/data/
  processors/features/format.py:14-64): project/rename/restructure via a
  nested mapping of feature paths, constants, lists and dicts — compiled
  directly to Catalyst column expressions (``F.col/struct/array/lit``),
  the Spark superset of the reference's FeatureKey/FeatureCollection
  expression language (feature_key.py:492-783).
- ``flatten_features`` ≙ FlattenFeatures (features/flatten.py:16-115):
  recursive struct flattening with delimiter-joined names.
- ``filter_features``  ≙ FilterFeatures (features/filter.py:14-127):
  keep/remove column sets (exactly one of the two).

All pure projections: zero shuffle, collapsed by Catalyst into the scan
(column pruning reaches the parquet reader).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class Const:
    """A literal leaf in a format mapping (≙ reference Const,
    feature_key.py:492-530)."""

    def __init__(self, value: Any, dtype: str | T.DataType | None = None):
        self.value = value
        self.dtype = dtype

    def to_column(self) -> Column:
        col = F.lit(self.value)
        return col.cast(self.dtype) if self.dtype is not None else col


def _compile(spec: Any) -> Column:
    """Compile a format spec node to a Column.

    str            -> column path ("a.b" nested access; "a[0]" indexing)
    Const          -> literal
    Mapping        -> struct(named fields)
    Sequence       -> array(elements)   (all elements same type)
    Column         -> passthrough
    """
    if isinstance(spec, Column):
        return spec
    if isinstance(spec, Const):
        return spec.to_column()
    if isinstance(spec, str):
        return F.expr(spec) if ("[" in spec or "(" in spec) else F.col(spec)
    if isinstance(spec, Mapping):
        return F.struct(*[_compile(v).alias(k) for k, v in spec.items()])
    if isinstance(spec, Sequence):
        return F.array(*[_compile(v) for v in spec])
    raise TypeError(f"unsupported format spec node: {type(spec)}")


def format_features(df: DataFrame, mapping: Mapping[str, Any],
                    keep_input: bool = False) -> DataFrame:
    """Build new columns from a nested spec; optionally carry inputs through
    (``keep_input`` ≙ the reference's keep_input_features)."""
    new_cols = [_compile(spec).alias(name) for name, spec in mapping.items()]
    if keep_input:
        passthrough = [F.col(c) for c in df.columns if c not in mapping]
        return df.select(*passthrough, *new_cols)
    return df.select(*new_cols)


def flatten_features(df: DataFrame, delimiter: str = ":",
                     max_depth: int | None = None) -> DataFrame:
    """Flatten nested structs (and fixed-position array elements are left as
    arrays — Spark arrays are variable-length) into top-level columns."""

    def expand(field: T.StructField, prefix: str, depth: int) -> list[Column]:
        name = f"{prefix}{field.name}" if prefix else field.name
        path = name.replace(delimiter, ".") if prefix else field.name
        if isinstance(field.dataType, T.StructType) and (
            max_depth is None or depth < max_depth
        ):
            cols: list[Column] = []
            for sub in field.dataType.fields:
                cols.extend(
                    _expand_sub(sub, name + delimiter, path + ".", depth + 1)
                )
            return cols
        return [F.col(path).alias(name)]

    def _expand_sub(field: T.StructField, name_prefix: str, path_prefix: str,
                    depth: int) -> list[Column]:
        name = name_prefix + field.name
        path = path_prefix + field.name
        if isinstance(field.dataType, T.StructType) and (
            max_depth is None or depth < max_depth
        ):
            cols: list[Column] = []
            for sub in field.dataType.fields:
                cols.extend(
                    _expand_sub(sub, name + delimiter, path + ".", depth + 1)
                )
            return cols
        return [F.col(path).alias(name)]

    out: list[Column] = []
    for field in df.schema.fields:
        out.extend(expand(field, "", 0))
    return df.select(*out)


def filter_features(df: DataFrame, keep: list[str] | None = None,
                    remove: list[str] | None = None) -> DataFrame:
    """Keep XOR remove column sets; missing columns are an error (the
    reference validates at prepare time, features/filter.py:40-57)."""
    if (keep is None) == (remove is None):
        raise ValueError("specify exactly one of keep/remove")
    cols = set(df.columns)
    wanted = keep if keep is not None else remove
    missing = [c for c in wanted if c not in cols]
    if missing:
        raise ValueError(f"columns not in schema: {missing}")
    if keep is not None:
        return df.select(*keep)
    return df.drop(*remove)
