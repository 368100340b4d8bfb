"""Schema evolution: diff / widen / align.

The reference validates and propagates a *fixed* schema at prepare time
(/root/reference/src/hyped/data/pipe.py:84-117); the CDC engine inverts that:
the change stream may ADD columns or WIDEN types mid-log, and the target
table schema must evolve transactionally before each merge (north rule).

The rules implemented here mirror Iceberg's safe-evolution matrix:
  - column add           : always allowed (new column nullable).
  - int  -> long         : widen.
  - float -> double      : widen.
  - decimal scale-stable precision increase: (not needed; ints/floats only).
Anything else (drop, rename, narrow, incompatible change) raises.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# widen lattice: src -> allowed wider dst (transitive by construction)
_WIDEN: dict[str, set[str]] = {
    "byte": {"short", "integer", "long"},
    "short": {"integer", "long"},
    "integer": {"long"},
    "float": {"double"},
}


class SchemaEvolutionError(ValueError):
    pass


@dataclass
class SchemaDiff:
    added: list[T.StructField] = field(default_factory=list)
    widened: list[tuple[str, T.DataType, T.DataType]] = field(default_factory=list)  # name, old, new

    @property
    def is_noop(self) -> bool:
        return not self.added and not self.widened


def _can_widen(src: T.DataType, dst: T.DataType) -> bool:
    return dst.typeName() in _WIDEN.get(src.typeName(), set())


def diff_schemas(current: T.StructType, incoming: T.StructType) -> SchemaDiff:
    """Evolution needed so that ``current`` can absorb ``incoming`` rows.

    Columns present in ``current`` but absent from ``incoming`` are fine
    (incoming rows get NULLs via unionByName-style alignment). Columns in
    ``incoming`` but not ``current`` are adds. Same-name different-type is a
    widen if on the lattice, else an error.
    """
    cur = {f.name: f for f in current.fields}
    diff = SchemaDiff()
    for f in incoming.fields:
        if f.name not in cur:
            diff.added.append(T.StructField(f.name, f.dataType, nullable=True))
            continue
        old = cur[f.name].dataType
        if old == f.dataType:
            continue
        if _can_widen(old, f.dataType):
            diff.widened.append((f.name, old, f.dataType))
        elif _can_widen(f.dataType, old):
            continue  # incoming is narrower; aligned by cast on read
        else:
            raise SchemaEvolutionError(
                f"incompatible type change for column '{f.name}': {old} -> {f.dataType}"
            )
    return diff


def apply_diff(current: T.StructType, diff: SchemaDiff) -> T.StructType:
    """New table schema after applying the diff (column order preserved,
    adds appended — Iceberg semantics)."""
    widen = {name: new for name, _, new in diff.widened}
    fields = [
        T.StructField(f.name, widen.get(f.name, f.dataType), f.nullable, f.metadata)
        for f in current.fields
    ]
    return T.StructType(fields + diff.added)


def align_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project/cast ``df`` to exactly ``schema`` (missing cols -> NULL,
    narrower types cast up). The unionByName(allowMissingColumns=True)
    analogue with explicit casts, so one microbatch can contain rows from
    both sides of a widen event."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f in schema.fields:
        if f.name in have:
            col = F.col(f.name)
            if have[f.name].dataType != f.dataType:
                col = col.cast(f.dataType)
            cols.append(col.alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
