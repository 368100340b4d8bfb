"""Z-order clustering: key correctness vs a pure-Python Morton reference,
DuckDB twin parity, and the data-skipping payoff vs a single-column sort."""
from __future__ import annotations

import duckdb
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hyped_spark.lake.zorder import (
    column_bounds, z_order_key, z_order_key_sql, z_order_sort,
)


def _py_morton(vals: list[float], bounds, bits: int) -> int:
    top = (1 << bits) - 1
    key = 0
    nc = len(vals)
    for j, (v, (lo, hi)) in enumerate(zip(vals, bounds)):
        b = 0 if hi <= lo else min(max(int((float(v) - lo) * (top / (hi - lo)) // 1), 0), top)
        for i in range(bits):
            key |= ((b >> i) & 1) << (i * nc + j)
    return key


def test_z_order_key_matches_python_and_duckdb(spark):
    df = spark.range(500).select(
        F.col("id"),
        (F.xxhash64("id") % 1000 / 10.0).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 1000 / 7.0).alias("y"),
    )
    bounds = [(-100.0, 100.0), (-143.0, 143.0)]
    got = df.withColumn(
        "z", z_order_key([F.col("x"), F.col("y")], bounds, bits=10)
    ).collect()
    for r in got:
        assert r.z == _py_morton([r.x, r.y], bounds, 10), (r.x, r.y)

    # DuckDB twin replays the identical key
    con = duckdb.connect()
    con.register("t", df.toPandas())
    sql_key = z_order_key_sql(["x", "y"], bounds, bits=10)
    dd = {r[0]: r[1] for r in
          con.execute(f"SELECT id, {sql_key} FROM t").fetchall()}
    for r in got:
        assert dd[r.id] == r.z


def test_z_order_key_validation(spark):
    import pytest

    with pytest.raises(ValueError, match="exceeds"):
        z_order_key([F.lit(1)] * 4, [(0.0, 1.0)] * 4, bits=16)
    with pytest.raises(ValueError, match="at least one"):
        z_order_key([], [])


def test_z_order_key_is_native(spark):
    df = spark.range(10).select(F.col("id").alias("x"), F.col("id").alias("y"))
    plan = df.select(
        z_order_key([F.col("x"), F.col("y")], [(0.0, 9.0), (0.0, 9.0)], 8)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # whole-stage codegen territory


def _files_touching(path: str, col_boxes: dict[str, tuple[float, float]]) -> int:
    """Files whose parquet column min/max stats overlap every query box —
    exactly the pruning a min-max-indexed scan performs."""
    import glob

    touched = 0
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        overlap = True
        for c, (lo, hi) in col_boxes.items():
            cmins, cmaxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[c]).statistics
                cmins.append(st.min)
                cmaxs.append(st.max)
            if min(cmins) > hi or max(cmaxs) < lo:
                overlap = False
        touched += overlap
    return touched


def test_z_order_skips_files_where_linear_sort_cannot(spark, tmp_path):
    n_files = 32
    df = spark.range(40_000).select(
        ((F.xxhash64("id") % 100000 + 100000) % 100000 / 100000.0).alias("x"),
        ((F.xxhash64("id", F.lit(7)) % 100000 + 100000) % 100000 / 100000.0).alias("y"),
    )
    linear = str(tmp_path / "linear")
    zorder = str(tmp_path / "zorder")
    df.repartitionByRange(n_files, "x").sortWithinPartitions("x") \
        .write.parquet(linear)
    z_order_sort(df, ["x", "y"], bounds=[(0.0, 1.0), (0.0, 1.0)],
                 bits=8, n_partitions=n_files).write.parquet(zorder)

    box_y = {"y": (0.45, 0.55)}
    lin_y = _files_touching(linear, box_y)
    z_y = _files_touching(zorder, box_y)
    # x-sorted layout cannot prune a y-only predicate at all
    assert lin_y == n_files
    assert z_y <= n_files // 2, z_y

    # and the z layout still prunes on x (both dims keep locality)
    z_x = _files_touching(zorder, {"x": (0.45, 0.55)})
    assert z_x < n_files, z_x


def test_column_bounds_and_degenerate(spark):
    df = spark.range(100).select(
        F.col("id").cast("double").alias("x"), F.lit(5.0).alias("c"))
    assert column_bounds(df, ["x", "c"]) == [(0.0, 99.0), (5.0, 5.0)]
    rows = df.withColumn(
        "z", z_order_key([F.col("x"), F.col("c")],
                         [(0.0, 99.0), (5.0, 5.0)], bits=8)).collect()
    # degenerate column contributes bucket 0 → key is x's bits spread out
    for r in rows:
        assert r.z == _py_morton([r.x, 5.0], [(0.0, 99.0), (5.0, 5.0)], 8)


def test_z_order_spec_stage(spark):
    from hyped_spark.plans.spec import PipelineSpec

    df = spark.range(1000).select(
        (F.col("id") % 97).cast("double").alias("x"),
        (F.col("id") % 89).cast("double").alias("y"))
    spec = PipelineSpec(source=None, stages=[
        {"op": "z_order", "columns": ["x", "y"],
         "bounds": [[0.0, 96.0], [0.0, 88.0]], "bits": 8, "n": 4}])
    out = spec.transform(df)
    assert out.columns == ["x", "y"]
    assert out.count() == 1000
