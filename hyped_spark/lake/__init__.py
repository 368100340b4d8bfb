"""Lakehouse layer: snapshot-log table with idempotent LWW merge.

``SnapshotTable`` implements the Iceberg-v2 semantics the north rule needs
(atomic snapshot commits whose summaries carry the applied LSN range, schema
evolution, bucket-level copy-on-write MERGE) in pure PySpark + parquet +
an atomic JSON commit log — because no Iceberg runtime jar ships in this
sandbox (offline). ``iceberg_backend`` holds the real-Iceberg ``MERGE INTO``
path used verbatim when the jar + catalog are configured on a cluster.
"""

from hyped_spark.lake.table import SnapshotTable, MergeStats  # noqa: F401
