"""DataFrame -> DataFrame operator stages.

Each stage is a plain function (or a small configured callable) from
DataFrame to DataFrame with schema checkable up front via
``hyped_spark.plans.spec.probe_schema`` — the Spark-native analogue of the
reference's ``map_features`` prepare-time schema propagation
(/root/reference/src/hyped/data/processors/base.py:582-597).
"""

from hyped_spark.operators.lww import lww_dedup, lww_dedup_salted  # noqa: F401
