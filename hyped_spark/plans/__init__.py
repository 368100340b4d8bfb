"""Plans: merge-source construction, the batch replay engine, pipeline spec."""

from hyped_spark.plans.replay import ReplayConfig, ReplayEngine, build_merge_source  # noqa: F401
