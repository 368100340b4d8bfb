"""Gap-based sessionization over the native session_window aggregate."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_sessionize_semantics(spark):
    from hyped_spark.operators.joins import sessionize

    base = dt.datetime(2024, 1, 1)
    m = lambda k: base + dt.timedelta(minutes=k)
    rows = [
        (1, m(0)), (1, m(29)), (1, m(59)), (1, m(89)),  # chained extension
        (2, m(0)), (2, m(30)),      # exactly gap apart -> still one session
        (2, m(61)),                 # 31 min after previous -> new session
        (3, m(5)),                  # singleton
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(df, "ts", "user_id", "30 minutes").collect()
    )
    assert out == [
        (1, m(0), m(119), 4),   # end = last event + gap
        (2, m(0), m(60), 2),
        (2, m(61), m(91), 1),
        (3, m(5), m(35), 1),
    ]


def test_sessionize_extra_aggs_and_plan(spark):
    from hyped_spark.operators.joins import sessionize

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, base, 2.0), (1, base + dt.timedelta(minutes=5), 3.0)],
        "user_id long, ts timestamp, value double",
    )
    out = sessionize(df, "ts", "user_id", "30 minutes",
                     agg_cols=[F.sum("value").alias("total")]).collect()
    assert len(out) == 1 and out[0].total == 5.0 and out[0].n_events == 2
    # single aggregation, no join / window-function sort pass
    plan = sessionize(df, "ts", "user_id", "30 minutes")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Join" not in plan
