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


def test_sessionize_on_a_stream(spark, tmp_path):
    """The same sessionize() expression runs unchanged on a stream: with a
    watermark, a session emits exactly once when the watermark passes its
    end, and its state is evicted (SURVEY §2.9 claim-backing)."""
    import os

    from hyped_spark.operators.joins import sessionize

    src = tmp_path / "segs"
    src.mkdir()

    def seg(name, rows, mtime):
        df = spark.createDataFrame(
            [(u, dt.datetime(2024, 1, 1, *t)) for u, t in rows],
            "user_id long, ts timestamp",
        )
        p = str(src / name)
        df.coalesce(1).write.parquet(p)
        os.utime(p, (mtime, mtime))
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (mtime, mtime))

    # batch 1: user 7 has two events 20s apart (one session, gap 1 min)
    seg("seg0", [(7, (10, 0, 0)), (7, (10, 0, 20))], 1_000)
    # batch 2: user 7 again much later (second session) + user 8 singleton
    seg("seg1", [(7, (10, 10, 0)), (8, (10, 10, 30))], 2_000)
    # batch 3: far-future event closes everything still open
    seg("seg2", [(9, (12, 0, 0))], 3_000)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src) + "/seg*")
    )
    q = (
        sessionize(stream.withWatermark("ts", "2 minutes"),
                   "ts", "user_id", "1 minute")
        .writeStream.format("memory").queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        (r.user_id, r.session_start.strftime("%H:%M:%S"), r.n_events)
        for r in spark.sql("select * from sessions").collect()
    )
    assert rows == [
        (7, "10:00:00", 2),
        (7, "10:10:00", 1),
        (8, "10:10:30", 1),
    ]
    # bounded state: only the still-open 12:00 session of user 9 remains
    state = q.recentProgress[-1]["stateOperators"][0]
    assert state["numRowsTotal"] == 1, state


def test_sessionize_randomized_vs_reference(spark):
    """300 random user timelines in ONE job vs a Python reference
    implementation of gap-splitting."""
    import random

    rng = random.Random(42)
    rows = []
    for uid in range(300):
        t = 0
        for _ in range(rng.randint(1, 12)):
            t += rng.randint(0, 90)  # minutes; gaps straddle the 30-min gap
            rows.append((uid, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=t)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")

    from hyped_spark.operators.joins import sessionize
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(df, "ts", "user_id", "30 minutes").collect()
    )

    # reference: sort each user's events, split where gap > 30 min
    byuser = {}
    for uid, ts in rows:
        byuser.setdefault(uid, []).append(ts)
    exp = []
    for uid, tss in byuser.items():
        tss.sort()
        start, prev, n = tss[0], tss[0], 1
        for ts in tss[1:]:
            if (ts - prev).total_seconds() > 1800:
                exp.append((uid, start, prev + dt.timedelta(minutes=30), n))
                start, n = ts, 0
            prev = ts
            n += 1
        exp.append((uid, start, prev + dt.timedelta(minutes=30), n))
    assert got == sorted(exp)
