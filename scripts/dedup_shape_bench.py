"""A/B the physical shapes of the LWW dedup+write pipeline at two core counts.

Shapes:
  structmax : groupBy(key).agg(max(struct(lsn, payload)))      [current]
  maxjoin   : groupBy(key).agg(max(lsn)) + left-semi join back
  localsort : repartition(bucket) + sortWithinPartitions + mapInPandas
              streaming first-row-per-key dedup (one payload shuffle)

Each timed as: dedup(events) -> write parquet (tmpfs). Run:
    python scripts/dedup_shape_bench.py [cores] [events] [urls]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 16
EVENTS = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000
URLS = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
N_BUCKETS = 16


def main() -> None:
    from hyped_spark.session import get_spark
    from hyped_spark.sources.synthetic import binlog
    from pyspark.sql import functions as F

    spark = get_spark("dedup_shapes", cores=CORES, shuffle_partitions=2 * CORES,
                      extra_conf={"spark.local.dir": f"/dev/shm/sl_{CORES}"})
    work = tempfile.mkdtemp(dir="/dev/shm")
    log_path = f"{work}/log"
    binlog(spark, EVENTS, URLS, partitions=64).write.parquet(log_path)
    events = spark.read.parquet(log_path)
    bucket = F.pmod(F.xxhash64("url"), F.lit(N_BUCKETS)).cast("int")

    def structmax(df):
        payload = [c for c in df.columns if c != "url"]
        ordered = ["lsn"] + [c for c in payload if c != "lsn"]
        return (df.groupBy("url")
                .agg(F.max(F.struct(*[F.col(c) for c in ordered])).alias("b"))
                .select("url", *[F.col(f"b.{c}").alias(c) for c in ordered])
                .withColumn("__bucket", bucket))

    def maxjoin(df):
        winners = df.groupBy("url").agg(F.max("lsn").alias("lsn"))
        return df.join(winners, ["url", "lsn"], "left_semi").withColumn("__bucket", bucket)

    def localsort(df):
        import pandas as pd

        cols = df.columns + ["__bucket"]
        prepped = (df.withColumn("__bucket", bucket)
                   .repartition(2 * CORES, F.col("__bucket"))
                   .sortWithinPartitions("url", F.col("lsn").desc()))

        def dedup_iter(batches):
            last_key = None
            for pdf in batches:
                out = pdf.drop_duplicates(subset=["url"], keep="first")
                if last_key is not None and len(out) and out.iloc[0]["url"] == last_key:
                    out = out.iloc[1:]
                if len(pdf):
                    last_key = pdf.iloc[-1]["url"]
                yield out

        return prepped.mapInPandas(dedup_iter, prepped.schema)

    shapes = {"structmax": structmax, "maxjoin": maxjoin, "localsort": localsort}
    results = {}
    for name, fn in shapes.items():
        out = f"{work}/out_{name}"
        # warmup then timed
        fn(events).write.mode("overwrite").partitionBy("__bucket").parquet(out)
        t0 = time.monotonic()
        fn(events).write.mode("overwrite").partitionBy("__bucket").parquet(out)
        dt = time.monotonic() - t0
        n = spark.read.parquet(out).count()
        results[name] = (round(dt, 2), n)
        shutil.rmtree(out, ignore_errors=True)
    print("RESULTS", CORES, results)
    # plan shapes for the record
    for name, fn in shapes.items():
        plan = fn(events)._jdf.queryExecution().executedPlan().toString()
        agg_kinds = [k for k in ("SortAggregate", "HashAggregate", "ObjectHashAggregate")
                     if k in plan]
        print(f"PLAN {name}: aggs={agg_kinds} exchanges={plan.count('Exchange')}")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
