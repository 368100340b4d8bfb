"""Cluster entrypoint: the CDC ingest job under spark-submit.

Local (sandbox) smoke::

    python scripts/run_ingest_job.py --source /path/log --table /path/table \
        --metrics /path/metrics --mode stream

Cluster (the north-rule deployment)::

    cd /root/repo && zip -r /tmp/hyped_spark.zip hyped_spark
    spark-submit \
      --master <cluster-master> \
      --py-files /tmp/hyped_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.shuffle.partitions=<2-3x total cores> \
      scripts/run_ingest_job.py \
      --source s3://.../binlog --table s3://.../pages_table \
      --metrics s3://.../metrics --checkpoint s3://.../ckpt \
      --mode stream --buckets 16384 --batch-lsns 100000000

Run the identical job at N and 4N executors on the same input and compare
events/sec from the metrics table for the scaling-efficiency criterion
(protocol in BASELINE.md; sandbox evidence in BENCH/BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="binlog segment dir (parquet)")
    ap.add_argument("--table", required=True)
    ap.add_argument("--metrics", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--mode", choices=["stream", "batch"], default="stream")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--batch-lsns", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=None, help="local mode only")
    args = ap.parse_args()

    from hyped_spark.session import get_spark
    from hyped_spark.plans.replay import ReplayConfig, ReplayEngine

    spark = get_spark("hyped_spark_ingest", cores=args.cores)

    if args.mode == "stream":
        from hyped_spark.streaming.stream import StreamConfig, run_stream

        engine = run_stream(spark, StreamConfig(
            source_dir=args.source,
            checkpoint_dir=args.checkpoint or args.table + "_ckpt",
            table_path=args.table,
            metrics_path=args.metrics,
            n_buckets=args.buckets,
        ))
    else:
        engine = ReplayEngine(spark, ReplayConfig(
            table_path=args.table, metrics_path=args.metrics,
            batch_lsns=args.batch_lsns, n_buckets=args.buckets,
        ))
        engine.replay(spark.read.parquet(args.source))

    from hyped_spark.streaming.metrics import batch_summary, lineage_check

    batch_summary(engine.metrics()).show(50, truncate=False)
    print(json.dumps(lineage_check(engine.metrics())))


if __name__ == "__main__":
    main()
