"""Extra benchmarks for the optimization round (bench.py is FROZEN).

Usage::

    python bench_extra.py <query> [<query> ...]   # per-query noop timing
    python bench_extra.py --explain <query>       # dump explain("formatted")

Runs each named query in THIS process (fresh JVM per invocation of the
script) with the same session config as bench.py, times a noop-sink write
per guide §1.4, and prints per-query seconds.  Scale-twin names from
bench.py (minhash_pairs_scale, hyperball_hostgraph_scale, ...) are
supported via the same builders bench.py uses.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_REPS", "3"))


def _scale_builders(spark):
    import pyspark.sql.functions as F

    from hyped_spark.operators.dedup import (
        line_dedup,
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from hyped_spark.operators.graphs import (
        connected_components_star,
        hyperball_harmonic,
    )
    from hyped_spark.operators.search import bm25_topk
    from hyped_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
        hll_count_distinct,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    lined = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.when(F.col("doc_id") % 3 == 0, F.lit("Cookie Notice"))
            .otherwise(F.concat(F.lit("Doc "), F.col("doc_id"))),
            F.col("text"),
        ).alias("text"),
    )
    sf_name = os.path.basename(SF_DIR.rstrip("/"))
    sf = float(sf_name.replace("sf", "") or 0.1) if sf_name.startswith("sf") else 0.1
    n_hosts = max(10_000, int(1_000_000 * sf))

    def _host_edges():
        return (
            spark.range(n_hosts)
            .select(F.col("id").alias("src"),
                    F.explode(F.sequence(
                        F.lit(0),
                        F.least(F.lit(63),
                                (F.lit(n_hosts) / (F.col("id") + 1))
                                .cast("long")),
                    )).alias("j"))
            .select("src",
                    F.pmod(F.xxhash64("src", "j"),
                           F.lit(n_hosts)).alias("dst"))
        )

    return {
        "bm25_search_pruned": lambda: bm25_topk(docs, "dup", k=20, prune=True),
        "minhash_pairs_scale": lambda: minhash_lsh_pairs(docs, min_jaccard=0.5),
        "simhash_pairs_scale": lambda: simhash_pairs(docs),
        "hll_distinct_scale": lambda: hll_count_distinct(
            ev, "user_id", p=12, group_cols=("event_type",)),
        "cms_counts_scale": lambda: cms_estimate(
            cms_sketch(ev, "event_type", width=1024, depth=4),
            ev.select("event_type").distinct(), "event_type", 1024, 4),
        "line_dedup_scale": lambda: line_dedup(lined),
        "cc_star_hostgraph_scale": lambda: connected_components_star(
            _host_edges()),
        "hyperball_hostgraph_scale": lambda: hyperball_harmonic(
            _host_edges(), radius=3, p=12),
    }


def main() -> None:
    import __spark_entry__ as entrymod
    from hyped_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain = "--explain" in sys.argv

    spark = get_spark("hyped_spark_bench_extra", cores=CPUS,
                      shuffle_partitions=CPUS)
    qmap = entrymod.queries()
    scale = _scale_builders(spark)

    # warmup identical to bench.py
    for t, expr in [("lineitem", "sum(l_quantity)"),
                    ("documents", "sum(length(text))"),
                    ("embeddings", "sum(size(embedding))"),
                    ("orders", "sum(o_totalprice)"),
                    ("part", "sum(p_size)"),
                    ("events", "sum(value)")]:
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")) \
            .selectExpr(expr).collect()

    for name in args:
        if name in qmap:
            build = lambda name=name: qmap[name](spark, SF_DIR)
        elif name in scale:
            build = scale[name]
        else:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        if explain:
            df = build()
            print(f"==== {name} ====")
            import contextlib, io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            print(buf.getvalue())
            continue
        samples = []
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            df = build()
            df.write.mode("overwrite").format("noop").save()
            samples.append(round(time.monotonic() - t0, 3))
        print(f"{name}: {samples} median={sorted(samples)[len(samples)//2]}")


if __name__ == "__main__":
    main()
