"""Benchmark runner (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also reports ``cdc_events_per_sec`` — the north-rule metric (sustained
merge-apply throughput) measured over a deterministic synthetic binlog
replay into a fresh SnapshotTable.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# queries from the driver contract worth timing at bench scale
BENCH_QUERIES = [
    "q1_pricing_summary",
    "revenue_per_nation",
    "top_orders_per_cust",
    "events_lww_latest",
    "events_lww_salted",
    "explode_words",
    "chunk_tokens",
    "token_stats",
    "lang_id_dist",
    "exact_dedup_docs",
    "minhash_pairs_docs",
    "simhash_pairs_docs",
    "ann_topk_cosine",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "ann_topk_sq8",
    "ann_topk_ivf_sq",
    "embedding_neardup",
    "relex_mark_docs",
    "seq_val_hist",
    "disc_seq_val_hist",
    "asof_join_events",
    "asof_forward_events",
    "range_join_parts",
    "hash_split_docs",
    "pack_sequences_docs",
    # the _fast variants are the operators' scale defaults (native xxhash64
    # gram hashing); the md5-portable twins exist for the DuckDB oracle and
    # run at correctness sf only — benching them measured the oracle tax,
    # not the engine (47% of the r3 total was md5 in decontaminate_docs)
    "repetition_docs_fast",
    "decontaminate_docs_fast",
    # round 4 additions: substring-span dedup runs the xxhash64 fold-hash
    # scale path (its oracle compares gram strings, hash-independent);
    # pii scrub and stratified sample are map-only native regexp/hash
    "dup_span_docs",
    "pii_scrub_docs",
    "stratified_sample_docs",
    "price_percentiles",
    "vocab_top_tokens",
    "sessionize_events",
    "c4_clean_docs",
    "bm25_search_docs",
    "rollup_revenue",
    "lm_perplexity_docs",
    "image_features_docs",
    "pivot_order_status",
    # round 5 additions: repair-JSON parse (Arrow UDF), template render
    # (format_string fast path + UDF path), span-algebra round-trip, real
    # stdlib PNG decode (encode + inflate + unfilter + ahash per row)
    "repair_json_docs",
    "render_template_docs",
    "token_spans_docs",
    "image_decode_real_docs",
    # inverted-index BM25: build + search in one timed query (the search
    # alone over a stored index is the bm25_search_pruned shape below)
    "bm25_indexed_docs",
    "normalize_text_docs",
    "stats_report_lineitem",
    "canonical_url_orders",
    "audio_features_docs",
    "zorder_key_lineitem",
    "hot_event_types",
    "weighted_sample_docs",
    # web curation: UT1-style suffix blocklist (broadcast semi/anti join)
    # and per-domain quota cap (one exchange + WindowGroupLimit)
    "blocklist_filter_docs",
    "cap_domain_docs",
    # map-only hashed-BoW classifier inference (broadcast weights row)
    "quality_classifier_docs",
    # 5 power iterations over the synthesized host graph (2 exchanges +
    # 1 scalar collect per round, lineage cut by localCheckpoint)
    "pagerank_hosts",
    # WARC serialize+parse per Arrow batch (stdlib codec, map-only)
    "warc_roundtrip_docs",
    # PQ ANN: per-subspace codebooks, byte codes, broadcast ADC LUT fold
    "ann_topk_pq",
    # IVF-PQ: coarse cells prune candidates, ADC scores inside them
    "ann_topk_ivf_pq",
    # jusText-style block-density extraction (native HOF, map-only)
    "extract_blocks_docs",
    # outlink extraction + base resolution (native regexp, map-only)
    "outlinks_docs",
    # robots.txt group resolution + longest-match verdicts
    "robots_filter_docs",
    # standalone min-label connected components (6 exact integer rounds)
    "connected_components_docs",
    # HyperBall harmonic centrality (HLL balls, 3 hops)
    "harmonic_centrality_hosts",
    # round 6: real AVI container parse + frame sample + PNG pixel decode
    "video_frames_docs",
    # DSIR selection: two hashed-gram fits + map-only weigh + Gumbel top-k
    "dsir_select_docs",
    # distributed BPE training: 12 vocab-sized merge rounds
    "bpe_train_docs",
    # Gopher rule bundle: one native struct expr, map-only
    "gopher_filter_docs",
    # k-means clustering: bounded fit + map-only assignment
    "kmeans_clusters_emb",
    # per-doc Shannon entropy (two ids-only exchanges)
    "token_entropy_docs",
    # hashed TF-IDF sparse vectors (one (id,bucket) exchange + broadcast IDF)
    "tfidf_vectors_docs",
    # anchor-text aggregation (map-only extract + one group)
    "anchor_text_hosts",
    # CCNet head/middle/tail: LM fit+score + quantile cutoffs + CASE
    "ccnet_buckets_docs",
    # frontier politeness slots (one host exchange, WindowGroupLimit cap)
    "frontier_schedule_docs",
]

# CDC replay sizing per sf dir (events, urls, batch_lsns)
CDC_SIZES = {
    "sf0.001": (5_000, 400, 2_500),
    "sf0.01": (20_000, 1_500, 10_000),
    "sf0.1": (100_000, 10_000, 25_000),
}


def main() -> None:
    from hyped_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("hyped_spark_bench", cores=CPUS, shuffle_partitions=CPUS)
    sf_name = os.path.basename(SF_DIR.rstrip("/"))
    sf = float(sf_name.replace("sf", "") or 0.1) if sf_name.startswith("sf") else 0.1

    timings: dict[str, float] = {}
    queries = entrymod.queries()

    # -- warmup (JVM codegen + real column scans; count() alone reads only
    # parquet footers, so the first timed query used to pay the first true
    # IO + whole-stage-codegen compile) --
    for t, expr in [("lineitem", "sum(l_quantity)"),
                    ("documents", "sum(length(text))"),
                    ("embeddings", "sum(size(embedding))"),
                    ("orders", "sum(o_totalprice)"),
                    ("part", "sum(p_size)"),
                    ("events", "sum(value)")]:
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")) \
            .selectExpr(expr).collect()

    # median-of-N per query (round-5 verdict task #3: single shots swung
    # 1.5-2x with co-tenant host load, making the round-over-round signal
    # unreadable; the median is robust to one noisy rep without the
    # systematic flattery of a best-of). Each rep re-CONSTRUCTS the frame
    # so eagerly-executing operators (pagerank's checkpointed iterations,
    # index builds) pay their real work inside every timed rep.
    reps = max(1, int(os.environ.get("BENCH_REPS", "3")))

    def _timed_median(build) -> float:
        samples = []
        for _ in range(reps):
            t0 = time.monotonic()
            df = build()
            df.write.mode("overwrite").format("noop").save()
            samples.append(time.monotonic() - t0)
        return round(statistics.median(samples), 3)

    for name in BENCH_QUERIES:
        timings[name] = _timed_median(
            lambda name=name: queries[name](spark, SF_DIR))

    # scale-path twins of the md5-portable sketch queries: the operators'
    # xxhash64 defaults, timed directly (candidate sets depend on hash
    # values, so these can't carry a DuckDB value oracle like the _fast
    # gram queries — quality is held by tests/test_dedup_quality.py; the
    # md5 entries above remain the oracle-checked contract queries)
    from hyped_spark.operators.dedup import (
        line_dedup,
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from hyped_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
        hll_count_distinct,
    )

    # selective-query BM25 with the term-presence prefilter: 'dup' hits
    # ~5% of the synthetic corpus, so the scoring/top-k input shrinks 20×
    # (identical ranking — verified in tests/test_search.py)
    from hyped_spark.operators.search import bm25_topk

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    # line_dedup scale twin: same boilerplate injection as the contract
    # query, xxhash64 line hashing instead of the md5 oracle hash
    import pyspark.sql.functions as F

    lined = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.when(F.col("doc_id") % 3 == 0, F.lit("Cookie Notice"))
            .otherwise(F.concat(F.lit("Doc "), F.col("doc_id"))),
            F.col("text"),
        ).alias("text"),
    )
    for name, build in [
        ("bm25_search_pruned",
         lambda: bm25_topk(docs, "dup", k=20, prune=True)),
        ("minhash_pairs_scale",
         lambda: minhash_lsh_pairs(docs, min_jaccard=0.5)),
        ("simhash_pairs_scale", lambda: simhash_pairs(docs)),
        ("hll_distinct_scale",
         lambda: hll_count_distinct(ev, "user_id", p=12,
                                    group_cols=("event_type",))),
        ("cms_counts_scale",
         lambda: cms_estimate(
             cms_sketch(ev, "event_type", width=1024, depth=4),
             ev.select("event_type").distinct(), "event_type", 1024, 4)),
        ("line_dedup_scale", lambda: line_dedup(lined)),
    ]:
        timings[name] = _timed_median(build)

    # graph scale twins (round-6 verdict task #6): the contract queries run
    # tiny demo graphs at oracle-friendly parameters; these run the same
    # operators at real parameters — a 10^5-node power-law host graph (at
    # sf0.1), star-variant CC (O(log²) rounds), HyperBall at p=12 /
    # xxhash64. Edge synthesis is part of each timed rep (it is one narrow
    # map — the operators dominate).
    from hyped_spark.operators.graphs import (
        connected_components_star,
        hyperball_harmonic,
    )

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

    for name, build in [
        ("cc_star_hostgraph_scale",
         lambda: connected_components_star(_host_edges())),
        ("hyperball_hostgraph_scale",
         lambda: hyperball_harmonic(_host_edges(), radius=3, p=12)),
    ]:
        timings[name] = _timed_median(build)

    # -- CDC merge-apply throughput (the north-rule headline) --
    from hyped_spark.plans.replay import ReplayConfig, ReplayEngine
    from hyped_spark.sources.synthetic import binlog

    n_events, n_urls, batch_lsns = CDC_SIZES.get(sf_name, CDC_SIZES["sf0.1"])
    # tmpfs: keep the throughput measurement off the sandbox's throttled
    # virtual disk (same rationale as scripts/scaling_bench.py)
    bench_dir = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="hyped_spark_bench_", dir=bench_dir)
    try:
        # materialize the log first so generation cost isn't in the timing
        log_path = os.path.join(work, "log")
        binlog(spark, n_events, n_urls, partitions=CPUS).write.parquet(log_path)
        log = spark.read.parquet(log_path)
        # warm-up replay on a throwaway table (discarded per BASELINE.md
        # protocol): pays the one-time codegen + Python-worker + Arrow init
        warm = ReplayEngine(
            spark,
            ReplayConfig(
                table_path=os.path.join(work, "warm_t"),
                metrics_path=os.path.join(work, "warm_m"),
                batch_lsns=batch_lsns,
                n_buckets=min(CPUS, 32),
                n_salt=8,
            ),
        )
        warm.replay(log.filter("lsn < 3000"))
        engine = ReplayEngine(
            spark,
            ReplayConfig(
                table_path=os.path.join(work, "table"),
                metrics_path=os.path.join(work, "metrics"),
                batch_lsns=batch_lsns,
                n_buckets=min(CPUS, 32),
                n_salt=8,
            ),
        )
        # cdc_replay stays single-shot BY DESIGN: replay is stateful —
        # a second pass over the same table path hits the batch-id skip
        # guard and would measure nothing (the warm-up table above pays
        # the one-time init instead)
        t0 = time.monotonic()
        stats = engine.replay(log)
        cdc_sec = time.monotonic() - t0
        applied = sum(s.rows_in_batch for s in stats if not s.skipped_replay)
        timings["cdc_replay"] = round(cdc_sec, 3)
        events_per_sec = round(applied / cdc_sec, 1)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "per_query_protocol": f"median_of_{reps}",
        "sf": sf,
        "cdc_events_per_sec": events_per_sec,
        "cdc_events": applied,
        "cpus": CPUS,
    }))


if __name__ == "__main__":
    main()
