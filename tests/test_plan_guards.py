"""Physical-plan regression guards: cheap .explain assertions that keep the
100 TB plan shapes enforced in CI (the full audit with captured plans is
scripts/plan_audit.py → PLANS.md; these are the load-bearing subset)."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _exchanges(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_no_cartesian_on_scale_paths(spark):
    q = entrymod.queries()
    for name in ["minhash_pairs_docs", "simhash_pairs_docs",
                 "embedding_neardup", "ann_topk_lsh", "ann_topk_ivf",
                 "ann_topk_ivf_sq", "decontaminate_docs_fast"]:
        assert "CartesianProduct" not in _plan(q[name](spark, SF_DIR)), name


def test_sq_corpus_flows_as_smallint_codes(spark):
    """ADVICE r3: quantization must buy real bytes — the corpus side of the
    SQ scoring join carries array<smallint> codes (2 B/dim), with
    dequantization AFTER the join, not dequantized doubles before it."""
    q = entrymod.queries()
    for name in ["ann_topk_sq8", "ann_topk_ivf_sq"]:
        p = _plan(q[name](spark, SF_DIR))
        # the quantize projection materializes smallint codes (__cq) and
        # they are what the join consumes
        assert "smallint" in p, name
        assert "__cq" in p, name


def test_spread_shuffles_narrow_projection_only(spark):
    """VERDICT r3 #7: column pruning does not push through repartition, so
    library operators must project (id, text) BEFORE spread() — the
    documents scan in the sketch pipelines reads two columns, never the
    carried source/lang/n_chars."""
    q = entrymod.queries()
    for name in ["minhash_pairs_docs", "simhash_pairs_docs",
                 "decontaminate_docs_fast", "repetition_docs_fast"]:
        p = _plan(q[name](spark, SF_DIR))
        for chunk in p.split("ReadSchema: ")[1:]:
            schema_line = chunk.splitlines()[0]
            if "doc_id" in schema_line:  # the documents scan
                assert "source" not in schema_line, (name, schema_line)
                assert "n_chars" not in schema_line, (name, schema_line)


def test_narrow_scan_prunes_and_pushes(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    p = _plan(li.filter(F.col("l_shipdate") < "1996-01-01")
              .select("l_orderkey", "l_quantity"))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p or "LessThan(l_shipdate" in p
    assert "l_extendedprice" not in p.split("ReadSchema")[1][:300]


def test_window_topk_single_exchange(spark):
    p = _plan(entrymod.queries()["top_orders_per_cust"](spark, SF_DIR))
    assert _exchanges(p) == 1
    assert "WindowGroupLimit" in p


def test_exact_dedup_single_exchange_grouplimit(spark):
    """exact_dedup is the LWW-rank shape: one exchange, with the partial
    WindowGroupLimit dropping duplicate payload before the shuffle."""
    p = _plan(entrymod.queries()["exact_dedup_docs"](spark, SF_DIR))
    assert _exchanges(p) == 1
    assert len(re.findall(r"\(\d+\) WindowGroupLimit", p)) >= 2  # partial+final
    assert "Join" not in p


def test_pack_no_single_partition_exchange(spark):
    p = _plan(entrymod.queries()["pack_sequences_docs"](spark, SF_DIR))
    assert "Exchange SinglePartition" not in p


def test_small_side_joins_broadcast(spark):
    q = entrymod.queries()
    for name in ["revenue_per_nation", "decontaminate_docs",
                 "source_mixture_docs"]:
        p = _plan(q[name](spark, SF_DIR))
        assert "BroadcastHashJoin" in p, name
        assert "SortMergeJoin" not in p, name
    # brute-force ANN is an intentional small-side CROSS join: the right
    # plan is a broadcast nested loop (there is no equi-key), never a
    # shuffled cartesian
    p = _plan(q["ann_topk_cosine"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_sessionize_single_exchange_native_merge(spark):
    """Sessionization must stay ONE hash exchange + the native
    MergingSessions aggregate — no self-join, no window-function pass."""
    p = _plan(entrymod.queries()["sessionize_events"](spark, SF_DIR))
    assert _exchanges(p) == 1
    assert "MergingSessions" in p
    assert "Join" not in p


def test_c4_clean_is_pure_projection(spark):
    p = _plan(entrymod.queries()["c4_clean_docs"](spark, SF_DIR))
    assert _exchanges(p) == 0
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_bm25_no_corpus_shuffle_join(spark):
    """BM25 must never shuffle-join the corpus: the stats row arrives as a
    1-row broadcast nested loop, the top-k is a TakeOrdered."""
    p = _plan(entrymod.queries()["bm25_search_docs"](spark, SF_DIR))
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    assert "BroadcastNestedLoopJoin" in p
    assert "TakeOrderedAndProject" in p


def test_rollup_single_exchange_expand(spark):
    p = _plan(entrymod.queries()["rollup_revenue"](spark, SF_DIR))
    assert _exchanges(p) == 1
    assert "Expand" in p


def test_hll_pure_native_aggregates(spark):
    """HLL must stay two partial+final hash aggregates — no UDF, no join;
    the register shuffle carries at most 2^p rows per group."""
    from hyped_spark.operators.sketches import hll_count_distinct

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    p = _plan(hll_count_distinct(ev, "user_id", p=12,
                                 group_cols=("event_type",)))
    assert "Python" not in p and "Join" not in p
    assert _exchanges(p) == 2 and p.count("HashAggregate") >= 4


def test_cms_probe_broadcasts_sketch(spark):
    """The <= depth*width-row sketch broadcasts to the probe side; keys
    never shuffle for the join."""
    from hyped_spark.operators.sketches import cms_estimate, cms_sketch

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    sk = cms_sketch(ev, "event_type", width=1024, depth=4)
    p = _plan(cms_estimate(sk, ev.select("event_type").distinct(),
                           "event_type", 1024, 4))
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    assert "Python" not in p


def test_line_dedup_payload_single_pass(spark):
    """line_dedup's frequency count must see only (id, hash) pairs: the
    document text appears in at most ONE shuffle exchange (the join back),
    and nothing goes cartesian or through Python."""
    from hyped_spark.operators.dedup import line_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.concat_ws("\n", F.lit("hdr"), "text").alias("text"))
    p = _plan(line_dedup(docs))
    assert "CartesianProduct" not in p and "Python" not in p
    args = re.findall(r"\(\d+\) Exchange\n(.*?)\n\n", p, re.S)
    assert sum("text" in a for a in args) <= 1


def test_collect_sites_are_metadata_sized():
    """Executable form of the per-round driver-collect audit (round-5
    verdict task #8): every .collect() in non-test source must sit on the
    documented metadata-sized allowlist. A new operator that collects
    payload fails here before it ships."""
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "hyped_spark")
    # (file suffix, substring of the collecting statement's context,
    #  why it is metadata-sized)
    allow = [
        ("plans/replay.py", "agg(F.min(ordc), F.max(ordc))",
         "LSN bounds: 1 row"),
        ("plans/replay.py", 'groupBy("__k", "__bucket")',
         "per-(batch,bucket) meta: <=n_batches*n_buckets rows"),
        ("plans/spec.py", "wdf.orderBy(wdf.columns[0])",
         "mixture weights: 1 row per source"),
        ("plans/spec.py", 'mdf.orderBy("rank")',
         "BPE merge artifact: model-sized"),
        ("streaming/metrics.py", "batch_summary(metrics)",
         "per-micro-batch summary rows"),
        ("lake/iceberg_backend.py", "SHOW TBLPROPERTIES",
         "table properties: O(10) rows"),
        ("lake/iceberg_backend.py", 'alias("hi")',
         "batch ord-bound + count: 1 row"),
        ("lake/table.py", "bucket_expr", "touched-bucket ids: <=n_buckets"),
        ("lake/table.py", 'groupBy("__bucket")',
         "per-bucket batch meta: <=n_buckets rows"),
        ("operators/search.py", 'groupBy("term")',
         "per-query-term doc frequencies: O(query terms)"),
        ("operators/curation.py", 'agg(F.sum("__w"))',
         "grand total: 1 row"),
        ("operators/curation.py", 'groupBy("__pid")',
         "per-partition prefix offsets: O(partitions)"),
        ("operators/similarity.py", "train_cap",
         "hash-ranked training sample: bounded by train_cap"),
        ("operators/similarity.py", "one row per partition",
         "per-partition min/max partials: O(partitions) rows"),
        ("operators/bpe.py", 'orderBy(F.desc("cnt")',
         "per-round argmax pair: 1 row"),
        ("operators/dsir.py", 'groupBy("__b")',
         "hashed-gram bucket counts: <= buckets rows"),
        ("operators/graphs.py", "1-row aggregate: metadata-sized collect",
         "star-CC convergence signature / hyperball register audit: 1 row"),
    ]
    unexplained = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, root).replace(os.sep, "/")
            lines = open(path).read().split("\n")
            for i, line in enumerate(lines):
                if ".collect()" not in line:
                    continue
                # context = the statement around the call (collect often
                # terminates a multi-line chain)
                ctx = "\n".join(lines[max(0, i - 12):i + 1])
                if not any(rel.endswith(f) and s in ctx
                           for f, s, _ in allow):
                    unexplained.append(f"{rel}:{i + 1}: {line.strip()}")
    assert not unexplained, (
        "collect() sites not on the metadata-sized allowlist "
        "(add a justification or make the operator distributed):\n"
        + "\n".join(unexplained))
