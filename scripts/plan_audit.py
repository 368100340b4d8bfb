"""Physical-plan audit: capture .explain("formatted") for the key plans and
assert the properties that matter at 100 TB.

Checks (written to PLANS.md):
- parquet scans carry PushedFilters / pruned ReadSchema (no full-width scan
  for narrow projections);
- dim joins go BroadcastHashJoin, fact aggregation is partial+final
  (HashAggregate x2 around the exchange);
- the LWW merge source is ONE exchange (no extra sort);
- per-batch log scans push the LSN range filter into the scan;
- whole-stage codegen covers the native pipelines.

Run: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from hyped_spark.session import get_spark
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    spark = get_spark("plan_audit", cores=4, shuffle_partitions=4)
    q = entrymod.queries()
    sections: list[tuple[str, str, list[tuple[str, bool]]]] = []

    # 1. narrow projection + filter pushdown
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    narrow = li.filter(F.col("l_shipdate") < "1996-01-01").select("l_orderkey", "l_quantity")
    p = plan_of(narrow)
    sections.append(("narrow scan (projection + predicate pushdown)", p, [
        ("filter pushed to scan", "PushedFilters: [IsNotNull(l_shipdate)" in p or "LessThan(l_shipdate" in p),
        ("schema pruned to 3 cols", "ReadSchema" in p and "l_extendedprice" not in p.split("ReadSchema")[1][:300]),
    ]))

    # 2. broadcast join + partial aggregation
    p = plan_of(q["revenue_per_nation"](spark, SF))
    sections.append(("revenue_per_nation (dim joins + agg)", p, [
        ("broadcast hash join", "BroadcastHashJoin" in p),
        ("partial+final hash agg", p.count("HashAggregate") >= 2),
        ("no sort-merge join", "SortMergeJoin" not in p),
    ]))

    # 3. LWW merge source (maxjoin): pruned hash-agg + semi join, no payload sort
    from hyped_spark.plans.replay import build_merge_source
    from hyped_spark.sources.synthetic import binlog
    log = binlog(spark, 1000, 100)
    p = plan_of(build_merge_source(log))
    sections.append(("build_merge_source (maxjoin LWW dedup + extract)", p, [
        ("winner agg is codegen'd HashAggregate", "HashAggregate" in p),
        ("payload never sort-aggregated", "SortAggregate" not in p),
        ("arrow-vectorized extraction", "ArrowEvalPython" in p),
    ]))

    # 4. LSN-range batch filter pushed into the log scan
    import tempfile, shutil
    tmp = tempfile.mkdtemp()
    binlog(spark, 5000, 100).write.parquet(f"{tmp}/log")
    stored = spark.read.parquet(f"{tmp}/log")
    batch = stored.filter((F.col("lsn") >= 1000) & (F.col("lsn") < 2000))
    p = plan_of(batch)
    sections.append(("LSN-chunked batch scan", p, [
        ("lsn range pushed to parquet", "GreaterThanOrEqual(lsn,1000)" in p and "LessThan(lsn,2000)" in p),
    ]))
    shutil.rmtree(tmp, ignore_errors=True)

    # 5. window top-k: single shuffle + rank-limit pushdown (Spark 3.5+).
    # Count exchange OPERATORS via their detail headers — a formatted plan
    # names each operator twice (tree + details), so a raw substring count
    # flagged the optimal plan as FAIL in round 1.
    p = plan_of(q["top_orders_per_cust"](spark, SF))
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", p))
    sections.append(("top_orders_per_cust (window rank)", p, [
        ("single exchange", n_exchanges == 1),
        ("rank-limit pushed below the shuffle (partial WindowGroupLimit)",
         len(re.findall(r"\(\d+\) WindowGroupLimit", p)) >= 1),
    ]))

    # 6. minhash LSH: slim band self-join (ids only), shingles joined back
    p = plan_of(q["minhash_pairs_docs"](spark, SF))
    sections.append(("minhash_pairs_docs (LSH bucket join)", p, [
        ("no cartesian product", "CartesianProduct" not in p),
        ("hash join on band buckets", "Join" in p),
    ]))

    # 7. the CDC merge heavy job (mirrors SnapshotTable.merge_events'
    # union → repartition(__bucket) → window-rank → extract → write shape,
    # lake/table.py): ONE exchange total, losers dropped during the sort
    # (WindowGroupLimit), extraction Arrow-vectorized.
    from hyped_spark.lake.table import bucket_expr
    from hyped_spark.functions.text import extract_text
    from pyspark.sql import Window
    ev = binlog(spark, 2000, 150).withColumn("__tomb", F.col("op") == "delete")
    cur = ev.limit(0)  # empty current side, same schema
    un = ev.unionByName(cur).withColumn("__bucket", bucket_expr("url", 16))
    w = Window.partitionBy("__bucket", F.xxhash64(F.col("url")), "url").orderBy(F.col("lsn").desc())
    surv = (un.repartition(16, F.col("__bucket"))
            .withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn("text", extract_text(F.when(F.col("op") == "update", F.col("html")))))
    p = plan_of(surv)
    sections.append(("CDC merge heavy job (union → bucket shuffle → window-rank LWW)", p, [
        ("exactly ONE exchange (payload shuffles once)",
         len(re.findall(r"\(\d+\) Exchange", p)) == 1),
        ("LWW losers dropped during the sort (WindowGroupLimit)",
         "WindowGroupLimit" in p),
        ("extraction is Arrow-vectorized", "ArrowEvalPython" in p),
    ]))

    # 8. banded embedding near-dup: ids-only band self-join (no cartesian),
    # vectors joined back ONCE per side after the distinct-pair dedup
    p = plan_of(q["embedding_neardup"](spark, SF))
    sections.append(("embedding_neardup (banded multi-table sign-LSH)", p, [
        ("no cartesian product", "CartesianProduct" not in p),
        ("candidate join is a hash join on (band, bucket)",
         "Join" in p and "CartesianProduct" not in p),
    ]))

    # 9. IVF ANN: bounded training (driver-side on a hash sample) + a cell
    # equi-join with the exploded query side broadcast
    p = plan_of(q["ann_topk_ivf"](spark, SF))
    sections.append(("ann_topk_ivf (cell equi-join, sampled training)", p, [
        ("no cartesian product", "CartesianProduct" not in p),
        ("query side broadcast", "BroadcastHashJoin" in p),
    ]))

    # 10. sequence packing: the prefix sum must be DISTRIBUTED — a naive
    # global window would collapse everything onto one partition
    p = plan_of(q["pack_sequences_docs"](spark, SF))
    sections.append(("pack_sequences_docs (distributed prefix sum)", p, [
        ("no single-partition exchange", "Exchange SinglePartition" not in p),
        ("window partitioned (per-partition cumsum)", "Window" in p),
    ]))

    # 11. IVF-SQ: cell pruning AND int8 codes through the candidate join
    p = plan_of(q["ann_topk_ivf_sq"](spark, SF))
    sections.append(("ann_topk_ivf_sq (cell equi-join over int8 codes)", p, [
        ("no cartesian product", "CartesianProduct" not in p),
        ("query side broadcast", "BroadcastHashJoin" in p),
        ("corpus flows as array<smallint> codes", "smallint" in p and "__cq" in p),
    ]))

    # 12. decontamination scale path: benchmark side broadcast both ways —
    # the corpus is never shuffled for the membership check or the join-back
    p = plan_of(q["decontaminate_docs_fast"](spark, SF))
    sections.append(("decontaminate_docs_fast (broadcast semi-join, xxhash64)", p, [
        ("no sort-merge join (corpus never shuffles for the check)",
         "SortMergeJoin" not in p),
        ("broadcast joins only", "BroadcastHashJoin" in p),
        ("no cartesian product", "CartesianProduct" not in p),
    ]))

    # 13. repetition scale path: map-only — the only exchange allowed is the
    # small-scan spread() repartition, and no join/aggregate anywhere
    p = plan_of(q["repetition_docs_fast"](spark, SF))
    sections.append(("repetition_docs_fast (map-only fold-hash grams)", p, [
        ("at most one exchange (the spread fan-out; none at scale)",
         len(re.findall(r"\(\d+\) Exchange", p)) <= 1),
        ("no join", "Join" not in p),
        ("native codegen (no Python eval)", "ArrowEvalPython" not in p
         and "BatchEvalPython" not in p),
    ]))

    # 14. duplicate-substring spans: candidate generation is a hash equi-join
    # on the 8-byte gram hash only (ids+positions, never text); the span
    # merge is a per-document window (bounded partitions)
    p = plan_of(q["dup_span_docs"](spark, SF))
    sections.append(("dup_span_docs (gram-hash equi-join + span-merge window)", p, [
        ("no cartesian product", "CartesianProduct" not in p),
        ("cross-doc test is a hash aggregate (min/max id, map-side combinable)",
         "HashAggregate" in p),
        ("native codegen (no Python eval)", "ArrowEvalPython" not in p
         and "BatchEvalPython" not in p),
    ]))

    # 15. PII scrub: map-only native regexp — no exchange beyond the spread
    # guard, no join, no Python
    p = plan_of(q["pii_scrub_docs"](spark, SF))
    sections.append(("pii_scrub_docs (map-only native regexp)", p, [
        ("no exchange at all (pure projection)",
         len(re.findall(r"\(\d+\) Exchange", p)) == 0),
        ("no join", "Join" not in p),
        ("native codegen (no Python eval)", "ArrowEvalPython" not in p
         and "BatchEvalPython" not in p),
    ]))

    # 16. stratified sample: a pure filter — predicate over md5(concat),
    # no exchange, no join
    p = plan_of(q["stratified_sample_docs"](spark, SF))
    sections.append(("stratified_sample_docs (hash-threshold filter)", p, [
        ("no exchange", len(re.findall(r"\(\d+\) Exchange", p)) == 0),
        ("no join", "Join" not in p),
    ]))

    # 17. sessionization: native session_window — ONE exchange on the key,
    # partial agg + MergingSessions; no self-join, no window-function pass
    p = plan_of(q["sessionize_events"](spark, SF))
    sections.append(("sessionize_events (native session_window agg)", p, [
        ("single exchange (hash on the session key)",
         len(re.findall(r"\(\d+\) Exchange", p)) == 1),
        ("session merge is the native aggregate (MergingSessions)",
         "MergingSessions" in p),
        ("no join", "Join" not in p),
    ]))

    # 18. C4 line cleaning: one higher-order filter — pure projection
    p = plan_of(q["c4_clean_docs"](spark, SF))
    sections.append(("c4_clean_docs (map-only HOF line gate)", p, [
        ("no exchange at all (pure projection)",
         len(re.findall(r"\(\d+\) Exchange", p)) == 0),
        ("native codegen (no Python eval)", "ArrowEvalPython" not in p
         and "BatchEvalPython" not in p),
    ]))

    # 19. BM25: no inverted-index shuffle — the only join is the broadcast
    # of the 1-row stats aggregate; top-k is TakeOrdered
    p = plan_of(q["bm25_search_docs"](spark, SF))
    sections.append(("bm25_search_docs (broadcast stats row + TakeOrdered)", p, [
        ("corpus never shuffle-joined", "SortMergeJoin" not in p
         and "ShuffledHashJoin" not in p),
        ("stats row broadcast (1-row nested loop)",
         "BroadcastNestedLoopJoin" in p),
        ("top-k is TakeOrdered (no global sort)",
         "TakeOrderedAndProject" in p),
        ("native codegen (no Python eval)", "ArrowEvalPython" not in p
         and "BatchEvalPython" not in p),
    ]))

    # 20. ROLLUP: grouping sets expand inside ONE partial+final aggregate —
    # a single exchange for all three grouping levels
    p = plan_of(q["rollup_revenue"](spark, SF))
    sections.append(("rollup_revenue (grouping-set Expand, one agg)", p, [
        ("single exchange for all grouping levels",
         len(re.findall(r"\(\d+\) Exchange", p)) == 1),
        ("grouping sets expanded map-side (Expand)", "Expand" in p),
        ("dims broadcast", "BroadcastHashJoin" in p),
    ]))

    # 21. LM perplexity scoring: the vocabulary joins BROADCAST against the
    # exploded corpus; the only shuffle carries (doc_id, partial sums)
    p = plan_of(q["lm_perplexity_docs"](spark, SF))
    sections.append(("lm_perplexity_docs (broadcast vocab + per-doc re-agg)", p, [
        ("vocab broadcast (corpus never shuffle-joined)",
         "BroadcastHashJoin" in p and "SortMergeJoin" not in p),
        ("per-doc agg is partial+final", p.count("HashAggregate") >= 2),
        ("native codegen (no Python eval)", "ArrowEvalPython" not in p
         and "BatchEvalPython" not in p),
    ]))

    # 22. as-of join, both directions: the union+window trick is ONE
    # exchange and never a join operator — direction only flips the sort
    for name in ("asof_join_events", "asof_forward_events"):
        p = plan_of(q[name](spark, SF))
        sections.append((f"{name} (union+window as-of, one exchange)", p, [
            ("single exchange", len(re.findall(r"\(\d+\) Exchange", p)) == 1),
            ("no join operator", "Join" not in p),
        ]))

    # 23. BM25 with the term-presence prefilter: the tf>0 predicate must
    # drop non-matching docs BELOW the broadcast-stats join (so a selective
    # query scores only its candidate set), without introducing a shuffle
    from hyped_spark.operators.search import bm25_topk

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    p = plan_of(bm25_topk(docs, "dup merge", k=10, prune=True))
    join_at = p.find("BroadcastNestedLoopJoin")
    filt_at = p.find("Filter")
    sections.append(("bm25_topk(prune=True) (term prefilter under the stats join)", p, [
        ("prefilter sits below the broadcast stats join (candidates drop "
         "before scoring)", 0 <= join_at < filt_at),
        ("corpus still never shuffle-joined", "SortMergeJoin" not in p
         and "ShuffledHashJoin" not in p),
        ("top-k still TakeOrdered", "TakeOrderedAndProject" in p),
    ]))

    # 24. span-algebra round-trip: three chained Arrow UDF stages over a
    # projection — map-only, zero exchange, no row-at-a-time Python
    p = plan_of(q["token_spans_docs"](spark, SF))
    sections.append(("token_spans_docs (chained Arrow span kernels, map-only)", p, [
        ("no exchange at all", len(re.findall(r"\(\d+\) Exchange", p)) == 0),
        ("span kernels are Arrow-vectorized", "ArrowEvalPython" in p),
        ("no row-at-a-time Python", "BatchEvalPython" not in p),
    ]))

    # 25. repair-json: exactly ONE Arrow UDF evaluation feeds both the
    # fixed string and the typed re-parse (no duplicated repair pass)
    p = plan_of(q["repair_json_docs"](spark, SF))
    sections.append(("repair_json_docs (single Arrow repair pass)", p, [
        ("no exchange (map-only)", len(re.findall(r"\(\d+\) Exchange", p)) == 0),
        ("exactly one Arrow eval stage",
         len(set(re.findall(r"\((\d+)\) ArrowEvalPython", p))) == 1),
    ]))

    # 26. template render: the plain template compiles to native
    # format_string; only the format-spec template pays an Arrow stage
    p = plan_of(q["render_template_docs"](spark, SF))
    sections.append(("render_template_docs (native fast path + one Arrow stage)", p, [
        ("no exchange (map-only)", len(re.findall(r"\(\d+\) Exchange", p)) == 0),
        ("plain template stays native (format_string in plan)",
         "format_string" in p),
        ("only the format-spec template uses Arrow",
         len(set(re.findall(r"\((\d+)\) ArrowEvalPython", p))) == 1),
    ]))

    # 27. real PNG decode: encode + decode are two map-only Arrow stages;
    # blobs never shuffle
    p = plan_of(q["image_decode_real_docs"](spark, SF))
    sections.append(("image_decode_real_docs (stdlib codec, map-only)", p, [
        ("no exchange — blobs never shuffle",
         len(re.findall(r"\(\d+\) Exchange", p)) == 0),
        ("Arrow-vectorized decode (mapInPandas)", "MapInPandas" in p
         or "ArrowEvalPython" in p),
    ]))

    # 27b. real AVI video frame extraction: container parse + frame sample
    # + per-frame PNG decode are all map-only Arrow stages; blobs never
    # shuffle
    p = plan_of(q["video_frames_docs"](spark, SF))
    sections.append(("video_frames_docs (stdlib AVI parse, map-only)", p, [
        ("no exchange — video blobs never shuffle",
         len(re.findall(r"\(\d+\) Exchange", p)) == 0),
        ("Arrow-vectorized container parse (mapInPandas)",
         "MapInPandas" in p or "ArrowEvalPython" in p),
        ("no row-at-a-time Python", "BatchEvalPython" not in p),
    ]))

    # 28. inverted-index BM25 search over a STORED postings table: the
    # query's term filter must push into the parquet scan (row-group
    # pruning = the inverted-index property), and search is one pivot
    # aggregate + TakeOrdered — no corpus scan, no corpus-shaped join
    from hyped_spark.operators.search import bm25_index_search, build_bm25_index

    postings, bmeta = build_bm25_index(docs)
    idxdir = tempfile.mkdtemp()
    postings.write.mode("overwrite").parquet(os.path.join(idxdir, "idx"))
    stored = spark.read.parquet(os.path.join(idxdir, "idx"))
    p = plan_of(bm25_index_search(stored, bmeta, "dup merge", k=10))
    sections.append(("bm25_index_search (stored inverted index)", p, [
        ("query terms pushed into the postings scan (In filter)",
         "PushedFilters" in p and "In(term" in p),
        ("no corpus-shaped join", "SortMergeJoin" not in p
         and "CartesianProduct" not in p),
        ("top-k is TakeOrdered", "TakeOrderedAndProject" in p),
    ]))
    shutil.rmtree(idxdir, ignore_errors=True)

    # 29. single-pass statistics report: N statistics, one scan, the only
    # movement is the 1-row global reduce — never a hash-partition shuffle
    p = plan_of(q["stats_report_lineitem"](spark, SF))
    sections.append(("stats_report_lineitem (N stats, one scan, no hash shuffle)", p, [
        ("no hashpartitioning exchange", "hashpartitioning" not in p),
        ("partial+final global agg", p.count("HashAggregate") >= 2),
        ("no Python in the agg path", "Python" not in p),
    ]))

    # 30. URL canonicalization: pure regexp chain — stays in codegen
    p = plan_of(q["canonical_url_orders"](spark, SF))
    sections.append(("canonical_url_orders (native regexp, map-only)", p, [
        ("no exchange", len(re.findall(r"\(\d+\) Exchange", p)) == 0),
        ("fully native (no Python eval)", "Python" not in p),
        ("whole-stage codegen", "codegen id" in p),
    ]))

    # 31. WAV decode: blobs never shuffle; decode is one Arrow stage
    p = plan_of(q["audio_features_docs"](spark, SF))
    sections.append(("audio_features_docs (stdlib WAV codec, map-only)", p, [
        ("no exchange — blobs never shuffle",
         len(re.findall(r"\(\d+\) Exchange", p)) == 0),
        ("Arrow-vectorized decode", "MapInPandas" in p or "ArrowEvalPython" in p),
    ]))

    # 32. z-order: key computation is native codegen; the clustering sort is
    # exactly ONE range exchange + in-partition sort (no global sort, no
    # second shuffle)
    from hyped_spark.lake.zorder import z_order_sort

    p = plan_of(q["zorder_key_lineitem"](spark, SF))
    sections.append(("zorder_key_lineitem (native Morton key)", p, [
        ("no Python eval", "Python" not in p),
        ("no exchange for key computation",
         len(re.findall(r"\(\d+\) Exchange", p)) == 0),
    ]))
    li_z = spark.read.parquet(f"{SF}/lineitem.parquet")
    p = plan_of(z_order_sort(li_z, ["l_quantity", "l_extendedprice"],
                             bounds=[(1.0, 50.0), (900.0, 105000.0)], bits=12))
    sections.append(("z_order_sort (one range exchange + local sort)", p, [
        ("exactly one exchange, range-partitioned",
         len(re.findall(r"\(\d+\) Exchange", p)) == 1
         and "rangepartitioning" in p),
        # formatted Sort detail prints "Arguments: [keys...], <global>, 0"
        ("sort is within partitions (no global sort)",
         ", false, 0" in p and ", true, 0" not in p),
    ]))

    # sketches: fixed-size mergeable state, pure native aggregates
    from hyped_spark.operators.dedup import line_dedup
    from hyped_spark.operators.sketches import (
        cms_estimate, cms_sketch, hll_count_distinct,
    )

    ev_sk = spark.read.parquet(f"{SF}/events.parquet")
    p = plan_of(hll_count_distinct(ev_sk, "user_id", p=12,
                                   group_cols=("event_type",)))
    sections.append(("hll_count_distinct (register agg + estimate)", p, [
        ("no Python eval", "Python" not in p),
        ("no join", "Join" not in p),
        # register agg + estimate agg; register shuffle carries <= 2^p
        # rows per group (map-side max-combine), estimate input is tiny
        ("two partial+final aggregates",
         len(re.findall(r"\(\d+\) Exchange", p)) == 2
         and p.count("HashAggregate") >= 4),
    ]))
    cms = cms_sketch(ev_sk, "event_type", width=1024, depth=4)
    p = plan_of(cms_estimate(cms, ev_sk.select("event_type").distinct(),
                             "event_type", 1024, 4))
    sections.append(("cms sketch + estimate (broadcast probe)", p, [
        ("sketch broadcast to probes", "BroadcastHashJoin" in p),
        ("no sort-merge join", "SortMergeJoin" not in p),
        ("no Python eval", "Python" not in p),
    ]))
    docs_ld = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.concat_ws("\n", F.lit("hdr"), "text").alias("text"))
    p = plan_of(line_dedup(docs_ld))
    ld_exch_args = re.findall(r"\(\d+\) Exchange\n(.*?)\n\n", p, re.S)
    sections.append(("line_dedup (payload crosses the wire <= once)", p, [
        ("no cartesian", "CartesianProduct" not in p),
        ("no Python eval", "Python" not in p),
        ("frequency count sees hashes only — text in <= 1 shuffle",
         sum("text" in a for a in ld_exch_args) <= 1),
    ]))

    # blocklist filter: list broadcasts, corpus payload never shuffles
    p = plan_of(q["blocklist_filter_docs"](spark, SF))
    sections.append(("blocklist_filter_docs (broadcast suffix semi-join)", p, [
        ("both joins broadcast-hash",
         len(re.findall(r"\(\d+\) BroadcastHashJoin", p)) >= 2),
        ("no sort-merge join", "SortMergeJoin" not in p),
        ("no cartesian", "CartesianProduct" not in p),
        # ("Python" alone false-positives on the literal blocklist's
        #  applySchemaToPythonRDD scan name)
        ("no Python eval", "EvalPython" not in p and "InPandas" not in p),
    ]))

    # per-domain quota: one domain exchange, over-quota dropped map-side
    p = plan_of(q["cap_domain_docs"](spark, SF))
    sections.append(("cap_domain_docs (windowed quota, map-side limit)", p, [
        ("single exchange", len(re.findall(r"\(\d+\) Exchange", p)) == 1),
        ("rank-limit pushed below the shuffle (partial WindowGroupLimit)",
         len(re.findall(r"\(\d+\) WindowGroupLimit", p)) >= 2),
        ("no Python eval", "Python" not in p),
    ]))

    # classifier inference: weights ride in ONE broadcast row; scoring is
    # a native fold — nothing shuffles, nothing crosses into Python
    p = plan_of(q["quality_classifier_docs"](spark, SF))
    sections.append(("quality_classifier_docs (map-only hashed-BoW inference)", p, [
        ("no hash-partition exchange", "Exchange hashpartitioning" not in p),
        ("weights broadcast once", "BroadcastExchange" in p),
        ("no Python eval", "EvalPython" not in p and "InPandas" not in p),
        ("no sort", not re.search(r"\(\d+\) Sort\b", p)),
    ]))

    # PQ ANN: corpus flows as int codes only; scoring is the broadcast-LUT
    # fold (one tiny broadcast side), ranking is the single window exchange
    p = plan_of(q["ann_topk_pq"](spark, SF))
    sections.append(("ann_topk_pq (byte codes + broadcast ADC LUT)", p, [
        ("full-precision vectors never re-joined",
         "__cv" not in p.split("BroadcastNestedLoopJoin")[-1][:2000]
         if "BroadcastNestedLoopJoin" in p else True),
        ("queries broadcast", "BroadcastExchange" in p),
        # of the two Exchanges, one is spread()'s deliberate round-robin
        # that parallelizes the encode UDF over the single-row-group scan;
        # the other is the rank window's hash partitioning
        ("single hash exchange (rank window)",
         len(re.findall(r"\(\d+\) Exchange\b", p)) == 2
         and "RoundRobinPartitioning" in p),
        ("rank-limit pushed (WindowGroupLimit)", "WindowGroupLimit" in p),
    ]))

    # IVF-PQ: candidate set pruned by the cell equi-join; codes-only flow
    p = plan_of(q["ann_topk_ivf_pq"](spark, SF))
    sections.append(("ann_topk_ivf_pq (cell equi-join over byte codes)", p, [
        ("cell equi-join is broadcast-hash", "BroadcastHashJoin" in p),
        ("no cartesian", "CartesianProduct" not in p
         and "BroadcastNestedLoopJoin" not in p),
        ("rank-limit pushed (WindowGroupLimit)", "WindowGroupLimit" in p),
    ]))

    # connected components: same per-round lineage-cut contract as pagerank
    p = plan_of(q["connected_components_docs"](spark, SF))
    sections.append(("connected_components_docs (iteration lineage cut)", p, [
        ("result reads the round checkpoint", "ExistingRDD" in p),
        ("post-loop plan is flat",
         len(re.findall(r"\(\d+\) Exchange", p)) == 0),
        ("plan size bounded", len(p) < 4000),
    ]))

    # pagerank: after N iterations the returned frame's lineage must be a
    # checkpoint scan, not N stacked join+agg rounds (loop-plan-explosion
    # discipline — an uncheckpointed loop doubles the plan per round)
    p = plan_of(q["pagerank_hosts"](spark, SF))
    sections.append(("pagerank_hosts (iteration lineage cut per round)", p, [
        ("result reads the round checkpoint", "ExistingRDD" in p),
        ("no stacked iteration plan (post-loop plan is flat)",
         len(re.findall(r"\(\d+\) Exchange", p)) == 0),
        ("plan size bounded", len(p) < 4000),
    ]))

    # robots verdicts: the rules join carries NO forced broadcast hint
    # (round-5 flag: crawl-scale rules span every host); at this SF the
    # cost model still picks broadcast from size estimates, and past the
    # threshold it degrades to a shuffle join on host —
    # test_robots.py::test_robots_filter_join_shapes proves both shapes.
    p = plan_of(q["robots_filter_docs"](spark, SF))
    sections.append(("robots_filter_docs (size-guarded rules join, window verdict)", p, [
        ("rules join on host (cost-chosen broadcast at this SF, shuffle "
         "above threshold — no forced hint)",
         "BroadcastHashJoin" in p or "SortMergeJoin" in p
         or "ShuffledHashJoin" in p),
        ("no cartesian", "CartesianProduct" not in p),
        ("longest-match rank limited (WindowGroupLimit)",
         "WindowGroupLimit" in p),
        ("no Python eval", "EvalPython" not in p and "InPandas" not in p),
    ]))

    # DSIR weigh+resample: the corpus-sized path must be map-only (λ rides
    # one broadcast row, per-doc weight is a native fold), selection is
    # TakeOrdered — the fits are separate bounded aggregates
    from hyped_spark.operators.dsir import dsir_resample

    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text")
    p = plan_of(dsir_resample(docs, [0.0] * 2048, k=40))
    sections.append(("dsir_resample (map-only weigh + Gumbel TakeOrdered)", p, [
        ("no hash-partition exchange", "hashpartitioning" not in p),
        ("λ rides one broadcast row", "BroadcastNestedLoopJoin" in p),
        ("top-k is TakeOrdered, no global sort",
         "TakeOrderedAndProject" in p),
        ("no Python eval", "EvalPython" not in p and "InPandas" not in p),
    ]))

    # BPE training round: pair extraction native, aggregate partial+final
    # over the vocab-sized frame, argmax is a 1-row TakeOrdered
    from hyped_spark.operators.bpe import (
        _adjacent_pairs, _initial_repr, _symbols, word_counts,
    )

    vocab = word_counts(docs).select(
        _initial_repr(F.col("word")).alias("repr"), "w")
    rnd = (
        vocab.select(
            F.explode(_adjacent_pairs(_symbols(F.col("repr")))).alias("p"),
            "w")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("w").alias("cnt"))
        .orderBy(F.desc("cnt"), "l", "r").limit(1)
    )
    p = plan_of(rnd)
    sections.append(("bpe_train round (vocab-sized argmax, no UDF)", p, [
        ("partial+final hash agg", p.count("HashAggregate") >= 2),
        ("argmax is a 1-row TakeOrdered", "TakeOrderedAndProject" in p),
        ("no Python eval", "EvalPython" not in p and "InPandas" not in p),
    ]))

    # TF-IDF: the IDF side must come back as a BROADCAST join (bounded by
    # buckets), the per-doc regroup is the only other exchange family
    from hyped_spark.operators.vectorize import tfidf_vectors

    p = plan_of(tfidf_vectors(docs, buckets=4096))
    sections.append(("tfidf_vectors (broadcast IDF, ids-only exchanges)", p, [
        ("IDF joined back broadcast", "BroadcastHashJoin" in p),
        ("no cartesian", "CartesianProduct" not in p),
        ("no Python eval", "EvalPython" not in p and "InPandas" not in p),
        ("partial+final tf agg", p.count("HashAggregate") >= 2),
    ]))

    # token entropy: two ids-only exchanges, both aggs partial+final
    from hyped_spark.operators.curation import token_entropy

    p = plan_of(token_entropy(docs))
    sections.append(("token_entropy (ids-only exchanges)", p, [
        ("no cartesian", "CartesianProduct" not in p),
        ("no Python eval", "EvalPython" not in p and "InPandas" not in p),
        ("map-side combined aggs", p.count("HashAggregate") >= 2),
        ("payload text never shuffles",
         not any("text" in a for a in
                 re.findall(r"\(\d+\) Exchange\n(.*?)\n\n", p, re.S))),
    ]))

    # frontier scheduling: per-host cap must survive as a map-side
    # WindowGroupLimit; exactly one hash exchange (host)
    p = plan_of(q["frontier_schedule_docs"](spark, SF))
    sections.append(("frontier_schedule_docs (map-side capped window)", p, [
        ("per-host cap is WindowGroupLimit", "WindowGroupLimit" in p),
        ("no Python eval", "EvalPython" not in p and "InPandas" not in p),
        ("no cartesian", "CartesianProduct" not in p),
    ]))

    # CCNet buckets: cutoffs ride ONE broadcast row; no corpus re-sort
    p = plan_of(q["ccnet_buckets_docs"](spark, SF))
    sections.append(("ccnet_buckets_docs (broadcast quantile cutoffs)", p, [
        ("cutoffs broadcast (nested-loop over 1 row)",
         "BroadcastNestedLoopJoin" in p),
        ("no cartesian", "CartesianProduct" not in p),
        ("labeling adds no extra global sort",
         p.count("(1) Sort") == 0),
    ]))

    # map-only webtext stages: no exchange, and for the native pair no
    # Python either (WARC's codec is the one legitimate Arrow UDF)
    for name, allow_python in [("extract_blocks_docs", False),
                               ("outlinks_docs", False),
                               ("warc_roundtrip_docs", True)]:
        p = plan_of(q[name](spark, SF))
        checks = [("no exchange", not re.search(r"\(\d+\) Exchange\b", p)),
                  ("no cartesian", "CartesianProduct" not in p)]
        if not allow_python:
            checks.append(("no Python eval",
                           "EvalPython" not in p and "InPandas" not in p))
        sections.append((f"{name} (map-only)", p, checks))

    out = ["# PLANS — physical-plan audit (generated by scripts/plan_audit.py)\n"]
    all_ok = True
    for title, plan, checks in sections:
        out.append(f"\n## {title}\n")
        for desc, ok in checks:
            all_ok &= ok
            out.append(f"- {'PASS' if ok else 'FAIL'}: {desc}")
        out.append("\n```\n" + plan.strip()[:4000] + "\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("ALL_CHECKS_PASS" if all_ok else "SOME_CHECKS_FAILED")


if __name__ == "__main__":
    main()
