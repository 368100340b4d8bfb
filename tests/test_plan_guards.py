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
                 "embedding_neardup", "ann_topk_lsh", "ann_topk_ivf"]:
        assert "CartesianProduct" not in _plan(q[name](spark, SF_DIR)), name


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
