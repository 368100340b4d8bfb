"""Okapi BM25 ranked retrieval."""

from __future__ import annotations

import math


DOCS = [
    (1, "fast table scan over the fast table"),
    (2, "slow merge of the big table"),
    (3, "fast fast fast row group"),
    (4, "window sort batch stream"),
]


def _expected(query_terms, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for i, tk in toks.items():
        s = 0.0
        for q in query_terms:
            tf = tk.count(q)
            dfq = sum(1 for v in toks.values() if q in v)
            idf = math.log((n - dfq + 0.5) / (dfq + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        scores[i] = s
    return scores


def test_bm25_matches_hand_computation(spark):
    from hyped_spark.operators.search import bm25_topk

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = bm25_topk(df, "fast table", k=4).collect()
    exp = _expected(["fast", "table"])
    got = {r.doc_id: r.score for r in out}
    assert set(got) == {1, 2, 3, 4}
    for i, s in exp.items():
        assert abs(got[i] - round(s, 6)) < 1e-6, (i, got[i], s)
    # doc 1 has both terms (one twice each) -> best match
    ranked = [r.doc_id for r in out]
    assert ranked[0] == 1


def test_bm25_tie_break_and_k(spark):
    from hyped_spark.operators.search import bm25_topk

    df = spark.createDataFrame(
        [(10, "alpha beta"), (11, "alpha beta"), (12, "gamma delta")],
        "doc_id long, text string",
    )
    out = bm25_topk(df, "alpha", k=2).collect()
    # identical docs tie on score; ascending-id tie-break
    assert [r.doc_id for r in out] == [10, 11]


def test_bm25_plan_has_no_shuffle_join(spark):
    from hyped_spark.operators.search import bm25_topk

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        bm25_topk(df, "fast table", k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_bm25_rejects_empty_query(spark):
    import pytest

    from hyped_spark.operators.search import bm25_topk

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, "!!! ???")


def test_bm25_randomized_vs_reference(spark):
    """Random corpora from a small vocabulary vs the pure-Python scorer —
    one Spark job per query, full ranking compared."""
    import random

    from hyped_spark.operators.search import bm25_topk

    rng = random.Random(7)
    vocab = ["fast", "table", "scan", "merge", "slow", "row", "group",
             "the", "a", "sort"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for i in range(120)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    for query in ("fast table", "merge", "slow sort scan"):
        got = [(r.doc_id, r.score)
               for r in bm25_topk(df, query, k=120).collect()]
        exp_scores = _expected_for(docs, query.split())
        exp = sorted(exp_scores.items(), key=lambda kv: (-kv[1], kv[0]))
        assert [i for i, _ in got] == [i for i, _ in exp], query
        for (gi, gs), (ei, es) in zip(got, exp):
            assert abs(gs - round(es, 6)) < 1e-6, (query, gi)


def _expected_for(docs, query_terms, k1=1.2, b=0.75):
    import math

    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for q in query_terms:
            tf = tk.count(q)
            dfq = sum(1 for v in toks.values() if q in v)
            idf = math.log((n - dfq + 0.5) / (dfq + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        out[i] = s
    return out


def test_bm25_prune_identical_topk_and_plan(spark):
    """prune=True: identical ranking and scores for every surviving doc,
    and the term-presence filter sits BELOW the broadcast stats join in
    the physical plan (candidate rows are dropped before scoring)."""
    import random

    from hyped_spark.operators.search import bm25_topk

    rng = random.Random(11)
    vocab = ["fast", "table", "scan", "merge", "slow", "row", "group",
             "the", "a", "sort"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for i in range(200)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    for query in ("merge sort", "slow", "fast table scan"):
        full = [(r.doc_id, r.score)
                for r in bm25_topk(df, query, k=15).collect()]
        pruned = [(r.doc_id, r.score)
                  for r in bm25_topk(df, query, k=15, prune=True).collect()]
        assert pruned == full, query

    q = bm25_topk(df, "merge sort", k=15, prune=True)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # filter on the tf columns must appear below the BroadcastNestedLoopJoin
    join_at = plan.index("BroadcastNestedLoopJoin")
    filt_at = plan.index("Filter")
    assert filt_at > join_at, "prefilter not below the stats join"
    assert "__tf0" in plan[filt_at:], "prefilter lost the term predicate"


def test_bm25_prune_drops_only_zero_score_tail(spark):
    from hyped_spark.operators.search import bm25_topk

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    # only doc 2 contains 'merge'; unpruned pads with zero-score docs
    full = bm25_topk(df, "merge", k=4).collect()
    pruned = bm25_topk(df, "merge", k=4, prune=True).collect()
    assert [r.doc_id for r in pruned] == [2]
    assert full[0].doc_id == 2 and full[0].score == pruned[0].score
    assert all(r.score == 0.0 for r in full[1:])


def test_bm25_index_build_search_roundtrip(spark, tmp_path):
    """Inverted-index path: build once, round-trip through parquet, search
    many — every query's top-k must EQUAL bm25_topk(prune=True) on the
    source corpus, score-for-score."""
    import json
    import random

    from hyped_spark.operators.search import (
        bm25_index_search, bm25_topk, build_bm25_index,
    )

    rng = random.Random(3)
    vocab = ["fast", "table", "scan", "merge", "slow", "row", "group",
             "the", "doc", "dl", "sort"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for i in range(150)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    postings, meta = build_bm25_index(df)
    idx_path = str(tmp_path / "bm25_idx")
    postings.write.parquet(idx_path)
    (tmp_path / "meta.json").write_text(json.dumps(meta))
    stored = spark.read.parquet(idx_path)
    meta2 = json.loads((tmp_path / "meta.json").read_text())

    # 'doc' and 'dl' as query terms exercise the name-collision guard
    for query in ("fast table", "merge sort slow", "doc dl", "zzz fast"):
        via_index = [(r.doc_id, r.score) for r in
                     bm25_index_search(stored, meta2, query, k=12).collect()]
        direct = [(r.doc_id, r.score) for r in
                  bm25_topk(df, query, k=12, prune=True).collect()]
        assert via_index == direct, query


def test_bm25_index_scan_prunes_terms(spark, tmp_path):
    """The stored postings scan must push the query's term filter into
    parquet (the inverted-index property: row-group pruning on term)."""
    from hyped_spark.operators.search import bm25_index_search, build_bm25_index

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, meta = build_bm25_index(df)
    idx_path = str(tmp_path / "idx")
    postings.write.parquet(idx_path)
    stored = spark.read.parquet(idx_path)

    q = bm25_index_search(stored, meta, "fast merge", k=3)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(term" in plan, plan[:800]
    # no corpus-shaped join anywhere — one pivot agg + TakeOrdered
    assert "SortMergeJoin" not in plan and "TakeOrderedAndProject" in plan
