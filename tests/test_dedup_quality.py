"""Dedup/similarity quality: the approximate paths vs their exact baselines."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
        "embedding", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )


def test_minhash_recall_vs_exact(spark):
    """MinHash-LSH must recover (almost) all exact-Jaccard pairs ≥ 0.5 and
    report the identical verified jaccard for every recovered pair."""
    from hyped_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(_docs(spark), min_jaccard=0.5).collect()
    }
    approx = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(_docs(spark), min_jaccard=0.5).collect()
    }
    assert exact, "fixture produced no exact pairs — test is vacuous"
    # verified jaccard identical for all recovered pairs
    for k, v in approx.items():
        assert k in exact and abs(exact[k] - v) < 1e-9
    recall = len(set(approx) & set(exact)) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall:.2f} < 0.9 ({len(approx)}/{len(exact)})"


def test_minhash_dedup_drops_neardups(spark):
    from hyped_spark.operators.dedup import minhash_dedup, minhash_lsh_pairs

    docs = _docs(spark)
    pairs = minhash_lsh_pairs(docs, min_jaccard=0.5)
    losers = {r.id_b for r in pairs.collect()}
    kept = {r.doc_id for r in minhash_dedup(docs, min_jaccard=0.5).select("doc_id").collect()}
    assert kept == {r.doc_id for r in docs.select("doc_id").collect()} - losers


def test_simhash_finds_exact_dups(spark):
    """Exact duplicate texts must collide at Hamming distance 0."""
    from hyped_spark.operators.dedup import simhash_pairs
    from hyped_spark.operators.dedup import exact_dedup

    docs = _docs(spark)
    n_total = docs.count()
    n_unique = exact_dedup(docs).count()
    if n_total == n_unique:
        # synthesize one dup to keep the test meaningful
        docs = docs.unionByName(
            docs.limit(1).withColumn("doc_id", F.col("doc_id") + 1_000_000)
        )
    zero = simhash_pairs(docs, max_hamming=0).collect()
    assert len(zero) > 0


def test_lsh_topk_recall_vs_brute_force(spark):
    """Bucketed ANN: every hit it returns must be a true cosine neighbor
    (subset of brute-force ranking), and top-1 self-match must survive."""
    from hyped_spark.operators.similarity import brute_force_topk, lsh_topk

    emb = _emb(spark)
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=50)
    approx = lsh_topk(emb, queries, dim=dim, k=10, n_bits=4)

    exact_map = {}
    for r in exact.collect():
        exact_map.setdefault(r.query_id, {})[r.vec_id] = r.cosine
    for r in approx.collect():
        # every approx hit's cosine must equal the exact cosine (same kernel)
        if r.vec_id in exact_map[r.query_id]:
            assert abs(exact_map[r.query_id][r.vec_id] - r.cosine) < 1e-9
    # self-match (cosine 1.0) shares every bucket bit with itself
    approx_top1 = {r.query_id: r.vec_id for r in approx.collect() if r.rank == 1}
    for q, v in approx_top1.items():
        assert q == v, f"query {q} should be its own nearest neighbor, got {v}"


def test_ivf_topk_quality(spark):
    """IVF ANN: deterministic across runs, self-match survives, and every
    returned cosine equals the exact kernel's value."""
    from hyped_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=2)
    rows = a.collect()
    assert rows
    # deterministic (seeded k-means + seeded assignment)
    again = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=2).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # self-match: the query's own cell is always its nearest -> rank 1 = self
    top1 = {r.query_id: r.vec_id for r in rows if r.rank == 1}
    assert all(q == v for q, v in top1.items())
    # cosine values must agree with the exact kernel for returned pairs
    exact = {(r.query_id, r.vec_id): r.cosine
             for r in brute_force_topk(emb, queries, k=50).collect()}
    for r in rows:
        if (r.query_id, r.vec_id) in exact:
            assert abs(exact[(r.query_id, r.vec_id)] - r.cosine) < 1e-9


def test_ivf_training_bounded(spark):
    """The k-means fit must depend ONLY on the train_cap hash-sampled rows:
    fitting the full corpus with cap=16 equals fitting just those 16 rows —
    i.e. no full-corpus training stage exists (the r2 scale defect)."""
    import numpy as np

    from hyped_spark.functions.hashing import h64_col
    from hyped_spark.operators.similarity import ivf_train_centroids

    emb = _emb(spark)
    assert emb.count() > 16
    capped = ivf_train_centroids(emb, n_lists=4, train_cap=16, n_iters=3)
    sample = (
        emb.withColumn("__h", h64_col(F.col("vec_id").cast("string"), "md5"))
        .orderBy("__h", "vec_id")
        .limit(16)
        .drop("__h")
    )
    explicit = ivf_train_centroids(sample, n_lists=4, train_cap=10**9, n_iters=3)
    assert capped.shape == explicit.shape == (4, len(emb.first().embedding))
    assert np.array_equal(capped, explicit)


def test_lsh_topk_multi_probe_recall(spark):
    """Multi-probe must dominate single-probe recall at the same n_bits
    (it probes a strict superset of buckets) while never inventing hits."""
    from hyped_spark.operators.similarity import brute_force_topk, lsh_topk

    emb = _emb(spark)
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    k = 5
    exact = {(r.query_id, r.vec_id)
             for r in brute_force_topk(emb, queries, k=k).collect()}
    single = {(r.query_id, r.vec_id)
              for r in lsh_topk(emb, queries, dim=dim, k=k, n_bits=8).collect()}
    multi = {(r.query_id, r.vec_id)
             for r in lsh_topk(emb, queries, dim=dim, k=k, n_bits=8,
                               multi_probe=True).collect()}
    rec_s = len(single & exact) / len(exact)
    rec_m = len(multi & exact) / len(exact)
    assert rec_m >= rec_s, (rec_m, rec_s)
    # duplicate-probe safety: at most one row per (query, corpus) pair
    rows = lsh_topk(emb, queries, dim=dim, k=50, n_bits=8,
                    multi_probe=True).collect()
    pairs = [(r.query_id, r.vec_id) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_embedding_neardup_banded_recall(spark):
    """Banded sign-LSH near-dup on NON-identical planted near-dups (seeded
    perturbations around cosine ≈ 0.95): recall vs the exact all-pairs
    ground truth must be high, and every returned pair must be a true pair
    with the exact cosine."""
    import numpy as np

    from hyped_spark.operators.similarity import embedding_neardup_pairs

    rows = _emb(spark).select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    dim = V.shape[1]
    rng = np.random.default_rng(7)
    base = V[:24]
    noise = rng.standard_normal(base.shape)
    noise *= (0.30 * np.linalg.norm(base, axis=1) /
              np.linalg.norm(noise, axis=1))[:, None]
    planted = base + noise  # cosine ≈ 1/sqrt(1+0.09) ≈ 0.958, some below .95
    all_ids = np.concatenate([ids, -np.arange(1, 25)])
    A = np.concatenate([V, planted])

    # exact ground truth in numpy
    N = A / np.linalg.norm(A, axis=1)[:, None]
    cos = N @ N.T
    iu = np.triu_indices(len(A), k=1)
    exact = {}
    for i, j, c in zip(iu[0], iu[1], cos[iu]):
        if c >= 0.95:
            a, b = sorted((int(all_ids[i]), int(all_ids[j])))
            exact[(a, b)] = round(float(c), 6)
    assert len(exact) >= 10, "fixture must plant enough true near-dup pairs"

    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(all_ids, A)],
        "vec_id long, embedding array<double>",
    )
    got = {(r.id_a, r.id_b): r.cosine
           for r in embedding_neardup_pairs(df, dim=dim, min_cosine=0.95,
                                            n_bands=8, band_bits=8).collect()}
    for pair, c in got.items():
        assert pair in exact, f"false positive {pair}"
        assert abs(exact[pair] - c) < 1e-5
    recall = len(set(got) & set(exact)) / len(exact)
    assert recall >= 0.8, f"banded recall {recall:.2f} ({len(got)}/{len(exact)})"


def test_asof_and_range_join_smoke(spark):
    """Spark-side smoke of the join operators (full oracle parity is in
    test_oracle_parity)."""
    from hyped_spark.operators.joins import asof_join, range_join

    left = spark.createDataFrame(
        [("a", 10, "L1"), ("a", 20, "L2"), ("b", 5, "L3")], "k string, ts long, lv string"
    )
    right = spark.createDataFrame(
        [("a", 9, "R1"), ("a", 15, "R2"), ("b", 6, "R3")], "k string, ts long, rv string"
    )
    got = {(r.k, r.ts): r.rv for r in asof_join(left, right, on="ts", by="k").collect()}
    assert got == {("a", 10): "R1", ("a", 20): "R2", ("b", 5): None}

    a = spark.createDataFrame([(1, 0, 10), (2, 20, 30)], "id_a long, b long, e long")
    b = spark.createDataFrame([(7, 5, 25), (8, 40, 50)], "id_b long, b2 long, e2 long")
    pairs = {(r.id_a, r.id_b) for r in
             range_join(a, b, ("b", "e"), ("b2", "e2"), width=8).collect()}
    assert pairs == {(1, 7), (2, 7)}


def test_span_udfs_smoke(spark):
    """Arrow plumbing of the span UDFs (kernels unit-tested in test_spans)."""
    from hyped_spark.operators.spans import (
        covered_idx_spans_udf,
        make_resolve_overlaps_udf,
        spans_from_word_ids_udf,
    )

    df = spark.createDataFrame(
        [([0, 3, 8], [5, 8, 10], [0, 0, 1, 1, 2])],
        "b array<int>, e array<int>, wids array<int>",
    )
    r = df.select(
        make_resolve_overlaps_udf("keep_largest")(F.col("b"), F.col("e")).alias("kept"),
        spans_from_word_ids_udf(F.col("wids")).alias("spans"),
        covered_idx_spans_udf(
            F.array(F.lit(3)), F.array(F.lit(9)), F.col("b"), F.col("e")
        ).alias("idx"),
    ).collect()[0]
    # reference iterative-removal semantics: size tie -> approx drop of the
    # most-overlapping span (idx 0), see test_spans.py parity fixtures
    assert r.kept == [1, 2]
    assert r.spans.begins == [0, 2, 4] and r.spans.ends == [2, 4, 5]
    # query [3,9) overlaps token spans [0,5), [3,8), [8,10) -> idx span [0,3)
    assert r.idx.begins == [0] and r.idx.ends == [3]


def test_connected_components_labels(spark):
    """Min-label propagation: star and chain components converge to the
    min id; disjoint components stay separate."""
    from hyped_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 3, 0.9), (2, 3, 0.9),          # star centered on 3
         (10, 11, 0.8), (11, 12, 0.8),      # chain
         (20, 21, 0.7)],
        "id_a long, id_b long, jaccard double",
    )
    comp = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_minhash_dedup_cc_vs_onepass(spark):
    """strategy='cc' keeps exactly the min id per connected component — a
    subset of the one-pass keep-set (the one-pass rule can keep several
    representatives of a star component)."""
    from hyped_spark.operators.dedup import (
        connected_components,
        minhash_dedup,
        minhash_lsh_pairs,
    )

    docs = _docs(spark)
    kept_cc = {r.doc_id for r in
               minhash_dedup(docs, strategy="cc", min_jaccard=0.5)
               .select("doc_id").collect()}
    kept_1p = {r.doc_id for r in
               minhash_dedup(docs, min_jaccard=0.5)
               .select("doc_id").collect()}
    assert kept_cc <= kept_1p

    comp_rows = connected_components(
        minhash_lsh_pairs(docs, min_jaccard=0.5)
    ).collect()
    comps: dict[int, list[int]] = {}
    for r in comp_rows:
        comps.setdefault(r.component, []).append(r.id)
    assert comps, "fixture has no near-dup pairs — test is vacuous"
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    in_graph = {i for ids in comps.values() for i in ids}
    expected = (all_ids - in_graph) | {min(ids) for ids in comps.values()}
    assert kept_cc == expected


def test_connected_components_matches_union_find(spark):
    """Seeded random graphs vs a driver-side union-find reference."""
    import random

    from hyped_spark.operators.dedup import connected_components

    rng = random.Random(7)
    for case in range(2):
        n = rng.randint(5, 40)
        edges = sorted({tuple(sorted(rng.sample(range(n), 2)))
                        for _ in range(rng.randint(1, 2 * n))})

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        expected = {}
        for v in {v for e in edges for v in e}:
            root = find(v)
            expected.setdefault(root, set()).add(v)
        want = {v: min(members) for members in expected.values()
                for v in members}

        pairs = spark.createDataFrame(
            [(a, b, 1.0) for a, b in edges],
            "id_a long, id_b long, jaccard double",
        )
        got = {r.id: r.component
               for r in connected_components(pairs).collect()}
        assert got == want, f"case {case}"


def test_decontaminate_drop_and_flag(spark):
    from hyped_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
               "lam mu nu extra tail words here")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(1, "intro words then alpha beta gamma delta epsilon zeta eta "
             "theta iota kappa lam mu nu and more"),   # shares a 13-gram
         (2, "completely unrelated content with no overlap whatsoever in "
             "any thirteen gram window of tokens at all today")],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in
            decontaminate(corpus, bench, shingle_n=13).collect()}
    assert kept == {2}
    flags = {r.doc_id: r.contaminated for r in
             decontaminate(corpus, bench, shingle_n=13, mode="flag").collect()}
    assert flags == {1: True, 2: False}


def test_repetition_metrics_crafted(spark):
    from pyspark.sql import functions as F

    from hyped_spark.functions.hashing import tokens_col
    from hyped_spark.functions.text import dup_line_frac_col, dup_ngram_frac_col

    df = spark.createDataFrame(
        [(1, "spam spam spam spam"),       # 3 bigrams, 1 distinct -> 2/3
         (2, "a b c d"),                   # all bigrams distinct -> 0
         (3, "x"),                         # shorter than n -> 0
         (4, "x\nx\ny")],                  # 3 lines, 2 distinct -> 1/3
        "doc_id long, text string",
    )
    toks = tokens_col(F.col("text"))
    got = {r.doc_id: (r.g2, r.lf) for r in df.select(
        "doc_id",
        dup_ngram_frac_col(toks, 2).alias("g2"),
        dup_line_frac_col(F.col("text")).alias("lf"),
    ).collect()}
    assert abs(got[1][0] - 2 / 3) < 1e-6
    assert got[2][0] == 0.0 and got[3][0] == 0.0
    assert abs(got[4][1] - 1 / 3) < 1e-6


def test_sq8_topk_recall_vs_exact(spark):
    """int8 scalar-quantized ANN: high top-k overlap with exact search and
    self-match at rank 1 (quantization error is bounded per dimension)."""
    from hyped_spark.operators.similarity import brute_force_topk, sq_topk

    emb = _emb(spark)
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    k = 10
    exact = {(r.query_id, r.vec_id)
             for r in brute_force_topk(emb, queries, k=k).collect()}
    sq = {(r.query_id, r.vec_id)
          for r in sq_topk(emb, queries, dim=dim, k=k).collect()}
    recall = len(sq & exact) / len(exact)
    assert recall >= 0.8, recall
    top1 = {r.query_id: r.vec_id
            for r in sq_topk(emb, queries, dim=dim, k=1).collect()}
    assert all(q == v for q, v in top1.items())


def test_cc_materializes_pair_pipeline_once(spark, tmp_path):
    """The edge frame is persisted before the label loop: the (expensive)
    upstream pair pipeline must execute exactly once no matter how many
    propagation rounds run (VERDICT r3 #1 — previously every round's
    convergence check re-ran the full MinHash pipeline).

    Counting uses an O_APPEND side-effect file (atomic in local mode), NOT
    a Python accumulator — accumulator delivery can deadlock against py4j
    on multi-job loops (observed on 4.1: driver blocked in send_command
    while the accumulator server polls)."""
    from pyspark.sql import types as T

    from hyped_spark.operators.dedup import connected_components

    marker = str(tmp_path / "evals")

    @F.pandas_udf(T.LongType())
    def counted(x: pd.Series) -> pd.Series:
        with open(marker, "a") as f:
            f.write("x\n" * len(x))
        return x

    # an 8-node chain needs several propagation rounds to converge
    chain = [(i, i + 1) for i in range(7)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long").select(
        counted(F.col("id_a")).alias("id_a"), "id_b"
    )
    lab = connected_components(pairs, max_iters=10)
    assert lab.count() == 8
    assert {r.component for r in lab.collect()} == {0}
    # edges = pairs ∪ swapped(pairs): the counted column evaluates once per
    # union branch during the single edge materialization — 2 × n_pairs.
    # Any recompute per round would multiply this.
    with open(marker) as f:
        evals = sum(1 for _ in f)
    assert evals == 2 * len(chain), evals


def test_cc_unpersists_and_warns_on_max_iters(spark):
    """ADVICE r3: O(1) cache residue after a call (the explicit edge cache
    is released; per-round checkpoint blocks are reclaimed by the
    ContextCleaner), and hitting max_iters with labels still moving raises
    a RuntimeWarning (partial propagation)."""
    import gc
    import time
    import warnings

    from hyped_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(12)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        lab = connected_components(pairs, max_iters=1)
        lab.count()
    assert any(issubclass(x.category, RuntimeWarning) for x in w), \
        "expected partial-propagation warning"
    # converged run: no warning, and only O(1) cached frames survive once
    # the driver drops its references (localCheckpoint blocks of frames
    # still in scope may linger; the per-round intermediates must not)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        lab = connected_components(pairs, max_iters=20)
        assert {r.component for r in lab.collect()} == {0}
    assert not any(issubclass(x.category, RuntimeWarning) for x in w)
    del lab

    def settled_count() -> int:
        # other tests' frames may still be pending ContextCleaner pickup —
        # force GC until the count stops shrinking
        last = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(1)
            n = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
            if n >= last:
                return n
            last = n
        return last

    baseline = settled_count()
    lab2 = connected_components(pairs, max_iters=20)
    lab2.count()
    del lab2
    after = settled_count()
    # O(1) residue per call (the returned labels frame), never O(rounds)
    assert after - baseline <= 1, (baseline, after)


def test_incremental_minhash_dedup_matches_batch(spark):
    """Incremental (index-based) dedup keeps exactly the docs the batch
    onepass keeps when duplicate groups contain their representative —
    the CDC-composable recipe (VERDICT r3 #8)."""
    from hyped_spark.operators.dedup import (
        build_minhash_index,
        incremental_minhash_dedup,
        minhash_dedup,
    )

    docs = _docs(spark).select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 200)
    # increment: fresh docs + near-copies of existing docs (appended token)
    fresh = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 260))
    copies = base.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    new = fresh.unionByName(copies)

    idx = build_minhash_index(base)
    kept, updated = incremental_minhash_dedup(new, idx, min_jaccard=0.5)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    # every planted near-copy is killed by its existing representative
    assert not any(i >= 100_000 for i in kept_ids)
    # batch equivalence on the full corpus (groups contain their rep)
    full = minhash_dedup(base.unionByName(new), strategy="onepass",
                         min_jaccard=0.5)
    full_ids = {r.doc_id for r in full.select("doc_id").collect()}
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}
    surviving_base = full_ids & base_ids
    # incremental never drops existing docs; compare the new-side decision
    assert kept_ids == full_ids - surviving_base
    # the updated index carries base + survivors (ready for the next delta)
    assert updated.count() == base.count() + len(kept_ids)


def test_ivf_sq_topk_recall_and_pruning(spark):
    """IVF-SQ composition: candidates pruned by the coarse quantizer AND
    scored over int8 codes — high agreement with plain IVF and exact
    self-match at rank 1."""
    from hyped_spark.operators.similarity import ivf_sq_topk, ivf_topk

    emb = _emb(spark)
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ivf = {(r.query_id, r.vec_id)
           for r in ivf_topk(emb, queries, k=10, n_lists=8, n_probe=2).collect()}
    ivfsq = {(r.query_id, r.vec_id)
             for r in ivf_sq_topk(emb, queries, dim=dim, k=10, n_lists=8,
                                  n_probe=2).collect()}
    overlap = len(ivf & ivfsq) / len(ivf)
    assert overlap >= 0.8, overlap
    top1 = {r.query_id: r.vec_id
            for r in ivf_sq_topk(emb, queries, dim=dim, k=1, n_lists=8,
                                 n_probe=2).collect()}
    assert all(q == v for q, v in top1.items())


def test_incremental_dedup_composes_with_cdc_table(spark, tmp_path):
    """The CDC-composability recipe end-to-end: replay a binlog into the
    lake table, build the dedup index from the TABLE state (url as the id),
    then dedup an increment of fresh change rows against it — near-copies
    of already-ingested pages are dropped without re-sketching the table."""
    from hyped_spark.operators.dedup import (
        build_minhash_index,
        incremental_minhash_dedup,
    )
    from hyped_spark.plans.replay import ReplayConfig, ReplayEngine
    from hyped_spark.sources.synthetic import binlog

    eng = ReplayEngine(spark, ReplayConfig(
        table_path=str(tmp_path / "t"), metrics_path=str(tmp_path / "m"),
        batch_lsns=500, n_buckets=4))
    eng.replay(binlog(spark, 1_000, 80))
    state = eng.table.read().select("url", "text").filter(F.col("text").isNotNull())
    assert state.count() > 0

    # the persisted index artifact (in production: written as a lake table)
    idx = build_minhash_index(state, text_col="text", id_col="url")

    # increment: fresh pages + near-copies of ingested pages under new urls
    fresh = state.limit(0).unionByName(spark.createDataFrame(
        [(f"https://new{i}.example.com/", f"completely fresh page body {i} "
          f"with its own unrelated words number {i}") for i in range(5)],
        "url string, text string"))
    copies = state.limit(10).select(
        F.concat(F.lit("https://mirror.example.com/"), F.col("url")).alias("url"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    new = fresh.unionByName(copies)

    kept, updated = incremental_minhash_dedup(
        new, idx, text_col="text", id_col="url", min_jaccard=0.5)
    kept_urls = {r.url for r in kept.select("url").collect()}
    # every mirror of an ingested page dies against the existing index
    assert not any(u.startswith("https://mirror.") for u in kept_urls)
    # fresh pages survive and join the index for the next increment
    assert sum(u.startswith("https://new") for u in kept_urls) == 5
    assert updated.count() == idx.count() + len(kept_urls)


def test_fold_hash_gram_kernels_match_string_mode(spark):
    """The zip_with fold-hash kernels must reproduce string-gram semantics
    exactly on duplicate-heavy input: dup_ngram_frac hashed==string for
    n∈{2,3}, and shingles_col xxhash64-mode set SIZES equal md5-mode's
    (small vocab forces heavy gram collisions-in-the-string-sense, the
    regime where a fold bug would change distinct counts)."""
    import random

    from hyped_spark.functions.hashing import shingles_col, tokens_col
    from hyped_spark.functions.text import dup_ngram_frac_col

    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))
        for _ in range(300)
    ] + ["", "aa", "aa bb", "aa aa aa aa", "zz " * 50]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    toks = tokens_col(F.col("text"))
    bad = df.select(
        (dup_ngram_frac_col(toks, 2) != dup_ngram_frac_col(toks, 2, hashed=True)).alias("b2"),
        (dup_ngram_frac_col(toks, 3) != dup_ngram_frac_col(toks, 3, hashed=True)).alias("b3"),
        (F.size(shingles_col(toks, 3, "xxhash64"))
         != F.size(shingles_col(toks, 3, "md5"))).alias("bs"),
    ).filter("b2 or b3 or bs").count()
    assert bad == 0


def test_ivf_sq_index_roundtrip_search(spark, tmp_path):
    """Build-once / search-many: the IVF-SQ index written to parquet (+
    JSON meta) and read back must return exactly what the one-shot
    ivf_sq_topk composition returns — no training or corpus pass at
    search time."""
    import json

    from hyped_spark.operators.similarity import (
        build_ivf_sq_index,
        ivf_sq_search,
        ivf_sq_topk,
    )

    emb = _emb(spark)
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    index, meta = build_ivf_sq_index(emb, dim=dim, n_lists=8)
    # the stored artifact: codes-only parquet + JSON sidecar
    index.write.mode("overwrite").parquet(str(tmp_path / "ivfsq"))
    (tmp_path / "meta.json").write_text(json.dumps(meta))
    stored = spark.read.parquet(str(tmp_path / "ivfsq"))
    meta2 = json.loads((tmp_path / "meta.json").read_text())

    got = sorted(map(tuple, ivf_sq_search(
        stored, meta2, queries, k=10, n_probe=2).collect()))
    want = sorted(map(tuple, ivf_sq_topk(
        emb, queries, dim=dim, k=10, n_lists=8, n_probe=2).collect()))
    assert got == want
    # the artifact is codes-only: no full-precision embedding column
    assert set(stored.columns) == {"vec_id", "__cell", "__cq", "__cn"}
    assert dict(stored.dtypes)["__cq"] == "array<smallint>"


def test_ngram_jaccard_refuses_large_corpus(spark):
    """The exact O(n²) all-pairs baseline must refuse real-corpus row counts
    (naming the LSH scale path), with an explicit override for oracle use."""
    import pytest

    from hyped_spark.operators.dedup import ngram_jaccard_pairs

    d = _docs(spark)
    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        ngram_jaccard_pairs(d, max_rows=100)
    # override for small-data oracle verification still works
    assert ngram_jaccard_pairs(d.limit(150), max_rows=0).columns == [
        "id_a", "id_b", "jaccard"
    ]


def test_pq_topk_quality(spark):
    """PQ ANN: deterministic, self-match is rank 1 (its own codes give the
    minimal ADC distance), codebook shape honest, bad m raises."""
    import numpy as np
    import pytest as _pt

    from hyped_spark.operators.similarity import pq_topk, pq_train_codebooks

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = pq_topk(emb, queries, k=5, m=4, ks=8, n_iters=3)
    rows = a.collect()
    assert rows and len(rows) == 25
    again = pq_topk(emb, queries, k=5, m=4, ks=8, n_iters=3).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # self-match: identical vector -> identical codes -> ADC is the minimum
    # possible for that query -> rank 1 (vec_id tiebreak favors the query
    # itself only if nothing scores strictly higher; codes quantize, so
    # assert self is IN the top-k rather than exactly rank 1)
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, set()).add(r.vec_id)
    assert all(q in vs for q, vs in by_q.items())
    # compression is honest: m codebooks of ks centroids of dim/m floats
    B = pq_train_codebooks(emb, m=4, ks=8, n_iters=3)
    dim = len(emb.select("embedding").first()[0])
    assert B.shape == (4, 8, dim // 4)
    assert np.isfinite(B).all()
    with _pt.raises(ValueError, match="divisible"):
        pq_train_codebooks(emb, m=7, ks=8)


def test_ivf_pq_topk_quality(spark):
    """IVF-PQ composition: deterministic, self-in-top-k (its own cell is
    its nearest and its own codes minimize ADC), candidate set ⊆ probed
    cells (matches plain PQ scores on shared pairs)."""
    from hyped_spark.operators.similarity import ivf_pq_topk, pq_topk

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = ivf_pq_topk(emb, queries, k=5, n_lists=8, n_probe=2, m=4, ks=8,
                    n_iters=3)
    rows = a.collect()
    assert rows
    again = ivf_pq_topk(emb, queries, k=5, n_lists=8, n_probe=2, m=4,
                        ks=8, n_iters=3).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, set()).add(r.vec_id)
    assert all(q in vs for q, vs in by_q.items())
    # scores agree with plain PQ (same codebooks) wherever pairs overlap
    full = {(r.query_id, r.vec_id): r.approx_cosine
            for r in pq_topk(emb, queries, k=50, m=4, ks=8,
                             n_iters=3).collect()}
    for r in rows:
        if (r.query_id, r.vec_id) in full:
            assert full[(r.query_id, r.vec_id)] == r.approx_cosine


def test_kmeans_cluster_standalone(spark):
    """kmeans_cluster: deterministic, one cluster id per vector within
    range, agrees with ivf's own cell assignment semantics, and the
    summary is one row per non-empty cluster."""
    from hyped_spark.operators.similarity import kmeans_cluster, kmeans_summary

    emb = _emb(spark)
    a = kmeans_cluster(emb, n_clusters=8)
    rows = a.select("vec_id", "cluster").collect()
    assert len(rows) == emb.count()
    assert all(0 <= r["cluster"] < 8 for r in rows)
    again = kmeans_cluster(emb, n_clusters=8).select("vec_id", "cluster")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))
    s = kmeans_summary(a).collect()
    assert sum(r["n"] for r in s) == len(rows)
    assert len(s) == len({r["cluster"] for r in rows})
    assert all(r["mean_norm"] > 0 for r in s)
