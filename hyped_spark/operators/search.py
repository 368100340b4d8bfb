"""Full-text keyword search (Okapi BM25) over a document corpus.

The reference engine exposes text processing but no ranked retrieval; this
is a training-data-pipeline extension (corpus inspection: "show me the docs
that best match this query" — quality audits, contamination spot-checks,
eval-set curation).

Scale shape: the query is a small literal term list, so there is NO
inverted-index shuffle at all. Per-document term frequencies are native
higher-order-function expressions over the token array (map-only), the
corpus-level statistics (N, avgdl, per-term document frequencies) are ONE
map-side-combinable aggregate producing a single row that is broadcast back
(1-row cross join), and the final top-k is a TakeOrdered — the corpus is
scanned twice and never shuffled. At 100 TB both passes are embarrassingly
parallel; the only data movement is the 1-row stats collect.

All arithmetic (integer tf/df/dl, exact integer sums inside avg) is
deterministic and engine-portable, so the DuckDB oracle replays the exact
score — see ``bm25_oracle_sql``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

_TOKEN_PAT = "[a-z0-9]+"


def _tokens(text_col: str) -> Column:
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_TOKEN_PAT), 0)


def tokenize_query(query: str) -> list[str]:
    """Lowercased alphanumeric terms, deduplicated, order-preserving."""
    seen: dict[str, None] = {}
    for t in re.findall(_TOKEN_PAT, query.lower()):
        seen.setdefault(t, None)
    return list(seen)


def bm25_topk(
    df: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    prune: bool = False,
) -> DataFrame:
    """Top-``k`` documents for ``query`` under Okapi BM25 (Lucene idf:
    ``ln((N - df + 0.5) / (df + 0.5) + 1)``; ties broken by ascending id).

    Output: ``(id_col, score)`` with score rounded to 6 dp.

    ``prune=True`` adds a term-presence prefilter on the scoring pass:
    documents containing none of the query terms are dropped BEFORE the
    broadcast-stats join and score projection (Catalyst pushes the
    predicate below both), so a selective query scores only its candidate
    set instead of the whole corpus. Corpus statistics (N, avgdl, df) are
    still computed over the FULL corpus, so surviving documents score
    identically to ``prune=False``; the only difference is that zero-score
    documents can no longer pad the tail when fewer than ``k`` match.
    """
    terms = tokenize_query(query)
    if not terms:
        raise ValueError("query has no indexable terms")

    def _tf(arr: Column, term: str) -> Column:
        # NB: a default-arg lambda breaks PySpark's HOF arity inspection —
        # bind the term via this closure instead
        return F.size(F.filter(arr, lambda x: x == F.lit(term)))

    toks = _tokens(text_col)
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("__dl"),
        *[_tf(toks, t).alias(f"__tf{i}") for i, t in enumerate(terms)],
    )

    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )

    if prune:
        hit = F.col("__tf0") > 0
        for i in range(1, len(terms)):
            hit = hit | (F.col(f"__tf{i}") > 0)
        base = base.filter(hit)

    scored = base.crossJoin(F.broadcast(stats))
    n, avgdl = F.col("__n"), F.col("__avgdl")
    parts = []
    for i in range(len(terms)):
        tf, dfc = F.col(f"__tf{i}"), F.col(f"__df{i}")
        idf = F.log((n - dfc + F.lit(0.5)) / (dfc + F.lit(0.5)) + F.lit(1.0))
        norm = tf + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("__dl") / avgdl)
        parts.append(idf * tf * F.lit(k1 + 1) / norm)
    score = parts[0]
    for p in parts[1:]:
        score = score + p

    return (
        scored.select(id_col, score.alias("__s"))
        .orderBy(F.col("__s").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("__s", 6).alias("score"))
    )


def build_bm25_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, dict]:
    """Build the persistable inverted index for repeated BM25 queries:
    ``(postings_df, meta)``.

    ``postings_df`` is the artifact a 100 TB pipeline WRITES ONCE and
    queries many times: one row per (term, doc) pair — ``(term, doc, dl,
    tf)`` with the doc length denormalized in, so search never joins a
    doc-lengths table. It comes back range-partitioned and sorted by
    ``term``: stored as parquet, every row group's min/max stats cover a
    narrow term range, so a query's ``term IN (...)`` filter prunes the
    scan to the matching row groups — the inverted-index property, without
    a custom file format. ``meta`` is two integers (doc count, total token
    count), the only driver-side state.

    One shuffle builds it (explode → per-(term,doc) count; the range
    partitioning reuses nothing but is a one-time cost). Search over the
    stored index costs no corpus pass at all — see :func:`bm25_index_search`;
    the ad-hoc :func:`bm25_topk` stays the right tool for one-off queries
    and full-corpus scoring.
    """
    toks = _tokens(text_col)
    # materialized once: the meta aggregate and the postings explode are
    # two consumers of the same tokenized projection — without the cut
    # each ran its own full tokenize pass over the corpus (the shared-
    # subtree duplication pattern; see minhash_lsh_pairs)
    base = df.select(F.col(id_col).alias("doc"), toks.alias("__t")) \
        .localCheckpoint(eager=True)
    lens = base.select("doc", F.size("__t").alias("dl"))
    meta_row = lens.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total_dl")
    ).first()
    postings = (
        base.select("doc", F.size("__t").alias("dl"),
                    F.explode("__t").alias("term"))
        .groupBy("term", "doc", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .repartitionByRange(F.col("term"))
        .sortWithinPartitions("term", "doc")
    )
    # total_dl is an exact integer sum, so avgdl reconstructed at search
    # time (total_dl / n) is bit-identical to bm25_topk's avg aggregate
    return postings, {"n_docs": int(meta_row["n"]),
                      "total_dl": int(meta_row["total_dl"] or 0)}


def bm25_index_search(
    postings: DataFrame,
    meta: dict,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` BM25 over a stored inverted index (from
    :func:`build_bm25_index`, possibly round-tripped through parquet).

    Scores are IDENTICAL to ``bm25_topk(..., prune=True)`` on the source
    corpus — not merely close: the pruned postings pivot back to one tf
    column per query term (explicit pivot values, no distinct job) and the
    score is the same fixed-order expression ``bm25_topk`` builds, so
    float addition happens in the same sequence. Document frequencies are
    exact global counts read off the pruned postings themselves (a term's
    posting count IS its df), collected as per-term driver metadata.

    Plan shape: term-pruned parquet scan → one tiny df-per-term aggregate
    (query-terms-sized collect) → pivot aggregate on doc → TakeOrdered.
    The corpus is never scanned.
    """
    terms = tokenize_query(query)
    if not terms:
        raise ValueError("query has no indexable terms")
    n = meta["n_docs"]
    avgdl = meta["total_dl"] / n if n else 0.0

    pruned = postings.filter(F.col("term").isin(terms))
    dfs = {r["term"]: r["c"] for r in
           pruned.groupBy("term").agg(F.count(F.lit(1)).alias("c")).collect()}

    # dunder group-col names cannot collide with pivot columns (terms are
    # [a-z0-9]+ — a query term 'doc' or 'dl' is legal)
    wide = (
        pruned.groupBy(F.col("doc").alias("__doc"), F.col("dl").alias("__dl"))
        .pivot("term", terms).agg(F.first("tf"))
    )
    parts = []
    for t in terms:
        tf = F.coalesce(F.col(t), F.lit(0))
        dfc = F.lit(dfs.get(t, 0))
        idf = F.log((F.lit(n) - dfc + F.lit(0.5)) / (dfc + F.lit(0.5)) + F.lit(1.0))
        norm = tf + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("__dl") / F.lit(avgdl))
        parts.append(idf * tf * F.lit(k1 + 1) / norm)
    score = parts[0]
    for p in parts[1:]:
        score = score + p

    return (
        wide.select(F.col("__doc").alias(id_col), score.alias("__s"))
        .orderBy(F.col("__s").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("__s", 6).alias("score"))
    )


def bm25_oracle_sql(
    query: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    prune: bool = False,
) -> str:
    """DuckDB twin of :func:`bm25_topk` — same tokenizer, same arithmetic
    expression shape (integer tf/df/dl → bit-identical doubles).
    ``prune=True`` mirrors the pruned/indexed paths: documents containing
    no query term are excluded (zero-score docs never pad the tail)."""
    terms = tokenize_query(query)
    tf_cols = ", ".join(
        f"len(list_filter(t, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    score = " + ".join(
        f"(ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1.0)"
        f" * tf{i} * {k1 + 1!r} / (tf{i} + {k1!r} * ({1 - b!r} + {b!r} * dl / avgdl)))"
        for i in range(len(terms))
    )
    where = (
        "WHERE " + " OR ".join(f"tf{i} > 0" for i in range(len(terms)))
        if prune else ""
    )
    return f"""
        WITH base AS (
            SELECT {id_col}, len(t) AS dl, {tf_cols}
            FROM (SELECT {id_col},
                         regexp_extract_all(lower({text_col}), '{_TOKEN_PAT}') AS t
                  FROM {table})
        ), stats AS (
            SELECT count(*) AS n, avg(dl) AS avgdl, {df_cols} FROM base
        )
        SELECT {id_col}, round(s, 6) AS score
        FROM (SELECT {id_col}, {score} AS s FROM base, stats
              {where}
              ORDER BY s DESC, {id_col} LIMIT {k})
    """
