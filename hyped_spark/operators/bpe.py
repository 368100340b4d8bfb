"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909) — learn byte-pair-encoding merges over a corpus with
Spark doing the only corpus-sized pass once.

The classic BPE trainer is a single-machine loop over a word-frequency
dict. The distributed shape here:

1. **Word counts** — ONE corpus-sized shuffle (`explode(tokens)` →
   `groupBy(word)`), producing the weighted vocabulary. Everything after
   runs on that vocab frame (≤ tens of millions of rows for web text —
   thousands of times smaller than a 100 TB corpus).
2. **Merge rounds** — per round: adjacent symbol pairs (native zip_with,
   weights carried), one vocab-sized aggregate (map-side combined), a
   1-row argmax collect (metadata-sized), then the merge applied with a
   native literal ``replace`` — no UDF anywhere in the loop.
3. **Merge application** is exact greedy non-overlapping replacement via
   a doubled-delimiter encoding: a word's symbols live in one string as
   ``..a..b..c..`` and merging (a, b) replaces ``.a..b.`` with ``.ab.``.
   Because every symbol keeps a flanking ``.`` on each side after a
   replacement, consecutive merge sites stay independent: ``a a a a`` →
   ``(aa)(aa)`` and ``a a a`` → ``(aa)(a)``, exactly the Sennrich
   semantics — and ``replace`` behaves identically in Spark, DuckDB,
   and Python ``str.replace``, which is what makes the whole training
   run bit-replayable as an unrolled CTE chain (:func:`bpe_train_sql`).
   ``.`` can never occur inside a symbol: initial symbols are characters
   of ``tokens_col`` tokens (``[\\p{L}\\p{N}]+``), merges concatenate
   them.
4. **Encoding** new text with the learned merges
   (:func:`bpe_apply`) is map-only: the merge list broadcasts with the
   Arrow-batched UDF closure, words memoize within a batch.

Per-round lineage is cut with the pagerank localCheckpoint discipline so
plans stay O(1) regardless of merge count.

Reference parity: the reference engine has no tokenizer training; this
extends the training-data suite (brief: "operations a large-scale
training-data pipeline would need").

Scale notes (100 TB): corpus work = one explode+agg; each round's
aggregate input is vocab-sized with map-side partial combine; driver
state per round is one (pair, weight) row; ``bpe_apply`` never shuffles.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hyped_spark.functions.hashing import tokens_col

_D = "."  # delimiter; cannot occur in symbols (tokens are \p{L}\p{N} runs)


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, w) weighted vocabulary — the one corpus-sized pass."""
    return (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def _initial_repr(word: Column) -> Column:
    """``"abc"`` → ``"..a..b..c.."`` (doubled-delimiter symbol string)."""
    return F.concat(
        F.lit(_D + _D), F.regexp_replace(word, "(.)", "$1" + _D + _D)
    )


def _symbols(repr_col: Column) -> Column:
    return F.filter(
        F.split(repr_col, "\\.\\."), lambda s: s != F.lit("")
    )


def _adjacent_pairs(syms: Column) -> Column:
    # bind the symbol array once per row: the zip_with references it twice
    # and syms is itself a split+filter (let_col: see hashing.let_col)
    from hyped_spark.functions.hashing import let_col

    def body(s: Column) -> Column:
        pairs = F.zip_with(
            s,
            F.slice(s, 2, F.greatest(F.size(s) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
        return F.filter(pairs, lambda p: p["r"].isNotNull())

    return let_col(syms, body)


def bpe_train(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
) -> list[dict]:
    """Learn ``num_merges`` BPE merges; returns them in rank order as
    ``{"rank", "lhs", "rhs", "merged", "weight"}`` dicts (the tokenizer
    artifact — small by construction, like IVF centroids or classifier
    weights). Stops early if the vocabulary runs out of adjacent pairs.

    Pair weights count every adjacent occurrence (``"aaa"`` contributes
    (a,a) twice), ties break on (weight desc, lhs asc, rhs asc) — the
    reference ``learn_bpe`` semantics, made deterministic.
    """
    from hyped_spark.operators.dedup import _release_local_checkpoint

    vocab = (
        word_counts(df, text_col=text_col)
        .select(_initial_repr(F.col("word")).alias("repr"), "w")
        .localCheckpoint(eager=True)
    )
    merges: list[dict] = []
    prev = None  # superseded vocab, releasable once the current one is live
    for rank in range(1, num_merges + 1):
        best = (
            vocab.select(
                F.explode(_adjacent_pairs(_symbols(F.col("repr"))))
                .alias("p"),
                "w",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("w").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            # 1-row argmax: metadata-sized collect
            .collect()
        )
        # the collect above materialized `vocab` (lazy checkpoint), so the
        # round BEFORE it is now safe to free
        if prev is not None:
            _release_local_checkpoint(prev)
            prev = None
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], best[0]["cnt"]
        merges.append(
            {"rank": rank, "lhs": l, "rhs": r, "merged": l + r,
             "weight": int(cnt)}
        )
        # LAZY checkpoint: the next round's argmax collect materializes
        # the replaced vocab — one Spark job per merge round, not two
        # (the final round's unmaterialized checkpoint is just released)
        nxt = vocab.select(
            F.replace(
                F.col("repr"),
                F.lit(f"{_D}{l}{_D}{_D}{r}{_D}"),
                F.lit(f"{_D}{l}{r}{_D}"),
            ).alias("repr"),
            "w",
        ).localCheckpoint(eager=False)
        prev = vocab
        vocab = nxt
    if prev is not None:
        _release_local_checkpoint(prev)
    _release_local_checkpoint(vocab)
    return merges


def bpe_train_sql(
    corpus_sql: str, num_merges: int, text_expr: str = "text"
) -> str:
    """DuckDB replay of :func:`bpe_train` as an unrolled CTE chain (the
    pagerank oracle pattern): per round, a 1-row argmax CTE and a
    cross-joined replace. Output: (rank, lhs, rhs, merged, weight)."""
    toks = (
        f"list_filter(regexp_split_to_array(lower({text_expr}), "
        f"'[^\\p{{L}}\\p{{N}}]+'), t -> len(t) > 0)"
    )
    d2 = _D + _D
    ctes = [
        f"""w0 AS (
            SELECT word, CAST(count(*) AS BIGINT) AS w FROM (
                SELECT unnest({toks}) AS word FROM ({corpus_sql})
            ) GROUP BY word
        )""",
        f"""r0 AS (
            SELECT '{d2}' || regexp_replace(word, '(.)', '\\1{d2}', 'g')
                   AS repr, w
            FROM w0
        )""",
    ]
    for i in range(1, num_merges + 1):
        prev = f"r{i - 1}"
        ctes.append(f"""s{i} AS (
            SELECT list_filter(string_split(repr, '{d2}'),
                               x -> x <> '') AS s, w
            FROM {prev}
        )""")
        ctes.append(f"""m{i} AS (
            SELECT p.l AS l, p.r AS r, sum(w) AS cnt FROM (
                SELECT unnest([struct_pack(l := s[j], r := s[j + 1])
                               FOR j IN generate_series(1, len(s) - 1)])
                       AS p, w
                FROM s{i}
            ) GROUP BY p.l, p.r
            ORDER BY cnt DESC, l, r LIMIT 1
        )""")
        ctes.append(f"""r{i} AS (
            SELECT replace(repr, '{_D}' || l || '{d2}' || r || '{_D}',
                           '{_D}' || l || r || '{_D}') AS repr, w
            FROM {prev}, m{i}
        )""")
    rows = " UNION ALL ".join(
        f"SELECT {i} AS rank, l AS lhs, r AS rhs, l || r AS merged, "
        f"CAST(cnt AS BIGINT) AS weight FROM m{i}"
        for i in range(1, num_merges + 1)
    )
    joined = ",\n".join(ctes)
    return f"WITH {joined}\n{rows} ORDER BY rank"


def bpe_apply(
    df: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode ``text_col`` with learned merges → ``array<string>`` of
    subword tokens (words encoded independently, document order kept).

    Map-only: the merge list travels inside the Arrow-batched UDF
    closure (broadcast with the task binary); per-batch memoization makes
    repeated words (the Zipf bulk) one-time work. This is the realistic
    production path — native chained ``replace`` would nest one plan
    expression per merge, unbounded for real 32k-merge tokenizers.
    """
    reps = [
        (f"{_D}{m['lhs']}{_D}{_D}{m['rhs']}{_D}",
         f"{_D}{m['lhs']}{m['rhs']}{_D}")
        for m in merges
    ]
    import re

    word_re = re.compile(r"[^\W_]+", re.UNICODE)

    def encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is None:
            s = _D + _D + (_D + _D).join(word) + _D + _D
            for pat, new in reps:
                s = s.replace(pat, new)
            got = [x for x in s.split(_D + _D) if x]
            memo[word] = got
        return got

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for b in batches:
            out = []
            for t in b[text_col]:
                if t is None:
                    out.append(None)
                    continue
                toks: list[str] = []
                for w in word_re.findall(t.lower()):
                    toks.extend(encode_word(w, memo))
                out.append(toks)
            b = b.copy()
            b[out_col] = out
            yield b

    fields = df.schema.fields
    schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in fields)
        + f", `{out_col}` array<string>"
    )
    return df.mapInPandas(run, schema=schema)
