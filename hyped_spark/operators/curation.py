"""Dataset-curation operators: deterministic splits and sequence packing.

Two operations every large-scale training-data pipeline needs between
"corpus" and "training run":

- ``split_by_hash``: assign each row a stable train/val/test label from a
  portable hash of its key — reproducible across runs, engines, and
  cluster sizes (no sampling state), and new rows land in a split without
  reshuffling old ones.
- ``pack_offsets``: concat-then-chunk sequence packing — documents are
  concatenated in id order and the token stream is cut every
  ``chunk_tokens`` tokens (the standard LLM pretraining packing). The
  result maps each document to the chunk(s) it lands in with global token
  offsets.

Scale notes: the packing prefix-sum is the textbook distributed scan —
range-partition by id, per-partition cumulative sum (window partitioned by
partition id, so no single-partition global window), then add exclusive
per-partition offsets computed from an ``n_partitions``-row driver rollup.
The split is a pure per-row projection (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hyped_spark.functions.hashing import h64_col

_SPLIT_MOD = 10_000


def split_by_hash(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    out_col: str = "split",
    hash_mode: str = "md5",
) -> DataFrame:
    """Deterministic dataset split by hash bucket.

    ``bucket = h64(key) % 10000``; each label owns a contiguous bucket
    range sized by its fraction (cumulative, in the given dict order).
    Fractions must sum to ~1. ``hash_mode='md5'`` (default) is portable —
    the DuckDB oracle reproduces the assignment bit-for-bit; pass
    ``'xxhash64'`` for the cheaper Spark-only variant.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = F.pmod(h64_col(F.col(key_col).cast("string"), hash_mode),
                    F.lit(_SPLIT_MOD))
    expr = None
    acc = 0.0
    for label, frac in fractions.items():
        acc += frac
        cut = int(round(acc * _SPLIT_MOD))
        cond = bucket < F.lit(cut)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn(out_col, expr)


def split_by_hash_sql(key_expr: str, fractions: dict[str, float]) -> str:
    """DuckDB CASE expression mirroring :func:`split_by_hash` (md5 mode)."""
    from hyped_spark.functions.hashing import h64_sql

    b = f"({h64_sql(f'CAST({key_expr} AS VARCHAR)')} % {_SPLIT_MOD})"
    acc = 0.0
    arms = []
    for label, frac in fractions.items():
        acc += frac
        arms.append(f"WHEN {b} < {int(round(acc * _SPLIT_MOD))} THEN '{label}'")
    return "CASE " + " ".join(arms) + " END"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    seed: int = 42,
    hash_mode: str = "md5",
) -> DataFrame:
    """Deterministic per-stratum sampling by hash threshold.

    A row is kept iff ``h64(seed|stratum|key) % 10000 < frac(stratum)·10000``
    — a pure per-row projection: no sampling state, no shuffle, stable
    across runs, engines, and cluster sizes, and (unlike
    ``DataFrame.sampleBy``) re-running on a grown table keeps exactly the
    previously-sampled rows plus a consistent sample of the new ones —
    the property an incremental corpus pipeline needs. Strata missing from
    ``fractions`` fall back to ``default_fraction`` (0 = drop).

    The hash is salted with ``seed`` and the stratum value, so the kept
    set is decorrelated from :func:`split_by_hash` buckets over the same
    key (reference parity: the sampling/filters stage of the curation
    pipeline; this engine makes it reproducible instead of RNG-based).
    """
    for label, frac in fractions.items():
        if not (0.0 <= frac <= 1.0):
            raise ValueError(f"fraction for {label!r} not in [0,1]: {frac}")
    if not (0.0 <= default_fraction <= 1.0):
        raise ValueError(f"default_fraction not in [0,1]: {default_fraction}")
    bucket = F.pmod(
        h64_col(
            F.concat_ws(
                "|",
                F.lit(str(seed)),
                F.col(strata_col).cast("string"),
                F.col(key_col).cast("string"),
            ),
            hash_mode,
        ),
        F.lit(_SPLIT_MOD),
    )
    thresh = None
    for label, frac in fractions.items():
        cut = F.lit(int(round(frac * _SPLIT_MOD)))
        cond = F.col(strata_col).cast("string") == str(label)
        thresh = F.when(cond, cut) if thresh is None else thresh.when(cond, cut)
    thresh = thresh.otherwise(
        F.lit(int(round(default_fraction * _SPLIT_MOD)))
    ) if thresh is not None else F.lit(int(round(default_fraction * _SPLIT_MOD)))
    return df.filter(bucket < thresh)


def stratified_sample_sql(
    strata_expr: str,
    fractions: dict[str, float],
    key_expr: str,
    default_fraction: float = 0.0,
    seed: int = 42,
) -> str:
    """DuckDB WHERE predicate mirroring :func:`stratified_sample` (md5)."""
    from hyped_spark.functions.hashing import h64_sql

    h = h64_sql(
        f"concat_ws('|', '{seed}', CAST({strata_expr} AS VARCHAR), "
        f"CAST({key_expr} AS VARCHAR))"
    )
    arms = " ".join(
        f"WHEN CAST({strata_expr} AS VARCHAR) = '{label}' "
        f"THEN {int(round(frac * _SPLIT_MOD))}"
        for label, frac in fractions.items()
    )
    default = int(round(default_fraction * _SPLIT_MOD))
    return f"(({h}) % {_SPLIT_MOD}) < (CASE {arms} ELSE {default} END)"


def source_mixture_weights(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
    weight_col: str = "sample_weight",
) -> DataFrame:
    """Temperature-based multi-corpus mixing weights (the T5/LLaMA
    ``count^alpha`` rule): per-source weight ∝ n_source^alpha, normalized
    to sum 1 across sources, then joined back per row — so sampling rows
    proportionally to ``weight/count`` yields the tempered source mix.
    ``alpha=1`` is natural proportions; ``alpha=0`` uniform over sources.

    One map-side-combinable count per source plus a broadcast join of the
    (n_sources)-row weight table — the corpus never shuffles.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    weights = counts.withColumn("__w", F.pow(F.col("__n"), F.lit(alpha)))
    # empty corpus → sum is NULL; any non-zero divisor works (no rows)
    total = weights.agg(F.sum("__w")).collect()[0][0] or 1.0
    weights = weights.select(
        source_col,
        F.round(F.col("__w") / F.lit(float(total)), 6).alias(weight_col),
    )
    return df.join(F.broadcast(weights), source_col)


def pack_offsets(
    df: DataFrame,
    len_col: str,
    id_col: str = "doc_id",
    chunk_tokens: int = 2048,
) -> DataFrame:
    """Concat-then-chunk packing assignment.

    Documents ordered by ``id_col`` are conceptually concatenated into one
    token stream cut every ``chunk_tokens``. Returns one row per
    (document, chunk) intersection::

        (id_col, chunk_id, slice_begin, slice_end)

    with global token offsets (a document straddling a cut appears in both
    chunks, clipped). Zero-length documents produce no rows. Output is a
    pure function of the input (independent of partitioning): offsets come
    from a prefix sum over the total id order, computed distributed —
    range repartition, per-partition window cumsum, plus exclusive
    partition offsets from an ``n_partitions``-row collect.

    ``id_col`` values MUST be unique — the packing order "concatenated in
    id order" is undefined otherwise. The cumsum window uses an explicit
    ROWS frame, so even on malformed duplicate-id input each row gets its
    own running total (Spark's default RANGE frame would make duplicate
    ids peers sharing one cumulative sum → overlapping slices, silently
    diverging from the ROWS-frame SQL oracle).
    """
    d = df.select(F.col(id_col), F.col(len_col).cast("long").alias("__n"))
    # materialize the narrow (id, n) frame ONCE and truncate lineage:
    # downstream needs FOUR passes over it (range-boundary sampling, the
    # partition-total rollup, the window, the final join) and without this
    # each pass re-derives n from the source (at bench scale that meant
    # re-tokenizing every document four times). 16 bytes/row — bounded.
    d = d.localCheckpoint(eager=True)
    d = d.repartitionByRange(F.col(id_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("__local_end", F.sum("__n").over(w))
    totals = sorted(
        d.groupBy("__pid").agg(F.max("__local_end").alias("t")).collect(),
        key=lambda r: r["__pid"],
    )
    acc = 0
    offs = []
    for r in totals:
        offs.append((int(r["__pid"]), acc))
        acc += int(r["t"])
    spark = df.sparkSession
    off_df = spark.createDataFrame(offs, "__pid int, __off long")
    B = chunk_tokens
    out = (
        d.join(F.broadcast(off_df), "__pid")
        .withColumn("__end", F.col("__local_end") + F.col("__off"))
        .withColumn("__begin", F.col("__end") - F.col("__n"))
        .filter(F.col("__n") > 0)
        .withColumn(
            "chunk_id",
            # exact integer division (float `/` loses precision past 2^53)
            F.explode(
                F.sequence(F.expr(f"__begin DIV {B}"),
                           F.expr(f"(__end - 1) DIV {B}"))
            ),
        )
        .select(
            id_col,
            "chunk_id",
            F.greatest(F.col("__begin"), F.col("chunk_id") * B)
             .alias("slice_begin"),
            F.least(F.col("__end"), (F.col("chunk_id") + 1) * B)
             .alias("slice_end"),
        )
    )
    return out


def frequent_items(df: DataFrame, col: str, support: float,
                   round_dp: int = 6) -> DataFrame:
    """Exact heavy hitters: values of ``col`` carried by at least a
    ``support`` fraction of rows, with counts and fractions.

    Scale shape: the grouped count is ONE partial+final aggregation (the
    map-side combine means each executor ships at most its distinct values,
    and any value above the support threshold is by definition carried by
    ≤ 1/support distinct keys globally — the output is at most
    ``1/support`` rows however big the input). The global total rides the
    same scan via a grouping-sets-free trick: aggregate once, then a
    broadcast join of the 1-row total. This is the hot-key detector that
    feeds the CDC merge's salting decision (a key above ~1/n_partitions
    support is exactly one that needs the salted pre-reduce path).
    """
    if not 0.0 < support <= 1.0:
        raise ValueError(f"support must be in (0, 1], got {support}")
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    # Compare the ratio directly rather than against ceil(total*support):
    # the ceil of an inexact double product excludes values sitting exactly
    # at the support fraction (1000*0.1 -> 100.00000000000001, ceil 101).
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("cnt") / F.col("__total") >= F.lit(support))
        .select(
            col,
            F.col("cnt"),
            F.round(F.col("cnt") / F.col("__total"), round_dp).alias("frac"),
        )
    )


def frequent_items_sql(table: str, col: str, support: float,
                       round_dp: int = 6) -> str:
    """DuckDB twin of :func:`frequent_items`."""
    return f"""
        SELECT {col}, count(*) AS cnt,
               round(CAST(count(*) AS DOUBLE)
                     / (SELECT count(*) FROM {table}), {round_dp}) AS frac
        FROM {table}
        GROUP BY {col}
        HAVING CAST(count(*) AS DOUBLE)
               / (SELECT count(*) FROM {table}) >= {support!r}
    """


def weighted_sample(df: DataFrame, key_col: str, weight_col: str, k: int,
                    seed: str = "ws") -> DataFrame:
    """Weighted random sample without replacement — the Efraimidis–Spirakis
    A-ES scheme (keys ``u^(1/w)``, take the top k), with the uniform drawn
    from a portable hash of the row key instead of an RNG, so the sample is
    reproducible across runs, engines, and cluster sizes (same property as
    ``split_by_hash``) and fully replayable in SQL.

    Implementation detail: maximizing ``u^(1/w)`` is equivalent to
    maximizing ``ln(u)/w`` (w > 0), which avoids ``pow`` and keeps the
    score linear in the hash. Rows with non-positive weight never sample.
    Top-k is TakeOrdered (per-partition heads, no global sort).
    """
    u = ((h64_col(F.concat(F.lit(seed + "|"), F.col(key_col).cast("string")),
                  "md5") % _SPLIT_MOD) + 0.5) / _SPLIT_MOD
    score = F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__ws_score", score)
        .orderBy(F.col("__ws_score").desc(), F.col(key_col))
        .limit(k)
        .drop("__ws_score")
    )


def weighted_sample_sql(table: str, key_expr: str, weight_expr: str, k: int,
                        seed: str = "ws") -> str:
    """DuckDB twin of :func:`weighted_sample` — same hash-uniform, same
    score, same deterministic tiebreak."""
    from hyped_spark.functions.hashing import h64_sql

    h = h64_sql(f"'{seed}|' || CAST({key_expr} AS VARCHAR)")
    return f"""
        SELECT * EXCLUDE (__ws_score) FROM (
            SELECT *, ln((({h}) % {_SPLIT_MOD} + 0.5) / {_SPLIT_MOD})
                      / ({weight_expr}) AS __ws_score
            FROM {table}
            WHERE ({weight_expr}) > 0
            ORDER BY __ws_score DESC, {key_expr}
            LIMIT {k}
        )
    """


def filter_blocklisted_urls(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    mode: str = "drop",
    flag_col: str = "blocked",
    broadcast_hits: bool = True,
) -> DataFrame:
    """UT1-style domain blocklist filtering: drop (``mode="drop"``) or flag
    (``mode="flag"``) rows whose URL's host has ANY dot-suffix listed in
    ``blocklist[domain_col]`` — so a listed ``example.com`` blocks
    ``w3.ads.example.com`` too (the standard registrable-domain match of
    UT1 / web-curation deny lists).

    The 100 TB shape mirrors :func:`hyped_spark.operators.dedup.decontaminate`:
    the blocklist (even UT1's ~4M domains ≈ tens of MB) broadcasts; the
    corpus side explodes a (url, suffix) projection — ~3 suffixes/host,
    ids-only, never the payload — and semi-joins map-side against the
    broadcast list. The blocked-URL set (normally a small fraction of the
    corpus) is then broadcast back for a map-side anti/left join, so the
    corpus payload NEVER shuffles. If a LARGE corpus fraction is blocked
    (hit-set beyond broadcast reach), pass ``broadcast_hits=False`` to let
    the join-back fall to a sort-merge on the url key — one corpus
    shuffle, no driver-memory ceiling. For literal lists of a few dozen
    domains :func:`hyped_spark.functions.url.blocked_url_col` is the
    zero-join per-row variant.
    """
    from hyped_spark.functions.url import domain_suffixes_col, host_col

    bl = blocklist.select(F.lower(F.trim(F.col(domain_col))).alias("__sfx"))
    sufx = df.select(F.col(url_col).alias("__u")).select(
        "__u",
        F.explode(
            domain_suffixes_col(host_col(F.col("__u")))
        ).alias("__sfx"),
    )
    hits = (
        sufx.join(F.broadcast(bl), "__sfx", "left_semi")
        .select("__u").distinct()
    )
    if broadcast_hits:
        hits = F.broadcast(hits)
    if mode == "flag":
        out = df.join(
            hits.withColumn(flag_col, F.lit(True)),
            df[url_col] == hits["__u"], "left",
        ).drop("__u")
        return out.withColumn(flag_col, F.coalesce(F.col(flag_col), F.lit(False)))
    if mode == "drop":
        return df.join(hits, df[url_col] == hits["__u"], "left_anti")
    raise ValueError(f"unknown blocklist mode: {mode!r}")


def cap_per_domain(
    df: DataFrame,
    url_col: str = "url",
    k: int = 100,
    order_col: str | None = None,
    n_labels: int = 2,
    hash_mode: str = "xxhash64",
    domain_out: str | None = None,
    descending: bool = False,
) -> DataFrame:
    """Per-domain quota cap: keep at most ``k`` rows per registrable domain
    (last ``n_labels`` host labels) — the crawl-curation guard that stops a
    single site from dominating a training mix.

    Selection is deterministic: rows rank by ``order_col`` if given, else by
    a hash of the URL (``hash_mode="md5"`` makes the ranking portable /
    SQL-replayable; default ``xxhash64`` is the cheap scale path) — a stable
    uniform subsample rather than an order-of-appearance artifact. Ties
    break on the URL string. The rank is ASCENDING by default (keeps the
    ``k`` SMALLEST ``order_col`` values); pass ``descending=True`` for
    higher-is-better scores such as quality — otherwise each domain keeps
    its worst documents.

    Scale shape: ONE hash exchange on the domain key; the rank-≤-k filter
    sits directly on ``row_number`` so Spark inserts WindowGroupLimit and
    drops over-quota rows map-side before the shuffle (same plan as
    ``exact_dedup``). No payload moves twice, no driver state.
    """
    from hyped_spark.functions.url import host_col, registrable_domain_col

    dom = registrable_domain_col(host_col(F.col(url_col)), n_labels)
    out = df.withColumn("__dom", dom)
    ordc = (F.col(order_col) if order_col
            else h64_col(F.col(url_col), hash_mode))
    ordc = ordc.desc() if descending else ordc.asc()
    w = Window.partitionBy("__dom").orderBy(ordc, F.col(url_col).asc())
    out = (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    if domain_out:
        return out.withColumnRenamed("__dom", domain_out)
    return out.drop("__dom")


def cap_per_domain_sql(
    table: str,
    url_expr: str = "url",
    k: int = 100,
    order_expr: str | None = None,
    n_labels: int = 2,
    domain_out: str | None = None,
    descending: bool = False,
) -> str:
    """DuckDB twin of :func:`cap_per_domain` (portable md5 ranking)."""
    from hyped_spark.functions.hashing import h64_sql
    from hyped_spark.functions.url import host_sql, registrable_domain_sql

    dom = registrable_domain_sql(f"({host_sql(url_expr)})", n_labels)
    ordc = order_expr or h64_sql(url_expr)
    direction = "DESC" if descending else "ASC"
    dom_alias = domain_out or "__dom"
    drop = "(__rn)" if domain_out else "(__dom, __rn)"
    return f"""
        SELECT * EXCLUDE {drop} FROM (
            SELECT t.*, {dom} AS {dom_alias},
                   row_number() OVER (PARTITION BY {dom}
                                      ORDER BY {ordc} {direction},
                                               {url_expr} ASC)
                       AS __rn
            FROM {table} t
        ) WHERE __rn <= {k}
    """


def token_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Shannon entropy (bits) of the unigram distribution —
    the lexical-diversity quality signal: near-0 for degenerate repetition
    ("spam spam spam"), ~log2(n) for all-distinct text. Complements the
    Gopher repetition fractions (those catch structured duplication, this
    catches low-diversity gibberish).

    Shape: explode → (id, token) count → per-id entropy agg — two
    exchanges carrying (id, hash-sized) pairs only, map-side combined.
    Output: (id_col, n_tokens, entropy) with entropy rounded to 6 dp;
    empty documents get entropy 0.0 with n_tokens 0.
    """
    from hyped_spark.functions.hashing import tokens_col

    toks = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("__t")
    )
    counts = toks.groupBy(id_col, "__t").agg(
        F.count(F.lit(1)).alias("__c"))
    ent = counts.groupBy(id_col).agg(
        F.sum("__c").alias("n_tokens"),
        # H = log2(n) - sum(c*log2(c))/n  (one pass, no per-row n join)
        F.round(
            (F.log2(F.sum("__c"))
             - F.sum(F.col("__c") * F.log2("__c")) / F.sum("__c")),
            6,
        ).alias("entropy"),
    )
    return (
        df.select(id_col).join(ent, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("entropy", F.lit(0.0)).alias("entropy"),
        )
    )


def token_entropy_sql(
    table: str, id_expr: str = "doc_id", text_expr: str = "text"
) -> str:
    """DuckDB twin of :func:`token_entropy`."""
    toks = (
        f"list_filter(regexp_split_to_array(lower({text_expr}), "
        f"'[^\\p{{L}}\\p{{N}}]+'), t -> len(t) > 0)"
    )
    return f"""
        WITH tk AS (
            SELECT {id_expr} AS __id, unnest({toks}) AS t FROM {table}
        ),
        c AS (
            SELECT __id, t, CAST(count(*) AS BIGINT) AS c FROM tk
            GROUP BY __id, t
        ),
        e AS (
            SELECT __id, CAST(sum(c) AS BIGINT) AS n_tokens,
                   round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6)
                   AS entropy
            FROM c GROUP BY __id
        )
        SELECT d.{id_expr} AS {id_expr},
               coalesce(e.n_tokens, 0) AS n_tokens,
               coalesce(e.entropy, 0.0) AS entropy
        FROM {table} d LEFT JOIN e ON d.{id_expr} = e.__id
    """


def schedule_frontier(
    urls: DataFrame,
    url_col: str = "url",
    priority_col: str | None = None,
    per_host_delay_s: float = 1.0,
    max_per_host: int = 0,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Politeness-aware crawl-frontier scheduling: order fetches per host
    (highest ``priority_col`` first; deterministic hash order without
    one), assign each its host-local ``slot`` and the earliest polite
    fetch time ``scheduled_offset_s = slot * per_host_delay_s``.
    ``max_per_host > 0`` caps a host's queue (the cap_per_domain rule at
    frontier time — Spark executes it as a map-side WindowGroupLimit).

    One exchange keyed by host; no global sort — the scheduler that
    consumes this orders within whatever partition grain it fetches.
    Completes the crawl stack: outlinks feed it, robots_filter gates it,
    this sequences it.
    """
    from hyped_spark.functions.hashing import h64_col
    from hyped_spark.functions.url import host_col

    u = urls.withColumn("host", host_col(F.col(url_col)))
    if priority_col is not None:
        order = [F.col(priority_col).desc(), F.col(url_col)]
    else:
        order = [h64_col(F.col(url_col), hash_mode), F.col(url_col)]
    w = Window.partitionBy("host").orderBy(*order)
    # filter on the RAW row_number: the `<= k` shape is what Catalyst's
    # InferWindowGroupLimit recognizes (slot = rn - 1 arithmetic first
    # would forfeit the map-side drop)
    out = u.withColumn("__rn", F.row_number().over(w))
    if max_per_host > 0:
        out = out.filter(F.col("__rn") <= max_per_host)
    return (
        out.withColumn("slot", F.col("__rn") - 1).drop("__rn")
        .withColumn(
            "scheduled_offset_s",
            F.round(F.col("slot") * F.lit(float(per_host_delay_s)), 6),
        )
    )


def schedule_frontier_sql(
    urls_sql: str,
    url_expr: str = "url",
    priority_expr: str | None = None,
    per_host_delay_s: float = 1.0,
    max_per_host: int = 0,
) -> str:
    """DuckDB twin of :func:`schedule_frontier` (md5 order mode when no
    priority)."""
    from hyped_spark.functions.hashing import h64_sql
    from hyped_spark.functions.url import host_sql

    if priority_expr is not None:
        order = f"{priority_expr} DESC, {url_expr}"
    else:
        order = f"{h64_sql(url_expr)}, {url_expr}"
    cap = f"WHERE slot < {max_per_host}" if max_per_host > 0 else ""
    return f"""
        WITH u AS (
            SELECT *, {host_sql(url_expr)} AS host FROM ({urls_sql})
        ),
        s AS (
            SELECT *, row_number() OVER (PARTITION BY host
                                         ORDER BY {order}) - 1 AS slot
            FROM u
        )
        SELECT *, round(slot * CAST({per_host_delay_s!r} AS DOUBLE), 6)
               AS scheduled_offset_s
        FROM s {cap}
    """
