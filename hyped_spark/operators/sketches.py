"""Mergeable approximate sketches: HyperLogLog distinct counts and
Count-Min frequency estimation.

Why sketches at 100 TB: ``COUNT(DISTINCT)`` and exact per-key frequency
tables require shuffling every distinct value; a sketch is a fixed-size
state (2^p registers / depth x width counters) that each executor builds
map-side and that merges associatively — per-day or per-partition sketches
union into corpus-level answers without re-scanning. Spark's builtin
``approx_count_distinct`` gives the same asymptotics but its register
values are JVM-internal; these sketches are built from the repo's portable
hash (`hyped_spark.functions.hashing.h64_col`), so in ``md5`` mode the
registers — and therefore the ESTIMATES — are bit-identical in DuckDB,
which is what lets the driver run full value oracles over an approximate
operator (same trick as MinHash/SimHash).

Everything here is native Catalyst (bit ops + one hash aggregate); no UDFs.

HLL details (Flajolet et al. 2007): the hash is masked to 60 bits (the md5
portable hash is already 60-bit); the LOW ``p`` bits pick the register, the
remaining ``b = 60 - p`` bits ``w`` contribute ``rho = 1 +
trailing_zeros(w)`` (``b + 1`` when ``w == 0``) — P(rho >= j) = 2^-(j-1),
the geometric the estimator needs. The harmonic sum is computed EXACTLY in
int64 (terms scaled by 2^(b+1); max m * 2^(b+1) = 2^(p+b+1) <= 2^62), so
the only floating-point step is one literal-constant division — both
engines produce the identical double, and the rounded estimate matches
bit-for-bit. Small-range linear counting applies below 2.5m when empty
registers exist (the large-range correction at E > 2^32/30 is omitted: at
that cardinality use a bigger p).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hyped_spark.functions.hashing import h64_col, h64_sql

_MASK60 = (1 << 60) - 1


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    col: str,
    p: int = 12,
    group_cols: tuple[str, ...] = (),
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """HLL register table: one row per (group, occupied bucket) with the
    max rho — the sketch's mergeable representation. Union two register
    tables and re-max (:func:`hll_merge`) to sketch a union of inputs.

    ONE partial+final hash aggregate; at most ``2^p`` rows per group reach
    the reduce side regardless of input size (map-side max-combine).
    """
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    m = 1 << p
    b = 60 - p
    h = h64_col(F.col(col).cast("string"), hash_mode).bitwiseAND(F.lit(_MASK60))
    bucket = h.bitwiseAND(F.lit(m - 1))
    w = F.shiftrightunsigned(h, p)
    # rho = 1 + trailing_zeros(w); (w & -w) isolates the lowest set bit,
    # minus 1 turns it into a run of tz ones for bit_count.
    rho = F.when(w == 0, F.lit(b + 1)).otherwise(
        F.bit_count(w.bitwiseAND(-w) - 1) + 1
    )
    keyed = df.select(
        *[F.col(g) for g in group_cols],
        # p <= 18 so the bucket id fits an int — half the shuffle bytes of
        # the (group, bucket) exchange vs a long (guide §2.3 narrow types)
        bucket.cast("int").alias("bucket"),
        rho.cast("int").alias("rho"),
    )
    return keyed.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("rho"))


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Merge HLL sketches built with the same (p, hash_mode, group_cols):
    union the register tables and keep the max rho per bucket. Exactly the
    associative merge a per-partition / per-day rollup needs."""
    out = register_frames[0]
    for r in register_frames[1:]:
        out = out.unionByName(r)
    keys = [c for c in out.columns if c != "rho"]
    return out.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame, p: int, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Distinct-count estimate from a register table (see module docstring
    for the exact-integer-sum determinism argument)."""
    m = 1 << p
    b = 60 - p
    # scaled harmonic term: 2^(b+1-rho) for occupied, 2^(b+1) for empty
    # (python-side F.shiftleft only takes a literal shift; the SQL form
    # accepts the rho expression)
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {b + 1} - rho)")
    # coalesce: a GLOBAL aggregate over an empty register table still emits
    # one row (null sum); 0 makes every bucket empty -> linear counting ->
    # m * ln(m/m) = exactly 0, the right answer for an empty set
    agg = registers.groupBy(*group_cols).agg(
        F.coalesce(F.sum(term), F.lit(0)).alias("__occ_sum"),
        F.count(F.lit(1)).alias("__occ"),
    )
    empty = F.lit(m) - F.col("__occ")
    sum_scaled = F.col("__occ_sum") + empty * F.lit(1 << (b + 1))
    c_num = _alpha(m) * m * m * float(1 << (b + 1))  # exact *2^k scaling
    e_raw = F.lit(c_num) / sum_scaled.cast("double")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / empty.cast("double"))
    est = F.when((e_raw <= 2.5 * m) & (empty > 0), linear).otherwise(e_raw)
    return agg.select(
        *group_cols, F.round(est).cast("long").alias("est_distinct")
    )


def hll_count_distinct(
    df: DataFrame,
    col: str,
    p: int = 12,
    group_cols: tuple[str, ...] = (),
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Approximate per-group COUNT(DISTINCT col): registers + estimate.
    Standard error ~= 1.04 / sqrt(2^p) (p=12 -> 1.6%)."""
    return hll_estimate(
        hll_registers(df, col, p, group_cols, hash_mode), p, group_cols
    )


def hll_count_distinct_sql(
    table: str,
    col_expr: str,
    p: int = 12,
    group_exprs: tuple[str, ...] = (),
) -> str:
    """DuckDB twin of :func:`hll_count_distinct` (md5 hash mode) — replays
    buckets, rhos, the exact integer harmonic sum and the one-division
    estimate, so values match Spark bit-for-bit."""
    m = 1 << p
    b = 60 - p
    c_num = _alpha(m) * m * m * float(1 << (b + 1))
    h = f"({h64_sql(f'CAST({col_expr} AS VARCHAR)')} & {_MASK60})"
    gsel = "".join(f"{g}, " for g in group_exprs)
    gby = ("GROUP BY " + ", ".join(group_exprs)) if group_exprs else ""
    gby_bucket = "GROUP BY " + ", ".join([*group_exprs, "bucket"])
    return f"""
        WITH hashed AS (
            SELECT {gsel}{h} % {m} AS bucket, {h} // {m} AS w
            FROM {table}
        ),
        regs AS (
            SELECT {gsel}bucket,
                   max(CASE WHEN w = 0 THEN {b + 1}
                            ELSE bit_count(CAST((w & -w) - 1 AS BIGINT)) + 1
                       END) AS rho
            FROM hashed {gby_bucket}
        ),
        agg AS (
            SELECT {gsel}
                   coalesce(sum((1::BIGINT << ({b + 1} - rho)))::BIGINT,
                            0) AS occ_sum,
                   count(*) AS occ
            FROM regs {gby}
        )
        SELECT {gsel}
               CAST(round(CASE WHEN {c_num!r} / (occ_sum + ({m} - occ)
                                   * (1::BIGINT << {b + 1}))::DOUBLE
                                   <= 2.5 * {m} AND ({m} - occ) > 0
                  THEN {float(m)!r} * ln({float(m)!r} / ({m} - occ)::DOUBLE)
                  ELSE {c_num!r} / (occ_sum + ({m} - occ)
                                   * (1::BIGINT << {b + 1}))::DOUBLE
               END) AS BIGINT) AS est_distinct
        FROM agg
    """


def cms_sketch(
    df: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    seed: str = "cms",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of the frequency of
    ``col`` values: ``depth`` independent hash rows of ``width`` counters.
    Output is at most ``depth * width`` rows — the sketch — whatever the
    input size; built with one partial+final hash aggregate (the per-row
    explode to ``depth`` buckets combines map-side). Two sketches with the
    same (width, depth, seed, hash_mode) merge by summing counters
    (:func:`cms_merge`). Estimates are one-sided: est >= true count, with
    overestimate <= 2N/width at probability 1 - (1/2)^depth.
    """
    if width < 2 or depth < 1:
        raise ValueError(f"need width >= 2, depth >= 1; got {width}x{depth}")
    buckets = F.array(*[
        F.struct(
            F.lit(d).alias("d"),
            F.pmod(
                h64_col(
                    F.concat(F.lit(f"{seed}|{d}|"), F.col(col).cast("string")),
                    hash_mode,
                ),
                F.lit(width),
            ).alias("w"),
        )
        for d in range(depth)
    ])
    return (
        df.select(F.explode(buckets).alias("b"))
        .groupBy(F.col("b.d").alias("d"), F.col("b.w").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge Count-Min sketches built with identical parameters: counters
    add. (CM sketches are linear — this is exact, not approximate.)"""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "w").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int,
    depth: int,
    seed: str = "cms",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Point-estimate counts for the rows of ``keys``: min over the depth
    counters each key hashes to. The sketch (<= depth*width rows) is
    broadcast; keys never shuffle."""
    probes = keys.withColumn(
        "__b",
        F.explode(F.array(*[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(
                    h64_col(
                        F.concat(
                            F.lit(f"{seed}|{d}|"), F.col(key_col).cast("string")
                        ),
                        hash_mode,
                    ),
                    F.lit(width),
                ).alias("w"),
            )
            for d in range(depth)
        ])),
    ).select(key_col, F.col("__b.d").alias("d"), F.col("__b.w").alias("w"))
    return (
        probes.join(F.broadcast(sketch), ["d", "w"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_count"))
    )


def cms_count_sql(
    table: str,
    col_expr: str,
    keys_sql: str,
    key_name: str,
    width: int,
    depth: int,
    seed: str = "cms",
) -> str:
    """DuckDB twin of sketch-then-estimate (md5 mode): same per-depth
    seeded hashes, same counter sums, same min-over-depths."""
    def bucket(expr: str, d: int) -> str:
        salted = "'" + f"{seed}|{d}|" + f"' || CAST({expr} AS VARCHAR)"
        return f"({h64_sql(salted)}) % {width}"

    probe_rows = " UNION ALL ".join(
        f"SELECT {key_name}, {d} AS d, {bucket(key_name, d)} AS w FROM keys"
        for d in range(depth)
    )
    sketch_rows = " UNION ALL ".join(
        f"SELECT {d} AS d, {bucket(col_expr, d)} AS w FROM {table}"
        for d in range(depth)
    )
    return f"""
        WITH keys AS ({keys_sql}),
        sk AS (
            SELECT d, w, count(*) AS cnt FROM ({sketch_rows}) GROUP BY d, w
        ),
        probes AS ({probe_rows})
        SELECT p.{key_name}, min(coalesce(sk.cnt, 0)) AS est_count
        FROM probes p LEFT JOIN sk USING (d, w)
        GROUP BY p.{key_name}
    """


# ------------------------------------------------------------------ Bloom

def _bloom_positions(value_str, m_bits: int, k: int, seed: str,
                     hash_mode: str):
    """k seeded bit positions for one value (list of Columns)."""
    return [
        F.pmod(
            h64_col(F.concat(F.lit(f"{seed}|{i}|"), value_str), hash_mode),
            F.lit(m_bits),
        )
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int = 1 << 22,
    k: int = 5,
    seed: str = "bloom",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Bloom filter over the values of ``col``, as a SPARSE word table:
    one row per occupied word — ``(w, bits)``, 63 bits per word so the
    sign bit is never set (DuckDB's checked ``<<`` refuses ``1 << 63``) — built with a single
    partial+final ``bit_or`` aggregate. At most ``m_bits / 63 + 1`` rows
    leave the map side whatever the input size, and two filters with the same
    (m_bits, k, seed, hash_mode) merge by OR (:func:`bloom_merge`).

    Unlike Spark's JVM-internal ``DataFrameStatFunctions.bloomFilter``,
    the bit layout is the repo's portable hash, so in md5 mode membership
    answers replay bit-for-bit in DuckDB (:func:`bloom_member_sql`).
    Size for ~10 bits/key: FPR ≈ (1 - e^(-k·n/m))^k ≈ 1% at k=5.
    """
    if m_bits < 64:
        raise ValueError(f"m_bits must be >= 64, got {m_bits}")
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16], got {k}")
    v = F.col(col).cast("string")
    pos = F.array(*_bloom_positions(v, m_bits, k, seed, hash_mode))
    word = df.select(F.explode(pos).alias("__p")).select(
        F.expr("__p div 63").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 63 AS INT))").alias(
            "__m"
        ),
    )
    return word.groupBy("w").agg(F.bit_or("__m").alias("bits"))


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """OR-merge Bloom word tables built with identical parameters."""
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy("w").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    bloom: DataFrame,
    keys: DataFrame,
    key_col: str,
    m_bits: int,
    k: int,
    seed: str = "bloom",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Membership test for every row of ``keys``: adds a ``member``
    boolean (true = maybe-present with the filter's FPR; false = certainly
    absent). STRICTLY map-side: the word table (≤ m_bits/64 rows) is
    broadcast and each of the k probes is its own broadcast hash join —
    no explode, no re-aggregation, keys NEVER shuffle and keep all their
    columns. (An explode + groupBy formulation would shuffle one row per
    (key, probe) — corpus-sized at scale; k chained map-side joins cost
    only plan width.)"""
    v = F.col(key_col).cast("string")
    out = keys
    hit_terms = []
    for i, pos in enumerate(_bloom_positions(v, m_bits, k, seed, hash_mode)):
        w_i, b_i, m_i = f"__bf_w{i}", f"__bf_b{i}", f"__bf_m{i}"
        out = (
            out.withColumn(w_i, pos.cast("long"))
            .withColumn(
                m_i,
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST({w_i} % 63 AS INT))"
                ),
            )
            .withColumn(w_i, F.expr(f"{w_i} div 63"))
            .join(
                F.broadcast(
                    bloom.select(
                        F.col("w").alias(w_i), F.col("bits").alias(b_i)
                    )
                ),
                w_i,
                "left",
            )
        )
        hit_terms.append(
            F.col(b_i).isNotNull()
            & (F.col(b_i).bitwiseAND(F.col(m_i)) == F.col(m_i))
        )
    member = hit_terms[0]
    for t in hit_terms[1:]:
        member = member & t
    drop = [c for i in range(k) for c in (f"__bf_w{i}", f"__bf_b{i}", f"__bf_m{i}")]
    return out.withColumn("member", member).drop(*drop)


def bloom_member_sql(
    build_sql: str,
    build_expr: str,
    keys_sql: str,
    key_name: str,
    m_bits: int,
    k: int,
    seed: str = "bloom",
) -> str:
    """DuckDB twin of build-then-probe (md5 mode): same seeded positions,
    same word/bit layout, same all-k conjunction — bit-for-bit parity.
    ``build_sql`` yields the set rows (column ``build_expr``); ``keys_sql``
    the probe rows (column ``key_name``)."""
    def pos(expr: str, i: int) -> str:
        salted = "'" + f"{seed}|{i}|" + f"' || CAST({expr} AS VARCHAR)"
        return f"({h64_sql(salted)}) % {m_bits}"

    set_rows = " UNION ALL ".join(
        f"SELECT {pos(build_expr, i)} AS p FROM b" for i in range(k)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT {key_name}, {pos(key_name, i)} AS p FROM keys"
        for i in range(k)
    )
    return f"""
        WITH b AS ({build_sql}),
        keys AS ({keys_sql}),
        words AS (
            SELECT p // 63 AS w,
                   bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
            FROM ({set_rows}) GROUP BY p // 63
        ),
        probes AS (
            SELECT {key_name}, p // 63 AS w,
                   1::BIGINT << CAST(p % 63 AS INT) AS m
            FROM ({probe_rows})
        )
        SELECT p.{key_name},
               bool_and(wd.bits IS NOT NULL AND (wd.bits & p.m) = p.m)
                   AS member
        FROM probes p LEFT JOIN words wd USING (w)
        GROUP BY p.{key_name}
    """
