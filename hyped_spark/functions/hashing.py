"""Hashing / sketching column builders: shingles, MinHash, SimHash.

All deterministic and seed-stable. MinHash permutations use the classic
universal-hash family  h_i(x) = (a_i·x + b_i) mod p  with p = 2^31−1
(Mersenne), coefficients derived from a seeded SHA-256 stream — identical
across executors and runs. Everything except the SimHash bit-vote is native
Catalyst (array expressions, no UDF); SimHash votes over 64 bits with numpy
in an Arrow-vectorized pandas UDF.

String→int64 hashing is pluggable (``hash_mode``):

- ``"xxhash64"`` (default) — Spark-native, fastest; the 100 TB scale path.
- ``"md5"``      — portable 60-bit hash (first 15 hex chars of md5, parsed
  base-16). Bit-identical in DuckDB as
  ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)``, which is what lets the
  driver run full SQL oracles for MinHash/SimHash (the r2 ``no_oracle``
  rows). Always non-negative, so int64 and uint64 arithmetic agree.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MERSENNE_P = (1 << 31) - 1


def _coeffs(k: int, seed: int = 42) -> list[tuple[int, int]]:
    out = []
    for i in range(k):
        d = hashlib.sha256(f"minhash|{seed}|{i}".encode()).digest()
        a = (int.from_bytes(d[:8], "big") % (MERSENNE_P - 1)) + 1
        b = int.from_bytes(d[8:16], "big") % MERSENNE_P
        out.append((a, b))
    return out


def h64_col(s: Column, hash_mode: str = "xxhash64") -> Column:
    """String → int64 hash, selectable between the fast and portable modes
    (see module docstring). ``conv`` parses ≤15 hex chars exactly into a
    60-bit non-negative long."""
    if hash_mode == "xxhash64":
        return F.xxhash64(s)
    if hash_mode == "md5":
        return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_mode: {hash_mode!r}")


def h64_sql(expr: str, hash_mode: str = "md5") -> str:
    """DuckDB SQL twin of :func:`h64_col` (portable mode only)."""
    if hash_mode != "md5":
        raise ValueError("only hash_mode='md5' is DuckDB-expressible")
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def tokens_col(text: Column) -> Column:
    """Lowercased word tokens (native split)."""
    return F.filter(
        F.split(F.lower(text), r"[^\p{L}\p{N}]+"), lambda t: F.length(t) > 0
    )


def let_col(value: Column, body) -> Column:
    """Bind ``value`` once per row and evaluate ``body(bound)`` — the
    let-binding trick: ``transform(array(value), v -> body(v))[0]``.

    Why it exists: Catalyst performs no loop-invariant hoisting or common-
    subexpression elimination inside higher-order-function lambdas, so an
    expression like ``transform(starts, i -> f(slice(tokens, i, n)))``
    re-evaluates the whole ``tokens`` subtree (a regex split) for EVERY
    element, and a body referencing ``tokens`` k times evaluates it k
    times per row. Routing the shared subtree through a single-element
    ``transform`` turns it into a lambda variable — computed once per row,
    referenced many times. Measured 3-4× on the md5 shingle pass at sf0.1
    (the tokenizer ran once per *shingle* instead of once per document).
    """
    return F.transform(F.array(value), body)[0]


def shingles_col(tokens: Column, n: int = 3, hash_mode: str = "xxhash64") -> Column:
    """n-gram shingles of a token array, hashed to int64 (native).

    Output: array<long> of distinct shingle hashes — the set representation
    used for both MinHash and exact Jaccard verification.

    ``xxhash64`` (scale) mode hashes each token ONCE and folds gram hashes
    pairwise with ``zip_with`` over shifted slices — no gram string is ever
    materialized (the same measured-6× trick as
    ``text.dup_ngram_frac_col(hashed=True)``); set semantics are identical
    modulo 2^-64 collisions. ``md5`` (oracle) mode keeps literal
    md5-of-gram-string hashing so the DuckDB twin reproduces values
    bit-for-bit.

    Both modes bind the token array (and the per-token hash array) ONCE
    per row via :func:`let_col` — without the binding the tokenizer regex
    re-ran per shingle / per fold step (guide §1.2 "per-task work";
    measured 3-4× on the md5 pass at sf0.1).
    """
    if hash_mode == "xxhash64":
        def body(toks: Column) -> Column:
            n_tokens = F.size(toks)

            def fold(th: Column) -> Column:
                g = th
                for j in range(1, n):
                    g = F.zip_with(
                        g,
                        F.slice(th, j + 1, F.greatest(n_tokens - j, F.lit(0))),
                        lambda a, b: F.xxhash64(a, b),
                    )
                return F.slice(
                    g, 1, F.greatest(n_tokens - (n - 1), F.lit(0))
                )

            return F.when(
                n_tokens >= n,
                let_col(F.transform(toks, lambda t: F.xxhash64(t)), fold),
            ).otherwise(
                # short docs: whole doc is one shingle
                F.array(h64_col(F.concat_ws(" ", toks), hash_mode))
            )

        return F.array_distinct(let_col(tokens, body))

    def body_md5(toks: Column) -> Column:
        n_tokens = F.size(toks)
        starts = F.sequence(
            F.lit(0), F.greatest(n_tokens - n, F.lit(0)), F.lit(1)
        )
        return F.when(n_tokens >= n, F.transform(
            starts,
            lambda i: h64_col(F.concat_ws(" ", F.slice(toks, i + 1, n)), hash_mode),
        )).otherwise(
            # short docs: whole doc is one shingle
            F.array(h64_col(F.concat_ws(" ", toks), hash_mode))
        )

    return F.array_distinct(let_col(tokens, body_md5))


def positional_gram_hashes_col(
    tokens: Column, n: int, hash_mode: str = "xxhash64"
) -> Column:
    """Per-position n-gram hashes: ``array<long>`` where element ``i`` is
    the hash of the window ``tokens[i : i+n]`` (0-based). Unlike
    :func:`shingles_col` this keeps positions (no ``array_distinct``) and
    has NO short-document fallback — a document with fewer than ``n``
    tokens yields an empty array. Input to duplicate-substring-span
    detection (:mod:`hyped_spark.operators.substrings`).

    ``xxhash64`` mode reuses the fold-hash kernel (hash each token once,
    ``zip_with`` pairwise folds over shifted slices — no gram string is
    materialized); ``md5`` mode hashes literal gram strings so DuckDB can
    replay values bit-for-bit.
    """
    if hash_mode == "xxhash64":
        def body(toks: Column) -> Column:
            n_tokens = F.size(toks)

            def fold(th: Column) -> Column:
                g = th
                for j in range(1, n):
                    g = F.zip_with(
                        g,
                        F.slice(th, j + 1, F.greatest(n_tokens - j, F.lit(0))),
                        lambda a, b: F.xxhash64(a, b),
                    )
                # zip_with pads to the longer side; only the first
                # size-(n-1) entries are complete n-grams (empty when
                # size < n)
                return F.slice(
                    g, 1, F.greatest(n_tokens - (n - 1), F.lit(0))
                )

            return let_col(F.transform(toks, lambda t: F.xxhash64(t)), fold)

        return let_col(tokens, body)
    if hash_mode != "md5":
        raise ValueError(f"unknown hash_mode: {hash_mode!r}")

    def body_md5(toks: Column) -> Column:
        n_tokens = F.size(toks)
        starts = F.sequence(
            F.lit(0), F.greatest(n_tokens - n, F.lit(0)), F.lit(1)
        )
        return F.when(
            n_tokens >= n,
            F.transform(
                starts,
                lambda i: h64_col(
                    F.concat_ws(" ", F.slice(toks, i + 1, n)), "md5"
                ),
            ),
        ).otherwise(F.expr("CAST(array() AS ARRAY<BIGINT>)"))

    return let_col(tokens, body_md5)


def minhash_signature_col(shingles: Column, k: int = 64, seed: int = 42) -> Column:
    """MinHash signature: array<long> of length k, fully native.

    min over shingle hashes s of (a_i·(s mod p) + b_i) mod p. Products stay
    < 2^62 (both factors < 2^31), so 64-bit arithmetic is exact.

    Computed as ONE ``aggregate`` pass over the shingle array — the
    accumulator is the length-k running-min vector, each element folds in
    via ``zip_with(acc, perms(s), least)``. The earlier form (k independent
    ``array_min(transform(...))`` columns) traversed the array k times;
    the fold is arithmetic-identical (same permutation values, same mins —
    bit-equal signatures, verified) and measured ~5× faster at sf0.1.
    """
    coeffs = _coeffs(k, seed)
    p = F.lit(MERSENNE_P)
    init = F.array(*[F.lit(MERSENNE_P).cast("long")] * k)

    def fold(acc: Column, s: Column) -> Column:
        sm = F.pmod(s, p)
        vals = F.array(*[(F.lit(a) * sm + F.lit(b)) % p for a, b in coeffs])
        return F.zip_with(acc, vals, lambda x, y: F.least(x, y))

    return F.aggregate(shingles, init, fold)


def lsh_bands_col(signature: Column, n_bands: int, rows_per_band: int) -> Column:
    """Band the signature for LSH: array<struct<band:int, bhash:long>>.

    Explode + groupBy(band, bhash) buckets candidate near-dups; two docs
    collide in a band iff all ``rows_per_band`` minhashes in it agree.
    """
    bands = []
    for b in range(n_bands):
        part = F.slice(signature, b * rows_per_band + 1, rows_per_band)
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.concat_ws(",", F.transform(part, lambda x: x.cast("string")))).alias("bhash"),
            )
        )
    return F.array(*bands)


def jaccard_col(shingles_a: Column, shingles_b: Column) -> Column:
    """Exact Jaccard of two distinct-element arrays (native)."""
    inter = F.size(F.array_intersect(shingles_a, shingles_b))
    union = F.size(F.array_union(shingles_a, shingles_b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def simhash64_batch(token_hashes) -> np.ndarray:
    """64-bit SimHash per document from ragged int64 token-hash arrays.

    Deliberately a per-document numpy loop: each document's (n_tokens × 64)
    bit matrix stays cache-resident. A batch-flattened variant
    (concatenate + np.add.reduceat segment sums) was measured 2–24× SLOWER
    at every chunk size — the flat bit matrix is memory-bandwidth-bound.
    Bit extraction uses ``np.unpackbits`` over the little-endian byte view
    (bit j of row i == ``(h_i >> j) & 1``): measured 2.8× faster than the
    broadcast shift-and-mask matrix, bit-identical output.
    """
    out = np.zeros(len(token_hashes), dtype=np.int64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for i, hs in enumerate(token_hashes):
        if hs is None or len(hs) == 0:
            continue
        arr = np.asarray(hs, dtype=np.int64)
        bits = np.unpackbits(
            arr.view(np.uint8).reshape(len(arr), 8), axis=1, bitorder="little"
        )
        votes = bits.sum(axis=0, dtype=np.int64) * 2 - len(arr)  # ±1 vote/bit
        out[i] = ((votes > 0).astype(np.uint64) * weights).sum().astype(np.int64)
    return out


@F.pandas_udf(T.LongType())
def simhash64(token_hashes: pd.Series) -> pd.Series:  # pragma: no cover
    """64-bit SimHash from an array<long> of token hashes (numpy bit-vote)."""
    return pd.Series(simhash64_batch(token_hashes.tolist()))


def token_hashes_col(tokens: Column, hash_mode: str = "xxhash64") -> Column:
    """array<long> of per-token hashes (native), input to simhash64.

    In ``md5`` mode the hashes are 60-bit, so the resulting SimHash has its
    top four bits always 0 — a valid 60-effective-bit SimHash, identical in
    both engines (that is the oracle mode; the scale path keeps xxhash64).
    """
    return F.transform(tokens, lambda t: h64_col(t, hash_mode))


def hamming64_col(a: Column, b: Column) -> Column:
    """Hamming distance between two int64 simhashes (native bit_count/xor)."""
    return F.bit_count(a.bitwiseXOR(b))
