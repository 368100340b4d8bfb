"""Text functions: HTML→text extraction, language id, quality, fingerprint.

Design rules (BASELINE.json ``input_hint``):

- No per-row Python UDFs. Heavy byte-payload work (HTML→text) runs as an
  Arrow-vectorized ``pandas_udf``; everything that CAN be a native Catalyst
  expression (token counts, quality ratios, language scoring, fingerprints)
  IS one, so it stays inside whole-stage codegen.
- ``extract_text_series`` is a *pure* function of the input bytes — no
  locale, env, or ordering dependence — so the distributed UDF and the
  single-threaded replay oracle (tests/replayer.py) produce byte-identical
  output per url. This mirrors the reference's batch-vectorized processor
  override pattern (``internal_batch_process``,
  /root/reference/src/hyped/data/processors/base.py:466-532) with the
  tokenizer as the model heavy transform
  (/root/reference/src/hyped/data/processors/tokenizers/hf.py:404-441).
"""

from __future__ import annotations

import html as _htmllib
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# HTML → text extraction (the deterministic kernel)
# ---------------------------------------------------------------------------

_RE_SCRIPT = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_RE_COMMENT = re.compile(r"(?s)<!--.*?-->")
_RE_BLOCK = re.compile(
    r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article|header"
    r"|footer|blockquote|pre|title)\b[^>]*>"
)
_RE_TAG = re.compile(r"(?s)<[^>]+>")
_RE_WS = re.compile(r"[ \t\r\f\v]+")
_RE_NL = re.compile(r"\n{2,}")


def extract_text_bytes(b: bytes | None) -> str | None:
    """Deterministic plain-text extraction from HTML bytes.

    Pure function: utf-8 decode (replace) → drop script/style/comments →
    block tags become newlines → strip remaining tags → unescape entities →
    collapse whitespace. No locale or environment dependence.
    """
    if b is None:
        return None
    s = b.decode("utf-8", "replace")
    s = _RE_SCRIPT.sub(" ", s)
    s = _RE_COMMENT.sub(" ", s)
    s = _RE_BLOCK.sub("\n", s)
    s = _RE_TAG.sub(" ", s)
    s = _htmllib.unescape(s)
    s = _RE_WS.sub(" ", s)
    lines = [ln.strip() for ln in s.split("\n")]
    s = "\n".join(ln for ln in lines if ln)
    return s


def extract_text_series(s: pd.Series) -> pd.Series:
    """Vectorized wrapper over ``extract_text_bytes`` for a bytes Series."""
    return s.map(extract_text_bytes)


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:  # pragma: no cover (runs on executors)
    return extract_text_series(html)


@F.pandas_udf(T.StringType())
def extract_text_if_missing(html: pd.Series, text: pd.Series) -> pd.Series:  # pragma: no cover
    """Fill ``text`` from ``html`` only where missing — lets the merge apply
    extraction to a mixed frame (fresh change rows need it, carried-forward
    current rows already have it) in one Arrow pass with no wasted compute."""
    mask = text.isna() & html.notna()
    out = text.copy()
    out[mask] = html[mask].map(extract_text_bytes)
    return out


# ---------------------------------------------------------------------------
# Native (codegen'd) text-analysis column builders
# ---------------------------------------------------------------------------

# Small fixed stopword inventories per language for the n-gram/stopword
# heuristic language id. Deliberately tiny: language id here is a scoring
# heuristic, not a model — see SURVEY.md §2 (training-pipeline extensions).
_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "für", "von"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "pour", "que", "une"],
    "es": ["el", "los", "las", "es", "en", "por", "para", "con", "una", "del"],
    "it": ["il", "di", "che", "per", "con", "non", "una", "sono", "della", "gli"],
}


def _stopword_regex(words: list[str]) -> str:
    return r"(?i)\b(" + "|".join(words) + r")\b"


def lang_score_cols(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts, all native ``regexp_count``."""
    return {
        lang: F.regexp_count(text, F.lit(_stopword_regex(words)))
        for lang, words in _STOPWORDS.items()
    }


def lang_id_col(text: Column) -> Column:
    """Argmax language by stopword count; 'und' (undetermined) when no hits.

    Implemented as a native expression: build array<struct<score,neg_idx>>,
    take ``array_max`` (struct ordering = lexicographic) — stays in codegen,
    no UDF, no shuffle.
    """
    scores = lang_score_cols(text)
    langs = list(scores)
    packed = F.array(
        *[
            F.struct(
                scores[lang].alias("score"),
                F.lit(-i).alias("neg_idx"),  # tie-break: earlier language wins
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    best = F.array_max(packed)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def token_count_col(text: Column) -> Column:
    """Whitespace-ish token count, native. BPE-ish sub-token estimate is
    ``bpe_token_estimate_col``."""
    return F.size(F.split(F.trim(text), r"\s+")) - F.when(
        F.length(F.trim(text)) == 0, F.lit(1)
    ).otherwise(F.lit(0))


def bpe_token_estimate_col(text: Column) -> Column:
    """BPE-ish token estimate: words + punctuation + digit runs counted via a
    GPT-2-style pre-tokenizer regex, fully native (``regexp_count``)."""
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"))


def quality_score_col(text: Column) -> Column:
    """Heuristic document quality in [0,1]: blend of length, alpha ratio,
    punctuation ratio and stopword density. Native expressions only."""
    n = F.length(text)
    n_safe = F.greatest(n, F.lit(1))
    alpha_ratio = F.regexp_count(text, F.lit(r"[A-Za-z]")) / n_safe
    punct_ratio = F.regexp_count(text, F.lit(r"[^\w\s]")) / n_safe
    words = token_count_col(text)
    stop_hits = F.regexp_count(text, F.lit(_stopword_regex(_STOPWORDS["en"])))
    stop_density = stop_hits / F.greatest(words, F.lit(1))
    length_score = F.least(n / F.lit(1000.0), F.lit(1.0))
    return F.round(
        F.lit(0.25) * length_score
        + F.lit(0.35) * alpha_ratio
        + F.lit(0.25) * F.least(stop_density * 4, F.lit(1.0))
        + F.lit(0.15) * (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))),
        4,
    )


def dup_ngram_frac_col(tokens: Column, n: int, hashed: bool = False) -> Column:
    """Fraction of duplicated word n-grams within one document — the
    Gopher-style repetition signal (high values flag boilerplate/spam).
    0.0 for documents shorter than n tokens.

    ``hashed=False`` (oracle mode): pure native string grams — trivially
    mirrored in SQL. ``hashed=True`` (scale mode): each token string is
    hashed ONCE (``transform`` + ``xxhash64``), then gram hashes fold
    pairwise with ``zip_with`` over shifted slices of the hash array —
    no gram string is ever built, per-gram work is long-hash arithmetic,
    and ``array_distinct`` compares 8-byte longs. Same value modulo
    2^-64 collisions (a collision merges two distinct grams); measured
    6× faster than string grams at sf0.1 (the earlier per-gram
    multi-arg-xxhash64-over-strings variant re-hashed every token n
    times and only bought 1.6×)."""
    size = F.size(tokens)
    if hashed:
        th = F.transform(tokens, lambda t: F.xxhash64(t))
        grams = th
        for j in range(1, n):
            grams = F.zip_with(
                grams,
                F.slice(th, j + 1, F.greatest(size - j, F.lit(0))),
                lambda a, b: F.xxhash64(a, b),
            )
        # zip_with pads to the longer side; only the first size-(n-1)
        # entries are complete n-grams
        grams = F.slice(grams, 1, F.greatest(size - (n - 1), F.lit(0)))
        total = F.when(size >= n, size - n + 1).otherwise(F.lit(0))
    else:
        idx = F.sequence(F.lit(0), F.greatest(size - n, F.lit(0)), F.lit(1))
        grams = F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n))
        )
        total = F.when(size >= n, F.size(grams)).otherwise(F.lit(0))
    distinct = F.size(F.array_distinct(grams))
    return F.when(
        total > 0, F.round(F.lit(1.0) - distinct / total, 6)
    ).otherwise(F.lit(0.0))


def dup_line_frac_col(text: Column) -> Column:
    """Fraction of duplicated non-empty lines within one document."""
    lines = F.filter(F.split(text, "\n"), lambda x: F.length(x) > 0)
    total = F.size(lines)
    return F.when(
        total > 0,
        F.round(F.lit(1.0) - F.size(F.array_distinct(lines)) / total, 6),
    ).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# PII redaction (native regexp — CCNet/Dolma-style pre-training scrub)
# ---------------------------------------------------------------------------

# Ordered (name, pattern, replacement). Order matters: emails are scrubbed
# first so digit/dot runs inside a local-part can't be half-eaten by the IP
# rule. Patterns are deliberately restricted to syntax that means the same
# thing in Java regex (Spark) and RE2 (DuckDB) — no backrefs, no lookaround,
# no possessive quantifiers — so the SQL oracle replays the scrub
# byte-for-byte.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
]


def pii_count_cols(text: Column) -> dict[str, Column]:
    """Per-category PII hit counts (native ``regexp_count``), measured on
    the RAW text (before any scrubbing)."""
    return {
        name: F.regexp_count(text, F.lit(pat)) for name, pat, _ in PII_PATTERNS
    }


def pii_scrub_col(text: Column) -> Column:
    """Redact emails / IPv4s / phone numbers with typed placeholder tokens.

    A fold of native ``regexp_replace`` calls in ``PII_PATTERNS`` order —
    map-only, whole-stage-codegen'd, zero shuffle; the standard pre-training
    scrub applied by CCNet/Dolma-class web-text pipelines. (Reference
    parity: a row-level text transform in the processor taxonomy —
    /root/reference/src/hyped/data/processors/base.py map pattern — the
    reference ships no PII processor; this is a training-pipeline
    extension, SURVEY.md §2.)
    """
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_scrub_sql(expr: str) -> str:
    """DuckDB expression replaying :func:`pii_scrub_col` (RE2, 'g' flag)."""
    out = expr
    for _, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def pii_count_sql(expr: str, name: str) -> str:
    """DuckDB expression for one category's raw-text hit count."""
    pat = next(p for n, p, _ in PII_PATTERNS if n == name)
    return f"len(regexp_extract_all({expr}, '{pat}'))"


def c4_line_filter_col(text: Column, min_words: int = 3) -> Column:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    lines that end in terminal punctuation, have at least ``min_words``
    words, and carry no javascript/cookie/brace boilerplate markers;
    survivors re-join with newlines. One native higher-order filter —
    map-only, zero shuffle (the standard web-text line gate applied before
    document-level quality scoring)."""
    lines = F.split(text, "\n")
    kept = F.filter(
        lines,
        lambda ln: (
            ln.rlike(r"[.!?]\s*$")
            & (F.size(F.split(F.trim(ln), r"\s+")) >= min_words)
            & ~F.lower(ln).contains("javascript")
            & ~F.lower(ln).contains("cookie")
            & ~ln.contains("{")
        ),
    )
    return F.array_join(kept, "\n")


def c4_line_filter_sql(expr: str, min_words: int = 3) -> str:
    """DuckDB twin of :func:`c4_line_filter_col` (same rules, same
    empty-split quirks; empty survivor list coalesces to '' like Spark's
    array_join)."""
    return (
        "coalesce(array_to_string(list_filter("
        f"string_split({expr}, chr(10)), ln -> "
        r"regexp_matches(ln, '[.!?]\s*$') "
        f"AND len(regexp_split_to_array(trim(ln), '\\s+')) >= {min_words} "
        "AND NOT contains(lower(ln), 'javascript') "
        "AND NOT contains(lower(ln), 'cookie') "
        "AND NOT contains(ln, '{')), chr(10)), '')"
    )


def fingerprint_col(text: Column) -> Column:
    """64-bit content fingerprint of whitespace-normalized lowercase text.

    Native ``xxhash64`` — at 100 TB this is the cheap first-pass exact-dup
    key (hash-groupBy dedup) before any near-dup pass.
    """
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.xxhash64(normalized)


def normalize_text_col(text: Column, nfc: bool = True) -> Column:
    """Web-text normalization: Unicode NFC composition, control/format
    character removal (C0/C1/Cf → space), and whitespace collapse + trim —
    the canonicalization pass a crawl pipeline runs before hashing or
    tokenizing (mojibake-adjacent combining sequences otherwise defeat
    exact dedup: 'cafe'+U+0301 and precomposed 'café' hash differently).

    The control-strip and whitespace steps are native regexp (codegen);
    NFC has no Spark builtin, so ``nfc=True`` adds ONE Arrow-vectorized
    UDF (stdlib ``unicodedata``) — the only Python in the pass. Pure
    ASCII pipelines can set ``nfc=False`` for a fully native expression.
    DuckDB twin: :func:`normalize_text_sql` (``nfc_normalize`` + the same
    regexp chain) replays it exactly.
    """
    col = text
    if nfc:
        @F.pandas_udf(T.StringType())
        def _nfc(s: pd.Series) -> pd.Series:  # pragma: no cover (executor)
            import unicodedata

            return s.map(lambda x: None if x is None
                         else unicodedata.normalize("NFC", x))

        col = _nfc(col)
    col = F.regexp_replace(col, r"[\p{Cc}\p{Cf}]+", " ")
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def normalize_text_sql(expr: str, nfc: bool = True) -> str:
    """DuckDB twin of :func:`normalize_text_col`."""
    e = f"nfc_normalize({expr})" if nfc else expr
    e = f"regexp_replace({e}, '[\\p{{Cc}}\\p{{Cf}}]+', ' ', 'g')"
    return f"trim(regexp_replace({e}, '\\s+', ' ', 'g'))"


def extract_blocks_col(
    text: Column,
    min_words: int = 10,
    max_upper_frac: float = 0.5,
    max_digit_frac: float = 0.3,
) -> Column:
    """jusText/boilerpipe-style BLOCK-density main-content extraction:
    split on blank lines into paragraph blocks and keep the dense ones —
    at least ``min_words`` words, not shouting (uppercase fraction of
    letters ≤ ``max_upper_frac``: nav bars and buttons are CAPS-heavy),
    not numeric chrome (digit fraction ≤ ``max_digit_frac``: dates,
    counters, prices). Survivors re-join with blank lines.

    This is the PARAGRAPH-granularity sibling of :func:`c4_line_filter_col`
    (the line gate): jusText's insight is that boilerplate segments at
    block boundaries, so short/shouty/numeric BLOCKS drop whole. One
    native higher-order filter — map-only, zero shuffle, no UDF."""
    blocks = F.split(text, r"\n{2,}")

    def _keep(b: Column) -> Column:
        words = F.size(F.split(F.trim(b), r"\s+"))
        letters = F.length(F.regexp_replace(b, r"[^\p{L}]", ""))
        uppers = F.length(F.regexp_replace(b, r"[^\p{Lu}]", ""))
        digits = F.length(F.regexp_replace(b, r"[^0-9]", ""))
        chars = F.length(b)
        return (
            (words >= min_words)
            & (uppers <= F.greatest(letters, F.lit(1)) * max_upper_frac)
            & (digits <= F.greatest(chars, F.lit(1)) * max_digit_frac)
        )

    return F.array_join(F.filter(blocks, _keep), "\n\n")


def extract_blocks_sql(
    expr: str,
    min_words: int = 10,
    max_upper_frac: float = 0.5,
    max_digit_frac: float = 0.3,
) -> str:
    """DuckDB twin of :func:`extract_blocks_col`."""
    letters = r"length(regexp_replace(b, '[^\p{L}]', '', 'g'))"
    uppers = r"length(regexp_replace(b, '[^\p{Lu}]', '', 'g'))"
    digits = "length(regexp_replace(b, '[^0-9]', '', 'g'))"
    return (
        "coalesce(array_to_string(list_filter("
        f"regexp_split_to_array({expr}, '\\n{{2,}}'), b -> "
        f"len(regexp_split_to_array(trim(b), '\\s+')) >= {min_words} "
        f"AND {uppers} <= greatest({letters}, 1) * {max_upper_frac!r} "
        f"AND {digits} <= greatest(length(b), 1) * {max_digit_frac!r}), "
        "chr(10) || chr(10)), '')"
    )


def gopher_rules_col(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
) -> Column:
    """The Gopher document-quality rule bundle (Rae et al. 2021,
    arXiv:2112.11446 App. A1.1) as ONE native struct column — word-count
    bounds, mean word length, symbol-to-word ratio (#/ellipsis), bullet-
    and ellipsis-line fractions, alphabetic-word fraction, and the
    ≥2-of-8 stopword requirement — plus the composite ``keep`` verdict.
    (The repetition rules of App. A1.2 are :func:`dup_ngram_frac_col` /
    :func:`dup_line_frac_col`, deliberately separate: they need token
    arrays, these need only the raw string.)

    Entirely native expressions (HOF folds + regexp counts), map-only;
    the displayed fractions are rounded to 4 dp, the ``keep`` flag is
    computed from the UNROUNDED integer ratios so both engines decide
    identically. Empty documents fail the word-count bound.
    """
    # explicit whitespace class: Java's \s includes \x0B, RE2's does not —
    # spelling it out keeps the DuckDB twin bit-exact on pasted-PDF text
    words = F.filter(
        F.split(text, "[ \\t\\n\\x0B\\f\\r]+"),
        lambda w: F.length(w) > 0,
    )
    n_words = F.size(words)
    nw_safe = F.greatest(n_words, F.lit(1))
    mean_wl = (
        F.aggregate(words, F.lit(0).cast("long"),
                    lambda acc, w: acc + F.length(w))
        / nw_safe
    )
    alpha_frac = (
        F.size(F.filter(words,
                        lambda w: F.regexp_count(w, F.lit("[A-Za-z]")) > 0))
        / nw_safe
    )
    sym_ratio = (
        F.regexp_count(text, F.lit(r"#|\.\.\.|…")) / nw_safe
    )
    lines = F.filter(F.split(text, "\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = (
        F.size(F.filter(
            lines,
            lambda l: F.regexp_count(
                l, F.lit("^[ \\t\\x0B\\f\\r]*[•\\-\\*‣▪]")) > 0))
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(
            lines,
            lambda l: F.regexp_count(
                l, F.lit("(\\.\\.\\.|…)[ \\t\\x0B\\f\\r]*$")) > 0))
        / n_lines
    )
    low = F.lower(text)
    n_stop = sum(
        (F.regexp_count(low, F.lit(rf"\b{w}\b")) > 0).cast("int")
        for w in ("the", "be", "to", "of", "and", "that", "have", "with")
    )
    keep = (
        (n_words >= min_words) & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
        & (sym_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_word_frac)
        & (n_stop >= min_stopwords)
    )
    return F.struct(
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(alpha_frac, 4).alias("alpha_word_frac"),
        F.round(sym_ratio, 4).alias("symbol_word_ratio"),
        F.round(bullet_frac, 4).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 4).alias("ellipsis_line_frac"),
        n_stop.alias("n_stopwords_present"),
        keep.alias("keep"),
    )


def gopher_rules_sql(
    expr: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
) -> dict[str, str]:
    """DuckDB twins of the :func:`gopher_rules_col` struct fields, as a
    dict of bare scalar expressions (alias at the call site; DuckDB
    structs don't hash-compare cleanly, flat columns do)."""
    ws = "[ \\t\\n\\x0B\\f\\r]"  # explicit: RE2 \s lacks \x0B, Java has it
    words = (
        f"list_filter(regexp_split_to_array({expr}, '{ws}+'), "
        "w -> len(w) > 0)"
    )
    n_words = f"len({words})"
    nw_safe = f"greatest({n_words}, 1)"
    mean_wl = f"(coalesce(list_sum([len(w) FOR w IN {words}]), 0) / {nw_safe})"
    alpha_frac = (
        f"(len(list_filter({words}, w -> regexp_matches(w, '[A-Za-z]')))"
        f" / {nw_safe})"
    )
    sym_ratio = (
        f"(len(regexp_extract_all({expr}, '#|\\.\\.\\.|…')) / {nw_safe})"
    )
    lines = (
        f"list_filter(string_split({expr}, chr(10)), "
        "l -> len(trim(l)) > 0)"
    )
    n_lines = f"greatest(len({lines}), 1)"
    lws = "[ \\t\\x0B\\f\\r]"
    bullet_frac = (
        f"(len(list_filter({lines}, "
        f"l -> regexp_matches(l, '^{lws}*[•\\-\\*‣▪]'))) / {n_lines})"
    )
    ellipsis_frac = (
        f"(len(list_filter({lines}, "
        f"l -> regexp_matches(l, '(\\.\\.\\.|…){lws}*$'))) / {n_lines})"
    )
    n_stop = " + ".join(
        f"CAST(regexp_matches(lower({expr}), '\\b{w}\\b') AS INT)"
        for w in ("the", "be", "to", "of", "and", "that", "have", "with")
    )
    keep = (
        f"({n_words} >= {min_words} AND {n_words} <= {max_words}"
        f" AND {mean_wl} >= {min_mean_word_len!r}"
        f" AND {mean_wl} <= {max_mean_word_len!r}"
        f" AND {sym_ratio} <= {max_symbol_ratio!r}"
        f" AND {bullet_frac} <= {max_bullet_frac!r}"
        f" AND {ellipsis_frac} <= {max_ellipsis_frac!r}"
        f" AND {alpha_frac} >= {min_alpha_word_frac!r}"
        f" AND ({n_stop}) >= {min_stopwords})"
    )
    return {
        "n_words": n_words,
        "mean_word_len": f"round({mean_wl}, 4)",
        "alpha_word_frac": f"round({alpha_frac}, 4)",
        "symbol_word_ratio": f"round({sym_ratio}, 4)",
        "bullet_line_frac": f"round({bullet_frac}, 4)",
        "ellipsis_line_frac": f"round({ellipsis_frac}, 4)",
        "n_stopwords_present": f"({n_stop})",
        "keep": keep,
    }


def compression_ratio_udf():
    """Arrow-vectorized zlib compression ratio: ``len(deflate(utf8)) /
    len(utf8)`` at level 6 — the RedPajama/Dolma-style gibberish signal
    (highly repetitive or machine-generated text compresses far below
    natural prose; random noise compresses above it). Deterministic for a
    given zlib (the container pins one), but NOT SQL-expressible — so the
    op ships with unit-test evidence instead of a DuckDB oracle (same
    policy as the multimodal codecs). Empty/None text → None.

    Map-only: pandas_udf over the text column, stdlib zlib, no state.
    """
    import zlib

    @F.pandas_udf(T.DoubleType())
    def ratio(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            if not t:
                out.append(None)
                continue
            b = t.encode("utf-8")
            out.append(round(len(zlib.compress(b, 6)) / len(b), 6))
        return pd.Series(out, dtype="float64")

    return ratio
