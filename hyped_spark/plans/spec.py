"""Declarative pipeline spec — the reimagined customization surface (F8).

The reference's extension point is a registry of pydantic-configured
processors serialized to/from JSON (/root/reference/src/hyped/base/
registry.py:45-269, config.py:22-145; pipelines round-trip via
``to_json``/``AutoConfig.from_json``). The Spark-native reimagining: a JSON
document describing  source → stages → (optional) CDC sink  that COMPILES to
a DataFrame program. Stages are looked up in an operator registry; each
registered operator is a ``params -> (DataFrame -> DataFrame)`` builder.

Prepare-time schema validation (the reference's ``prepare``/``map_features``
discipline, pipe.py:77-117) is ``probe_schema``: compile the stage chain
against an EMPTY DataFrame with the source schema — Catalyst analyzes the
whole plan without reading data, so schema errors surface before execution,
exactly like hyped's prepare step. Pure metadata: no IO, no jobs.

Example::

    spec = PipelineSpec.from_json(json_str)
    out_schema = spec.probe_schema(spark, in_schema)   # prepare-time check
    df = spec.compile(spark)                           # build the plan
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

Stage = Callable[[DataFrame], DataFrame]
Builder = Callable[[dict], Stage]

_REGISTRY: dict[str, Builder] = {}


def register(name: str) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        _REGISTRY[name] = fn
        return fn
    return deco


def registered_ops() -> list[str]:
    return sorted(_REGISTRY)


# ---------------------------------------------------------------------------
# built-in operator registry (each ≙ a SURVEY §2 operator)
# ---------------------------------------------------------------------------


@register("select")
def _select(p: dict) -> Stage:
    return lambda df: df.select(*p["columns"])


@register("drop")
def _drop(p: dict) -> Stage:
    from hyped_spark.operators.restructure import filter_features
    return lambda df: filter_features(df, remove=p["columns"])


@register("filter")
def _filter(p: dict) -> Stage:
    return lambda df: df.filter(p["condition"])


@register("with_column")
def _with_column(p: dict) -> Stage:
    return lambda df: df.withColumn(p["name"], F.expr(p["expr"]))


@register("format")
def _format(p: dict) -> Stage:
    from hyped_spark.operators.restructure import format_features
    return lambda df: format_features(
        df, {k: v for k, v in p["mapping"].items()},
        keep_input=p.get("keep_input", False),
    )


@register("flatten")
def _flatten(p: dict) -> Stage:
    from hyped_spark.operators.restructure import flatten_features
    return lambda df: flatten_features(df, delimiter=p.get("delimiter", ":"))


@register("sql")
def _sql(p: dict) -> Stage:
    def run(df: DataFrame) -> DataFrame:
        df.createOrReplaceTempView(p.get("view", "__pipe"))
        return df.sparkSession.sql(p["query"])
    return run


@register("lww_dedup")
def _lww(p: dict) -> Stage:
    from hyped_spark.operators.lww import lww_dedup_agg
    return lambda df: lww_dedup_agg(df, key=p["key"], ord_col=p["ord"])


@register("exact_dedup")
def _exact_dedup(p: dict) -> Stage:
    from hyped_spark.operators.dedup import exact_dedup
    return lambda df: exact_dedup(df, p.get("text_col", "text"), p.get("id_col", "doc_id"))


@register("minhash_dedup")
def _minhash_dedup(p: dict) -> Stage:
    from hyped_spark.operators.dedup import minhash_dedup
    return lambda df: minhash_dedup(
        df, p.get("text_col", "text"), p.get("id_col", "doc_id"),
        min_jaccard=p.get("min_jaccard", 0.8),
        strategy=p.get("strategy", "onepass"),
    )


@register("extract_text")
def _extract_text(p: dict) -> Stage:
    from hyped_spark.functions.text import extract_text
    src, out = p.get("html_col", "html"), p.get("out", "text")
    return lambda df: df.withColumn(out, extract_text(F.col(src)))


@register("lang_id")
def _lang_id(p: dict) -> Stage:
    from hyped_spark.functions.text import lang_id_col
    return lambda df: df.withColumn(p.get("out", "lang_guess"),
                                    lang_id_col(F.col(p.get("text_col", "text"))))


@register("quality_score")
def _quality(p: dict) -> Stage:
    from hyped_spark.functions.text import quality_score_col
    return lambda df: df.withColumn(p.get("out", "quality"),
                                    quality_score_col(F.col(p.get("text_col", "text"))))


@register("token_count")
def _token_count(p: dict) -> Stage:
    from hyped_spark.functions.text import token_count_col
    return lambda df: df.withColumn(p.get("out", "n_tokens"),
                                    token_count_col(F.col(p.get("text_col", "text"))))


@register("canonical_url")
def _canonical_url(p: dict) -> Stage:
    from hyped_spark.functions.url import canonical_url_col
    return lambda df: df.withColumn(
        p.get("out", p.get("url_col", "url")),
        canonical_url_col(F.col(p.get("url_col", "url"))),
    )


@register("normalize_text")
def _normalize_text(p: dict) -> Stage:
    from hyped_spark.functions.text import normalize_text_col
    return lambda df: df.withColumn(
        p.get("out", p.get("text_col", "text")),
        normalize_text_col(F.col(p.get("text_col", "text")),
                           nfc=p.get("nfc", True)),
    )


@register("fingerprint")
def _fingerprint(p: dict) -> Stage:
    from hyped_spark.functions.text import fingerprint_col
    return lambda df: df.withColumn(p.get("out", "fingerprint"),
                                    fingerprint_col(F.col(p.get("text_col", "text"))))


@register("chunk")
def _chunk(p: dict) -> Stage:
    from hyped_spark.operators.sequence import chunk_seq
    return lambda df: chunk_seq(
        df, p["col"], p.get("out", "chunk"), p["size"],
        p.get("stride"), p.get("drop_last", False),
    )


@register("relex")
def _relex(p: dict) -> Stage:
    from hyped_spark.operators.spans import relex_tag
    return lambda df: relex_tag(
        df, p["seq_col"], p["src_begin"], p["src_end"],
        p["tgt_begin"], p["tgt_end"], tuple(p["markers"]),
        out_col=p.get("out", "marked_sequence"),
        max_sequence_length=p.get("max_sequence_length"),
        source_inclusive=p.get("source_inclusive", False),
        target_inclusive=p.get("target_inclusive", False),
    )


@register("resolve_overlaps")
def _resolve_overlaps(p: dict) -> Stage:
    from hyped_spark.operators.spans import make_resolve_overlaps_udf
    udf = make_resolve_overlaps_udf(p.get("strategy", "approx"))
    return lambda df: df.withColumn(
        p.get("out", "kept_idx"), udf(F.col(p["begins"]), F.col(p["ends"]))
    )


@register("split_by_hash")
def _split_by_hash(p: dict) -> Stage:
    from hyped_spark.operators.curation import split_by_hash
    return lambda df: split_by_hash(
        df, p["key"], p["fractions"], out_col=p.get("out", "split"),
    )


@register("pack")
def _pack(p: dict) -> Stage:
    from hyped_spark.operators.curation import pack_offsets
    return lambda df: pack_offsets(
        df, p["len_col"], p.get("id_col", "doc_id"),
        chunk_tokens=p.get("chunk_tokens", 2048),
    )


@register("source_mixture")
def _source_mixture(p: dict) -> Stage:
    from hyped_spark.operators.curation import source_mixture_weights
    return lambda df: source_mixture_weights(
        df, p.get("source_col", "source"), alpha=p.get("alpha", 0.5),
        weight_col=p.get("out", "sample_weight"),
    )


@register("decontaminate")
def _decontaminate(p: dict) -> Stage:
    """Benchmark corpus referenced by path — the declarative form of the
    two-input operator (specs are single-input chains)."""
    from hyped_spark.operators.dedup import decontaminate

    def run(df: DataFrame) -> DataFrame:
        bench = getattr(df.sparkSession.read, p.get("format", "parquet"))(
            p["benchmark_path"]
        )
        return decontaminate(
            df, bench,
            text_col=p.get("text_col", "text"),
            id_col=p.get("id_col", "doc_id"),
            shingle_n=p.get("shingle_n", 13),
            mode=p.get("mode", "drop"),
        )
    return run


@register("repetition_metrics")
def _repetition_metrics(p: dict) -> Stage:
    from hyped_spark.functions.hashing import tokens_col
    from hyped_spark.functions.text import dup_line_frac_col, dup_ngram_frac_col

    ns = p.get("ns", [2, 3])

    def run(df: DataFrame) -> DataFrame:
        toks = tokens_col(F.col(p.get("text_col", "text")))
        for n in ns:
            df = df.withColumn(f"dup_{n}gram_frac", dup_ngram_frac_col(toks, n))
        return df.withColumn(
            "dup_line_frac", dup_line_frac_col(F.col(p.get("text_col", "text")))
        )
    return run


@register("frequent_items")
def _frequent_items(p: dict) -> Stage:
    from hyped_spark.operators.curation import frequent_items
    return lambda df: frequent_items(df, p["column"], p["support"],
                                     round_dp=p.get("round_dp", 6))


@register("weighted_sample")
def _weighted_sample(p: dict) -> Stage:
    from hyped_spark.operators.curation import weighted_sample
    return lambda df: weighted_sample(df, p["key"], p["weight"], p["k"],
                                      seed=p.get("seed", "ws"))


@register("stratified_sample")
def _stratified_sample(p: dict) -> Stage:
    from hyped_spark.operators.curation import stratified_sample
    return lambda df: stratified_sample(
        df, p["strata_col"], p["fractions"], key_col=p["key"],
        default_fraction=p.get("default_fraction", 0.0),
        seed=p.get("seed", 42), hash_mode=p.get("hash_mode", "md5"),
    )


@register("pii_scrub")
def _pii_scrub(p: dict) -> Stage:
    from hyped_spark.functions.text import pii_count_cols, pii_scrub_col

    def run(df: DataFrame) -> DataFrame:
        text = F.col(p.get("text_col", "text"))
        if p.get("counts", False):
            for name, c in pii_count_cols(text).items():
                df = df.withColumn(f"n_{name}", c)
        return df.withColumn(p.get("text_col", "text"), pii_scrub_col(text))
    return run


@register("cut_dup_spans")
def _cut_dup_spans(p: dict) -> Stage:
    from hyped_spark.operators.substrings import cut_duplicate_spans

    def run(df: DataFrame) -> DataFrame:
        out = cut_duplicate_spans(
            df, p.get("id_col", "doc_id"), p.get("text_col", "text"),
            n=p.get("n", 8), out_col="__clean",
        )
        return (
            df.drop(p.get("text_col", "text"))
            .join(out, p.get("id_col", "doc_id"))
            .withColumnRenamed("__clean", p.get("text_col", "text"))
        )
    return run


@register("c4_filter")
def _c4_filter(p: dict) -> Stage:
    from hyped_spark.functions.text import c4_line_filter_col
    col = p.get("text_col", "text")
    return lambda df: df.withColumn(
        col, c4_line_filter_col(F.col(col), min_words=p.get("min_words", 3))
    )


@register("sessionize")
def _sessionize(p: dict) -> Stage:
    from hyped_spark.operators.joins import sessionize
    return lambda df: sessionize(
        df, p["ts_col"], p["by"], gap=p.get("gap", "30 minutes")
    )


@register("bm25_topk")
def _bm25_topk(p: dict) -> Stage:
    from hyped_spark.operators.search import bm25_topk
    return lambda df: bm25_topk(
        df, p["query"], id_col=p.get("id_col", "doc_id"),
        text_col=p.get("text_col", "text"), k=p.get("k", 10),
        k1=p.get("k1", 1.2), b=p.get("b", 0.75),
    )


@register("lm_score")
def _lm_score(p: dict) -> Stage:
    from hyped_spark.operators.lm import fit_unigram_lm, lm_perplexity

    def run(df: DataFrame) -> DataFrame:
        id_col = p.get("id_col", "doc_id")
        text_col = p.get("text_col", "text")
        lm = fit_unigram_lm(df, text_col=text_col,
                            vocab_size=p.get("vocab_size", 65536),
                            alpha=p.get("alpha", 0.5))
        scores = lm_perplexity(df, lm, id_col=id_col, text_col=text_col)
        # the scores frame is corpus-keyed but NARROW (id + 3 numerics):
        # the join-back shuffles ids and scalars, never text
        out = df.join(
            scores.select(id_col, "cross_entropy", "perplexity"), id_col
        )
        if "max_ppl" in p:
            out = out.filter(F.col("perplexity") <= p["max_ppl"])
        return out
    return run


@register("z_order")
def _z_order(p: dict) -> Stage:
    from hyped_spark.lake.zorder import z_order_sort
    return lambda df: z_order_sort(
        df, p["columns"],
        bounds=[tuple(b) for b in p["bounds"]] if p.get("bounds") else None,
        bits=p.get("bits", 16), n_partitions=p.get("n"),
    )


@register("blocklist_filter")
def _blocklist_filter(p: dict) -> Stage:
    """Domain blocklist referenced by path (one ``domain`` column, any
    readable format) — the declarative form of the two-input operator,
    same pattern as ``decontaminate``."""
    from hyped_spark.operators.curation import filter_blocklisted_urls

    def run(df: DataFrame) -> DataFrame:
        reader = getattr(df.sparkSession.read, p.get("format", "parquet"))
        bl = reader(p["blocklist_path"])
        return filter_blocklisted_urls(
            df, bl,
            url_col=p.get("url_col", "url"),
            domain_col=p.get("domain_col", "domain"),
            mode=p.get("mode", "drop"),
        )
    return run


@register("cap_per_domain")
def _cap_per_domain(p: dict) -> Stage:
    from hyped_spark.operators.curation import cap_per_domain
    return lambda df: cap_per_domain(
        df, url_col=p.get("url_col", "url"), k=p.get("k", 100),
        order_col=p.get("order_col"), n_labels=p.get("n_labels", 2),
        hash_mode=p.get("hash_mode", "xxhash64"),
        domain_out=p.get("domain_out"),
    )


@register("linear_classifier")
def _linear_classifier(p: dict) -> Stage:
    """Hashed-BoW linear model scoring; weights inline in the spec (small
    models) or loaded from a single-column parquet/JSON artifact path."""
    from hyped_spark.operators.classify import linear_text_score

    def run(df: DataFrame) -> DataFrame:
        ws = p.get("weights")
        if ws is None:
            # artifact = (index, weight) columns; collect is model-sized
            wdf = getattr(df.sparkSession.read, p.get("format", "parquet"))(
                p["weights_path"]
            )
            ws = [r[1] for r in wdf.orderBy(wdf.columns[0]).collect()]
        return linear_text_score(
            df, ws, text_col=p.get("text_col", "text"),
            bias=p.get("bias", 0.0),
            hash_mode=p.get("hash_mode", "xxhash64"),
            out_col=p.get("out", "score"),
        )
    return run


@register("extract_blocks")
def _extract_blocks(p: dict) -> Stage:
    from hyped_spark.functions.text import extract_blocks_col
    col = p.get("text_col", "text")
    return lambda df: df.withColumn(
        p.get("out", col),
        extract_blocks_col(
            F.col(col),
            min_words=p.get("min_words", 10),
            max_upper_frac=p.get("max_upper_frac", 0.5),
            max_digit_frac=p.get("max_digit_frac", 0.3),
        ),
    )


@register("robots_filter")
def _robots_filter(p: dict) -> Stage:
    """Robots corpus referenced by path ((host, robots_txt) rows)."""
    from hyped_spark.operators.robots import parse_robots, robots_filter

    def run(df: DataFrame) -> DataFrame:
        reader = getattr(df.sparkSession.read, p.get("format", "parquet"))
        robots = reader(p["robots_path"])
        return robots_filter(
            df, parse_robots(robots),
            url_col=p.get("url_col", "url"),
            mode=p.get("mode", "drop"),
        )
    return run


@register("pagerank")
def _pagerank(p: dict) -> Stage:
    """Input frame = the (src, dst) edge list; output = (node, rank)."""
    from hyped_spark.operators.graphs import pagerank
    return lambda df: pagerank(
        df, src_col=p.get("src", "src"), dst_col=p.get("dst", "dst"),
        iters=p.get("iters", 5), damping=p.get("damping", 0.85),
        round_dp=p.get("round_dp", 8), rank_col=p.get("out", "rank"),
    )


@register("connected_components")
def _connected_components(p: dict) -> Stage:
    """Input frame = the (src, dst) edge list; output = (node, component).
    ``algorithm``: "propagation" (min-label, rounds = diameter — right for
    web host graphs) or "star" (large-star/small-star, O(log²) rounds —
    right for long-chain graphs)."""
    from hyped_spark.operators.graphs import (
        connected_components,
        connected_components_star,
    )

    algo = p.get("algorithm", "propagation")
    if algo not in ("propagation", "star"):
        raise ValueError(f"unknown connected-components algorithm {algo!r}")
    if algo == "star":
        return lambda df: connected_components_star(
            df, src_col=p.get("src", "src"), dst_col=p.get("dst", "dst"),
            max_rounds=p.get("max_rounds", 40),
        )
    return lambda df: connected_components(
        df, src_col=p.get("src", "src"), dst_col=p.get("dst", "dst"),
        iters=p.get("iters"), max_iters=p.get("max_iters", 50),
    )


@register("tfidf")
def _tfidf(p: dict) -> Stage:
    """Hashed TF-IDF sparse vectors: adds bucket-sorted idx/val arrays
    keyed by ``id_col`` (joins back onto the frame)."""
    from hyped_spark.operators.vectorize import tfidf_vectors

    def run(df: DataFrame) -> DataFrame:
        idc = p.get("id_col", "doc_id")
        vecs = tfidf_vectors(
            df, id_col=idc, text_col=p.get("text_col", "text"),
            buckets=p.get("buckets", 1 << 18),
            hash_mode=p.get("hash_mode", "xxhash64"),
            normalize=p.get("normalize", False),
        )
        return df.join(vecs, idc)
    return run


@register("gopher_rules")
def _gopher_rules(p: dict) -> Stage:
    """Gopher quality rule bundle: adds the metric struct (``out``, default
    'gopher') and, with ``filter=True``, drops rows failing the composite
    keep verdict."""
    from hyped_spark.functions.text import gopher_rules_col

    kw = {k: p[k] for k in (
        "min_words", "max_words", "min_mean_word_len", "max_mean_word_len",
        "max_symbol_ratio", "max_bullet_frac", "max_ellipsis_frac",
        "min_alpha_word_frac", "min_stopwords") if k in p}

    def run(df: DataFrame) -> DataFrame:
        out = p.get("out", "gopher")
        df = df.withColumn(
            out, gopher_rules_col(F.col(p.get("text_col", "text")), **kw))
        if p.get("filter", False):
            df = df.filter(F.col(out)["keep"])
        return df
    return run


@register("bpe_encode")
def _bpe_encode(p: dict) -> Stage:
    """Encode text with learned BPE merges (operators/bpe.py): merges
    inline in the spec (``merges``: list of {lhs, rhs} dicts, rank order)
    or loaded from a (rank, lhs, rhs, ...) artifact path."""
    from hyped_spark.operators.bpe import bpe_apply

    def run(df: DataFrame) -> DataFrame:
        ms = p.get("merges")
        if ms is None:
            # artifact = (rank, lhs, rhs) columns; collect is model-sized
            mdf = getattr(df.sparkSession.read, p.get("format", "parquet"))(
                p["merges_path"]
            )
            ms = [r.asDict() for r in mdf.orderBy("rank").collect()]
        return bpe_apply(
            df, ms, text_col=p.get("text_col", "text"),
            out_col=p.get("out", "bpe_tokens"),
        )
    return run


@register("dsir_select")
def _dsir_select(p: dict) -> Stage:
    """DSIR importance resampling (operators/dsir.py): the pipeline frame
    is the raw pool; the target corpus is referenced by path (same
    convention as robots_filter). Keeps the ``k`` rows whose hashed-n-gram
    distribution best matches the target, ∝ exp(log p − log q)."""
    from hyped_spark.operators.dsir import dsir_select

    def run(df: DataFrame) -> DataFrame:
        reader = getattr(df.sparkSession.read, p.get("format", "parquet"))
        target = reader(p["target_path"])
        return dsir_select(
            target, df, k=p["k"],
            id_col=p.get("id_col", "doc_id"),
            text_col=p.get("text_col", "text"),
            buckets=p.get("buckets", 10_000),
            n_max=p.get("n_max", 2),
            alpha=p.get("alpha", 1.0),
            seed=p.get("seed", 42),
            hash_mode=p.get("hash_mode", "xxhash64"),
        )
    return run


@register("image_features")
def _image_features(p: dict) -> Stage:
    from hyped_spark.functions.multimodal import decode_image_features
    return lambda df: decode_image_features(
        df, blob_col=p.get("blob_col", "image"), out=p.get("out", "img"),
        fake=p.get("fake", False),
    )


@register("image_meta")
def _image_meta(p: dict) -> Stage:
    from hyped_spark.functions.multimodal import decode_image_meta
    return lambda df: decode_image_meta(
        df, blob_col=p.get("blob_col", "image"), out=p.get("out", "meta"),
    )


@register("resize_images")
def _resize_images(p: dict) -> Stage:
    from hyped_spark.functions.multimodal import resize_images
    return lambda df: resize_images(
        df, blob_col=p.get("blob_col", "image"), out=p.get("out", "resized"),
        width=p.get("width", 224), height=p.get("height", 224),
        fake=p.get("fake", False),
    )


@register("audio_features")
def _audio_features(p: dict) -> Stage:
    from hyped_spark.functions.multimodal import decode_audio_features
    return lambda df: decode_audio_features(
        df, blob_col=p.get("blob_col", "audio"), out=p.get("out", "a"),
        fake=p.get("fake", False),
    )


@register("video_meta")
def _video_meta(p: dict) -> Stage:
    from hyped_spark.functions.multimodal import decode_video_meta
    return lambda df: decode_video_meta(
        df, blob_col=p.get("blob_col", "video"), out=p.get("out", "meta"),
    )


@register("video_frames")
def _video_frames(p: dict) -> Stage:
    from hyped_spark.functions.multimodal import sample_video_frames
    return lambda df: sample_video_frames(
        df, blob_col=p.get("blob_col", "video"), out=p.get("out", "frames"),
        n_frames=p.get("n_frames", 4), fake=p.get("fake", False),
    )


@register("repartition")
def _repartition(p: dict) -> Stage:
    cols = [F.col(c) for c in p.get("columns", [])]
    n = p.get("n")
    if cols and n:
        return lambda df: df.repartition(n, *cols)
    if cols:
        return lambda df: df.repartition(*cols)
    return lambda df: df.repartition(n)


# ---------------------------------------------------------------------------
# spec dataclasses
# ---------------------------------------------------------------------------


@dataclass
class SourceSpec:
    format: str                      # parquet | json | csv
    path: str
    schema: dict | None = None       # StructType.jsonValue() form
    options: dict = field(default_factory=dict)

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.read
        if self.schema is not None:
            reader = reader.schema(T.StructType.fromJson(self.schema))
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return getattr(reader, self.format)(self.path)

    def spark_schema(self, spark: SparkSession) -> T.StructType:
        if self.schema is not None:
            return T.StructType.fromJson(self.schema)
        return self.load(spark).schema


@dataclass
class CdcSpec:
    """Declarative CDC sink: where the transformed change stream lands.

    The reimagined north-star surface: a JSON document fully describes a
    binlog→lakehouse ingest job (source + transform stages + this sink) and
    compiles to the ReplayEngine — the same way the reference's pydantic
    configs compile to a DataPipe."""

    table_path: str
    metrics_path: str
    key: str = "url"
    ord_col: str = "lsn"
    batch_lsns: int = 100_000
    n_buckets: int = 16
    derived_columns: bool = False


@dataclass
class PipelineSpec:
    """source → ordered stages → optional CDC sink; JSON-round-trippable;
    nestable (a stage may be another pipeline, ≙ DataPipe-in-DataPipe,
    reference pipe.py:39-61)."""

    source: SourceSpec | None
    stages: list[dict]               # [{"op": name, **params} | {"pipeline": [...]}]
    name: str = "pipeline"
    cdc: CdcSpec | None = None

    # -- (de)serialization ---------------------------------------------------

    def to_json(self) -> str:
        src = None if self.source is None else {
            "format": self.source.format, "path": self.source.path,
            "schema": self.source.schema, "options": self.source.options,
        }
        cdc = None if self.cdc is None else {
            "table_path": self.cdc.table_path,
            "metrics_path": self.cdc.metrics_path,
            "key": self.cdc.key, "ord_col": self.cdc.ord_col,
            "batch_lsns": self.cdc.batch_lsns, "n_buckets": self.cdc.n_buckets,
            "derived_columns": self.cdc.derived_columns,
        }
        return json.dumps({"name": self.name, "source": src,
                           "stages": self.stages, "cdc": cdc})

    @classmethod
    def from_json(cls, s: str) -> "PipelineSpec":
        d = json.loads(s)
        src = d.get("source")
        cdc = d.get("cdc")
        return cls(
            source=None if src is None else SourceSpec(
                format=src["format"], path=src["path"],
                schema=src.get("schema"), options=src.get("options") or {},
            ),
            stages=d["stages"],
            name=d.get("name", "pipeline"),
            cdc=None if cdc is None else CdcSpec(**cdc),
        )

    # -- CDC job --------------------------------------------------------------

    def run_cdc(self, spark: SparkSession):
        """Compile and RUN the declarative CDC ingest job: load the change
        log, apply the transform stages, replay into the snapshot table.
        Returns the ReplayEngine (table + metrics handles)."""
        from hyped_spark.plans.replay import ReplayConfig, ReplayEngine

        if self.cdc is None:
            raise ValueError("pipeline has no cdc sink spec")
        if self.source is None:
            raise ValueError("cdc pipeline needs a source")
        log = self.transform(self.source.load(spark))
        engine = ReplayEngine(spark, ReplayConfig(
            table_path=self.cdc.table_path,
            metrics_path=self.cdc.metrics_path,
            batch_lsns=self.cdc.batch_lsns,
            n_buckets=self.cdc.n_buckets,
            derived_columns=self.cdc.derived_columns,
            key=self.cdc.key,
            ord_col=self.cdc.ord_col,
        ))
        engine.replay(log)
        return engine

    # -- compile / prepare ----------------------------------------------------

    def _build_stage(self, stage: dict) -> Stage:
        if "pipeline" in stage:  # nested pipe
            inner = PipelineSpec(source=None, stages=stage["pipeline"])
            return inner.transform
        op = stage["op"]
        if op not in _REGISTRY:
            raise ValueError(
                f"unknown operator {op!r}; registered: {registered_ops()}"
            )
        params = {k: v for k, v in stage.items() if k != "op"}
        return _REGISTRY[op](params)

    def transform(self, df: DataFrame) -> DataFrame:
        for stage in self.stages:
            df = self._build_stage(stage)(df)
        return df

    def compile(self, spark: SparkSession) -> DataFrame:
        if self.source is None:
            raise ValueError("pipeline has no source; use transform(df)")
        return self.transform(self.source.load(spark))

    def probe_schema(self, spark: SparkSession,
                     in_schema: T.StructType | None = None) -> T.StructType:
        """Prepare-time schema propagation: run the stage chain over an empty
        DataFrame — Catalyst analyzes without executing (no IO, no jobs).
        Schema errors raise HERE, mirroring hyped's prepare()."""
        if in_schema is None:
            if self.source is None:
                raise ValueError("need in_schema when pipeline has no source")
            in_schema = self.source.spark_schema(spark)
        empty = spark.createDataFrame([], in_schema)
        return self.transform(empty).schema
