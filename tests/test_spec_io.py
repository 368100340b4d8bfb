"""Pipeline spec (F8), typed IO (S2/S4/S5), templates (R7), JSON repair (R2),
multimodal plumbing."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import SF_DIR


# ---------------- pipeline spec ----------------


def test_pipeline_spec_roundtrip_and_compile(spark):
    from hyped_spark.plans.spec import PipelineSpec, SourceSpec

    spec = PipelineSpec(
        source=SourceSpec(format="parquet", path=f"{SF_DIR}/documents.parquet"),
        stages=[
            {"op": "filter", "condition": "n_chars > 100"},
            {"op": "token_count", "text_col": "text", "out": "n_tokens"},
            {"op": "quality_score", "text_col": "text", "out": "quality"},
            {"pipeline": [
                {"op": "with_column", "name": "long_doc", "expr": "n_tokens > 50"},
                {"op": "drop", "columns": ["source"]},
            ]},
            {"op": "select", "columns": ["doc_id", "n_tokens", "quality", "long_doc"]},
        ],
        name="doc_quality",
    )
    spec2 = PipelineSpec.from_json(spec.to_json())
    assert spec2.to_json() == spec.to_json()

    # prepare-time schema check: no jobs run, schema propagated
    out_schema = spec2.probe_schema(spark)
    assert [f.name for f in out_schema.fields] == ["doc_id", "n_tokens", "quality", "long_doc"]

    df = spec2.compile(spark)
    rows = df.collect()
    assert rows and all(r.n_tokens > 0 for r in rows)


def test_pipeline_spec_prepare_time_errors(spark):
    from hyped_spark.plans.spec import PipelineSpec, SourceSpec

    bad_op = PipelineSpec(source=None, stages=[{"op": "nope"}])
    with pytest.raises(ValueError, match="unknown operator"):
        bad_op.transform(spark.range(1))

    bad_col = PipelineSpec(
        source=SourceSpec(format="parquet", path=f"{SF_DIR}/documents.parquet"),
        stages=[{"op": "select", "columns": ["missing_col"]}],
    )
    with pytest.raises(Exception):  # Catalyst AnalysisException at probe time
        bad_col.probe_schema(spark)


def test_pipeline_spec_cdc_stages(spark):
    """The CDC kernel expressed as a declarative pipeline."""
    from hyped_spark.plans.spec import PipelineSpec
    from hyped_spark.sources.synthetic import binlog

    log = binlog(spark, 500, 50)
    spec = PipelineSpec(source=None, stages=[
        {"op": "lww_dedup", "key": "url", "ord": "lsn"},
        {"op": "extract_text", "html_col": "html", "out": "text"},
        {"op": "lang_id", "text_col": "text", "out": "lang_guess"},
    ])
    out = spec.transform(log)
    assert out.groupBy("url").count().agg(F.max("count")).collect()[0][0] == 1


def test_pipeline_spec_cdc_sink(spark, tmp_path):
    """A JSON document end-to-end: source + filter stage + CDC sink replays
    into a snapshot table identical to driving ReplayEngine directly."""
    from hyped_spark.plans.replay import ReplayConfig, ReplayEngine
    from hyped_spark.plans.spec import CdcSpec, PipelineSpec, SourceSpec
    from hyped_spark.sources.synthetic import binlog

    log_path = str(tmp_path / "log")
    binlog(spark, 800, 60).write.parquet(log_path)

    spec = PipelineSpec(
        source=SourceSpec(format="parquet", path=log_path),
        stages=[{"op": "filter", "condition": "op != 'noop'"}],
        cdc=CdcSpec(table_path=str(tmp_path / "t"),
                    metrics_path=str(tmp_path / "m"),
                    batch_lsns=300, n_buckets=8),
        name="cdc_job",
    )
    spec2 = PipelineSpec.from_json(spec.to_json())  # JSON round-trip
    assert spec2.to_json() == spec.to_json()
    engine = spec2.run_cdc(spark)

    direct = ReplayEngine(spark, ReplayConfig(
        table_path=str(tmp_path / "t2"), metrics_path=str(tmp_path / "m2"),
        batch_lsns=300, n_buckets=8))
    direct.replay(spark.read.parquet(log_path))

    a = engine.table.read().orderBy("url").toPandas()
    b = direct.table.read().orderBy("url").toPandas()
    assert a.equals(b)


def test_cdc_custom_key_and_ord(spark, tmp_path):
    """CdcSpec.key / ord_col must actually reach the engine (they were
    silently ignored): a log keyed doc_id/seq replays to the same state as
    the default url/lsn replay on the unrenamed log."""
    from hyped_spark.plans.replay import ReplayConfig, ReplayEngine
    from hyped_spark.plans.spec import CdcSpec, PipelineSpec, SourceSpec
    from hyped_spark.sources.synthetic import binlog

    log_path = str(tmp_path / "log")
    (binlog(spark, 600, 50)
     .withColumnRenamed("url", "doc_id")
     .withColumnRenamed("lsn", "seq")
     .write.parquet(log_path))

    spec = PipelineSpec(
        source=SourceSpec(format="parquet", path=log_path),
        stages=[],
        cdc=CdcSpec(table_path=str(tmp_path / "t"),
                    metrics_path=str(tmp_path / "m"),
                    key="doc_id", ord_col="seq",
                    batch_lsns=300, n_buckets=8),
    )
    engine = PipelineSpec.from_json(spec.to_json()).run_cdc(spark)
    got = engine.table.read()
    assert {"doc_id", "seq"} <= set(got.columns)

    direct = ReplayEngine(spark, ReplayConfig(
        table_path=str(tmp_path / "t2"), metrics_path=str(tmp_path / "m2"),
        batch_lsns=300, n_buckets=8))
    direct.replay(binlog(spark, 600, 50))
    a = (got.withColumnRenamed("doc_id", "url").withColumnRenamed("seq", "lsn")
         .orderBy("url").toPandas())
    b = direct.table.read().orderBy("url").toPandas()
    assert a.equals(b)


# ---------------- typed IO ----------------


def test_typed_json_reader(spark, tmp_path):
    from hyped_spark.sources.readers import typed_json

    p = str(tmp_path / "in.jsonl")
    with open(p, "w") as f:
        f.write('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    schema = T.StructType([
        T.StructField("a", T.LongType()), T.StructField("b", T.StringType())
    ])
    rows = typed_json(spark, p, schema).orderBy("a").collect()
    assert [(r.a, r.b) for r in rows] == [(1, "x"), (2, "y")]

    with open(p, "a") as f:
        f.write('{"a": "not_a_number", "b": "z"}\n')
    with pytest.raises(Exception):
        typed_json(spark, p, schema, strict=True).collect()
    lenient = typed_json(spark, p, schema, strict=False)
    rows = lenient.select("a", "b", "_corrupt_record").collect()
    assert sum(1 for r in rows if r["_corrupt_record"] is None) == 2
    # error channel: no cache needed (keeps data columns in the plan)
    from hyped_spark.sources.readers import corrupt_records

    bad = corrupt_records(lenient).collect()
    assert len(bad) == 1 and "not_a_number" in bad[0]["_corrupt_record"]
    # permissive read must NOT pin the dataset (round-1 scale bug)
    assert not lenient.is_cached


def test_writers_roundtrip(spark, tmp_path):
    from hyped_spark.sources.readers import typed_json
    from hyped_spark.sources.writers import write_csv, write_jsonl

    df = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    jdir = str(tmp_path / "j")
    write_jsonl(df, jdir, num_shards=2)
    assert os.path.exists(os.path.join(jdir, "_schema.json"))
    with open(os.path.join(jdir, "_schema.json")) as f:
        schema = T.StructType.fromJson(json.load(f))
    back = typed_json(spark, jdir, schema)
    assert back.count() == df.count()

    cdir = str(tmp_path / "c")
    write_csv(df, cdir, num_shards=1)
    back_csv = spark.read.option("header", "true").csv(cdir)
    assert back_csv.count() == df.count()

    nested = df.select(F.struct("n_name").alias("s"))
    with pytest.raises(ValueError, match="non-primitive"):
        write_csv(nested, str(tmp_path / "bad"))


# ---------------- templates ----------------


def test_template_required_fields_and_render(spark):
    from hyped_spark.functions.templates import render_template_col, required_fields

    assert required_fields("doc {doc_id} in {lang}: {text}") == ["doc_id", "lang", "text"]

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(5)
    out = render_template_col(d, "[{lang}] doc {doc_id}", "rendered")
    for r in out.collect():
        assert r.rendered == f"[{r.lang}] doc {r.doc_id}"

    # format-spec path goes through the pandas UDF
    out2 = render_template_col(d, "{n_chars:05d}", "padded")
    for r in out2.collect():
        assert r.padded == f"{r.n_chars:05d}"

    with pytest.raises(ValueError, match="missing columns"):
        render_template_col(d, "{nope}", "x")


# ---------------- JSON repair ----------------


def test_repair_json(spark):
    from hyped_spark.functions.json_tools import repair_json_col, repair_json_string

    assert repair_json_string("{'a': 1,}") == '{"a": 1}'
    assert repair_json_string('{"a": [1, 2') == '{"a": [1, 2]}'
    assert repair_json_string("total garbage {{{") is None

    df = spark.createDataFrame(
        [('{"k": 1}',), ("{'k': 2,}",), ("junk",)], "props string"
    )
    schema = T.StructType([T.StructField("k", T.LongType())])
    out = df.withColumn("p", repair_json_col(F.col("props"), schema))
    vals = [r.p.k if r.p else None for r in out.collect()]
    assert vals == [1, 2, None]


# ---------------- multimodal plumbing ----------------


def test_multimodal_plumbing(spark):
    from hyped_spark.functions.multimodal import (
        decode_image_features,
        resize_images,
        sample_video_frames,
    )

    df = spark.createDataFrame(
        [(1, b"imagebytes-1"), (2, b"imagebytes-2"), (3, None)],
        "id long, image binary",
    )
    feats = decode_image_features(df, "image", "img", fake=True).collect()
    by_id = {r.id: r.img for r in feats}
    assert by_id[3] is None
    assert 64 <= by_id[1].width < 256 and isinstance(by_id[1].phash, int)
    # determinism: same bytes -> same features
    again = {r.id: r.img for r in decode_image_features(df, "image", "img", fake=True).collect()}
    assert again == by_id

    resized = resize_images(df, "image", fake=True).collect()
    assert {len(r.resized) for r in resized if r.resized} == {128}

    vid = spark.createDataFrame([(1, b"videobytes")], "id long, video binary")
    frames = sample_video_frames(vid, "video", n_frames=3, fake=True).collect()[0].frames
    assert len(frames) == 3 and len(set(bytes(f) for f in frames)) == 3

    # the default is the REAL codec path, which must fail loudly in this
    # container — fake features require an explicit opt-in (fake=True)
    with pytest.raises(Exception, match="NotImplementedError|image"):
        decode_image_features(df, "image", "img").collect()


def test_process_graph(spark):
    """F7 ProcessGraph analogue: column-level dataflow with layers, built
    from prepare-time empty-DF analysis only (no jobs)."""
    from pyspark.sql import types as T

    from hyped_spark.plans.graph import build_graph
    from hyped_spark.plans.spec import PipelineSpec

    spec = PipelineSpec(source=None, stages=[
        {"op": "with_column", "name": "total", "expr": "price * qty"},
        {"op": "filter", "condition": "total > 10"},
        {"op": "select", "columns": ["id", "total"]},
    ])
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("qty", T.LongType()),
    ])
    g = build_graph(spark, spec, schema)

    by_label = {}
    for n in g.nodes:
        by_label.setdefault(n.label, []).append(n)
    stages = sorted((n for n in g.nodes if n.kind == "stage"),
                    key=lambda n: n.exec_index)
    assert [s.label for s in stages] == ["with_column", "filter", "select"]

    # with_column consumes price+qty from the inputs
    wc = stages[0]
    consumed = {f for s, d, feats in g.edges if d == wc.node_id for f in feats}
    assert consumed == {"price", "qty"}
    # filter consumes total, which with_column produced
    fl = stages[1]
    tot_edges = [(s, feats) for s, d, feats in g.edges if d == fl.node_id]
    assert tot_edges == [(wc.node_id, ["total"])]
    # layers = dataflow depth from feature producers (a pass-through stage
    # does not re-produce its inputs, matching the reference semantics):
    # select depends on id (layer 0) and total (produced at layer 1) -> 2
    assert wc.layer == 1 and fl.layer == 2 and stages[2].layer == 2
    outs = {n.label for n in g.nodes if n.kind == "output"}
    assert outs == {"id", "total"}
    assert g.num_layers >= 3 and g.max_width >= 3
    dot = g.to_dot()
    assert "digraph pipeline" in dot and '"with_column"' in dot


def test_curation_pipeline_as_declarative_spec(spark, tmp_path):
    """The curation stages compose as a pure JSON document: dedup-adjacent
    gates, decontamination-by-path, mixture weights, split, packing."""
    import json as _json

    from hyped_spark.plans.spec import PipelineSpec, SourceSpec

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench_path = str(tmp_path / "bench")
    docs.filter("doc_id % 97 = 0").write.parquet(bench_path)
    corpus_path = str(tmp_path / "corpus")
    docs.filter("doc_id % 97 != 0").write.parquet(corpus_path)

    spec = PipelineSpec(
        source=SourceSpec(format="parquet", path=corpus_path),
        stages=[
            {"op": "decontaminate", "benchmark_path": bench_path,
             "shingle_n": 3, "mode": "flag"},
            {"op": "repetition_metrics", "ns": [2]},
            {"op": "source_mixture", "alpha": 0.5},
            {"op": "split_by_hash", "key": "doc_id",
             "fractions": {"train": 0.9, "test": 0.1}},
            {"op": "with_column", "name": "n_tokens",
             "expr": "size(split(text, ' '))"},
            {"op": "pack", "len_col": "n_tokens", "chunk_tokens": 128},
        ],
        name="declarative_curation",
    )
    spec = PipelineSpec.from_json(spec.to_json())  # survives JSON round-trip
    assert _json.loads(spec.to_json())["stages"][0]["op"] == "decontaminate"

    out = spec.compile(spark)
    rows = out.collect()
    assert rows and set(out.columns) == {"doc_id", "chunk_id",
                                         "slice_begin", "slice_end"}
    # the manifest tiles the corpus token stream
    from pyspark.sql import functions as F
    total = (spark.read.parquet(corpus_path)
             .agg(F.sum(F.size(F.split("text", " ")))).collect()[0][0])
    assert sum(r.slice_end - r.slice_begin for r in rows) == total


def test_new_curation_stages_as_declarative_spec(spark):
    """Round-4 stages (pii_scrub, stratified_sample, cut_dup_spans) compose
    declaratively and survive the JSON round-trip."""
    from pyspark.sql import functions as F

    from hyped_spark.plans.spec import PipelineSpec

    spec = PipelineSpec(
        source=None,
        stages=[
            {"op": "pii_scrub", "counts": True},
            {"op": "stratified_sample", "strata_col": "source",
             "fractions": {"src0": 1.0, "src1": 0.5}, "key": "doc_id"},
            {"op": "cut_dup_spans", "n": 8},
        ],
        name="r4_stages",
    )
    spec = PipelineSpec.from_json(spec.to_json())

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    boiler = (" subscribe to our newsletter for the latest updates and"
              " offers today")
    df = (docs.withColumn(
            "text",
            F.when(F.col("doc_id") % 13 == 0,
                   F.concat("text", F.lit(boiler))).otherwise(F.col("text")))
          .withColumn(
            "text",
            F.concat("text", F.lit(" mail me at x"), F.col("doc_id"),
                     F.lit("@y.org"))))
    out = spec.transform(df)
    rows = out.collect()
    assert rows
    # only listed strata survive, emails scrubbed + counted, boiler cut
    assert {r.source for r in rows} <= {"src0", "src1"}
    assert all(r.n_email == 1 for r in rows)
    # the cut stage re-normalizes tokens (lowercase, punctuation-split), so
    # the <EMAIL> placeholder survives as the bare token "email" — except in
    # boilerplated docs, where "...today mail me at email" is itself part of
    # the shared (cut) suffix
    assert all("@" not in r.text for r in rows)
    assert all("email" in r.text.split()
               for r in rows if r.doc_id % 13 != 0)
    assert all("newsletter" not in r.text for r in rows)


def test_search_and_session_stages_as_declarative_spec(spark):
    """c4_filter, bm25_topk and sessionize register as declarative stages
    and survive the JSON round-trip."""
    import datetime as dt

    from pyspark.sql import functions as F

    from hyped_spark.plans.spec import PipelineSpec

    spec = PipelineSpec(
        source=None,
        stages=[
            {"op": "c4_filter", "min_words": 2},
            {"op": "bm25_topk", "query": "fast table", "k": 3},
        ],
        name="clean_then_search",
    )
    spec = PipelineSpec.from_json(spec.to_json())
    docs = spark.createDataFrame(
        [(1, "the fast table wins.\nclick to accept cookie policy."),
         (2, "a slow merge happens.\nfast fast table table scan here."),
         (3, "javascript required.")],
        "doc_id long, text string",
    )
    rows = spec.transform(docs).collect()
    # doc 3 loses its only line to the gate -> empty text -> zero score,
    # ranked last; docs 1 and 2 both match (relative order is BM25 length
    # normalization, not asserted)
    assert len(rows) == 3 and rows[-1].doc_id == 3 and rows[-1].score == 0.0
    assert {rows[0].doc_id, rows[1].doc_id} == {1, 2}
    assert rows[0].score >= rows[1].score > 0

    sess = PipelineSpec(
        source=None,
        stages=[{"op": "sessionize", "ts_col": "ts", "by": "uid",
                 "gap": "10 minutes"}],
        name="sessions",
    )
    sess = PipelineSpec.from_json(sess.to_json())
    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(7, base), (7, base + dt.timedelta(minutes=5)),
         (7, base + dt.timedelta(minutes=40))],
        "uid long, ts timestamp",
    )
    out = sorted((r.uid, r.n_events) for r in sess.transform(ev).collect())
    assert out == [(7, 1), (7, 2)]


def test_template_jinja2_engine(spark):
    """R7 jinja2 path (the container ships jinja2): AST-based field
    discovery and per-batch rendering with jinja2 semantics (filters,
    conditionals) — things the format engine can't express."""
    import pytest

    jinja2 = pytest.importorskip("jinja2")  # noqa: F841

    from hyped_spark.functions.templates import render_template_col, required_fields

    t = "{{ lang | upper }}:{% if n_chars > 40 %}long{% else %}short{% endif %}"
    assert required_fields(t, engine="jinja2") == ["lang", "n_chars"]

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    rows = render_template_col(d, t, "tagged", engine="jinja2").select(
        "doc_id", "lang", "n_chars", "tagged"
    ).collect()
    assert rows
    for r in rows:
        expect = f"{r.lang.upper()}:{'long' if r.n_chars > 40 else 'short'}"
        assert r.tagged == expect, (r.doc_id, r.tagged, expect)


def test_graph_render_svg(spark):
    """SVG rendering of the process graph (reference plot() analogue):
    valid XML, every node and edge drawn, layered left-to-right."""
    import xml.etree.ElementTree as ET

    from pyspark.sql import types as T

    from hyped_spark.plans.graph import build_graph
    from hyped_spark.plans.spec import PipelineSpec

    spec = PipelineSpec(source=None, stages=[
        {"op": "with_column", "name": "total", "expr": "price * qty"},
        {"op": "select", "columns": ["id", "total"]},
    ])
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("qty", T.LongType()),
    ])
    g = build_graph(spark, spec, schema)
    svg = g.render_svg()
    root = ET.fromstring(svg)  # well-formed XML
    ns = "{http://www.w3.org/2000/svg}"
    shapes = root.findall(f"{ns}rect") + root.findall(f"{ns}ellipse")
    # one background rect + one shape per node
    assert len(shapes) == len(g.nodes) + 1
    assert len(root.findall(f"{ns}line")) == len(g.edges)
    texts = [t.text for t in root.findall(f"{ns}text")]
    for n in g.nodes:
        assert n.label in texts


def test_multimodal_and_graph_spec_stages(spark):
    """The multimodal family and connected components are registered
    config ops: a JSON pipeline spec drives the REAL codecs end-to-end."""
    from hyped_spark.functions.multimodal import encode_avi, encode_png
    from hyped_spark.plans.spec import PipelineSpec
    import numpy as np

    img = encode_png(np.full((6, 4, 1), 99, dtype=np.uint8))
    avi = encode_avi([img, img, img], 4, 6, fps=10)
    df = spark.createDataFrame([(1, img, avi)],
                               "id long, image binary, video binary")

    spec = PipelineSpec(source=None, stages=[
        {"op": "image_meta", "blob_col": "image", "out": "imeta"},
        {"op": "resize_images", "blob_col": "image", "out": "small",
         "width": 2, "height": 2},
        {"op": "video_meta", "blob_col": "video", "out": "vmeta"},
        {"op": "video_frames", "blob_col": "video", "out": "frames",
         "n_frames": 2},
    ])
    spec2 = PipelineSpec.from_json(spec.to_json())
    row = spec2.transform(df).collect()[0]
    assert (row.imeta.format, row.imeta.width, row.imeta.height) == ("png", 4, 6)
    assert (row.vmeta.codec, row.vmeta.n_frames) == ("MPNG", 3)
    assert len(row.frames) == 2
    from hyped_spark.functions.multimodal import decode_png_pixels
    assert decode_png_pixels(bytes(row.small)).shape == (2, 2, 1)

    edges = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "src long, dst long")
    for algo in ("propagation", "star"):
        cc = PipelineSpec(source=None, stages=[
            {"op": "connected_components", "algorithm": algo},
        ]).transform(edges)
        labels = {r.node: r.component for r in cc.collect()}
        assert labels == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}
    with pytest.raises(ValueError, match="algorithm"):
        PipelineSpec(source=None, stages=[
            {"op": "connected_components", "algorithm": "bogus"},
        ]).transform(edges)


def test_cdc_with_gopher_gate_stage(spark, tmp_path):
    """Round-6 ops compose into the declarative CDC ingest: a Gopher
    quality gate runs as a transform stage BEFORE the merge (delete ops
    pass through — a content gate must never swallow tombstones), and the
    result equals a direct replay of the equivalently pre-filtered log."""
    from pyspark.sql import functions as F

    from hyped_spark.functions.text import gopher_rules_col
    from hyped_spark.plans.replay import ReplayConfig, ReplayEngine
    from hyped_spark.plans.spec import CdcSpec, PipelineSpec, SourceSpec
    from hyped_spark.sources.synthetic import binlog

    log_path = str(tmp_path / "log")
    binlog(spark, 800, 60).write.parquet(log_path)
    # synthetic html payloads run 60-230 markup words; a 100-word floor
    # splits the stream so the gate provably drops SOME change events
    kw = {"min_words": 100, "min_stopwords": 0, "min_mean_word_len": 1.0,
          "max_mean_word_len": 100.0}

    # the binlog carries html (text is derived inside replay), so the
    # pre-merge gate scores the raw payload string — composition is what
    # this test pins, not the gate's linguistic judgment
    spec = PipelineSpec(
        source=SourceSpec(format="parquet", path=log_path),
        stages=[
            {"op": "with_column", "name": "__txt",
             "expr": "CAST(html AS STRING)"},
            {"op": "gopher_rules", "text_col": "__txt", "out": "__g", **kw},
            {"op": "filter", "condition": "op = 'delete' OR __g.keep"},
            {"op": "drop", "columns": ["__g", "__txt"]},
        ],
        cdc=CdcSpec(table_path=str(tmp_path / "t"),
                    metrics_path=str(tmp_path / "m"),
                    batch_lsns=300, n_buckets=8),
        name="cdc_gated",
    )
    engine = PipelineSpec.from_json(spec.to_json()).run_cdc(spark)

    raw = spark.read.parquet(log_path)
    gated = raw.withColumn(
        "__g", gopher_rules_col(F.col("html").cast("string"), **kw)
    ).filter("op = 'delete' OR __g.keep").drop("__g")
    direct = ReplayEngine(spark, ReplayConfig(
        table_path=str(tmp_path / "t2"), metrics_path=str(tmp_path / "m2"),
        batch_lsns=300, n_buckets=8))
    direct.replay(gated)

    a = engine.table.read().orderBy("url").toPandas()
    b = direct.table.read().orderBy("url").toPandas()
    assert a.equals(b)
    # the gate must have actually dropped change events (short salad docs
    # fail the 3-word bound) while keeping every tombstone
    n_raw, n_gated = raw.count(), gated.count()
    assert n_gated < n_raw
    assert gated.filter("op = 'delete'").count() \
        == raw.filter("op = 'delete'").count()
