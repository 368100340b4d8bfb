"""Stateful cross-batch dedup (applyInPandasWithState) + Python UDTFs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_dedup_stream_first_seen_across_batches(spark, tmp_path):
    """First observation per key wins across micro-batches: duplicates in
    the same batch AND in later batches are suppressed; new keys pass."""
    from hyped_spark.streaming.stateful import dedup_stream

    src = tmp_path / "segs"
    src.mkdir()

    def seg(name, rows, mtime):
        p = str(src / name)
        spark.createDataFrame(rows, "k string, v long").coalesce(1) \
            .write.parquet(p)
        os.utime(p, (mtime, mtime))
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (mtime, mtime))

    seg("seg0", [("a", 1), ("a", 2), ("b", 10)], 1_000)          # a dup in-batch
    seg("seg1", [("a", 3), ("b", 11), ("c", 20)], 2_000)         # a,b cross-batch dups

    stream = (
        spark.readStream.schema("k string, v long")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src) + "/seg*")
    )
    q = (
        dedup_stream(stream, ["k"])
        .writeStream.format("memory").queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r.k: r.v for r in spark.sql("select * from dedup_out").collect()}
    # exactly one row per key, and it is the FIRST-batch value for a and b
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"] in (1, 2)   # within-batch order is not defined...
    assert rows["b"] == 10       # ...but cross-batch firstness is
    assert rows["c"] == 20
    n_all = spark.sql("select count(*) n from dedup_out").collect()[0].n
    assert n_all == 3


def test_udtf_lateral_join_matches_native(spark):
    """The SQL-callable UDTF chunker agrees with the native chunk_seq op."""
    from hyped_spark.functions.udtf_ops import register_udtfs
    from hyped_spark.operators.sequence import chunk_seq

    assert "chunk_text" in register_udtfs(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(50)
    docs.createOrReplaceTempView("udtf_docs")

    via_udtf = spark.sql("""
        SELECT d.doc_id, c.chunk_pos, c.chunk_str
        FROM udtf_docs d, LATERAL chunk_text(d.text, 8) c
    """)
    native = chunk_seq(
        docs.select("doc_id", F.split(F.col("text"), " ").alias("toks")),
        "toks", "chunk", chunk_size=8,
    ).select(
        "doc_id", F.col("chunk_pos"),
        F.array_join(F.col("chunk"), " ").alias("chunk_str"),
    )
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, native.collect()))
    assert a == b and a

    toks = spark.sql(
        "SELECT t.token, t.idx FROM (SELECT 'x y z' s) , LATERAL explode_tokens(s) t"
    ).collect()
    assert [(r.token, r.idx) for r in toks] == [("x", 0), ("y", 1), ("z", 2)]
