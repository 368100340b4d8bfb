"""Hashed-BoW linear classifier inference (operators/classify.py)."""

from __future__ import annotations

import math

import pytest

from hyped_spark.operators.classify import linear_text_score


def _py_score(text, weights, bias, toks_of):
    toks = toks_of(text)
    if not toks:
        return 1.0 / (1.0 + math.exp(-bias))
    import hashlib

    s = 0.0
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        s += weights[h % len(weights)]
    z = bias + s / len(toks)
    return 1.0 / (1.0 + math.exp(-z))


def test_matches_python_reference(spark):
    import re

    ws = [math.sin(j) for j in range(97)]  # arbitrary fixed model
    rows = [
        (0, "The quick brown fox jumps"),
        (1, ""),
        (2, None),
        (3, "word " * 50),
        (4, "Ünïcode tökens split on ANY non-letter: 42!"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r.id: r.score
        for r in linear_text_score(df, ws, bias=-0.25, hash_mode="md5").collect()
    }

    def toks_of(text):
        if text is None:
            return []
        return [t for t in re.split(r"[^\w]+", text.lower(), flags=re.UNICODE) if t]

    for i, text in rows:
        assert out[i] == pytest.approx(_py_score(text, ws, -0.25, toks_of), abs=1e-12)


def test_empty_weights_raise(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        linear_text_score(df, [])


def test_plan_is_map_only(spark):
    import io
    from contextlib import redirect_stdout

    ws = [0.1] * 64
    df = spark.createDataFrame([(i, f"tok{i}") for i in range(10)],
                               "id long, text string")
    out = linear_text_score(df, ws)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # broadcast weights row + native fold only: no hash-partition
    # exchange, no Python eval (BroadcastExchange of the 1-row frame is
    # expected)
    assert "Exchange hashpartitioning" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_spec_stage_with_weights_artifact(spark, tmp_path):
    from hyped_spark.plans.spec import _REGISTRY

    ws = [float(j % 5 - 2) for j in range(32)]
    wpath = str(tmp_path / "w")
    spark.createDataFrame(
        [(j, w) for j, w in enumerate(ws)], "bucket int, weight double"
    ).write.parquet(wpath)
    df = spark.createDataFrame([(1, "alpha beta")], "id long, text string")
    via_path = _REGISTRY["linear_classifier"]({"weights_path": wpath})(df)
    inline = _REGISTRY["linear_classifier"]({"weights": ws})(df)
    assert via_path.collect()[0].score == inline.collect()[0].score
