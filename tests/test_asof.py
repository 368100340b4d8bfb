"""As-of join directions and tolerance."""

from __future__ import annotations


LEFT = [(1, 10, "a"), (1, 20, "b"), (2, 5, "c"), (3, 7, "d")]
RIGHT = [(1, 10, 100), (1, 18, 101), (1, 25, 102), (2, 50, 103)]


def _frames(spark):
    l = spark.createDataFrame(LEFT, "k long, t long, tag string")
    r = spark.createDataFrame(RIGHT, "k long, t long, val long")
    return l, r


def test_asof_backward_inclusive(spark):
    from hyped_spark.operators.joins import asof_join

    l, r = _frames(spark)
    out = {row.tag: row.val
           for row in asof_join(l, r, on="t", by="k").collect()}
    # equal-ts right matches (t=10); key 2's only right is later -> NULL;
    # key 3 has no rights -> NULL
    assert out == {"a": 100, "b": 101, "c": None, "d": None}


def test_asof_forward_and_tolerance(spark):
    from hyped_spark.operators.joins import asof_join

    l, r = _frames(spark)
    fwd = {row.tag: row.val
           for row in asof_join(l, r, on="t", by="k",
                                direction="forward").collect()}
    assert fwd == {"a": 100, "b": 102, "c": 103, "d": None}

    # tolerance 5: key 2's next right is 45 ahead -> nulled; b's next is
    # exactly 5 ahead -> kept (inclusive)
    tol = {row.tag: row.val
           for row in asof_join(l, r, on="t", by="k", direction="forward",
                                tolerance="5").collect()}
    assert tol == {"a": 100, "b": 102, "c": None, "d": None}

    back_tol = {row.tag: row.val
                for row in asof_join(l, r, on="t", by="k",
                                     tolerance="1").collect()}
    assert back_tol == {"a": 100, "b": None, "c": None, "d": None}


def test_asof_bad_direction(spark):
    import pytest

    from hyped_spark.operators.joins import asof_join

    l, r = _frames(spark)
    with pytest.raises(ValueError):
        asof_join(l, r, on="t", by="k", direction="nearest")


def test_asof_single_exchange(spark):
    from hyped_spark.operators.joins import asof_join

    import re

    l, r = _frames(spark)
    for d in ("backward", "forward"):
        plan = asof_join(l, r, on="t", by="k", direction=d,
                         tolerance="5")._jdf \
            .queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, d
        assert "Join" not in plan
