"""Async per-row enrichment slot: gather semantics, retries, concurrency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_async_map_basic_and_order(spark):
    from hyped_spark.operators.async_map import async_map_in_pandas

    df = spark.createDataFrame([(i, f"w{i}") for i in range(50)],
                               "id long, word string")

    def factory():
        async def handler(row):
            return {"out": row["word"].upper()}
        return handler

    got = async_map_in_pandas(
        df, factory, [T.StructField("out", T.StringType())], concurrency=4
    ).collect()
    assert {(r.id, r.out) for r in got} == {(i, f"W{i}") for i in range(50)}
    # positional alignment: every row kept its own output
    assert all(r.out == r.word.upper() for r in got)


def test_async_map_concurrency_bound_and_overlap(spark):
    """In-flight calls never exceed the semaphore, and genuinely overlap
    (max observed in-flight > 1)."""
    from hyped_spark.operators.async_map import async_map_in_pandas

    df = spark.createDataFrame([(i,) for i in range(40)], "id long").repartition(1)

    def factory():
        import asyncio
        state = {"now": 0, "peak": 0}

        async def handler(row):
            state["now"] += 1
            state["peak"] = max(state["peak"], state["now"])
            await asyncio.sleep(0.01)
            state["now"] -= 1
            return {"peak": state["peak"]}
        return handler

    rows = async_map_in_pandas(
        df, factory, [T.StructField("peak", T.IntegerType())], concurrency=5
    ).collect()
    peak = max(r.peak for r in rows)
    assert 1 < peak <= 5, peak


def test_async_map_retries_then_fails(spark):
    from hyped_spark.operators.async_map import RetryableError, async_map_in_pandas

    df = spark.createDataFrame([(1,)], "id long")

    def flaky_factory():
        state = {"n": 0}

        async def handler(row):
            state["n"] += 1
            if state["n"] <= 2:          # fails twice, succeeds third
                raise RetryableError()
            return {"tries": state["n"]}
        return handler

    rows = async_map_in_pandas(
        df, flaky_factory, [T.StructField("tries", T.IntegerType())],
        max_retries=3, backoff_unit_s=0.001,
    ).collect()
    assert rows[0].tries == 3

    def dead_factory():
        async def handler(row):
            raise RetryableError("always")
        return handler

    with pytest.raises(Exception, match="always"):
        async_map_in_pandas(
            df, dead_factory, [T.StructField("x", T.IntegerType())],
            max_retries=1, backoff_unit_s=0.001,
        ).collect()


def test_chat_completion_fake_and_stub_discipline(spark):
    from hyped_spark.operators.async_map import (
        FakeChatTransport,
        chat_completion,
        fake_completion,
    )

    # one partition -> one transport, so the fail-every-2nd schedule fires
    df = spark.createDataFrame([(1, "hello"), (2, "world")],
                               "id long, prompt string").repartition(1)
    got = {r.id: r for r in chat_completion(
        df, transport_factory=lambda: FakeChatTransport(fail_every=2),
        max_retries=3,
    ).collect()}
    assert got[1].completion == fake_completion("hello")
    assert got[2].completion == fake_completion("world")
    # one of the two hit the simulated rate limit and retried
    assert {got[1].n_attempts, got[2].n_attempts} == {1, 2}

    with pytest.raises(NotImplementedError, match="transport"):
        chat_completion(df)
