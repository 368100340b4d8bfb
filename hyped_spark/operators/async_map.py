"""Async per-row enrichment — the reference's coroutine processor slot.

Mirrors two reference components on Spark:

- the async batch processor (reference
  src/hyped/data/processors/base.py:340-369: ``process`` as a coroutine,
  batch = ``asyncio.gather``), re-expressed as ``mapInPandas`` with an
  asyncio event loop per partition;
- the OpenAI chat-completion processor's concurrency/rate-limit contract
  (src/hyped/data/processors/api/openai_chat.py:156-157, 231-237:
  ``max_concurrent_calls`` semaphore, ``rate_limit_max_retries`` with
  exponential backoff), re-expressed transport-agnostically.

The 100 TB shape: enrichment calls are IO-bound, so each executor slot
drives ``concurrency`` in-flight requests over its Arrow batch — total
cluster concurrency = slots × concurrency, throttled per-slot exactly like
the reference's per-process semaphore. Rows never leave their partition
(map-only, no shuffle); the DataFrame carries only the added columns.

This sandbox has no network: the real HTTP transport is INJECTED by the
caller (``handler_factory``), and :class:`FakeChatTransport` provides a
deterministic offline stand-in whose output is also SQL-expressible, so
the driver oracle can verify the whole pipeline end-to-end.
"""

from __future__ import annotations

import asyncio
import hashlib
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


class RetryableError(Exception):
    """Transient failure (the rate-limit case): the row is retried with
    exponential backoff up to ``max_retries`` times before giving up."""


def async_map_in_pandas(
    df: DataFrame,
    handler_factory: Callable[[], Callable[[dict], Any]],
    out_fields: list[T.StructField],
    concurrency: int = 16,
    max_retries: int = 3,
    backoff_base: float = 2.0,
    backoff_unit_s: float = 0.05,
) -> DataFrame:
    """Apply an async per-row handler, ``concurrency`` in flight per slot.

    ``handler_factory`` builds the handler ONCE per partition (the place to
    construct a client/transport); the handler is an ``async def
    handler(row: dict) -> dict`` returning values for ``out_fields``.
    ``RetryableError`` triggers backoff ``backoff_unit_s * base**attempt``
    then retry; other exceptions fail the task (Spark's retry machinery
    owns non-transient failures). Row order within each Arrow batch is
    preserved, so outputs align positionally with inputs.
    """
    out_schema = T.StructType(list(df.schema.fields) + list(out_fields))
    out_names = [f.name for f in out_fields]

    def run_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover (executor)
        handler = handler_factory()
        loop = asyncio.new_event_loop()
        try:
            sem = asyncio.Semaphore(concurrency)

            async def one(row: dict) -> dict:
                attempt = 0
                while True:
                    try:
                        async with sem:
                            return await handler(row)
                    except RetryableError:
                        if attempt >= max_retries:
                            raise
                        await asyncio.sleep(
                            backoff_unit_s * (backoff_base ** attempt)
                        )
                        attempt += 1

            async def batch(rows: list[dict]) -> list[dict]:
                return await asyncio.gather(*(one(r) for r in rows))

            for pdf in batches:
                outs = loop.run_until_complete(
                    batch(pdf.to_dict("records"))
                )
                res = pdf.copy()
                for name in out_names:
                    res[name] = [o[name] for o in outs]
                yield res
        finally:
            loop.close()

    return df.mapInPandas(run_partition, schema=out_schema)


# ---------------------------------------------------------------------------
# chat-completion stage (R9) — transport injected
# ---------------------------------------------------------------------------

COMPLETION_FIELDS = [
    T.StructField("completion", T.StringType()),
    T.StructField("n_attempts", T.IntegerType()),
]


def fake_completion(prompt: str, model: str = "fake-model") -> str:
    """The deterministic offline 'model': also expressible in SQL
    (``'model:' || md5(prompt)``) so the driver oracle covers the whole
    async pipeline."""
    return f"{model}:{hashlib.md5(prompt.encode()).hexdigest()}"


class FakeChatTransport:
    """Offline transport: deterministic completions, with an optional
    transient-failure schedule (every ``fail_every``-th request raises
    ``RetryableError`` once) to exercise the retry path."""

    def __init__(self, model: str = "fake-model", fail_every: int = 0):
        self.model = model
        self.fail_every = fail_every
        self._calls = 0
        self._failed: set[str] = set()

    async def __call__(self, row: dict) -> dict:
        self._calls += 1
        prompt = row["prompt"]
        attempts = 1
        if (
            self.fail_every
            and self._calls % self.fail_every == 0
            and prompt not in self._failed
        ):
            self._failed.add(prompt)
            raise RetryableError("simulated rate limit")
        if prompt in self._failed:
            attempts = 2
        return {
            "completion": fake_completion(prompt, self.model),
            "n_attempts": attempts,
        }


def chat_completion(
    df: DataFrame,
    prompt_col: str = "prompt",
    transport_factory: Callable[[], Callable[[dict], Any]] | None = None,
    concurrency: int = 16,
    max_retries: int = 3,
) -> DataFrame:
    """Per-row LLM chat completion over an injected async transport.

    The real network client is NOT constructible in this sandbox (offline);
    a cluster deployment passes ``transport_factory`` building its HTTP
    client per partition. Calling without one fails loud — the same
    declared-stub discipline as the multimodal codecs."""
    if transport_factory is None:
        raise NotImplementedError(
            "no network transport available in this environment — inject "
            "transport_factory (e.g. lambda: FakeChatTransport() for the "
            "deterministic offline fake)"
        )
    d = df.withColumnRenamed(prompt_col, "prompt") if prompt_col != "prompt" else df
    out = async_map_in_pandas(
        d, transport_factory, COMPLETION_FIELDS,
        concurrency=concurrency, max_retries=max_retries,
    )
    if prompt_col != "prompt":
        out = out.withColumnRenamed("prompt", prompt_col)
    return out
