"""Python UDTF surface (SURVEY §2.10).

The reference's generator-``process`` extension point (reference
src/hyped/data/processors/base.py:371-415: one input example → any number
of output examples) maps to three Spark surfaces here; this module is the
SQL-callable one:

- native array ops + ``explode`` — the performance path
  (``operators/sequence.py``: everything stays in codegen);
- ``mapInPandas`` — the Arrow-batched python path;
- **Python UDTF** (this module) — a lateral-joinable table function for
  SQL users: ``SELECT d.doc_id, c.* FROM docs d, LATERAL chunk_text(d.text,
  8) c``.

UDTFs run row-at-a-time python — keep them off hot paths; they exist so a
SQL-first user can reach the generator semantics without leaving SQL.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_pos int, chunk_str string")
class ChunkText:
    """Whitespace-tokenize and emit fixed-size chunks (the SQL twin of
    operators/sequence.chunk_seq's size=stride case)."""

    def eval(self, text: str, size: int):  # pragma: no cover (executor)
        toks = (text or "").split()
        if not toks:
            return
        for pos, start in enumerate(range(0, len(toks), size)):
            yield pos, " ".join(toks[start:start + size])


@udtf(returnType="token string, idx int")
class ExplodeTokens:
    """One row per whitespace token with its position."""

    def eval(self, text: str):  # pragma: no cover (executor)
        for i, tok in enumerate((text or "").split()):
            yield tok, i


def register_udtfs(spark: SparkSession) -> list[str]:
    """Register the UDTFs on a session; returns the registered names."""
    spark.udtf.register("chunk_text", ChunkText)
    spark.udtf.register("explode_tokens", ExplodeTokens)
    return ["chunk_text", "explode_tokens"]
