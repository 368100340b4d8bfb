"""JSON parsing (reference R1/R2 analogues).

- ``typed_parse_col``   ≙ JsonParser (/root/reference/src/hyped/data/
  processors/parsers/json.py:17-98): schema-typed parse, native
  ``from_json`` (one Catalyst expression, no Python).
- ``repair_json_col``   ≙ RepairJsonParser (parsers/repair_json.py:18-86):
  lenient parse of malformed JSON. Native ``from_json`` first (PERMISSIVE →
  null on garbage); rows that fail get a vectorized repair pass (single
  quotes → double, trailing commas, unbalanced brackets) and a re-parse.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TRAILING_COMMA = re.compile(r",\s*([}\]])")
_SINGLE_QUOTED = re.compile(r"'([^']*)'")


def typed_parse_col(col: Column, schema: T.StructType | str) -> Column:
    return F.from_json(col, schema)


def repair_json_string(s: str | None) -> str | None:
    """Best-effort repair of common JSON malformations (pure function)."""
    if s is None:
        return None
    try:
        json.loads(s)
        return s
    except Exception:
        pass
    fixed = s.strip()
    fixed = _SINGLE_QUOTED.sub(lambda m: json.dumps(m.group(1)), fixed)
    fixed = _TRAILING_COMMA.sub(r"\1", fixed)
    # close unbalanced brackets in reverse nesting order (stack scan,
    # skipping string literals)
    stack: list[str] = []
    in_str = False
    esc = False
    for ch in fixed:
        if esc:
            esc = False
            continue
        if ch == "\\":
            esc = True
        elif ch == '"':
            in_str = not in_str
        elif not in_str:
            if ch in "{[":
                stack.append("}" if ch == "{" else "]")
            elif ch in "}]" and stack and stack[-1] == ch:
                stack.pop()
    fixed += "".join(reversed(stack))
    try:
        json.loads(fixed)
        return fixed
    except Exception:
        return None  # unrepairable


@F.pandas_udf(T.StringType())
def repair_json(s: pd.Series) -> pd.Series:  # pragma: no cover (executor)
    return s.map(repair_json_string)


def repair_json_col(col: Column, schema: T.StructType | str) -> Column:
    """Parse leniently through the repair pass.

    ``repair_json`` passes already-valid JSON through unchanged (one
    json.loads probe per row inside the Arrow batch), so this is a single
    UDF + one native ``from_json``. A ``when(from_json(col).isNotNull())``
    fast path does NOT work: PERMISSIVE ``from_json`` yields an all-null
    struct — not NULL — for malformed input, so parse failure is
    undetectable at the column level."""
    return F.from_json(repair_json(col), schema)
