"""Template rendering (reference R7, Jinja2 processor analogue).

The reference renders a jinja2 template per row and discovers required
columns by probe-rendering against a schema-shaped dummy sample
(/root/reference/src/hyped/data/processors/templates/jinja2.py:83-279).

Spark-native mapping:
- ``required_fields``  : static discovery via string.Formatter parsing (for
  ``str.format``-style templates) or jinja2 AST (``meta.find_undeclared_
  variables``) when jinja2 is importable — no probe render needed.
- ``render_template_col``: native ``format_string`` when the template is a
  simple positional interpolation (stays in codegen), else an
  Arrow-vectorized pandas UDF applying the template per batch.
- jinja2 is optional (import-gated); the built-in engine is ``str.format``.
"""

from __future__ import annotations

import string
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - optional dependency
    import jinja2  # type: ignore
    from jinja2 import meta as jinja2_meta  # type: ignore
except ImportError:  # pragma: no cover
    jinja2 = None
    jinja2_meta = None


def required_fields(template: str, engine: str = "format") -> list[str]:
    """Columns the template references (prepare-time dependency discovery)."""
    if engine == "jinja2":
        if jinja2 is None:
            raise ImportError("jinja2 not installed in this environment")
        env = jinja2.Environment()
        return sorted(jinja2_meta.find_undeclared_variables(env.parse(template)))
    fields = set()
    for _, name, _, _ in string.Formatter().parse(template):
        if name:
            fields.add(name.split(".")[0].split("[")[0])
    return sorted(fields)


def render_template_col(df: DataFrame, template: str, out: str,
                        engine: str = "format") -> DataFrame:
    """Render ``template`` per row into column ``out``.

    Fast path: a plain ``{col}``-only format template compiles to native
    ``format_string`` (whole-stage codegen, no Python). Anything fancier
    (format specs, attribute access, jinja2) runs as a pandas UDF over the
    referenced columns only (column pruning still applies).
    """
    fields = required_fields(template, engine)
    missing = [c for c in fields if c not in df.columns]
    if missing:
        raise ValueError(f"template references missing columns: {missing}")

    if engine == "format":
        simple = all(
            spec in (None, "") and conv in (None, "")
            for _, name, spec, conv in string.Formatter().parse(template)
            if name is not None
        )
        if simple:
            fmt = template
            ordered = []
            for _, name, _, _ in string.Formatter().parse(template):
                if name is not None:
                    fmt = fmt.replace("{" + name + "}", "%s", 1)
                    ordered.append(name)
            return df.withColumn(out, F.format_string(fmt, *[F.col(c) for c in ordered]))

    if engine == "jinja2":
        tmpl_src = template

        # a struct argument reaches a pandas UDF as a pd.DataFrame of its
        # fields (NOT a Series of Rows) — same shape as the format path
        @F.pandas_udf(T.StringType())
        def render(batch: pd.DataFrame) -> pd.Series:  # pragma: no cover (executor)
            t = jinja2.Environment().from_string(tmpl_src)
            return pd.Series([t.render(**row) for row in batch.to_dict("records")])

        packed = F.struct(*[F.col(c) for c in fields])
        return df.withColumn(out, render(packed))

    tmpl = template

    # a struct argument reaches a pandas UDF as a pd.DataFrame of its fields
    @F.pandas_udf(T.StringType())
    def render_fmt(batch: pd.DataFrame) -> pd.Series:  # pragma: no cover (executor)
        return pd.Series([tmpl.format(**row) for row in batch.to_dict("records")])

    packed = F.struct(*[F.col(c) for c in fields])
    return df.withColumn(out, render_fmt(packed))
