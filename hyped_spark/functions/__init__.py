"""Vectorized column functions (Arrow / pandas-UDF) and native Column builders."""

from hyped_spark.functions.text import (  # noqa: F401
    extract_text,
    extract_text_series,
    lang_id_col,
    quality_score_col,
    token_count_col,
    fingerprint_col,
)
