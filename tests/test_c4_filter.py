"""C4-style line-level cleaning gate (Raffel et al. 2020 §2.2)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_c4_line_filter_rules(spark):
    from hyped_spark.functions.text import c4_line_filter_col

    text = "\n".join(
        [
            "This line is a keeper.",          # kept
            "Is this one kept too?",           # kept (terminal ?)
            "no terminal punctuation here",    # dropped: no [.!?] ending
            "Too short.",                      # dropped: < 3 words
            "Please enable javascript today.", # dropped: boilerplate marker
            "We use cookie banners daily.",    # dropped: boilerplate marker
            "var x = { a: 1 };",               # dropped: brace
            "Trailing space is fine.  ",       # kept ([.!?]\\s*$)
        ]
    )
    df = spark.createDataFrame([(text,)], "text string")
    out = df.select(c4_line_filter_col(F.col("text")).alias("c")).first().c
    assert out.split("\n") == [
        "This line is a keeper.",
        "Is this one kept too?",
        "Trailing space is fine.  ",
    ]

    # all-dropped input collapses to the empty string, not NULL
    df2 = spark.createDataFrame([("nothing survives here",)], "text string")
    assert df2.select(c4_line_filter_col(F.col("text")).alias("c")).first().c == ""


def test_c4_line_filter_min_words_knob(spark):
    from hyped_spark.functions.text import c4_line_filter_col

    df = spark.createDataFrame([("One two.\nOne two three four.",)], "text string")
    out = df.select(
        c4_line_filter_col(F.col("text"), min_words=2).alias("c")
    ).first().c
    assert out == "One two.\nOne two three four."
