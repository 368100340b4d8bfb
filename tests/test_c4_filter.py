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


def test_extract_blocks_density_rules(spark):
    """jusText-style block gate: short, shouting, and digit-heavy blocks
    drop whole; dense mixed-case paragraphs survive; survivors rejoin
    with blank lines in order."""
    from hyped_spark.functions.text import extract_blocks_col

    good1 = "this is a long paragraph with quite a few words in it to keep"
    good2 = "another dense paragraph that certainly has more than ten words inside"
    rows = [
        (0, "MENU HOME ABOUT\n\n" + good1 + "\n\n12 34 56 78 90 12 34 56 78 90 11 22"),
        (1, good1 + "\n\n" + good2),
        (2, "ALL CAPS SHOUTING BLOCK WITH MANY WORDS BUT STILL SHOUTING LOUDLY FOREVER HERE"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.c for r in df.select(
        "id", extract_blocks_col(F.col("text")).alias("c")).collect()}
    assert got[0] == good1
    assert got[1] == good1 + "\n\n" + good2
    assert got[2] == ""   # >= 10 words but uppercase fraction 1.0
    assert got[3] == ""


def test_extract_blocks_spec_stage(spark):
    from hyped_spark.plans.spec import _REGISTRY

    df = spark.createDataFrame(
        [(1, "NAV NAV NAV\n\none real paragraph with more than ten words in total here")],
        "id long, text string")
    out = _REGISTRY["extract_blocks"]({})(df)
    assert out.collect()[0].text.startswith("one real")
