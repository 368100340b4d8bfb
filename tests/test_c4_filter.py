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


def test_gopher_rules_fixtures(spark):
    """Gopher rule bundle (Rae et al. 2021 App. A1.1): each rule tripped
    by a crafted document, the clean one keeps."""
    from hyped_spark.functions.text import gopher_rules_col

    clean = ("the quick brown fox jumps over that lazy dog and runs off "
             "with the bone to have some peace of mind for days") * 1
    rows = [
        (0, clean),                                   # keep
        (1, "short text"),                            # too few words
        (2, " ".join(["x"] * 30)),                    # mean word len 1 < 3
        (3, clean + " " + " ".join(["####"] * 10)),   # symbol ratio
        (4, "\n".join(f"• the item of {i} here and that" for i in range(19))
            + "\n" + clean),                          # >90% bullet lines
        (5, "\n".join([clean] + [f"to be continued {i}..." for i in
                                 range(3)])),         # ellipsis lines > 0.3
        (6, " ".join(["1234 5678"] * 15) + " the of"),  # alpha frac < 0.8
        (7, " ".join(["zorp glib flim blat"] * 8)),   # no stopwords
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r for r in df.select(
        "id", gopher_rules_col(F.col("text"), min_words=20).alias("g")
    ).select("id", "g.*").collect()}
    assert got[0]["keep"] is True
    assert got[0]["n_stopwords_present"] >= 5
    for i in range(1, 8):
        assert got[i]["keep"] is False, i
    assert got[2]["mean_word_len"] == 1.0
    # Gopher A1.1: the bullet rule trips only ABOVE 90% of lines
    assert got[4]["bullet_line_frac"] > 0.9
    assert got[5]["ellipsis_line_frac"] > 0.3
    assert got[6]["alpha_word_frac"] < 0.8
    assert got[7]["n_stopwords_present"] == 0


def test_gopher_rules_duckdb_twin(spark):
    """Every struct field bit-matches the SQL twin on the fixtures."""
    import duckdb

    from hyped_spark.functions.text import gopher_rules_col, gopher_rules_sql

    rows = [
        (0, "the quick brown fox and that dog have to be of use with it "
            "plus • a bullet\nand a line ending in..."),
        (1, ""),
        (2, "####\n• x\n…"),
        # \x0B between words: Java \s would split it, RE2 \s would not —
        # the explicit whitespace class keeps both engines identical
        (3, "alpha\x0bbeta the of and to be that have with more words"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = sorted(
        tuple(r) for r in df.select(
            "id", gopher_rules_col(F.col("text"), min_words=5).alias("g")
        ).select("id", "g.*").collect()
    )
    con = duckdb.connect()
    con.execute("SET threads=2")
    con.execute("CREATE TABLE t (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    fields = gopher_rules_sql("text", min_words=5)
    cols = ", ".join(f"{sql} AS {name}" for name, sql in fields.items())
    want = sorted(tuple(r) for r in
                  con.execute(f"SELECT id, {cols} FROM t").fetchall())
    assert got == want
