"""Gopher rule-set operators (text.gopher_repetition /
text.gopher_quality_rules): planted spam/boilerplate documents must trip
exactly the rules they violate, clean prose must pass, and the ppm math
must be exact integer arithmetic (Rae et al. 2021, Table A1)."""

from __future__ import annotations

from redshift_to_pendo_api_data_pipeline_spark.operators.text import (
    gopher_quality_rules,
    gopher_repetition,
)

CLEAN = (
    "the quick brown fox jumps over one lazy dog and then walks back "
    "to the old stone house while seven other animals watch from afar "
    "with great interest because nothing else ever happens around here "
    "on quiet days like this one when everyone simply rests and waits"
)


def test_gopher_repetition_flags_spam(spark):
    # doc 1: clean prose; doc 2: one bigram repeated wall-to-wall;
    # doc 3: a long 10-word phrase duplicated (the ExactSubstr shape
    # fixed-k cover under-measures, dup10 catches)
    spam = "buy now " * 40
    phrase = "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    dup10 = phrase * 3 + CLEAN
    df = spark.createDataFrame(
        [(1, CLEAN), (2, spam.strip()), (3, dup10.strip())],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_repetition(df).collect()}
    assert rows[1]["passes_repetition"] == 1
    # spam: the top bigram ("buy now", 40 of 79 positions, 7 chars of
    # 319) covers ~88% of characters
    assert rows[2]["top2_char_ppm"] > 800_000
    assert rows[2]["passes_repetition"] == 0
    # duplicated 10-gram: dup10 coverage is high, clean doc's is 0
    assert rows[3]["dup10_char_ppm"] > 200_000
    assert rows[1]["dup10_char_ppm"] == 0
    assert rows[3]["passes_repetition"] == 0


def test_gopher_repetition_ppm_exact(spark):
    # 4 words, "a b" twice: top2 covers cnt=2 * len=3 chars of 7 total
    df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    r = gopher_repetition(df).collect()[0]
    assert r["top2_char_ppm"] == (1_000_000 * 2 * 3) // 7
    # 3 bigram positions: "a b","b a","a b" -> dup chars 2*3 of 7
    assert r["top3_char_ppm"] == (1_000_000 * 1 * 5) // 7


def test_gopher_quality_rules_flags(spark):
    short = "tiny doc"
    no_alpha = " ".join(["123"] * 60)
    symbols = ("the be to of " + "# " * 30) + " ".join(["word"] * 30)
    clean = " ".join([CLEAN] * 2)  # >50 words, stopwords present
    df = spark.createDataFrame(
        [(1, clean), (2, short), (3, no_alpha), (4, symbols)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_quality_rules(df).collect()}
    assert rows[1]["keep"] == 1
    assert rows[2]["r_word_count"] == 0 and rows[2]["keep"] == 0
    assert rows[3]["r_alpha_words"] == 0 and rows[3]["r_stopwords"] == 0
    assert rows[4]["r_symbol_ratio"] == 0
    # exact fixed-point means: clean doc mean word length in [3,10]
    assert 300 <= rows[1]["mean_word_chars_x100"] <= 1000


def test_gopher_quality_rules_zero_shuffle(spark):
    df = spark.createDataFrame([(1, CLEAN)], "doc_id long, text string")
    plan = gopher_quality_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
