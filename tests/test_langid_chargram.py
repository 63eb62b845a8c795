"""Cavnar-Trenkle char-n-gram language ID (text.charngram_profiles /
charngram_lang_id): profiles are a bounded deterministic rank relation,
classification handles a spaceless CJK script (the stopword lang_id
blind spot), and zero-overlap docs fall back to 'und'."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.text import (
    char_ngrams,
    charngram_lang_id,
    charngram_profiles,
)

EN = "the quick brown fox jumps over the lazy dog and the cat"
ZH = "一二三四五六七八九十" * 4


def _corpus(spark):
    rows = [
        (1, "en", EN),
        (2, "en", "the dog and the fox run over the hill and the road"),
        (3, "zh", ZH),
        (4, "zh", "十九八七六五四三二一" * 4),
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_char_ngrams_boundary_marking(spark):
    out = spark.range(1).select(
        char_ngrams(F.lit("ab cd"), 3).alias("g")
    ).collect()[0]["g"]
    assert out == ["_ab", "ab_", "b_c", "_cd", "cd_"]
    # CJK string grams by character, not byte
    out2 = spark.range(1).select(
        char_ngrams(F.lit("一二三"), 3).alias("g")
    ).collect()[0]["g"]
    assert out2 == ["_一二", "一二三", "二三_"]


def test_charngram_profiles_bounded_and_deterministic(spark):
    prof = charngram_profiles(_corpus(spark), "text", "lang", top_k=30)
    rows = prof.collect()
    assert all(1 <= r["rk"] <= 30 for r in rows)
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], set()).add(r["rk"])
    # ranks form a contiguous prefix per lang (deterministic total order)
    for lang, rks in per_lang.items():
        assert rks == set(range(1, len(rks) + 1))
    again = {(r["lang"], r["gram"], r["rk"])
             for r in charngram_profiles(
                 _corpus(spark), "text", "lang", top_k=30).collect()}
    assert again == {(r["lang"], r["gram"], r["rk"]) for r in rows}


def test_charngram_lang_id_classifies_cjk(spark):
    corpus = _corpus(spark)
    prof = charngram_profiles(corpus, "text", "lang", top_k=50)
    test = spark.createDataFrame(
        [
            (10, "the fox and the dog over the road"),
            (11, "一二三四五" * 6),   # spaceless CJK
            (12, "zzz qqq xxx"),                           # overlaps nothing
        ],
        "doc_id long, text string",
    )
    pred = {r["doc_id"]: r["pred_lang"]
            for r in charngram_lang_id(
                test, prof, "text", "doc_id", top_k=50).collect()}
    assert pred[10] == "en"
    assert pred[11] == "zh"   # the capability stopword lang_id lacks
    assert pred[12] == "und"
