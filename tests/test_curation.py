"""Curation funnel composition."""

from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators import curation as C
from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table


def test_quality_funnel_monotone_and_labelled(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = C.quality_funnel(
        docs,
        [
            ("min_length", C.min_length_stage("n_chars", 150)),
            ("lang", C.lang_allowlist_stage("lang", ["en"])),
            ("exact_dedup", C.exact_dedup_stage("text", "doc_id")),
        ],
    ).orderBy("stage_idx").collect()
    assert [r["stage"] for r in out] == ["input", "min_length", "lang", "exact_dedup"]
    counts = [r["n_docs"] for r in out]
    assert counts[0] == docs.count()
    assert all(a >= b for a, b in zip(counts, counts[1:]))  # funnel never grows
    assert counts[-1] > 0


def test_exact_dedup_stage_keeps_min_id_full_rows(spark):
    df = spark.createDataFrame(
        [(1, "same text", "en"), (2, "Same  TEXT", "en"), (3, "other", "en")],
        "doc_id long, text string, lang string",
    )
    out = C.exact_dedup_stage("text", "doc_id")(df).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [1, 3]
    assert set(out[0].asDict()) == {"doc_id", "text", "lang"}  # full row survives


def test_decontamination_stage_removes_overlap(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "totally clean words here")],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(9, "alpha beta gamma epsilon")], "doc_id long, text string"
    )
    out = C.decontamination_stage(eval_set, "text", "doc_id", 3)(corpus).collect()
    assert [r["doc_id"] for r in out] == [2]
