"""Duplicated n-gram span operators (substring dedup, k-gram cover)."""

from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators import spans as SP


def _corpus(spark):
    # docs 1 and 2 share the verbatim 6-word passage "a b c d e f"
    # embedded in otherwise-distinct text; doc 3 is all-original.
    rows = [
        (1, "x1 x2 a b c d e f y1 y2"),
        (2, "z1 a b c d e f z2 z3 z4"),
        (3, "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"),
        (4, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_coverage_marks_shared_passage(spark):
    out = {
        r["doc_id"]: r
        for r in SP.duplicated_span_coverage(
            _corpus(spark), "text", "doc_id", k=5, min_docs=2
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # the shared passage is 6 tokens: exactly the positions covered by the
    # two duplicated 5-gram windows ("a b c d e", "b c d e f")
    assert out[1]["dup_tokens"] == 6
    assert out[2]["dup_tokens"] == 6
    assert out[3]["dup_tokens"] == 0 and out[3]["dup_coverage_bp"] == 0
    assert out[4]["dup_tokens"] == 0
    assert out[1]["n_tokens"] == 10
    assert out[1]["dup_coverage_bp"] == 6000


def test_strip_spans_removes_only_shared_tokens(spark):
    out = {
        r["doc_id"]: r
        for r in SP.strip_duplicated_spans(
            _corpus(spark), "text", "doc_id", k=5, min_docs=2
        ).collect()
    }
    assert out[1]["clean_text"] == "x1 x2 y1 y2"
    assert out[2]["clean_text"] == "z1 z2 z3 z4"
    assert out[3]["clean_text"] == "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"
    assert out[1]["kept_tokens"] == 4 and out[1]["n_tokens"] == 10


def test_short_doc_truncated_gram_duplication(spark):
    # two identical docs shorter than k: the single truncated gram
    # duplicates, covering the whole doc
    rows = [(1, "a b"), (2, "a b"), (3, "c d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in SP.duplicated_span_coverage(
            df, "text", "doc_id", k=5, min_docs=2
        ).collect()
    }
    assert out[1]["dup_coverage_bp"] == 10000
    assert out[2]["dup_coverage_bp"] == 10000
    assert out[3]["dup_coverage_bp"] == 0


def test_coverage_never_exceeds_doc(spark):
    cov = SP.duplicated_span_coverage(_corpus(spark), "text", "doc_id", k=3)
    bad = cov.where(
        (F.col("dup_tokens") > F.col("n_tokens"))
        | (F.col("dup_coverage_bp") > 10000)
    ).count()
    assert bad == 0
