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


def test_strip_contaminated_spans_excises_eval_grams(spark):
    corpus = spark.createDataFrame(
        [
            (1, "intro words the secret benchmark answer is here tail words"),
            (2, "nothing shared with the eval set at all ok"),
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, "the secret benchmark answer is here")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in SP.strip_contaminated_spans(
            corpus, eval_set, "text", "doc_id", k=5
        ).collect()
    }
    # the 6 eval tokens are covered by the two 5-gram windows; the rest stays
    assert out[1]["clean_text"] == "intro words tail words"
    assert out[1]["kept_tokens"] == 4
    assert out[2]["clean_text"] == "nothing shared with the eval set at all ok"
    assert out[2]["kept_tokens"] == out[2]["n_tokens"]


def test_mixture_plan_integer_invariants(spark):
    from pyspark.sql import functions as F
    from redshift_to_pendo_api_data_pipeline_spark.operators.sampling import (
        mixture_plan,
    )

    # large counts so the double floor (T = A*W div w, take = T*w div W)
    # loses at most a relative 1e-3 — small inputs make the binding
    # source's rate visibly under 10000, which is correct but noisy
    rows = [
        (1, "a " * 10000, "s1"),
        (2, "b " * 5000, "s2"),
        (3, "c " * 1000, "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    w = (F.regexp_extract("source", r"(\d+)", 1).cast("long") % 4) + 1
    out = {r["source"]: r for r in mixture_plan(df, "text", "source", w).collect()}
    assert set(out) == {"s1", "s2", "s3"}
    # rates bounded, binding source saturates (rate_bp == 10000 after floor)
    assert all(0 < r["rate_bp"] <= 10000 for r in out.values())
    assert max(r["rate_bp"] for r in out.values()) >= 9999
    # takes respect the target ratios: take_s / w_s equal across sources
    # up to floor error of 1 unit of T/W
    ratios = [r["take_tokens"] / r["weight"] for r in out.values()]
    assert max(ratios) - min(ratios) <= 1.0
    # never over-sample
    assert all(r["take_tokens"] <= r["tokens"] for r in out.values())
