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


def _substr_matches(spark, rows, k=4, min_len=8, max_occurrences=16):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    seeds = SP.substr_seed_grams(df, "text", "doc_id", k)
    return SP.maximal_duplicated_substrings(
        seeds, k=k, min_len=min_len, max_occurrences=max_occurrences
    ).collect()


def test_exact_substr_reports_exact_maximal_length(spark):
    """r8 (r7 verdict #5, Lee et al. 2022 ExactSubstr): a planted
    40-word verbatim duplicate is reported at exactly 40 tokens with
    exact positions in both documents."""
    shared = " ".join(f"s{i}" for i in range(40))
    rows = [
        (1, "p1 p2 p3 " + shared + " q1 q2"),
        (2, "r1 " + shared + " t1 t2 t3 t4"),
        (3, " ".join(f"m{i}" for i in range(30))),
    ]
    got = _substr_matches(spark, rows, k=4, min_len=8)
    assert len(got) == 1
    m = got[0]
    assert (m["doc_a"], m["doc_b"]) == (1, 2)
    assert m["len_tokens"] == 40
    assert m["pos_a"] == 4 and m["pos_b"] == 2


def test_exact_substr_catches_what_cover_undermeasures(spark):
    """A 6-word shared phrase is INVISIBLE to 8-gram cover (no full
    8-gram fits inside it) but ExactSubstr with a 4-gram seed reports
    it at its exact length."""
    rows = [
        (1, "x1 x2 x3 x4 a b c d e f y1 y2 y3 y4"),
        (2, "z1 z2 z3 a b c d e f w1 w2 w3 w4 w5"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cover = {
        r["doc_id"]: r["dup_tokens"]
        for r in SP.duplicated_span_coverage(
            df, "text", "doc_id", k=8, min_docs=2
        ).collect()
    }
    assert cover == {1: 0, 2: 0}          # 8-gram cover misses it
    got = _substr_matches(spark, rows, k=4, min_len=6)
    assert len(got) == 1 and got[0]["len_tokens"] == 6


def test_exact_substr_does_not_overmerge_different_partners(spark):
    """Consecutive covered positions from DIFFERENT partners must not
    merge: doc 1's words 1..10 match doc 2 on 1..6 and doc 3 on 5..10,
    but no 10-word duplicate exists anywhere — cover would mark all 10
    positions as one run; ExactSubstr reports two 6-word matches."""
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "u1 u2 a b c d e f u3 u4"),
        (3, "v1 v2 e f g h i j v3 v4"),
    ]
    got = sorted(
        _substr_matches(spark, rows, k=4, min_len=5),
        key=lambda r: (r["doc_a"], r["doc_b"]),
    )
    assert [(m["doc_a"], m["doc_b"], m["len_tokens"]) for m in got] == [
        (1, 2, 6), (1, 3, 6),
    ]
    # and the 10 positions of doc 1 ARE all cover-marked as one block
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cover = {
        r["doc_id"]: r["dup_tokens"]
        for r in SP.duplicated_span_coverage(
            df, "text", "doc_id", k=4, min_docs=2
        ).collect()
    }
    assert cover[1] == 10                 # cover cannot tell them apart


def test_exact_substr_same_doc_tandem_repeat(spark):
    """Within-document repeats (min_docs=2 cover misses these) pair
    through the same-doc branch; the rollup counts them once."""
    phrase = "t1 t2 t3 t4 t5 t6 t7 t8"
    rows = [
        (1, phrase + " mid1 mid2 " + phrase),
        (2, " ".join(f"n{i}" for i in range(20))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    seeds = SP.substr_seed_grams(df, "text", "doc_id", 4)
    matches = SP.maximal_duplicated_substrings(seeds, k=4, min_len=8)
    got = matches.collect()
    assert len(got) == 1
    m = got[0]
    assert m["doc_a"] == 1 and m["doc_b"] == 1
    assert m["len_tokens"] == 8 and (m["pos_a"], m["pos_b"]) == (1, 11)
    stats = SP.substr_dedup_doc_stats(matches).collect()
    assert len(stats) == 1
    assert stats[0]["doc_id"] == 1 and stats[0]["n_matches"] == 1


def test_exact_substr_occurrence_cap_splits_never_overstates(spark):
    """A hot gram above max_occurrences is excluded from seeding; a
    match containing it splits into shorter (or no) reported runs —
    lengths are never overstated."""
    shared = "h1 h2 h3 h4 h5 h6 h7 h8 h9 h10"
    rows = [(1, "a1 " + shared), (2, "b1 b2 " + shared)] + [
        # 20 more docs all containing the middle window h4..h7, pushing
        # that gram's occurrence count over the cap
        (10 + i, f"c{i} h4 h5 h6 h7 d{i}") for i in range(20)
    ]
    got = _substr_matches(spark, rows, k=4, min_len=4, max_occurrences=8)
    # the (1,2) 10-word match must appear only as sub-runs around the
    # capped h4..h7 seed, every reported length < 10
    pair12 = [m for m in got if (m["doc_a"], m["doc_b"]) == (1, 2)]
    assert pair12 and all(m["len_tokens"] < 10 for m in pair12)
    assert all(m["len_tokens"] >= 4 for m in got)


def test_strip_maximal_duplicate_spans_keeps_first_occurrence(spark):
    """Keep-one semantics: the LATER occurrence of each maximal match
    (higher doc id, or later position within a doc) is excised; the
    earlier copy and all untouched docs survive verbatim."""
    shared = " ".join(f"s{i}" for i in range(10))
    rows = [
        (1, "a1 a2 " + shared),
        (2, "b1 " + shared + " b2"),
        (3, "c1 c2 c3 c4 c5 c6 c7 c8"),
        (4, shared + " mid " + shared),          # tandem: later copy goes
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    seeds = SP.substr_seed_grams(df, "text", "doc_id", 4)
    matches = SP.maximal_duplicated_substrings(seeds, k=4, min_len=8)
    out = {
        r["doc_id"]: r
        for r in SP.strip_maximal_duplicate_spans(
            df, "text", "doc_id", matches
        ).collect()
    }
    assert out[1]["clean_text"] == "a1 a2 " + shared     # earliest: kept
    assert out[2]["clean_text"] == "b1 b2"               # later copy cut
    assert out[3]["clean_text"] == "c1 c2 c3 c4 c5 c6 c7 c8"
    # doc 4 is the doc_b side of every cross-doc pair, so BOTH its
    # copies are excised — global keep-one leaves only doc 1's copy
    assert out[4]["clean_text"] == "mid"
    assert out[2]["kept_tokens"] == 2 and out[2]["n_tokens"] == 12


def test_incremental_substr_matches_batch_vs_corpus_only(spark):
    """Ingest-time ExactSubstr: matches are found between the NEW
    batch and the corpus, corpus-internal duplicates are NOT re-paired
    (the corpus never self-joins), and the reported lengths equal the
    batch operator's for the same pair."""
    shared = " ".join(f"s{i}" for i in range(12))
    corpus_rows = [
        (1, "c1 " + shared + " c2"),
        (2, "d1 d2 " + shared),              # corpus-internal duplicate
        (3, " ".join(f"m{i}" for i in range(20))),
    ]
    new_rows = [(100, "x1 x2 x3 " + shared)]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    cs = SP.substr_seed_grams(corpus, "text", "doc_id", 4)
    ns = SP.substr_seed_grams(new, "text", "doc_id", 4)
    got = SP.incremental_substr_matches(ns, cs, k=4, min_len=8).collect()
    pairs = {(r["doc_new"], r["doc_corpus"]): r["len_tokens"] for r in got}
    # the new doc matches BOTH corpus copies at exact length 12;
    # the corpus-internal (1,2) pair is absent by construction
    assert pairs == {(100, 1): 12, (100, 2): 12}
    for r in got:
        assert r["pos_new"] == 4


def test_exact_substr_min_len_validation(spark):
    import pytest

    rows = [(1, "a b c d e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    seeds = SP.substr_seed_grams(df, "text", "doc_id", 4)
    with pytest.raises(ValueError, match="min_len"):
        SP.maximal_duplicated_substrings(seeds, k=4, min_len=3)


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
