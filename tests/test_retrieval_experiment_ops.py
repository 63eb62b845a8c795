"""Unit tests for the retrieval / experimentation / data-selection
operators added in round 7 session 6: BM25, WOE/IV, CUPED, multinomial
naive Bayes, dimension-truncation recall, greedy k-center."""

from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
    cuped_adjusted_means,
    woe_iv_bins,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.classifier import (
    naive_bayes_classify,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.sampling import kcenter_select
from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
    dim_truncation_recall,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.text import bm25_scores


def test_bm25_tf_saturation_and_length_penalty(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark spark"),      # high tf, short
            (2, "spark"),                        # tf 1, shortest
            (3, "spark " + "pad " * 40),         # tf 1, long -> penalized
            (4, "nothing relevant here"),        # no query term
        ],
        ["doc_id", "text"],
    )
    rows = bm25_scores(docs, ["spark"], top_k=10).collect()
    got = {r["doc_id"]: r["bm25_micro"] for r in rows}
    assert 4 not in got  # zero-hit docs produce no score row
    assert got[1] > got[2] > got[3] > 0
    # saturation: 4x tf must be well under 4x score
    assert got[1] < 4 * got[2]


def test_woe_iv_hand_computed(spark):
    import math

    # 2 bins of 3: bin1 = 1 bad / 2 good, bin2 = 2 bad / 1 good
    df = spark.createDataFrame(
        [(10, 1, 0), (20, 2, 0), (30, 3, 1), (40, 4, 1), (50, 5, 0), (60, 6, 1)],
        ["v", "id", "y"],
    )
    rows = {r["bin"]: r for r in woe_iv_bins(df, "v", "y", "id", n_bins=2).collect()}
    assert rows[1]["n_good"] == 2 and rows[1]["n_bad"] == 1
    assert rows[2]["n_good"] == 1 and rows[2]["n_bad"] == 2
    expect = round(math.log((2 / 3) / (1 / 3)), 6)
    assert abs(rows[1]["woe"] - expect) < 1e-9
    assert abs(rows[2]["woe"] + expect) < 1e-9  # symmetric bins
    # IV contribution positive in both bins (share gap and woe share sign)
    assert rows[1]["iv_part"] > 0 and rows[2]["iv_part"] > 0


def test_cuped_exact_linear_covariate(spark):
    # y = 3x exactly -> theta = 3e6 ppm; adjusted means of both arms
    # collapse to the same value (all post-variance explained by pre)
    rows = [(i, 100 + 10 * i, 3 * (100 + 10 * i), i % 2) for i in range(20)]
    df = spark.createDataFrame(rows, ["u", "pre", "post", "arm"])
    out = {r["arm"]: r for r in
           cuped_adjusted_means(df, "u", "pre", "post", "arm").collect()}
    assert out[0]["theta_ppm"] == 3_000_000
    assert out[0]["adjusted_post_ppm"] == out[1]["adjusted_post_ppm"]
    assert out[0]["n_units"] == 10


def test_naive_bayes_separable_and_empty_doc_kept(spark):
    train = spark.createDataFrame(
        [
            (1, "cat cat purr", "pet"),
            (2, "cat purr purr", "pet"),
            (3, "stock stock bond", "finance"),
            (4, "bond stock yield", "finance"),
        ],
        ["doc_id", "text", "label"],
    )
    score = spark.createDataFrame(
        [
            (10, "cat purr"),
            (11, "stock yield"),
            (12, ""),              # empty: prior-only, must NOT be dropped
            (13, "zebra xylophone"),  # fully OOV: floors only
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           naive_bayes_classify(train, score).collect()}
    assert out[10]["pred_label"] == "pet"
    assert out[11]["pred_label"] == "finance"
    assert 12 in out and 13 in out  # neither dropped
    # empty doc: score is exactly the prior (ln .5 in micro-units)
    assert out[12]["score_micro"] == -693147
    # OOV doc ties on likelihood floors -> tie-break = class asc
    assert out[13]["pred_label"] == "finance"


def test_dim_truncation_recall_detects_divergence(spark):
    # corpus where the first half of dims and second half disagree:
    # q = [1,0]; a=[1, 0] close in both; b=[0.9, 9] far in full, close
    # truncated; with k=1 the truncated top-1 differs from full top-1
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.1]),
        (2, [0.9, -9.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.where(F.col("vec_id") == 0)
    out = dim_truncation_recall(df, q, keep_dims=1, k=1).collect()
    assert len(out) == 1
    # full top-1 = vec 1 (cos high); keep_dims=1 top-1 tie between 1 and
    # 2 on rounded cosine (both 1.0) -> id asc picks 1 -> overlap 1
    assert out[0]["n_overlap"] == 1 and out[0]["recall_pm"] == 1000


def test_kcenter_greedy_order(spark):
    # 1-D embeddings disguised as 2-D: ids at positions 0, 1, 10, 21
    rows = [
        (1, [0.0, 0.0]),
        (2, [1.0, 0.0]),
        (3, [10.0, 0.0]),
        (4, [21.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = kcenter_select(df, "embedding", "vec_id", k=3).collect()
    picked = [(r["step"], r["vec_id"]) for r in out]
    # seed = farthest from origin (21) -> then 0 (dist 21) -> then 10
    # (min dist to {21,0} = 10 beats 1's min dist 1)
    assert picked == [(0, 4), (1, 1), (2, 3)]
    assert out[1]["dist_micro"] == 21_000_000


def test_kcenter_driver_crossover_matches_distributed(spark, sf_dir):
    """The small-relation driver path (default) and the distributed
    k-pass loop (forced with max_driver_vecs=0) must return
    row-identical (step, vec_id, dist_micro) over REAL embeddings —
    the driver loop replicates the JVM's left-fold summation order,
    IEEE sqrt, micro-rounding, and min-id ties."""
    from pyspark.sql import functions as F

    from redshift_to_pendo_api_data_pipeline_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    a = [(r["step"], r["vec_id"], r["dist_micro"])
         for r in kcenter_select(emb, "embedding", "vec_id", k=6).collect()]
    b = [(r["step"], r["vec_id"], r["dist_micro"])
         for r in kcenter_select(
             emb, "embedding", "vec_id", k=6, max_driver_vecs=0
         ).collect()]
    assert a == b and len(a) == 6


def test_kcenter_k_exceeds_n_and_empty(spark):
    """k > n must return exactly n rows with no duplicate ids on BOTH
    paths (the driver loop previously re-selected chosen ids with
    dist_micro=-1; the distributed loop crashed); empty input returns
    an empty frame with the stable schema on both paths."""
    rows = [(1, [0.0, 1.0]), (2, [3.0, 4.0]), (3, [6.0, 8.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    for mdv in (200_000, 0):  # driver path, distributed path
        out = kcenter_select(
            df, "embedding", "vec_id", k=10, max_driver_vecs=mdv
        ).collect()
        ids = [r["vec_id"] for r in out]
        assert len(ids) == 3 and len(set(ids)) == 3
        assert all(r["dist_micro"] >= 0 for r in out)
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    for mdv in (200_000, 0):
        out = kcenter_select(
            empty, "embedding", "vec_id", k=4, max_driver_vecs=mdv
        )
        assert out.count() == 0
        assert out.columns == ["step", "vec_id", "dist_micro"]
