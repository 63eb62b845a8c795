"""Training-data layout operators: sequence packing, deterministic
shuffle, token rarity, gap-filled rollups."""

from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.sampling import (
    deterministic_shuffle,
    pack_sequences,
    shuffled_head,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.temporal import (
    time_bucket_gapfill,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.text import (
    token_rarity_stats,
)
from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table

BUDGET = 8192


def test_pack_sequences_assignment_invariants(spark, sf_dir):
    """Recompute the concatenate-then-chop layout in plain Python from
    the same (hash, id) order and require identical assignments."""
    import hashlib

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(docs, "doc_id", "n_chars", "source", BUDGET)
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in packed.select("doc_id", "seq_id", "seq_offset").collect()
    }
    assert len(got) == docs.count()

    by_src: dict = {}
    for r in docs.select("doc_id", "source", "n_chars").collect():
        h = hashlib.md5(f"pack-v1{r['doc_id']}".encode()).hexdigest()[:4]
        by_src.setdefault(r["source"], []).append((h, r["doc_id"], r["n_chars"]))
    expected = {}
    for chunk in by_src.values():
        cum = 0
        for _, doc_id, n in sorted(chunk):
            expected[doc_id] = (cum // BUDGET, cum % BUDGET)
            cum += n
    assert got == expected


def test_pack_sequences_stable_under_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = pack_sequences(docs, "doc_id", "n_chars", "source", BUDGET)
    b = pack_sequences(docs.repartition(13), "doc_id", "n_chars", "source", BUDGET)
    key = lambda df: sorted(
        (r["doc_id"], r["seq_id"], r["seq_offset"])
        for r in df.select("doc_id", "seq_id", "seq_offset").collect()
    )
    assert key(a) == key(b)


def test_shuffled_head_deterministic_and_salted(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    h1 = [r["doc_id"] for r in shuffled_head(docs, "doc_id", 20)
          .orderBy("shuffle_rank").collect()]
    h2 = [r["doc_id"] for r in shuffled_head(docs.repartition(7), "doc_id", 20)
          .orderBy("shuffle_rank").collect()]
    assert h1 == h2 and len(h1) == 20
    other = [r["doc_id"] for r in shuffled_head(docs, "doc_id", 20, salt="v2")
             .orderBy("shuffle_rank").collect()]
    assert other != h1  # a new salt is a reshuffle
    # the head agrees with the full deterministic order
    full = [r["doc_id"] for r in
            deterministic_shuffle(docs, "doc_id").select("doc_id").collect()]
    assert full[:20] == h1


def test_token_rarity_exact_on_tiny_corpus(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["sum_tok_count"],
                      r["min_tok_count"], r["max_tok_count"])
        for r in token_rarity_stats(df).collect()
    }
    # global counts: a=3, b=1, c=1
    assert got[1] == (3, 7, 1, 3)   # a,b,a -> 3+1+3
    assert got[2] == (2, 4, 1, 3)   # a,c   -> 3+1


def test_gapfill_fills_and_carries(spark):
    df = spark.createDataFrame(
        [
            ("k1", "2024-01-01 00:10:00", 1.0),
            ("k1", "2024-01-01 03:20:00", 2.0),
            ("k2", "2024-01-01 01:00:00", 5.0),
        ],
        "k string, ts string, value double",
    ).select("k", F.to_timestamp("ts").alias("ts"), "value")
    out = time_bucket_gapfill(df, "k", "ts", "value", "1 hour")
    rows = {(r["k"], str(r["bucket_start"])): (r["n"], r["sum_value_fp2"])
            for r in out.collect()}
    # spine covers global span (00:00..03:00) for BOTH keys
    assert len(rows) == 8
    assert rows[("k1", "2024-01-01 00:00:00")] == (1, 100)
    assert rows[("k1", "2024-01-01 01:00:00")] == (0, 100)   # gap: 0 count, LOCF
    assert rows[("k1", "2024-01-01 02:00:00")] == (0, 100)
    assert rows[("k1", "2024-01-01 03:00:00")] == (1, 200)
    assert rows[("k2", "2024-01-01 00:00:00")] == (0, None)  # before first obs
    assert rows[("k2", "2024-01-01 01:00:00")] == (1, 500)
    assert rows[("k2", "2024-01-01 03:00:00")] == (0, 500)


def test_ranking_metrics_hand_case(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
        ranking_metrics,
    )

    ranked = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], ["id", "rank"]
    )
    truth = spark.createDataFrame([(20,), (30,), (99,)], ["id"])
    weights = [100, 63, 50]
    row = ranking_metrics(
        ranked, truth, "id", "rank", weights, scale=1_000_000
    ).collect()[0]
    assert row["n_hits"] == 2
    assert row["first_hit_rank"] == 2
    assert row["dcg"] == 63 + 50
    assert row["rr_scaled"] == 1_000_000 // 2
    assert row["ndcg_scaled"] == 113 * 1_000_000 // (100 + 63 + 50)


def test_ranking_metrics_no_hits_and_bounds(spark):
    import pytest as _pytest

    from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
        ranking_metrics,
    )

    ranked = spark.createDataFrame([(1, 1), (2, 99)], ["id", "rank"])
    truth = spark.createDataFrame([(2,)], ["id"])  # only the out-of-bounds row
    row = ranking_metrics(
        ranked, truth, "id", "rank", [100, 50]
    ).collect()[0]
    # rank 99 is outside 1..k -> filtered, so no hits, all zeros
    assert (row["n_hits"], row["first_hit_rank"], row["dcg"],
            row["rr_scaled"], row["ndcg_scaled"]) == (0, 0, 0, 0, 0)
    with _pytest.raises(ValueError, match="weights"):
        ranking_metrics(ranked, truth, "id", "rank", [])


def test_pca_train_and_project(spark):
    import numpy as np

    from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
        pca_project_fp,
        train_pca_fp,
    )

    # anisotropic cloud: x-spread 10x the y-spread, z noise tiny
    rng = np.random.RandomState(7)
    pts = np.stack([
        rng.randn(200) * 1.0, rng.randn(200) * 0.1, rng.randn(200) * 0.01,
    ], axis=1)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "id long, v array<double>",
    )
    comps, mean = train_pca_fp(df, "v", k=2)
    assert len(comps) == 2 and len(comps[0]) == 3 and len(mean) == 3
    # first component points along x (sign-canonicalized positive)
    assert abs(comps[0][0]) > 900_000 and comps[0][0] > 0
    proj = pca_project_fp(df, "v", "id", comps, mean).collect()
    by_pc = {}
    for r in proj:
        by_pc.setdefault(r["pc"], []).append(r["proj_fp2"])
    # variance ordering: pc0 spread dominates pc1
    assert np.std(by_pc[0]) > 3 * np.std(by_pc[1])
    # determinism: retraining yields identical integer artifacts
    comps2, mean2 = train_pca_fp(df, "v", k=2)
    assert comps2 == comps and mean2 == mean


def test_pca_project_validation(spark):
    import pytest as _pytest

    from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
        pca_project_fp,
    )

    df = spark.createDataFrame([(1, [0.1, 0.2])], "id long, v array<double>")
    with _pytest.raises(ValueError, match="component"):
        pca_project_fp(df, "v", "id", [], [0, 0])
    with _pytest.raises(ValueError, match="mismatch"):
        pca_project_fp(df, "v", "id", [[1, 2, 3]], [0, 0])
