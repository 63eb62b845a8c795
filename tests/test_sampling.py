"""Deterministic sampling / data-mixing operators."""

import pytest
from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators import sampling as SA
from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table


def test_rate_to_hex_threshold_bounds():
    assert SA.rate_to_hex_threshold(0.0) == "0000"
    assert SA.rate_to_hex_threshold(0.10) == "1999"
    assert SA.rate_to_hex_threshold(0.5) == "8000"
    assert SA.rate_to_hex_threshold(1.0) == "g"  # above every hex prefix


def test_hash_sample_rate_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    s1 = SA.hash_sample(docs, "doc_id", 0.2, salt="a")
    k = s1.count()
    assert abs(k / n - 0.2) < 0.1  # binomial tolerance at sf0.001
    assert k == SA.hash_sample(docs, "doc_id", 0.2, salt="a").count()
    # membership is key-determined: repartitioning must not change the set
    ids = {r["doc_id"] for r in s1.collect()}
    ids_rp = {
        r["doc_id"]
        for r in SA.hash_sample(docs.repartition(7), "doc_id", 0.2, salt="a").collect()
    }
    assert ids == ids_rp


def test_hash_sample_nesting_and_salt_independence(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    small = {r["doc_id"] for r in SA.hash_sample(docs, "doc_id", 0.05, salt="a").collect()}
    big = {r["doc_id"] for r in SA.hash_sample(docs, "doc_id", 0.20, salt="a").collect()}
    assert small <= big  # same salt => nested samples
    other = {r["doc_id"] for r in SA.hash_sample(docs, "doc_id", 0.20, salt="b").collect()}
    assert other != big  # different salt => different membership


def test_train_eval_split_partitions_everything(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = SA.train_eval_split(docs, "doc_id", eval_rate=0.1)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) == {"train", "eval"} and counts["eval"] > 0


def test_weighted_mix_rates_apply_per_stratum(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    mixed = SA.weighted_mix(
        docs, "doc_id", "source", rates={"src0": 1.0}, default_rate=0.0
    )
    # rate-1.0 stratum kept whole, rate-0 default drops the rest entirely
    assert mixed.where(F.col("source") == "src0").count() == \
        docs.where(F.col("source") == "src0").count()
    assert mixed.where(F.col("source") != "src0").count() == 0


def test_token_budget_head_respects_budget(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "quality", (F.col("lang") == "en").cast("int")
    )
    out = SA.token_budget_head(docs, "doc_id", "n_chars", "quality", budget=5000)
    rows = out.orderBy("cum_tokens").collect()
    assert rows and rows[-1]["cum_tokens"] <= 5000
    # greedy-prefix property: adding the next doc would exceed the budget,
    # and the prefix is quality-first
    assert all(r["cum_tokens"] <= 5000 for r in rows)
    langs = [r["lang"] for r in rows]
    assert langs == sorted(langs, key=lambda v: v != "en")  # en block first


def test_cluster_split_no_neardup_straddles(spark):
    """The whole point: every near-dup pair lands on one side of the
    split (a per-doc hash split would leak paraphrases into eval)."""
    import __spark_entry__ as entry

    out = entry.queries()["cluster_split"](spark, "/root/testdata/sf0.001")
    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    from redshift_to_pendo_api_data_pipeline_spark.operators.dedup import (
        minhash_dedup_pairs_staged,
    )
    from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table

    pairs = minhash_dedup_pairs_staged(
        load_table(spark, "/root/testdata/sf0.001", "documents"),
        "text", "doc_id",
        stage_path="/tmp/spark_graft_stage/sf0.001/minhash_sigs.parquet",
        threshold=0.8,
    ).collect()
    assert len(split_of) > 0
    for r in pairs:
        assert split_of[r["id_a"]] == split_of[r["id_b"]], (r["id_a"], r["id_b"])
    # both sides populated (eval_rate=0.1 at 500 docs)
    assert {"train", "eval"} == set(split_of.values())


def test_mixture_plan_temperature_flattens_and_refuses_inexact(spark):
    """T=2 boosts small sources: with token masses 6400 vs 100 the
    natural ratio is 64:1 but sqrt weights make the plan target 80:10 =
    8:1 — the small source's relative share rises 8x; the binding
    source samples at ~100% (rate_bp 10000). Non-{1,2} temperatures are
    refused (pow is not cross-engine exact), and T=1 equals the natural
    plan."""
    import pytest

    from redshift_to_pendo_api_data_pipeline_spark.operators.sampling import (
        mixture_plan,
        mixture_plan_temperature,
    )

    rows = [("big", "w " * 64) for _ in range(100)] \
        + [("small", "w " * 10) for _ in range(10)]
    df = spark.createDataFrame(
        [(s, t.strip()) for s, t in rows], "source string, text string")
    out = {r["source"]: r for r in
           mixture_plan_temperature(df, "text", "source", 2).collect()}
    assert out["big"]["tokens"] == 6400 and out["small"]["tokens"] == 100
    assert out["big"]["weight"] == 80 and out["small"]["weight"] == 10
    # small is the binding source: it contributes all its tokens
    assert out["small"]["rate_bp"] == 10000
    # plan ratio 8:1, vs natural 64:1
    assert out["big"]["take_tokens"] == 8 * out["small"]["take_tokens"]

    nat = {r["source"]: r for r in
           mixture_plan_temperature(df, "text", "source", 1).collect()}
    base = {r["source"]: r for r in mixture_plan(
        df, "text", "source",
        F.size(F.split(F.col("text"), " ")) * 0 + 1).collect()}
    assert nat["big"]["take_tokens"] // nat["small"]["take_tokens"] == 64
    assert base  # natural-weight twin exists (weights all 1 -> uniform)

    with pytest.raises(ValueError, match="temperature"):
        mixture_plan_temperature(df, "text", "source", 3)


def test_negative_samples_disjoint_deterministic(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.sampling import (
        negative_samples,
    )

    positives = spark.createDataFrame(
        [(u, i) for u in range(1, 6) for i in range(u, u + 3)],
        ["user", "item"],
    )
    items = spark.createDataFrame([(i,) for i in range(30)], ["item_id"])
    out1 = negative_samples(
        positives, "user", "item", items, "item_id", k=4
    ).collect()
    # never a positive, at most k per user, ranks are 1..k by draw order
    pos = {(r["user"], r["item"]) for r in positives.collect()}
    by_user = {}
    for r in out1:
        assert (r["user"], r["item"]) not in pos
        by_user.setdefault(r["user"], []).append((r["rank"], r["draw"]))
    for u, rows in by_user.items():
        rows.sort()
        assert len(rows) <= 4
        assert [rk for rk, _ in rows] == list(range(1, len(rows) + 1))
        draws = [d for _, d in rows]
        assert draws == sorted(draws)
    # determinism: a second invocation returns the identical relation
    out2 = negative_samples(
        positives, "user", "item", items, "item_id", k=4
    ).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))


def test_negative_samples_validation(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.sampling import (
        negative_samples,
    )

    positives = spark.createDataFrame([(1, 2)], ["user", "item"])
    items = spark.createDataFrame([(1,)], ["item_id"])
    with pytest.raises(ValueError, match="k must"):
        negative_samples(positives, "user", "item", items, "item_id", k=0)
    empty_items = spark.createDataFrame([], "item_id: int")
    with pytest.raises(ValueError, match="empty"):
        negative_samples(
            positives, "user", "item", empty_items, "item_id", k=1
        )
