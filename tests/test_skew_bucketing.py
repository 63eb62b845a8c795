"""Skew-salting correctness + bucketed co-located join (zero-Exchange)."""

import pytest
from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.skew import salted_aggregate, salted_join
from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table


def test_salted_aggregate_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        r["event_type"]: (r["n"], r["total"], r["last"])
        for r in ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
            F.max("ts").alias("last"),
        ).collect()
    }
    salted = {
        r["event_type"]: (r["n"], r["total"], r["last"])
        for r in salted_aggregate(
            ev,
            ["event_type"],
            {
                "n": ("sum", F.count(F.lit(1))),
                "total": ("sum", F.sum(F.col("value").cast("decimal(18,2)"))),
                "last": ("max", F.max("ts")),
            },
            salt_buckets=8,
        ).collect()
    }
    assert plain == salted


def test_salted_aggregate_spreads_hot_key(spark):
    # 10k rows of ONE key: phase-1 output must contain multiple salt rows
    df = spark.range(10000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    out = salted_aggregate(df, ["k"], {"n": ("sum", F.count(F.lit(1)))}, salt_buckets=8)
    assert out.collect() == [("hot", 10000)] or out.first()["n"] == 10000
    # the phase-1 relation really fans out over salts
    salt = (F.rand(seed=42) * 8).cast("int")
    n_groups = df.withColumn("s", salt).groupBy("k", "s").count().count()
    assert n_groups > 1


def test_salted_join_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    dim = ev.select("user_id").distinct().withColumn(
        "tier", (F.col("user_id") % 3).cast("int")
    )
    plain = ev.join(dim, "user_id").groupBy("tier").count().collect()
    salted = salted_join(ev, dim, "user_id", salt_buckets=4) \
        .groupBy("tier").count().collect()
    assert sorted((r["tier"], r["count"]) for r in plain) == \
        sorted((r["tier"], r["count"]) for r in salted)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Co-located join: both sides bucketed+sorted on the key -> the
    repeated equi-join plans with ZERO shuffle (no Exchange) and no
    broadcast — the scan itself delivers the partitioning."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey") \
        .mode("overwrite").saveAsTable("orders_b")
    lineitem.withColumnRenamed("l_orderkey", "o_orderkey") \
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey") \
        .mode("overwrite").saveAsTable("lineitem_b")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        n = joined.count()
        assert n == lineitem.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_aqe_skew_join_splits_hot_partition(spark):
    """Machine evidence for the SCALE.md claim that big-big joins fall
    back to AQE skew-splitting: one hot key dominating a forced
    sort-merge join must be rewritten by OptimizeSkewedJoin — the final
    adaptive plan shows the SMJ flagged skew=true — while the result
    stays correct. (Registry queries broadcast their small sides, so the
    SMJ is forced here with autoBroadcast off + thresholds lowered to
    bench scale, exactly how a genuinely big-big production join would
    present.)"""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot = spark.range(200_000).select(
            F.lit(7).alias("k"), F.col("id").alias("v")
        )
        uni = spark.range(2_000).select(
            (F.col("id") % 200).alias("k"), F.col("id").alias("v")
        )
        fact = hot.unionByName(uni)
        dim = spark.range(200).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        joined = fact.join(dim, "k")
        # materialize THIS DataFrame's own execution: AQE annotates the
        # final adaptive plan only after the plan it belongs to runs
        # (count() would spin up a separate execution and leave this one
        # un-finalized)
        assert len(joined.collect()) == 200_000 + 2_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_join_size_profile_exact(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.skew import (
        join_size_profile,
    )

    left = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("c",)], ["k"]
    )
    right = spark.createDataFrame(
        [("a",), ("b",), ("b",), ("b",), ("d",)], ["k"]
    )
    row = join_size_profile(left, "k", right, "k").collect()[0]
    # a: 2*1=2, b: 1*3=3 -> join_rows 5, top key b
    assert row["n_left_rows"] == 4 and row["n_right_rows"] == 5
    assert row["n_left_keys"] == 3 and row["n_right_keys"] == 3
    assert row["n_shared_keys"] == 2
    assert row["join_rows"] == 5
    assert row["max_key_rows"] == 3 and row["top_key"] == "b"
    assert row["skew_ppm"] == 3 * 1_000_000 // 5
    # verify against the actually-executed join
    assert left.join(right, "k").count() == row["join_rows"]


def test_join_size_profile_disjoint(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.skew import (
        join_size_profile,
    )

    left = spark.createDataFrame([("a",)], ["k"])
    right = spark.createDataFrame([("z",)], ["k"])
    row = join_size_profile(left, "k", right, "k").collect()[0]
    assert row["join_rows"] == 0 and row["n_shared_keys"] == 0
    assert row["max_key_rows"] == 0 and row["skew_ppm"] == 0
    assert row["top_key"] is None
