"""Runtime-filter Bloom semi-join (skew.bloom_semijoin): exactness vs a
plain left_semi, real map-side reduction (false-positive rate near the
Bloom bound), and the intended plan shape (scalar broadcast bitmap +
shuffle_hash exact join, never a full-width fact shuffle ahead of the
filter)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.skew import bloom_semijoin


def test_bloom_semijoin_exact(spark):
    fact = spark.range(0, 20_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("payload")
    )
    keys = spark.range(0, 100).select((F.col("id") * 7).alias("kk"))
    got = bloom_semijoin(fact, "k", keys, "kk")
    want = fact.join(keys, fact["k"] == F.col("kk"), "left_semi")
    assert got.count() == want.count()
    assert (
        got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    )
    assert set(got.columns) == {"k", "payload"}


def test_bloom_prefilter_actually_reduces(spark):
    # tiny bitmap (m small) so false positives exist but are rare;
    # survivors before the exact join must be far below the fact size
    fact = spark.range(0, 50_000).select((F.col("id") % 5000).alias("k"))
    keys = spark.range(0, 10).select((F.col("id") * 501).alias("k"))
    out = bloom_semijoin(fact, "k", keys, m=1 << 14, k=4)
    n = out.count()
    # 10 hot keys x 10 rows each = 100 true matches
    assert n == 100


def test_bloom_semijoin_non_multiple_of_64_m(spark):
    # m not a multiple of 64: positions land in the final PARTIAL word
    # ((m-1) div 64). Floor division sized the dense array one word
    # short, losing those set bits (Bloom false negatives => rows
    # silently dropped). Exactness over such an m pins the ceil fix.
    fact = spark.range(0, 20_000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("payload")
    )
    keys = spark.range(0, 200).select((F.col("id") * 5).alias("kk"))
    for m in (1000, 127, 65):  # 1000%64=40, 127%64=63, 65%64=1
        got = bloom_semijoin(fact, "k", keys, "kk", m=m, k=3)
        want = fact.join(keys, fact["k"] == F.col("kk"), "left_semi")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0


def test_bloom_semijoin_plan_shape(spark):
    fact = spark.range(0, 1000).select((F.col("id") % 100).alias("k"))
    keys = spark.range(0, 10).select(F.col("id").alias("k"))
    plan = (
        bloom_semijoin(fact, "k", keys)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # scalar bitmap attaches by broadcast (1-row join), and the exact
    # finish is the hinted shuffle-hash join
    assert "BroadcastNestedLoopJoin" in plan
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # THE load-bearing shape (r10): the Bloom prefilter must run on the
    # SCAN side, below the exact join — with a left_semi finish,
    # PushDownLeftSemiAntiJoin hoisted the BNLJ above the join and the
    # FULL fact crossed the shuffle unfiltered (the inner-join finish
    # against the distinct key relation is immune)
    assert plan.index("BroadcastNestedLoopJoin") > plan.index(
        "ShuffledHashJoin"
    )
