"""Unit tests for round-7 session-6 batch 7: CUSUM closed form,
Pearson matrix, Neyman allocation."""

from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import cusum_alarms
from redshift_to_pendo_api_data_pipeline_spark.operators.quality import (
    corr_matrix_pearson,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.sampling import (
    neyman_allocation,
)


def test_cusum_closed_form_equals_recursion(spark):
    # flat series with a level shift at t>=10: CUSUM must rise after the
    # shift and match the direct recursion exactly
    vals = [100] * 10 + [160] * 5
    df = spark.createDataFrame(
        [("g", t, v) for t, v in enumerate(vals)], ["g", "t", "x"]
    )
    out = {r["t"]: r for r in cusum_alarms(df, "g", "t", "x").collect()}
    # recursion reference: target = sum div n, k = target div 8
    target = sum(vals) // len(vals)
    k = target // 8
    s = 0
    for t, v in enumerate(vals):
        s = max(0, s + (v - target - k))
        assert out[t]["s"] == s, (t, out[t]["s"], s)
        assert out[t]["alarm"] == (1 if s > 4 * k else 0)
    assert out[14]["alarm"] == 1  # shift detected
    assert out[9]["alarm"] == 0   # quiet before the shift


def test_pearson_matrix_known_correlations(spark):
    # y = 2x exactly (r = 1), z anti-correlated with x (r = -1)
    rows = [(x, 2 * x, 100 - x) for x in range(1, 21)]
    df = spark.createDataFrame(rows, ["x", "y", "z"])
    out = {(r["col_a"], r["col_b"]): r["pearson_r"]
           for r in corr_matrix_pearson(df, ["x", "y", "z"]).collect()}
    assert out[("x", "y")] == 1.0
    assert out[("x", "z")] == -1.0
    assert out[("y", "z")] == -1.0
    assert len(out) == 3


def test_neyman_allocation_variance_proportional(spark):
    # stratum A: high variance; stratum B: constant (sigma 0) -> B gets 0
    rows = [("A", v) for v in (0, 100) * 25] + [("B", 50)] * 50
    df = spark.createDataFrame(rows, ["h", "v"])
    out = {r["h"]: r for r in
           neyman_allocation(df, "h", "v", budget=100).collect()}
    assert out["B"]["w_h"] == 0 and out["B"]["n_alloc"] == 0
    assert out["A"]["n_alloc"] == 100
    # allocations always sum to the budget exactly (largest remainder)
    assert sum(r["n_alloc"] for r in out.values()) == 100


def test_hll_merge_estimate_accuracy(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        hll_merge_estimate,
        hyperloglog_registers,
    )

    # 6000 distinct keys split over 3 slices with overlap: the merged
    # estimate must track the TRUE union (not the sum of slices)
    rows = [(f"s{i % 3}", k) for i in range(3) for k in range(2000 * i, 2000 * i + 4000)]
    df = spark.createDataFrame(rows, ["slice", "key"])
    true_union = df.select("key").distinct().count()
    regs = hyperloglog_registers(df, "key", ["slice"], m=256)
    out = hll_merge_estimate(regs, merge_over=["slice"], m=256).collect()[0]
    # HLL theoretical std error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(out["est_distinct"] - true_union) < 0.2 * true_union
    # merged estimate must be far below the 12000-row slice total
    assert out["est_distinct"] < 9000


def test_append_join_view_equals_full_join(spark):
    from redshift_to_pendo_api_data_pipeline_spark.streaming.continuous_agg import (
        append_join_view,
    )
    from pyspark.sql import functions as F

    fact = spark.createDataFrame(
        [(i, i % 3, i * 10) for i in range(12)], ["fid", "k", "v"]
    )
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], ["k", "name"])
    old = fact.where(F.col("fid") < 8).join(dim, ["k"]).select(
        "fid", "name", "v"
    )
    delta = fact.where(F.col("fid") >= 8)
    refreshed = append_join_view(old, delta, dim, ["k"])
    full = fact.join(dim, ["k"]).select("fid", "name", "v")
    assert sorted(map(tuple, refreshed.collect())) == sorted(
        map(tuple, full.collect())
    )
