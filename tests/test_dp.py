"""Differentially-private histogram (privacy.dp_histogram): the
md5-derived geometric noise must actually follow Geometric(1/2) (so the
difference is discrete Laplace), be reproducible per (salt, key), and
never release a negative count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.privacy import (
    _geometric_half,
    dp_histogram,
)


def test_geometric_half_distribution(spark):
    n = 20_000
    df = spark.range(n).select(
        _geometric_half(F.concat(F.lit("t|"), F.col("id").cast("string")))
        .alias("g")
    )
    counts = {r["g"]: r["c"] for r in
              df.groupBy("g").agg(F.count(F.lit(1)).alias("c")).collect()}
    # P(g=j) = 2^-(j+1): j=0 about half, j=1 about a quarter
    assert abs(counts[0] / n - 0.5) < 0.02
    assert abs(counts[1] / n - 0.25) < 0.02
    assert min(counts) == 0 and max(counts) < 30


def test_dp_histogram_reproducible_and_clamped(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 50)) for i in range(500)], "id long, grp string"
    )
    a = {r["grp"]: r["dp_count"] for r in dp_histogram(df, "grp", salt="dp1").collect()}
    b = {r["grp"]: r["dp_count"] for r in dp_histogram(df, "grp", salt="dp1").collect()}
    assert a == b  # same salt + keys -> identical release
    c = {r["grp"]: r["dp_count"]
         for r in dp_histogram(df, "grp", salt="other").collect()}
    assert a != c  # a fresh salt redraws the noise
    assert all(v >= 0 for v in a.values())
    # noise is small relative to the true count of 10: most groups close
    diffs = [abs(v - 10) for v in a.values()]
    assert sorted(diffs)[len(diffs) // 2] <= 2


def test_dp_histogram_releases_only_noisy_count(spark):
    df = spark.createDataFrame([(1, "a")], "id long, grp string")
    out = dp_histogram(df, "grp", salt="dp1")
    assert set(out.columns) == {"grp", "dp_count"}


def test_dp_histogram_salt_is_required(spark):
    # a defaulted (public) salt would let anyone recompute the exact
    # noise and void the DP guarantee — the API refuses to pick one
    df = spark.createDataFrame([(1, "a")], "id long, grp string")
    with pytest.raises(TypeError):
        dp_histogram(df, "grp")
