"""checked_bigint: DECIMAL(38,0) -> BIGINT that errors on overflow
regardless of ``spark.sql.ansi.enabled``.

Spark 4.x ships ANSI on by default (so a plain cast already
fits-or-errors there), but the keyness queries must not depend on a
session flag someone can turn off: with ANSI off, a plain cast silently
NULLs an overflowing DECIMAL — exactly the silent-wrong failure the
DECIMAL(38,0) numerator exists to prevent. checked_bigint raises in both
modes; these tests pin both.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from redshift_to_pendo_api_data_pipeline_spark.functions.transforms import checked_bigint

I64_MAX = (1 << 63) - 1
I64_MIN = -(1 << 63)


def _dec_df(spark, values):
    return spark.createDataFrame(
        [(str(v),) for v in values], "s string"
    ).select(F.col("s").cast(T.DecimalType(38, 0)).alias("d"))


@pytest.fixture
def ansi_off(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


def test_in_range_values_cast_exactly(spark):
    vals = [0, 1, -1, I64_MAX, I64_MIN, 12345678901234567]
    out = _dec_df(spark, vals).select(checked_bigint(F.col("d")).alias("b"))
    assert out.schema["b"].dataType == T.LongType()
    got = sorted(r.b for r in out.collect())
    assert got == sorted(vals)


@pytest.mark.parametrize("v", [I64_MAX + 1, I64_MIN - 1])
def test_overflow_raises_under_default_session(spark, v):
    df = _dec_df(spark, [v]).select(checked_bigint(F.col("d")).alias("b"))
    with pytest.raises(Exception, match="checked_bigint"):
        df.collect()


def test_overflow_raises_even_with_ansi_off(ansi_off):
    spark = ansi_off
    # the plain cast this helper replaces IS silent under non-ANSI —
    # it wraps (or NULLs, version-dependent), never errors:
    plain = _dec_df(spark, [I64_MAX + 1]).select(
        F.col("d").cast("bigint").alias("b")
    )
    got = plain.collect()[0].b
    assert got is None or got != I64_MAX + 1  # silently wrong, not an error
    # ...while checked_bigint still fails loudly:
    df = _dec_df(spark, [I64_MAX + 1]).select(checked_bigint(F.col("d")).alias("b"))
    with pytest.raises(Exception, match="checked_bigint"):
        df.collect()


def test_in_range_unaffected_by_ansi_off(ansi_off):
    out = _dec_df(ansi_off, [42]).select(checked_bigint(F.col("d")).alias("b"))
    assert out.collect()[0].b == 42


def test_null_passes_through_as_null(spark):
    """NULL input returns NULL (matching a plain cast): without the
    isNull branch the NULL falls to the raise_error arm — with a NULL
    message, since concat with NULL is NULL."""
    df = spark.createDataFrame([(None,)], "s string").select(
        F.col("s").cast(T.DecimalType(38, 0)).alias("d")
    )
    out = df.select(checked_bigint(F.col("d")).alias("b")).collect()
    assert out[0].b is None


def test_null_and_overflow_mix_still_raises_on_the_overflow(spark):
    df = spark.createDataFrame(
        [(None,), (str(I64_MAX + 1),)], "s string"
    ).select(F.col("s").cast(T.DecimalType(38, 0)).alias("d"))
    with pytest.raises(Exception, match="checked_bigint"):
        df.select(checked_bigint(F.col("d")).alias("b")).collect()


def test_corpus_scale_ppm_multiplies_do_not_overflow(spark):
    """Regression for the r10 sf1-sweep find: ppm cross-multiplies over
    unbounded money/rank/support sums must run in DECIMAL(38,0), not
    BIGINT. Each operator gets inputs sized so the OLD BIGINT form
    (operand * 1_000_000) would exceed 2^63-1 and throw under ANSI —
    the DECIMAL forms must return exact values instead."""
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        abc_analysis,
        grouped_ols_slope,
        mom_growth,
    )

    # abc_analysis: ten equal items, cumulative revenue ~2e14 cents
    # (2e14 * 1e6 = 2e20 >> 2^63-1 ~ 9.2e18)
    big = 200_000_000_000.0  # 2e11 dollars -> 2e13 cents each
    df = spark.createDataFrame(
        [(i, big) for i in range(1, 11)], "item long, rev double"
    )
    out = {r["abc_class"]: r for r in
           abc_analysis(df, "item", "rev").collect()}
    # exclusive prefix shares 0%..90%: items 1-8 start <80% (A),
    # items 9-10 start at 80%/90% <95% (B)
    assert out["A"]["n_items"] == 8 and out["B"]["n_items"] == 2
    assert out["A"]["revenue_share_ppm"] == 800_000
    assert out["B"]["revenue_share_ppm"] == 200_000

    # mom_revenue_growth: month-over-month on ~2e13-cent months
    mom = spark.createDataFrame(
        [("g", "2024-01-05", big), ("g", "2024-02-05", big * 2)],
        "g string, d string, v double",
    ).selectExpr("g", "CAST(d AS DATE) AS d", "v")
    rows = mom_growth(mom, "g", "d", "v").collect()
    growth = {r["month"]: r["growth_ppm"] for r in rows}
    assert growth["2024-02-01"] == 1_000_000  # +100%

    # grouped_ols_slope: centered cross-products summing past 9.2e12
    # so sxy * 1e6 would overflow BIGINT
    pts = [("g", float(x) * 1e6, float(2 * x) * 1e6)
           for x in range(-3, 4)]
    sl = spark.createDataFrame(pts, "g string, x double, y double")
    sl = sl.selectExpr(
        "g",
        "CAST(x * 100 AS LONG) AS x_fp",
        "CAST(y * 100 AS LONG) AS y_fp",
    )
    row = grouped_ols_slope(sl, ["g"], "x_fp", "y_fp").collect()[0]
    assert row["sxy"] * 1_000_000 > (1 << 63) - 1  # old form would throw
    assert row["slope_ppm"] == 2_000_000           # exact slope = 2
