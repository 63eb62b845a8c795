"""Unit tests for round-7 session-6 batch 4: split-conformal bound,
Wilson CI, Mahalanobis outliers, FK orphan audit."""

import math

from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
    conformal_residual_bound,
    wilson_ci_by_group,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.quality import orphan_audit
from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
    mahalanobis_outliers,
)


def test_conformal_bound_covers(spark):
    # y = 2x + noise in {-3..+3}: residuals known; qhat must cover 90%
    noise = [0, 1, -1, 2, -2, 3, -3, 0, 1, -1] * 2
    rows = [(i, i + 1, 2 * (i + 1) + noise[i]) for i in range(20)]
    df = spark.createDataFrame(rows, ["rid", "x", "y"])
    out = conformal_residual_bound(df, "x", "y", "rid", coverage_pm=900).collect()[0]
    assert out["n_rows"] == 20
    assert out["k"] == math.ceil(0.9 * 21)  # 19
    assert out["coverage_pm"] >= 900
    # residuals are bounded by the noise scale (slope/intercept shift a bit)
    assert 0 <= out["qhat_fp"] <= 4


def test_wilson_ci_hand_checked(spark):
    df = spark.createDataFrame(
        [("a", 1)] * 8 + [("a", 0)] * 2 + [("b", 0)] * 10, ["g", "s"]
    )
    out = {r["g"]: r for r in wilson_ci_by_group(df, "g", "s").collect()}
    z = 1.96
    n, k = 10, 8
    p = k / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert abs(out["a"]["ci_lo"] - round(center - half, 6)) < 1e-9
    assert abs(out["a"]["ci_hi"] - round(center + half, 6)) < 1e-9
    # k = 0: wilson lower bound is exactly 0, upper strictly positive
    assert out["b"]["ci_lo"] == 0.0 and out["b"]["ci_hi"] > 0


def test_mahalanobis_flags_planted_outlier(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(50)]
    rows.append((99, [25.0, -25.0, 25.0, -25.0]))  # planted far point
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = mahalanobis_outliers(df, "embedding", "vec_id", top_k=3).collect()
    assert out[0]["vec_id"] == 99
    assert out[0]["maha_score"] > out[1]["maha_score"] * 5


def test_orphan_audit_counts(spark):
    parent = spark.createDataFrame([(1,), (2,)], ["pk"])
    child = spark.createDataFrame(
        [(1, 10), (1, 11), (3, 12), (None, 13)], ["fk", "v"]
    )
    out = orphan_audit([("c->p", child, "fk", parent, "pk")]).collect()[0]
    assert out["relationship"] == "c->p"
    assert out["n_child_rows"] == 4
    assert out["n_null_fk"] == 1
    assert out["n_orphans"] == 1  # fk=3 only; NULL not counted as orphan
