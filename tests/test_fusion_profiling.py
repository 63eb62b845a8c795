"""RRF rank fusion, fixed-bound histograms, mean-shift changepoints,
and the streaming k-anonymity monitor."""

from __future__ import annotations

import os
import tempfile
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
    mean_shift_changepoint,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.quality import (
    histogram_fixed,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
    rrf_fusion,
)
from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table


def test_rrf_fusion_matches_python(spark):
    # two hand-built rankings with partial overlap
    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3), (4, 4)], ["doc", "rank"]
    )
    b = spark.createDataFrame(
        [(3, 1), (1, 2), (5, 3)], ["doc", "rank"]
    )
    out = {r["doc"]: r for r in rrf_fusion(
        [a, b], "doc", k_const=60, topn=10).collect()}
    ranks = {1: [1, 2], 2: [2], 3: [3, 1], 4: [4], 5: [3]}
    for doc, rs in ranks.items():
        want = sum(1000000 // (60 + r) for r in rs)
        assert out[doc]["fused_ppm"] == want
        assert out[doc]["n_lists"] == len(rs)
        assert out[doc]["best_rank"] == min(rs)
    # consensus docs outrank single-list docs of comparable rank
    assert out[3]["fused_ppm"] > out[2]["fused_ppm"]


def test_rrf_fusion_topn_and_validation(spark):
    a = spark.createDataFrame([(i, i) for i in range(1, 30)], ["doc", "rank"])
    assert rrf_fusion([a], "doc", topn=5).count() == 5
    with pytest.raises(ValueError):
        rrf_fusion([], "doc")


def test_histogram_fixed_buckets_and_clamping(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.99,), (10.0,), (55.0,), (99.99,), (150.0,),
         (None,)],
        "v double",
    )
    got = {r["bucket"]: r for r in histogram_fixed(df, "v", 0.0, 100.0, 10)
           .collect()}
    # -5 clamps into bucket 0; 150 clamps into bucket 9; NULL dropped
    assert got[0]["n"] == 3          # -5.0, 0.0, 9.99
    assert got[1]["n"] == 1          # 10.0
    assert got[5]["n"] == 1          # 55.0
    assert got[9]["n"] == 2          # 99.99, and 150.0 clamps in
    assert sum(r["n"] for r in got.values()) == 7
    assert got[5]["bucket_lo_fp"] == 5000  # cents
    with pytest.raises(ValueError):
        histogram_fixed(df, "v", 0.0, 100.0, 0)
    with pytest.raises(ValueError):
        histogram_fixed(df, "v", 5.0, 5.0, 4)


def test_histogram_fixed_totalprice_matches_python(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    got = {r["bucket"]: r["n"] for r in histogram_fixed(
        orders, "o_totalprice", 0.0, 600000.0, 24).collect()}
    import decimal

    cnt = Counter()
    for r in orders.select("o_totalprice").collect():
        fp = int(decimal.Decimal(str(r["o_totalprice"])).quantize(
            decimal.Decimal("0.01")) * 100)
        cnt[max(0, min(23, fp * 24 // 60000000))] += 1
    assert got == dict(cnt)


def test_mean_shift_changepoint_finds_planted_shift(spark):
    from datetime import date, timedelta

    rows = []
    d0 = date(2024, 1, 1)
    # key 'a': 14 days, 5 events/day first week, 50/day second week
    for i in range(14):
        n = 5 if i < 7 else 50
        rows += [("a", d0 + timedelta(days=i))] * n
    # key 'b': flat 10/day
    for i in range(14):
        rows += [("b", d0 + timedelta(days=i))] * 10
    df = spark.createDataFrame(rows, ["k", "day"]).select(
        "k", F.col("day").cast("timestamp").alias("ts")
    )
    out = {r["event_type"]: r for r in mean_shift_changepoint(
        df.withColumnRenamed("k", "event_type"), "event_type", "ts",
        min_side=2).collect()}
    # the argmax split for 'a' is day 7 (last day of the low regime)
    assert out["a"]["split_day"] == "2024-01-07"
    assert out["a"]["score_ppm"] == 45 * 1000000
    # flat series scores (near) zero
    assert out["b"]["score_ppm"] == 0


def test_mean_shift_changepoint_matches_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {r["event_type"]: r for r in mean_shift_changepoint(
        ev, "event_type", "ts", min_side=3).collect()}
    daily = defaultdict(Counter)
    for r in ev.select("event_type", F.col("ts").cast("date").alias("d")).collect():
        daily[r["event_type"]][r["d"]] += 1
    for k, cnt in daily.items():
        days = sorted(cnt)
        tot = sum(cnt.values())
        best = None
        pre = 0
        for i, d in enumerate(days):
            pre += cnt[d]
            n_pre, n_post = i + 1, len(days) - i - 1
            if n_pre < 3 or n_post < 3:
                continue
            post = tot - pre
            score = abs(pre * n_post - post * n_pre) * 1000000 // (
                n_pre * n_post
            )
            if best is None or score > best[0]:
                best = (score, d, n_pre, n_post, pre, post)
        assert got[k]["score_ppm"] == best[0]
        assert got[k]["split_day"] == str(best[1])
        assert got[k]["pre_sum"] == best[4]


def test_streaming_privacy_monitor_gates_each_batch(spark):
    from redshift_to_pendo_api_data_pipeline_spark.streaming.quality_monitor import (
        privacy_monitor_stream,
    )

    schema = "id long, nation string, segment string"
    batch1 = [(1, "US", "AUTO"), (2, "US", "AUTO"), (3, "US", "AUTO")]
    # FR/BIKE is a 1-row class; US/AUTO stays k-safe within the batch
    batch2 = [(4, "US", "AUTO"), (5, "US", "AUTO"), (6, "FR", "BIKE")]

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/src", f"{d}/ckpt"
        spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(src)
        for root, _, files in os.walk(src):
            for f in files:
                os.utime(os.path.join(root, f), (1000000000, 1000000000))
        spark.createDataFrame(batch2, schema).coalesce(1) \
            .write.mode("append").parquet(src)

        reports = {}

        def on_report(df, batch_id):
            reports[batch_id] = df.collect()[0].asDict()

        stream = (spark.readStream.schema(spark.read.parquet(src).schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = privacy_monitor_stream(
            stream, ["nation", "segment"], k=2,
            on_report=on_report, checkpoint_dir=ckpt,
        )
        q.processAllAvailable()
        q.stop()

    assert len(reports) >= 2
    first, last = min(reports), max(reports)
    # batch 1: one class of 3 — k=2 satisfied
    assert reports[first]["violating_classes"] == 0
    assert reports[first]["min_class_size"] == 3
    # batch 2: the FR/BIKE singleton violates
    assert reports[last]["violating_classes"] == 1
    assert reports[last]["rows_at_risk"] == 1
