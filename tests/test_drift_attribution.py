"""Keep-best dedup, token TV drift, time-decay attribution, label
outlier screen — python-recompute pinned."""

from __future__ import annotations

from collections import Counter, defaultdict
from datetime import datetime, timedelta

import numpy as np
from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.dedup import (
    exact_dedup_keep_best,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
    label_outlier_screen,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.temporal import (
    time_decay_attribution,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.text import (
    token_drift_tv,
)
from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table


def test_keep_best_prefers_score_over_id(spark):
    rows = [
        (1, "same text", 5.0), (2, "same text", 9.0), (3, "Same   TEXT", 9.0),
        (4, "other", 1.0),
    ]
    df = spark.createDataFrame(rows, ["id", "txt", "score"])
    got = {r["id"]: r for r in exact_dedup_keep_best(
        df, "txt", "id", "score").collect()}
    # ids 1-3 share a normalized digest; best score 9.0 is tied between
    # 2 and 3 -> smallest id wins
    assert set(got) == {2, 4}
    assert got[2]["dup_count"] == 3 and got[2]["best_score"] == 9.0
    assert got[4]["dup_count"] == 1


def test_keep_best_matches_python_on_parts(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    got = {r["p_partkey"]: r for r in exact_dedup_keep_best(
        part, "p_name", "p_partkey", "p_retailprice").collect()}
    import re

    clusters = defaultdict(list)
    for r in part.select("p_partkey", "p_name", "p_retailprice").collect():
        key = re.sub(r"\s+", " ", r["p_name"].lower()).strip()
        clusters[key].append((r["p_retailprice"], r["p_partkey"]))
    for rows in clusters.values():
        best = max(rows, key=lambda x: (x[0], -x[1]))
        assert got[best[1]]["dup_count"] == len(rows)
        assert got[best[1]]["best_score"] == best[0]
    assert len(got) == len(clusters)


def test_token_drift_tv_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    side = F.col("source").isin("src0", "src1")
    got = [(r["token"], r["n_a"], r["n_b"], r["contrib_ppm"])
           for r in token_drift_tv(docs, "text", side, top_k=15).collect()]
    import re

    ca, cb = Counter(), Counter()
    for r in docs.select("text", "source").collect():
        toks = re.sub(r"\s+", " ", r["text"].lower()).strip().split(" ")
        tgt = ca if r["source"] in ("src0", "src1") else cb
        for t in toks:
            if t:
                tgt[t] += 1
    ta, tb = sum(ca.values()), sum(cb.values())
    contrib = {
        t: abs(ca[t] * 1000000 // ta - cb[t] * 1000000 // tb)
        for t in set(ca) | set(cb)
    }
    want = sorted(
        ((t, ca[t], cb[t], c) for t, c in contrib.items()),
        key=lambda x: (-x[3], x[0]),
    )[:15]
    assert got == want


def test_time_decay_credit_sums_and_weights(spark):
    base = datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        # conversion for user 1 at base; touches 0, 2 and 5 days before
        (1, base, "purchase", 100),
        (1, base - timedelta(days=0, hours=1), "click", 10),
        (1, base - timedelta(days=2, hours=1), "click", 11),
        (1, base - timedelta(days=5), "click", 12),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "et", "event_id"])
    conv = df.where(F.col("et") == "purchase")
    touch = df.where(F.col("et") == "click")
    out = {r["touch_id"]: r for r in time_decay_attribution(
        conv, touch, "user_id", "ts", "ts", "event_id", "event_id",
        half_life_days=2, window_days=7,
    ).collect()}
    # ages in days (date diff): 1, 3, 5 -> exponents 0, 1, 2
    assert out[10]["weight_ppm"] == 1000000
    assert out[11]["weight_ppm"] == 500000
    assert out[12]["weight_ppm"] == 250000
    total = sum(r["credit_ppm"] for r in out.values())
    assert total == 1000000
    # newer touches get strictly more credit
    assert out[10]["credit_ppm"] > out[11]["credit_ppm"] > out[12]["credit_ppm"]


def test_time_decay_all_conversions_sum_exactly(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    conv = ev.where(F.col("event_type") == "purchase")
    touch = ev.where(F.col("event_type").isin("click", "view"))
    out = time_decay_attribution(
        conv, touch, "user_id", "ts", "ts", "event_id", "event_id",
        half_life_days=2, window_days=7,
    )
    bad = (
        out.groupBy("conversion_id")
        .agg(F.sum("credit_ppm").alias("s"))
        .where(F.col("s") != 1000000)
        .count()
    )
    assert bad == 0 and out.count() > 0


def test_label_outlier_screen_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    got = {r["vec_id"]: r["cos_centroid"] for r in label_outlier_screen(
        emb, "embedding", "vec_id", "label").collect()}
    rows = emb.collect()
    by_label = defaultdict(list)
    for r in rows:
        by_label[r["label"]].append(
            np.round(np.array(r["embedding"]) * 1e6).astype(np.int64)
        )
    sums = {lab: np.sum(vs, axis=0) for lab, vs in by_label.items()}
    for r in rows:
        v = np.round(np.array(r["embedding"]) * 1e6).astype(np.int64)
        s = sums[r["label"]].astype(object)  # exact big-int arithmetic
        vo = v.astype(object)
        dot = int((vo * s).sum())
        vv = int((vo * vo).sum())
        qq = int((s * s).sum())
        want = round(dot / (vv ** 0.5 * qq ** 0.5), 6)
        assert abs(got[r["vec_id"]] - want) < 1e-9
    # an on-centroid vector scores higher than the screen's worst
    assert min(got.values()) < max(got.values())
