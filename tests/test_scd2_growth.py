"""SCD2 history build, MoM growth, HHI concentration, stratified quota
sampling — python-recompute pinned."""

from __future__ import annotations

import hashlib
from collections import defaultdict
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
    concentration_hhi,
    mom_growth,
    scd2_from_changelog,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.sampling import (
    stratified_quota_sample,
)
from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table


def test_scd2_collapses_runs_and_closes_intervals(spark):
    rows = [
        (1, datetime(2024, 1, 1), 1, "A"),
        (1, datetime(2024, 1, 2), 2, "A"),   # same run
        (1, datetime(2024, 1, 3), 3, "B"),   # change
        (1, datetime(2024, 1, 4), 4, "A"),   # change back
        (2, datetime(2024, 1, 1), 5, None),  # NULL run start
        (2, datetime(2024, 1, 2), 6, None),  # same (null-safe)
        (2, datetime(2024, 1, 3), 7, "C"),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "tb", "attr"])
    out = sorted(
        scd2_from_changelog(df, "k", "ts", "attr", "tb").collect(),
        key=lambda r: (r["k"], r["valid_from_us"]),
    )
    hist = [(r["k"], r["attr"], r["valid_to_us"] is None) for r in out]
    assert hist == [
        (1, "A", False), (1, "B", False), (1, "A", True),
        (2, None, False), (2, "C", True),
    ]
    # intervals chain: each valid_to equals the next valid_from
    by_k = defaultdict(list)
    for r in out:
        by_k[r["k"]].append(r)
    for rows_k in by_k.values():
        for a, b in zip(rows_k, rows_k[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]


def test_scd2_matches_python_on_orders(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    got = defaultdict(list)
    for r in scd2_from_changelog(
        orders, "o_custkey", "o_orderdate", "o_orderstatus", "o_orderkey"
    ).collect():
        got[r["o_custkey"]].append(
            (r["valid_from_us"], r["o_orderstatus"], r["valid_to_us"])
        )
    src = defaultdict(list)
    for r in orders.select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus"
    ).collect():
        src[r["o_custkey"]].append(
            (r["o_orderdate"], r["o_orderkey"], r["o_orderstatus"])
        )
    for k, rows in src.items():
        rows.sort()
        runs = []
        for ts, tb, a in rows:
            if not runs or runs[-1][1] != a:
                runs.append([ts, a])
        want = []
        for i, (ts, a) in enumerate(runs):
            nxt = runs[i + 1][0] if i + 1 < len(runs) else None
            us = int(ts.timestamp() * 1_000_000)
            nus = int(nxt.timestamp() * 1_000_000) if nxt else None
            want.append((us, a, nus))
        assert sorted(got[k]) == sorted(want)


def test_mom_growth_matches_python(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    got = {(r["o_orderpriority"], r["month"]): r for r in mom_growth(
        orders, "o_orderpriority", "o_orderdate", "o_totalprice"
    ).collect()}
    import decimal

    monthly = defaultdict(int)
    for r in orders.collect():
        d = r["o_orderdate"]
        m = f"{d.year:04d}-{d.month:02d}-01"
        monthly[(r["o_orderpriority"], m)] += int(
            decimal.Decimal(str(r["o_totalprice"])).quantize(
                decimal.Decimal("0.01")) * 100
        )
    by_g = defaultdict(list)
    for (g, m), v in monthly.items():
        by_g[g].append((m, v))
    for g, pairs in by_g.items():
        pairs.sort()
        prev = None
        for m, v in pairs:
            r = got[(g, m)]
            assert r["revenue_fp"] == v
            assert r["prev_fp"] == prev
            if prev is None:
                assert r["growth_ppm"] is None
            else:
                d = (v - prev) * 1000000
                # Spark div truncates toward zero (matches DuckDB //)
                want = abs(d) // prev * (1 if d >= 0 else -1)
                assert r["growth_ppm"] == want
            prev = v


def test_concentration_hhi_bounds_and_values(spark):
    rows = [
        ("p1", "s1", 100.0),               # monopoly
        ("p2", "s1", 50.0), ("p2", "s2", 50.0),  # 50/50
    ]
    df = spark.createDataFrame(rows, ["p", "s", "v"])
    got = {r["p"]: r for r in concentration_hhi(df, "p", "s", "v").collect()}
    assert got["p1"]["hhi"] == 10000 * 10000
    assert got["p1"]["top_share_bps"] == 10000
    assert got["p2"]["hhi"] == 2 * 5000 * 5000
    assert got["p2"]["n_members"] == 2


def test_stratified_quota_sample_exact_and_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = stratified_quota_sample(docs, "source", "doc_id", 5)
    sizes = {r["source"]: r["n"] for r in out.groupBy("source")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    truth = {r["source"]: r["n"] for r in docs.groupBy("source")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {s: min(5, n) for s, n in truth.items()}
    # membership is the md5-order head, recomputed in python
    picked = defaultdict(set)
    for r in out.select("source", "doc_id").collect():
        picked[r["source"]].add(r["doc_id"])
    ids = defaultdict(list)
    for r in docs.select("source", "doc_id").collect():
        ids[r["source"]].append(r["doc_id"])
    for s, ds in ids.items():
        want = set(sorted(
            ds, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
        )[:5])
        assert picked[s] == want
    with pytest.raises(ValueError):
        stratified_quota_sample(docs, "source", "doc_id", 0)
