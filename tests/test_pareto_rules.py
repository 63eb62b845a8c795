"""Distributed prefix sum, ABC analysis, trimmed mean, association
rules, degree distribution — python-recompute pinned."""

from __future__ import annotations

import decimal
import itertools
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
    abc_analysis,
    global_prefix_sum,
    trimmed_mean,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.basket import (
    association_rules,
    degree_distribution,
    frequent_item_pairs,
)
from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table


def _fp(x):
    return int(decimal.Decimal(str(x)).quantize(decimal.Decimal("0.01")) * 100)


def test_global_prefix_sum_matches_sequential(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        .alias("v"),
    )
    out = {r["o_orderkey"]: r["cum_value"] for r in global_prefix_sum(
        orders, [F.col("v").desc(), F.col("o_orderkey").asc()], "v"
    ).collect()}
    rows = sorted(
        ((r["o_orderkey"], r["v"]) for r in orders.collect()),
        key=lambda x: (-x[1], x[0]),
    )
    run = 0
    for k, v in rows:
        run += v
        assert out[k] == run
    assert len(out) == len(rows)


def test_global_prefix_sum_no_global_window_over_data(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        .alias("v"),
    )
    plan = global_prefix_sum(
        orders, [F.col("v").desc(), F.col("o_orderkey").asc()], "v"
    )._jdf.queryExecution().executedPlan().toString()
    # the only partitionBy-less window runs over the nparts-bounded
    # offsets relation; the data-sized windows are keyed on __pid
    assert "__pid" in plan


def test_abc_analysis_matches_python(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = {r["abc_class"]: r for r in abc_analysis(
        li, "l_partkey", "l_extendedprice").collect()}
    rev = defaultdict(int)
    for r in li.select("l_partkey", "l_extendedprice").collect():
        rev[r["l_partkey"]] += _fp(r["l_extendedprice"])
    items = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    tot = sum(rev.values())
    want = defaultdict(lambda: [0, 0])
    cum = 0
    for k, v in items:
        share = cum * 1000000 // tot
        cls = "A" if share < 800000 else ("B" if share < 950000 else "C")
        want[cls][0] += 1
        want[cls][1] += v
        cum += v
    for cls, (n, v) in want.items():
        assert got[cls]["n_items"] == n
        assert got[cls]["revenue_fp"] == v
        assert got[cls]["revenue_share_ppm"] == v * 1000000 // tot
    assert set(got) == set(want)


def test_trimmed_mean_matches_python(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    got = {r["o_orderpriority"]: r for r in trimmed_mean(
        orders, "o_orderpriority", "o_totalprice", "o_orderkey", 50
    ).collect()}
    groups = defaultdict(list)
    for r in orders.collect():
        groups[r["o_orderpriority"]].append(
            (_fp(r["o_totalprice"]), r["o_orderkey"])
        )
    for g, vals in groups.items():
        vals.sort()
        n = len(vals)
        cut = n * 50 // 1000
        kept = vals[cut: n - cut]
        assert got[g]["n_total"] == n
        assert got[g]["n_kept"] == len(kept)
        assert got[g]["trimmed_mean_fp"] == sum(v for v, _ in kept) // len(kept)
    with pytest.raises(ValueError):
        trimmed_mean(orders, "o_orderpriority", "o_totalprice",
                     "o_orderkey", 500)


def test_association_rules_confidence_and_lift(spark):
    # 4 baskets: {x,y} x3, {x} x1 -> conf(x->y)=3/4, conf(y->x)=1
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "y"),
            (4, "x")]
    df = spark.createDataFrame(rows, ["b", "i"])
    edges = frequent_item_pairs(df, "b", "i", 1, 1)
    out = {(r["antecedent"], r["consequent"]): r for r in association_rules(
        edges, n_baskets=4, top_k=10).collect()}
    assert out[("x", "y")]["confidence_ppm"] == 750000
    assert out[("y", "x")]["confidence_ppm"] == 1000000
    # lift = 3*4/(4*3) = 1.0 exactly
    assert out[("x", "y")]["lift_ppm"] == 1000000
    assert out[("y", "x")]["lift_ppm"] == 1000000


def test_degree_distribution_matches_python(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    edges = frequent_item_pairs(li, "l_orderkey", "l_partkey", 3, 2)
    got = {r["degree"]: r["n_nodes"] for r in degree_distribution(
        edges, "item_a", "item_b").collect()}
    deg = Counter()
    for r in edges.collect():
        deg[r["item_a"]] += 1
        deg[r["item_b"]] += 1
    want = Counter(deg.values())
    assert got == dict(want)


def test_table_fingerprint_detects_any_row_change(spark, sf_dir):
    import hashlib

    from redshift_to_pendo_api_data_pipeline_spark.operators.quality import (
        table_fingerprint,
    )

    cust = load_table(spark, sf_dir, "customer")
    fp = table_fingerprint(cust, ["c_custkey", "c_name"]).first()
    # python recompute of the order-independent checksum
    want = 0
    for r in cust.select("c_custkey", "c_name").collect():
        s = f"{r['c_custkey']}|{r['c_name']}"
        want += int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
    assert fp["checksum"] == want and fp["n_rows"] == cust.count()
    # dropping one row changes the fingerprint; reordering doesn't
    fp2 = table_fingerprint(
        cust.where(F.col("c_custkey") != 0), ["c_custkey", "c_name"]
    ).first()
    assert fp2["checksum"] != fp["checksum"]
    fp3 = table_fingerprint(
        cust.orderBy(F.desc("c_name")).repartition(7), ["c_custkey", "c_name"]
    ).first()
    assert fp3["checksum"] == fp["checksum"]


def test_contingency_chi2_matches_scipy_free_python(spark):
    # hand table: group a 30/100 positive, group b 70/100 positive
    rows = [("a", i < 30) for i in range(100)] + [
        ("b", i < 70) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["g", "flag"])
    from redshift_to_pendo_api_data_pipeline_spark.operators.quality import (
        contingency_chi2,
    )

    got = {r["g"]: r for r in contingency_chi2(
        df, "g", F.col("flag")).collect()}
    grand, col_pos = 200, 100
    for g, pos, row_n in (("a", 30, 100), ("b", 70, 100)):
        tp = pos * grand - row_n * col_pos
        tn = (row_n - pos) * grand - row_n * (grand - col_pos)
        want = (tp * tp * 1000000) // (row_n * col_pos * grand) + (
            tn * tn * 1000000
        ) // (row_n * (grand - col_pos) * grand)
        assert got[g]["chi2_contrib_fp"] == want
    # the true chi2 here is 32.0; scaled total = chi2 * grand * 1e6 / ...
    # sanity: both groups contribute equally for a symmetric 2x2
    assert got["a"]["chi2_contrib_fp"] == got["b"]["chi2_contrib_fp"]
    assert got["a"]["chi2_contrib_fp"] > 0


def test_frequent_triples_matches_bruteforce(spark, sf_dir):
    from redshift_to_pendo_api_data_pipeline_spark.operators.basket import (
        frequent_item_triples,
    )

    li = load_table(spark, sf_dir, "lineitem")
    got = {
        (r["item_a"], r["item_b"], r["item_c"]): r["triple_support"]
        for r in frequent_item_triples(
            li, "l_orderkey", "l_partkey", 2, 2).collect()
    }
    baskets = defaultdict(set)
    for r in li.select("l_orderkey", "l_partkey").collect():
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    tri = Counter(
        t
        for items in baskets.values()
        for t in itertools.combinations(sorted(items), 3)
    )
    want = {t: n for t, n in tri.items() if n >= 2}
    assert got == want and len(got) > 0


def test_cli_reconcile_match_and_mismatch(spark, sf_dir, tmp_path):
    import json as _json

    from redshift_to_pendo_api_data_pipeline_spark.cli import cmd_reconcile

    cust = load_table(spark, sf_dir, "customer")
    cust.write.parquet(str(tmp_path / "a"))
    # same rows, different order/partitioning -> must match
    cust.orderBy(F.desc("c_name")).repartition(3).write.parquet(
        str(tmp_path / "b")
    )
    cust.where(F.col("c_custkey") != 0).write.parquet(str(tmp_path / "c"))
    rc = cmd_reconcile(
        {"left": str(tmp_path / "a"), "right": str(tmp_path / "b"),
         "keys": ["c_custkey", "c_name"]}
    )
    assert rc == 0
    rc = cmd_reconcile(
        {"left": str(tmp_path / "a"), "right": str(tmp_path / "c"),
         "keys": ["c_custkey", "c_name"]}
    )
    assert rc == 3
