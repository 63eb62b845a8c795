"""Privacy audits (k-anonymity / l-diversity / suppression) and
market-basket mining (a-priori pairs, degree-oriented triangle count),
plus the benford / exact-quantile / group-kfold / char-entropy batch —
each pinned against a pure-Python recomputation on the fixture."""

from __future__ import annotations

import hashlib
import itertools
import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators import analytics as A
from redshift_to_pendo_api_data_pipeline_spark.operators import basket as B
from redshift_to_pendo_api_data_pipeline_spark.operators import privacy as P
from redshift_to_pendo_api_data_pipeline_spark.operators.sampling import group_kfold
from redshift_to_pendo_api_data_pipeline_spark.operators.text import (
    ENTROPY_ALPHABET,
    char_entropy_profile,
)
from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table


# ---------------------------------------------------------------- privacy


def test_k_anonymity_report_matches_python(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    out = {
        (r["c_nationkey"], r["c_mktsegment"]): (r["class_size"], r["at_risk"])
        for r in P.k_anonymity_report(
            cust, ["c_nationkey", "c_mktsegment"], 5
        ).collect()
    }
    truth = Counter(
        (r["c_nationkey"], r["c_mktsegment"]) for r in cust.collect()
    )
    assert out == {
        k: (n, int(n < 5)) for k, n in truth.items()
    } and len(out) > 0


def test_k_anonymity_summary_consistent_with_report(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    rep = P.k_anonymity_report(cust, ["c_nationkey", "c_mktsegment"], 5).collect()
    s = P.k_anonymity_summary(cust, ["c_nationkey", "c_mktsegment"], 5).first()
    assert s["n_classes"] == len(rep)
    assert s["violating_classes"] == sum(r["at_risk"] for r in rep)
    assert s["rows_at_risk"] == sum(
        r["class_size"] for r in rep if r["at_risk"]
    )
    assert s["min_class_size"] == min(r["class_size"] for r in rep)
    assert s["n_rows"] == cust.count()


def test_suppression_plan_rows_are_exactly_the_violators(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    k = 5
    kept = P.suppression_plan(cust, ["c_nationkey", "c_mktsegment"], k)
    sizes = Counter(
        (r["c_nationkey"], r["c_mktsegment"]) for r in cust.collect()
    )
    expect = sum(n for n in sizes.values() if n < k)
    assert kept.count() == expect
    # every surviving row's class really is under k
    bad = kept.groupBy("c_nationkey", "c_mktsegment").count().collect()
    assert all(sizes[(r["c_nationkey"], r["c_mktsegment"])] < k for r in bad)


def test_l_diversity_counts_distinct_sensitive(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    out = {
        (r["o_orderstatus"], r["o_orderpriority"]): (
            r["class_size"], r["sensitive_diversity"], r["leaks"]
        )
        for r in P.l_diversity_report(
            orders, ["o_orderstatus", "o_orderpriority"], "o_custkey", 3
        ).collect()
    }
    by_class: dict[tuple, list] = defaultdict(list)
    for r in orders.collect():
        by_class[(r["o_orderstatus"], r["o_orderpriority"])].append(
            r["o_custkey"]
        )
    for key, vals in by_class.items():
        div = len(set(vals))
        assert out[key] == (len(vals), div, int(div < 3))


def test_privacy_validates_thresholds(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    with pytest.raises(ValueError):
        P.k_anonymity_report(cust, ["c_nationkey"], 0)
    with pytest.raises(ValueError):
        P.l_diversity_report(cust, ["c_nationkey"], "c_name", 0)


# ----------------------------------------------------------------- basket


def _baskets(li_rows):
    baskets = defaultdict(set)
    for r in li_rows:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    return baskets


def test_frequent_item_pairs_matches_bruteforce(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = {
        (r["item_a"], r["item_b"]): (
            r["pair_support"], r["support_a"], r["support_b"]
        )
        for r in B.frequent_item_pairs(
            li, "l_orderkey", "l_partkey", 3, 2
        ).collect()
    }
    baskets = _baskets(li.collect())
    item_sup = Counter(i for items in baskets.values() for i in items)
    pair_sup = Counter(
        p
        for items in baskets.values()
        for p in itertools.combinations(sorted(items), 2)
    )
    want = {
        p: (n, item_sup[p[0]], item_sup[p[1]])
        for p, n in pair_sup.items()
        if n >= 3
    }
    assert got == want and len(got) > 0


def test_frequent_item_pairs_max_basket_size_guard(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    cap = 3
    got = {
        (r["item_a"], r["item_b"]): r["pair_support"]
        for r in B.frequent_item_pairs(
            li, "l_orderkey", "l_partkey", 1, 1, max_basket_size=cap
        ).collect()
    }
    baskets = {k: v for k, v in _baskets(li.collect()).items() if len(v) <= cap}
    pair_sup = Counter(
        p
        for items in baskets.values()
        for p in itertools.combinations(sorted(items), 2)
    )
    assert got == dict(pair_sup)


def test_frequent_item_pairs_supports_uncapped_under_cap(spark, sf_dir):
    """support_a/support_b report the item's TRUE (uncapped) basket
    support even when max_basket_size drops oversized baskets from
    pair counting (r8 ADVICE: the capped-universe supports silently
    pruned items whose support only cleared min_item_support via
    oversized baskets)."""
    li = load_table(spark, sf_dir, "lineitem")
    cap = 3
    rows = B.frequent_item_pairs(
        li, "l_orderkey", "l_partkey", 1, 1, max_basket_size=cap
    ).collect()
    all_baskets = _baskets(li.collect())
    item_sup = Counter(i for items in all_baskets.values() for i in items)
    capped = {k: v for k, v in all_baskets.items() if len(v) <= cap}
    pair_sup = Counter(
        p
        for items in capped.values()
        for p in itertools.combinations(sorted(items), 2)
    )
    got = {
        (r["item_a"], r["item_b"]): (
            r["pair_support"], r["support_a"], r["support_b"]
        )
        for r in rows
    }
    want = {
        p: (n, item_sup[p[0]], item_sup[p[1]]) for p, n in pair_sup.items()
    }
    assert got == want and len(got) > 0
    # at least one reported support must exceed its capped-universe
    # value, i.e. the cap genuinely dropped a basket containing it
    capped_sup = Counter(i for items in capped.values() for i in items)
    assert any(
        item_sup[a] > capped_sup[a] or item_sup[b] > capped_sup[b]
        for (a, b) in got
    )


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    edges_df = B.frequent_item_pairs(li, "l_orderkey", "l_partkey", 3, 2)
    row = B.triangle_count(edges_df, "item_a", "item_b").first()
    edges = {
        (r["item_a"], r["item_b"]) for r in edges_df.collect()
    }
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = sum(
        1
        for a, b in edges
        for c in (adj[a] & adj[b])
        if c > b  # a < b < c counts each triangle once
    )
    assert row["n_triangles"] == tri
    assert row["n_edges"] == len(edges)
    assert row["n_nodes"] == len(adj)


def test_triangle_count_handles_duplicates_and_loops(spark):
    # raw, messy edge list: duplicates both ways + a self-loop
    rows = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 3), (3, 4)]
    df = spark.createDataFrame(rows, ["src", "dst"])
    row = B.triangle_count(df).first()
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (4, 4, 1)


# ------------------------------------------------------ benford/quantiles


def test_benford_counts_and_ppm(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    got = {r["digit"]: r for r in A.benford_first_digit(
        orders, "o_totalprice").collect()}
    import decimal
    digs = []
    for r in orders.collect():
        q = decimal.Decimal(str(abs(r["o_totalprice"]))).quantize(
            decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP
        )
        s = "".join(ch for ch in str(q) if ch in "123456789")
        if s:
            digs.append(int(s[0]))
    cnt = Counter(digs)
    tot = sum(cnt.values())
    for d, n in cnt.items():
        assert got[d]["n"] == n
        assert got[d]["observed_ppm"] == n * 1000000 // tot
        assert got[d]["dev_ppm"] == (
            got[d]["observed_ppm"] - got[d]["expected_ppm"]
        )
    # expected shares are the Benford law in ppm and sum to 1e6
    assert sum(r["expected_ppm"] for r in got.values() if True) <= 1000000
    for d, r in got.items():
        assert r["expected_ppm"] == int(
            round(math.log10(1 + 1 / d) * 1000000)
        ) or abs(r["expected_ppm"] - math.log10(1 + 1 / d) * 1e6) < 1


def test_group_quantiles_disc_rank_semantics(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    out = A.group_quantiles_disc(
        orders, "o_orderpriority", "o_totalprice", "o_orderkey"
    ).collect()
    by_grp = defaultdict(list)
    for r in orders.collect():
        by_grp[r["o_orderpriority"]].append(
            (r["o_totalprice"], r["o_orderkey"])
        )
    for grp, vals in by_grp.items():
        vals.sort()
        n = len(vals)
        for q in (250, 500, 750, 900, 990):
            want = vals[-(-q * n // 1000) - 1][0]
            got = next(
                r for r in out
                if r["o_orderpriority"] == grp and r["q_pm"] == q
            )
            assert got["q_value"] == want and got["n"] == n


# -------------------------------------------------------- kfold / entropy


def test_group_kfold_is_pure_function_of_group(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    out = group_kfold(orders, "o_custkey", 5)
    # one fold per customer — no customer straddles folds
    per_cust = out.groupBy("o_custkey").agg(
        F.countDistinct("fold").alias("nf")
    )
    assert per_cust.agg(F.max("nf")).first()[0] == 1
    # fold matches the md5 formula row by row
    for r in out.select("o_custkey", "fold").distinct().collect():
        h = int(hashlib.md5(str(r["o_custkey"]).encode()).hexdigest()[:4], 16)
        assert r["fold"] == h * 5 // 65536
    assert out.select("fold").distinct().count() == 5


def test_group_kfold_validates_k(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError):
        group_kfold(orders, "o_custkey", 0)


def test_char_entropy_profile_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(40)
    got = {r["doc"]: r for r in char_entropy_profile(
        docs, "text", "doc_id").collect()}
    for r in docs.collect():
        s = r["text"].lower()
        n = len(s)
        if n == 0:
            assert r["doc_id"] not in got
            continue
        counts = [s.count(c) for c in ENTROPY_ALPHABET]
        other = n - sum(counts)
        ent = sum(
            c * ((n // c).bit_length()) for c in counts + [other] if c > 0
        )
        g = got[r["doc_id"]]
        assert g["n_chars"] == n
        assert g["ent_bits_x_n"] == ent
        assert g["distinct_symbols"] == sum(1 for c in counts if c > 0)
        assert g["top_symbol_count"] == max(counts + [other])


def test_char_entropy_degenerate_text_scores_low(spark):
    df = spark.createDataFrame(
        [(1, "aaaaaaaaaaaaaaaa"), (2, "the quick brown fox jumps")],
        ["doc_id", "text"],
    )
    rows = {r["doc"]: r for r in char_entropy_profile(
        df, "text", "doc_id").collect()}
    # 'aaaa...': one symbol, bitlen(n/n)=1 -> ent == n; diverse text far higher
    assert rows[1]["ent_bits_x_n"] == rows[1]["n_chars"]
    assert rows[1]["distinct_symbols"] == 1
    assert rows[2]["ent_bits_x_n"] > 2 * rows[2]["n_chars"]


def _pagerank_ref(edges, n_iter=3, damping_ppm=850_000, mass=10**12):
    """Pure-Python mirror of pagerank_fixed's integer recurrence."""
    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = len(adj)
    base = (mass // n) * (1_000_000 - damping_ppm) // 1_000_000
    r = {v: mass // n for v in adj}
    for _ in range(n_iter):
        share = {v: r[v] // len(adj[v]) for v in adj}
        r = {
            v: base
            + damping_ppm * sum(share[u] for u in adj[v]) // 1_000_000
            for v in adj
        }
    return r


def test_pagerank_matches_python_reference(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.basket import (
        pagerank_fixed,
    )

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (6, 3),
             (2, 1), (7, 7)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank_fixed(df, n_iter=3).collect()
    }
    assert got == _pagerank_ref(edges)
    # the hub (node 3, degree 5) outranks every leaf
    assert got[3] == max(got.values())


def test_pagerank_validation(spark):
    import pytest as _pytest

    from redshift_to_pendo_api_data_pipeline_spark.operators.basket import (
        pagerank_fixed,
    )

    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with _pytest.raises(ValueError, match="n_iter"):
        pagerank_fixed(df, n_iter=0)


def test_k_hop_reachability_min_dist(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.basket import (
        k_hop_reachability,
    )

    # path 1-2-3-4-5 plus shortcut 1-4: dist(4)=1 via shortcut, 5=2
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4), (6, 7)],
        ["src", "dst"],
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {r["node"]: r["dist"] for r in k_hop_reachability(
        edges, seeds, k=3).collect()}
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}
    # 6,7 unreachable -> absent; k bounds the expansion
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must"):
        k_hop_reachability(edges, seeds, k=0)


def test_related_items_per_item_topk(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.basket import (
        related_items,
    )

    edges = spark.createDataFrame(
        [("a", "b", 6, 10, 12), ("a", "c", 8, 10, 8), ("b", "c", 4, 12, 8)],
        ["item_a", "item_b", "pair_support", "support_a", "support_b"],
    )
    out = related_items(edges, n_baskets=100, per_item_k=1).collect()
    by_ante = {r["antecedent"]: r for r in out}
    # every item surfaces with exactly its single best consequent
    assert set(by_ante) == {"a", "b", "c"}
    # a: lift(b)=6*100e6/(10*12)=50e6? -> 6*100*1e6//120 = 5_000_000;
    #    lift(c)=8*100*1e6//80 = 10_000_000 -> c wins
    assert by_ante["a"]["consequent"] == "c"
    assert by_ante["a"]["lift_ppm"] == 10_000_000
    assert all(r["rank"] == 1 for r in out)
