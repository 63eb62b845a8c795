"""Property tests for the rank-based integer statistics — on RANDOM
inputs (hypothesis), the Spark operators must reproduce a literal
pure-Python evaluation of their defining formulas: discrete quantiles
(rank ceil(q·n)), rank-cut trimmed mean, discrete Gini, and RRF fusion.
Few examples (each drives a real Spark job), wide value ranges — the
point is hammering tie/boundary cases the fixtures don't contain
(duplicate values, 1-row groups, all-equal groups)."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
    gini_coefficient,
    group_quantiles_disc,
    trimmed_mean,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
    rrf_fusion,
)

# (group, value) rows: tiny domains force duplicates and ties
rows_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)),
    min_size=1,
    max_size=40,
)


@given(rows_strategy)
@settings(max_examples=8, deadline=None)
def test_quantiles_and_trimmed_mean_on_random_groups(spark, rows):
    data = [(g, float(v), i) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, ["g", "v", "id"])

    q = {(r["g"], r["q_pm"]): r for r in group_quantiles_disc(
        df, "g", "v", "id").collect()}
    t = {r["g"]: r for r in trimmed_mean(df, "g", "v", "id", 100).collect()}

    by_g = defaultdict(list)
    for g, v, i in data:
        by_g[g].append((int(round(v * 100)), i))
    for g, vals in by_g.items():
        vals.sort()
        n = len(vals)
        for qq in (250, 500, 750, 900, 990):
            want_fp = vals[-(-qq * n // 1000) - 1][0]
            got = q[(g, qq)]
            assert int(round(got["q_value"] * 100)) == want_fp
            assert got["n"] == n
        cut = n * 100 // 1000
        kept = vals[cut: n - cut]
        assert t[g]["n_kept"] == len(kept)
        assert t[g]["trimmed_mean_fp"] == sum(v for v, _ in kept) // len(kept)


@given(rows_strategy)
@settings(max_examples=8, deadline=None)
def test_gini_on_random_groups(spark, rows):
    data = [(g, i, float(v)) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, ["g", "mem", "v"])
    got = {r["g"]: r for r in gini_coefficient(df, "g", "mem", "v").collect()}
    by_g = defaultdict(dict)
    for g, mem, v in data:
        by_g[g][mem] = by_g[g].get(mem, 0) + int(round(v * 100))
    for g, members in by_g.items():
        xs = sorted(members.items(), key=lambda kv: (kv[1], kv[0]))
        n, sx = len(xs), sum(v for _, v in xs)
        if sx == 0:
            assert got[g]["gini_ppm"] is None  # nullif guard, not a crash
            continue
        six = sum((i + 1) * v for i, (_, v) in enumerate(xs))
        want = (2 * six - (n + 1) * sx) * 1000000 // (n * sx)
        assert got[g]["gini_ppm"] == want
        # Gini of nonnegative values is always in [0, 1)
        assert 0 <= got[g]["gini_ppm"] < 1000000


@given(
    st.lists(st.integers(0, 15), min_size=1, max_size=12, unique=True),
    st.lists(st.integers(0, 15), min_size=1, max_size=12, unique=True),
)
@settings(max_examples=8, deadline=None)
def test_rrf_fusion_on_random_rankings(spark, ids_a, ids_b):
    a = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(ids_a)], ["doc", "rank"]
    )
    b = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(ids_b)], ["doc", "rank"]
    )
    got = {r["doc"]: r for r in rrf_fusion(
        [a, b], "doc", k_const=60, topn=100).collect()}
    ranks = defaultdict(list)
    for i, d in enumerate(ids_a):
        ranks[d].append(i + 1)
    for i, d in enumerate(ids_b):
        ranks[d].append(i + 1)
    for d, rs in ranks.items():
        assert got[d]["fused_ppm"] == sum(1000000 // (60 + r) for r in rs)
        assert got[d]["n_lists"] == len(rs)
        assert got[d]["best_rank"] == min(rs)
    assert set(got) == set(ranks)
