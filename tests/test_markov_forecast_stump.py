"""Unit tests for round-7 session-6 batch 3: Markov removal-effect
attribution, seasonal-naive MASE, Gini split scan, LOO slope influence."""

from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
    loo_group_slope_influence,
    markov_removal_attribution,
    seasonal_naive_mase,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.classifier import (
    gini_split_scan,
)


def test_markov_removal_two_channel(spark):
    # user 1: a -> buy ; user 2: b (no conversion) ; user 3: a -> buy
    rows = [
        (1, "a", 1, 1), (1, "buy", 2, 2),
        (2, "b", 1, 3),
        (3, "a", 1, 4), (3, "buy", 2, 5),
    ]
    df = spark.createDataFrame(rows, ["u", "c", "ts", "eid"])
    out = {r["channel"]: r for r in markov_removal_attribution(
        df, "u", "c", "ts", "eid", "buy", n_steps=4
    ).collect()}
    # chain: start->a (2), start->b (1), a->conv (2), b->drop (1)
    # base reach = (2*1e6//3 via a path)... a converts always, b never:
    # p(start) = (2*p(a) + 1*p(b)) // 3 = (2*1e6 + 0) // 3 = 666666
    assert out["a"]["base_reach_ppm"] == 666666
    # removing a: start->a reroutes to drop -> reach 0; effect = 666666
    assert out["a"]["removal_effect_ppm"] == 666666
    # removing b: start->b reroutes to drop, a-path intact:
    # reach = 2*1e6 // 3 = 666666 -> effect 0
    assert out["b"]["removal_effect_ppm"] == 0
    assert out["a"]["credit_ppm"] == 1_000_000 and out["b"]["credit_ppm"] == 0


def test_markov_truncates_at_first_conversion(spark):
    # post-conversion events must not create transitions
    rows = [
        (1, "a", 1, 1), (1, "buy", 2, 2), (1, "b", 3, 3), (1, "buy", 4, 4),
    ]
    df = spark.createDataFrame(rows, ["u", "c", "ts", "eid"])
    out = {r["channel"]: r for r in markov_removal_attribution(
        df, "u", "c", "ts", "eid", "buy", n_steps=4
    ).collect()}
    assert set(out) == {"a"}  # b only appears after conversion


def test_seasonal_mase_perfect_weekly_pattern(spark):
    # value repeats with period 7 exactly -> seasonal error 0, mase 0
    rows = [("t", d, 100 + (d % 7) * 10) for d in range(21)]
    df = spark.createDataFrame(rows, ["g", "day", "v"])
    out = seasonal_naive_mase(df, "g", "day", "v", season=7).collect()[0]
    assert out["n_days"] == 14  # first 7 days lack a lag-7 forecast
    assert out["sae_seasonal"] == 0 and out["mase_ppm"] == 0
    assert out["sae_naive"] > 0


def test_gini_split_separable(spark):
    # v in 0..99 with 10 bins -> bin = v div 10 exactly; label 1 iff
    # v >= 60 aligns with the bin-5/6 boundary: a pure stump exists
    rows = [(v, 1 if v >= 60 else 0) for v in range(100)]
    df = spark.createDataFrame(rows, ["v", "y"])
    out = gini_split_scan(df, "v", "y", n_bins=10, top_k=3).collect()
    best = out[0]
    assert best["weighted_gini_ppm"] == 0  # perfectly pure partition
    assert best["pos_left"] == 0 and best["pos_right"] == best["n_right"]


def test_loo_influence_outlier_group(spark):
    # groups a,b on the line y = 2x; group c wildly off -> removing c
    # moves the slope the most
    rows = (
        [("a", x, 2 * x) for x in range(1, 11)]
        + [("b", x, 2 * x) for x in range(11, 21)]
        + [("c", x, 100 * x) for x in range(1, 6)]
    )
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r["g"]: r for r in
           loo_group_slope_influence(df, "g", "x", "y").collect()}
    assert out["c"]["slope_without_ppm"] == 2_000_000  # exact without c
    assert out["a"]["slope_global_ppm"] == out["c"]["slope_global_ppm"]

    # algebraic identity: slope_without(g) must equal the slope computed
    # directly over the complement, in the same integer truncation
    def slope_ppm(pts):
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        q = abs(num * 1_000_000) // abs(den)  # truncate toward zero
        return q if (num >= 0) == (den >= 0) else -q

    for g in ("a", "b", "c"):
        comp = [(x, y) for gg, x, y in rows if gg != g]
        assert out[g]["slope_without_ppm"] == slope_ppm(comp)
        assert out[g]["influence_ppm"] == (
            out[g]["slope_without_ppm"] - out[g]["slope_global_ppm"]
        )
