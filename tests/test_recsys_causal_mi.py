"""Unit tests for round-7 session-6 batch 5: recommender hit-rate@k,
next-event accuracy, difference-in-differences, mutual information."""

import math

from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
    did_estimate,
    mutual_information_binned,
    next_event_accuracy,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.basket import hitrate_at_k


def test_hitrate_mined_pair_predicts_holdout(spark):
    # items 1,2 co-occur in 3 train baskets (mined); basket 100 holds
    # {1,2} -> hit; basket 101 holds {1,9} (9 never mined) -> miss
    train = spark.createDataFrame(
        [(b, i) for b in (10, 11, 12) for i in (1, 2)]
        + [(13, 1), (13, 3), (14, 2), (14, 3)],
        ["basket", "item"],
    )
    test = spark.createDataFrame(
        [(100, 1), (100, 2), (101, 1), (101, 9), (102, 7)],
        ["basket", "item"],
    )
    out = hitrate_at_k(train, test, "basket", "item",
                       per_item_k=3, min_pair_support=3,
                       min_item_support=2).collect()[0]
    # basket 102 has one item -> not eligible
    assert out["n_test_baskets"] == 2
    assert out["n_hits"] == 1
    assert out["hitrate_pm"] == 500


def test_next_event_accuracy_learned_successor(spark):
    # train: a->b dominates (3 of 4), a->c once; test: a->b, a->c
    rows_train = []
    eid = 0
    for u, seq in [(1, "ab"), (2, "ab"), (3, "ab"), (4, "ac")]:
        for i, ch in enumerate(seq):
            rows_train.append((u, ch, i, (eid := eid + 1)))
    rows_test = []
    for u, seq in [(10, "ab"), (15, "ac")]:
        for i, ch in enumerate(seq):
            rows_test.append((u, ch, i, (eid := eid + 1)))
    train = spark.createDataFrame(rows_train, ["u", "t", "ts", "eid"])
    test = spark.createDataFrame(rows_test, ["u", "t", "ts", "eid"])
    out = next_event_accuracy(train, test, "u", "t", "ts", "eid").collect()[0]
    assert out["n_test"] == 2 and out["n_covered"] == 2
    assert out["n_correct"] == 1  # model predicts b after a
    assert out["accuracy_pm"] == 500 and out["coverage_pm"] == 1000


def test_did_recovers_planted_effect(spark):
    # control: 100 -> 110 (+10); treated: 200 -> 250 (+50); DiD = +40
    rows = (
        [(0, 0, 100)] * 5 + [(0, 1, 110)] * 5
        + [(1, 0, 200)] * 5 + [(1, 1, 250)] * 5
    )
    df = spark.createDataFrame(rows, ["t", "p", "v"])
    out = did_estimate(df, "t", "p", "v").collect()[0]
    assert out["m00"] == 100_000_000 and out["m11"] == 250_000_000
    assert out["did_ppm"] == 40_000_000
    assert out["n00"] == 5


def test_mutual_information_extremes(spark):
    # perfectly dependent: MI = ln(2) nats; independent: MI = 0
    dep = spark.createDataFrame(
        [(0, "x")] * 10 + [(1, "y")] * 10, ["a", "b"]
    )
    out = mutual_information_binned(dep, "a", "b").collect()[0]
    assert out["n_cells"] == 2
    assert abs(out["mi_micro_nats"] - round(math.log(2) * 1e6)) <= 1
    ind = spark.createDataFrame(
        [(0, "x")] * 5 + [(0, "y")] * 5 + [(1, "x")] * 5 + [(1, "y")] * 5,
        ["a", "b"],
    )
    out2 = mutual_information_binned(ind, "a", "b").collect()[0]
    assert out2["mi_micro_nats"] == 0
