"""Unit tests for round-7 session-6 batch 2: exact Shapley attribution,
label-propagation communities, Kaplan-Meier survival, deletion-cascade
audit."""

from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
    shapley_channel_credits,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.basket import lpa_communities
from redshift_to_pendo_api_data_pipeline_spark.operators.privacy import (
    deletion_cascade_audit,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.temporal import kaplan_meier


def test_shapley_two_channels_hand_computed(spark):
    # users: {A} converts 1/1; {B} converts 0/1; {A,B} converts 1/1
    rows = [
        (1, "a", 0), (1, "buy", 1),          # mask {a}, conv
        (2, "b", 0),                          # mask {b}, no conv
        (3, "a", 0), (3, "b", 0), (3, "buy", 1),  # mask {a,b}, conv
    ]
    df = spark.createDataFrame(rows, ["u", "ch", "conv"])
    out = {r["channel"]: r for r in
           shapley_channel_credits(df, "u", "ch", "conv", ["a", "b"]).collect()}
    # n=2: v({a})=1e6, v({b})=0, v({a,b})=1e6, v(empty)=0
    # phi_a*2! = 1*(v{a}-0) + 1*(v{ab}-v{b}) = 2e6 -> phi_a = 1e6
    # phi_b*2! = 1*(v{b}-0) + 1*(v{ab}-v{a}) = 0   -> phi_b = 0
    assert out["a"]["phi_scaled"] == 2_000_000 and out["a"]["phi_ppm"] == 1_000_000
    assert out["b"]["phi_scaled"] == 0 and out["b"]["phi_ppm"] == 0
    # efficiency: sum of phi equals v(grand coalition) (exact here,
    # no truncation losses in this construction)
    assert sum(r["phi_ppm"] for r in out.values()) == 1_000_000


def test_lpa_two_cliques_converge(spark):
    # two triangles joined by nothing: labels collapse to each clique's min
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        ["item_a", "item_b"],
    )
    out = {r["community"]: r for r in
           lpa_communities(edges, n_iter=3).collect()}
    assert set(out) == {1, 10}
    assert out[1]["n_nodes"] == 3 and out[1]["max_node"] == 3
    assert out[10]["n_nodes"] == 3 and out[10]["min_node"] == 10


def test_kaplan_meier_textbook(spark):
    # classic: durations 1(ev) 2(ev) 3(cens) 4(ev) 5(cens)
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 0), (4, 1), (5, 0)], ["dur", "ev"]
    )
    rows = {r["t"]: r for r in kaplan_meier(df, "dur", "ev").collect()}
    assert set(rows) == {1, 2, 4}  # censoring-only times don't appear
    assert rows[1]["n_risk"] == 5 and abs(rows[1]["survival"] - 0.8) < 1e-9
    assert rows[2]["n_risk"] == 4 and abs(rows[2]["survival"] - 0.6) < 1e-9
    # at t=4: risk set {4,5} -> S = 0.6 * (1 - 1/2) = 0.3
    assert rows[4]["n_risk"] == 2 and abs(rows[4]["survival"] - 0.3) < 1e-9


def test_kaplan_meier_total_death_hits_zero(spark):
    df = spark.createDataFrame([(1, 1), (2, 1), (2, 1)], ["dur", "ev"])
    rows = {r["t"]: r for r in kaplan_meier(df, "dur", "ev").collect()}
    # at t=2 the whole remaining risk set dies: S = 0 exactly, no ln(0)
    assert rows[2]["survival"] == 0.0


def test_deletion_cascade_counts(spark):
    cust = spark.createDataFrame([(1,), (2,), (3,)], ["c_custkey"])
    orders = spark.createDataFrame(
        [(100, 1), (101, 1), (102, 2)], ["o_orderkey", "o_custkey"]
    )
    li = spark.createDataFrame(
        [(100, 7), (100, 8), (102, 9)], ["l_orderkey", "x"]
    )
    subs = cust.where(F.col("c_custkey") == 1)
    li_c = li.join(orders, li.l_orderkey == orders.o_orderkey).select("o_custkey")
    out = {r["table_name"]: r["n_rows"] for r in deletion_cascade_audit(
        subs,
        [("customer", cust, "c_custkey"),
         ("orders", orders, "o_custkey"),
         ("lineitem", li_c, "o_custkey")],
        "c_custkey",
    ).collect()}
    assert out == {"customer": 1, "orders": 2, "lineitem": 2}
