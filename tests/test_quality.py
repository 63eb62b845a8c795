"""Declarative data-quality constraints: planted violations must be
counted exactly; the suite must run as one aggregation pass plus one
broadcast anti-join per reference."""

from redshift_to_pendo_api_data_pipeline_spark.operators.quality import (
    Suite,
    accepted_values,
    in_range,
    matches,
    not_null,
    run_suite,
)


def test_suite_counts_planted_violations(spark):
    rows = [
        (1, "a@x.com", 10.0, "OK"),
        (2, None, -5.0, "OK"),          # null email, negative amount
        (2, "b@x.com", 20.0, "BAD"),    # dup id, bad status
        (3, "not-an-email", 30.0, "OK"),
    ]
    df = spark.createDataFrame(rows, "id long, email string, amount double, status string")
    parent = spark.createDataFrame([(1,), (2,)], "pid long")  # 3 is orphan

    suite = (
        Suite()
        .require(not_null("email"))
        .require(in_range("amount", lo=0))
        .require(matches("email", r"^[^@]+@[^@]+$"))
        .require(accepted_values("status", ["OK"]))
        .require_unique("id")
        .require_reference("id", parent, "pid")
    )
    out = {r["constraint"]: (r["n_violations"], r["n_checked"])
           for r in run_suite(df, suite).collect()}
    assert out["not_null(email)"] == (1, 4)
    assert out["in_range(amount)"] == (1, 4)
    assert out["matches(email)"] == (1, 4)       # null email not counted
    assert out["accepted_values(status)"] == (1, 4)
    assert out["unique(id)"] == (1, 4)           # one duplicate
    assert out["references(id)"] == (1, 4)       # id=3 orphaned


def test_clean_table_zero_violations(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    suite = Suite().require(not_null("v")).require_unique("id")
    out = run_suite(df, suite).collect()
    assert all(r["n_violations"] == 0 for r in out)
    assert all(r["n_checked"] == 2 for r in out)


def test_profile_columns_counts(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.quality import (
        profile_columns,
    )
    rows = [(1, "a"), (2, None), (2, "b"), (None, "b")]
    df = spark.createDataFrame(rows, "k int, s string")
    out = {r["column"]: r for r in profile_columns(df, ["k", "s"]).collect()}
    assert out["k"]["n_rows"] == 4 and out["k"]["n_null"] == 1
    assert out["k"]["n_distinct"] == 2
    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct"] == 2


def test_key_skew_report_values_and_plan(spark):
    """Crafted skew: hot key holds 60% of rows -> 6000 bp exactly; plan
    is top-k (TakeOrderedAndProject), and the only global window runs
    over the DISTINCT-KEY relation, never the raw stream."""
    from redshift_to_pendo_api_data_pipeline_spark.operators.quality import (
        key_skew_report,
    )

    rows = [("hot",)] * 60 + [(f"k{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_report(df, "k", top_n=5).collect()
    assert out[0]["key"] == "hot" and out[0]["n"] == 60
    assert out[0]["share_bp"] == 6000
    assert len(out) == 5 and all(r["share_bp"] == 100 for r in out[1:])
    p = key_skew_report(df, "k", top_n=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
