"""Round-2b widened analytics operators: heavy hitters, sliding frames,
ntile bucketing, sorted string-agg, median/mode, weighted sampling."""

from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators import analytics as A
from redshift_to_pendo_api_data_pipeline_spark.operators import sampling as SA
from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table


def test_heavy_hitters_threshold_is_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = {r["user_id"]: r["n"] for r in A.heavy_hitters(ev, "user_id", 30).collect()}
    truth = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
        if r["n"] >= 30
    }
    assert out == truth and len(out) > 0


def test_sliding_frame_stats_matches_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = A.sliding_frame_stats(ev, "user_id", "ts", "event_id", "value", 4)
    one_user = out.where(F.col("user_id") == out.first()["user_id"])
    rows = sorted(one_user.collect(), key=lambda r: r["event_id"])
    src = {
        r["event_id"]: r
        for r in ev.where(F.col("user_id") == rows[0]["user_id"]).collect()
    }
    ordered = sorted(src.values(), key=lambda r: (r["ts"], r["event_id"]))
    for i, r in enumerate(ordered):
        frame = ordered[max(0, i - 3) : i + 1]
        want = round(sum(round(x["value"], 2) for x in frame) * 100)
        got = next(o for o in rows if o["event_id"] == r["event_id"])
        assert got["frame_n"] == len(frame)
        assert abs(got["frame_sum_fp2"] - want) <= 1  # fp2 vs float re-round

    # frame never exceeds the configured size
    assert out.agg(F.max("frame_n")).first()[0] <= 4


def test_ntile_buckets_are_balanced(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    out = A.ntile_buckets(orders, "o_totalprice", "o_orderkey", 10, "o_totalprice").collect()
    n_total = orders.count()
    sizes = {r["bucket"]: r["n"] for r in out}
    assert set(sizes) == set(range(1, 11))
    assert sum(sizes.values()) == n_total
    assert max(sizes.values()) - min(sizes.values()) <= 1  # SQL ntile balance


def test_grouped_sorted_concat_deterministic(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    a = {r["c_nationkey"]: r["values_csv"]
         for r in A.grouped_sorted_concat(cust, "c_nationkey", "c_mktsegment").collect()}
    b = {r["c_nationkey"]: r["values_csv"]
         for r in A.grouped_sorted_concat(
             cust.repartition(13), "c_nationkey", "c_mktsegment").collect()}
    assert a == b  # sort inside the agg => partitioning-invariant
    assert all("," in v or v for v in a.values())
    for v in a.values():
        parts = v.split(",")
        assert parts == sorted(parts)


def test_median_and_min_mode_semantics(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 2), ("a", 9),
         ("b", 5), ("b", 7), ("b", 7), ("b", 3), ("b", 3)],
        "k string, v long",
    )
    out = {r["k"]: r for r in A.median_and_min_mode(df, "k", "v").collect()}
    assert out["a"]["median_value"] == 2.0
    assert out["a"]["mode_value"] == 2 and out["a"]["mode_n"] == 2
    assert out["b"]["median_value"] == 5.0
    # tie between 7 (x2) and 3 (x2): min value wins deterministically
    assert out["b"]["mode_value"] == 3 and out["b"]["mode_n"] == 2


def test_weighted_hash_sample_proportionality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = SA.weighted_hash_sample(docs, "doc_id", "n_chars", max_weight=512)
    # long docs must be kept at a visibly higher rate than short docs
    # (n_chars spans ~47-560 in the synthetic corpus)
    stats = (
        docs.withColumn("long", F.col("n_chars") >= 300)
        .groupBy("long").agg(F.count(F.lit(1)).alias("n_all"))
    ).collect()
    kept = (
        out.withColumn("long", F.col("n_chars") >= 300)
        .groupBy("long").agg(F.count(F.lit(1)).alias("n_kept"))
    ).collect()
    n_all = {r["long"]: r["n_all"] for r in stats}
    n_kept = {r["long"]: r["n_kept"] for r in kept}
    rate_long = n_kept.get(True, 0) / max(n_all.get(True, 1), 1)
    rate_short = n_kept.get(False, 0) / max(n_all.get(False, 1), 1)
    assert rate_long > rate_short
    # deterministic: same inputs, same membership, any partitioning
    ids = {r["doc_id"] for r in out.collect()}
    ids_rp = {
        r["doc_id"]
        for r in SA.weighted_hash_sample(
            docs.repartition(7), "doc_id", "n_chars", max_weight=512
        ).collect()
    }
    assert ids == ids_rp


def test_count_min_sketch_overestimates_and_is_exact_without_collisions(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import count_min_sketch

    rows = [(k, i) for k in range(10) for i in range(k + 1)]  # key k appears k+1 times
    df = spark.createDataFrame(rows, "user_id long, seq long")
    # 10 keys into width 4096, depth 4: P(some key collides in ALL 4 rows)
    # is ~0, so every estimate equals the exact count
    wide = count_min_sketch(df, "user_id", depth=4, width=4096).collect()
    assert all(r.cms_est == r.exact_n for r in wide)
    # width 2 forces collisions: the estimate never undercounts
    narrow = count_min_sketch(df, "user_id", depth=2, width=2).collect()
    assert all(r.cms_est >= r.exact_n for r in narrow)
    total = sum(k + 1 for k in range(10))
    assert all(r.cms_est <= total for r in narrow)


def test_retention_cohorts_crafted(spark):
    rows = [
        # user 1: first week w0, active w0 and w2
        (1, "2024-01-01 10:00:00"), (1, "2024-01-15 10:00:00"),
        # user 2: first week w0 only
        (2, "2024-01-03 10:00:00"),
        # user 3: first week w1, active w1, w2
        (3, "2024-01-08 10:00:00"), (3, "2024-01-16 10:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in A.retention_cohorts(df, "user_id", "ts").collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


def test_windowed_anomalies_flags_spike_only(spark):
    rows = [(1, f"2024-01-01 00:00:{i:02d}", float(i + 1), 10.0 if i != 14 else 500.0)
            for i in range(20)]
    df = spark.createDataFrame(rows, "user_id int, ts string, event_id double, value double")
    df = df.select("user_id", F.col("ts").cast("timestamp").alias("ts"),
                   F.col("event_id").cast("long").alias("event_id"), "value")
    out = A.windowed_anomalies(df, "user_id", "ts", "value", "event_id",
                               frame=20, min_n=10, z=2)
    flagged = [r["event_id"] for r in out.where(F.col("is_anomaly") == 1).collect()]
    assert flagged == [15]  # only the 500.0 spike (event_id 15, i=14)


def test_windowed_anomalies_respects_min_n(spark):
    rows = [(1, f"2024-01-01 00:00:{i:02d}", i, 10.0 if i < 4 else 999.0)
            for i in range(5)]
    df = spark.createDataFrame(rows, "user_id int, ts string, event_id long, value double")
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    out = A.windowed_anomalies(df, "user_id", "ts", "value", "event_id", min_n=10)
    assert out.where(F.col("is_anomaly") == 1).count() == 0


def test_ewm_weighted_sum_crafted(spark):
    rows = [(1, "2024-01-01 00:00:01", 1, 1.0),
            (1, "2024-01-01 00:00:02", 2, 2.0),
            (1, "2024-01-01 00:00:03", 3, 3.0)]
    df = spark.createDataFrame(
        rows, "user_id int, ts string, event_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["event_id"]: (r["frame_n"], r["ewm_num"])
           for r in A.ewm_weighted_sum(df, "user_id", "ts", "event_id",
                                       "value", frame=8).collect()}
    # newest weight 2^(m-1): [100]=100; [100,200]=2*200+100; [..,300]=4*300+2*200+100
    assert out == {1: (1, 100), 2: (2, 500), 3: (3, 1700)}


def test_hll_registers_accuracy_and_scale_shape(spark):
    """HLL (round 7): the register-table estimate lands within the
    theoretical 1.04/sqrt(m) band of the exact distinct count for
    several true cardinalities, and the plan partial-aggregates the
    rank max map-side (the shuffle carries at most m register rows per
    map task, never the key stream) with no Python anywhere."""
    for n_true in (80, 1000, 20000):
        df = spark.range(n_true).select(
            (F.col("id") * 7919 + 13).alias("k"))
        regs = A.hyperloglog_registers(df, "k", m=256)
        est = A.hll_estimate([r["register"] for r in regs.collect()], m=256)
        # 3 sigma + small-range correction slack
        assert abs(est - n_true) / n_true < 0.25, (n_true, est)
        p = regs._jdf.queryExecution().executedPlan().toString()
        assert "partial_max" in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_hll_registers_grouped_and_staged_roundtrip(spark, tmp_path):
    """Grouped registers: each group's sketch is independent (a group
    whose keys are a subset has component-wise <= registers is NOT
    generally true, but identical key sets give identical registers);
    staging the hash words and recomputing from the staged relation is
    a no-op on the result."""
    rows = [("a", i) for i in range(500)] + [("b", i) for i in range(500)] \
        + [("c", i) for i in range(50)]
    df = spark.createDataFrame(rows, "grp string, k long")
    direct = A.hyperloglog_registers(df, "k", ["grp"], m=64)
    got = {(r["grp"], r["bucket"]): r["register"] for r in direct.collect()}
    # identical key sets -> identical register tables
    a = {b: r for (g, b), r in got.items() if g == "a"}
    b = {b: r for (g, b), r in got.items() if g == "b"}
    assert a == b and len(a) > 0
    staged = A.hyperloglog_registers(
        df, "k", ["grp"], m=64,
        stage_hash_path=str(tmp_path / "hll_words.parquet"))
    assert sorted(map(tuple, staged.collect())) == sorted(map(tuple, direct.collect()))
    ests = {g: A.hll_estimate(
        [r for (gg, _), r in got.items() if gg == g], m=64)
        for g in ("a", "c")}
    assert abs(ests["a"] - 500) / 500 < 0.45  # m=64: sigma ~13%
    assert abs(ests["c"] - 50) / 50 < 0.45


def test_kmv_sketch_overlap_estimates_and_plan(spark):
    """KMV (round 7): crafted overlapping key sets — est_union and
    est_inter land near the constructed truth (k=128 on ~1-2k distinct:
    sigma ~ 1/sqrt(k) ~ 9%), exact degenerate case (union fits in k)
    is EXACT, and the sketch's rank-<=k window compiles to
    WindowGroupLimit so map tasks forward at most k rows per group."""
    rows = ([("a", i) for i in range(1500)]
            + [("b", i) for i in range(1000, 2500)]       # |a ∩ b| = 500
            + [("c", i) for i in range(5000, 5060)])       # small: exact path
    df = spark.createDataFrame(rows, "grp string, k long")
    sk = A.kmv_sketches(df, "k", "grp", k=128)
    p = sk._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    est = {(r["type_a"], r["type_b"]): r
           for r in A.kmv_pair_overlap(sk, "grp", k=128).collect()}
    ab = est[("a", "b")]
    assert abs(ab["est_union"] - 2500) / 2500 < 0.30
    assert abs(ab["est_inter"] - 500) / 500 < 0.55  # inter: k_inter/k noise
    # c vs a: union 1560 estimated, intersection truly zero
    ac = est[("a", "c")]
    assert ac["k_inter"] == 0 and ac["est_inter"] == 0
    # two tiny sets: union sketch holds the whole union -> exact count
    tiny = spark.createDataFrame(
        [("x", i) for i in range(40)] + [("y", i) for i in range(20, 70)],
        "grp string, k long")
    tsk = A.kmv_sketches(tiny, "k", "grp", k=128)
    t = A.kmv_pair_overlap(tsk, "grp", k=128).collect()[0]
    assert t["est_union"] == 70 and t["k_inter"] == 20


def test_grouped_ols_slope_matches_reference(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        grouped_ols_slope,
    )

    # y = 3x + noise-free  -> slope exactly 3e6 ppm after centering
    rows = [("g", x, 3 * x) for x in [100, 200, 300, 400]]
    # constant-x group -> NULL slope
    rows += [("h", 500, y) for y in [1, 2, 3]]
    df = spark.createDataFrame(rows, ["g", "x_fp", "y_fp"])
    got = {r["g"]: r for r in grouped_ols_slope(
        df, ["g"], "x_fp", "y_fp").collect()}
    assert got["g"]["slope_ppm"] == 3_000_000
    assert got["g"]["n"] == 4
    assert got["h"]["slope_ppm"] is None and got["h"]["sxx"] == 0

    # floored-mean reference on an uneven group, negative slope
    rows2 = [("k", x, 1000 - 2 * x) for x in [10, 25, 31]]
    df2 = spark.createDataFrame(rows2, ["g", "x_fp", "y_fp"])
    xs = [10, 25, 31]
    ys = [1000 - 2 * x for x in xs]
    mx, my = sum(xs) // 3, sum(ys) // 3
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sxx = sum((x - mx) ** 2 for x in xs)
    expect = int(sxy * 1_000_000 / sxx)  # truncation toward zero
    row = grouped_ols_slope(df2, ["g"], "x_fp", "y_fp").collect()[0]
    assert row["sxy"] == sxy and row["sxx"] == sxx
    assert row["slope_ppm"] == expect


def test_skyline_2d_matches_bruteforce(spark):
    import random

    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        skyline_2d,
    )

    rng = random.Random(5)
    pts = [(rng.randrange(50), rng.randrange(50)) for _ in range(120)]
    df = spark.createDataFrame(pts, ["x", "y"])

    def brute(points):
        from collections import Counter

        cnt = Counter(points)
        front = set()
        for p in cnt:
            dominated = any(
                q[0] <= p[0] and q[1] >= p[1] and q != p
                for q in cnt
            )
            if not dominated:
                front.add((p[0], p[1], cnt[p]))
        return front

    got = {
        (r["x"], r["y"], r["n_points"])
        for r in skyline_2d(df, "x", "y").collect()
    }
    assert got == brute(pts)


def test_skyline_2d_orientations(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        skyline_2d,
    )

    df = spark.createDataFrame(
        [(1, 1), (2, 5), (3, 3), (5, 6)], ["x", "y"]
    )
    # maximize both: front = points not dominated by (>= , >=)
    got = {
        (r["x"], r["y"])
        for r in skyline_2d(
            df, "x", "y", minimize_x=False, maximize_y=True).collect()
    }
    assert got == {(5, 6)}
    # minimize both
    got2 = {
        (r["x"], r["y"])
        for r in skyline_2d(
            df, "x", "y", minimize_x=True, maximize_y=False).collect()
    }
    assert got2 == {(1, 1)}


def test_rolling_active_users_hand_case(spark):
    from datetime import datetime as dt

    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        rolling_active_users,
    )

    rows = [
        ("a", dt(2024, 1, 1)), ("a", dt(2024, 1, 1)),  # dup same day
        ("b", dt(2024, 1, 1)),
        ("a", dt(2024, 1, 3)),
        ("c", dt(2024, 1, 9)),
    ]
    df = spark.createDataFrame(rows, ["user", "ts"])
    got = {r["day_n"]: (r["dau"], r["wau"], r["stickiness_ppm"])
           for r in rolling_active_users(df, "user", "ts", 7).collect()}
    d1 = (dt(2024, 1, 1) - dt(1970, 1, 1)).days
    # day1: dau 2 (a,b), wau 2; day3: dau 1, wau 2 (a,b still in window)
    assert got[d1] == (2, 2, 1_000_000)
    assert got[d1 + 2] == (1, 2, 500_000)
    # day9: a@3 is 6 days back -> inside the 7-day trailing window
    assert got[d1 + 8] == (1, 2, 500_000)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="window_days"):
        rolling_active_users(df, "user", "ts", 0)


def test_funnel_with_exclusion_semantics(spark):
    from datetime import datetime as dt

    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        funnel_with_exclusion,
    )

    def r(u, h, y):
        return (u, dt(2024, 1, 1, h), y)

    rows = [
        # u1: clean A->B
        r("u1", 1, "A"), r("u1", 3, "B"),
        # u2: A -> E -> B (blocked)
        r("u2", 1, "A"), r("u2", 2, "E"), r("u2", 3, "B"),
        # u3: E before A then B (clean — exclusion only between)
        r("u3", 1, "E"), r("u3", 2, "A"), r("u3", 4, "B"),
        # u4: A, no B
        r("u4", 1, "A"),
        # u5: B before A only -> not converted
        r("u5", 1, "B"), r("u5", 2, "A"),
    ]
    df = spark.createDataFrame(rows, ["user", "ts", "y"])
    row = funnel_with_exclusion(
        df, "user", "ts", "y", "A", "B", "E").collect()[0]
    assert row["n_step_a"] == 5
    assert row["n_converted"] == 3  # u1, u2, u3
    assert row["n_clean"] == 2      # u1, u3
    assert row["clean_rate_ppm"] == 2 * 1_000_000 // 5


def test_interval_concurrency_peak_sweep(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        interval_concurrency_peak,
    )

    rows = [
        (1, 0, 10), (2, 5, 15), (3, 9, 12),   # overlap 9..10 -> 3 open
        (4, 10, 11),                          # opens AT 10 as 1 closes
        (5, 20, 20),                          # degenerate, dropped
    ]
    df = spark.createDataFrame(rows, ["id", "s", "e"])
    row = interval_concurrency_peak(df, "id", "s", "e").collect()[0]
    assert row["n_intervals"] == 5 and row["n_dropped"] == 1
    # [0,10),[5,15),[9,12) all open at t=9; at t=10 interval 1 closes
    # BEFORE 4 opens (exclusive end), so peak stays 3, first at t=9
    assert row["peak_concurrency"] == 3
    assert row["first_peak_t"] == 9


def test_amortize_over_days_exact_sum(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        amortize_over_days,
    )

    df = spark.createDataFrame(
        [(1, 10, 12, 1000), (2, 5, 5, 777), (3, 9, 7, 500)],
        ["id", "s", "e", "a"],
    )
    rows = amortize_over_days(df, "id", "s", "e", "a").collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], {})[r["day_n"]] = r["daily_fp"]
    # 1000 over 3 days: 333/333/334 (last absorbs remainder)
    assert by_id[1] == {10: 333, 11: 333, 12: 334}
    assert sum(by_id[1].values()) == 1000
    # single-day range carries everything
    assert by_id[2] == {5: 777}
    # degenerate range dropped entirely
    assert 3 not in by_id


def test_amortize_monthly_equals_daily_rollup(spark):
    from pyspark.sql import functions as F

    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        amortize_monthly,
        amortize_over_days,
    )

    # ranges crossing 0, 1, and 3 month boundaries + a degenerate one
    rows = [
        (1, 10, 12, 1000),       # within one month
        (2, 25, 35, 7777),       # crosses Jan->Feb 1970
        (3, 20, 130, 999999),    # spans 4 months
        (4, 9, 7, 5),            # degenerate, dropped by both
        (5, 58, 59, 101),        # ends on month boundary
    ]
    df = spark.createDataFrame(rows, ["id", "s", "e", "a"])
    daily = amortize_over_days(df, "id", "s", "e", "a")
    epoch = F.lit("1970-01-01").cast("date")
    md = F.date_add(epoch, F.col("day_n").cast("int"))
    daily_rolled = {
        (r["id"], r["mk"]): (r["fp"], r["nd"])
        for r in daily.groupBy(
            "id", (F.year(md) * 100 + F.month(md)).cast("long").alias("mk")
        )
        .agg(
            F.sum("daily_fp").cast("long").alias("fp"),
            F.count(F.lit(1)).cast("long").alias("nd"),
        )
        .collect()
    }
    monthly = {
        (r["id"], r["month_key"]): (r["month_fp"], r["n_days"])
        for r in amortize_monthly(df, "id", "s", "e", "a").collect()
    }
    assert monthly == daily_rolled
    assert sum(fp for (i, _), (fp, _) in monthly.items() if i == 3) == 999999
