"""As-of join + sessionization semantics on hand-built fixtures."""

from datetime import datetime

from redshift_to_pendo_api_data_pipeline_spark.operators.temporal import (
    asof_join,
    session_stats,
    sessionize,
)


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_asof_join_at_or_before_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(12)), (1, _ts(9)), (2, _ts(10))],
        "k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100, "a"),   # exactly-equal ts must match
         (1, _ts(11), 200, "b"),
         (3, _ts(1), 900, "z")],   # other key, never matched
        "k long, rts timestamp, rid long, tag string",
    )
    out = {(r["k"], r["lts"]): (r["rid"], r["tag"]) for r in asof_join(
        left, right, "k", "lts", "rts", ["rid", "tag"], right_tiebreak="rid"
    ).collect()}
    assert out[(1, _ts(10))] == (100, "a")     # at-or-before includes equal
    assert out[(1, _ts(12))] == (200, "b")     # latest wins
    assert out[(1, _ts(9))] == (None, None)    # nothing before -> left join nulls
    assert out[(2, _ts(10))] == (None, None)   # key with no right rows


def test_asof_join_tiebreak_deterministic(spark):
    left = spark.createDataFrame([(1, _ts(12))], "k long, lts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10), 5, "low"), (1, _ts(10), 9, "high")],
        "k long, rts timestamp, rid long, tag string",
    )
    row = asof_join(left, right, "k", "lts", "rts", ["rid", "tag"],
                    right_tiebreak="rid").first()
    assert row["rid"] == 9 and row["tag"] == "high"  # greatest tiebreak wins


def test_sessionize_gap_splits(spark):
    rows = [
        (1, _ts(10, 0), 0), (1, _ts(10, 10), 1), (1, _ts(10, 50), 2),  # 40min gap
        (1, _ts(11, 0), 3),
        (2, _ts(10, 0), 4),
    ]
    df = spark.createDataFrame(rows, "user long, ts timestamp, eid long")
    out = {r["eid"]: r["session_id"] for r in
           sessionize(df, "user", "ts", "eid", gap="30 minutes").collect()}
    assert out[0] == 0 and out[1] == 0          # same session
    assert out[2] == 1 and out[3] == 1          # split by 40-min gap
    assert out[4] == 0                           # other user restarts at 0


def test_session_stats_rollup(spark):
    rows = [
        (1, _ts(10, 0), 0, 5.0), (1, _ts(10, 10), 1, 7.0),
        (1, _ts(11, 0), 2, 1.0),
    ]
    df = spark.createDataFrame(rows, "user long, ts timestamp, event_id long, value double")
    stats = {r["session_id"]: r for r in
             session_stats(df, "user", "ts", "event_id", gap="30 minutes").collect()}
    assert stats[0]["n_events"] == 2 and stats[0]["sum_value_fp2"] == 1200
    assert stats[1]["n_events"] == 1
    assert stats[0]["end_us"] - stats[0]["start_us"] == 10 * 60 * 1_000_000


def test_sequential_funnel_enforces_order(spark):
    """A step only counts if it happens at-or-after the user reached the
    previous step — out-of-order events must not convert."""
    from datetime import datetime as dt

    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        sequential_funnel,
    )

    rows = [
        # user 1: full ordered journey
        (1, dt(2024, 1, 1, 9), "signup"), (1, dt(2024, 1, 1, 10), "view"),
        (1, dt(2024, 1, 1, 11), "purchase"),
        # user 2: viewed BEFORE signing up -> stops at signup
        (2, dt(2024, 1, 1, 8), "view"), (2, dt(2024, 1, 1, 9), "signup"),
        # user 3: never signed up -> appears nowhere
        (3, dt(2024, 1, 1, 9), "view"), (3, dt(2024, 1, 1, 10), "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["step"]: r["n_users"] for r in sequential_funnel(
        ev, "user_id", "event_type", "ts", ["signup", "view", "purchase"]
    ).collect()}
    assert out == {"signup": 2, "view": 1, "purchase": 1}


def test_debounce_keeps_first_and_gapped(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.temporal import debounce_events

    rows = [
        # user 1 / click: burst at :00, :30, then a gapped event at +2min
        (1, "click", 1, datetime(2024, 1, 1, 10, 0, 0)),
        (1, "click", 2, datetime(2024, 1, 1, 10, 0, 30)),
        (1, "click", 3, datetime(2024, 1, 1, 10, 2, 0)),
        # same user, different type: independent stream, always first
        (1, "view", 4, datetime(2024, 1, 1, 10, 0, 10)),
        # other user: exactly at the 60 s boundary -> kept (>= gap)
        (2, "click", 5, datetime(2024, 1, 1, 10, 0, 0)),
        (2, "click", 6, datetime(2024, 1, 1, 10, 1, 0)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "event_id", "ts"])
    kept = (
        debounce_events(df, ["user_id", "event_type"], "ts", "event_id", gap_s=60)
        .select("event_id")
        .toPandas()["event_id"]
        .tolist()
    )
    # event 2 debounced (30 s after 1); 3 kept (90 s after 2);
    # boundary event 6 kept (exactly 60 s)
    assert sorted(kept) == [1, 3, 4, 5, 6]


def test_debounce_lag_is_to_previous_raw_event(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.temporal import debounce_events

    # 3 events 40 s apart: lag semantics drop BOTH followers (each is
    # 40 s after its raw predecessor), even though the third is 80 s
    # after the last KEPT event.
    rows = [
        (1, "click", 1, datetime(2024, 1, 1, 10, 0, 0)),
        (1, "click", 2, datetime(2024, 1, 1, 10, 0, 40)),
        (1, "click", 3, datetime(2024, 1, 1, 10, 1, 20)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "event_id", "ts"])
    kept = (
        debounce_events(df, ["user_id", "event_type"], "ts", "event_id", gap_s=60)
        .select("event_id").toPandas()["event_id"].tolist()
    )
    assert kept == [1]


def test_funnel_single_pass_user_missing_first_step(spark):
    """ANSI-mode regression (r6 advice): a user with a later-step event
    but NO step-0 event gets an empty __a0 array — element_at(__a0, 1)
    threw INVALID_ARRAY_INDEX_IN_ELEMENT_AT under Spark 4's default ANSI
    mode. The array_min form returns NULL and the user simply never
    converts; output must match the chained form."""
    from datetime import datetime as dt

    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        sequential_funnel,
        sequential_funnel_single_pass,
    )

    rows = [
        (1, dt(2024, 1, 1, 9), "signup"), (1, dt(2024, 1, 1, 10), "view"),
        # user 2: view + purchase, never signed up -> empty step-0 array
        (2, dt(2024, 1, 1, 9), "view"), (2, dt(2024, 1, 1, 10), "purchase"),
        # user 3: purchase only
        (3, dt(2024, 1, 1, 8), "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    steps = ["signup", "view", "purchase"]
    new = sorted(tuple(r) for r in sequential_funnel_single_pass(
        ev, "user_id", "event_type", "ts", steps).collect())
    old = sorted(tuple(r) for r in sequential_funnel(
        ev, "user_id", "event_type", "ts", steps).collect())
    assert new == old
    assert {(r[1], r[2]) for r in new} == {
        ("signup", 1), ("view", 1), ("purchase", 0)}


def test_funnel_conversion_window_semantics_and_equality(spark):
    """within_s (round 7): a step converts only inside the window after
    the previous reach — first-touch semantics (the window anchors at
    the FIRST previous-step reach, it does not restart at later
    occurrences); single-pass and chained forms stay row-identical with
    the window on."""
    from datetime import datetime as dt

    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        sequential_funnel,
        sequential_funnel_single_pass,
    )

    rows = [
        # user 1: view 30 min after signup -> converts in a 1h window
        (1, dt(2024, 1, 1, 9, 0), "signup"), (1, dt(2024, 1, 1, 9, 30), "view"),
        # user 2: view 2h after signup -> outside the 1h window
        (2, dt(2024, 1, 1, 9, 0), "signup"), (2, dt(2024, 1, 1, 11, 0), "view"),
        # user 3: signs up twice; view is within 1h of the SECOND signup
        # only -> first-touch anchoring means NO conversion
        (3, dt(2024, 1, 1, 6, 0), "signup"), (3, dt(2024, 1, 1, 10, 0), "signup"),
        (3, dt(2024, 1, 1, 10, 30), "view"),
        # user 4: boundary — exactly at the window edge counts (<=)
        (4, dt(2024, 1, 1, 9, 0), "signup"), (4, dt(2024, 1, 1, 10, 0), "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    steps = ["signup", "view"]
    sp = sorted(tuple(r) for r in sequential_funnel_single_pass(
        ev, "user_id", "event_type", "ts", steps, within_s=3600).collect())
    ch = sorted(tuple(r) for r in sequential_funnel(
        ev, "user_id", "event_type", "ts", steps, within_s=3600).collect())
    assert sp == ch
    assert {(r[1], r[2]) for r in sp} == {("signup", 4), ("view", 2)}
    # without the window everyone converts
    nw = sequential_funnel_single_pass(ev, "user_id", "event_type", "ts", steps)
    assert {(r["step"], r["n_users"]) for r in nw.collect()} == {
        ("signup", 4), ("view", 4)}


def test_funnel_per_occurrence_catches_chain_first_touch_misses(spark):
    """Any-chain semantics: user 3 converts through the SECOND signup
    (first-touch missed it); out-of-window users still don't convert;
    the brute-force EXISTS definition agrees on a randomized fixture."""
    import random
    from datetime import datetime as dt, timedelta

    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        sequential_funnel_per_occurrence,
        sequential_funnel_single_pass,
    )

    rows = [
        (1, dt(2024, 1, 1, 9, 0), "signup"), (1, dt(2024, 1, 1, 9, 30), "view"),
        (2, dt(2024, 1, 1, 9, 0), "signup"), (2, dt(2024, 1, 1, 11, 0), "view"),
        (3, dt(2024, 1, 1, 6, 0), "signup"), (3, dt(2024, 1, 1, 10, 0), "signup"),
        (3, dt(2024, 1, 1, 10, 30), "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    steps = ["signup", "view"]
    po = {(r["step"], r["n_users"]) for r in sequential_funnel_per_occurrence(
        ev, "user_id", "event_type", "ts", steps, within_s=3600).collect()}
    assert po == {("signup", 3), ("view", 2)}  # users 1 AND 3 convert
    ft = {(r["step"], r["n_users"]) for r in sequential_funnel_single_pass(
        ev, "user_id", "event_type", "ts", steps, within_s=3600).collect()}
    assert ft == {("signup", 3), ("view", 1)}  # first-touch misses user 3

    # randomized: as-of form == brute-force EXISTS chains (3 steps)
    rnd = random.Random(5)
    t0 = dt(2024, 1, 1)
    rows2 = [(u, t0 + timedelta(minutes=rnd.randint(0, 600)),
              rnd.choice(["a", "b", "c"]))
             for u in range(30) for _ in range(rnd.randint(1, 8))]
    ev2 = spark.createDataFrame(rows2, "user_id long, ts timestamp, event_type string")
    W = 3600
    got = {(r["step_idx"], r["n_users"]) for r in
           sequential_funnel_per_occurrence(
               ev2, "user_id", "event_type", "ts", ["a", "b", "c"],
               within_s=W).collect()}
    by_user: dict = {}
    for u, ts, et in rows2:
        by_user.setdefault(u, []).append((ts, et))
    want = []
    for i, step in enumerate(["a", "b", "c"]):
        n = 0
        for u, evs in by_user.items():
            qual = [ts for ts, et in evs if et == "a"]
            for s in ["b", "c"][:i]:
                qual = [ts for ts, et in evs if et == s and any(
                    q <= ts <= q + timedelta(seconds=W) for q in qual)]
            if qual:
                n += 1
        want.append((i, n))
    assert got == set(want)


def test_funnel_single_pass_matches_chained(spark, sf_dir):
    """The one-scan funnel is row-identical to the chained reference on
    real event data (including a zero-survivor tail step), and its plan
    scans the fact table once instead of once per step."""
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        sequential_funnel,
        sequential_funnel_single_pass,
    )
    from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    steps = ["signup", "view", "click", "purchase"]
    old = sorted(tuple(r) for r in
                 sequential_funnel(ev, "user_id", "event_type", "ts", steps).collect())
    new_df = sequential_funnel_single_pass(ev, "user_id", "event_type", "ts", steps)
    assert sorted(tuple(r) for r in new_df.collect()) == old
    p = new_df._jdf.queryExecution().executedPlan().toString()
    assert p.count("Scan parquet") <= 2  # one logical scan (+AQE echo)


def test_run_length_encode_hand_case(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.temporal import (
        run_length_encode,
    )

    rows = [
        ("u1", 1, "a"), ("u1", 2, "a"), ("u1", 3, "b"), ("u1", 4, "a"),
        ("u2", 1, "c"), ("u2", 2, "c"), ("u2", 3, "c"),
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "v"])
    got = {
        (r["k"], r["run_id"], r["v"], r["run_len"])
        for r in run_length_encode(df, "k", "v", ["seq"]).collect()
    }
    assert got == {
        ("u1", 1, "a", 2), ("u1", 2, "b", 1), ("u1", 3, "a", 1),
        ("u2", 1, "c", 3),
    }


def test_u_shaped_attribution_positions_and_sum(spark):
    from datetime import datetime as dt

    from redshift_to_pendo_api_data_pipeline_spark.operators.temporal import (
        u_shaped_attribution,
    )

    def ts(d, h):
        return dt(2024, 1, d, h)

    touches = spark.createDataFrame(
        [("u", f"t{i}", ts(1, i)) for i in range(1, 6)],  # 5 touches
        ["user", "tid", "tts"],
    )
    conv = spark.createDataFrame(
        [("u", "c1", ts(1, 10))], ["user", "cid", "cts"]
    )
    rows = u_shaped_attribution(
        conv, touches, "user", "cts", "tts", "cid", "tid"
    ).collect()
    by_tid = {r["touch_id"]: r["credit_ppm"] for r in rows}
    # first t1 -> 400000, last t5 -> 400000 + (200000 % 3),
    # middles t2..t4 -> 200000 div 3
    assert by_tid["t1"] == 400_000
    assert by_tid["t5"] == 400_000 + 200_000 % 3
    assert by_tid["t2"] == by_tid["t3"] == by_tid["t4"] == 200_000 // 3
    assert sum(by_tid.values()) == 1_000_000

    # one- and two-touch conversions
    conv2 = spark.createDataFrame(
        [("v", "c2", ts(1, 10))], ["user", "cid", "cts"]
    )
    t1 = spark.createDataFrame([("v", "x1", ts(1, 1))],
                               ["user", "tid", "tts"])
    single = u_shaped_attribution(
        conv2, t1, "user", "cts", "tts", "cid", "tid").collect()
    assert single[0]["credit_ppm"] == 1_000_000
    t2 = spark.createDataFrame(
        [("v", "x1", ts(1, 1)), ("v", "x2", ts(1, 2))],
        ["user", "tid", "tts"],
    )
    pair = u_shaped_attribution(
        conv2, t2, "user", "cts", "tts", "cid", "tid").collect()
    assert {r["credit_ppm"] for r in pair} == {500_000}
