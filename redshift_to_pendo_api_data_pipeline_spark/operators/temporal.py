"""Temporal operators Spark lacks as single primitives: as-of join and
sessionization — both expressed as compositions of built-in ops (SURVEY
§2's guidance: composition first, Pandas UDF only if semantics demand).

As-of join (point-in-time lookup): for every left row, the single right
row with the greatest right_ts <= left_ts per key. Spark has no ASOF JOIN
(DuckDB does — used as the oracle); the composition is union + window
last_value, which shuffles each side ONCE on the key — strictly better at
scale than the range-join (left ⋈ right on ts-range then max-per-group)
which explodes intermediate rows on hot keys.

Sessionization: assign session ids by gap threshold — lag + cumulative sum
of gap-breaks, two window passes over one shuffle-partitioning. The
streaming twin is applyInPandasWithState/session_window; the batch form
here matches it row-for-row on closed sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from redshift_to_pendo_api_data_pipeline_spark.functions.transforms import fixed_point


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row: the latest right row at-or-before its timestamp.

    Implementation: tag both sides, union on (key, ts), and carry the most
    recent right values forward with last_value(ignoreNulls) over a
    (key, ts, side)-ordered window; keep left rows. One shuffle on `key`;
    no row explosion regardless of key skew.

    `right_tiebreak` (a right_vals column) makes ties on right_ts
    deterministic: the row with the GREATEST tiebreak wins. Without it,
    equal-timestamp right rows resolve arbitrarily (found the hard way at
    sf0.1 where order dates collide)."""
    l_tag = left.select(
        F.col(key), F.col(left_ts).alias("__ts"), F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__r_{v}") for v in right_vals],
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    r_tag = right.select(
        F.col(key), F.col(right_ts).alias("__ts"), F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__r_{v}") for v in right_vals],
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("__l"),
    )
    # right rows sort before left rows at identical ts (side 0 < 1) so an
    # exactly-equal timestamp matches (at-or-before semantics); among
    # right rows tied on ts, ascending tiebreak => last_value carries the
    # greatest one
    order = [F.col("__ts").asc(), F.col("__side").asc()]
    if right_tiebreak is not None:
        order.append(F.col(f"__r_{right_tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        *[
            F.last(F.col(f"__r_{v}"), ignorenulls=True).over(w).alias(f"__c_{v}")
            for v in right_vals
        ],
    )
    out = carried.where(F.col("__side") == 1).select(
        "__l.*", *[F.col(f"__c_{v}").alias(v) for v in right_vals]
    )
    return out


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Assign a session index per key: a new session starts when the gap
    to the previous event exceeds `gap`. Returns the input plus
    ``session_id`` (0-based per key). Two window functions over ONE
    partitioning — Catalyst reuses the exchange."""
    amount, unit = gap.split()
    per_unit = {
        "second": 1_000_000, "seconds": 1_000_000,
        "minute": 60_000_000, "minutes": 60_000_000,
        "hour": 3_600_000_000, "hours": 3_600_000_000,
    }[unit]
    gap_micros = int(amount) * per_unit

    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(tiebreak).asc())
    with_break = df.withColumn(
        "__new_session",
        (
            F.unix_micros(F.col(ts)) - F.lag(F.unix_micros(F.col(ts))).over(w)
            > gap_micros
        ).cast("int"),
    ).withColumn("__new_session", F.coalesce(F.col("__new_session"), F.lit(0)))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return with_break.withColumn(
        "session_id", F.sum("__new_session").over(wsum)
    ).drop("__new_session")


def session_stats(
    df: DataFrame, key: str, ts: str, tiebreak: str, gap: str = "30 minutes"
) -> DataFrame:
    """Per-session rollup: bounds, event count, value sum."""
    s = sessionize(df, key, ts, tiebreak, gap)
    return s.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_micros(F.min(ts)).alias("start_us"),
        F.unix_micros(F.max(ts)).alias("end_us"),
        fixed_point(F.sum(F.col("value").cast("decimal(18,2)"))).alias("sum_value_fp2"),
    )


def time_bucket_gapfill(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    bucket: str = "1 hour",
    locf: bool = True,
) -> DataFrame:
    """Hypertable-style bucketed rollup with gap filling: aggregate per
    (key, time bucket), then emit a row for EVERY bucket in the corpus
    time span per key — zeros for counts, last-observation-carried-forward
    for the value sum when ``locf``.

    The bucket spine is generated relationally (per-key sequence over the
    GLOBAL min/max bucket, exploded) and left-joined to the actuals; LOCF
    is ``last(value, ignorenulls)`` over the per-key ordered window. Spine
    size is |keys| × span/bucket rows — independent of event volume; the
    join is keyed on (key, bucket) so it shuffles the (already reduced)
    rollup, never raw events.

    Output: key, bucket_start (timestamp), n (0-filled), sum_value_fp2
    (fixed-point, NULL until first observation when locf).
    """
    bucketed = (
        df.select(
            F.col(key).alias("k"),
            F.window(F.col(ts_col), bucket).start.alias("bucket_start"),
            F.col(value_col).cast("decimal(18,2)").alias("v"),
        )
        .groupBy("k", "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n"),
            fixed_point(F.sum("v"), 2).alias("sum_value_fp2"),
        )
    )
    span = bucketed.select(
        F.min("bucket_start").alias("lo"), F.max("bucket_start").alias("hi")
    )
    spine = (
        bucketed.select("k").distinct()
        .crossJoin(F.broadcast(span))  # 1-row span: broadcast, not a cartesian
        .select(
            "k",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {bucket}"))
            ).alias("bucket_start"),
        )
    )
    out = spine.join(bucketed, ["k", "bucket_start"], "left").withColumn(
        "n", F.coalesce(F.col("n"), F.lit(0))
    )
    if locf:
        w = (
            Window.partitionBy("k")
            .orderBy("bucket_start")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.withColumn(
            "sum_value_fp2", F.last("sum_value_fp2", ignorenulls=True).over(w)
        )
    return out.select(F.col("k").alias(key), "bucket_start", "n", "sum_value_fp2")


def debounce_events(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak: str,
    gap_s: int,
) -> DataFrame:
    """Debounce dedup: keep a row when it is the first of its key group or
    at least ``gap_s`` seconds after its PREDECESSOR row (lag semantics —
    the gap is measured to the previous raw event, not the previous kept
    event, so the filter is a single stateless window expression both
    engines evaluate identically; kept-event debouncing needs a running
    state and lives in the streaming flavor).

    One lag window per key group: a single shuffle on `keys`,
    partition-parallel, no state. The standard duplicate-beacon /
    double-click filter in event pipelines (reference analogue: the
    target's per-record invariant dedupe, target-pendo/src/__init__.py
    482-520, generalized to time-window semantics)."""
    w = Window.partitionBy(*keys).orderBy(F.asc(ts_col), F.asc(tiebreak))
    prev = F.lag(F.col(ts_col)).over(w)
    keep = prev.isNull() | (
        F.col(ts_col).cast("long") - prev.cast("long") >= gap_s
    )
    return df.withColumn("__keep", keep).where("__keep").drop("__keep")


def time_weighted_mean(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak: str,
    value_col: str,
) -> DataFrame:
    """Time-weighted mean of an irregularly sampled series (trapezoidal
    rule — TimescaleDB's `time_weight('Linear', ...)` semantic): the
    plain AVG over-weights bursts; weighting each segment by its
    duration integrates value over TIME, the correct aggregate for
    gauge-style series (spend rate, queue depth, price) sampled at
    uneven intervals.

    Per key, events ordered by (ts, tiebreak): segment i contributes
    (v_i + v_{i+1})/2 * dt_i; the mean is sum(areas)/sum(dt). All
    arithmetic is EXACT until the final division: values are 2-dp
    fixed-point (*100 -> bigint), per-segment durations truncate to
    integer MILLISECONDS (identical floor-div on both engines; ms keeps
    the doubled-area magnitude, <= 10^5 * dt_ms per segment, inside
    int64 out to decade-long per-key spans — DECIMAL would be exact too
    but surfaces as float through pandas and breaks the driver's str()
    hash). The surfaced mean divides the two exact integers once per
    key: IEEE-deterministic cross-engine.

    Keys with fewer than two distinct >=1ms-apart timestamps carry no
    duration and are dropped (documented contract; a gauge with one
    sample has no time extent). One window shuffle (hash by key, sort
    by ts) + one groupBy on the same key — AQE coalesces them into a
    single exchange reuse."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak)
    vfp = F.round(F.col(value_col) * 100).cast("long")
    tus = F.unix_micros(F.col(ts_col))
    seg = (
        df.select(
            F.col(key_col),
            vfp.alias("__v"),
            tus.alias("__t"),
            F.lead(vfp).over(w).alias("__vn"),
            F.lead(tus).over(w).alias("__tn"),
        )
        .where(F.col("__tn").isNotNull())
        .select(
            F.col(key_col),
            "__v",
            "__vn",
            # integer `div`, not `/`+cast: double division loses ulps on
            # multi-decade microsecond spans; div truncates exactly and
            # DuckDB's `//` matches it on the (positive) lead-lag gaps
            F.expr("CAST((__tn - __t) div 1000 AS BIGINT)").alias("__dms"),
        )
    )
    out = seg.groupBy(key_col).agg(
        F.sum((F.col("__v") + F.col("__vn")) * F.col("__dms")).alias(
            "area2_fp"
        ),
        F.sum("__dms").alias("dur_ms"),
    )
    return out.where(F.col("dur_ms") > 0).select(
        F.col(key_col),
        F.col("area2_fp").cast("long").alias("area2_fp"),
        F.col("dur_ms").cast("long").alias("dur_ms"),
        F.round(
            F.col("area2_fp").cast("double")
            / (F.col("dur_ms").cast("double") * 200.0),
            6,
        ).alias("tw_mean"),
    )


def linear_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    key: str,
    conv_ts: str,
    touch_ts: str,
    conv_id: str,
    touch_id: str,
    window_days: int | None = None,
) -> DataFrame:
    """Linear (equal-split) multi-touch attribution — the sibling of
    the last-touch asof_join composition: every touch at-or-before a
    conversion (optionally within a lookback window) shares the credit
    equally. Credit is integer ppm with the REMAINDER assigned to the
    most recent touch, so per-conversion credit sums to exactly
    1,000,000 — no float leakage, cross-engine exact:

        base = 1_000_000 div n;  latest touch gets base + (1_000_000 mod n)

    Output: one row per (conversion, touch) credit assignment.

    Shape: one user-key equi-join (shuffle_hash — both sides are event
    streams, never forced broadcast) produces the candidate
    (conversion x prior touch) relation; per-conversion counts and the
    latest-touch rank come from ONE window over that relation,
    partitioned by the conversion id — bounded by that user's touch
    count, the same per-entity contract as the funnels. A user with T
    touches and C conversions contributes at most T·C candidate rows
    — the lookback window is the lever that bounds this at web scale
    (set it; unbounded lookback is an anti-pattern this operator
    permits only explicitly as window_days=None).
    """
    c = conversions.select(
        F.col(key).alias("k"),
        F.col(conv_id).alias("conversion_id"),
        F.col(conv_ts).alias("c_ts"),
    )
    t = touches.select(
        F.col(key).alias("k"),
        F.col(touch_id).alias("touch_id"),
        F.col(touch_ts).alias("t_ts"),
    )
    joined = c.join(t.hint("shuffle_hash"), "k").where(
        F.col("t_ts") <= F.col("c_ts")
    )
    if window_days is not None:
        joined = joined.where(
            F.col("t_ts") >= F.col("c_ts") - F.expr(
                f"INTERVAL {int(window_days)} DAYS"
            )
        )
    w = Window.partitionBy("conversion_id")
    w_rank = w.orderBy(F.col("t_ts").desc(), F.col("touch_id").desc())
    ranked = joined.select(
        "k",
        "conversion_id",
        "touch_id",
        F.count(F.lit(1)).over(w).alias("n_touches"),
        F.row_number().over(w_rank).alias("__recency"),
    )
    base = F.expr("1000000L div n_touches")
    rem = F.expr("1000000L % n_touches")
    return ranked.select(
        F.col("k").alias(key),
        "conversion_id",
        "touch_id",
        F.col("n_touches").cast("long").alias("n_touches"),
        F.when(F.col("__recency") == 1, base + rem)
        .otherwise(base)
        .cast("long")
        .alias("credit_ppm"),
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row: the EARLIEST right row at-or-after its
    timestamp — the forward twin of asof_join ("next shipment after the
    order", "first response after the ticket"). Same union + carry
    design, mirrored: the window runs from the current row FORWARD and
    carries the next right values backward with first_value(ignoreNulls)
    over a (key, ts, side)-ordered frame. One shuffle on `key`, no row
    explosion under key skew — identical scale contract to asof_join.

    Tie semantics mirror the backward form: a right row at exactly the
    left timestamp matches (at-or-after); among right rows tied on ts,
    the row with the SMALLEST `right_tiebreak` wins (the deterministic
    "first" of the tie)."""
    l_tag = left.select(
        F.col(key), F.col(left_ts).alias("__ts"), F.lit(0).alias("__side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__r_{v}") for v in right_vals],
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    r_tag = right.select(
        F.col(key), F.col(right_ts).alias("__ts"), F.lit(1).alias("__side"),
        *[F.col(v).alias(f"__r_{v}") for v in right_vals],
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("__l"),
    )
    # left rows sort BEFORE right rows at identical ts (side 0 < 1) so an
    # exactly-equal timestamp is inside the forward frame; among right
    # rows tied on ts, ascending tiebreak => first_value picks the
    # smallest one
    order = [F.col("__ts").asc(), F.col("__side").asc()]
    if right_tiebreak is not None:
        order.append(F.col(f"__r_{right_tiebreak}").asc_nulls_last())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        *[
            F.first(F.col(f"__r_{v}"), ignorenulls=True).over(w).alias(f"__c_{v}")
            for v in right_vals
        ],
    )
    return carried.where(F.col("__side") == 0).select(
        "__l.*", *[F.col(f"__c_{v}").alias(v) for v in right_vals]
    )


def activity_streaks(df: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    """Longest consecutive-DAY activity streak per key — the canonical
    gaps-and-islands: distinct active days per key, island id =
    day - row_number (consecutive days share it), per-island lengths,
    then one per-key summary row: active days, number of streaks,
    longest streak, and the streak containing the key's LAST active day
    (the "current streak" as of the data's end).

    Shape: distinct (key, day) in one shuffle; the island window and
    both aggregations stay keyed on the key (the island id only refines
    it), so everything after the distinct is one exchange's worth of
    per-key work bounded by that key's active-day count. Date-integer
    arithmetic only."""
    days = (
        df.select(
            F.col(key_col).alias("k"), F.col(ts_col).cast("date").alias("d")
        )
        .distinct()
    )
    w = Window.partitionBy("k").orderBy(F.col("d").asc())
    islands = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    per_island = islands.groupBy("k", "island").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.max("d").alias("last_d"),
    )
    return (
        per_island.groupBy("k")
        .agg(
            F.sum("len").cast("long").alias("n_active_days"),
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
            F.max("len").cast("long").alias("longest_streak"),
            # islands are disjoint day ranges, so last_d is unique per
            # island within a key — max_by is deterministic
            F.max_by("len", "last_d").cast("long").alias("current_streak"),
            F.max("last_d").cast("string").alias("last_active_day"),
        )
        .select(
            F.col("k").alias(key_col),
            "n_active_days", "n_streaks", "longest_streak",
            "current_streak", "last_active_day",
        )
    )


def time_decay_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    key: str,
    conv_ts: str,
    touch_ts: str,
    conv_id: str,
    touch_id: str,
    half_life_days: int,
    window_days: int | None = None,
) -> DataFrame:
    """Time-decay multi-touch attribution with INTEGER half-life
    weights: a touch `a` days before the conversion carries raw weight

        w = 1_000_000 div 2^(a div half_life_days)

    (exact powers of two per elapsed half-life — the float exp(-λt)
    replaced by its staircase, monotone and engine-exact), normalized
    per conversion to credit_ppm = w * 1e6 div sum(w), remainder to
    the most recent touch so credits sum to exactly 1,000,000. The
    third attribution flavor next to last-touch (asof) and linear.

    Same shape as linear_attribution: one shuffle_hash user join, one
    conversion-partitioned window pass (sum + recency rank), lookback-
    bounded candidates. Decay exponent capped at 62 (beyond that the
    weight is 0 anyway and the shift would overflow)."""
    c = conversions.select(
        F.col(key).alias("k"),
        F.col(conv_id).alias("conversion_id"),
        F.col(conv_ts).alias("c_ts"),
    )
    t = touches.select(
        F.col(key).alias("k"),
        F.col(touch_id).alias("touch_id"),
        F.col(touch_ts).alias("t_ts"),
    )
    joined = c.join(t.hint("shuffle_hash"), "k").where(
        F.col("t_ts") <= F.col("c_ts")
    )
    if window_days is not None:
        joined = joined.where(
            F.col("t_ts") >= F.col("c_ts") - F.expr(
                f"INTERVAL {int(window_days)} DAYS"
            )
        )
    weighted = joined.select(
        "k", "conversion_id", "touch_id", "t_ts",
        F.expr(
            f"1000000L div shiftleft(1L, CAST("
            f"least(CAST(datediff(CAST(c_ts AS DATE), CAST(t_ts AS DATE))"
            f" div {int(half_life_days)} AS BIGINT), 62L) AS INT))"
        ).alias("w"),
    )
    w_sum = Window.partitionBy("conversion_id")
    w_rank = w_sum.orderBy(F.col("t_ts").desc(), F.col("touch_id").desc())
    ranked = weighted.select(
        "k", "conversion_id", "touch_id", "w",
        F.sum("w").over(w_sum).alias("sum_w"),
        F.row_number().over(w_rank).alias("__recency"),
    )
    base = F.expr("w * 1000000L div sum_w")
    # the remainder = 1e6 - sum over touches of base; assigning it to
    # the most recent touch needs the sum of bases, which is another
    # window — instead compute it as 1e6 - sum(base) via the same
    # partition window (base is a deterministic per-row expression).
    ranked = ranked.withColumn("__base", base).withColumn(
        "__base_sum",
        F.sum("__base").over(Window.partitionBy("conversion_id")),
    )
    return ranked.select(
        F.col("k").alias(key),
        "conversion_id",
        "touch_id",
        F.col("w").cast("long").alias("weight_ppm"),
        F.when(
            F.col("__recency") == 1,
            F.col("__base") + (F.lit(1000000) - F.col("__base_sum")),
        )
        .otherwise(F.col("__base"))
        .cast("long")
        .alias("credit_ppm"),
    )


def session_entry_exit(
    df: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    page_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Session entry/exit matrix — "where do sessions start and where
    do they die": sessions from the gap rule (sessionize), each
    session's FIRST and LAST event value by the (ts, tiebreak) total
    order, counted into the |values|² matrix with one-event (bounce)
    sessions flagged. One user-key exchange end-to-end: sessionize's
    windows, the per-session min/max structs, and the final bounded
    groupBy all ride the same key partitioning."""
    s = sessionize(df, key, ts, tiebreak, gap)
    per_session = s.groupBy(key, "session_id").agg(
        F.min(F.struct(F.col(ts), F.col(tiebreak), F.col(page_col)))
        .alias("__first"),
        F.max(F.struct(F.col(ts), F.col(tiebreak), F.col(page_col)))
        .alias("__last"),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        per_session.select(
            F.col("__first")[page_col].alias("entry"),
            F.col("__last")[page_col].alias("exit"),
            (F.col("__n") == 1).cast("int").alias("is_bounce"),
        )
        .groupBy("entry", "exit")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("is_bounce").cast("long").alias("n_bounces"),
        )
    )


def run_length_encode(
    df: DataFrame,
    key_col: str,
    value_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Run-length encoding of a per-key ordered value sequence — the
    session-compression primitive behind repeated-action diagnostics
    (rage-clicks, retry storms, duplicate-beacon bursts): consecutive
    identical values collapse to one row with a run length.

    Classic gaps-and-islands: one key-partitioned window computes the
    change flag (lag != value), a running sum of flags numbers the
    runs, and one groupBy collapses them. Both windows and the groupBy
    share the key partitioning — ONE exchange total, per-key state
    bounded by that key's rows (the sessionize contract). `order_cols`
    must totally order each key's rows (include a unique tiebreak) or
    run boundaries are nondeterministic.

    Output: (key, run_id 1.., value, run_len)."""
    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    flagged = df.withColumn(
        "__new",
        F.when(
            F.lag(F.col(value_col)).over(w).isNull()
            | (F.lag(F.col(value_col)).over(w) != F.col(value_col)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__run",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return flagged.groupBy(
        F.col(key_col),
        F.col("__run").cast("long").alias("run_id"),
        F.col(value_col),
    ).agg(F.count(F.lit(1)).cast("long").alias("run_len"))


def u_shaped_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    key: str,
    conv_ts: str,
    touch_ts: str,
    conv_id: str,
    touch_id: str,
    window_days: int | None = None,
    endpoint_ppm: int = 400_000,
) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution — completes
    the attribution set (last-touch asof / linear / time-decay): the
    FIRST and LAST touch each take ``endpoint_ppm`` (default 40%), the
    middles split the remainder equally. All integer ppm with the
    rounding remainder pinned to the last touch, so per-conversion
    credit sums to exactly 1,000,000 (the linear_attribution
    contract):

        n == 1: 1,000,000
        n == 2: 500,000 each
        n >= 3: first/last endpoint_ppm; middles share
                (1e6 - 2·endpoint_ppm); last absorbs the mod.

    Same candidate shape as linear_attribution: one user-key
    shuffle_hash join, ONE conversion-partitioned window for count +
    recency rank (first = rank n, last = rank 1); per-conversion state
    bounded by that user's touches, lookback window as the scale
    lever."""
    if not 0 < endpoint_ppm <= 500_000:
        raise ValueError(f"endpoint_ppm must be in (0, 500000], got {endpoint_ppm}")
    c = conversions.select(
        F.col(key).alias("k"),
        F.col(conv_id).alias("conversion_id"),
        F.col(conv_ts).alias("c_ts"),
    )
    t = touches.select(
        F.col(key).alias("k"),
        F.col(touch_id).alias("touch_id"),
        F.col(touch_ts).alias("t_ts"),
    )
    joined = c.join(t.hint("shuffle_hash"), "k").where(
        F.col("t_ts") <= F.col("c_ts")
    )
    if window_days is not None:
        joined = joined.where(
            F.col("t_ts") >= F.col("c_ts") - F.expr(
                f"INTERVAL {int(window_days)} DAYS"
            )
        )
    w = Window.partitionBy("conversion_id")
    w_rank = w.orderBy(F.col("t_ts").desc(), F.col("touch_id").desc())
    ranked = joined.select(
        "k", "conversion_id", "touch_id",
        F.count(F.lit(1)).over(w).alias("n_touches"),
        F.row_number().over(w_rank).alias("__recency"),
    )
    ep = int(endpoint_ppm)
    mid_pool = 1_000_000 - 2 * ep
    mid_base = F.expr(f"{mid_pool}L div (n_touches - 2)")
    mid_rem = F.expr(f"{mid_pool}L % (n_touches - 2)")
    credit = (
        F.when(F.col("n_touches") == 1, F.lit(1_000_000))
        .when(F.col("n_touches") == 2, F.lit(500_000))
        .when(F.col("__recency") == 1, F.lit(ep) + mid_rem)     # last
        .when(F.col("__recency") == F.col("n_touches"), F.lit(ep))  # first
        .otherwise(mid_base)
    )
    return ranked.select(
        F.col("k").alias(key),
        "conversion_id",
        "touch_id",
        F.col("n_touches").cast("long").alias("n_touches"),
        credit.cast("long").alias("credit_ppm"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier survival curve over (duration, event) pairs — the
    censoring-aware churn/lifetime estimator: at each distinct event
    time t, S(t) = prod_{u<=t} (1 - d_u / n_u) with n_u = units still
    at risk (duration >= u) and d_u = events at u; censored units
    leave the risk set without an event.

    Shape: ONE groupBy(duration) collapses the corpus to <= |distinct
    durations| rows (bounded by the observation window in days — a
    contract constant, so the two cumulative windows after it are
    bounded-input global windows, the documented exception family).
    The survival product is computed as exp(sum(ln(1 - d/n))) over the
    ordered window — a single ln/exp pair per step, identical libm
    cross-engine, surfaced at round-6 like the tf-idf family. Counts
    stay exact BIGINT."""
    per_t = df.select(
        F.col(duration_col).cast("long").alias("t"),
        F.col(event_col).cast("int").alias("e"),
    ).groupBy("t").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("e").alias("d"),
    )
    w_risk = Window.orderBy(F.asc("t")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    grand = per_t.agg(F.sum("n_total").cast("long").alias("__grand"))
    curve = (
        per_t.crossJoin(F.broadcast(grand))
        .withColumn(
            "n_risk",
            (F.col("__grand") - F.coalesce(F.sum("n_total").over(w_risk), F.lit(0)))
            .cast("long"),
        )
        .where(F.col("d") > 0)
    )
    # survival over EVENT times only (censoring-only times don't change S)
    w_ev = Window.orderBy(F.asc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # d == n_risk (the whole remaining risk set dies at t) is a legal
    # input but ln(0) is engine-divergent (DuckDB raises): route it
    # through an explicit zero flag — S is exactly 0 from then on.
    ln_term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(F.lit(1.0) - F.col("d") / F.col("n_risk")),
    ).otherwise(F.lit(0.0))
    dead = F.max(
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    ).over(w_ev)
    return curve.select(
        "t",
        F.col("d").cast("long").alias("n_events"),
        "n_risk",
        F.when(dead == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum(ln_term).over(w_ev)), 6))
        .alias("survival"),
    )


def lateness_histogram(
    df: DataFrame, arrival_cols: list, event_us_col: str,
    bucket_us: int = 3_600_000_000, max_buckets: int = 48,
) -> DataFrame:
    """Out-of-orderness histogram — the measurement a Structured
    Streaming watermark delay is SIZED from: for each record, lateness
    = (max event time seen so far in ARRIVAL order) − (its own event
    time); a `withWatermark(delay)` drops exactly the records whose
    lateness exceeds delay, so the histogram's tail mass IS the
    expected drop rate at each candidate delay.

    ``arrival_cols`` is the ingestion TOTAL order (an append-log
    offset plus a unique tiebreak — ties would make the exclusive
    prefix max order-dependent); ``event_us_col`` the event time in
    epoch micros (exact long). The
    running max over arrival order comes from `global_prefix_max_excl`
    (range shuffle + pid re-cluster, offsets bounded — and pinned
    against the round-7 dual-consumption nondeterminism). Buckets are
    fixed-width, capped at ``max_buckets`` (the overflow bucket closes
    the census), so the output is ≤ max_buckets+1 rows with exact
    counts.

    Returns (bucket, lateness_lo_us, n_events, max_lateness_us).
    """
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        global_prefix_max_excl,
    )

    with_prev = global_prefix_max_excl(
        df.select(
            *[F.col(c) for c in arrival_cols],
            F.col(event_us_col).alias("__ts"),
        ),
        list(arrival_cols), "__ts", out_name="__prev_max",
    )
    late = with_prev.select(
        F.greatest(
            F.lit(0).cast("long"),
            F.coalesce(F.col("__prev_max") - F.col("__ts"), F.lit(0)),
        ).alias("__late_us")
    )
    bucket = F.least(
        F.lit(int(max_buckets)).cast("long"),
        F.expr(f"__late_us div {int(bucket_us)}").cast("long"),
    )
    return (
        late.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("__late_us").cast("long").alias("max_lateness_us"),
        )
        .select(
            "bucket",
            (F.col("bucket") * int(bucket_us)).cast("long")
            .alias("lateness_lo_us"),
            "n_events", "max_lateness_us",
        )
    )


def logrank_test(
    df: DataFrame, dur_col: str, event_col: str, group_col: str,
    scale: int = 10**6,
) -> DataFrame:
    """Two-group log-rank test — 'do these survival curves differ':
    the hypothesis test beside `kaplan_meier`'s curve. At each event
    time t with d_t total events, n_t at risk and n1_t at risk in
    group 1:

        U  = sum( d1_t - d_t*n1_t/n_t )
        V  = sum( d_t*(n1_t/n_t)*(1-n1_t/n_t)*(n_t-d_t)/(n_t-1) )
        z  = U / sqrt(V)

    Exactness contract: each per-time term is quantized at ``scale``
    with integer floor-division (two divs per term), then SUMMED AS
    INTEGERS — a float per-term sum would be partition-order
    dependent and could never hash cross-engine; the quantization
    bias is < n_times/scale, invisible at screen precision. The at-
    risk counts come from reverse cumulative sums over the distinct-
    time relation (ordered window per group over time-cardinality
    rows — bounded by the distinct duration count, the same contract
    as the KM curve itself).

    ``group_col`` must be 0/1. Returns one row:
    (n_times, u_fp, v_fp, z_fp).
    """
    cells = df.groupBy(
        F.col(dur_col).alias("__t"),
        F.col(group_col).cast("int").alias("__g"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col(event_col).cast("long")).cast("long").alias("__d"),
    )
    # at-risk must be evaluated on the DENSE (time x group) grid: a
    # time present only in group 0 still has group-1 subjects at risk
    # (everyone with duration >= t) — a sparse per-group cumsum with
    # absent times coalesced to 0 silently undercounts them. Densify
    # (distinct times x {0,1}, still distinct-duration bounded), THEN
    # reverse-cumulate.
    grid = (
        cells.select("__t").distinct()
        .select("__t", F.explode(F.array(F.lit(0), F.lit(1)))
                .alias("__g"))
    )
    dense = grid.join(
        cells.hint("shuffle_hash"), ["__t", "__g"], "left"
    ).select(
        "__t", "__g",
        F.coalesce("__n", F.lit(0)).alias("__n"),
        F.coalesce("__d", F.lit(0)).alias("__d"),
    )
    w_rev = (
        Window.partitionBy("__g")
        .orderBy(F.col("__t").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    at_risk = dense.select(
        "__t", "__g", "__d",
        F.sum("__n").over(w_rev).alias("__atr"),
    )
    g1 = at_risk.where(F.col("__g") == 1).select(
        "__t", F.col("__d").alias("d1"), F.col("__atr").alias("n1"),
    )
    g0 = at_risk.where(F.col("__g") == 0).select(
        "__t", F.col("__d").alias("d0"), F.col("__atr").alias("n0"),
    )
    times = (
        g1.join(g0.hint("shuffle_hash"), "__t")
        .withColumn("dt", F.col("d1") + F.col("d0"))
        .withColumn("nt", F.col("n1") + F.col("n0"))
        .where((F.col("dt") > 0) & (F.col("nt") > 1))
    )
    u_term = F.expr(
        f"CAST(d1 AS DECIMAL(38,0)) * {int(scale)}"
        f" - CAST(CAST(dt AS DECIMAL(38,0)) * n1 * {int(scale)}"
        " AS DECIMAL(38,0)) div nt"
    )
    v_term = F.expr(
        f"CAST(CAST(dt AS DECIMAL(38,0)) * n1 * n0 * (nt - dt)"
        f" * {int(scale)} AS DECIMAL(38,0))"
        " div (CAST(nt AS DECIMAL(38,0)) * nt * (nt - 1))"
    )
    folded = times.agg(
        F.count(F.lit(1)).cast("long").alias("n_times"),
        F.sum(u_term).cast("long").alias("u_fp"),
        F.sum(v_term).cast("long").alias("v_fp"),
    )
    z = F.col("u_fp").cast("double") / F.sqrt(
        F.col("v_fp").cast("double") * float(scale)
    )
    return folded.select(
        "n_times", "u_fp", "v_fp", F.round(z, 6).alias("z_fp")
    )
