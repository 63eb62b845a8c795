"""CDC apply (MERGE) and SCD2 history operators."""

from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.merge import (
    apply_cdc,
    latest_change_per_key,
    scd2_history,
)


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, bal double",
    )


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "id long, name string, bal double, op string, seq long"
    )


def test_apply_cdc_insert_update_delete(spark):
    changes = _changes(spark, [
        (2, "b2", 21.0, "U", 1),          # update
        (3, None, None, "D", 1),          # delete
        (4, "d", 40.0, "I", 1),           # insert
    ])
    got = {r["id"]: (r["name"], r["bal"])
           for r in apply_cdc(_base(spark), changes, "id", "seq").collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 4: ("d", 40.0)}


def test_apply_cdc_latest_action_wins(spark):
    changes = _changes(spark, [
        (2, "first", 0.0, "U", 1),
        (2, "last", 99.0, "U", 5),        # higher seq wins
        (1, None, None, "D", 1),
        (1, "resurrected", 11.0, "I", 2),  # delete then re-insert
        (3, "gone", 0.0, "U", 1),
        (3, None, None, "D", 2),          # update then delete -> gone
    ])
    got = {r["id"]: (r["name"], r["bal"])
           for r in apply_cdc(_base(spark), changes, "id", "seq").collect()}
    assert got == {1: ("resurrected", 11.0), 2: ("last", 99.0)}


def test_apply_cdc_idempotent_replay(spark):
    """Replaying the collapsed changelog over the merged result is a
    no-op for U/I (upsert semantics) — the task-retry safety story."""
    changes = _changes(spark, [
        (2, "b2", 21.0, "U", 1),
        (4, "d", 40.0, "I", 1),
    ])
    once = apply_cdc(_base(spark), changes, "id", "seq")
    twice = apply_cdc(once, changes, "id", "seq")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_latest_change_per_key_deterministic(spark):
    changes = _changes(spark, [(1, "x", 0.0, "U", 7), (1, "y", 0.0, "D", 7)])
    # equal seq: op desc breaks the tie deterministically (U > D > I)
    assert latest_change_per_key(changes, "id", "seq").first()["op"] == "U"


def test_scd2_history_intervals(spark):
    ev = spark.createDataFrame(
        [
            (1, "s1", "2024-01-01 00:00:00", 1),
            (1, "s2", "2024-01-01 01:00:00", 2),
            (1, "s3", "2024-01-01 02:00:00", 3),
            (2, "t1", "2024-01-01 00:30:00", 4),
        ],
        "k long, state string, ts string, eid long",
    ).select("k", "state", F.to_timestamp("ts").alias("ts"), "eid")
    out = scd2_history(ev, "k", "ts", ["state"], tiebreak="eid").collect()
    rows = {(r["k"], r["state"]): (r["valid_from_us"], r["valid_to_us"])
            for r in out}
    h = 3_600_000_000
    t0 = rows[(1, "s1")][0]
    assert rows[(1, "s1")] == (t0, t0 + h)
    assert rows[(1, "s2")] == (t0 + h, t0 + 2 * h)
    assert rows[(1, "s3")][1] is None          # current state open-ended
    assert rows[(2, "t1")][1] is None
    # intervals tile: no gaps, no overlaps per key
    k1 = sorted(v for (k, _), v in rows.items() if k == 1)
    for (a, b), (c, d) in zip(k1, k1[1:]):
        assert b == c
