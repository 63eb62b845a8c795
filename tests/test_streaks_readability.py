"""Gaps-and-islands streaks, forward as-of join, integer Flesch
readability, weekday seasonality — python-recompute pinned."""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from datetime import date, datetime, timedelta

from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
    weekday_seasonality,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.temporal import (
    activity_streaks,
    asof_join_forward,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.text import (
    readability_scores,
)
from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table


def test_activity_streaks_matches_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {r["user_id"]: r for r in activity_streaks(
        ev, "user_id", "ts").collect()}
    days = defaultdict(set)
    for r in ev.select("user_id", F.col("ts").cast("date").alias("d")).collect():
        days[r["user_id"]].add(r["d"])
    for u, ds in days.items():
        sd = sorted(ds)
        streaks = []
        cur = 1
        for a, b in zip(sd, sd[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        g = got[u]
        assert g["n_active_days"] == len(sd)
        assert g["n_streaks"] == len(streaks)
        assert g["longest_streak"] == max(streaks)
        assert g["current_streak"] == streaks[-1]
        assert g["last_active_day"] == str(sd[-1])


def test_activity_streaks_synthetic_islands(spark):
    rows = [
        ("a", date(2024, 1, 1)), ("a", date(2024, 1, 2)),
        ("a", date(2024, 1, 2)),  # dup day collapses
        ("a", date(2024, 1, 5)),
        ("b", date(2024, 1, 9)),
    ]
    df = spark.createDataFrame(rows, ["k", "d"]).select(
        "k", F.col("d").cast("timestamp").alias("ts")
    )
    got = {r["k"]: r for r in activity_streaks(df, "k", "ts").collect()}
    assert got["a"]["n_active_days"] == 3
    assert got["a"]["n_streaks"] == 2
    assert got["a"]["longest_streak"] == 2
    assert got["a"]["current_streak"] == 1
    assert got["b"]["longest_streak"] == 1


def test_asof_join_forward_semantics(spark):
    # left at t=10; right at t=10 (exact tie, matches), t=12; and a
    # left row with no right at-or-after it
    left = spark.createDataFrame(
        [(1, 10, 100), (1, 13, 101), (2, 5, 102)], ["k", "lts", "lid"]
    )
    right = spark.createDataFrame(
        [(1, 10, 900), (1, 10, 901), (1, 12, 902)], ["k", "rts", "rid"]
    )
    out = {r["lid"]: r for r in asof_join_forward(
        left, right, "k", "lts", "rts", ["rid"], right_tiebreak="rid"
    ).collect()}
    # exact-tie matches, and among the two rows at t=10 the SMALLEST
    # tiebreak wins
    assert out[100]["rid"] == 900
    # no right at-or-after t=13 -> NULL (left semantics)
    assert out[101]["rid"] is None
    # key 2 has no right rows at all
    assert out[102]["rid"] is None
    assert len(out) == 3


def test_asof_join_forward_matches_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("pid")
    )
    errs = ev.where(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("e_ts"), F.col("event_id").alias("eid")
    )
    got = {r["pid"]: r["eid"] for r in asof_join_forward(
        purch, errs, "user_id", "p_ts", "e_ts", ["eid"],
        right_tiebreak="eid",
    ).collect()}
    errs_by_user = defaultdict(list)
    for r in errs.collect():
        errs_by_user[r["user_id"]].append((r["e_ts"], r["eid"]))
    for r in purch.collect():
        cands = [
            (ts, eid) for ts, eid in errs_by_user[r["user_id"]]
            if ts >= r["p_ts"]
        ]
        want = min(cands)[1] if cands else None
        assert got[r["pid"]] == want


def test_readability_scores_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    got = {r["doc"]: r for r in readability_scores(
        docs, "text", "doc_id").collect()}
    for r in docs.collect():
        s = r["text"].lower()
        w = len(re.findall(r"[a-z]+", s))
        sents = max(1, len(re.findall(r"[.!?]+", s)))
        vg = len(re.findall(r"[aeiouy]+", s))
        if w == 0:
            assert r["doc_id"] not in got
            continue
        g = got[r["doc_id"]]
        assert (g["n_words"], g["n_sentences"], g["n_vowel_groups"]) == (
            w, sents, vg
        )
        assert g["flesch_milli"] == 206835 - (1015 * w) // sents - (
            84600 * vg
        ) // w


def test_readability_degenerate_ordering(spark):
    df = spark.createDataFrame(
        [
            (1, "The cat sat. It ran. We go."),            # short sentences
            (2, "Unquestionably extraordinary considerations "
                "notwithstanding alternative methodologies persist"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc"]: r["flesch_milli"] for r in readability_scores(
        df, "text", "doc_id").collect()}
    assert got[1] > got[2]  # simple prose reads easier


def test_weekday_seasonality_matches_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {(r["event_type"], r["dow"]): r for r in weekday_seasonality(
        ev, "event_type", "ts").collect()}
    cnt = Counter()
    for r in ev.select("event_type", F.col("ts").cast("date").alias("d")).collect():
        dow = ((r["d"] - date(1970, 1, 1)).days + 4) % 7
        # python weekday cross-check: Monday=0 -> our encoding Sunday=0
        assert dow == (r["d"].weekday() + 1) % 7
        cnt[(r["event_type"], dow)] += 1
    tots = defaultdict(int)
    for (k, _), n in cnt.items():
        tots[k] += n
    for key, n in cnt.items():
        g = got[key]
        assert g["n"] == n
        assert g["share_ppm"] == n * 1000000 // tots[key[0]]
        assert g["dev_ppm"] == g["share_ppm"] - 142857


def test_ngram_novelty_matches_python(spark, sf_dir):
    import re as _re

    from redshift_to_pendo_api_data_pipeline_spark.operators.text import (
        ngram_novelty,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = {r["doc_id"]: r for r in ngram_novelty(
        docs, "text", "doc_id", 3).collect()}
    per_doc = {}
    for r in docs.select("doc_id", "text").collect():
        w = _re.sub(r"\s+", " ", r["text"].lower()).strip().split(" ")
        k = max(len(w) - 2, 1)
        grams = {" ".join(w[i:i + 3]) for i in range(k)}
        per_doc[r["doc_id"]] = grams
    counts = Counter(g for gs in per_doc.values() for g in gs)
    for d, gs in per_doc.items():
        uniq = sum(1 for g in gs if counts[g] == 1)
        assert got[d]["n_grams"] == len(gs)
        assert got[d]["n_unique"] == uniq
        assert got[d]["novelty_ppm"] == uniq * 1000000 // len(gs)
