"""Round-7 additions: sequence pattern counts (MATCH_RECOGNIZE-lite),
user-journey path counts, trapezoidal time-weighted mean, and the
entity-resolution cluster chain (editdist pairs -> connected
components)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
    event_path_counts,
    sequence_pattern_counts,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.dedup import (
    connected_components,
    editdist_pairs,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.temporal import (
    time_weighted_mean,
)


def _ts(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )


def test_sequence_pattern_non_overlapping_counts(spark):
    # user 1: s v c p  s p      -> 2 matches of s[vc]*p
    # user 2: s e p              -> 0 (error breaks the class)
    # user 3: p s               -> 0 (wrong order)
    rows = []
    for i, t in enumerate(["signup", "view", "click", "purchase", "signup", "purchase"]):
        rows.append((1, _ts(i), i, t))
    for i, t in enumerate(["signup", "error", "purchase"]):
        rows.append((2, _ts(i), 10 + i, t))
    for i, t in enumerate(["purchase", "signup"]):
        rows.append((3, _ts(i), 20 + i, t))
    out = sequence_pattern_counts(
        _events(spark, rows), "user_id", "ts", "event_id", "event_type",
        "s[vc]*p",
    ).collect()
    assert {(r.user_id, r.n_matches) for r in out} == {(1, 2)}
    assert out[0].seq_len == 6


def test_sequence_pattern_orders_by_tiebreak_on_ts_ties(spark):
    # same timestamp: event_id breaks the tie -> 's' then 'p' matches
    rows = [(7, _ts(0), 1, "signup"), (7, _ts(0), 2, "purchase")]
    out = sequence_pattern_counts(
        _events(spark, rows), "user_id", "ts", "event_id", "event_type",
        "s[vc]*p",
    ).collect()
    assert [(r.user_id, r.n_matches) for r in out] == [(7, 1)]


def test_event_path_counts_depth_slices_and_counts(spark):
    rows = [
        (1, _ts(0), 0, "view"), (1, _ts(1), 1, "click"),
        (2, _ts(0), 2, "view"), (2, _ts(1), 3, "click"),
        (3, _ts(0), 4, "signup"), (3, _ts(1), 5, "view"),
        (3, _ts(2), 6, "view"), (3, _ts(3), 7, "view"),
        (3, _ts(4), 8, "view"), (3, _ts(5), 9, "purchase"),  # 6th dropped
    ]
    out = {
        r.path: r.n_users
        for r in event_path_counts(
            _events(spark, rows), "user_id", "ts", "event_id", "event_type", 5
        ).collect()
    }
    assert out == {"view>click": 2, "signup>view>view>view>view": 1}


def test_time_weighted_mean_trapezoid_exact(spark):
    # user 1: v=1.00 at t=0s, v=3.00 at t=10s, v=3.00 at t=20s
    # segments: (100+300)*10_000ms + (300+300)*10_000ms
    # area2 = 4_000_000 + 6_000_000 = 10_000_000; dur = 20_000 ms
    # tw_mean = 1e7 / (2e4 * 200) = 2.5  (vs plain avg 2.3333)
    df = spark.createDataFrame(
        [
            (1, _ts(0), 1, 1.0),
            (1, _ts(10), 2, 3.0),
            (1, _ts(20), 3, 3.0),
            (2, _ts(0), 4, 9.9),  # single sample: no duration -> dropped
        ],
        "user_id long, ts timestamp, event_id long, value double",
    )
    out = time_weighted_mean(df, "user_id", "ts", "event_id", "value").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.user_id, r.area2_fp, r.dur_ms, r.tw_mean) == (1, 10_000_000, 20_000, 2.5)


def test_entity_clusters_transitive_closure(spark):
    # within the 'wiget' block: 'alue wiget' ~ 'blue wiget' ~ 'blu wiget'
    # chain (distance 1 each, endpoints at distance 2 > max_dist — only
    # transitive closure links them); 'blue widget' blocks apart (last
    # token), 'red gadget' is a singleton
    df = spark.createDataFrame(
        [
            ("blue widget",), ("alue wiget",), ("blue wiget",),
            ("blu wiget",), ("red gadget",),
        ],
        "p_name string",
    )
    pairs = editdist_pairs(df, "p_name", max_dist=1)
    labels = connected_components(pairs, "name_a", "name_b")
    names = df.select(F.col("p_name").alias("name")).distinct()
    out = {
        r.name: r.cluster
        for r in names.join(labels, names["name"] == labels["node"], "left")
        .select(
            "name",
            F.coalesce(F.col("cluster_id"), F.col("name")).alias("cluster"),
        )
        .collect()
    }
    assert out == {
        "blue widget": "blue widget",
        "alue wiget": "alue wiget",
        "blue wiget": "alue wiget",
        "blu wiget": "alue wiget",
        "red gadget": "red gadget",
    }


def test_streaming_pattern_counts_crosses_batches(spark, tmp_path):
    """The stateful CEP twin: a match whose 's' lands in batch 1 and 'p'
    in batch 2 is counted once; totals equal the batch operator on the
    concatenated stream."""
    import os

    from redshift_to_pendo_api_data_pipeline_spark.streaming.stateful import (
        streaming_pattern_counts,
    )

    rows = [
        # user 1: s v | c p s p  -> 2 matches, first spans the boundary
        (1, _ts(0), 0, "signup"), (1, _ts(1), 1, "view"),
        (1, _ts(100), 2, "click"), (1, _ts(101), 3, "purchase"),
        (1, _ts(102), 4, "signup"), (1, _ts(103), 5, "purchase"),
        # user 2: s e | p -> error breaks the class, 0 matches
        (2, _ts(0), 6, "signup"), (2, _ts(1), 7, "error"),
        (2, _ts(100), 8, "purchase"),
    ]
    schema = "user_id long, ts timestamp, event_id long, event_type string"
    batch1 = [r for r in rows if r[1] < _ts(50)]
    batch2 = [r for r in rows if r[1] >= _ts(50)]

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(src)
    for root, _, files in os.walk(src):
        for f in files:
            os.utime(os.path.join(root, f), (1000000000, 1000000000))
    spark.createDataFrame(batch2, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_pattern_counts(stream, "s[vc]*p")

    emitted = []

    def writer(batch_df, batch_id):
        emitted.extend(
            (r["user_id"], r["new_matches"], r["total_matches"])
            for r in batch_df.collect()
        )

    q = (out.writeStream.outputMode("append")
         .option("checkpointLocation", ckpt)
         .foreachBatch(writer).trigger(availableNow=True).start())
    q.awaitTermination(120)

    # batch 2 completes the spanning match + one whole match for user 1
    assert sorted(emitted) == [(1, 2, 2)]
    # parity with the batch operator over the full event set
    batch_out = sequence_pattern_counts(
        _events(spark, [(u, t, e, ty) for (u, t, e, ty) in rows]),
        "user_id", "ts", "event_id", "event_type", "s[vc]*p",
    ).collect()
    assert {(r.user_id, r.n_matches) for r in batch_out} == {(1, 2)}


def test_with_ntile_matches_sql_semantics(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import with_ntile

    # 7 rows, n=3: SQL ntile gives bucket sizes 3,2,2 in order
    df = spark.createDataFrame([(i,) for i in range(1, 8)], "x long")
    out = with_ntile(df, [F.col("x").asc()], 3, "b").collect()
    got = {r.x: r.b for r in out}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 7: 3}


def test_rfm_segments_grid(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import rfm_segments

    # 2 customers, n=2: cust 1 is more recent, more frequent, higher spend
    rows = [
        (1, dt.date(2024, 3, 1), 10.00),
        (1, dt.date(2024, 3, 10), 20.00),
        (2, dt.date(2024, 1, 5), 5.00),
    ]
    orders = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate date, o_totalprice double"
    )
    out = {
        (r.r, r.f, r.m): (r.n_customers, r.segment_monetary_fp)
        for r in rfm_segments(
            orders, "o_custkey", "o_orderdate", "o_totalprice", 2
        ).collect()
    }
    # cust 1: best on all three axes -> (1,1,1); cust 2 -> (2,2,2)
    assert out == {(1, 1, 1): (1, 3000), (2, 2, 2): (1, 500)}


def test_dup_size_histogram_multiplicities(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.dedup import (
        dup_size_histogram,
    )

    df = spark.createDataFrame(
        [("a",), ("A ",), (" a",), ("b",), ("b",), ("c",)], "t string"
    )  # normalization folds case/whitespace: a x3, b x2, c x1
    out = {
        r.dup_count: (r.n_clusters, r.n_docs)
        for r in dup_size_histogram(df, "t").collect()
    }
    assert out == {3: (1, 3), 2: (1, 2), 1: (1, 1)}


def test_pattern_counts_match_python_reference_on_random_streams(spark):
    """Seeded random event streams: the distributed symbol-string scan
    equals a pure-Python re.finditer reference on every draw (ordering,
    tie-break, and non-overlap semantics all exercised at once)."""
    import random
    import re

    rng = random.Random(7)
    types = ["signup", "view", "click", "purchase", "error"]
    pattern = re.compile("s[vc]*p")
    for _ in range(8):
        rows = [
            (
                rng.randrange(6),
                _ts(rng.randrange(30)),  # coarse ts: frequent ties
                eid,
                rng.choice(types),
            )
            for eid in range(rng.randrange(1, 120))
        ]
        expect = {}
        by_user: dict = {}
        for u, t, e, ty in rows:
            by_user.setdefault(u, []).append((t, e, ty[0]))
        for u, evs in by_user.items():
            seq = "".join(ch for _, _, ch in sorted(evs))
            n = len(pattern.findall(seq))
            if n:
                expect[u] = (len(seq), n)
        got = {
            r.user_id: (r.seq_len, r.n_matches)
            for r in sequence_pattern_counts(
                _events(spark, rows), "user_id", "ts", "event_id",
                "event_type", "s[vc]*p",
            ).collect()
        }
        assert got == expect


def test_time_weighted_mean_matches_python_reference_on_random_series(spark):
    """Seeded random gauge series: exact fixed-point surfaces equal a
    pure-Python trapezoid fold on every draw (including ts ties, which
    contribute zero duration under the tiebreak order)."""
    import random

    rng = random.Random(11)
    for _ in range(6):
        rows = [
            (
                rng.randrange(4),
                _ts(rng.randrange(0, 3600)),
                eid,
                round(rng.uniform(0, 100), 2),
            )
            for eid in range(rng.randrange(2, 80))
        ]
        expect = {}
        by_user: dict = {}
        for u, t, e, v in rows:
            by_user.setdefault(u, []).append((t, e, round(v * 100)))
        for u, evs in by_user.items():
            evs.sort()
            area2 = dur = 0
            for (t0, _, v0), (t1, _, v1) in zip(evs, evs[1:]):
                dms = int((t1 - t0).total_seconds() * 1_000_000) // 1000
                area2 += (v0 + v1) * dms
                dur += dms
            if dur > 0:
                expect[u] = (area2, dur, round(area2 / (dur * 200.0), 6))
        got = {
            r.user_id: (r.area2_fp, r.dur_ms, r.tw_mean)
            for r in time_weighted_mean(
                _events2(spark, rows), "user_id", "ts", "event_id", "value"
            ).collect()
        }
        assert got == expect


def _events2(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )


def test_chunk_documents_windows_cover_and_overlap(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.sampling import (
        chunk_documents,
    )

    words = " ".join(f"w{i}" for i in range(20))  # 20 tokens
    df = spark.createDataFrame([(1, words), (2, "a b"), (3, "")],
                               "doc_id long, text string")
    out = chunk_documents(df, "text", "doc_id", max_tokens=16, stride=8)
    rows = {(r.doc, r.chunk_idx): r for r in out.collect()}
    # doc 1: 20 tokens -> ceil((20-16)/8)=1 extra chunk
    assert {(d, i) for (d, i) in rows} == {(1, 0), (1, 1), (2, 0), (3, 0)}
    r10, r11 = rows[(1, 0)], rows[(1, 1)]
    assert r10.chunk_len == 16 and r10.chunk_text.startswith("w0 ")
    # second window starts at token 9 (stride 8), covers the tail
    assert r11.chunk_len == 12 and r11.chunk_text.split() == [
        f"w{i}" for i in range(8, 20)
    ]
    # 8-token overlap between consecutive windows
    assert r10.chunk_text.split()[8:] == r11.chunk_text.split()[:8]
    assert rows[(2, 0)].chunk_len == 2
    assert rows[(3, 0)].n_tokens == 1  # split('') -> [''] by contract


def test_interval_overlap_join_exact_and_dedup_across_bin_widths(spark):
    """Banded overlap join equals the naive theta join for EVERY bin
    width, with no duplicate pairs (first-shared-bin equality does the
    dedup, not a distinct)."""
    import random

    from redshift_to_pendo_api_data_pipeline_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    rng = random.Random(3)
    rows = []
    for uid in range(60):
        lo = rng.randrange(0, 200)
        rows.append((uid % 4, uid, lo, lo + rng.randrange(0, 50)))
    a = spark.createDataFrame(
        rows, "k long, uid_a long, lo_a long, hi_a long"
    )
    b = spark.createDataFrame(
        rows, "k long, uid_b long, lo_b long, hi_b long"
    )
    expect = set()
    for (k1, u1, l1, h1) in rows:
        for (k2, u2, l2, h2) in rows:
            if k1 == k2 and u1 < u2 and l1 <= h2 and l2 <= h1:
                expect.add((k1, u1, u2))
    for width in (1, 7, 64, 1000):
        got = [
            (r.k, r.uid_a, r.uid_b)
            for r in interval_overlap_join(
                a, b, "lo_a", "hi_a", "lo_b", "hi_b",
                bin_width=width, keys=["k"],
            ).where(F.col("uid_a") < F.col("uid_b")).collect()
        ]
        assert len(got) == len(set(got)), f"dup pairs at width {width}"
        assert set(got) == expect, f"mismatch at width {width}"


def test_robust_outlier_stats_breakdown_resistance(spark):
    """A single wild value flags itself under median/MAD (it would
    inflate a mean/std enough to hide); doubled-median surfaces stay
    integral on even counts."""
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        robust_outlier_stats,
    )

    rows = [(1, float(v)) for v in (10, 10, 11, 9, 10, 1000)] + [
        (2, 5.0), (2, 6.0)
    ]
    df = spark.createDataFrame(rows, "user_id long, value double")
    out = {r.user_id: r for r in robust_outlier_stats(df, "user_id", "value").collect()}
    r1 = out[1]
    # values (cents): 900,1000,1000,1000,1100,100000 -> median 1000 (med2=2000)
    # dev2: |2v-2000|*... dev2 = {200,0,0,0,200,198000} -> median(dev2)=100 -> mad4=200
    assert (r1.n, r1.med2, r1.mad4) == (6, 2000, 200)
    # outlier rule 2*dev2 > 3*mad4=600: only the 1000.00 event (dev2=198000)
    assert r1.n_outliers == 1
    r2 = out[2]  # even count: med = 5.5 -> med2 = 1100 integral
    assert (r2.med2, r2.n_outliers) == (1100, 0)


def test_label_centroid_similarity_identical_and_orthogonal(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
        label_centroid_similarity,
    )

    rows = [
        ("a", [1.0, 0.0]), ("a", [1.0, 0.0]),
        ("b", [2.0, 0.0]),              # same direction as a -> cos 1
        ("c", [0.0, 3.0]),              # orthogonal -> cos 0
    ]
    df = spark.createDataFrame(rows, "label string, embedding array<double>")
    out = {
        (r.label_a, r.label_b): r.cosine
        for r in label_centroid_similarity(df, "embedding", "label").collect()
    }
    assert out == {("a", "b"): 1.0, ("a", "c"): 0.0, ("b", "c"): 0.0}


def test_hard_negative_topk_excludes_same_label_and_ranks(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
        hard_negative_topk,
    )

    rows = [
        (0, "a", [1.0, 0.0]),
        (1, "a", [1.0, 0.01]),   # nearest overall but SAME label -> excluded
        (2, "b", [1.0, 0.1]),    # nearest different-label
        (3, "b", [0.0, 1.0]),    # far different-label
        (4, "c", [1.0, 0.2]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    out = hard_negative_topk(
        df.where(F.col("vec_id") == 0), df, "embedding", "vec_id", "label", k=2
    ).collect()
    got = [(r.vec_id, r.label) for r in sorted(out, key=lambda r: -r.cosine)]
    assert got == [(2, "b"), (4, "c")]
    assert all(r.qid == 0 and r.qlabel == "a" for r in out)


def test_hard_negative_topk_bucketed_route_recall(spark):
    """Above the batch bound the operator auto-routes to the banded-LSH
    path (the sf1->sf3 superlinear fix). On CLUSTERED vectors — tight
    same-direction clusters with distinct labels — the true top-k
    negatives share the query's hyperplane buckets, so the routed path
    must (a) produce the same schema, (b) never emit a same-label row,
    and (c) recover >= 80% of the exact path's (qid, vec_id) picks."""
    import math

    from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
        hard_negative_topk,
    )

    rows = []
    # 8 tight clusters of 12 vectors on distinct directions in R^8;
    # labels alternate within each cluster so close different-label
    # negatives exist inside every bucket
    for c in range(8):
        base = [0.0] * 8
        base[c] = 1.0
        for j in range(12):
            v = [x + 0.01 * ((c * 12 + j) % 5) * (i % 3 == 0)
                 for i, x in enumerate(base)]
            n = math.sqrt(sum(x * x for x in v))
            rows.append((c * 12 + j, c * 2 + (j % 2), [x / n for x in v]))
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    q = df.where(F.col("vec_id") % 4 == 0)
    exact = hard_negative_topk(
        q, df, "embedding", "vec_id", "label", k=3,
        max_broadcast_queries=10_000,
    )
    routed = hard_negative_topk(
        q, df, "embedding", "vec_id", "label", k=3,
        max_broadcast_queries=0,   # force the banded route
    )
    assert routed.columns == exact.columns
    r_rows = routed.collect()
    assert all(r.qlabel != r.label for r in r_rows)
    e_pairs = {(r.qid, r.vec_id) for r in exact.collect()}
    r_pairs = {(r.qid, r.vec_id) for r in r_rows}
    assert len(e_pairs & r_pairs) >= 0.8 * len(e_pairs)


def test_path_topk_similarity_hand_case(spark):
    """Three users: A and B share most of their event-shape; C is
    different. Seeded on A (smallest key), B must outrank C, scores are
    exact integer ppm, self excluded."""
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        path_topk_similarity,
    )

    rows = []
    # user 1 and 2: same path 'svcpsvcp...'; user 3: 'eeee...'
    for u, types in ((1, "svcp" * 4), (2, "svcp" * 4), (3, "e" * 16)):
        for i, ch in enumerate(types):
            name = {"s": "signup", "v": "view", "c": "click",
                    "p": "purchase", "e": "error"}[ch]
            rows.append((u * 1000 + i, f"2024-01-01 0{i % 10}:0{i // 10}:00",
                         u, name))
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string"
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
                 "event_type")
    out = path_topk_similarity(
        df, "user_id", "ts", "event_id", "event_type",
        n_seeds=1, gram=4, top_k=5,
    ).collect()
    by_rank = {r["rank"]: r for r in out if r["seed"] == 1}
    assert by_rank[1]["user_id"] == 2
    assert by_rank[1]["score_ppm"] == 1_000_000  # identical gram sets
    assert all(r["user_id"] != 1 for r in out)   # self excluded
    assert 3 not in {r["user_id"] for r in out}  # disjoint grams: no row
