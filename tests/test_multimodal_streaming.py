"""Multimodal plumbing (binary + mapInPandas) and Structured Streaming."""

import json
import tempfile

import pytest
from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators import multimodal as MM
from redshift_to_pendo_api_data_pipeline_spark.schema import StreamSpec
from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table
from redshift_to_pendo_api_data_pipeline_spark.streaming.incremental import (
    read_stream,
    run_incremental_sync,
    shape_stream,
    windowed_event_counts,
)


# ------------------------------------------------------------- multimodal
def _media_df(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return MM.attach_media(docs, "text", media_type="image/fake")


def test_attach_media_schema(spark, sf_dir):
    df = _media_df(spark, sf_dir)
    assert dict(df.dtypes)["media"] == "binary"
    meta = df.schema["media_meta"].dataType
    assert set(meta.fieldNames()) == {"type", "n_bytes"}
    row = df.select("media", "media_meta").first()
    assert row["media_meta"]["n_bytes"] == len(row["media"])


def test_decode_stats_deterministic(spark, sf_dir):
    df = _media_df(spark, sf_dir)
    out1 = {r["doc_id"]: r for r in MM.decode_stats(df, "doc_id").collect()}
    out2 = {r["doc_id"]: r for r in MM.decode_stats(df, "doc_id").collect()}
    assert len(out1) == 50
    for k in out1:
        assert out1[k]["digest"] == out2[k]["digest"]
        assert out1[k]["n_bytes"] > 0
        assert 0 <= out1[k]["mean"] <= 255


def test_thumbnails_shape(spark, sf_dir):
    df = _media_df(spark, sf_dir)
    out = MM.thumbnails(df, "doc_id", w=4, h=4).collect()
    assert all(len(r["thumb"]) == 16 for r in out)
    assert all(r["thumb_meta"]["n_bytes"] == 16 for r in out)


def test_sampled_frames_explode(spark, sf_dir):
    df = _media_df(spark, sf_dir)
    out = MM.sampled_frames(df, "doc_id", every_n=2)
    rows = out.collect()
    assert len(rows) > 50  # multiple frames per doc
    per_doc = out.groupBy("doc_id").count().collect()
    src = {r["doc_id"]: r["media_meta"]["n_bytes"]
           for r in df.select("doc_id", "media_meta").collect()}
    import math
    for r in per_doc:
        expected = math.ceil(math.ceil(src[r["doc_id"]] / 64) / 2)
        assert r["count"] == expected


def test_pil_codec_import_guard_absent(monkeypatch):
    """Without Pillow (this container), PilCodec construction raises and
    default_codec falls back to FakeCodec with a warning."""
    import importlib.util as ilu

    monkeypatch.setattr(ilu, "find_spec", lambda name: None)
    with pytest.raises(ImportError, match="Pillow"):
        MM.PilCodec()
    with pytest.warns(UserWarning, match="FakeCodec"):
        codec = MM.default_codec()
    assert isinstance(codec, MM.FakeCodec)


def test_pil_codec_used_when_pillow_present(monkeypatch):
    """With Pillow importable (mocked here), default_codec returns the
    real-decode path and PilCodec drives PIL.Image for stats, thumbnail
    and multi-frame sampling through the SAME operator API."""
    import sys
    import types

    import numpy as np

    class _Img:
        n_frames = 3

        def __init__(self, payload):
            self.payload = payload
            self._frame = 0

        def convert(self, mode):
            return self

        def resize(self, wh):
            self.wh = wh
            return self

        def seek(self, i):
            if i >= self.n_frames:
                raise EOFError
            self._frame = i

        def save(self, buf, format=None):
            buf.write(b"PNG" + bytes([self._frame]))

        def __array__(self, dtype=None, copy=None):
            return np.frombuffer(self.payload, dtype=np.uint8)

    import importlib.machinery

    pil = types.ModuleType("PIL")
    pil.__spec__ = importlib.machinery.ModuleSpec("PIL", None)
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = lambda bio: _Img(bio.getvalue())
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)

    codec = MM.default_codec()
    assert isinstance(codec, MM.PilCodec)
    stats = codec.decode_stats(b"\x00\x02\x04")
    assert stats["n_bytes"] == 3 and stats["mean"] == 2.0
    assert codec.thumbnail(b"abc", 4, 4) == b"PNG\x00"
    frames = codec.sample_frames(b"abc", every_n=2)
    assert frames == [b"PNG\x00", b"PNG\x02"]  # frames 0 and 2 of 3


# -------------------------------------------------------------- streaming
def test_streaming_incremental_sync(spark, sf_dir):
    """File-source readStream -> shape -> foreachBatch writer with
    availableNow: the one-tap-invocation analogue. New files appearing
    between runs are picked up exactly once (checkpoint = bookmark)."""
    ev = load_table(spark, sf_dir, "events")
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/src", f"{d}/ckpt"
        ev.limit(100).write.parquet(src)

        stream = StreamSpec(
            name="events", primary_key="event_id",
            replication_method="INCREMENTAL", replication_key="ts",
            field_mappings={"user_id": "visitorId"},
        )
        schema = spark.read.parquet(src).schema
        seen = []

        def writer(batch_df, batch_id):
            seen.append(batch_df.count())

        sdf = shape_stream(read_stream(spark, src, schema), stream)
        q = run_incremental_sync(sdf, ckpt, writer)
        q.awaitTermination(120)
        assert sum(seen) == 100

        # append new data; second availableNow run processes ONLY the delta
        ev.orderBy("event_id").limit(150).exceptAll(ev.orderBy("event_id").limit(100)) \
            .write.mode("append").parquet(src)
        seen.clear()
        q2 = run_incremental_sync(sdf, ckpt, writer)
        q2.awaitTermination(120)
        assert sum(seen) == 50


def test_streaming_dedup_with_watermark(spark, sf_dir):
    """Streaming exactly-once-per-key: dropDuplicates over a watermarked
    stream removes redelivered events (the idempotency guard the HTTP
    sink otherwise relies on the API for)."""
    ev = load_table(spark, sf_dir, "events").limit(200)
    with tempfile.TemporaryDirectory() as d:
        src, ckpt, seen = f"{d}/src", f"{d}/ckpt", []
        # write the same 200 events twice -> 400 input rows, 200 distinct
        ev.write.parquet(src)
        ev.write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema

        sdf = read_stream(spark, src, schema).withWatermark("ts", "1 hour") \
            .dropDuplicates(["event_id"])

        def writer(batch_df, batch_id):
            seen.extend(r["event_id"] for r in batch_df.collect())

        q = (sdf.writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .foreachBatch(writer).trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert len(seen) == 200 and len(set(seen)) == 200


def test_streaming_sessionize_stateful(spark):
    """applyInPandasWithState sessionization: open sessions cross
    micro-batch boundaries via the state store; each closed session is
    emitted exactly once, in the batch whose events closed it."""
    import os
    from datetime import datetime as dt

    from redshift_to_pendo_api_data_pipeline_spark.streaming.stateful import (
        streaming_sessionize,
    )

    def t(h, m):
        return dt(2024, 1, 1, h, m)

    batch1 = [(1, t(10, 0)), (1, t(10, 10)), (2, t(10, 0)),
              (3, t(9, 0)), (3, t(9, 5)), (3, t(11, 0))]
    batch2 = [(1, t(13, 0)), (1, t(13, 5)), (2, t(10, 20)), (2, t(14, 0))]

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/src", f"{d}/ckpt"
        spark.createDataFrame(batch1, "user_id long, ts timestamp") \
            .coalesce(1).write.parquet(src)
        # age batch-1 files so the file source orders them first
        for root, _, files in os.walk(src):
            for f in files:
                os.utime(os.path.join(root, f), (1000000000, 1000000000))
        spark.createDataFrame(batch2, "user_id long, ts timestamp") \
            .coalesce(1).write.mode("append").parquet(src)

        schema = spark.read.parquet(src).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = streaming_sessionize(stream, "user_id", "ts", gap_seconds=1800)

        per_batch = []

        def writer(batch_df, batch_id):
            per_batch.append(sorted(
                (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
                for r in batch_df.collect()
            ))

        q = (out.writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .foreachBatch(writer).trigger(availableNow=True).start())
        q.awaitTermination(120)

        closed = [s for b in per_batch for s in b]
        # user 3 closed within batch 1; users 1 and 2 closed by batch-2 gaps
        assert (3, t(9, 0), t(9, 5), 2) in closed
        assert (1, t(10, 0), t(10, 10), 2) in closed
        assert (2, t(10, 0), t(10, 20), 2) in closed   # cross-batch stitch
        assert len(closed) == 3                        # open tails not emitted
        # exactly-once: user 3's session emitted in the first batch, not re-sent
        assert any((3, t(9, 0), t(9, 5), 2) in b for b in per_batch[:1])


def test_sql_api_parity(spark, sf_dir):
    """The spark.sql() surface: registered views answer the same query as
    the DataFrame plan (both run through one Catalyst)."""
    from pyspark.sql import functions as F
    from redshift_to_pendo_api_data_pipeline_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    sql_rows = spark.sql("""
        SELECT event_type, count(*) AS n,
               sum(cast(value as decimal(18,2))) AS sum_value
        FROM events GROUP BY event_type
    """).collect()
    df_rows = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"))
        .collect()
    )
    assert sorted(map(tuple, sql_rows)) == sorted(map(tuple, df_rows))


def test_streaming_windowed_counts_with_watermark(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    with tempfile.TemporaryDirectory() as d:
        src, ckpt, out = f"{d}/src", f"{d}/ckpt", []
        ev.limit(500).write.parquet(src)
        schema = spark.read.parquet(src).schema

        sdf = read_stream(spark, src, schema)
        agg = windowed_event_counts(sdf, "ts", window="1 hour",
                                    watermark_delay="2 hours", group_col="event_type")

        def writer(batch_df, batch_id):
            out.extend(batch_df.collect())

        q = (agg.writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .foreachBatch(writer).trigger(availableNow=True).start())
        q.awaitTermination(120)
        # append-mode emits only watermark-finalized windows; totals must
        # not exceed input and grouping keys must be real event types
        assert sum(r["n"] for r in out) <= 500
        types = {r["event_type"] for r in out}
        assert types <= {"click", "view", "purchase", "signup", "error"}


def test_watermark_sized_from_lateness_histogram_admits_stragglers(spark):
    """r8 (r7 verdict #8): the lateness histogram exists to SIZE
    withWatermark delays — size_watermark_delay derives the delay from
    the measured p99 lateness, and the derived delay admits the
    planted late rows that a fixed 60-second delay provably drops."""
    import os
    from datetime import datetime as dt

    from redshift_to_pendo_api_data_pipeline_spark.operators.temporal import (
        lateness_histogram,
    )
    from redshift_to_pendo_api_data_pipeline_spark.streaming.incremental import (
        size_watermark_delay,
    )

    def t(m, s=0):
        return dt(2024, 1, 1, 10, m, s)

    # arrival log: 56 on-time events (minutes 0..55), then 4 stragglers
    # arriving AFTER the minute-59 head with event times ~9 min old
    batch1 = [(i, t(i), 1) for i in range(56)]           # on time
    head = [(100 + j, t(59, j), 1) for j in range(2)]    # advance max
    stragglers = [(200 + j, t(50, j), 1) for j in range(4)]

    arrival = batch1 + head + stragglers                 # arrival order
    log = spark.createDataFrame(
        [(k, e[0], e[1], e[2]) for k, e in enumerate(arrival)],
        "arr long, event_id long, ts timestamp, value long",
    ).select(
        "arr", "event_id", "value",
        F.unix_micros("ts").alias("ts_us"), "ts",
    )
    hist = lateness_histogram(
        log, ["arr", "event_id"], "ts_us",
        bucket_us=60_000_000, max_buckets=12,
    )
    derived = size_watermark_delay(hist, admit_ppm=990_000)
    # stragglers are ~9 min late (event 10:50 vs max 10:59) and are
    # >1% of mass, so the 99% admit target must reach their bucket
    derived_secs = int(derived.split()[0])
    assert 9 * 60 <= derived_secs <= 10 * 60

    # end-to-end: two micro-batches; the second carries the stragglers
    # after batch 1 advanced the watermark to (10:59 - delay)
    def run(delay: str) -> int:
        out = []
        with tempfile.TemporaryDirectory() as d:
            src, ckpt = f"{d}/src", f"{d}/ckpt"
            spark.createDataFrame(
                [(e[0], e[1], e[2]) for e in batch1 + head],
                "event_id long, ts timestamp, value long",
            ).coalesce(1).write.parquet(src)
            schema = spark.read.parquet(src).schema

            def writer(batch_df, batch_id):
                out.extend(batch_df.collect())

            def one_pass():
                sdf = read_stream(spark, src, schema)
                agg = windowed_event_counts(
                    sdf, "ts", window="5 minutes", watermark_delay=delay
                )
                q = (agg.writeStream.outputMode("update")
                     .option("checkpointLocation", ckpt)
                     .foreachBatch(writer)
                     .trigger(availableNow=True).start())
                q.awaitTermination(120)

            one_pass()
            spark.createDataFrame(
                [(e[0], e[1], e[2]) for e in stragglers],
                "event_id long, ts timestamp, value long",
            ).coalesce(1).write.mode("append").parquet(src)
            one_pass()
        # update mode RE-emits a window when late rows join it: the
        # final count per window is the LAST emission (out preserves
        # micro-batch order)
        final = {}
        for r in out:
            final[r["window"]["start"]] = r["n"]
        return sum(final.values())

    n_fixed = run("60 seconds")
    n_derived = run(derived)
    # fixed 60s: watermark after batch 1 sits at ~10:58, the 10:50
    # stragglers are behind it and dropped; derived ~9-10 min admits them
    assert n_derived == n_fixed + 4


def test_streaming_debounce_kept_event_semantics(spark):
    """Kept-event debounce: each EMITTED event resets the clock (a long
    burst emits only its head), and the clock survives micro-batch
    boundaries through the state store."""
    import os
    from datetime import datetime as dt

    from redshift_to_pendo_api_data_pipeline_spark.streaming.stateful import (
        streaming_debounce,
    )

    def t(m, s=0):
        return dt(2024, 1, 1, 10, m, s)

    # user 1 clicks at 40 s spacing. Kept-event semantics: 1 kept (clock
    # 10:00:00); 2 dropped at 40 s WITHOUT resetting the clock; 3 kept
    # (80 s after the last KEPT) — the exact dual of lag-based debounce,
    # which drops BOTH followers (see test_debounce_lag_is_to_previous_
    # raw_event); the two tests together pin the semantic difference.
    batch1 = [(1, "click", 1, t(0)), (1, "click", 2, t(0, 40)),
              (1, "click", 3, t(1, 20)), (2, "view", 10, t(0))]
    # cross-batch: the state store carries user 1's clock (10:01:20 from
    # event 3) into batch 2 — event 4 at 10:02:00 is 40 s after it (DROP),
    # event 5 at 10:02:30 is 70 s after it (KEEP, reset)
    batch2 = [(1, "click", 4, t(2)), (1, "click", 5, t(2, 30)),
              (2, "view", 11, t(0, 59))]

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/src", f"{d}/ckpt"
        spark.createDataFrame(
            batch1, "user_id long, event_type string, event_id long, ts timestamp"
        ).coalesce(1).write.parquet(src)
        for root, _, files in os.walk(src):
            for f in files:
                os.utime(os.path.join(root, f), (1000000000, 1000000000))
        spark.createDataFrame(
            batch2, "user_id long, event_type string, event_id long, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(src)

        schema = spark.read.parquet(src).schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = streaming_debounce(stream, gap_seconds=60)

        kept = []

        def writer(batch_df, batch_id):
            kept.extend((r["user_id"], r["event_id"]) for r in batch_df.collect())

        q = (out.writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .foreachBatch(writer).trigger(availableNow=True).start())
        q.awaitTermination(120)

        got = sorted(kept)
        # in-burst drop (2), kept-clock re-admit (3), cross-batch drop (4),
        # cross-batch re-admit (5), 59 s boundary drop (11)
        assert got == [(1, 1), (1, 3), (1, 5), (2, 10)]


def test_streaming_neardup_against_staged_corpus(spark, tmp_path):
    """The streaming ingest-dedup shape: corpus signatures staged once,
    then a file-source stream of new docs is near-dup-checked per
    micro-batch via asymmetric banding against the staged relation.
    Mirrors the batch incremental_neardup semantics exactly-once."""
    from redshift_to_pendo_api_data_pipeline_spark.streaming.dedup_bridge import (
        streaming_neardup_against_corpus,
    )

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
        "lima mike november oscar papa quebec romeo sierra tango uniform "
        "victor whiskey xray yankee zulu one two three four"
    )
    near = " ".join(
        w if i != 15 else "CHANGED" for i, w in enumerate(base.split())
    )  # one word of 30 changed -> Jaccard ~0.84, lands in a band
    corpus = spark.createDataFrame(
        [
            (1, base),
            (2, "an entirely different corpus document about spark plans"),
            (3, "rate limiting uses a token bucket with a global budget"),
        ],
        "doc_id long, text string",
    )
    new_rows = [
        (101, near),  # near-dup of corpus doc 1
        # exact text of corpus doc 3
        (102, "rate limiting uses a token bucket with a global budget"),
        # novel
        (103, "completely novel content that matches nothing in the lake"),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(new_rows, "doc_id long, text string").write.parquet(src)

    got = []

    def on_pairs(pairs, batch_id):
        got.extend((r["id_a"], r["id_b"]) for r in pairs.collect())

    q = streaming_neardup_against_corpus(
        spark.readStream.schema("doc_id long, text string").parquet(src),
        corpus,
        "text",
        "doc_id",
        stage_corpus=str(tmp_path / "corpus_sigs.parquet"),
        checkpoint=str(tmp_path / "ckpt"),
        on_pairs=on_pairs,
        threshold=0.6,
    )
    q.awaitTermination(120)
    assert (102, 3) in got            # exact dup found
    assert (101, 1) in got            # near dup found
    assert all(a != 103 for a, _ in got)  # novel doc clean


def test_streaming_anomalies_matches_batch_flavor(spark):
    """Stateful z-score flags agree bit-for-bit with the batch window
    operator when events arrive in ts order — including the event at the
    head of batch 2, whose frame lives entirely in the state store."""
    import os
    from datetime import datetime as dt

    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        windowed_anomalies,
    )
    from redshift_to_pendo_api_data_pipeline_spark.streaming.stateful import (
        streaming_anomalies,
    )

    rows = [
        (1, dt(2024, 1, 1, 0, 0, i), i + 1, 10.0 if i not in (14, 17) else 400.0)
        for i in range(20)
    ]
    schema = "user_id long, ts timestamp, event_id long, value double"
    batch1, batch2 = rows[:12], rows[12:]

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/src", f"{d}/ckpt"
        spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(src)
        for root, _, files in os.walk(src):
            for f in files:
                os.utime(os.path.join(root, f), (1000000000, 1000000000))
        spark.createDataFrame(batch2, schema).coalesce(1) \
            .write.mode("append").parquet(src)

        stream = (spark.readStream.schema(spark.read.parquet(src).schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = streaming_anomalies(stream, frame=10, min_n=5)

        got = {}

        def writer(batch_df, batch_id):
            for r in batch_df.collect():
                got[r["event_id"]] = (r["v_cents"], r["is_anomaly"])

        q = (out.writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .foreachBatch(writer).trigger(availableNow=True).start())
        q.awaitTermination(120)

    batch_df = spark.createDataFrame(rows, schema)
    want = {
        r["event_id"]: (r["v_cents"], r["is_anomaly"])
        for r in windowed_anomalies(
            batch_df, "user_id", "ts", "value", "event_id", frame=10, min_n=5
        ).collect()
    }
    assert got == want
    assert sum(f for _, f in got.values()) >= 1  # the spikes actually flag


def test_streaming_quality_monitor_per_batch_reports(spark):
    """foreachBatch constraint suite: planted violations appear in the
    right batch's report, clean batches report zero."""
    import os

    from redshift_to_pendo_api_data_pipeline_spark.operators.quality import (
        Suite, in_range, not_null,
    )
    from redshift_to_pendo_api_data_pipeline_spark.streaming.quality_monitor import (
        monitor_stream,
    )

    schema = "id long, amount double"
    batch1 = [(1, 5.0), (2, 7.0)]           # clean
    batch2 = [(3, -1.0), (4, 9.0), (5, None)]  # one range + one null violation

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/src", f"{d}/ckpt"
        spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(src)
        for root, _, files in os.walk(src):
            for f in files:
                os.utime(os.path.join(root, f), (1000000000, 1000000000))
        spark.createDataFrame(batch2, schema).coalesce(1) \
            .write.mode("append").parquet(src)

        suite = (Suite()
                 .require(not_null("amount"))
                 .require(in_range("amount", lo=0.0)))
        stream = (spark.readStream.schema(spark.read.parquet(src).schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))

        reports = {}

        def on_report(df, batch_id):
            reports[batch_id] = {
                r["constraint"]: r["n_violations"] for r in df.collect()
            }

        q = monitor_stream(stream, suite, on_report=on_report,
                           checkpoint_dir=ckpt)
        q.processAllAvailable(); q.stop()

    assert len(reports) >= 2
    first, last = min(reports), max(reports)
    assert all(v == 0 for v in reports[first].values())
    assert sum(reports[last].values()) == 2


def test_streaming_funnel_matches_batch_and_crosses_batches(spark):
    """Stateful funnel: stage reaches agree with the batch operator on
    the full event set, including a user whose signup is in batch 1 and
    purchase in batch 2 (state store carries the progression)."""
    import os
    from datetime import datetime as dt

    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        sequential_funnel,
    )
    from redshift_to_pendo_api_data_pipeline_spark.streaming.stateful import (
        streaming_funnel,
    )

    STEPS = ["signup", "view", "purchase"]
    rows = [
        # user 1 completes across the batch boundary
        (1, "signup", dt(2024, 1, 1, 10, 0)),
        (1, "view", dt(2024, 1, 1, 10, 5)),
        (1, "purchase", dt(2024, 1, 1, 12, 0)),      # batch 2
        # user 2: view before signup does not count; re-view after does
        (2, "view", dt(2024, 1, 1, 9, 0)),
        (2, "signup", dt(2024, 1, 1, 9, 30)),
        (2, "view", dt(2024, 1, 1, 11, 0)),          # batch 2
        # user 3 never signs up
        (3, "view", dt(2024, 1, 1, 9, 0)),
    ]
    schema = "user_id long, event_type string, ts timestamp"
    batch1 = [r for r in rows if r[2] < dt(2024, 1, 1, 10, 30)]
    batch2 = [r for r in rows if r[2] >= dt(2024, 1, 1, 10, 30)]

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/src", f"{d}/ckpt"
        spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(src)
        for root, _, files in os.walk(src):
            for f in files:
                os.utime(os.path.join(root, f), (1000000000, 1000000000))
        spark.createDataFrame(batch2, schema).coalesce(1) \
            .write.mode("append").parquet(src)

        stream = (spark.readStream.schema(spark.read.parquet(src).schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = streaming_funnel(stream, STEPS)

        reaches = []

        def writer(batch_df, batch_id):
            reaches.extend(
                (r["user_id"], r["step_idx"], r["step"]) for r in batch_df.collect()
            )

        q = (out.writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .foreachBatch(writer).trigger(availableNow=True).start())
        q.awaitTermination(120)

    assert sorted(reaches) == [
        (1, 0, "signup"), (1, 1, "view"), (1, 2, "purchase"),
        (2, 0, "signup"), (2, 1, "view"),
    ]
    # counts per step equal the batch funnel on the union
    from collections import Counter
    got = Counter(s for _, _, s in reaches)
    batch_counts = {
        r["step"]: r["n_users"]
        for r in sequential_funnel(
            spark.createDataFrame(rows, schema), "user_id", "event_type", "ts", STEPS
        ).collect()
    }
    assert got == Counter({k: v for k, v in batch_counts.items() if v})


def test_streaming_funnel_same_timestamp_events_scan_in_funnel_order(spark):
    """Two consecutive steps sharing one timestamp must BOTH count
    (batch semantics: ts >= t_reach). A ts-only stable sort could visit
    'view' before 'signup' when they tie and drop the advance; the
    stage-index secondary sort makes the scan order deterministic."""
    from datetime import datetime as dt

    from redshift_to_pendo_api_data_pipeline_spark.streaming.stateful import (
        streaming_funnel,
    )

    STEPS = ["signup", "view", "purchase"]
    t = dt(2024, 1, 1, 10, 0)
    # deliberately list the later step FIRST so a naive stable ts sort
    # keeps it ahead of the signup it depends on
    rows = [(1, "view", t), (1, "signup", t), (1, "purchase", t)]
    schema = "user_id long, event_type string, ts timestamp"

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/src", f"{d}/ckpt"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
        stream = (spark.readStream.schema(spark.read.parquet(src).schema)
                  .parquet(src))
        out = streaming_funnel(stream, STEPS)
        reaches = []

        def writer(batch_df, batch_id):
            reaches.extend(
                (r["user_id"], r["step_idx"], r["step"]) for r in batch_df.collect()
            )

        q = (out.writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .foreachBatch(writer).trigger(availableNow=True).start())
        q.awaitTermination(120)

    assert sorted(reaches) == [
        (1, 0, "signup"), (1, 1, "view"), (1, 2, "purchase"),
    ]


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def test_png_decode_spec_grounded_hand_filtered_scanlines():
    """Decoder certified AGAINST THE SPEC, independently of the encoder:
    a 3x3 RGB PNG is built by hand — chunk layout, CRCs, and one
    scanline per filter type (Sub/Average/Paeth) whose filtered bytes
    were computed BY HAND from the RFC 2083 formulas and are hard-coded
    literals here. png_decode must recover the exact pixel matrix."""
    import struct
    import zlib

    import numpy as np

    from redshift_to_pendo_api_data_pipeline_spark.operators.multimodal import (
        png_decode,
    )

    raw = np.array([
        [[10, 20, 30], [40, 50, 60], [70, 80, 90]],
        [[15, 25, 35], [45, 55, 65], [75, 85, 95]],
        [[200, 100, 50], [25, 250, 125], [0, 255, 128]],
    ], dtype=np.uint8)
    # hand-computed filtered scanlines (see docstring):
    sub = bytes([1, 10, 20, 30, 30, 30, 30, 30, 30, 30])           # row 0
    avg = bytes([3, 10, 15, 20, 18, 18, 18, 18, 18, 18])           # row 1
    paeth = bytes([4, 185, 75, 15, 81, 150, 60, 211, 5, 3])        # row 2
    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n"
           + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", zlib.compress(sub + avg + paeth))
           + _png_chunk(b"IEND", b""))
    assert (png_decode(png) == raw).all()


def test_png_decode_palette_and_up_filter():
    """Palette (color type 3) expands through PLTE to RGB; the Up filter
    reconstructs against the prior scanline (hand-filtered literals)."""
    import struct
    import zlib

    import numpy as np

    from redshift_to_pendo_api_data_pipeline_spark.operators.multimodal import (
        png_decode,
    )

    # 2x3 palette image, indices: row0 = 0,1,2 ; row1 = 2,1,0
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    row0 = bytes([0, 0, 1, 2])                        # filter None
    # Up filter: enc = raw - up -> raw1 = [2,1,0], up = [0,1,2]
    row1 = bytes([2, 2, 0, 254])
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n"
           + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"PLTE", plte)
           + _png_chunk(b"IDAT", zlib.compress(row0 + row1))
           + _png_chunk(b"IEND", b""))
    out = png_decode(png)
    expect = np.array([
        [[255, 0, 0], [0, 255, 0], [0, 0, 255]],
        [[0, 0, 255], [0, 255, 0], [255, 0, 0]],
    ], dtype=np.uint8)
    assert (out == expect).all()


def test_png_roundtrip_all_filters_and_channel_counts():
    """encode->decode is the identity for gray/RGB/RGBA under every
    scanline filter type (0-4) — each encoder filter drives the matching
    decoder unfilter path on data with real left/up dependencies."""
    import numpy as np

    from redshift_to_pendo_api_data_pipeline_spark.operators.multimodal import (
        png_decode,
        png_encode,
    )

    rng = np.random.RandomState(7)
    for ch in (1, 2, 3, 4):  # gray, gray+alpha, RGB, RGBA
        shape = (5, 4) if ch == 1 else (5, 4, ch)
        arr = rng.randint(0, 256, size=shape, dtype=np.uint8) if ch != 1 \
            else rng.randint(0, 256, size=shape).astype(np.uint8)
        want = arr[:, :, None] if ch == 1 else arr
        for ftype in range(5):
            got = png_decode(png_encode(arr, filter_type=ftype))
            assert (got == want).all(), (ch, ftype)


def test_png_decode_rejects_corruption_and_unsupported():
    import struct
    import zlib

    import numpy as np
    import pytest

    from redshift_to_pendo_api_data_pipeline_spark.operators.multimodal import (
        png_decode,
        png_encode,
    )

    good = png_encode(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JFIF" + good)
    # flip one IDAT byte -> CRC check trips
    bad = bytearray(good)
    bad[41] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(bad))
    # 16-bit depth declared unsupported, not silently wrong
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    deep = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 7))
            + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="8-bit"):
        png_decode(deep)


def test_png_codec_real_decode_through_spark_pipeline(spark):
    """PngCodec end-to-end through the actual Spark operators — the
    image twin of the WavCodec certification: synthesize real PNGs,
    run decode_stats / thumbnails / sampled_frames over mapInPandas,
    pin outputs to numpy ground truth from the same pixel matrices."""
    import numpy as np

    from redshift_to_pendo_api_data_pipeline_spark.operators import multimodal as MM

    rng = np.random.RandomState(42)
    imgs = {
        1: rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8),
        2: rng.randint(0, 256, size=(9, 7, 3), dtype=np.uint8),
        3: rng.randint(0, 256, size=(8, 8), dtype=np.uint8),  # gray
    }
    payloads = {k: MM.png_encode(v) for k, v in imgs.items()}
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "item_id long, payload binary",
    )
    media = MM.attach_media(df, "payload", media_type="image/png")
    codec = MM.PngCodec()

    stats = {r["item_id"]: r for r in
             MM.decode_stats(media, "item_id", codec=codec).collect()}
    for iid, arr in imgs.items():
        if arr.ndim == 3:
            p = arr.astype(np.int64)
            luma = (299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]) // 1000
        else:
            luma = arr.astype(np.int64)
        assert stats[iid]["n_bytes"] == len(payloads[iid])
        assert abs(stats[iid]["mean"] - luma.mean()) < 1e-9
        assert abs(stats[iid]["std"] - luma.std()) < 1e-9

    thumbs = {r["item_id"]: bytes(r["thumb"]) for r in
              MM.thumbnails(media, "item_id", w=4, h=4, codec=codec).collect()}
    for iid, arr in imgs.items():
        got = MM.png_decode(thumbs[iid])
        rgb = arr[:, :, :3] if arr.ndim == 3 else \
            np.repeat(arr[:, :, None], 3, axis=2)
        sh, sw = rgb.shape[:2]
        ys = (np.arange(4) * sh // 4).clip(0, sh - 1)
        xs = (np.arange(4) * sw // 4).clip(0, sw - 1)
        assert (got == rgb[ys][:, xs]).all(), iid

    n_frames = {r["item_id"]: r["n"] for r in
                MM.sampled_frames(media, "item_id", every_n=1, codec=codec)
                .groupBy("item_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert n_frames == {1: 1, 2: 1, 3: 1}  # PNG: single canonical frame


def test_wav_codec_real_decode_through_spark_pipeline(spark):
    """WavCodec is the one fully-REAL codec certifiable in this sandbox
    (stdlib wave, no Pillow/av needed): synthesize 16-bit PCM WAVs,
    push them through the actual Spark operators (decode_stats /
    sampled_frames / thumbnails over mapInPandas), and pin the outputs
    to numpy ground truth computed from the same PCM."""
    import io
    import wave as wavmod

    import numpy as np

    from redshift_to_pendo_api_data_pipeline_spark.operators import multimodal as MM

    def make_wav(freq_hz, n_samples, rate=8000, n_ch=1):
        t = np.arange(n_samples) / rate
        pcm = (np.sin(2 * np.pi * freq_hz * t) * 12000).astype("<i2")
        if n_ch == 2:
            pcm = np.column_stack([pcm, pcm]).ravel().astype("<i2")
        buf = io.BytesIO()
        with wavmod.open(buf, "wb") as w:
            w.setnchannels(n_ch)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(pcm.tobytes())
        return buf.getvalue(), pcm

    w1, p1 = make_wav(440, 4096)
    w2, p2 = make_wav(220, 2500)
    w3, _ = make_wav(330, 1000, n_ch=2)  # stereo: mono-mixed by the codec
    df = spark.createDataFrame(
        [(1, bytearray(w1)), (2, bytearray(w2)), (3, bytearray(w3))],
        "item_id long, payload binary",
    )
    media = MM.attach_media(df, "payload", media_type="audio/wav")
    codec = MM.WavCodec()

    stats = {r["item_id"]: r for r in
             MM.decode_stats(media, "item_id", codec=codec).collect()}
    for iid, (wav, pcm) in ((1, (w1, p1)), (2, (w2, p2))):
        amp = np.abs(pcm.astype(np.float64))
        assert stats[iid]["n_bytes"] == len(wav)
        assert abs(stats[iid]["mean"] - amp.mean()) < 1e-6
        assert abs(stats[iid]["std"] - amp.std()) < 1e-6
    assert stats[3]["n_bytes"] == len(w3)

    frames = {r["item_id"]: r["n_frames"] for r in
              MM.sampled_frames(media, "item_id", every_n=2, codec=codec)
              .groupBy("item_id").agg(F.count(F.lit(1)).alias("n_frames"))
              .collect()}
    # 4096 samples -> 4 chunks of 1024 -> every 2nd = 2; 2500 -> 3 -> 2;
    # stereo 1000 frames mono-mix to 1000 samples -> 1 chunk -> 1
    assert frames == {1: 2, 2: 2, 3: 1}

    thumb = MM.thumbnails(media, "item_id", w=8, h=4, codec=codec).collect()
    for r in thumb:
        assert len(r["thumb"]) == 32  # w*h envelope bytes
        assert max(r["thumb"]) == 255  # peak-normalized


def test_streaming_hll_registers_match_batch_and_tolerate_replay(spark, tmp_path):
    """Streaming sketch maintenance (round 7): the register rollup after
    draining N micro-batches equals the batch HLL over all data (max-merge
    is lossless for registers), the estimate lands in the accuracy band,
    and a REPLAYED micro-batch leaves the rollup byte-identical — the
    idempotence sums don't have, which is the entire argument for
    maintaining sketches instead of raw distinct counts on a stream."""
    from redshift_to_pendo_api_data_pipeline_spark.operators import analytics as A
    from redshift_to_pendo_api_data_pipeline_spark.sink import parquet_sink as PS
    from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table
    from redshift_to_pendo_api_data_pipeline_spark.streaming.sketches import (
        hll_register_stream,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events") \
        .select("event_type", "user_id")
    src = str(tmp_path / "incoming")
    # three files -> three micro-batches with maxFilesPerTrigger=1
    ev.where(F.col("user_id") % 3 == 0).coalesce(1).write.parquet(src)
    ev.where(F.col("user_id") % 3 == 1).coalesce(1).write.mode("append").parquet(src)
    ev.where(F.col("user_id") % 3 == 2).coalesce(1).write.mode("append").parquet(src)

    rollup = str(tmp_path / "hll_rollup")
    q = hll_register_stream(
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", 1).parquet(src),
        "user_id", ["event_type"], rollup,
        checkpoint=str(tmp_path / "ckpt"), m=64,
    )
    q.awaitTermination(180)

    streamed = sorted(map(tuple, PS.read_active(spark, rollup).collect()))
    batch = sorted(map(tuple,
                       A.hyperloglog_registers(ev, "user_id",
                                               ["event_type"], m=64).collect()))
    assert streamed == batch

    # estimate accuracy per type against the exact distinct count
    exact = {r["event_type"]: r["n"] for r in
             ev.groupBy("event_type").agg(
                 F.countDistinct("user_id").alias("n")).collect()}
    regs: dict = {}
    for et, _bucket, register in streamed:
        regs.setdefault(et, []).append(register)
    for et, rs in regs.items():
        est = A.hll_estimate(rs, m=64)
        assert abs(est - exact[et]) / exact[et] < 0.45, (et, est, exact[et])

    # replay: fold an already-applied batch again -> rollup unchanged
    # (max-merge idempotence, independent of the version guard)
    active_before = PS.active_version(rollup)
    first_file_df = spark.read.parquet(src).limit(0).unionByName(
        ev.where(F.col("user_id") % 3 == 0))
    merged = (
        PS.read_active(spark, rollup).select("event_type", "bucket", "register")
        .unionByName(A.hyperloglog_registers(first_file_df, "user_id",
                                             ["event_type"], m=64))
        .groupBy("event_type", "bucket")
        .agg(F.max("register").alias("register"))
    )
    assert sorted(map(tuple, merged.collect())) == streamed
    assert PS.active_version(rollup) == active_before


def test_streaming_kmv_sketches_match_batch(spark, tmp_path):
    """The streaming KMV rollup equals the batch sketch after draining
    all micro-batches (min-k-merge is lossless for the k smallest), and
    pair-overlap estimates computed FROM the streamed rollup equal the
    batch path's."""
    from redshift_to_pendo_api_data_pipeline_spark.operators import analytics as A
    from redshift_to_pendo_api_data_pipeline_spark.sink import parquet_sink as PS
    from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table
    from redshift_to_pendo_api_data_pipeline_spark.streaming.sketches import (
        kmv_sketch_stream,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events") \
        .select("event_type", "user_id")
    src = str(tmp_path / "incoming")
    ev.where(F.col("user_id") % 2 == 0).coalesce(1).write.parquet(src)
    ev.where(F.col("user_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    rollup = str(tmp_path / "kmv_rollup")
    q = kmv_sketch_stream(
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", 1).parquet(src),
        "user_id", "event_type", rollup,
        checkpoint=str(tmp_path / "ckpt"), k=64,
    )
    q.awaitTermination(180)

    streamed = PS.read_active(spark, rollup)
    batch = A.kmv_sketches(ev, "user_id", "event_type", k=64)
    assert sorted(map(tuple, streamed.collect())) == \
        sorted(map(tuple, batch.collect()))

    est_s = sorted(map(tuple, A.kmv_pair_overlap(
        streamed, "event_type", k=64).collect()))
    est_b = sorted(map(tuple, A.kmv_pair_overlap(
        batch, "event_type", k=64).collect()))
    assert est_s == est_b and len(est_s) > 0


def test_streaming_cusum_matches_batch_twin(spark):
    """The stateful CUSUM chart agrees bit-for-bit with the batch
    prefix-closed-form operator across a micro-batch boundary — the
    (P, minP) pair must survive the trigger."""
    import os

    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        cusum_alarms,
    )
    from redshift_to_pendo_api_data_pipeline_spark.streaming.stateful import (
        streaming_cusum,
    )

    vals = [100] * 10 + [160] * 5
    batch_df = spark.createDataFrame(
        [("g", t, v) for t, v in enumerate(vals)], "g string, t long, x long"
    )
    want = {r["t"]: (r["s"], r["alarm"]) for r in
            cusum_alarms(batch_df, "g", "t", "x").collect()}

    # the batch operator derives target/k from the whole series; feed the
    # same reference to the stream (control-chart deployment shape)
    target = sum(vals) // len(vals)
    k = target // 8
    rows = [("g", t, v, target, k) for t, v in enumerate(vals)]
    schema = "g string, t long, x long, target long, k long"
    b1, b2 = rows[:8], rows[8:]

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/src", f"{d}/ckpt"
        spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src)
        for root, _, files in os.walk(src):
            for f in files:
                os.utime(os.path.join(root, f), (1000000000, 1000000000))
        spark.createDataFrame(b2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        stream = (spark.readStream.schema(spark.read.parquet(src).schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = streaming_cusum(stream)
        got = {}

        def writer(batch_df, batch_id):
            for r in batch_df.collect():
                got[r["t"]] = (r["s"], r["alarm"])

        q = (out.writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .foreachBatch(writer).trigger(availableNow=True).start())
        q.awaitTermination(120)

    assert got == want
    assert got[14][1] == 1  # the level shift alarms in batch 2


def test_streaming_lateness_matches_batch_twin(spark):
    """The stateful lateness monitor agrees with the batch
    lateness_histogram's per-record lateness across a micro-batch
    boundary — the running-max state must survive the trigger."""
    import os

    from redshift_to_pendo_api_data_pipeline_spark.operators.temporal import (
        lateness_histogram,
    )
    from redshift_to_pendo_api_data_pipeline_spark.streaming.stateful import (
        streaming_lateness,
    )

    # arrival 0..9 with out-of-order event times incl. a regression
    # that straddles the batch boundary (arrival 7 carries ts 40 < the
    # max 90 seen in batch 1)
    ts = [10, 50, 30, 90, 70, 20, 80, 40, 95, 60]
    rows = [("g", a, t) for a, t in enumerate(ts)]
    schema = "g string, arr long, ts_us long"
    batch_df = spark.createDataFrame(rows, schema)
    want_hist = {
        (r.bucket): r.n_events
        for r in lateness_histogram(
            batch_df, ["arr"], "ts_us", bucket_us=20, max_buckets=5
        ).collect()
    }
    b1, b2 = rows[:6], rows[6:]
    got = {}
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = f"{d}/src", f"{d}/ckpt"
        spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src)
        for root, _, files in os.walk(src):
            for f in files:
                os.utime(os.path.join(root, f), (1000000000, 1000000000))
        spark.createDataFrame(b2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        stream = (spark.readStream.schema(spark.read.parquet(src).schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = streaming_lateness(stream)

        def writer(bdf, batch_id):
            for r in bdf.collect():
                got[r["arr"]] = r["late_us"]

        q = (out.writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .foreachBatch(writer).trigger(availableNow=True).start())
        q.awaitTermination(120)

    # per-record lateness from the stream, bucketed like the batch twin
    import collections
    hist = collections.Counter(min(5, late // 20) for late in got.values())
    assert dict(hist) == want_hist
    # the cross-boundary regression: arrival 7 (ts 40) is 50 late vs
    # the batch-1 max 90 — provable only if state crossed the trigger
    assert got[7] == 50
