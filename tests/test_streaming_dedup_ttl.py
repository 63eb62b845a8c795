"""TTL-bounded streaming exact dedup
(streaming.incremental.streaming_exact_dedup): a replay inside the
watermark horizon is dropped, the digest state self-evicts once the
watermark passes, and a replay AFTER eviction is admitted again — the
semantics plain dropDuplicates (state-forever) cannot provide."""

from __future__ import annotations

import tempfile

from redshift_to_pendo_api_data_pipeline_spark.streaming.incremental import (
    read_stream,
    streaming_exact_dedup,
)


def _run(spark, src, ckpt, schema, seen):
    sdf = streaming_exact_dedup(
        read_stream(spark, src, schema), "text", "ts", "10 minutes"
    )

    def writer(batch_df, batch_id):
        seen.extend(
            (r["doc_id"], r["text"]) for r in batch_df.collect()
        )

    q = (
        sdf.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(writer)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_exact_dedup_ttl(spark):
    rows1 = [
        (1, "alpha doc", "2024-01-01 10:00:00"),
        (2, "beta  doc", "2024-01-01 10:01:00"),
        (3, "Alpha   DOC", "2024-01-01 10:02:00"),  # same digest as 1
    ]
    rows2 = [
        (4, "alpha doc", "2024-01-01 10:05:00"),  # replay in horizon
        (5, "gamma doc", "2024-01-01 11:00:00"),  # advances watermark
    ]
    rows3 = [
        (6, "alpha doc", "2024-01-01 11:05:00"),  # after eviction
    ]

    def df(rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, ts_s string"
        ).selectExpr("doc_id", "text", "CAST(ts_s AS TIMESTAMP) AS ts")

    with tempfile.TemporaryDirectory() as d:
        src, ckpt, seen = f"{d}/src", f"{d}/ckpt", []
        df(rows1).coalesce(1).write.parquet(src)
        schema = spark.read.parquet(src).schema

        _run(spark, src, ckpt, schema, seen)
        ids = {i for i, _ in seen}
        assert 1 in ids and 2 in ids
        assert 3 not in ids  # normalization: case/whitespace collapse

        df(rows2).coalesce(1).write.mode("append").parquet(src)
        seen.clear()
        _run(spark, src, ckpt, schema, seen)
        ids = {i for i, _ in seen}
        assert 4 not in ids  # replay within the 10-minute horizon
        assert 5 in ids

        # watermark is now 11:00 - 10m = 10:50 > alpha's 10:00 + TTL;
        # the digest state was evicted, the late replay is admitted
        df(rows3).coalesce(1).write.mode("append").parquet(src)
        seen.clear()
        _run(spark, src, ckpt, schema, seen)
        ids = {i for i, _ in seen}
        assert 6 in ids
