"""Streaming URL-keyed dedup (streaming.incremental.streaming_url_dedup):
the crawl-ingest gate — presentation-noise URL variants of one page drop
within the watermark horizon, distinct pages pass, malformed URLs never
merge with each other and are never dropped."""

from __future__ import annotations

import tempfile

from redshift_to_pendo_api_data_pipeline_spark.streaming.incremental import (
    read_stream,
    streaming_url_dedup,
)


def _run(spark, src, ckpt, schema, seen):
    sdf = streaming_url_dedup(
        read_stream(spark, src, schema), "url", "ts", "10 minutes"
    )

    def writer(batch_df, batch_id):
        seen.extend(r["doc_id"] for r in batch_df.collect())

    q = (
        sdf.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(writer)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_url_dedup(spark):
    rows1 = [
        (1, "https://e.com/a?utm_source=x", "2024-01-01 10:00:00"),
        (2, "HTTPS://E.com:443/a/", "2024-01-01 10:01:00"),  # same page as 1
        (3, "https://e.com/b", "2024-01-01 10:02:00"),        # distinct page
        (4, "not a url", "2024-01-01 10:03:00"),              # malformed: kept
        (5, "also !! not a url", "2024-01-01 10:04:00"),      # malformed: kept
    ]
    rows2 = [
        (6, "https://e.com/a", "2024-01-01 10:05:00"),  # refetch in horizon
        (7, "https://e.com/c", "2024-01-01 10:06:00"),
    ]

    def df(rows):
        return spark.createDataFrame(
            rows, "doc_id long, url string, ts_s string"
        ).selectExpr("doc_id", "url", "CAST(ts_s AS TIMESTAMP) AS ts")

    with tempfile.TemporaryDirectory() as d:
        src, ckpt, seen = f"{d}/src", f"{d}/ckpt", []
        df(rows1).coalesce(1).write.parquet(src)
        schema = spark.read.parquet(src).schema
        _run(spark, src, ckpt, schema, seen)
        assert set(seen) == {1, 3, 4, 5}  # 2 is a variant of 1; 4/5 both kept

        df(rows2).coalesce(1).write.mode("append").parquet(src)
        seen.clear()
        _run(spark, src, ckpt, schema, seen)
        assert set(seen) == {7}  # 6 is a refetch within the horizon
