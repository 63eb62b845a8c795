"""Streaming data-quality monitoring: run a declarative constraint suite
(operators/quality.Suite) against every micro-batch and stream the
per-batch violation report to a callback or a lake path.

The batch flavor (quality.run_suite) is one aggregation pass; here each
micro-batch pays that same single pass via foreachBatch — constraint
evaluation stays wholly declarative, the stream never buffers, and the
report relation is O(constraints) rows per trigger. This is the shape a
pipeline uses to trip circuit breakers on a live feed (null-rate spike,
out-of-range burst) without a second scan of the data.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.quality import Suite, run_suite


def monitor_stream(
    stream: DataFrame,
    suite: Suite,
    on_report: Optional[Callable[[DataFrame, int], None]] = None,
    report_path: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
):
    """Attach the suite to a streaming DataFrame. Each micro-batch emits
    (batch_id, constraint, n_violations, n_checked) rows — to the
    ``on_report`` callback, and/or appended to ``report_path`` parquet.

    Returns the StreamingQuery (caller owns lifecycle)."""

    def _each(batch_df: DataFrame, batch_id: int) -> None:
        report = run_suite(batch_df, suite).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        if report_path is not None:
            report.write.mode("append").parquet(report_path)
        if on_report is not None:
            on_report(report, batch_id)

    writer = stream.writeStream.foreachBatch(_each)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
