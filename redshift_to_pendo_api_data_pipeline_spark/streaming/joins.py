"""Stream-stream joins: watermarked, time-bounded, state-bounded.

The reference is strictly batch micro-pulls (tap-redshift/src/sync.py
cursor loop); the streaming-incremental variant of this engine
(streaming/incremental.py) re-expresses that single stream. This module
adds the genuinely two-sided case a live pipeline needs — e.g. correlate
the extract stream with the sink's failure stream to re-route records
without a batch reconciliation pass.

Spark executes this as a symmetric stateful hash join: each side buffers
rows in the state store until the watermark says the other side can no
longer produce matches. Both requirements for bounded state are encoded
here and enforced by the planner:

- a watermark on BOTH event-time columns (late-data cutoff), and
- a time-range join condition relating the two event times, which gives
  the state eviction policy its bound.

Without either, state grows without limit at 100 TB/day rates — so this
wrapper refuses to build the join rather than defaulting to unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right event lands in
    ``[left_ts, left_ts + within]``.

    ``within`` / ``watermark`` are SQL interval strings ("1 hour"). State
    per key is bounded by watermark + within. Outer flavors emit the
    unmatched side only once the watermark passes — same semantics as
    Spark's documented stream-stream outer join contract."""
    if not within or not watermark:
        raise ValueError("stream-stream join requires a time bound and watermark")
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}")
        )
    )
    return lw.join(rw, cond, how)
