"""Property-based tests (hypothesis) for the pure-Python layers — the
invariants that must hold for EVERY input, not just the fixtures: batch
bounds (reliability layer) and hash-sampling thresholds (curation layer).
No SparkSession needed; these run in milliseconds.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from redshift_to_pendo_api_data_pipeline_spark.operators.sampling import (
    rate_to_hex_threshold,
)
from redshift_to_pendo_api_data_pipeline_spark.sink.batching import batch_records

payloads = st.lists(st.binary(min_size=0, max_size=200), max_size=100)


@given(payloads, st.integers(1, 20), st.integers(1, 500))
@settings(max_examples=200, deadline=None)
def test_batches_respect_caps_and_preserve_stream(ps, max_records, max_bytes):
    batches = list(batch_records(iter(ps), max_records=max_records, max_bytes=max_bytes))
    # caps: every batch within the record cap; within the byte cap unless
    # it is a single oversized record (reference semantics: ships alone)
    for b in batches:
        assert len(b) <= max_records
        assert sum(len(p) for p in b) <= max_bytes or len(b) == 1
    # lossless + order-preserving: concatenation reproduces the input
    assert [p for b in batches for p in b] == ps
    # no empty batches ever emitted
    assert all(b for b in batches)


@given(payloads, st.integers(1, 20), st.integers(1, 500))
@settings(max_examples=100, deadline=None)
def test_batches_are_greedy(ps, max_records, max_bytes):
    """A batch only closes because the NEXT record would violate a cap —
    no premature flushes (premature = tiny requests = rate-limit waste)."""
    batches = list(batch_records(iter(ps), max_records=max_records, max_bytes=max_bytes))
    for i, b in enumerate(batches[:-1]):
        nxt = batches[i + 1][0]
        assert (
            len(b) >= max_records
            or sum(len(p) for p in b) + len(nxt) > max_bytes
        )


@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_hex_threshold_monotone_and_bounded(rate):
    th = rate_to_hex_threshold(rate)
    assert th == "g" or (len(th) == 4 and int(th, 16) <= 0xFFFF)
    # monotone: a higher rate never yields a lexicographically smaller
    # threshold (nesting guarantee for same-salt samples)
    for other in (0.0, 0.25, 0.5, 0.75, 1.0):
        if other <= rate:
            assert rate_to_hex_threshold(other) <= th
