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


# -------------------------------------------- singer conformance runner

import json as _json

from redshift_to_pendo_api_data_pipeline_spark.functions.singer import (
    validate_message_stream,
)

_field_names = st.sampled_from(["id", "name", "amount", "flag", "note"])
_schema_types = {
    "id": "integer", "name": "string", "amount": "number",
    "flag": "boolean", "note": "string",
}
_value_for = {
    "integer": st.integers(-10**9, 10**9),
    "number": st.floats(allow_nan=False, allow_infinity=False) | st.integers(-100, 100),
    "string": st.text(max_size=20),
    "boolean": st.booleans(),
}


@st.composite
def _valid_stream(draw):
    fields = sorted(set(draw(st.lists(_field_names, min_size=1, max_size=5))))
    props = {
        f: {"type": ["null", _schema_types[f]] if f != "id" else _schema_types[f]}
        for f in fields
    }
    lines = [
        _json.dumps({"type": "STATE", "value": {}}),
        _json.dumps({"type": "SCHEMA", "stream": "s",
                     "schema": {"type": "object", "properties": props},
                     "key_properties": ["id"] if "id" in fields else []}),
        _json.dumps({"type": "ACTIVATE_VERSION", "stream": "s", "version": 1}),
    ]
    n = draw(st.integers(0, 8))
    for _ in range(n):
        rec = {}
        for f in fields:
            if f == "id":
                rec[f] = draw(_value_for["integer"])
            elif draw(st.booleans()):
                rec[f] = draw(_value_for[_schema_types[f]])
            else:
                rec[f] = None
        lines.append(_json.dumps(
            {"type": "RECORD", "stream": "s", "version": 1, "record": rec}))
    lines.append(_json.dumps({"type": "STATE", "value": {}}))
    return lines


@given(_valid_stream())
@settings(max_examples=150, deadline=None)
def test_conformance_accepts_every_valid_stream(lines):
    assert validate_message_stream(lines) == []


@given(_valid_stream(), st.data())
@settings(max_examples=150, deadline=None)
def test_conformance_flags_any_single_corruption(lines, data):
    """Mutating one message into a violation is always detected."""
    kind = data.draw(st.sampled_from(
        ["drop_schema", "bad_type", "unknown_field", "bad_version",
         "truncate_state"]))
    mutated = list(lines)
    if kind == "drop_schema":
        mutated = [l for l in mutated if '"SCHEMA"' not in l]
        has_record = any('"RECORD"' in l for l in mutated)
        if not has_record:
            return  # nothing left to violate
    elif kind == "bad_type":
        idx = [i for i, l in enumerate(mutated) if '"RECORD"' in l]
        if not idx:
            return
        m = _json.loads(mutated[idx[0]])
        # ids are non-null integers in every generated schema
        if "id" not in m["record"]:
            return
        m["record"]["id"] = "not-an-integer"
        mutated[idx[0]] = _json.dumps(m)
    elif kind == "unknown_field":
        idx = [i for i, l in enumerate(mutated) if '"RECORD"' in l]
        if not idx:
            return
        m = _json.loads(mutated[idx[0]])
        m["record"]["__zzz"] = 1
        mutated[idx[0]] = _json.dumps(m)
    elif kind == "bad_version":
        idx = [i for i, l in enumerate(mutated) if '"RECORD"' in l]
        if not idx:
            return
        m = _json.loads(mutated[idx[0]])
        m["version"] = 999
        mutated[idx[0]] = _json.dumps(m)
    elif kind == "truncate_state":
        mutated = mutated[:-1]
        if not mutated or not any('"RECORD"' in l or '"SCHEMA"' in l
                                  for l in mutated):
            return
    assert validate_message_stream(mutated) != []


def test_funnel_flags_equals_sequential_on_random_predicates(spark):
    """Property: for ANY chain of row-level predicates, the one-scan
    flags funnel reports the same attrition as the sequential form —
    checked over a grid of random threshold chains (deterministic seed,
    no hypothesis needed for the driver: the predicate space is the
    random part)."""
    import random as _random

    from pyspark.sql import functions as F

    from redshift_to_pendo_api_data_pipeline_spark.operators.curation import (
        quality_funnel,
        quality_funnel_flags,
    )

    rng = _random.Random(17)
    df = spark.range(500).select(
        F.col("id"),
        (F.xxhash64(F.col("id")) % 1000).alias("a"),
        (F.xxhash64(F.col("id"), F.lit(1)) % 1000).alias("b"),
    )
    for _ in range(8):
        ths = [rng.randint(-1000, 1000) for _ in range(3)]
        col = [rng.choice(["a", "b"]) for _ in range(3)]
        op = [rng.choice([">=", "<"]) for _ in range(3)]
        preds = [
            F.expr(f"{c} {o} {t}") for c, o, t in zip(col, op, ths)
        ]
        seq = sorted(tuple(r) for r in quality_funnel(df, [
            (f"s{i}", (lambda p: lambda d: d.where(p))(p))
            for i, p in enumerate(preds)
        ]).collect())
        flg = sorted(tuple(r) for r in quality_funnel_flags(df, [
            (f"s{i}", p) for i, p in enumerate(preds)
        ]).collect())
        assert flg == seq, (ths, col, op)


# -------------------------------------------- PNG codec (round 7)

import numpy as np

from redshift_to_pendo_api_data_pipeline_spark.operators.multimodal import (
    png_decode,
    png_encode,
)


@given(
    st.integers(1, 8), st.integers(1, 8),
    st.sampled_from([1, 2, 3, 4]),       # gray / gray+alpha / RGB / RGBA
    st.sampled_from([0, 1, 2, 3, 4]),    # every scanline filter
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=80, deadline=None)
def test_png_roundtrip_is_identity_for_every_shape_and_filter(h, w, ch, ftype, seed):
    """encode∘decode is the identity for EVERY image shape, channel
    count, and filter type — not just the fixtures: the filters carry
    left/up dependencies, so off-by-one reconstruction errors appear as
    mismatches under random pixels immediately."""
    rng = np.random.RandomState(seed % (2**31))
    arr = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    src = arr[:, :, 0] if ch == 1 else arr
    out = png_decode(png_encode(src, filter_type=ftype))
    assert out.shape == (h, w, ch)
    assert (out == arr).all()


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=150, deadline=None)
def test_png_decode_never_accepts_garbage(blob):
    """Arbitrary non-PNG bytes must raise (bad signature), never decode
    to pixels — and a valid signature followed by garbage raises from
    the chunk/CRC layer rather than returning wrong data."""
    import pytest

    if not blob.startswith(b"\x89PNG\r\n\x1a\n"):
        with pytest.raises(ValueError):
            png_decode(blob)
    else:  # hypothesis will rarely synthesize the signature; force it too
        pass
    with pytest.raises(Exception):
        png_decode(b"\x89PNG\r\n\x1a\n" + blob)


@given(
    st.integers(0, 250), st.integers(0, 250),
    st.lists(st.tuples(st.integers(0, 255), st.integers(0, 250)),
             min_size=0, max_size=3, unique_by=lambda t: t[0]),
)
@settings(max_examples=120, deadline=None)
def test_dhash_perturbation_bounded_through_real_codec(mult, off, flips):
    """k perturbed pixels flip at most 2k dHash bits, and the hash
    survives the REAL PNG encode->decode roundtrip bit-identically
    (dhash63 of the decoded pixels == dhash63 of the source grid)."""
    import numpy as np

    from redshift_to_pendo_api_data_pipeline_spark.operators.multimodal import (
        dhash63,
        png_decode,
        png_encode,
    )

    idx = np.arange(256, dtype=np.int64) + 1
    base = ((mult * idx + off) % 251).astype(np.uint8).reshape(16, 16)
    pert = base.copy()
    for pos, val in flips:
        pert[pos // 16, pos % 16] = val
    h_base = dhash63(png_decode(png_encode(base))[:, :, 0])
    h_pert = dhash63(png_decode(png_encode(pert))[:, :, 0])
    assert h_base == dhash63(base)         # codec adds/loses nothing
    assert h_pert == dhash63(pert)
    assert 0 <= h_base < (1 << 63)
    # each flipped pixel touches at most 2 adjacent comparisons
    assert bin(h_base ^ h_pert).count("1") <= 2 * len(flips)


def test_waterfill_matches_pure_python_reference(spark):
    """Seeded random cap vectors: the relational water-fill equals the
    obvious sequential reference (sort caps, fill to the level), and
    never overspends the budget."""
    import random

    from redshift_to_pendo_api_data_pipeline_spark.operators.sampling import (
        waterfill_allocation,
    )

    rng = random.Random(41)
    for trial in range(12):
        caps = {f"s{i}": rng.randint(1, 60) for i in range(rng.randint(2, 8))}
        ppm = rng.choice([250_000, 500_000, 800_000, 1_000_000])
        rows, did = [], 0
        for src, cap in caps.items():
            rows.append((did, " ".join(["w"] * cap), src))
            did += 1
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        got = {r["source"]: r["allocated"] for r in
               waterfill_allocation(df, "text", "source",
                                    budget_ppm_of_total=ppm).collect()}

        total = sum(caps.values())
        budget = total * ppm // 1_000_000
        # reference: ascending fill
        items = sorted(caps.items(), key=lambda kv: (kv[1], kv[0]))
        want, below = {}, 0
        level = None
        for j, (src, cap) in enumerate(items):
            nabove = len(items) - j
            if level is None and below + cap * nabove >= budget:
                level = (budget - below) // nabove
            below += cap
        for src, cap in caps.items():
            want[src] = min(cap, level if level is not None else cap)
        assert got == want, (trial, caps, ppm, got, want)
        assert sum(got.values()) <= budget
