"""Water-filling allocation (sampling.waterfill_allocation) and batch
padding report (sampling.batch_padding_report): max-min-fairness
properties on a hand-sized fixture, and the length-sorted batching
dominance the report exists to demonstrate."""

from __future__ import annotations

from redshift_to_pendo_api_data_pipeline_spark.operators.sampling import (
    batch_padding_report,
    waterfill_allocation,
)


def _docs(spark, spec):
    # spec: {source: [word counts]}
    rows, i = [], 0
    for src, lens in spec.items():
        for n in lens:
            rows.append((i, " ".join(["w"] * n), src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_waterfill_small_sources_taken_whole(spark):
    # caps: a=10, b=100, c=100; budget = 50% of 210 = 105
    # level solves: 10 + 2L = 105 -> L = 47; alloc = (10, 47, 47)
    df = _docs(spark, {"a": [10], "b": [50, 50], "c": [100]})
    out = {r["source"]: r for r in
           waterfill_allocation(df, "text", "source").collect()}
    assert out["a"]["allocated"] == 10 and out["a"]["take_rate_ppm"] == 1_000_000
    assert out["b"]["allocated"] == 47 and out["c"]["allocated"] == 47
    total = sum(r["allocated"] for r in out.values())
    assert total <= 105  # never overspends (floor leftovers unspent)


def test_waterfill_budget_covers_everything(spark):
    # generous budget: every source capped by its own supply
    df = _docs(spark, {"a": [4], "b": [8]})
    out = {r["source"]: r["allocated"] for r in
           waterfill_allocation(df, "text", "source",
                                budget_ppm_of_total=1_000_000).collect()}
    assert out == {"a": 4, "b": 8}


def test_batch_padding_length_sorted_dominates(spark):
    # mixed lengths: arrival order interleaves, sorted order groups
    spec = {"s": [5, 100] * 32}
    df = _docs(spark, spec)
    out = {r["strategy"]: r for r in
           batch_padding_report(df, "text", "doc_id", batch_size=32).collect()}
    assert out["arrival"]["waste_ppm"] > out["length_sorted"]["waste_ppm"]
    # perfectly sorted equal-length batches waste nothing
    assert out["length_sorted"]["waste_ppm"] == 0
    assert out["arrival"]["n_batches"] == out["length_sorted"]["n_batches"]
    assert out["arrival"]["real_tokens"] == out["length_sorted"]["real_tokens"]


def test_waterfill_budget_exceeds_supply_gives_everything(spark):
    # budget > total supply: no row binds, __level is NULL, and the
    # coalesce(__level, cap) fallback must fire — every source gives
    # everything instead of the allocation silently going empty
    df = _docs(spark, {"a": [4], "b": [8]})
    out = {r["source"]: r for r in
           waterfill_allocation(df, "text", "source",
                                budget_ppm_of_total=1_500_000).collect()}
    assert {s: r["allocated"] for s, r in out.items()} == {"a": 4, "b": 8}
    assert all(r["take_rate_ppm"] == 1_000_000 for r in out.values())
