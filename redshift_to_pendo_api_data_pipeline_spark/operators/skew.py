"""Skew mitigation: salting for hot keys, bucketing for co-located joins.

At 100 TB a handful of hot keys (the empty document, a default UUID, a
bot user) can pin one reducer for hours. Three tools, in preference order:

1. AQE skew-join splitting — free, enabled in session.py; handles join
   skew at runtime.
2. Salted two-phase aggregation (here) — for skewed groupBy where one key
   dominates: partial-aggregate on (key, salt) so the hot key spreads over
   S reducers, then merge the S partials. Exact for decomposable
   aggregates (count/sum/min/max).
3. Salted replicated join (here) — manual fallback when AQE can't help
   (e.g. the skewed side must stream): the big side salts randomly, the
   small side is replicated across all salts, so a hot key's rows land on
   S different reducers.

Bucketing (co-located joins) needs no operator code: write both tables
with ``df.write.bucketBy(n, key).sortBy(key).saveAsTable(...)`` and
repeated equi-joins on the key run with ZERO Exchange (verified in
tests/test_bucketing.py). That is the 100 TB answer to "this join runs
every hour on the same keys".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name -> (merge_fn_name, partial_expression), where
    merge_fn is how partials combine: count partials merge with sum;
    sum/min/max merge with themselves.

        salted_aggregate(ev, ["event_type"],
                         {"n": ("sum", F.count(F.lit(1))),
                          "total": ("sum", F.sum("value")),
                          "last": ("max", F.max("ts"))})

    Phase 1 groups by keys+salt (hot key spread over `salt_buckets`
    reducers); phase 2 merges the ≤ salt_buckets partial rows per key —
    trivially small. Result is exactly groupBy(keys).agg(...) for
    decomposable aggregates.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (_, expr) in aggs.items()]
    )
    merge_exprs = []
    for name, (merge_fn, _) in aggs.items():
        merge_exprs.append(getattr(F, merge_fn)(F.col(name)).alias(name))
    return phase1.groupBy(*keys).agg(*merge_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe inner equi-join: the big (skewed) side gets a random salt,
    the small side is replicated once per salt value, and the join key
    becomes (key, salt). A key with 10^9 rows spreads across
    `salt_buckets` reducers instead of one. Cost: small side shuffled
    `salt_buckets` times — use only when the small side is genuinely small
    (else prefer AQE skew join)."""
    big_s = big.withColumn("__salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    small_r = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = big_s.join(small_r, on=[key, "__salt"], how="inner").drop("__salt")
    return out
