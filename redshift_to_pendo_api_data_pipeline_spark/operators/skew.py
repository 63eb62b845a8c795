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


def join_size_profile(
    left: DataFrame, left_key: str, right: DataFrame, right_key: str,
) -> DataFrame:
    """EXACT join-cardinality profile BEFORE paying for the join — the
    planning diagnostic that decides salting/bucketing at 100 TB: for an
    equi-join on k, output rows are sum_k f_left(k)*f_right(k), a number
    two cheap per-key count aggregations fully determine. A key whose
    single product dominates the sum is the skew key AQE's runtime stats
    would only discover mid-shuffle; this sees it for the cost of two
    linear passes plus a key-cardinality join.

    One summary row: row counts, key cardinalities, shared keys, the
    exact join output size, the largest single-key contribution and its
    key (min key on ties — deterministic), and the skew share in ppm
    (max contribution / join rows; 1e6 = the whole join is one key).

    Shape: two groupBys (map-side combined), one key-dictionary inner
    join (shuffle_hash — dictionaries are key-cardinality, unbounded at
    scale, never broadcast), and a scalar aggregate. The candidate join
    itself is never executed."""
    fa = left.groupBy(F.col(left_key).alias("__k")).agg(
        F.count(F.lit(1)).cast("long").alias("__fa")
    )
    fb = right.groupBy(F.col(right_key).alias("__k")).agg(
        F.count(F.lit(1)).cast("long").alias("__fb")
    )
    shared = fa.join(fb.hint("shuffle_hash"), "__k").select(
        "__k", (F.col("__fa") * F.col("__fb")).alias("__prod")
    )
    tot_a = left.agg(F.count(F.lit(1)).cast("long").alias("n_left_rows"))
    tot_b = right.agg(F.count(F.lit(1)).cast("long").alias("n_right_rows"))
    keys_a = fa.agg(F.count(F.lit(1)).cast("long").alias("n_left_keys"))
    keys_b = fb.agg(F.count(F.lit(1)).cast("long").alias("n_right_keys"))
    top = shared.orderBy(F.desc("__prod"), F.asc("__k")).limit(1).select(
        F.col("__k").cast("string").alias("top_key"),
        F.col("__prod").alias("max_key_rows"),
    )
    sums = shared.agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_keys"),
        F.coalesce(F.sum("__prod"), F.lit(0)).cast("long")
        .alias("join_rows"),
    )
    # five bounded scalars -> one row (1x1 cross joins, the audit shape)
    return (
        tot_a.crossJoin(tot_b).crossJoin(keys_a).crossJoin(keys_b)
        .crossJoin(sums).join(top, F.lit(True), "left")
        .select(
            "n_left_rows", "n_right_rows", "n_left_keys", "n_right_keys",
            "n_shared_keys", "join_rows",
            F.coalesce("max_key_rows", F.lit(0)).cast("long")
            .alias("max_key_rows"),
            "top_key",
            F.when(F.col("join_rows") == 0, F.lit(0))
            .otherwise(
                F.expr("coalesce(max_key_rows, 0L) * 1000000L div join_rows")
            )
            .cast("long").alias("skew_ppm"),
        )
    )

def bloom_semijoin(
    fact: DataFrame,
    key_col: str,
    keys: DataFrame,
    keys_col: str | None = None,
    m: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Runtime-filter (Bloom) semi-join: reduce a corpus-sized fact
    relation MAP-SIDE by a key set that is itself too large to
    broadcast raw, then finish with the exact semi-join on the
    survivors — the manual form of the runtime filters engines inject
    for selective joins, and the join-side twin of
    ``dedup.bloom_gram_positions``.

    extract.semijoin_ids covers the broadcastable case. When the key
    side is ~10^9 ids, a plain left_semi shuffles the FULL fact on the
    key. Here the fact is never shuffled at full width:

      1. the key relation collapses to an m-bit Bloom bitmap built
         relationally — distinct (pos div 64) words with bit_or'd
         bits, <= m/64 rows (16k longs = 128 KB at the defaults)
         REGARDLESS of key count — then densified to ONE
         array<long> row through a bounded driver sidecar (the IVF-
         centroids contract; the dense array makes each probe an O(1)
         element_at where a map value scans linearly);
      2. the bitmap row broadcast-joins the fact (scalar
         BroadcastNestedLoopJoin — the repo's accepted 1-row join
         shape) and a pure column predicate keeps a row iff all k
         seeded positions have their bit set (Bloom mightContain,
         zero Python, zero shuffle);
      3. survivors — true matches plus ~(1 - e^{-kn/m})^k false
         positives — do the exact finish as an INNER join against the
         distinct key relation (row-identical to a left_semi, but
         immune to PushDownLeftSemiAntiJoin, which was observed
         hoisting the Bloom filter ABOVE a left_semi and shuffling
         the FULL fact), width-pinned, so the one real shuffle
         carries the reduced fact only.

    No false negatives, exact output (the oracle is a plain
    semi-join); returns the filtered fact with its original columns."""
    key_rel = keys.select(
        F.col(keys_col or key_col).cast("long").alias("__k")
    ).where(F.col("__k").isNotNull()).distinct()
    seeds = list(range(k))
    positions = (
        key_rel.select(
            F.explode(F.array(*[F.lit(i) for i in seeds])).alias("seed"),
            "__k",
        )
        .select(F.pmod(F.xxhash64("__k", "seed"), F.lit(m)).alias("pos"))
        .distinct()
    )
    # ceil division: positions run 0..m-1, so the highest word index is
    # (m-1) div 64 — floor division would drop the final partial word
    # when m % 64 != 0, silently losing set bits (Bloom FALSE NEGATIVES,
    # violating the exactness contract) and probing element_at past the
    # array end for positions in that word.
    n_words = (m + 63) // 64
    words = positions.groupBy(
        F.expr("pos div 64").alias("word")
    ).agg(
        F.expr("bit_or(shiftleft(1L, CAST(pos % 64 AS INT)))")
        .alias("bits")
    )
    # DENSE array<long> bitmap via a bounded driver sidecar (the IVF-
    # centroids contract: <= m/64 rows = 128 KB at the defaults,
    # REGARDLESS of key count). Two rejected alternatives, measured:
    # probing a broadcast MAP value per row is a LINEAR scan per
    # element_at (4 probes/row x 16k entries x 600k rows ~= 4e10
    # comparisons, 9.3 s); densifying relationally with
    # try_element_at-per-index runs interpreted (14.6 s for 16k
    # lookups). The driver fill is microseconds and the dense array
    # probes O(1) per lookup.
    sparse = {int(r["word"]): int(r["bits"]) for r in words.collect()}
    dense = [sparse.get(w, 0) for w in range(int(n_words))]
    from redshift_to_pendo_api_data_pipeline_spark.operators.routing import (
        local_df,
    )

    bitmap = local_df(
        fact.sparkSession, [(dense,)], "__bloom array<bigint>"
    )
    probed = fact.join(F.broadcast(bitmap))
    pred = F.lit(True)
    for i in seeds:
        pos_sql = f"pmod(xxhash64(CAST({key_col} AS BIGINT), {i}), {m})"
        hit = F.expr(
            f"element_at(__bloom, CAST({pos_sql} div 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST({pos_sql} % 64 AS INT)) != 0"
        )
        pred = pred & hit
    survivors = probed.where(pred).drop("__bloom")
    # exact finish as an INNER join against the DISTINCT key relation —
    # row-identical to a left_semi (the build side is distinct by
    # construction) but immune to PushDownLeftSemiAntiJoin, which was
    # observed hoisting the Bloom BNLJ ABOVE a left_semi and thereby
    # shuffling the FULL fact before the bitmap ever filtered a row
    # (the executed plan is pinned by test). The pinned repartition on
    # the precomputed key IS the join's one real shuffle, at full
    # width (AQE byte-based coalesce would serialize it).
    par = fact.sparkSession.sparkContext.defaultParallelism
    return (
        survivors.withColumn("__fk", F.col(key_col).cast("long"))
        .repartition(par, "__fk")
        .join(
            key_rel.hint("shuffle_hash"),
            F.col("__fk") == F.col("__k"),
            "inner",
        )
        .drop("__fk", "__k")
    )
