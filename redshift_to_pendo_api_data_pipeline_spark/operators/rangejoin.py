"""Range (interval) joins, banded for scale.

The reference engine has no interval operator — its one "range" predicate
is the incremental bookmark filter (tap-redshift/src/sync.py:145-146).
These operators add the general shape a training-data pipeline needs:
match fact rows whose scalar (price, timestamp) falls inside an interval
table's [lo, hi] ranges, optionally per key.

Naive theta-join (`fact JOIN ranges ON v BETWEEN lo AND hi`) is a
broadcast nested loop when `ranges` is tiny — the right plan, and
``interval_join_theta`` gives exactly that. But at 100 TB with a large
interval table the nested loop is quadratic; the scale path is
``interval_join_banded``:

1. explode each range into the fixed-width bins it covers
   (``sequence(floor(lo/w), floor(hi/w))``) — output rows ≈
   ``n_ranges × avg_span/w``, tunable via ``bin_width``;
2. bin the fact value the same way (one row each, no explosion);
3. hash equi-join on ``(keys…, bin)`` — shuffled on a high-cardinality
   composite, no nested loop anywhere;
4. exact ``BETWEEN`` filter on the survivors.

Each fact row lands in exactly one bin, and a range lists any bin at most
once, so no post-join dedup is needed — (fact, range) matches are already
unique. Equivalent to the theta join for any bin_width; bin_width only
trades explosion factor against candidate-filter selectivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def interval_join_theta(
    fact: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Reference-semantics theta join (v BETWEEN lo AND hi, plus key
    equality). Correct at any size; only efficient when one side is small
    enough to broadcast (Catalyst picks BroadcastNestedLoopJoin)."""
    cond = (fact[value_col] >= ranges[lo_col]) & (fact[value_col] <= ranges[hi_col])
    for k in keys or []:
        cond = cond & (fact[k] == ranges[k])
    out = fact.join(F.broadcast(ranges), cond, "inner")
    if keys:
        out = out.drop(*[ranges[k] for k in keys])
    return out


def _bin(col: Column, width: float | int, is_time: bool) -> Column:
    if is_time:
        # exact integer floor-div: (v - v mod w) / w — every intermediate
        # is an exactly-representable double (micros < 2^53), so bins are
        # bit-deterministic; a float `floor(v/w)` can misplace a value
        # sitting one ulp from a bin edge and silently drop a true match
        v = F.unix_micros(col)
        return ((v - F.pmod(v, F.lit(width))) / F.lit(width)).cast("long")
    return F.floor(col / F.lit(width)).cast("long")


def interval_join_banded(
    fact: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float | int,
    keys: list[str] | None = None,
    time_valued: bool = False,
) -> DataFrame:
    """Scale-path interval join (see module docstring). ``bin_width`` is
    in value units, or MICROSECONDS when ``time_valued`` (timestamps are
    binned on ``unix_micros``). Result columns: all of ``fact``'s, then
    ``ranges``'s non-key columns."""
    keys = keys or []
    exploded = ranges.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _bin(F.col(lo_col), bin_width, time_valued),
                _bin(F.col(hi_col), bin_width, time_valued),
            )
        ),
    )
    binned = fact.withColumn("__bin", _bin(F.col(value_col), bin_width, time_valued))
    out = binned.join(exploded, on=[*keys, "__bin"], how="inner").where(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col))
    )
    return out.drop("__bin")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    lo_a: str,
    hi_a: str,
    lo_b: str,
    hi_b: str,
    bin_width: float | int,
    keys: list[str] | None = None,
    time_valued: bool = False,
) -> DataFrame:
    """Interval x interval OVERLAP join ([lo_a,hi_a] ∩ [lo_b,hi_b] ≠ ∅,
    plus key equality) — the two-sided sibling of the point-in-interval
    join above, and the primitive behind concurrency analysis (sessions
    overlapping incidents, shipments sharing transit windows).

    Scale shape: BOTH sides explode into covered fixed-width bins and
    hash-equi-join on (keys…, bin) — never a theta/nested-loop join. A
    pair overlapping k shared bins would surface k times; instead of a
    wide-row distinct, the join keeps only the FIRST shared bin
    (bin == max(bin(lo_a), bin(lo_b)) — both sides cover it iff they
    overlap at all, and only one bin satisfies the equality), so matches
    are exact and unique with zero post-join dedup shuffle.

    Column names must be disjoint across `a` and `b` except for `keys`
    (pre-alias for self-joins). bin_width is in value units, or
    MICROSECONDS when time_valued."""
    keys = keys or []
    ba = a.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _bin(F.col(lo_a), bin_width, time_valued),
                _bin(F.col(hi_a), bin_width, time_valued),
            )
        ),
    )
    bb = b.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _bin(F.col(lo_b), bin_width, time_valued),
                _bin(F.col(hi_b), bin_width, time_valued),
            )
        ),
    )
    out = ba.join(bb, on=[*keys, "__bin"], how="inner").where(
        (F.col(lo_a) <= F.col(hi_b))
        & (F.col(lo_b) <= F.col(hi_a))
        & (
            F.col("__bin")
            == F.greatest(
                _bin(F.col(lo_a), bin_width, time_valued),
                _bin(F.col(lo_b), bin_width, time_valued),
            )
        )
    )
    return out.drop("__bin")
