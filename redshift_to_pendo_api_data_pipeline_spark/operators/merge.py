"""CDC apply (MERGE semantics) and SCD2 history — relational, ACID-free.

The reference's sink contract is upsert-only against a remote API
(target-pendo README.md:121-122, 142); its lake story stops at the
versioned full-refresh swap (ACTIVATE_VERSION). These operators add the
keyed incremental forms a lake pipeline needs, expressed as plain
DataFrame algebra so they run on bare parquet (the versioned-pointer
sink provides the atomicity; no Delta/Iceberg dependency):

- ``apply_cdc``: base ⟵ changelog of I/U/D actions, latest action per
  key wins. One shuffle per side on the key; with both sides bucketed by
  the key (operators/skew.write_bucketed) the join is Exchange-free.
- ``scd2_history``: a change stream becomes type-2 validity intervals
  (valid_from/valid_to, NULL = current) via one lead() window per key —
  no self-join, no range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: changelog operation codes
OP_INSERT, OP_UPDATE, OP_DELETE = "I", "U", "D"


def latest_change_per_key(
    changes: DataFrame, key: str, seq_col: str, op_col: str = "op"
) -> DataFrame:
    """Collapse a changelog to its final action per key (row_number over
    the sequence column, descending; ties broken by op so replays are
    deterministic)."""
    w = Window.partitionBy(key).orderBy(
        F.desc(seq_col), F.desc(op_col)
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """MERGE: apply a changelog to a keyed base relation.

    Semantics (latest action per key wins):
      - D: row disappears,
      - I/U: the change row's payload replaces (or inserts) the base row.

    Columns = base's columns; the changelog must carry the same payload
    columns plus ``op`` and the sequence. Implementation is two
    broadcast-or-shuffle joins on the key — an anti-join removing keys
    the changelog touches, union'd with the changelog's surviving
    payloads. Both passes share one shuffle of each side under AQE; no
    full-table rewrite logic lives here (the versioned parquet sink's
    pointer swap makes the publish atomic)."""
    payload_cols = base.columns
    last = latest_change_per_key(changes, key, seq_col, op_col)
    untouched = base.join(last.select(key), on=key, how="left_anti")
    upserts = last.where(F.col(op_col) != OP_DELETE).select(*payload_cols)
    return untouched.unionByName(upserts)


def scd2_history(
    changes: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change stream: one
    row per (key, change) with ``valid_from_us`` / ``valid_to_us`` epoch-
    micro bounds; the current row has ``valid_to_us`` NULL. Exactly one
    lead() window per key — shuffle once, no self-join."""
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    return changes.select(
        key,
        *attr_cols,
        F.unix_micros(F.col(ts_col)).alias("valid_from_us"),
        F.unix_micros(F.lead(ts_col).over(w)).alias("valid_to_us"),
    )
