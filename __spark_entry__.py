"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship sync plan on sf0.001;
``queries()`` exposes one callable per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each.

Cross-engine comparability rules used throughout:
- timestamps surface as epoch microseconds (Spark ``unix_micros`` /
  DuckDB ``epoch_us``) so value hashing never sees engine formatting;
- money aggregates are summed as DECIMAL (exact, associative) instead of
  DOUBLE so partial-aggregation order can't change the result;
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from redshift_to_pendo_api_data_pipeline_spark.operators import extract as X
from redshift_to_pendo_api_data_pipeline_spark.functions import transforms as TR
from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table

SF_SMOKE = "/root/testdata/sf0.001"

# Deterministic "remote allowlist" stand-in (FIXTURES.md): the Pendo
# fetch_uuids result is simulated as the users whose id % 3 == 0 — derivable
# identically in Spark and in the DuckDB oracle.
_BOOKMARK = "2024-01-15 00:00:00"


def _allowlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.col("user_id"))
        .where(F.col("user_id") % 3 == 0)
        .distinct()
        .select(F.col("user_id").alias("id"))
    )


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q_sync_incremental_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's sync_table (tap-redshift/src/sync.py:83-206)
    as one plan — incremental bookmark filter (P4) + broadcast left-semi
    allowlist reduction (J3/P5) + projection & rename (P1/F9)."""
    ev = load_table(spark, sf_dir, "events")
    out = X.incremental_filter(ev, "ts", F.to_timestamp(F.lit(_BOOKMARK)))
    out = X.semi_join_allowlist(out, "user_id", _allowlist(spark, sf_dir))
    return out.select(
        F.col("event_id").alias("eventId"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("user_id").alias("visitorId"),
        F.col("event_type").alias("eventType"),
        F.col("value").alias("value"),
    )


def q_full_table_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL_TABLE scan with selection resolution (P1/P2): user selected
    {c_name, c_acctbal}, PK c_custkey force-included (resolve.py:10-44)."""
    from redshift_to_pendo_api_data_pipeline_spark.catalog import resolve_projection
    from redshift_to_pendo_api_data_pipeline_spark.schema import StreamSpec

    cust = load_table(spark, sf_dir, "customer")
    stream = StreamSpec(
        name="customer", primary_key="c_custkey",
        selected_columns=["c_name", "c_acctbal"],
    )
    return resolve_projection(cust, stream)


def q_ordered_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2: ORDER BY + LIMIT == distributed top-k
    (TakeOrderedAndProject). Unique tiebreak key keeps the row set
    deterministic at the limit boundary."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(100)
        .select(
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate")).alias("odate_us"),
            "o_totalprice",
            "o_orderpriority",
        )
    )


def q_volume_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: pre-sync COUNT(*) for the VOLUME message (sync.py:153-159)."""
    return X.volume_count(load_table(spark, sf_dir, "events"))


def q_bookmark_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: bookmark as max(replication_key) — replaces the reference's
    ORDER-BY-last-row-wins (sync.py:188-194)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(F.max(F.unix_micros("ts")).alias("bookmark_us"))


def q_uuid_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6+P7: UUID shape (len==36) and regex validation (sync.py:42,51-53)
    over UUIDs derived deterministically from customer names via md5."""
    cust = load_table(spark, sf_dir, "customer")
    uuid = F.concat_ws(
        "-",
        F.substring(F.md5("c_name"), 1, 8),
        F.substring(F.md5("c_name"), 9, 4),
        F.substring(F.md5("c_name"), 13, 4),
        F.substring(F.md5("c_name"), 17, 4),
        F.substring(F.md5("c_name"), 21, 12),
    )
    df = cust.select(F.col("c_custkey"), uuid.alias("uuid"))
    return df.where(X.uuid_shape_filter(F.col("uuid"))).where(
        X.uuid_valid_filter(F.col("uuid"))
    )


def q_payload_reshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9+F10+F6: remap per field_mappings, reshape to {id, values:{...}},
    serialize the values struct as one JSON document per row
    (target-pendo/src/__init__.py:531-557)."""
    cust = load_table(spark, sf_dir, "customer")
    remapped = TR.remap_fields(
        cust.select("c_custkey", "c_name", "c_mktsegment"),
        {"c_custkey": "accountId", "c_name": "name", "c_mktsegment": "segment"},
    )
    shaped = TR.reshape_payload(remapped, "accountId", "id")
    return shaped.select("id", F.to_json("values").alias("values_json"))


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline aggregation (TPC-H Q1 shape): grouped partial-aggregated
    sums over the fact table. DECIMAL sums keep the result exact and
    order-independent across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.where(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).alias("sum_qty"),
            F.sum(dec("l_extendedprice")).alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
                .cast("decimal(18,4)")
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "sync_incremental_semijoin": q_sync_incremental_semijoin,
        "full_table_projection": q_full_table_projection,
        "ordered_limit_topk": q_ordered_limit_topk,
        "volume_count": q_volume_count,
        "bookmark_max": q_bookmark_max,
        "uuid_validation": q_uuid_validation,
        "payload_reshape": q_payload_reshape,
        "q1_pricing_summary": q1_pricing_summary,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "sync_incremental_semijoin": f"""
            SELECT event_id AS eventId,
                   epoch_us(ts) AS ts_us,
                   user_id AS visitorId,
                   event_type AS eventType,
                   value AS value
            FROM events
            WHERE ts > TIMESTAMP '{_BOOKMARK}'
              AND user_id IN (SELECT DISTINCT user_id FROM events WHERE user_id % 3 = 0)
        """,
        "full_table_projection": """
            SELECT c_custkey, c_name, c_acctbal FROM customer
        """,
        "ordered_limit_topk": """
            SELECT o_orderkey, epoch_us(o_orderdate) AS odate_us,
                   o_totalprice, o_orderpriority
            FROM orders
            ORDER BY o_orderdate DESC, o_orderkey DESC
            LIMIT 100
        """,
        "volume_count": "SELECT count(*) AS record_count FROM events",
        "bookmark_max": "SELECT max(epoch_us(ts)) AS bookmark_us FROM events",
        "uuid_validation": """
            WITH u AS (
              SELECT c_custkey,
                     concat_ws('-', substr(md5(c_name),1,8), substr(md5(c_name),9,4),
                               substr(md5(c_name),13,4), substr(md5(c_name),17,4),
                               substr(md5(c_name),21,12)) AS uuid
              FROM customer)
            SELECT c_custkey, uuid FROM u
            WHERE length(uuid) = 36
              AND regexp_matches(uuid, '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$')
        """,
        "payload_reshape": """
            SELECT c_custkey AS id,
                   concat('{"name":"', c_name, '","segment":"', c_mktsegment, '"}')
                       AS values_json
            FROM customer
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(cast(l_quantity as decimal(18,2))) AS sum_qty,
                   sum(cast(l_extendedprice as decimal(18,2))) AS sum_base_price,
                   sum(cast(cast(l_extendedprice as decimal(18,2))
                        * (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))
                        as decimal(18,4))) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001; driver checks rows>0 and stable schema."""
    return q_sync_incremental_semijoin(spark, SF_SMOKE)
