"""Unit tests for the type-mapping + catalog layer (no Spark session).

Covers the semantics of tap-redshift/src/schema.py:10-83 and
resolve.py:10-44 as re-expressed in our schema/catalog modules.
"""

from pyspark.sql import types as T

from redshift_to_pendo_api_data_pipeline_spark.catalog import resolve_columns
from redshift_to_pendo_api_data_pipeline_spark.schema import (
    INCLUSION_AUTOMATIC,
    INCLUSION_AVAILABLE,
    INCLUSION_UNSUPPORTED,
    ColumnSpec,
    StreamSpec,
    spark_type_for,
    struct_type_for,
)
import pytest


def test_int_widths():
    assert spark_type_for("int2") == T.ShortType()
    assert spark_type_for("int4") == T.IntegerType()
    assert spark_type_for("int") == T.IntegerType()
    assert spark_type_for("int8") == T.LongType()


def test_floats_and_bool():
    assert spark_type_for("float4") == T.FloatType()
    assert spark_type_for("float8") == T.DoubleType()
    assert spark_type_for("float") == T.DoubleType()
    assert spark_type_for("bool") == T.BooleanType()


def test_numeric_keeps_precision():
    # The reference collapses numeric -> float (schema.py:65-66); we keep
    # DecimalType (SURVEY.md §1 upgrade).
    assert spark_type_for("numeric(12,2)") == T.DecimalType(12, 2)
    assert spark_type_for("numeric") == T.DecimalType(18, 4)
    assert spark_type_for("decimal(38,10)") == T.DecimalType(38, 10)


def test_strings_dates_times():
    for s in ("varchar", "bpchar", "text", "char(36)", "nvarchar(100)", "character varying(10)"):
        assert spark_type_for(s) == T.StringType(), s
    assert spark_type_for("date") == T.DateType()
    assert spark_type_for("timestamp") == T.TimestampType()
    assert spark_type_for("timestamp with time zone") == T.TimestampType()
    assert spark_type_for("timestamptz") == T.TimestampType()


def test_unsupported_excluded():
    assert spark_type_for("super") is None
    assert spark_type_for("geometry") is None
    cols = [
        ColumnSpec("a", "int8"),
        ColumnSpec("geo", "geometry"),
        ColumnSpec("b", "varchar"),
    ]
    st = struct_type_for(cols)
    assert [f.name for f in st.fields] == ["a", "b"]
    assert cols[1].inclusion == INCLUSION_UNSUPPORTED


def test_inclusion_and_nullability():
    pk = ColumnSpec("id", "varchar", nullable=False, is_primary_key=True)
    other = ColumnSpec("x", "int4")
    assert pk.inclusion == INCLUSION_AUTOMATIC
    assert other.inclusion == INCLUSION_AVAILABLE
    f = pk.to_struct_field()
    assert f.nullable is False
    assert f.metadata["sql-datatype"] == "varchar"


def test_resolve_columns_semantics():
    avail = ["id", "a", "b", "c"]
    # selected ∩ available ∪ automatic, in available order
    assert resolve_columns(avail, ["b", "a", "ghost"], ["id"]) == ["id", "a", "b"]
    # None selection = everything
    assert resolve_columns(avail, None, ["id"]) == avail
    # automatic forced in even when not selected
    assert resolve_columns(avail, ["c"], ["id"]) == ["id", "c"]


def test_stream_spec_validation():
    with pytest.raises(ValueError):
        StreamSpec(name="s", primary_key="id", replication_method="INCREMENTAL")
    with pytest.raises(ValueError):
        StreamSpec(name="s", primary_key="id", replication_method="BOGUS")
