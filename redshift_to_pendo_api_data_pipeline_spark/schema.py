"""Source SQL type <-> Spark ``StructType`` mapping.

Re-expresses the reference's Redshift-type -> JSON-Schema mapping
(``tap-redshift/src/schema.py:10-83``) as a Redshift-type -> Spark-type
mapping, with two deliberate upgrades noted in SURVEY.md §1:

- ``numeric(p,s)`` keeps :class:`DecimalType` precision instead of
  collapsing to float (reference loses it, ``schema.py:65-66``);
- nullability is a ``StructField.nullable`` flag instead of a
  ``["null", T]`` type union (``schema.py:81-82``).

Unsupported types are marked ``inclusion=unsupported`` and excluded from
projection, mirroring ``schema.py:75-80`` + ``resolve.py:24-36``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

# Redshift integer widths -> Spark integral types (schema.py:20-23 encodes
# the same widths as JSON-schema minimum/maximum bounds).
_INT_TYPES = {
    "int2": T.ShortType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "int4": T.IntegerType(),
    "integer": T.IntegerType(),
    "int8": T.LongType(),
    "bigint": T.LongType(),
}

_FLOAT_TYPES = {
    "float": T.DoubleType(),
    "float4": T.FloatType(),
    "real": T.FloatType(),
    "float8": T.DoubleType(),
    "double precision": T.DoubleType(),
}

_STRING_TYPES = {
    "char",
    "character",
    "nchar",
    "bpchar",
    "text",
    "varchar",
    "character varying",
    "nvarchar",
}

_NUMERIC_RE = re.compile(r"^(?:numeric|decimal)\s*(?:\((\d+)\s*,\s*(\d+)\))?$")

#: Marker inclusion levels, mirroring singer metadata breadcrumbs
#: (tap-redshift/src/schema.py:86-158).
INCLUSION_AVAILABLE = "available"
INCLUSION_AUTOMATIC = "automatic"
INCLUSION_UNSUPPORTED = "unsupported"


@dataclass
class ColumnSpec:
    """One column of a discovered stream (catalog entry property)."""

    name: str
    sql_datatype: str
    nullable: bool = True
    is_primary_key: bool = False
    #: information_schema character_maximum_length for char/varchar —
    #: emitted as JSON-schema maxLength (reference README.md:379)
    char_max_length: int | None = None

    @property
    def spark_type(self) -> T.DataType | None:
        return spark_type_for(self.sql_datatype)

    @property
    def inclusion(self) -> str:
        if self.is_primary_key:
            return INCLUSION_AUTOMATIC  # PKs always replicate (schema.py:90-95)
        if self.spark_type is None:
            return INCLUSION_UNSUPPORTED
        return INCLUSION_AVAILABLE

    def to_struct_field(self) -> T.StructField:
        dt = self.spark_type
        if dt is None:
            raise ValueError(f"unsupported sql datatype: {self.sql_datatype!r}")
        return T.StructField(
            self.name,
            dt,
            nullable=self.nullable,
            metadata={
                "sql-datatype": self.sql_datatype,
                "inclusion": self.inclusion,
                "is-primary-key": self.is_primary_key,
            },
        )


def spark_type_for(sql_datatype: str) -> T.DataType | None:
    """Map a Redshift/postgres type name to a Spark type.

    Returns ``None`` for unsupported types (caller excludes the column, as
    the reference does via ``inclusion: unsupported``).
    """
    dt = sql_datatype.strip().lower()
    if dt == "bool" or dt == "boolean":
        return T.BooleanType()
    if dt in _INT_TYPES:
        return _INT_TYPES[dt]
    if dt in _FLOAT_TYPES:
        return _FLOAT_TYPES[dt]
    m = _NUMERIC_RE.match(dt)
    if m:
        p = int(m.group(1)) if m.group(1) else 18
        s = int(m.group(2)) if m.group(2) else 4
        return T.DecimalType(p, s)
    base = dt.split("(")[0].strip()
    if base in _STRING_TYPES:
        return T.StringType()
    if dt.startswith("timestamp"):  # timestamp / timestamptz / with[out] tz
        return T.TimestampType()
    if dt == "date":
        return T.DateType()
    return None


def struct_type_for(columns: list[ColumnSpec]) -> T.StructType:
    """Build the stream schema, excluding unsupported columns."""
    return T.StructType(
        [c.to_struct_field() for c in columns if c.spark_type is not None]
    )


@dataclass
class StreamSpec:
    """Replication policy for one stream — the Spark-side analogue of the
    reference's static STREAMS registry (tap-redshift/src/streams.py:12-50):
    table + replication method + key + field mappings.
    """

    name: str
    primary_key: str
    replication_method: str = "FULL_TABLE"  # or "INCREMENTAL"
    replication_key: str | None = None
    field_mappings: dict[str, str] = field(default_factory=dict)  # src -> dst
    selected_columns: list[str] | None = None  # None = all

    def __post_init__(self) -> None:
        if self.replication_method not in ("FULL_TABLE", "INCREMENTAL"):
            raise ValueError(f"bad replication_method {self.replication_method!r}")
        if self.replication_method == "INCREMENTAL" and not self.replication_key:
            raise ValueError("INCREMENTAL stream requires replication_key")
