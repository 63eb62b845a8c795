"""Catalog discovery + selection resolution.

Reference behavior being re-expressed (SURVEY.md §2.1 S3-S5, §2.2 P2-P3):

- discovery builds one catalog entry per table with per-column JSON schema
  and metadata breadcrumbs (``tap-redshift/src/discover.py:20-97``);
- sync resolves the user's ``selected`` marks against what actually exists,
  force-including primary keys, warning on selected-but-missing columns and
  skipping unsupported ones (``tap-redshift/src/resolve.py:10-109``);
- schema drift is absorbed by re-discovering every run and intersecting
  (``resolve.py:38-42``).

In Spark the "discovery scan" is just ``df.schema`` on a lazy reader — no
INFORMATION_SCHEMA round trips needed for parquet; for JDBC the same three
metadata queries the reference runs can be issued through ``spark.read.jdbc``
on ``information_schema`` relations.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from redshift_to_pendo_api_data_pipeline_spark.schema import StreamSpec

LOGGER = logging.getLogger(__name__)


@dataclass
class CatalogEntry:
    """Discovered stream: name + Spark schema + key metadata.

    Analogue of singer ``CatalogEntry`` (tap-redshift/src/discover.py:89-96)
    with the JSON-schema replaced by the DataFrame's StructType.
    """

    stream: str
    columns: list[str]
    primary_key: str | None = None
    metadata: dict = field(default_factory=dict)


def discover_parquet_catalog(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...]
) -> list[CatalogEntry]:
    """Discovery for file sources: schema comes from the parquet footer
    (zero data read), the moral equivalent of the reference's three
    INFORMATION_SCHEMA queries (discover.py:20-54)."""
    entries = []
    for t in tables:
        schema = spark.read.parquet(f"{sf_dir}/{t}.parquet").schema
        entries.append(CatalogEntry(stream=t, columns=[f.name for f in schema.fields]))
    return entries


def resolve_columns(
    available: list[str],
    selected: list[str] | None,
    automatic: list[str],
) -> list[str]:
    """Selection resolution, the semantics of ``resolve.py:10-44``:

    result = (selected ∩ available) ∪ (automatic ∩ available),
    preserving the available-column order; selected-but-missing columns are
    warned and dropped (schema drift absorption, resolve.py:38-42).
    """
    if selected is None:
        keep = set(available)
    else:
        keep = set(selected) & set(available)
        for missing in sorted(set(selected) - set(available)):
            LOGGER.warning("selected column %s does not exist; skipping", missing)
    keep |= set(automatic) & set(available)
    for auto_missing in sorted(set(automatic) - set(available)):
        LOGGER.warning("automatic column %s does not exist", auto_missing)
    return [c for c in available if c in keep]


def resolve_projection(df: DataFrame, stream: StreamSpec) -> DataFrame:
    """Apply resolved selection as a projection. Catalyst prunes the scan
    to exactly these columns (verify: ReadSchema in .explain)."""
    automatic = [stream.primary_key]
    if stream.replication_key:
        automatic.append(stream.replication_key)
    cols = resolve_columns(df.columns, stream.selected_columns, automatic)
    return df.select(*cols)
