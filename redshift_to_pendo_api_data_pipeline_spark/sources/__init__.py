"""Source connectors: parquet test tables, JDBC scans, REST allowlist."""

from redshift_to_pendo_api_data_pipeline_spark.sources.tables import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
