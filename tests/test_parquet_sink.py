"""Versioned parquet sink: ACTIVATE_VERSION swap semantics on a lake."""

from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.sink import parquet_sink as PS
from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table


def test_versioned_swap_and_vacuum(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tbl")
    cust = load_table(spark, sf_dir, "customer")

    # v1: full refresh of 50 rows, activate
    PS.write_versioned(cust.limit(50), path, version=1)
    PS.activate(path, 1)
    assert PS.active_version(path) == 1
    assert PS.read_active(spark, path).count() == 50

    # v2 written but NOT yet active: readers still see v1
    PS.write_versioned(cust.limit(120), path, version=2, mode="append")
    assert PS.read_active(spark, path).count() == 50

    # swap: ACTIVATE_VERSION -> readers see only v2
    PS.activate(path, 2)
    assert PS.read_active(spark, path).count() == 120

    # incremental append into the active version
    PS.append_to_version(cust.limit(140).exceptAll(cust.limit(120)), path, 2)
    assert PS.read_active(spark, path).count() == 140

    # retention: old version dropped, active intact
    assert PS.vacuum(path) == [1]
    assert PS.read_active(spark, path).count() == 140


def test_read_active_prunes_partitions(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tbl")
    cust = load_table(spark, sf_dir, "customer")
    PS.write_versioned(cust, path, version=7)
    PS.activate(path, 7)
    plan = PS.read_active(spark, path)._jdf.queryExecution().executedPlan().toString()
    # the version predicate must prune at the partition level, not filter rows
    assert "PartitionFilters" in plan and "version" in plan
