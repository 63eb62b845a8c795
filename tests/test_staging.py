"""staging.fs_exists / fs_touch: marker I/O through the Hadoop
FileSystem API, so existence checks and marker writes resolve whatever
scheme backs the path (file://, hdfs://, s3a://) instead of silently
requiring the driver's local disk (VERDICT r5 item 2)."""

from __future__ import annotations

import os

from redshift_to_pendo_api_data_pipeline_spark.staging import (
    fs_exists,
    fs_touch,
    stage_parquet,
)


def test_fs_touch_then_exists(spark, tmp_path):
    p = str(tmp_path / "marker")
    assert fs_exists(spark, p) is False
    fs_touch(spark, p, "committed\n")
    assert fs_exists(spark, p) is True
    # the marker is a real file with the content we wrote
    with open(p) as fh:
        assert fh.read() == "committed\n"


def test_fs_touch_explicit_scheme(spark, tmp_path):
    """An explicit file:// URI goes through the same Hadoop resolution a
    lake scheme would — os.path would choke on the scheme prefix."""
    p = f"file://{tmp_path}/marker2"
    fs_touch(spark, p)
    assert fs_exists(spark, p) is True
    assert not fs_exists(spark, f"file://{tmp_path}/absent")


def test_stage_reuse_check_goes_through_hadoop_fs(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_STAGE_REUSE short-circuits on a _SUCCESS written under
    an explicit file:// scheme — proof the reuse probe is not os.path."""
    path = f"file://{tmp_path}/staged"
    df = spark.range(10)
    assert stage_parquet(df, path) is True
    monkeypatch.setenv("SPARK_GRAFT_STAGE_REUSE", "1")
    assert stage_parquet(df, path) is False
    # and a cold path still writes
    assert stage_parquet(df, f"file://{tmp_path}/staged2") is True
