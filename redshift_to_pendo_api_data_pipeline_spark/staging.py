"""Lake staging for signature/candidate/index relations.

Dedup and ANN pipelines follow the stage-once / probe-many shape: a
signature (MinHash, SimHash), candidate-id set, or IVF index is
materialized to parquet once per corpus version, and every downstream
probe — banding joins, verifies, clustering rounds, ANN re-ranks — scans
the staged copy instead of recomputing. At 100 TB the staged relation is
the product of the expensive pass; rerunning it per query would dominate
every job.

Two environment knobs (both read at call time, default off):

- ``SPARK_GRAFT_STAGE_ROOT`` — overrides the staging root directory
  (default ``/tmp/spark_graft_stage``); lets the bench stage into a
  run-unique directory so cold-stage cost is measured against a cold
  filesystem, and concurrent runs never clobber each other.
- ``SPARK_GRAFT_STAGE_REUSE=1`` — skip the write when the staged parquet
  already exists (``_SUCCESS`` marker present). Off by default: the
  correctness gate must always re-stage with the code under test, but a
  bench probe pass or a production stage-once/probe-many serving job
  reuses the artifact, which is the entire point of staging.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

DEFAULT_ROOT = "/tmp/spark_graft_stage"


def stage_root() -> str:
    return os.environ.get("SPARK_GRAFT_STAGE_ROOT", DEFAULT_ROOT)


def stage_dir(sf_dir: str) -> str:
    """Staging area keyed by the scale-factor directory basename, so
    concurrent runs at different SFs never clobber each other."""
    return f"{stage_root()}/{os.path.basename(os.path.normpath(sf_dir))}"


def _hadoop_fs(spark, path: str):
    """Resolve ``path`` through Spark's Hadoop FileSystem so existence
    checks and marker writes work on any configured scheme (file://,
    hdfs://, s3a://) — driver-local ``os.path`` silently breaks the
    moment the staging root points at a lake."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def fs_exists(spark, path: str) -> bool:
    fs, hpath = _hadoop_fs(spark, path)
    return bool(fs.exists(hpath))


def fs_touch(spark, path: str, content: str = "committed\n") -> None:
    """Create-or-overwrite a small marker file through the Hadoop FS —
    the lake-safe replacement for ``open(path, "w")``."""
    fs, hpath = _hadoop_fs(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def fs_read_text(spark, path: str) -> str:
    """Read a small marker/pointer file through the Hadoop FS."""
    fs, hpath = _hadoop_fs(spark, path)
    stream = fs.open(hpath)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def fs_delete(spark, path: str) -> bool:
    """Recursive delete through the Hadoop FS; True if anything was
    removed."""
    fs, hpath = _hadoop_fs(spark, path)
    if not fs.exists(hpath):
        return False
    return bool(fs.delete(hpath, True))


def stage_parquet(df: DataFrame, path: str, partition_by: str | None = None) -> bool:
    """Write ``df`` to ``path`` as the staged artifact. Returns True if a
    write happened, False when ``SPARK_GRAFT_STAGE_REUSE=1`` and a
    complete staged copy (``_SUCCESS``) is already present."""
    if (
        os.environ.get("SPARK_GRAFT_STAGE_REUSE") == "1"
        and fs_exists(df.sparkSession, f"{path}/_SUCCESS")
    ):
        return False
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(path)
    return True
