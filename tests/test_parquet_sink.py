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

    # time travel: any unvacuumed version reads as a complete snapshot
    assert PS.read_version(spark, path, 1).count() == 50
    assert PS.read_version(spark, path, 2).count() == 140

    # retention: old version dropped, active intact
    assert PS.vacuum(path) == [1]
    assert PS.read_active(spark, path).count() == 140
    assert PS.read_version(spark, path, 1).count() == 0  # reclaimed


def test_activate_pointer_flip_is_tmp_plus_rename(spark, tmp_path):
    """r6 advice: the Hadoop-FS pointer write must not be a bare
    create(overwrite) — that is visible at length 0 before close. The
    swap now lands under a temp name and renames over _ACTIVE: after any
    number of re-activations exactly one pointer file exists, no temp
    residue, and the body is complete JSON."""
    import json
    import os

    path = str(tmp_path / "tbl")
    os.makedirs(path)
    for v in (1, 2, 3, 2):
        PS.activate(path, v)
        assert PS.active_version(path) == v
    # no temp residue (Hadoop's local FS adds hidden .crc sidecars)
    visible = [n for n in os.listdir(path) if not n.startswith(".")]
    assert visible == ["_ACTIVE_VERSION"]
    assert not [n for n in os.listdir(path) if ".tmp." in n]
    assert json.loads(open(f"{path}/_ACTIVE_VERSION").read()) == {"version": 2}


def test_active_version_tolerates_partial_pointer(spark, tmp_path):
    """A concurrent reader that catches the pointer mid-swap (empty or
    truncated body on a scheme without atomic rename) retries instead of
    crashing in json.loads; a pointer that NEVER becomes valid raises
    after the retry budget, and a genuinely absent pointer is None
    immediately."""
    import json

    import pytest

    path = str(tmp_path / "tbl")
    (tmp_path / "tbl").mkdir()
    assert PS.active_version(path) is None  # absent: fast None

    ptr = tmp_path / "tbl" / "_ACTIVE_VERSION"
    ptr.write_text("")  # the mid-swap zero-length state
    with pytest.raises(json.JSONDecodeError):
        PS.active_version(path, retries=2)
    ptr.write_text('{"version": 9}')
    assert PS.active_version(path) == 9


def test_read_active_prunes_partitions(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tbl")
    cust = load_table(spark, sf_dir, "customer")
    PS.write_versioned(cust, path, version=7)
    PS.activate(path, 7)
    plan = PS.read_active(spark, path)._jdf.queryExecution().executedPlan().toString()
    # the version predicate must prune at the partition level, not filter rows
    assert "PartitionFilters" in plan and "version" in plan


def test_version_diff_classifies_insert_update_delete(spark, sf_dir, tmp_path):
    path = str(tmp_path / "tbl")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal")
    v1 = cust.limit(100)
    # v2: drop 10, change 5 balances, add 3 new keys
    v2 = (
        v1.where(F.col("c_custkey") > 10)
        .withColumn("c_acctbal",
                    F.when(F.col("c_custkey") <= 15,
                           F.col("c_acctbal") + 1).otherwise(F.col("c_acctbal")))
        .unionByName(v1.limit(3).select(
            (F.col("c_custkey") + 900000).alias("c_custkey"),
            "c_name", "c_acctbal"))
    )
    PS.write_versioned(v1, path, 1)
    PS.write_versioned(v2, path, 2, mode="append")
    diff = PS.version_diff(spark, path, "c_custkey", 1, 2)
    by_op = {op: n for op, n in
             diff.groupBy("op").count().collect()}
    n_dropped = v1.where(F.col("c_custkey") <= 10).count()
    n_upd = v1.where((F.col("c_custkey") > 10) & (F.col("c_custkey") <= 15)).count()
    assert by_op == {"DELETE": n_dropped, "UPDATE": n_upd, "INSERT": 3}
    # unchanged rows never appear
    assert diff.count() == n_dropped + n_upd + 3
    # updates carry the NEW values
    upd = diff.where("op = 'UPDATE'").first()
    orig = v1.where(F.col("c_custkey") == upd["c_custkey"]).first()
    assert float(upd["c_acctbal"]) == float(orig["c_acctbal"]) + 1


def test_compact_active_version_preserves_rows_atomically(spark, sf_dir, tmp_path):
    """Append-heavy table -> one compacted file under a NEW version,
    atomically activated; rows identical, old version intact until
    vacuum."""
    import glob

    path = str(tmp_path / "tbl")
    cust = load_table(spark, sf_dir, "customer").limit(120)
    PS.write_versioned(cust.limit(40), path, 1)
    PS.activate(path, 1)
    # many small appends into the active version (the streaming shape)
    for lo, hi in ((40, 80), (80, 120)):
        PS.append_to_version(
            cust.limit(hi).exceptAll(cust.limit(lo)), path, 1)
    before = sorted(map(tuple, PS.read_active(spark, path).collect()))
    n_files_before = len(glob.glob(f"{path}/version=1/*.parquet"))
    assert n_files_before > 1

    new_v = PS.compact_active_version(spark, path, target_files=1)
    assert new_v == 2 and PS.active_version(path) == 2
    after = sorted(map(tuple, PS.read_active(spark, path).collect()))
    assert after == before
    assert len(glob.glob(f"{path}/version=2/*.parquet")) == 1
    # old layout intact for readers mid-swap, reclaimed by vacuum
    assert len(glob.glob(f"{path}/version=1/*.parquet")) == n_files_before
    assert PS.vacuum(path) == [1]


def test_version_diff_prunes_both_sides_to_one_partition(spark, sf_dir, tmp_path):
    """The CDC join must read ONE version directory per side —
    PartitionFilters on `version`, not a full-table scan + row filter."""
    path = str(tmp_path / "tbl")
    cust = load_table(spark, sf_dir, "customer").limit(50)
    PS.write_versioned(cust, path, 1)
    PS.write_versioned(cust.limit(30), path, 2, mode="append")
    plan = PS.version_diff(spark, path, "c_custkey", 1, 2) \
        ._jdf.queryExecution().executedPlan().toString()
    import re
    filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert len([f for f in filters if "version" in f]) >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cli_compact_and_diff_end_to_end(spark, sf_dir, tmp_path):
    """The lake-ops subcommands: build a versioned table with small-file
    appends, `compact` it (JSON report: files collapsed, rows preserved,
    old version vacuumed), then `diff` two versions (per-op counts +
    delta parquet)."""
    import json as _json
    import subprocess
    import sys

    path = str(tmp_path / "tbl")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal").limit(100)
    PS.write_versioned(cust, path, 1)
    PS.activate(path, 1)
    PS.append_to_version(
        load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey").limit(130)
        .exceptAll(cust), path, 1)

    def run(cmd, cfg):
        p = tmp_path / f"{cmd}.json"
        p.write_text(_json.dumps(cfg))
        proc = subprocess.run(
            [sys.executable, "-m", "redshift_to_pendo_api_data_pipeline_spark.cli",
             cmd, "-c", str(p)],
            capture_output=True, text=True, timeout=600, cwd="/root/repo",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return _json.loads(proc.stdout.strip().splitlines()[-1])

    rep = run("compact", {"path": path, "target_files": 1, "vacuum": True})
    assert rep["old_version"] == 1 and rep["new_version"] == 2
    assert rep["files_after"] == 1 <= rep["files_before"]
    assert rep["n_rows"] == 130 and rep["vacuumed_versions"] == [1]

    # build a v3 with edits, then diff 2 -> 3 through the CLI
    v2 = PS.read_active(spark, path)
    v3 = v2.where(F.col("c_custkey") % 9 != 0)
    PS.write_versioned(v3, path, 3, mode="append")
    rep2 = run("diff", {"path": path, "key": "c_custkey",
                        "v_old": 2, "v_new": 3,
                        "output": str(tmp_path / "delta")})
    n_del = v2.where(F.col("c_custkey") % 9 == 0).count()
    assert rep2 == {"path": path, "v_old": 2, "v_new": 3,
                    "inserts": 0, "updates": 0, "deletes": n_del,
                    "output": str(tmp_path / "delta")}
    delta = spark.read.parquet(str(tmp_path / "delta"))
    assert delta.where("op = 'DELETE'").count() == n_del


def test_migrate_layout_prunes_on_new_partition_column(spark, sf_dir, tmp_path):
    """Layout evolution is a table-level cutover (Spark refuses mixed
    partition layouts under one root): the active snapshot lands at a
    new root partitioned by the query column, rows identical, and a
    filter on that column prunes at the DIRECTORY level in the plan."""
    import re

    old = str(tmp_path / "flat")
    new = str(tmp_path / "by_segment")
    cust = load_table(spark, sf_dir, "customer")
    PS.write_versioned(cust, old, 1)
    PS.activate(old, 1)

    assert PS.migrate_layout(spark, old, new, ["c_mktsegment"]) == 1
    before = sorted(map(tuple, PS.read_active(spark, old).collect()))
    after = sorted(map(tuple, PS.read_active(spark, new)
                       .select(*PS.read_active(spark, old).columns).collect()))
    assert after == before

    plan = (PS.read_active(spark, new)
            .where(F.col("c_mktsegment") == "BUILDING")
            ._jdf.queryExecution().executedPlan().toString())
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "c_mktsegment" in m.group(1)
    # old root untouched and still active there
    assert PS.active_version(old) == 1
