"""CLI `sql` command (cli.cmd_sql): ad-hoc SELECT over configured
parquet tables as JSON lines, with a truncation marker and a
SELECT-only guard."""

from __future__ import annotations

import json

from redshift_to_pendo_api_data_pipeline_spark.cli import cmd_sql

SF = "/root/testdata/sf0.001"


def test_cli_sql_select(spark, capsys):
    rc = cmd_sql({
        "tables": {"region": f"{SF}/region.parquet"},
        "sql": "SELECT r_name, r_regionkey FROM region ORDER BY r_regionkey",
    })
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 5
    assert lines[0]["r_regionkey"] == 0 and "r_name" in lines[0]


def test_cli_sql_truncates_with_marker(spark, capsys):
    rc = cmd_sql({
        "tables": {"orders": f"{SF}/orders.parquet"},
        "sql": "SELECT o_orderkey FROM orders",
        "max_rows": 3,
    })
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 4 and lines[-1] == {"truncated": True, "max_rows": 3}


def test_cli_sql_rejects_mutation(spark, capsys):
    rc = cmd_sql({
        "tables": {"region": f"{SF}/region.parquet"},
        "sql": "DROP TABLE region",
    })
    assert rc == 2
    out = json.loads(capsys.readouterr().out.strip())
    assert out["error"] == "only SELECT/WITH statements"


def test_cli_sql_typo_reports_parse_error_not_policy(spark, capsys):
    # a syntactically invalid SELECT is a PARSE error — it must not be
    # mislabelled as a read-only-policy rejection
    rc = cmd_sql({
        "tables": {"region": f"{SF}/region.parquet"},
        "sql": "SELECT r_name FROMM region",
    })
    assert rc == 2
    out = json.loads(capsys.readouterr().out.strip())
    assert out["error"] == "parse error"
    assert "detail" in out


def test_cli_sql_internal_error_not_labeled_parse_error(spark):
    # a JVM/bridge failure AFTER a successful parse (here: the plan
    # walk blowing up) must propagate, not masquerade as the user's
    # SQL typo
    import pytest

    from redshift_to_pendo_api_data_pipeline_spark import cli

    class _Boom:
        def _fail(self, *a, **k):
            raise RuntimeError("bridge down")

        def __getattr__(self, name):
            return self._fail

    fake = type(
        "S", (), {"_jsparkSession": _Boom(), "sparkContext": None}
    )()
    with pytest.raises(RuntimeError, match="bridge down"):
        cli._parsed_plan_is_query(fake, "SELECT 1")


def test_cli_sql_with_cte_join(spark, capsys):
    rc = cmd_sql({
        "tables": {
            "nation": f"{SF}/nation.parquet",
            "region": f"{SF}/region.parquet",
        },
        "sql": (
            "WITH r AS (SELECT * FROM region WHERE r_regionkey = 0) "
            "SELECT count(*) AS n FROM nation JOIN r "
            "ON nation.n_regionkey = r.r_regionkey"
        ),
    })
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["n"] == 5


def test_cli_export_end_to_end(spark, capsys, tmp_path):
    from redshift_to_pendo_api_data_pipeline_spark.cli import cmd_export

    out = str(tmp_path / "export")
    rc = cmd_export({
        "input": SF, "table": "documents", "output": out,
        "budget_ppm": 600_000, "seq_budget": 256, "min_words": 5,
        "min_stopwords": 1,
    })
    assert rc == 0
    manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # monotone attrition through the funnel
    assert (manifest["input_docs"] >= manifest["after_rules"]
            >= manifest["after_dedup"] >= manifest["after_sampling"]
            >= 1)
    assert manifest["packed_docs"] == manifest["after_sampling"]
    # water-fill never allocates above a source's capacity
    for a in manifest["allocation"].values():
        assert a["allocated"] <= a["cap"]
        assert 0 <= a["take_rate_ppm"] <= 1_000_000
    # the packed output is readable and carries the packing columns
    packed = spark.read.parquet(out)
    assert {"seq_id", "seq_offset", "__n_tokens"} <= set(packed.columns)
    assert manifest["n_sequences"] >= 1
    assert manifest["total_tokens"] > 0


def test_cli_sql_rejects_cte_wrapped_dml(spark, capsys, tmp_path):
    # 'WITH ... INSERT OVERWRITE DIRECTORY' text-starts with WITH but
    # parses to an insert node — the plan walk must reject it before
    # anything touches the filesystem
    target = tmp_path / "evil"
    rc = cmd_sql({
        "tables": {"region": f"{SF}/region.parquet"},
        "sql": (
            "WITH t AS (SELECT 1 AS x) "
            f"INSERT OVERWRITE DIRECTORY '{target}' USING parquet "
            "SELECT * FROM t"
        ),
    })
    assert rc == 2
    assert "error" in json.loads(capsys.readouterr().out.strip())
    assert not target.exists()


def test_cli_sql_null_source_docs_survive_export(spark, capsys, tmp_path):
    # docs whose source is NULL form their own allocation group and
    # must flow through sampling (eqNullSafe) instead of vanishing
    import pyspark.sql.functions as F

    src = str(tmp_path / "in")
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "source",
        F.when(F.col("doc_id") % 2 == 0, F.col("source")),
    )
    docs.write.mode("overwrite").parquet(f"{src}/documents.parquet")
    out = str(tmp_path / "export")
    from redshift_to_pendo_api_data_pipeline_spark.cli import cmd_export
    rc = cmd_export({
        "input": src, "table": "documents", "output": out,
        "budget_ppm": 1_000_000, "seq_budget": 256, "min_words": 5,
        "min_stopwords": 1,
    })
    assert rc == 0
    manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "__null_source__" in manifest["allocation"]
    # full budget -> nothing sampled away, NULL-source docs included
    assert manifest["after_sampling"] == manifest["after_dedup"]
