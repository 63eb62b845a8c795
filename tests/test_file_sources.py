"""CSV/JSONL sources: explicit schema, PERMISSIVE corrupt-record
quarantine — bad rows route, never vanish, never kill the job."""

from pyspark.sql import types as T

from redshift_to_pendo_api_data_pipeline_spark.sources.files import (
    read_csv, read_jsonl,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("amount", T.DoubleType()),
])


def test_jsonl_valid_and_quarantine(spark, tmp_path):
    p = tmp_path / "d.jsonl"
    p.write_text(
        '{"id": 1, "name": "a", "amount": 2.5}\n'
        'not json at all\n'
        '{"id": "NaNopeNotANumber", "name": "c", "amount": 1.0}\n'
        '{"id": 3, "name": "d", "amount": 4.0}\n'
    )
    valid, quar = read_jsonl(spark, str(p), SCHEMA)
    assert sorted(r["id"] for r in valid.collect()) == [1, 3]
    assert quar.count() == 2
    assert "_corrupt_record" not in valid.columns


def test_csv_valid_and_quarantine(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text(
        "id,name,amount\n"
        "1,a,2.5\n"
        "oops,b,xyz\n"
        "3,c,4.0\n"
    )
    valid, quar = read_csv(spark, str(p), SCHEMA)
    assert sorted(r["id"] for r in valid.collect()) == [1, 3]
    qr = [r["raw"] for r in quar.collect()]
    assert qr == ["oops,b,xyz"]


def test_csv_projection_prunes(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("id,name,amount\n1,a,2.5\n")
    valid, _ = read_csv(spark, str(p), SCHEMA)
    plan = valid.select("id")._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC is a first-class engine format (built into Spark): write,
    read back, and confirm predicate pushdown reaches the ORC scan the
    same way it does for parquet."""
    p = str(tmp_path / "events_orc")
    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    src.write.orc(p)
    back = spark.read.orc(p)
    assert back.count() == src.count()
    filtered = back.where("o_totalprice > 1000").select("o_orderkey")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_totalprice" in plan
    assert "ReadSchema" in plan


def test_stream_jsonl_quarantine_routing(spark, tmp_path):
    """Streaming JSONL ingest: each micro-batch splits into valid and
    quarantined rows (corrupt rows route, never vanish, never kill the
    stream)."""
    import os

    from redshift_to_pendo_api_data_pipeline_spark.sources.files import (
        stream_jsonl_with_quarantine,
    )
    src = tmp_path / "stream"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"id": 1, "name": "a", "amount": 2.5}\nnot json\n'
    )
    os.utime(src / "a.jsonl", (1000000000, 1000000000))
    (src / "b.jsonl").write_text(
        '{"id": 2, "name": "b", "amount": 3.5}\n'
        '{"id": 3, "name": "c", "amount": 4.5}\n'
    )
    seen = []

    def on_batch(valid, quarantine, batch_id):
        seen.append((sorted(r["id"] for r in valid.collect()),
                     quarantine.count()))

    q = stream_jsonl_with_quarantine(
        spark, str(src), SCHEMA, on_batch,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    all_valid = sorted(i for ids, _ in seen for i in ids)
    total_quar = sum(n for _, n in seen)
    assert all_valid == [1, 2, 3]
    assert total_quar == 1
