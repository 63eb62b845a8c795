"""Z-order layout: per-file min/max spans must be narrow on EVERY
participating dimension, which is what makes multi-dimensional file
pruning work (a single-column sort only narrows its own column)."""

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.layout import (
    write_zordered,
    zorder_key,
)
from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table


def _file_spans(path, col):
    """Mean per-file (max-min) span of `col`, from parquet footer stats."""
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        spans.append(float(hi) - float(lo))
    return sum(spans) / len(spans)


def test_zorder_narrows_file_spans_on_both_dims(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    full_user = ev.agg(F.max("user_id") - F.min("user_id")).first()[0]
    full_ts = ev.agg(F.max("ts_us") - F.min("ts_us")).first()[0]

    linear, zpath = str(tmp_path / "linear"), str(tmp_path / "zorder")
    # single-column layout: sorted by time only (the default lake layout)
    ev.repartitionByRange(16, "ts_us").sortWithinPartitions("ts_us") \
        .write.mode("overwrite").parquet(linear)
    write_zordered(ev, zpath, ["user_id", "ts_us"], n_files=16)

    # time-sorted: ts spans are tiny, user spans are ~the full range
    assert _file_spans(linear, "ts_us") < 0.2 * full_ts
    assert _file_spans(linear, "user_id") > 0.8 * full_user
    # z-ordered: BOTH dimensions' per-file spans shrink well below full
    assert _file_spans(zpath, "user_id") < 0.5 * full_user
    assert _file_spans(zpath, "ts_us") < 0.5 * full_ts


def test_zorder_key_deterministic_and_total(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 100) for i in range(1000)], "a long, b long"
    )
    z1 = {r["a"]: r["__z"] for r in zorder_key(df, ["a", "b"]).collect()}
    z2 = {r["a"]: r["__z"] for r in zorder_key(df, ["a", "b"]).collect()}
    assert z1 == z2                      # deterministic
    assert all(v >= 0 for v in z1.values())
    assert len(set(z1.values())) > 900   # near-unique keys, no collapse


def test_zorder_4col_stays_nonnegative_and_true_morton(spark):
    """4 dims x 16 bits would place the 4th dimension's MSB on the long
    SIGN bit and split the curve into two swapped halves under signed
    sort; the key must instead use 15 bits/dim (highest position 59)."""
    df = spark.createDataFrame(
        [(i, i, (i * 7) % 64, (i * 13) % 64, (i * 29) % 64)
         for i in range(4096)],
        "id long, a long, b long, c long, d long",
    )
    rows = zorder_key(df, ["a", "b", "c", "d"]).collect()
    zs = [r["__z"] for r in rows]
    assert all(z >= 0 for z in zs)
    assert max(zs) < (1 << 60)

    # bit-exact re-derivation in Python: quantize each dim to 15 bits
    # over its observed range, interleave at position i*4+d — every key
    # must match (unbounded Python ints make a sign-bit escape visible
    # as a mismatch, not a wrap)
    los = {c: min(r[c] for r in rows) for c in "abcd"}
    his = {c: max(r[c] for r in rows) for c in "abcd"}
    bits = 15

    def pyz(r):
        z = 0
        for d, c in enumerate("abcd"):
            span = his[c] - los[c]
            frac = (r[c] - los[c]) / span if span else 0.0
            b = min(max(int(frac * ((1 << bits) - 1)), 0), (1 << bits) - 1)
            for i in range(bits):
                z |= ((b >> i) & 1) << (i * 4 + d)
        return z

    for r in rows:
        assert r["__z"] == pyz(r)


def test_compact_small_files_bin_packs(spark, tmp_path):
    from redshift_to_pendo_api_data_pipeline_spark.operators.layout import (
        compact_small_files,
    )
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(50_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(src)  # 40 tiny files
    report = compact_small_files(spark, src, dst, target_file_mb=1, sort_col="id")
    out = spark.read.parquet(dst)
    assert out.count() == 50_000
    assert report["files_in"] == 40
    assert report["files_out"] < 40
    import glob
    assert len(glob.glob(f"{dst}/*.parquet")) == report["files_out"]
    # clustering preserved: each output file covers a disjoint id range
    spans = (out.groupBy(F.input_file_name().alias("f"))
             .agg(F.min("id").alias("lo"), F.max("id").alias("hi")).collect())
    spans = sorted((r["lo"], r["hi"]) for r in spans)
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert h1 < l2


def test_compact_small_files_partitioned_input(spark, tmp_path):
    """The byte sizing lists recursively: a partitioned source (nested
    part=... dirs) still reports real file counts/bytes and compacts."""
    from redshift_to_pendo_api_data_pipeline_spark.operators.layout import (
        compact_small_files,
    )
    src, dst = str(tmp_path / "psrc"), str(tmp_path / "pdst")
    df = spark.range(20_000).withColumn("part", (F.col("id") % 4).cast("int"))
    df.repartition(8).write.partitionBy("part").parquet(src)
    report = compact_small_files(spark, src, dst, target_file_mb=1, sort_col="id")
    assert report["files_in"] >= 8  # nested files were found
    assert report["bytes_in"] > 0
    assert spark.read.parquet(dst).count() == 20_000
