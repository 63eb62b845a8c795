"""Training-data layout operators: sequence packing, deterministic
shuffle, token rarity, gap-filled rollups."""

from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.sampling import (
    deterministic_shuffle,
    pack_sequences,
    shuffled_head,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.temporal import (
    time_bucket_gapfill,
)
from redshift_to_pendo_api_data_pipeline_spark.operators.text import (
    token_rarity_stats,
)
from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table

BUDGET = 8192


def test_pack_sequences_assignment_invariants(spark, sf_dir):
    """Recompute the concatenate-then-chop layout in plain Python from
    the same (hash, id) order and require identical assignments."""
    import hashlib

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(docs, "doc_id", "n_chars", "source", BUDGET)
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in packed.select("doc_id", "seq_id", "seq_offset").collect()
    }
    assert len(got) == docs.count()

    by_src: dict = {}
    for r in docs.select("doc_id", "source", "n_chars").collect():
        h = hashlib.md5(f"pack-v1{r['doc_id']}".encode()).hexdigest()[:4]
        by_src.setdefault(r["source"], []).append((h, r["doc_id"], r["n_chars"]))
    expected = {}
    for chunk in by_src.values():
        cum = 0
        for _, doc_id, n in sorted(chunk):
            expected[doc_id] = (cum // BUDGET, cum % BUDGET)
            cum += n
    assert got == expected


def test_pack_sequences_stable_under_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = pack_sequences(docs, "doc_id", "n_chars", "source", BUDGET)
    b = pack_sequences(docs.repartition(13), "doc_id", "n_chars", "source", BUDGET)
    key = lambda df: sorted(
        (r["doc_id"], r["seq_id"], r["seq_offset"])
        for r in df.select("doc_id", "seq_id", "seq_offset").collect()
    )
    assert key(a) == key(b)


def test_shuffled_head_deterministic_and_salted(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    h1 = [r["doc_id"] for r in shuffled_head(docs, "doc_id", 20)
          .orderBy("shuffle_rank").collect()]
    h2 = [r["doc_id"] for r in shuffled_head(docs.repartition(7), "doc_id", 20)
          .orderBy("shuffle_rank").collect()]
    assert h1 == h2 and len(h1) == 20
    other = [r["doc_id"] for r in shuffled_head(docs, "doc_id", 20, salt="v2")
             .orderBy("shuffle_rank").collect()]
    assert other != h1  # a new salt is a reshuffle
    # the head agrees with the full deterministic order
    full = [r["doc_id"] for r in
            deterministic_shuffle(docs, "doc_id").select("doc_id").collect()]
    assert full[:20] == h1


def test_token_rarity_exact_on_tiny_corpus(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["sum_tok_count"],
                      r["min_tok_count"], r["max_tok_count"])
        for r in token_rarity_stats(df).collect()
    }
    # global counts: a=3, b=1, c=1
    assert got[1] == (3, 7, 1, 3)   # a,b,a -> 3+1+3
    assert got[2] == (2, 4, 1, 3)   # a,c   -> 3+1


def test_gapfill_fills_and_carries(spark):
    df = spark.createDataFrame(
        [
            ("k1", "2024-01-01 00:10:00", 1.0),
            ("k1", "2024-01-01 03:20:00", 2.0),
            ("k2", "2024-01-01 01:00:00", 5.0),
        ],
        "k string, ts string, value double",
    ).select("k", F.to_timestamp("ts").alias("ts"), "value")
    out = time_bucket_gapfill(df, "k", "ts", "value", "1 hour")
    rows = {(r["k"], str(r["bucket_start"])): (r["n"], r["sum_value_fp2"])
            for r in out.collect()}
    # spine covers global span (00:00..03:00) for BOTH keys
    assert len(rows) == 8
    assert rows[("k1", "2024-01-01 00:00:00")] == (1, 100)
    assert rows[("k1", "2024-01-01 01:00:00")] == (0, 100)   # gap: 0 count, LOCF
    assert rows[("k1", "2024-01-01 02:00:00")] == (0, 100)
    assert rows[("k1", "2024-01-01 03:00:00")] == (1, 200)
    assert rows[("k2", "2024-01-01 00:00:00")] == (0, None)  # before first obs
    assert rows[("k2", "2024-01-01 01:00:00")] == (1, 500)
    assert rows[("k2", "2024-01-01 03:00:00")] == (0, 500)
