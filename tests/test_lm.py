"""Corpus-LM quality family: bigram surprisal, vocab coverage, source
profiles — integer-exact surfaces, broadcast vocab joins."""

from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators import lm as LM


def _corpus(spark):
    rows = [
        (1, "the cat sat on the mat", "web"),
        (2, "the cat sat on the mat", "web"),          # exact repeat
        (3, "the cat sat on the rug today", "web"),    # mostly common
        (4, "zx qv jk wp ld", "forum"),                # all-novel tokens
        (5, "one", "forum"),                           # single token: no bigrams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_bigram_surprisal_orders_common_above_novel(spark):
    out = {r["doc_id"]: r for r in
           LM.bigram_surprisal(_corpus(spark), "text", "doc_id").collect()}
    # doc 5 has <2 words -> no bigrams -> absent
    assert set(out) == {1, 2, 3, 4}
    # identical docs score identically
    assert out[1]["mean_freq_bits_x100"] == out[2]["mean_freq_bits_x100"]
    # docs built from repeated corpus bigrams outrank the all-novel doc
    assert out[1]["mean_freq_bits_x100"] > out[4]["mean_freq_bits_x100"]
    # exact arithmetic: doc 4's bigrams are all unique (count 1 -> 1 bit)
    assert out[4]["n_bigrams"] == 4 and out[4]["freq_bits"] == 4
    assert out[4]["mean_freq_bits_x100"] == 100


def test_vocab_coverage_and_broadcast_plan(spark):
    df = _corpus(spark)
    cov = LM.vocab_coverage(df, "text", "doc_id", v=5)
    out = {r["doc_id"]: r for r in cov.collect()}
    # top-5 tokens are exactly {the(6), cat(3), sat(3), on(3), mat(2)} —
    # the count-2 cut keeps every count-1 token (incl. doc 4's) out
    assert out[1]["n_tokens"] == 6
    assert out[1]["n_in_vocab"] == 6  # all six tokens of doc 1 in vocab
    assert out[1]["coverage_bp"] >= out[4]["coverage_bp"]
    # all-novel doc: tokens outside any plausible top-6
    assert out[4]["n_in_vocab"] == 0 and out[4]["coverage_bp"] == 0
    # single-token doc present here (tokens exist even without bigrams)
    assert out[5]["n_tokens"] == 1
    # the vocab side joins as a broadcast, never a shuffle of the stream
    plan = cov._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_source_vocab_profile_partitions_corpus(spark):
    out = {r["source"]: r for r in
           LM.source_vocab_profile(
               _corpus(spark), "text", "doc_id", "source", v=6
           ).collect()}
    assert set(out) == {"web", "forum"}
    web, forum = out["web"], out["forum"]
    assert web["n_tokens"] == 19 and forum["n_tokens"] == 6
    # forum is lexically idiosyncratic: far lower top-V coverage
    assert forum["top_v_bp"] < web["top_v_bp"]
    # distinct counts are per-source vocabularies
    assert forum["n_distinct_toks"] == 6


def test_streaming_ann_serving_from_persisted_index(spark, sf_dir, tmp_path):
    """ANN serving bridge: build the IVF index once, stream query vectors
    through foreachBatch, and each query's top-k must equal the batch
    ivf probe with the same parameters (and the exact top-1 for a query
    that IS a corpus vector)."""
    from pyspark.sql import functions as F

    from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_persisted,
    )
    from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table
    from redshift_to_pendo_api_data_pipeline_spark.streaming.ann_bridge import (
        streaming_ann_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    index_path = str(tmp_path / "ivf_index.parquet")
    centroids = build_ivf_index(emb, "embedding", "vec_id", index_path, n_list=8)

    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.where(F.col("vec_id").isin([3, 7])).collect()
    }
    src = str(tmp_path / "queries")
    spark.createDataFrame(
        [(qid, vec) for qid, vec in qvecs.items()],
        "query_id long, qvec array<double>",
    ).write.parquet(src)

    got = {}

    def on_results(df, batch_id):
        for r in df.collect():
            got.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))

    q = streaming_ann_topk(
        spark.readStream.schema("query_id long, qvec array<double>").parquet(src),
        index_path,
        centroids,
        "embedding",
        "vec_id",
        checkpoint=str(tmp_path / "ckpt"),
        on_results=on_results,
        k=5,
        n_probe=3,
    )
    q.awaitTermination(120)

    assert set(got) == {3, 7}
    for qid in (3, 7):
        ranked = sorted(got[qid], key=lambda t: (-t[1], t[0]))
        assert ranked[0][0] == qid  # a corpus vector finds itself first
        expected = [
            (r["vec_id"], r["cosine"])
            for r in ivf_topk_persisted(
                spark, index_path, centroids, "embedding", "vec_id",
                qvecs[qid], k=5, n_probe=3,
            ).collect()
        ]
        assert ranked == expected


def test_dsir_scores_prefer_target_vocabulary(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.lm import dsir_scores
    from pyspark.sql import functions as F

    rows = [
        # target domain: medical-ish vocabulary
        (1, "dose patient trial dose patient", "tgt"),
        (2, "patient trial outcome dose trial", "tgt"),
        # raw-only: web-ish vocabulary
        (3, "click here subscribe click now", "web"),
        (4, "subscribe now click here now", "web"),
        # mixed doc built from target vocabulary should score high
        (5, "dose trial patient outcome", "web"),
        # doc from raw-only vocabulary should score low
        (6, "click subscribe here now", "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_scores(df, "text", "doc_id", F.col("source") == "tgt").collect()
    }
    assert out[5] > out[6]          # target-typical vocab outranks web vocab
    assert out[1] > out[3]
    # raw-only tokens have c_tgt=0 -> bits(1)-bits(c_raw+1) <= 0
    assert out[6] <= 0


def test_bigram_surprisal_singleton_fold_bit_identical(spark, sf_dir):
    """The scale mitigation is EXACT: pruning singleton bigrams from the
    count relation and folding them as a constant 1 bit reproduces the
    full-join result bit-for-bit (bit_length(1) == 1)."""
    from redshift_to_pendo_api_data_pipeline_spark.operators.lm import (
        bigram_surprisal,
    )
    from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    full = {r["doc_id"]: (r["n_bigrams"], r["freq_bits"], r["mean_freq_bits_x100"])
            for r in bigram_surprisal(docs, "text", "doc_id").collect()}
    folded = {r["doc_id"]: (r["n_bigrams"], r["freq_bits"], r["mean_freq_bits_x100"])
              for r in bigram_surprisal(
                  docs, "text", "doc_id", fold_singletons=True).collect()}
    assert full == folded and len(full) > 0


def test_top_vocab_two_stage_matches_bruteforce_across_partitions(spark):
    """top_vocab ranks in two stages (per-physical-partition top-V, then
    a global window over the <= V*P survivors). Exactness check vs a
    Python brute-force ranking on a corpus whose count relation spans
    many partitions, with heavy count ties to stress the (count desc,
    token asc) tiebreak; plus the plan must show the distributed
    first-stage window (partitioned by spark_partition_id) feeding the
    partial-rank filter."""
    rows = [(i, " ".join(f"tok{j:03d}" for j in range(i % 40))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(16)
    v = 7
    got = [(r["tok"], r["c"], r["rank"])
           for r in LM.top_vocab(df, "text", "doc_id", v).collect()]
    from collections import Counter
    c = Counter()
    for _, t in rows:
        for w in t.split():
            if w:
                c[w] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:v]
    assert sorted(got, key=lambda x: x[2]) == [
        (tok, n, i + 1) for i, (tok, n) in enumerate(want)
    ]
    plan = LM.top_vocab(df, "text", "doc_id", v)._jdf.queryExecution() \
        .executedPlan().toString()
    # stage-1: partitioned window on __pid with WindowGroupLimit top-k
    # pushdown (partial per input split + final per __pid group);
    # stage-2: the only global ordering is a TakeOrderedAndProject over
    # the <= v*P survivors — no full-vocab single-reducer Sort remains.
    assert "__pr" in plan and "WindowGroupLimit" in plan
    assert "TakeOrderedAndProject(limit=7" in plan


def test_bigram_surprisal_staged_counts_broadcast(spark, tmp_path):
    """SCALE §9.5 closure: with fold_singletons + a staged count side,
    Catalyst sees the real parquet size of the folded relation and
    broadcasts it under autoBroadcastJoinThreshold — the doc-bigram
    stream never shuffles for the join. Result must stay bit-identical
    to the unstaged fold path (and the fold path is already pinned
    bit-identical to the plain join)."""
    rows = [(i, f"the cat sat on mat{i % 7} and the dog ran") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    staged = LM.bigram_surprisal(
        df, "text", "doc_id", fold_singletons=True,
        stage_path=str(tmp_path / "bigram_counts.parquet"),
    )
    plain = LM.bigram_surprisal(df, "text", "doc_id", fold_singletons=True)
    assert sorted(map(tuple, staged.collect())) == \
        sorted(map(tuple, plain.collect()))
    plan = staged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the broadcast side is the staged parquet scan, not the agg subtree
    # (plan strings truncate long paths, so key on the scan schema)
    assert "ReadSchema: struct<big:string,c:bigint>" in plan


def test_streaming_ann_distributed_path_matches_collect(spark, sf_dir, tmp_path):
    """Heavy-batch crossover (SCALE §9.7 closure): a micro-batch above
    max_driver_queries takes the join-based path — query vectors never
    collect to the driver — and must return row-identical top-k to the
    driver-matmul collect path."""
    from pyspark.sql import functions as F

    from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
    )
    from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table
    from redshift_to_pendo_api_data_pipeline_spark.streaming.ann_bridge import (
        batch_ivf_topk,
        batch_ivf_topk_distributed,
        streaming_ann_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    index_path = str(tmp_path / "ivf_index.parquet")
    centroids = build_ivf_index(emb, "embedding", "vec_id", index_path, n_list=8)

    queries = emb.where(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    src = str(tmp_path / "queries")
    queries.write.parquet(src)

    want = sorted(
        (r["query_id"], r["vec_id"], r["cosine"])
        for r in batch_ivf_topk(
            spark, queries, index_path, centroids, "embedding", "vec_id",
            k=5, n_probe=3,
        ).collect()
    )
    # direct equivalence of the two batch flavors
    got_dist = sorted(
        (r["query_id"], r["vec_id"], r["cosine"])
        for r in batch_ivf_topk_distributed(
            spark, queries, index_path, centroids, "embedding", "vec_id",
            k=5, n_probe=3,
        ).collect()
    )
    assert got_dist == want and len(want) == 40 * 5

    # and through the stream with a batch 10x the driver-comfort cap
    rows = []

    def on_results(df, batch_id):
        rows.extend(
            (r["query_id"], r["vec_id"], r["cosine"]) for r in df.collect()
        )

    q = streaming_ann_topk(
        spark.readStream.schema("query_id long, qvec array<double>").parquet(src),
        index_path, centroids, "embedding", "vec_id",
        checkpoint=str(tmp_path / "ckpt"),
        on_results=on_results, k=5, n_probe=3,
        max_driver_queries=4,
    )
    q.awaitTermination(180)
    assert sorted(rows) == want

    # DIRECT batch calls are guarded too: a query set above
    # max_driver_queries auto-routes to the distributed path (the
    # unconditional driver collect is gone), results identical
    from redshift_to_pendo_api_data_pipeline_spark.streaming import (
        ann_bridge,
    )

    routed = []
    real_distributed = ann_bridge.batch_ivf_topk_distributed

    def spy(*args, **kwargs):
        routed.append(True)
        return real_distributed(*args, **kwargs)

    ann_bridge.batch_ivf_topk_distributed = spy
    try:
        got_guard = sorted(
            (r["query_id"], r["vec_id"], r["cosine"])
            for r in batch_ivf_topk(
                spark, queries, index_path, centroids, "embedding",
                "vec_id", k=5, n_probe=3, max_driver_queries=4,
            ).collect()
        )
    finally:
        ann_bridge.batch_ivf_topk_distributed = real_distributed
    assert routed and got_guard == want


def test_batch_ivf_topk_preserves_string_query_ids(spark, sf_dir, tmp_path):
    """Both batch flavors must pass non-long query ids through unchanged
    (no silent cast('long')), and the empty-batch result schema must be
    derived from the actual query/index schemas — the crossover contract
    is 'row-identical for ANY id type'."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
    )
    from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table
    from redshift_to_pendo_api_data_pipeline_spark.streaming.ann_bridge import (
        batch_ivf_topk,
        batch_ivf_topk_distributed,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    index_path = str(tmp_path / "ivf_index.parquet")
    centroids = build_ivf_index(emb, "embedding", "vec_id", index_path, n_list=8)

    queries = emb.where(F.col("vec_id") < 5).select(
        F.concat(F.lit("q-"), F.col("vec_id")).alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    a = batch_ivf_topk(spark, queries, index_path, centroids,
                       "embedding", "vec_id", k=3, n_probe=3)
    b = batch_ivf_topk_distributed(spark, queries, index_path, centroids,
                                   "embedding", "vec_id", k=3, n_probe=3)
    for out in (a, b):
        assert out.schema["query_id"].dataType == T.StringType()
        assert out.schema["vec_id"].dataType == T.LongType()
    ra = sorted((r["query_id"], r["vec_id"], r["cosine"]) for r in a.collect())
    rb = sorted((r["query_id"], r["vec_id"], r["cosine"]) for r in b.collect())
    assert ra == rb and len(ra) == 5 * 3
    assert all(isinstance(t[0], str) and t[0].startswith("q-") for t in ra)

    # empty batches: schema still derived, not hardcoded long
    empty = queries.where(F.lit(False))
    for fn in (batch_ivf_topk, batch_ivf_topk_distributed):
        out = fn(spark, empty, index_path, centroids,
                 "embedding", "vec_id", k=3, n_probe=3)
        assert out.schema["query_id"].dataType == T.StringType()
        assert out.schema["vec_id"].dataType == T.LongType()
        assert out.count() == 0


def test_streaming_index_append_exactly_once_and_served(spark, sf_dir, tmp_path):
    """Streaming IVF maintenance: two micro-batches of new vectors append
    into the persisted index exactly once each (a full stream REPLAY with
    a fresh checkpoint re-delivers both batches — the Hadoop-FS batch
    markers no-op them), and an appended vector is immediately servable
    as its own top-1 with partition pruning intact."""
    from pyspark.sql import functions as F

    from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_persisted,
    )
    from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table
    from redshift_to_pendo_api_data_pipeline_spark.streaming.ann_bridge import (
        streaming_index_append,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    base = emb.where(F.col("vec_id") < 400)
    new = emb.where(F.col("vec_id") >= 400).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    index_path = str(tmp_path / "ivf_stream.parquet")
    cents = build_ivf_index(base, "embedding", "vec_id", index_path, n_list=8)
    n_base = spark.read.parquet(index_path).count()

    # two source part-files -> maxFilesPerTrigger=1 gives two micro-batches
    src = str(tmp_path / "incoming")
    new.where(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(src)
    new.where(F.col("vec_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    def run(ckpt):
        q = streaming_index_append(
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1).parquet(src),
            index_path, cents, "embedding", "vec_id",
            checkpoint=str(tmp_path / ckpt),
        )
        q.awaitTermination(120)

    run("ckpt1")
    expected = n_base + new.count()
    assert spark.read.parquet(index_path).count() == expected

    # full replay: new checkpoint re-delivers every batch; deterministic
    # batch ids + markers must keep the index unchanged
    run("ckpt2")
    assert spark.read.parquet(index_path).count() == expected

    q_new = new.limit(1).collect()[0]
    top = ivf_topk_persisted(
        spark, index_path, cents, "embedding", "vec_id",
        list(q_new["embedding"]), k=3, n_probe=3,
    )
    rows = top.collect()
    assert rows[0]["vec_id"] == q_new["vec_id"]
    assert abs(rows[0]["cosine"] - 1.0) < 1e-6


def test_vocab_growth_hand_case(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.text import vocab_growth

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "b c"), (3, "c d e"), (4, "a")],
        ["doc_id", "text"],
    )
    rows = {r["pct"]: r for r in vocab_growth(
        docs, "text", "doc_id", cutoffs_pct=[50, 100]).collect()}
    # 50% -> first 2 docs: occurrences 4, vocab {a,b,c}=3
    assert rows[50]["cutoff_docs"] == 2
    assert rows[50]["n_occurrences"] == 4
    assert rows[50]["vocab_size"] == 3
    # 100% -> 8 occurrences, vocab {a..e}=5
    assert rows[100]["n_occurrences"] == 8
    assert rows[100]["vocab_size"] == 5
    # vocabulary growth is monotone by construction
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cutoffs_pct"):
        vocab_growth(docs, "text", "doc_id", cutoffs_pct=[0, 50])


def test_zipf_token_ranks_order_and_product(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.text import (
        zipf_token_ranks,
    )

    docs = spark.createDataFrame(
        [(1, "x x x y y z"), (2, "x y w")], ["doc_id", "text"]
    )
    rows = zipf_token_ranks(docs, "text", top_k=3).collect()
    assert [(r["rank"], r["token"], r["freq"]) for r in rows] == [
        (1, "x", 4), (2, "y", 3), (3, "w", 1)  # w before z on tie
    ]
    assert all(r["rank_freq"] == r["rank"] * r["freq"] for r in rows)


def test_compression_screen_pins_codec_and_arithmetic(spark, tmp_path):
    import zlib

    from redshift_to_pendo_api_data_pipeline_spark.operators.text import (
        compression_quality,
        compression_stats_staged,
    )

    rep = "spam spam spam spam spam " * 40        # highly compressible
    nat = "the quick brown fox jumps over xyzw "  # less so
    docs = spark.createDataFrame(
        [(1, rep, "a"), (2, nat * 5, "a"), (3, "", "b")],
        ["doc_id", "text", "source"],
    )
    stats = compression_stats_staged(
        docs, "text", "doc_id", f"{tmp_path}/cstats.parquet"
    )
    got = {r["doc"]: r for r in stats.collect()}
    # codec pin: staged lengths equal a direct zlib call, roundtrip safe
    assert got[1]["n_comp"] == len(zlib.compress(rep.encode(), 6))
    assert zlib.decompress(zlib.compress(rep.encode(), 6)).decode() == rep
    # monotonicity: repetitive text compresses far better than prose
    r1 = got[1]["n_comp"] * 1_000_000 // got[1]["n_raw"]
    r2 = got[2]["n_comp"] * 1_000_000 // got[2]["n_raw"]
    assert r1 < r2
    report = {r["source"]: r for r in compression_quality(
        stats, docs, "doc_id", "source").collect()}
    assert report["a"]["n_docs"] == 2
    assert report["a"]["n_repetitive"] >= 1  # the spam doc
    # empty doc: counted, never a div-by-zero
    assert report["b"]["n_docs"] == 1
