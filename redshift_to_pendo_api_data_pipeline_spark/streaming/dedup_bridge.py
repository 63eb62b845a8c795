"""Streaming near-dup bridge: dedupe a document stream against a staged
corpus.

The batch operator (``operators/dedup.minhash_neardup_incremental``)
already has the production ingest shape — asymmetric banding where the
corpus side never self-joins, signatures staged to the lake. This module
wires it into Structured Streaming via ``foreachBatch``: the corpus
signatures are staged ONCE (or reused from a previous ingest via
``SPARK_GRAFT_STAGE_REUSE``), and every micro-batch of new documents

1. computes its own MinHash signatures in-memory (a micro-batch is small;
   staging it would just add a write),
2. generates candidates against the STAGED corpus signatures
   (new x corpus on (band, bucket) — the corpus is scanned from parquet,
   never recomputed, never self-paired),
3. exact-verifies candidates with n-gram Jaccard over the pair texts,
4. hands (id_a=new, id_b=corpus, jaccard) to the caller's sink callback
   together with the batch id.

At 100 TB the corpus signature relation is the big artifact (staged once
per corpus version) and each micro-batch costs O(bands x batch) band rows
joined against the bucketed corpus — the same plan the batch operator
proves out, re-executed per trigger with exactly-once semantics from the
checkpoint.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.dedup import (
    candidates_between_signatures,
    minhash_signatures,
    ngram_jaccard,
    staged_minhash_signatures,
)


def streaming_neardup_against_corpus(
    stream_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str,
    id_col: str,
    stage_corpus: str,
    checkpoint: str,
    on_pairs: Callable[[DataFrame, int], None],
    threshold: float = 0.8,
    n: int = 3,
    k: int = 48,
    bands: int = 8,
    trigger_available_now: bool = True,
):
    """Start a streaming query that near-dup-checks every micro-batch of
    ``stream_df`` (a streaming DataFrame of documents) against
    ``corpus_df``, whose signatures are staged at ``stage_corpus`` before
    the stream starts. ``on_pairs(pairs_df, batch_id)`` receives the
    verified (id_a, id_b, jaccard) pairs per batch. Returns the
    StreamingQuery."""
    spark = corpus_df.sparkSession
    # stage once, up front — every micro-batch probes this relation
    staged_minhash_signatures(corpus_df, text_col, id_col, stage_corpus, n=n, k=k)
    corpus_texts = corpus_df.select(
        F.col(id_col).alias("__cid"), F.col(text_col).alias("__ctext")
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sigs_new = minhash_signatures(batch_df, text_col, id_col, n=n, k=k)
        sigs_corpus = spark.read.parquet(stage_corpus)
        cands = candidates_between_signatures(
            sigs_new, sigs_corpus, k=k, bands=bands
        ).select(F.col("id_new").alias("id_a"), F.col("id_corpus").alias("id_b"))
        # verify needs both sides' texts: batch rows + corpus rows
        docs = batch_df.select(
            F.col(id_col).alias("__cid"), F.col(text_col).alias("__ctext")
        ).unionByName(corpus_texts).select(
            F.col("__cid").alias(id_col), F.col("__ctext").alias(text_col)
        )
        pairs = ngram_jaccard(cands, docs, text_col, id_col, n=n).where(
            F.col("jaccard") >= threshold
        )
        on_pairs(pairs, batch_id)

    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_process)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
