"""Repeated n-gram SPAN detection — word-granular substring dedup.

Document-level near-dup (MinHash/SimHash, operators/dedup.py) misses the
other duplication mode pretraining corpora suffer from: long verbatim
passages (licenses, boilerplate, quoted templates) embedded inside
otherwise-distinct documents. The standard remedy (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better") finds every
substring of length >= L that occurs more than once in the corpus. A
literal suffix array is a single-machine construction; the
Spark-native equivalent used here is the k-gram cover: a duplicated
substring of length >= k words is exactly a run of duplicated word
k-grams, so marking every token covered by a cross-document-duplicated
k-gram finds the same spans with one explode + two linear shuffles and
no all-pairs comparison anywhere.

Scale design (100 TB-first):
- positional k-grams are built with the same materialized-words-array
  discipline as dedup._grams_from_words (one split per row, no lambda
  re-evaluation);
- grams travel as md5 digests (fixed 32-byte shuffle keys, no long text
  on the wire; 2^-128 collision adds a false span, never drops one);
- duplicated-gram detection is a map-side-combined groupBy on the
  digest; the join back to positions re-uses the same key;
- span expansion is sequence() + explode (JVM), coverage is a distinct
  + count per doc. Every stage is linear in corpus tokens.

The reference has no dedup at all (it replicates rows 1:1,
tap-redshift/src/sync.py:176-198); this is widened training-pipeline
surface per BASELINE.json's north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.dedup import (
    _grams_from_words,
    normalize_text,
)


def positional_kgrams(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(doc, n_tokens, pos, g) — one row per k-gram START position
    (1-based), g = xxhash64 of the space-joined gram (8-byte shuffle key;
    a 2^-64 collision can only ADD a false covered span, never drop one —
    the same one-sided-error argument the MinHash banding oracle notes
    make). Short docs (< k words) yield one truncated gram at pos 1,
    matching dedup._grams_from_words, so every document has at least one
    row."""
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.split(normalize_text(F.col(text_col)), " ").alias("w"),
    ).select("doc", "w", F.size("w").alias("n_tokens"))
    return tok.select(
        "doc",
        "n_tokens",
        F.posexplode(_grams_from_words(F.col("w"), k)).alias("pos0", "gram"),
    ).select(
        "doc",
        "n_tokens",
        (F.col("pos0") + 1).alias("pos"),
        F.xxhash64("gram").alias("g"),
    )


def _covered_positions(grams: DataFrame, k: int, min_docs: int) -> DataFrame:
    """Distinct (doc, p) token positions covered by a k-gram that occurs
    in >= min_docs distinct documents.

    min_docs == 2 (the default, and the Lee-et-al semantics) flags
    duplicated grams with a window min(doc) != max(doc) over the gram
    key: ONE evaluation of the gram subtree and one Exchange — the
    groupBy + join-back alternative evaluates the (scan -> split -> gram
    -> explode) subtree twice, once per join input (no CSE across join
    sides), which profiling showed dominates. For min_docs > 2 the
    window can't express count_distinct, so the general path aggregates
    and joins back on the same key. Both shapes put a hot boilerplate
    gram into a single task; that skew is inherent to grouping by gram
    (AQE splits the join form's shuffle, and the window form's per-group
    state is two longs)."""
    if min_docs == 2:
        w = Window.partitionBy("g")
        flagged = grams.withColumn(
            "__dup", F.min("doc").over(w) != F.max("doc").over(w)
        ).where(F.col("__dup"))
    else:
        dup = (
            grams.groupBy("g")
            .agg(F.count_distinct("doc").alias("nd"))
            .where(F.col("nd") >= min_docs)
            .select("g")
        )
        flagged = grams.join(dup, "g")
    return flagged.select(
        "doc",
        F.explode(
            F.sequence(
                F.col("pos"),
                F.least(F.col("pos") + (k - 1), F.col("n_tokens")),
            )
        ).alias("p"),
    ).distinct()


def duplicated_span_coverage(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-span statistics: (id, n_tokens,
    dup_tokens, dup_coverage_bp).

    A token position is "covered" when any k-gram window containing it
    also appears in >= min_docs distinct documents. dup_coverage_bp is
    floor(10000 * dup_tokens / n_tokens) — the integer basis-point form
    every other quality score in this repo uses, so the whole result
    hash-checks against the DuckDB oracle.

    Plan: one evaluation of the positional-gram relation, one Exchange
    on the 8-byte gram hash (_covered_positions), covered positions
    expand via sequence()/explode and dedup on (doc, p). Nothing is
    quadratic; the widest shuffle is one row per corpus token
    occurrence."""
    grams = positional_kgrams(df, text_col, id_col, k)
    covered = (
        _covered_positions(grams, k, min_docs)
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("dup_tokens"))
    )
    # Per-doc token totals come from a fresh 2-column scan of the source
    # (cheap: pruned parquet read), NOT from re-aggregating the exploded
    # gram relation — that would shuffle one row per corpus token just to
    # recover a count the source row already knows.
    per_doc = df.select(
        F.col(id_col).alias("doc"),
        F.size(F.split(normalize_text(F.col(text_col)), " ")).alias("n_tokens"),
    )
    return (
        per_doc.join(covered, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.coalesce(F.col("dup_tokens"), F.lit(0))
            .cast("int")
            .alias("dup_tokens"),
            F.expr("(10000 * coalesce(dup_tokens, 0)) div n_tokens")
            .cast("long")
            .alias("dup_coverage_bp"),
        )
    )


def strip_duplicated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Rewrite each document with its duplicated spans removed: (id,
    clean_text, n_tokens, kept_tokens). The cleaning transform of the
    Lee-et-al pipeline: tokens covered by a cross-document-duplicated
    k-gram window are dropped, survivors re-join in original order.

    Plan: same coverage pipeline, then an aggregation of DROPPED
    positions per doc (sort_array over a collected int list — bounded by
    document length, never corpus size) and one element-wise rebuild
    against the materialized words array. Documents with no duplicated
    span pass through via the left join + coalesce, untouched."""
    grams = positional_kgrams(df, text_col, id_col, k)
    return _rebuild_without_positions(
        df, _covered_positions(grams, k, min_docs), text_col, id_col
    )


def _rebuild_without_positions(
    df: DataFrame, covered: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Rewrite each document dropping the (doc, p) positions in
    ``covered``: (id, clean_text, n_tokens, kept_tokens). The dropped
    list per doc is bounded by document length, never corpus size."""
    dropped = covered.groupBy("doc").agg(
        F.sort_array(F.collect_list("p")).alias("dropped")
    )
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.split(normalize_text(F.col(text_col)), " ").alias("w"),
    )
    empty = F.array().cast("array<int>")
    return (
        tok.join(dropped, "doc", "left")
        .select(
            "doc",
            "w",
            F.coalesce(F.col("dropped"), empty).alias("dropped"),
        )
        .select(
            F.col("doc").alias(id_col),
            F.concat_ws(
                " ",
                F.filter(
                    F.transform(
                        F.sequence(F.lit(1), F.size("w")),
                        lambda i: F.when(
                            ~F.array_contains(F.col("dropped"), i),
                            F.element_at(F.col("w"), i),
                        ),
                    ),
                    lambda x: x.isNotNull(),
                ),
            ).alias("clean_text"),
            F.size("w").cast("int").alias("n_tokens"),
            (F.size("w") - F.size("dropped")).cast("int").alias("kept_tokens"),
        )
    )


def strip_contaminated_spans(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Span-level DECONTAMINATION: rewrite each corpus document dropping
    every token position covered by a k-gram that appears anywhere in the
    eval/benchmark set. The surgical form of dedup.benchmark_contamination
    — instead of quarantining whole documents, only the verbatim
    benchmark spans are excised, preserving the rest of the document for
    training.

    Scale: the eval side (thousands of docs) collapses to a distinct
    gram-hash relation that BROADCASTS — the corpus side is one scan +
    explode with a broadcast hash join, no shuffle of corpus grams at
    all; the only corpus shuffles are the (doc, p) dedup and the per-doc
    dropped-list aggregation, both linear."""
    grams = positional_kgrams(corpus, text_col, id_col, k)
    eval_grams = (
        positional_kgrams(eval_set, text_col, id_col, k).select("g").distinct()
    )
    covered = (
        grams.join(F.broadcast(eval_grams), "g")
        .select(
            "doc",
            F.explode(
                F.sequence(
                    F.col("pos"),
                    F.least(F.col("pos") + (k - 1), F.col("n_tokens")),
                )
            ).alias("p"),
        )
        .distinct()
    )
    return _rebuild_without_positions(corpus, covered, text_col, id_col)
