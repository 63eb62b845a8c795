"""Deduplication operators for training-data pipelines.

Not present in the reference (it replicates rows 1:1); this is the widened
surface BASELINE.json's north star asks for, designed 100 TB-first:

- exact dedup: hash-groupBy on a normalized content digest — one shuffle on
  the digest, map-side combined; never a sort.
- MinHash + LSH near-dup: shingle -> k minhashes -> b bands -> bucket join.
  All signature math is JVM-side array expressions (no Python in the hot
  path); candidate generation shuffles O(b·N) small rows instead of the
  O(N²) cross join; exact Jaccard verification only runs on bucket
  collisions.
- SimHash: vectorized Arrow pandas_udf (numpy bit math), banded for
  near-neighbor bucketing.
- n-gram Jaccard verify: exact set overlap on candidate pairs only.
- embedding cosine near-dup: normalized dot product; brute force for
  correctness at small sf, hyperplane-LSH bucketing as the scale path
  (operators/similarity.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

from redshift_to_pendo_api_data_pipeline_spark.staging import stage_parquet


# ------------------------------------------------------------------ exact

def normalize_text(col):
    """Canonical form for content hashing: lowercase, collapse whitespace,
    trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate removal: keep the smallest id per normalized-content
    digest. groupBy on the 128-bit digest (not the text itself) keeps
    shuffle rows tiny at 100 TB."""
    return (
        df.withColumn("__digest", F.md5(normalize_text(F.col(text_col))))
        .groupBy("__digest")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("__digest")
    )


# ----------------------------------------------------------------- minhash

def _grams_from_words(w, n: int):
    """n-gram array from a *materialized* words-array column reference.

    IMPORTANT: `w` must be a plain column reference, not the split()
    expression itself — expressions referenced inside a lambda body are
    re-evaluated per element (no common-subexpression elimination inside
    higher-order functions), which turns one split per row into ~3·|w|
    regex splits per row (measured 4x slowdown).

    r8 s2: the gram is built with slice + array_join instead of the
    old n-wide try_element_at/concat_ws chain — output-identical
    (slice truncates at the array end exactly like concat_ws dropped
    the out-of-range NULLs; equivalence swept), but the expression
    tree is O(1) instead of O(n) deep, which halved the fresh-plan
    codegen cost of the 9-gram-size gopher_repetition explode
    (8.1 s -> 4.4 s cold at sf0.1) and trims every shingle consumer."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1))),
        # short docs (< n words) yield one truncated gram: slice stops
        # at the array end, no ANSI out-of-bounds
        lambda i: F.array_join(F.slice(w, i, n), " "),
    )


def shingle_sets(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """(doc, sh: array<string>) of word n-gram shingles per document.

    Word shingles (the standard choice for corpus dedup) keep the array
    ~|words|-n+1 elements instead of one per character. Two-stage select:
    the words array is materialized in its own projection so the gram
    lambda references a column, not the split expression (see
    _grams_from_words). `distinct=False` skips the O(m²) array_distinct
    when the consumer is min-based (MinHash over a multiset equals MinHash
    over the set). Zero shuffle either way."""
    words_df = df.select(
        F.col(id_col).alias("doc"),
        F.split(normalize_text(F.col(text_col)), " ").alias("w"),
    )
    grams = _grams_from_words(F.col("w"), n)
    return words_df.select(
        "doc", (F.array_distinct(grams) if distinct else grams).alias("sh")
    )


def exploded_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """(doc, sh: string) — one row per shingle occurrence.

    The explode sits DIRECTLY over the words projection: a Generate node
    blocks CollapseProject, so the split() stays materialized as a column
    (adding an intermediate array-alias projection lets the optimizer
    collapse and re-inline split into the lambda — measured 5x slower)."""
    words_df = df.select(
        F.col(id_col).alias("doc"),
        F.split(normalize_text(F.col(text_col)), " ").alias("w"),
    )
    return words_df.select("doc", F.explode(_grams_from_words(F.col("w"), n)).alias("sh"))


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, k: int = 48
) -> DataFrame:
    """(id, sig array<long>) per document.

    Scale design: explode the shingle set once, compute the k hash family
    as seeded xxhash64 columns (JVM-native, whole-stage codegen — ANSI-safe,
    unlike wraparound linear transforms), then a k-way min aggregate per
    doc. The shuffle carries only (doc, k longs) with map-side partial
    mins — never the shingle strings."""
    exploded = exploded_shingles(df, text_col, id_col, n=n)
    mins = [F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"m{i}") for i in range(k)]
    agg = exploded.groupBy("doc").agg(*mins)
    return agg.select("doc", F.array(*[F.col(f"m{i}") for i in range(k)]).alias("sig"))


def staged_minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, path: str,
    n: int = 3, k: int = 48,
) -> DataFrame:
    """Compute MinHash signatures and STAGE them to the lake as parquet,
    returning the staged relation (a scan of `path`, not the computation).

    Staging is the 100 TB pattern: signatures are reused by banding,
    verify, clustering and incremental runs, and a lake file is durable
    and shareable where executor cache is neither. It is also what makes
    LSH *oracle-checkable*: banding + exact-Jaccard verify over the staged
    file is deterministic relational algebra any engine can replicate
    (band equality == signature-slice equality), so the DuckDB oracle can
    re-derive the same near-dup pairs independently."""
    stage_parquet(minhash_signatures(df, text_col, id_col, n=n, k=k), path)
    return df.sparkSession.read.parquet(path)


def candidates_from_signatures(
    sigs: DataFrame, k: int = 48, bands: int = 8
) -> DataFrame:
    """Banded-LSH candidate pairs from a precomputed (doc, sig) relation —
    the banding stage factored out so it can run over staged signatures.
    Returns distinct (id_a, id_b), id_a < id_b; shuffle O(bands·N)."""
    r = k // bands
    banded = sigs.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(F.slice("sig", b * r + 1, r)).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    return (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("id_a"), F.col("y.doc").alias("id_b"))
        .distinct()
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    k: int = 48,
    bands: int = 8,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    rows_per_band = k // bands. Two docs collide if any band of their
    signatures matches exactly. Returns distinct (id_a, id_b) with
    id_a < id_b. Shuffle cost: bands·N rows keyed by (band, band_hash) —
    the 100 TB-safe alternative to an O(N²) similarity join. Skewed
    buckets (e.g. empty docs) are bounded by bucket-size capping upstream
    if needed; AQE skew-join handles the join stage.
    """
    # No .cache() on the signature relation even though both sides of the
    # self-join read it: a DataFrame cache registered here is never
    # unpersisted (the caller materializes lazily, after this function
    # returns), so repeated calls in a long-lived session leak executor
    # storage until eviction. Recomputing the signature subtree twice is
    # two independent scans — cheap, parallel, and at 100 TB the right
    # pattern is staging signatures to the lake
    # (staged_minhash_signatures), not executor cache.
    sigs = minhash_signatures(df, text_col, id_col, n=n, k=k)
    return candidates_from_signatures(sigs, k=k, bands=bands)


def ngram_jaccard(df_pairs: DataFrame, docs: DataFrame, text_col: str, id_col: str,
                  n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs: the verify stage after LSH.
    Join the shingle sets back in (broadcast if docs side is small;
    shuffle-hash otherwise) and compute |∩| / |∪| with array expressions."""
    # prune to candidate docs before materializing shingle sets: after LSH
    # the candidate id set is tiny relative to the corpus, so this keeps
    # the expensive array construction off the non-candidate 99%+
    cand_ids = (
        df_pairs.select(F.col("id_a").alias("doc"))
        .union(df_pairs.select(F.col("id_b").alias("doc")))
        .distinct()
    )
    # broadcast the candidate-id prune: LSH keeps candidates a small
    # fraction of the corpus, and the static planner can't know that
    # (it would sort-merge both sides)
    pruned = docs.join(
        F.broadcast(cand_ids), docs[id_col] == cand_ids["doc"], "left_semi"
    )
    sh = shingle_sets(pruned, text_col, id_col, n=n, distinct=True)
    a = sh.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"),
                  F.size("sh").alias("n_a"))
    b = sh.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"),
                  F.size("sh").alias("n_b"))
    # |A∪B| = |A|+|B|-|A∩B| (arrays are distinct): one hash-set build per
    # pair instead of two
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.col("n_a") + F.col("n_b") - inter)
    return (
        df_pairs.join(a, "id_a").join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jac, 6).alias("jaccard"),
        )
    )


def minhash_dedup_pairs(
    df: DataFrame, text_col: str, id_col: str,
    threshold: float = 0.8, n: int = 3, k: int = 48, bands: int = 8,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates -> exact Jaccard verify ->
    pairs above threshold."""
    cands = minhash_lsh_candidates(df, text_col, id_col, n=n, k=k, bands=bands)
    verified = ngram_jaccard(cands, df, text_col, id_col, n=n)
    return verified.where(F.col("jaccard") >= threshold)


def minhash_dedup_pairs_staged(
    df: DataFrame, text_col: str, id_col: str, stage_path: str,
    threshold: float = 0.8, n: int = 3, k: int = 48, bands: int = 8,
) -> DataFrame:
    """minhash_dedup_pairs with the signature relation staged to the lake
    first: signatures compute once, land as parquet at `stage_path`, and
    both the banding join sides scan the staged copy (no recompute, no
    executor-cache leak). The staged file doubles as the oracle hook — an
    independent engine re-derives the same pairs from it."""
    sigs = staged_minhash_signatures(df, text_col, id_col, stage_path, n=n, k=k)
    cands = candidates_from_signatures(sigs, k=k, bands=bands)
    verified = ngram_jaccard(cands, df, text_col, id_col, n=n)
    return verified.where(F.col("jaccard") >= threshold)


# ----------------------------------------------------------------- simhash

def simhash_udf(n_bits: int = 64):
    """64-bit SimHash over word tokens as a vectorized pandas UDF — the
    bit-vote accumulation isn't expressible as array built-ins without an
    explode+64-way agg, so this is the honest Arrow-batched Python path
    (SURVEY.md §2.10: pandas_udf where built-ins genuinely can't)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        # blake2b, not Python hash(): deterministic across worker processes
        # (PYTHONHASHSEED varies), so signatures are reproducible run-to-run.
        def tok_hash(tok: str) -> int:
            return int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little"
            )

        out = np.zeros(len(texts), dtype=np.int64)
        positions = np.arange(n_bits, dtype=np.uint64)
        for i, t in enumerate(texts):
            tokens = set((t or "").lower().split())
            if not tokens:
                continue
            hashes = np.array([tok_hash(tok) for tok in tokens], dtype=np.uint64)
            # bit matrix: (tokens, bits) of 0/1 -> votes per bit
            bits = (hashes[:, None] >> positions[None, :]) & np.uint64(1)
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            sig = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(sig)
        return pd.Series(out)

    return _simhash


def simhash_signatures_jvm(
    df: DataFrame, text_col: str, id_col: str, n_bits: int = 64
) -> DataFrame:
    """(doc, sig long) — hybrid SimHash: token hashing stays JVM-side
    (xxhash64 per distinct word, codegen), the n_bits bit-vote reduction
    runs as ONE vectorized numpy kernel over each doc's hash list.

    Why hybrid: a pure-JVM formulation needs n_bits aggregate
    expressions whose whole-stage-codegen compile costs ~8 s per session
    (fine amortized over a 100 TB job, hostile to one-shot runs); pure
    pandas pays per-token Python hashing. Hashing in the JVM and voting
    in numpy avoids both. Deterministic (xxhash64, no PYTHONHASHSEED)."""
    words_df = df.select(
        F.col(id_col).alias("doc"),
        F.split(normalize_text(F.col(text_col)), " ").alias("w"),
    )
    tokens = words_df.select(
        "doc", F.explode(F.array_distinct("w")).alias("tok")
    ).select("doc", F.xxhash64("tok").alias("h"))
    hashes = tokens.groupBy("doc").agg(F.collect_list("h").alias("hs"))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.LongType())
    def _vote(hash_lists: pd.Series) -> pd.Series:
        positions = np.arange(n_bits, dtype=np.uint64)
        out = np.zeros(len(hash_lists), dtype=np.int64)
        weights = (np.uint64(1) << positions).astype(np.int64)
        for i, hs in enumerate(hash_lists):
            if hs is None or len(hs) == 0:
                continue
            arr = np.asarray(hs, dtype=np.int64).astype(np.uint64)
            bits = (arr[:, None] >> positions[None, :]) & np.uint64(1)
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            out[i] = weights[votes > 0].sum()
        return pd.Series(out)

    return hashes.select("doc", _vote(F.col("hs")).alias("sig"))


def staged_simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, path: str
) -> DataFrame:
    """SimHash signatures staged to the lake (see
    staged_minhash_signatures for why). The banding + hamming-verify
    downstream is pure integer algebra (shifts, xor, popcount) any engine
    can replicate over the staged file — which makes the pandas-UDF
    signature computation itself the only engine-specific stage."""
    stage_parquet(simhash_signatures_jvm(df, text_col, id_col), path)
    return df.sparkSession.read.parquet(path)


def simhash_pairs_from_signatures(
    sh: DataFrame, max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """Banding + exact-hamming verify over a precomputed (doc, sig)
    relation — factored out so it can run over staged signatures."""
    chunk_bits = 64 // bands
    mask = (1 << chunk_bits) - 1
    banded = sh.select(
        "doc",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("sig", b * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bc"),
    ).select("doc", "sig", "bc.band", "bc.chunk")
    pairs = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(
            F.col("x.doc").alias("id_a"),
            F.col("y.doc").alias("id_b"),
            F.bit_count(F.col("x.sig").bitwiseXOR(F.col("y.sig"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= max_hamming)


def simhash_dedup_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash + banding: split the 64-bit signature into
    `bands` chunks; pigeonhole — two signatures within `max_hamming` (<
    bands) share at least one exact chunk. Bucket-join on chunks, verify
    with popcount of XOR.

    Uncached by design: a cache registered here would never be
    unpersisted (see minhash_lsh_candidates) — the double-computed
    signature scan is the cheaper, leak-free trade; staged_simhash_
    signatures is the compute-once path."""
    sh = simhash_signatures_jvm(df, text_col, id_col)
    return simhash_pairs_from_signatures(sh, max_hamming=max_hamming, bands=bands)


# ------------------------------------------------ dedup clustering

def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
    max_iter: int = 20,
    max_driver_edges: int = 5_000_000,
) -> DataFrame:
    """(node, cluster_id) for every node in `pairs`, where cluster_id is
    the minimum node id of its connected component — turns near-dup PAIRS
    into dedup GROUPS (keep cluster_id, drop the rest).

    Iterative min-label propagation: each round every node takes the min
    of its own label and its neighbors' labels; converges in
    O(graph diameter) rounds (near-dup clusters are dense, so typically
    2-3). Each round is one self-join + groupBy keyed on node id —
    hash-partitioned, map-side-combined min; `localCheckpoint` truncates
    the lineage so round N's plan doesn't replay rounds 1..N-1 (the
    classic iterative-algorithm trap). Terminates early when a round
    changes nothing.

    Small-graph crossover (the ``batch_ivf_topk`` routing pattern):
    a graph of <= ``max_driver_edges`` distinct UNDIRECTED edges —
    probed and transferred in canonical (least, greatest) form, each
    edge once, via Arrow as two flat columns (~80 MB of longs at the
    default; the pair graph a VERIFIED near-dup stage emits is
    pairs-that-passed-a-threshold, orders of magnitude below the
    corpus) — resolves with union-find on the driver: the iterative
    loop's per-round job latency (profiled: ~6 s of pure scheduling
    for an 84k-edge graph) is the wrong tool below the crossover.
    Both paths return identical (node, min-member cluster_id) rows —
    pinned by test — and the probe costs ``limit(cap+1).count()`` on
    the materialized canonical relation, never a full count."""
    # materialize the directed pairs BEFORE any reuse: both the
    # canonicalization and (in the large case) the mirror re-consume
    # the relation, which would run the (expensive) upstream
    # pair-generation twice otherwise
    directed = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).localCheckpoint()
    # canonical UNDIRECTED edges (least, greatest) — each undirected
    # edge exactly once, so the crossover cap counts what the docstring
    # says it counts (the pre-fix probe counted the MIRRORED directed
    # relation, silently halving the effective capacity)
    undirected = directed.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
    ).distinct().localCheckpoint()

    from redshift_to_pendo_api_data_pipeline_spark.operators.routing import (
        within_driver_bound,
    )

    if within_driver_bound(undirected, int(max_driver_edges)):
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        # Arrow transfer (two flat columns), not collect(): 5M Row
        # objects would cost ~an order of magnitude more driver memory
        # than the two plain-value lists
        pdf = undirected.toPandas()
        for a, b in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comp: dict = {}
        for x in parent:
            comp.setdefault(find(x), []).append(x)
        rows = [
            (node, min(members))
            for members in comp.values()
            for node in members
        ]
        from pyspark.sql import types as T
        from redshift_to_pendo_api_data_pipeline_spark.operators.routing import (
            local_df,
        )

        node_t = undirected.schema["src"].dataType
        return local_df(
            pairs.sparkSession,
            rows,
            T.StructType([
                T.StructField("node", node_t, False),
                T.StructField("cluster_id", node_t, False),
            ]),
        )

    edges = undirected.union(
        undirected.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    ).distinct().localCheckpoint()

    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    def _prop(lbl: DataFrame) -> DataFrame:
        """One min-label step; extra columns on `lbl` ride through."""
        neigh = (
            edges.join(
                lbl.select("node", "label"),
                edges["dst"] == F.col("node"),
            )
            .groupBy("src").agg(F.min("label").alias("nlabel"))
        )
        carried = [c for c in lbl.columns if c not in ("label",)]
        return lbl.join(neigh, lbl["node"] == neigh["src"], "left").select(
            *carried,
            F.least(F.col("label"), F.coalesce("nlabel", "label"))
            .alias("label"),
        )

    # TWO propagation steps per checkpointed round: the loop's wall
    # cost on small graphs is per-JOB scheduling (plan + stage launch),
    # not compute — fusing two monotone steps into one materialization
    # halves the job count and reaches the same unique fixpoint (min
    # label per component). The change flag rides the same plan
    # (computed against the label BEFORE the double step), so the
    # convergence check is a narrow count over checkpointed blocks.
    for _ in range(max_iter):
        two = _prop(_prop(labels.withColumn("__old", F.col("label"))))
        new_labels = two.select(
            "node",
            "label",
            (F.col("label") != F.col("__old")).alias("__chg"),
        ).localCheckpoint()
        changed = new_labels.where(F.col("__chg")).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


# -------------------------------------------------- decontamination

def benchmark_contamination(
    corpus: DataFrame, eval_set: DataFrame, text_col: str, id_col: str,
    n: int = 8,
) -> DataFrame:
    """Training-data decontamination: flag corpus documents sharing any
    word n-gram with a benchmark/eval set. Returns (id, n_hits) where
    n_hits = number of DISTINCT eval n-grams the document contains.

    Scale design: the eval side (benchmarks are thousands of docs, not
    billions) collapses to a distinct-gram relation that Spark broadcasts,
    so the corpus side is one scan + explode with a broadcast hash join —
    no shuffle of corpus data. n=8 is the conventional contamination
    n-gram size; callers drop or quarantine flagged ids (anti-join with
    this result)."""
    corpus_grams = exploded_shingles(corpus, text_col, id_col, n=n)
    eval_grams = (
        exploded_shingles(eval_set, text_col, id_col, n=n)
        .select("sh").distinct()
    )
    return (
        corpus_grams.join(F.broadcast(eval_grams), "sh")
        .groupBy("doc")
        .agg(F.count_distinct("sh").alias("n_hits"))
        .select(F.col("doc").alias(id_col), "n_hits")
    )


# --------------------------------------- bloom-prefiltered membership

def bloom_gram_positions(
    grams: DataFrame, m: int, k: int, gram_col: str = "sh"
) -> DataFrame:
    """Distinct (seed, pos) Bloom positions of a gram relation: for each
    of k seeded xxhash64 family members, pos = hash(gram, seed) mod m.

    This is a Bloom filter realized relationally — the bit array becomes a
    distinct position table of AT MOST k*m rows no matter how large the
    corpus is, which is the whole point: at 100 TB the corpus's distinct
    n-gram set cannot broadcast, but a fixed-m position summary can
    (m = 1<<20, k = 4 is 8 MB of longs worst case). Building it is one
    map-side-combined distinct on a bounded keyspace — the shuffle carries
    <= k*m rows regardless of input size."""
    seeds = F.array(*[F.lit(i) for i in range(k)])
    return (
        grams.select(
            F.explode(seeds).alias("seed"),
            F.col(gram_col).alias("__g"),
        )
        .select("seed", F.pmod(F.xxhash64("__g", "seed"), F.lit(m)).alias("pos"))
        .distinct()
    )


def bloom_gram_membership(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    m: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Which incoming-batch documents share any word n-gram with a large
    corpus? Returns one row per batch doc: (id, shared_grams, is_hit).

    benchmark_contamination covers the small-side case (eval grams
    broadcast directly). Here NEITHER side is broadcastable — the corpus
    is the 100 TB training set — so the broadcastable summary is a Bloom
    position table (bloom_gram_positions, <= k*m rows). The pipeline:

      1. corpus grams -> (seed, pos) distinct summary, broadcast;
      2. batch grams probe it: a gram is a CANDIDATE iff all k of its
         positions hit (inner join + count == k — exactly mightContain);
      3. candidates verify exactly: the corpus gram stream joins the
         BROADCAST candidate set — the corpus is scanned but NEVER
         shuffled (no corpus-side distinct either: duplicate grams
         collapse in the bounded position-distinct and in the final
         count_distinct, so the raw explode feeds both consumers);
      4. left-join back onto the full batch id list so misses surface
         with shared_grams = 0.

    No false negatives (Bloom guarantee), so the result is EXACT
    membership — the oracle is a plain gram semi-join. At extreme scale
    step 3 can be skipped to accept the probabilistic verdict; the
    operator keeps the exact contract."""
    batch_grams = (
        exploded_shingles(batch, text_col, id_col, n=n)
        .groupBy("doc", "sh").agg(F.lit(1))
        .select("doc", "sh")
    )
    corpus_grams = exploded_shingles(corpus, text_col, id_col, n=n).select("sh")
    positions = bloom_gram_positions(corpus_grams, m=m, k=k)

    seeds = F.array(*[F.lit(i) for i in range(k)])
    probe = batch_grams.select(
        "doc", "sh", F.explode(seeds).alias("seed")
    ).withColumn("pos", F.pmod(F.xxhash64("sh", "seed"), F.lit(m)))
    candidates = (
        probe.join(F.broadcast(positions), ["seed", "pos"])
        .groupBy("doc", "sh")
        .agg(F.count(F.lit(1)).alias("__hits"))
        .where(F.col("__hits") == k)
        .select("doc", "sh")
    )
    verified = (
        corpus_grams.join(F.broadcast(candidates), "sh")
        .groupBy("doc")
        .agg(F.count_distinct("sh").alias("shared_grams"))
    )
    ids = batch.select(F.col(id_col).alias("doc")).distinct()
    return (
        # verified <= |batch| rows (the small incoming side by contract)
        ids.join(F.broadcast(verified), "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("shared_grams", F.lit(0)).cast("long").alias("shared_grams"),
            (F.col("shared_grams").isNotNull()).cast("int").alias("is_hit"),
        )
    )


# ------------------------------------------------------- embedding cosine

def embedding_neardup_pairs(
    df: DataFrame, vec_col: str, id_col: str, threshold: float = 0.95,
    n_blocks: int | None = None, target_block_rows: int = 8192,
) -> DataFrame:
    """Embedding near-dup: all pairs with cosine >= threshold.

    Exact and fully DISTRIBUTED — no driver collect, no full-matrix
    broadcast: the corpus splits into `n_blocks` id-hash blocks, each
    packed into one row; the B(B+1)/2 unordered block pairs come from two
    equi-joins against a tiny (b1, b2) key relation; one BLAS matmul per
    block pair scores it inside mapInPandas. Shuffle volume is each
    packed block replicated ~B times = O(N·B) vector rows; size n_blocks
    so a block (~N/B x dim doubles) stays an easy Arrow batch (≤64 MB).

    ``n_blocks=None`` (default) auto-sizes from the corpus: one cheap
    column-pruned count, then ``ceil(N / target_block_rows)`` clipped to
    [1, 64]. The fixed ``n_blocks=8`` default this replaces was the r5
    bench regression: at 2k vectors it meant 36 block-pair tasks, each
    Arrow-unpacking ~250x64 doubles for a matmul that takes microseconds
    — pure per-task overhead. Small corpora now collapse to ONE matmul
    task; callers at per-bucket-verify scale pass n_blocks explicitly to
    skip the count.

    O(N²) flops is inherent to EXACT all-pairs — at 100 TB this operator
    is the per-bucket verify stage after LSH bucketing
    (similarity.lsh_topk), not a whole-corpus pass."""
    spark = df.sparkSession
    if n_blocks is None:
        n = df.select(id_col).count()
        n_blocks = max(1, min(64, -(-n // target_block_rows)))
    packed = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_blocks))
            .cast("int")
            .alias("b"),
        )
        .groupBy("b")
        # one struct list, not parallel lists: two collect_lists in one agg
        # are not guaranteed element-aligned
        .agg(F.collect_list(F.struct("id", "v")).alias("pack"))
    )
    from redshift_to_pendo_api_data_pipeline_spark.operators.routing import (
        local_df,
    )

    pair_keys = local_df(
        spark,
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "b1 int, b2 int",
    )
    joined = (
        pair_keys.join(
            packed.select(
                F.col("b").alias("b1"), F.col("pack").alias("pack_a")
            ),
            "b1",
        )
        .join(
            packed.select(
                F.col("b").alias("b2"), F.col("pack").alias("pack_b")
            ),
            "b2",
        )
        .select("b1", "b2", "pack_a", "pack_b")
    )

    def _score(pdfs):
        for pdf in pdfs:
            for b1, b2, pack_a, pack_b in zip(
                pdf["b1"], pdf["b2"], pdf["pack_a"], pdf["pack_b"]
            ):
                ids_a = np.array([e["id"] for e in pack_a], dtype=np.int64)
                mat_a = np.array([list(e["v"]) for e in pack_a], dtype=np.float64)
                mat_a /= np.linalg.norm(mat_a, axis=1, keepdims=True)
                if b1 == b2:
                    ids_b, mat_b = ids_a, mat_a
                else:
                    ids_b = np.array([e["id"] for e in pack_b], dtype=np.int64)
                    mat_b = np.array(
                        [list(e["v"]) for e in pack_b], dtype=np.float64
                    )
                    mat_b /= np.linalg.norm(mat_b, axis=1, keepdims=True)
                sims = mat_a @ mat_b.T
                # pre-filter slightly below threshold so values that ROUND
                # up to the threshold survive to the rounded comparison
                ii, jj = np.nonzero(sims >= threshold - 1e-6)
                if len(ii) == 0:
                    continue
                a, bidx = ids_a[ii], ids_b[jj]
                if b1 == b2:
                    # same block holds both orientations of each pair (and
                    # the diagonal): keep each unordered pair once
                    keep = a < bidx
                else:
                    keep = np.ones(len(a), dtype=bool)
                out = pd.DataFrame(
                    {
                        "id_a": np.minimum(a[keep], bidx[keep]),
                        "id_b": np.maximum(a[keep], bidx[keep]),
                        "cosine": np.round(sims[ii, jj][keep], 6),
                    }
                )
                out = out[out["cosine"] >= threshold]
                if len(out):
                    yield out

    schema = "id_a long, id_b long, cosine double"
    return joined.mapInPandas(_score, schema=schema)


def candidates_between_signatures(
    sigs_new: DataFrame, sigs_corpus: DataFrame, k: int = 48, bands: int = 8
) -> DataFrame:
    """Asymmetric banded-LSH candidates: new-batch docs against an
    existing corpus's staged signatures — the incremental-ingest dedup
    shape (dedupe today's crawl against the lake without re-pairing the
    lake against itself). Join is new x corpus on (band, bucket): shuffle
    O(bands x (N_new + N_corpus)) band rows, and the corpus side never
    self-joins. Returns distinct (id_new, id_corpus)."""
    def banded(sigs: DataFrame, out: str) -> DataFrame:
        r = k // bands
        return sigs.select(
            F.col("doc").alias(out),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.hash(F.slice("sig", b * r + 1, r)).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select(out, "bb.band", "bb.bucket")

    return (
        banded(sigs_new, "id_new")
        .join(banded(sigs_corpus, "id_corpus"), ["band", "bucket"])
        .select("id_new", "id_corpus")
        .distinct()
    )


def incremental_minhash_neardup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    docs: DataFrame,
    text_col: str,
    id_col: str,
    stage_new: str,
    stage_corpus: str,
    threshold: float = 0.8,
    n: int = 3,
    k: int = 48,
    bands: int = 8,
) -> DataFrame:
    """Incremental near-dup: which new-batch documents duplicate the
    existing corpus. Both signature relations stage to the lake (the
    corpus side is written once per ingest in production and reused),
    asymmetric banding generates candidates, and the exact n-gram
    Jaccard verify runs only on candidate pairs. `docs` supplies text
    for the verify (superset of both sides). Returns
    (id_a=new, id_b=corpus, jaccard >= threshold)."""
    sn = staged_minhash_signatures(new_df, text_col, id_col, stage_new, n=n, k=k)
    sc = staged_minhash_signatures(
        corpus_df, text_col, id_col, stage_corpus, n=n, k=k
    )
    cands = candidates_between_signatures(sn, sc, k=k, bands=bands).select(
        F.col("id_new").alias("id_a"), F.col("id_corpus").alias("id_b")
    )
    verified = ngram_jaccard(cands, docs, text_col, id_col, n=n)
    return verified.where(F.col("jaccard") >= threshold)


def prefix_filtered_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    threshold: float = 0.5,
    n: int = 1,
    stage_path: str | None = None,
) -> DataFrame:
    """EXACT set-Jaccard self-join via prefix filtering (the
    SSJoin/PPJoin family) — same output as the blocked all-pairs form,
    but scale-safe: candidate generation is an inverted-index equi-join
    on rare prefix tokens instead of O(B^2) pairs per block. Token sets
    are single words (``n=1``) or word n-gram shingles (``n>1`` — the
    same sets MinHash signs, making this the exact ground truth for LSH
    recall audits).

    Theory: order every token set by a single global total order
    (ascending document frequency, token hash as tiebreak — rare first).
    For Jaccard >= t, a pair must overlap by at least ceil(t*max(|A|,|B|))
    tokens, so the intersection cannot hide entirely in the last
    ceil(t*n)-1 positions of either sorted set: any qualifying pair
    shares a token among each side's first n - ceil(t*n) + 1 tokens (its
    PREFIX). Indexing only prefixes keeps the join linear in corpus
    tokens, and frequency-ascending order puts the rarest tokens in
    prefixes, so per-token candidate lists stay small.

    Plan: one df-count shuffle (token), one rank join (token), one
    per-doc re-agg (doc), the prefix index join ((block, token) — high
    cardinality, partial-distinct candidates), and the exact
    array_intersect verify on candidates only, with the lossless
    size-band prune (t*|B| <= |A| <= |B|/t) applied before any array
    work. Every stage is linear or candidate-bounded; nothing is
    quadratic in block size.

    ``stage_path``: the frequency-sorted token-set relation (the SSJoin
    index) feeds FOUR plan branches (both prefix-index sides + both
    verify sides) — Spark re-executes the tokenize/df-rank/re-agg
    subtree per branch, so without staging the expensive part of the
    pipeline runs 4x. Passing a path materializes it ONCE and the four
    branches become four scans of a compact parquet (doc, blk, sorted
    token hashes, size) — the same stage-once/probe-many discipline as
    the signature families, and the artifact a production SSJoin keeps
    anyway."""
    per_doc = _ssjoin_index(df, text_col, id_col, block_col, n, stage_path)
    prefix_len = (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1).cast("int")
    pref = per_doc.select(
        "doc", "blk", "n", F.explode(F.slice("w", 1, prefix_len)).alias("tok")
    )
    a = pref.select(
        F.col("blk"), F.col("tok"),
        F.col("doc").alias("id_a"), F.col("n").alias("pn_a"),
    )
    b = pref.select(
        F.col("blk"), F.col("tok"),
        F.col("doc").alias("id_b"), F.col("n").alias("pn_b"),
    )
    cand = (
        a.join(b, ["blk", "tok"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("pn_a") >= F.lit(threshold) * F.col("pn_b"))
            & (F.col("pn_b") >= F.lit(threshold) * F.col("pn_a"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    wa = per_doc.select(
        F.col("doc").alias("id_a"), F.col("w").alias("w_a"), F.col("n").alias("n_a")
    )
    wb = per_doc.select(
        F.col("doc").alias("id_b"), F.col("w").alias("w_b"), F.col("n").alias("n_b")
    )
    inter = F.size(F.array_intersect("w_a", "w_b"))
    jac = inter / (F.col("n_a") + F.col("n_b") - inter)
    return (
        cand.join(wa, "id_a")
        .join(wb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def _ssjoin_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    n: int,
    stage_path: str | None,
) -> DataFrame:
    """The SSJoin index relation both exact set-similarity flavors
    (symmetric Jaccard, asymmetric containment) consume: per doc the
    frequency-ASCENDING sorted token-hash array + its size — (doc, blk,
    w, n). One df-count shuffle, one rank join, one per-doc re-agg;
    staged once when `stage_path` is given (the plan has four+ consumer
    branches per query, and multiple queries share the artifact)."""
    words_df = df.select(
        F.col(id_col).alias("doc"),
        F.col(block_col).alias("blk"),
        F.split(normalize_text(F.col(text_col)), " ").alias("w"),
    )
    units = F.col("w") if n == 1 else _grams_from_words(F.col("w"), n)
    toks = words_df.select(
        "doc",
        "blk",
        F.explode(
            F.array_distinct(F.transform(units, lambda x: F.xxhash64(x)))
        ).alias("tok"),
    )
    tok_df = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df_"))
    per_doc = (
        toks.join(tok_df, "tok")
        .groupBy("doc", "blk")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df_"), F.col("tok")))
            ).alias("ws")
        )
        .select(
            "doc",
            "blk",
            F.transform("ws", lambda x: x["tok"]).alias("w"),
            F.size("ws").alias("n"),
        )
    )
    if stage_path is not None:
        from redshift_to_pendo_api_data_pipeline_spark.staging import stage_parquet

        stage_parquet(per_doc, stage_path)
        per_doc = df.sparkSession.read.parquet(stage_path)
    return per_doc


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    threshold: float = 0.8,
    n: int = 1,
    stage_path: str | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup: containment C(A,B) = |A∩B| / min(|A|,|B|) —
    the subset/quote detector symmetric Jaccard structurally misses: a
    200-word quote inside a 5,000-word page has Jaccard ~0.04 but
    containment ~1.0. The dedup decision it feeds is 'drop the contained
    doc, keep the container' (round-7 family extension; Lee et al.'s
    dedup taxonomy separates exactly these two semantics).

    EXACT via the containment analog of prefix filtering: writing S for
    the smaller set, C >= t forces |S∩B| >= ceil(t·|S|), so the
    intersection cannot hide entirely in S's last ceil(t·|S|)-1
    frequency-ordered positions — S exposes a shared token among its
    first |S|-ceil(t·|S|)+1 (its prefix). Unlike the symmetric join, the
    CONTAINER side gets no size band and no prefix (that is the point),
    so candidates come from prefix(probe) ⋈ full-token index; probing
    every doc's prefix covers both roles of each pair. Shares the staged
    SSJoin index relation with prefix_filtered_jaccard_pairs
    (stage-once, two consumers).

    Returns (id_a < id_b, containment 6dp >= threshold). Scale: prefix
    length shrinks with t (at t=0.8 only ~20% of each doc's tokens are
    probed); all stages linear or candidate-bounded, same argument as
    the symmetric form (SCALE.md)."""
    per_doc = _ssjoin_index(df, text_col, id_col, block_col, n, stage_path)
    prefix_len = (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1).cast("int")
    pref = per_doc.select(
        "doc", "blk", F.explode(F.slice("w", 1, prefix_len)).alias("tok")
    )
    full = per_doc.select(
        "doc", "blk", F.explode("w").alias("tok")
    )
    a = pref.select("blk", "tok", F.col("doc").alias("id_a"))
    b = full.select("blk", "tok", F.col("doc").alias("id_b"))
    cand = (
        a.join(b, ["blk", "tok"])
        .where(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )
    wa = per_doc.select(
        F.col("doc").alias("id_a"), F.col("w").alias("w_a"), F.col("n").alias("n_a")
    )
    wb = per_doc.select(
        F.col("doc").alias("id_b"), F.col("w").alias("w_b"), F.col("n").alias("n_b")
    )
    inter = F.size(F.array_intersect("w_a", "w_b"))
    cont = inter / F.least("n_a", "n_b")
    return (
        cand.join(wa, "id_a")
        .join(wb, "id_b")
        .select("id_a", "id_b", F.round(cont, 6).alias("containment"))
        .where(F.col("containment") >= threshold)
    )


def editdist_pairs(
    df: DataFrame,
    col: str,
    max_dist: int = 2,
    block=None,
) -> DataFrame:
    """Character-level near-duplicate pairs by Levenshtein distance —
    the record-linkage primitive (fuzzy entity names, titles, URLs)
    that completes the dedup family: exact hash / token MinHash /
    SimHash / token Jaccard / embedding cosine are all TOKEN-or-vector
    level; typo-class duplicates ("blue wiget" vs "blue widget") need
    edit distance.

    THE scale move is running over the DISTINCT-value dictionary, not
    the row stream: real string columns are heavily repeated (TPC-H
    part names: 2000 rows, 64 distinct), so the dictionary groupBy
    collapses the corpus first and every downstream cost is
    dictionary-sized. Each pair carries both occurrence counts so the
    caller can weigh merge decisions.

    Candidate generation is BLOCKED (``block`` column expression,
    default: last whitespace token — entity-name convention where the
    head noun survives typos): the self-join runs per block key, one
    equi-join shuffle, |block|² levenshtein evaluations inside blocks
    only. Pairs straddling blocks are missed by design — the same
    honest prune contract as the LSH families (a fuzzier blocker =
    higher recall, bigger blocks). Levenshtein is evaluated JVM-side
    (F.levenshtein, codegen) and identically in DuckDB, so results
    hash-check cross-engine.

    Cost model at 100 TB: dictionary |D| ≪ rows; blocks of ~b rows →
    |D|·b levenshtein calls after the length prefilter
    (|len_a - len_b| ≤ max_dist, a free necessary condition checked
    before the O(n·m) distance)."""
    dic = df.groupBy(F.col(col).alias("name")).agg(
        F.count(F.lit(1)).alias("n")
    )
    blk = (
        block
        if block is not None
        else F.element_at(F.split(F.col("name"), " "), -1)
    )
    dic = dic.select("name", "n", blk.alias("__blk"))
    return editdist_pairs_from_dict(dic, max_dist)


def editdist_pairs_from_dict(dic: DataFrame, max_dist: int = 2) -> DataFrame:
    """The pairing half of `editdist_pairs`, over an ALREADY-BUILT
    (name, n, __blk) dictionary — split out so a blocker whose key only
    exists on the Spark side (e.g. `F.soundex`, absent from DuckDB) can
    STAGE the keyed dictionary to the lake and the oracle certifies
    everything downstream of the key from the identical staged relation
    (the HLL staged-hash trust model). Same length prefilter and JVM
    levenshtein as always.

    r8 s2 — LENGTH-BAND SUB-BLOCKING (the SCALE.md §10 watch item on
    part_golden_records: block-local dictionaries grow with the corpus,
    and the per-block self-join is quadratic in them): a pair within
    edit distance d satisfies |len_a - len_b| <= d, so with band =
    length div d the two names sit in the SAME or ADJACENT bands. The
    join therefore keys on (__blk, band) with the LEFT side offering
    bands {b-1, b, b+1} and the right side staying at {b}: every
    qualifying pair matches EXACTLY once (the right occurrence is
    unique per band, and only one of the left's three offers can equal
    it), no distinct needed, and the quadratic term drops from
    |block|^2 to ~3 * sum(|band|^2) — result-identical to the full
    per-block self-join (equivalence pinned by test)."""
    width = max(int(max_dist), 1)
    band = F.expr(f"CAST(length(name) AS BIGINT) div {width}")
    a = dic.select(
        F.col("name").alias("name_a"), F.col("n").alias("n_a"), "__blk",
        F.explode(F.array(band - 1, band, band + 1)).alias("__band"),
    )
    b = dic.select(
        F.col("name").alias("name_b"), F.col("n").alias("n_b"), "__blk",
        band.alias("__band"),
    )
    return (
        a.join(b, ["__blk", "__band"])
        .where(F.col("name_a") < F.col("name_b"))
        # length prefilter: a necessary condition costing O(1), before
        # the O(n*m) distance — standard edit-distance join prune
        .where(
            F.abs(F.length("name_a") - F.length("name_b")) <= max_dist
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist", "n_a", "n_b")
    )


def dup_size_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """Duplicate-cluster-size histogram: how many exact-duplicate
    clusters exist at each multiplicity — the corpus diagnostic read
    BEFORE committing an exact-dedup pass (a corpus whose mass sits in
    10k-copy boilerplate clusters needs different handling than one of
    singletons; cf. the cluster-size distributions in Lee et al. 2022's
    dedup analysis).

    Two map-side-combined shuffles, both tiny on the wire: digests
    (never text) to count cluster sizes, then sizes to histogram them —
    the second key's cardinality is O(log corpus) in practice (cluster
    sizes are heavy-tailed)."""
    sizes = (
        df.withColumn("__digest", F.md5(normalize_text(F.col(text_col))))
        .groupBy("__digest")
        .agg(F.count(F.lit(1)).alias("dup_count"))
    )
    return sizes.groupBy("dup_count").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.count(F.lit(1)) * F.col("dup_count")).alias("n_docs"),
    )


def exact_dedup_keep_best(
    df: DataFrame, text_col: str, id_col: str, score_col: str
) -> DataFrame:
    """Exact dedup with a KEEP-BEST policy: within each normalized-
    content duplicate cluster, survive the row with the highest
    ``score_col`` (quality score, recency, source priority — ties to
    the smallest id). The curation-grade sibling of exact_dedup's
    keep-min-id: when a document exists in both a curated source and a
    crawl, you keep the curated copy, not the lexicographically lucky
    one.

    Same scale contract: one digest-key exchange; shuffle rows carry
    (digest, id, score), never the text; the winner comes from a
    row_number window ordered (score DESC, id ASC) — an explicit total
    order both engines express identically (a bare max_by is
    tie-arbitrary) — and the window's rank-1 filter is
    WindowGroupLimit-bounded map-side."""
    w = Window.partitionBy("__digest").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__digest", F.md5(normalize_text(F.col(text_col))))
        .select("__digest", F.col(id_col), F.col(score_col))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "dup_count",
            F.count(F.lit(1)).over(Window.partitionBy("__digest"))
            .cast("long"),
        )
        .where(F.col("__rn") == 1)
        .select(F.col(id_col), "dup_count", F.col(score_col).alias("best_score"))
    )


def incremental_editdist_pairs(
    new_df: DataFrame,
    corpus_df: DataFrame,
    col: str,
    max_dist: int = 2,
    block=None,
) -> DataFrame:
    """Asymmetric NEW-BATCH × CORPUS edit-distance linkage — the
    incremental-ingest shape of ``editdist_pairs`` (same asymmetry as
    ``candidates_between_signatures`` for MinHash): each ingest batch
    fuzzy-matches against the standing corpus without the corpus ever
    self-joining, so the per-ingest cost is |new-dict| · block-width,
    amortizing to zero as the corpus grows.

    Both sides collapse to their DISTINCT-value dictionaries first
    (the editdist_pairs scale move), block on ``block`` (default: last
    whitespace token), length-prefilter, then verify with JVM
    levenshtein. Output: (name_new, name_corpus, dist, n_new,
    n_corpus) — all corpus-side candidates per new name, the merge
    decision is the caller's."""
    blk = (
        block
        if block is not None
        else F.element_at(F.split(F.col("name"), " "), -1)
    )
    new_dic = (
        new_df.groupBy(F.col(col).alias("name"))
        .agg(F.count(F.lit(1)).alias("n_new"))
        .select(
            F.col("name").alias("name_new"),
            "n_new",
            blk.alias("__blk"),
        )
    )
    corpus_dic = (
        corpus_df.groupBy(F.col(col).alias("name"))
        .agg(F.count(F.lit(1)).alias("n_corpus"))
        .select(
            F.col("name").alias("name_corpus"),
            "n_corpus",
            blk.alias("__blk"),
        )
    )
    return (
        new_dic.join(corpus_dic.hint("shuffle_hash"), "__blk")
        .where(
            F.abs(F.length("name_new") - F.length("name_corpus"))
            <= max_dist
        )
        .withColumn("dist", F.levenshtein("name_new", "name_corpus"))
        .where(F.col("dist") <= max_dist)
        .select("name_new", "name_corpus", "dist", "n_new", "n_corpus")
    )


def connected_components_star(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    (Kiveris et al., 'Connected Components in MapReduce and Beyond') —
    the scale-alternative to ``connected_components``' min-label
    propagation: label propagation needs O(graph diameter) rounds
    (fine for dense near-dup clusters, diameter 2–3; fatal for chain-
    shaped graphs — a path of 1M nodes is 1M rounds), while the star
    operations contract every component to a star rooted at its
    minimum in O(log²) rounds regardless of diameter.

    Per round (each one groupBy + a projection):
      large-star: every node attaches its STRICTLY-GREATER neighbors
        to min(N(u) ∪ {u});
      small-star: every node attaches its ≤ neighbors (and itself) to
        the minimum of that set.
    Both preserve connectivity and strictly shrink a potential
    function, so the edge relation reaches a fixpoint (a forest of
    stars); convergence is detected by an exact anti-join emptiness
    check (count equality alone can miss a same-size rewiring), and
    ``localCheckpoint`` truncates lineage per round. Output matches
    ``connected_components``: (node, cluster_id = component minimum) —
    property-tested equal on random graphs.
    """
    e = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # ---- large-star: (v, m_u) for v in N(u), v > u
        bid = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        m = bid.groupBy("u").agg(F.min("v").alias("__mv")).select(
            "u", F.least("__mv", "u").alias("m")
        )
        large = (
            bid.join(m.hint("shuffle_hash"), "u")
            .where(F.col("v") > F.col("u"))
            .select(
                F.least("v", "m").alias("a"),
                F.greatest("v", "m").alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        # ---- small-star: group u over its <= neighbors; attach them
        # (and u) to the minimum of the group
        bid2 = large.select(
            F.col("a").alias("u"), F.col("b").alias("v")
        ).unionAll(large.select(F.col("b").alias("u"), F.col("a").alias("v")))
        lesser = bid2.where(F.col("v") < F.col("u"))
        ms = lesser.groupBy("u").agg(F.min("v").alias("m"))
        attach_leaves = (
            lesser.join(ms.hint("shuffle_hash"), "u")
            .select(
                F.least("v", "m").alias("a"),
                F.greatest("v", "m").alias("b"),
            )
        )
        attach_self = ms.select(
            F.col("m").alias("a"), F.col("u").alias("b")
        )
        # lazy checkpoint: the convergence probe right below is the
        # round's first action and materializes the blocks; an eager
        # pin only added a third job per round (r11)
        nxt = (
            attach_leaves.unionByName(attach_self)
            .where(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # ONE symmetric-difference probe instead of two one-sided
        # anti-join jobs (r11): full-outer on the canonical edge key,
        # any row with either side missing means the edge sets differ.
        # Same exactness as the anti-join pair (count equality alone
        # would still miss a same-size rewiring).
        changed = (
            nxt.withColumn("__r", F.lit(1))
            .join(
                e.withColumn("__l", F.lit(1)), ["a", "b"], "full_outer"
            )
            .where(F.col("__l").isNull() | F.col("__r").isNull())
            .limit(1).count() > 0
        )
        e = nxt
        if not changed:
            break
    labels_nonroot = e.select(
        F.col("b").alias("node"), F.col("a").alias("cluster_id")
    )
    labels_root = e.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("cluster_id")
    )
    return labels_nonroot.unionByName(labels_root).groupBy("node").agg(
        F.min("cluster_id").alias("cluster_id")
    )


def oph_minhash_signatures(
    df: DataFrame, text_col: str, id_col: str,
    n: int = 3, k: int = 48, seed: int = 7, rot_c: int = 1_000_003,
) -> DataFrame:
    """One-Permutation Hashing MinHash signatures (Li, Owen & Zhang
    2012) with rotation densification (Shrivastava & Li 2014): ONE
    xxhash64 per shingle instead of k — the hash bill of the signature
    pass drops k-fold (at 100 TB the shingle stream dominates
    signature cost, so this is the cheap-signature production path;
    classic k-hash `minhash_signatures` remains the reference).

    Mechanics: the single 62-bit hash u splits into a bin (u mod k —
    which signature slot this shingle competes for) and a value
    (u div k — rank within the permutation); per-doc per-bin min gives
    k slots, and EMPTY bins (docs with < k shingles leave gaps)
    densify by borrowing the nearest non-empty slot to the right
    (cyclically), offset by t*rot_c per step so borrowed values don't
    spuriously collide across bins.

    Shape: one shingle explode, one (doc)-key combiner aggregate with
    k conditional mins (identical shuffle to the classic path), then
    the k^2-bounded densification runs rowside in codegen. Output
    (doc, sig array<long>) — drop-in for `candidates_from_signatures`.
    """
    exploded = exploded_shingles(df, text_col, id_col, n=n)
    prepared = exploded.select(
        "doc",
        F.xxhash64(F.lit(int(seed)), F.col("sh"))
        .bitwiseAND(F.lit((1 << 62) - 1)).alias("__u"),
    ).select(
        "doc",
        F.pmod(F.col("__u"), F.lit(int(k))).cast("int").alias("__bin"),
        F.expr(f"__u div {int(k)}").cast("long").alias("__val"),
    )
    mins = [
        F.min(F.when(F.col("__bin") == i, F.col("__val"))).alias(f"m{i}")
        for i in range(int(k))
    ]
    agg = prepared.groupBy("doc").agg(*mins)
    raw = F.array(*[F.col(f"m{i}") for i in range(int(k))])
    dens = F.expr(
        f"transform(sequence(0, {int(k) - 1}), i -> "
        f"aggregate(sequence(0, {int(k) - 1}), CAST(NULL AS BIGINT), "
        f"(acc, t) -> coalesce(acc, "
        f"try_element_at(__raw, pmod(i + t, {int(k)}) + 1)"
        f" + t * CAST({int(rot_c)} AS BIGINT))))"
    )
    return (
        agg.withColumn("__raw", raw)
        .select("doc", dens.alias("sig"))
    )


def oph_dedup_pairs_staged(
    df: DataFrame, text_col: str, id_col: str, stage_path: str,
    threshold: float = 0.8, n: int = 3, k: int = 48, bands: int = 8,
) -> DataFrame:
    """`minhash_dedup_pairs_staged` with OPH signatures: stage the
    densified one-permutation signatures, band them with the SAME
    `candidates_from_signatures`, verify with exact n-gram Jaccard —
    only the signature builder changed, everything downstream
    (banding algebra, verify, oracle trust model) is shared."""
    stage_parquet(
        oph_minhash_signatures(df, text_col, id_col, n=n, k=k), stage_path
    )
    sigs = df.sparkSession.read.parquet(stage_path)
    cands = candidates_from_signatures(sigs, k=k, bands=bands)
    verified = ngram_jaccard(cands, df, text_col, id_col, n=n)
    return verified.where(F.col("jaccard") >= threshold)
