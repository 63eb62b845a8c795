"""Similarity search over embedding columns (array<float>).

Two tiers (BASELINE.json north-star surface):

- brute-force cosine top-k — the exact baseline; dot products are pure
  JVM array expressions (zip_with/aggregate), ranking is a distributed
  top-k (TakeOrderedAndProject), so the only cost is one scan.
- hyperplane-LSH bucketed ANN — the 100 TB path: sign-of-projection bit
  signatures computed per row, candidates restricted to the query's bucket
  (and its 1-bit-flip neighbors for recall), exact re-rank inside the
  candidate set. Probing keys are a broadcast-sized list, so the scan
  prunes to matching buckets instead of cross-joining.

Hyperplanes are generated from a seeded RNG on the driver and inlined as
literals — deterministic, no state to ship.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(x):
    return F.sqrt(F.aggregate(x, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v))


def cosine_to_query(vec_col, query: list[float]):
    """Cosine similarity of each row's vector to a constant query vector,
    as a single JVM expression (no UDF, no shuffle)."""
    q = F.array(*[F.lit(float(v)) for v in query])
    return _dot(vec_col, q) / (_norm(vec_col) * _norm(q))


def brute_force_topk(
    df: DataFrame, vec_col: str, id_col: str, query: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k by cosine. orderBy+limit compiles to a distributed
    top-k; ties broken by id for determinism."""
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_to_query(F.col(vec_col), query), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplane_signature(vec_col, hyperplanes: list[list[float]]):
    """Sign-of-dot-product bit signature: bit_i = 1 if v·h_i > 0. Returns
    a long column (n_planes <= 63)."""
    bits = [
        F.when(_dot(vec_col, F.array(*[F.lit(float(x)) for x in h])) > 0, F.lit(1 << i))
        .otherwise(F.lit(0))
        for i, h in enumerate(hyperplanes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def make_hyperplanes(dim: int, n_planes: int = 12, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def lsh_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """ANN top-k via multi-table hyperplane LSH: `n_tables` independent
    signatures; a row is a candidate if it matches the query's bucket in
    ANY table (multiprobe: or any 1-bit flip of it). Exact cosine re-rank
    runs only on the candidate set.

    Scale path: the per-table bucket columns are computed in one scan
    (pure JVM expressions); at 100 TB you'd persist them once (bucketed
    parquet / Z-order) and each probe becomes a pruned scan. Candidate
    filtering is an OR of `bucket_t IN (probes_t)` literals — broadcast-
    free, shuffle-free; the only distributed op afterwards is top-k.

    Recall/pruning trade-off is (n_planes, n_tables, multiprobe):
    P(candidate) = 1-(1-p^b)^L with p = 1-θ/π. Near-duplicate queries
    (θ small) are recovered with high probability; for uniformly random
    data no ANN scheme prunes without recall loss.
    """
    # one (dim, n_tables*n_planes) plane matrix; per-row signatures for all
    # tables come from a single BLAS matmul inside an Arrow-batched pandas
    # UDF (32 interpreted per-row array folds -> one vectorized product)
    all_planes = []
    probe_sets: list[list[int]] = []
    for t in range(n_tables):
        planes = make_hyperplanes(len(query), n_planes, seed + 1000 * t)
        all_planes.extend(planes)
        qsig = 0
        for i, h in enumerate(planes):
            if sum(a * b for a, b in zip(query, h)) > 0:
                qsig |= 1 << i
        probe_sets.append(
            [qsig] + ([qsig ^ (1 << i) for i in range(n_planes)] if multiprobe else [])
        )
    plane_mat = np.array(all_planes, dtype=np.float64).T  # (dim, T*P)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def signatures(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = np.array([list(v) for v in vecs], dtype=np.float64)
        bits = (m @ plane_mat) > 0  # (rows, T*P)
        sigs = [
            bits[:, t * n_planes : (t + 1) * n_planes] @ weights
            for t in range(n_tables)
        ]
        stacked = np.stack(sigs, axis=1)  # (rows, T)
        return pd.Series(list(stacked))

    sigged = df.select(F.col(id_col), F.col(vec_col), signatures(F.col(vec_col)).alias("__sigs"))
    cond = None
    for t, probes in enumerate(probe_sets):
        c = F.element_at("__sigs", t + 1).isin(probes)
        cond = c if cond is None else (cond | c)
    cands = sigged.where(cond).select(id_col, vec_col)
    return brute_force_topk(cands, vec_col, id_col, query, k)
