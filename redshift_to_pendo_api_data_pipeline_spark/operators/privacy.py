"""Privacy auditing for training corpora and served extracts.

A pipeline that ships user-derived rows to an external analytics API
(the reference's whole purpose — tap-redshift -> target-pendo) needs a
release gate that answers: *can any row be re-identified from the
quasi-identifiers we kept?* The classical audit is k-anonymity
(Sweeney): every combination of quasi-identifier values must be shared
by at least k rows, else the rare combination pinpoints a person.
l-diversity strengthens it: within each quasi-identifier class the
SENSITIVE attribute must take at least l distinct values, else the
class leaks the sensitive value even when it is large.

Complements the regex-level scrub in ``text.redact_pii`` /
``text.pii_rate``: those find literal identifiers *inside free text*;
this module audits the *structured* columns that survive projection.

Scale shape (100 TB): both audits are a single hash-partitioned
groupBy on the quasi-identifier tuple — one shuffle, partial
aggregation map-side, output bounded by the number of distinct
quasi-identifier combinations (tiny by construction: that's what makes
them quasi-identifiers). No windows, no joins, no Python.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Equivalence-class audit: one row per distinct quasi-identifier
    combination with its class size and whether it violates k.

    NULL quasi values form their own class (groupBy semantics match
    SQL GROUP BY on both engines). ``at_risk`` marks classes smaller
    than k — the rows a release would have to suppress or generalize.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(F.count(F.lit(1)).alias("class_size"))
        .select(
            *quasi_cols,
            F.col("class_size").cast("long").alias("class_size"),
            (F.col("class_size") < k).cast("int").alias("at_risk"),
        )
    )


def k_anonymity_summary(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """The one-row go/no-go gate over :func:`k_anonymity_report`:
    total classes, violating classes, rows at risk, and the minimum
    class size (the corpus' actual k). Same single shuffle — the
    summary folds the bounded class table on the driver side of the
    plan, not by collecting it."""
    rep = k_anonymity_report(df, quasi_cols, k)
    return rep.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("at_risk").cast("long").alias("violating_classes"),
        F.sum(
            F.when(F.col("at_risk") == 1, F.col("class_size")).otherwise(0)
        ).cast("long").alias("rows_at_risk"),
        F.min("class_size").cast("long").alias("min_class_size"),
        F.sum("class_size").cast("long").alias("n_rows"),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l_threshold: int,
) -> DataFrame:
    """Distinct-l-diversity audit: per quasi-identifier class, the
    class size and the number of DISTINCT sensitive values; classes
    with fewer than ``l_threshold`` distinct sensitive values leak
    (homogeneity attack: a k-anonymous class where everyone shares the
    same diagnosis still reveals the diagnosis).

    countDistinct here is exact (the audit is a gate, not a dashboard)
    — Spark executes it as a two-phase expand/aggregate, still one
    logical shuffle keyed on the quasi tuple. NULL sensitive values do
    not count toward diversity (count(DISTINCT) skips NULLs on both
    engines)."""
    if l_threshold < 1:
        raise ValueError(f"l_threshold must be >= 1, got {l_threshold}")
    return (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(
            F.count(F.lit(1)).cast("long").alias("class_size"),
            F.countDistinct(F.col(sensitive_col)).cast("long").alias(
                "sensitive_diversity"
            ),
        )
        .select(
            *quasi_cols,
            "class_size",
            "sensitive_diversity",
            (F.col("sensitive_diversity") < l_threshold).cast("int").alias(
                "leaks"
            ),
        )
    )


def suppression_plan(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Rows that must be SUPPRESSED to make the release k-anonymous:
    the input filtered to rows whose quasi-identifier class is smaller
    than k. Shape: the class-size table (bounded) joins back to the
    corpus — a broadcast-eligible build side ONLY because it is
    filtered to violators first; the join key is the quasi tuple, and
    we leave the strategy to AQE rather than forcing broadcast (the
    violator set is small in healthy corpora but unbounded in
    principle — same rule as the curation funnel stages)."""
    violators = (
        k_anonymity_report(df, quasi_cols, k)
        .where(F.col("at_risk") == 1)
        .select(*quasi_cols)
    )
    return df.join(violators, on=list(quasi_cols), how="left_semi")


def deletion_cascade_audit(
    subjects: DataFrame,
    cascades: list[tuple[str, DataFrame, str]],
    subject_key: str,
) -> DataFrame:
    """Right-to-be-forgotten impact audit: given the data subjects to
    erase, count the rows each downstream table would lose — the
    pre-flight report a GDPR/CCPA deletion pipeline emits before it
    mutates anything. `cascades` is [(table_name, df, fk_col), ...];
    a cascade through an intermediate table (orders -> lineitem) is
    expressed by passing the already-semi-joined child relation.

    Shape: the subject-id relation is the SMALL side by construction
    (a deletion request batch), so every count is a broadcast
    left_semi join against the fact table — no fact-side shuffle at
    all; each table contributes one map-side-combined count. Results
    union into one (table_name, n_rows) report row per table."""
    ids = subjects.select(F.col(subject_key).alias("__sid")).distinct()
    out = None
    for name, df, fk in cascades:
        cnt = (
            df.join(
                F.broadcast(ids), df[fk] == ids["__sid"], "left_semi"
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
            .select(F.lit(name).alias("table_name"), "n_rows")
        )
        out = cnt if out is None else out.unionByName(cnt)
    return out


def t_closeness_emd(
    df: DataFrame,
    group_cols: Sequence[str],
    sensitive_col: str,
    order_col: str | None = None,
) -> DataFrame:
    """t-closeness audit — the third leg of the k-anonymity /
    l-diversity privacy trio: per quasi-identifier group, the Earth
    Mover's Distance between the group's ORDERED sensitive-attribute
    distribution and the global one (ordinal EMD = mean |cumulative
    difference|, normalized to [0,1] by m-1 steps).

    EXACT rational arithmetic: the per-step difference is held over
    the common denominator n_g·n (D_k = sum_{j<=k} (n_gj·n −
    n_j·n_g), a DECIMAL(38,0)), so emd_ppm = sum|D_k| · 1e6 div
    ((m−1)·n_g·n) is bit-reproducible. Everything past the one
    (group, sensitive) count agg runs on cell-bounded relations; the
    cumulative walks an ordered window partitioned by group over ≤m
    rows each."""
    from pyspark.sql import Window

    oc = order_col or sensitive_col
    cells = df.groupBy(
        *[F.col(c) for c in group_cols],
        F.col(sensitive_col).alias("__s"),
        F.col(oc).alias("__o") if oc != sensitive_col else F.col(
            sensitive_col
        ).alias("__o"),
    ).agg(F.count(F.lit(1)).alias("n_gs"))
    # complete the grid: every group x every sensitive value (absent
    # cells count 0 — EMD needs the full ordered support)
    groups = cells.groupBy(*group_cols).agg(
        F.sum("n_gs").cast("decimal(38,0)").alias("n_g")
    )
    svals = cells.select("__s", "__o").distinct()
    sglob = cells.groupBy("__s").agg(
        F.sum("n_gs").cast("decimal(38,0)").alias("n_s")
    )
    tot = cells.agg(
        F.sum("n_gs").cast("decimal(38,0)").alias("n"),
        F.countDistinct("__s").alias("m"),
    )
    grid = (
        groups.crossJoin(F.broadcast(svals))
        # grid x cells is big-big when the quasi-identifier has many
        # combos: shuffle-hash, never SMJ (r8 — this was the one
        # remaining SortMergeJoin in all 308 sf0.01 plans)
        .join(cells.drop("__o").hint("shuffle_hash"),
              [*group_cols, "__s"], "left")
        .join(F.broadcast(sglob), "__s")
        .crossJoin(F.broadcast(tot))
        .select(
            *group_cols, "__o", "n_g", "n", "m",
            (
                F.coalesce(F.col("n_gs"), F.lit(0)).cast("decimal(38,0)")
                * F.col("n")
                - F.col("n_s") * F.col("n_g")
            ).cast("decimal(38,0)").alias("d"),
        )
    )
    w = Window.partitionBy(*group_cols).orderBy(F.asc("__o")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = grid.withColumn(
        "cum_d", F.sum("d").over(w).cast("decimal(38,0)")
    )
    return stepped.groupBy(*group_cols).agg(
        F.first("n_g").cast("long").alias("n_group"),
        F.expr(
            "CAST(sum(abs(cum_d)) AS DECIMAL(38,0))"
            " * 1000000 div (CAST((first(m) - 1) AS DECIMAL(38,0))"
            " * first(n_g) * first(n))"
        ).cast("long").alias("emd_ppm"),
    )


def _geometric_half(key: Column) -> Column:
    """Geometric(1/2) sample (P(j) = 2^-(j+1), j >= 0) derived
    DETERMINISTICALLY from a key, integer-only: take 13 hex chars of
    md5 (a 52-bit uniform u), then j = 52 - bit_length(u). bit_length
    is computed as the length of the base-2 string (F.conv — the
    repo's lm.py integer-log idiom), so no floating log is involved
    and the DuckDB mirror (length(bin(u::UBIGINT))) is exact.
    u = 0 (probability 2^-52) maps to bit_length 1 like u = 1."""
    u_dec = F.conv(F.substring(F.md5(key), 1, 13), 16, 10)
    return (F.lit(52) - F.length(F.conv(u_dec, 10, 2))).cast("long")


def dp_histogram(
    df: DataFrame,
    group_col: str,
    salt: str,
) -> DataFrame:
    """Differentially-private release histogram: per-group counts with
    DISCRETE LAPLACE noise (Ghosh-Roughgarden-Sundararajan's geometric
    mechanism), the release gate a user-derived extract passes before
    leaving the warehouse (the reference ships per-visitor event rows
    to an external API; an aggregate release is the privacy-preserving
    alternative this engine adds).

    Noise = g1 - g2 with g1, g2 iid Geometric(1/2) — their difference
    is the two-sided geometric / discrete Laplace with alpha = 1/2,
    i.e. epsilon = ln 2 per unit sensitivity (one row changes one
    count by 1). The mechanism is real; the RANDOMNESS is a
    deterministic hash of (salt, group key) — the md5-derived-uniform
    convention every sampling operator in this repo uses — which makes
    the release reproducible run-to-run and lets the DuckDB oracle
    re-derive the identical noise (a seeded PRNG would certify
    nothing). The salt is REQUIRED — a public/default salt makes the
    noise recomputable by anyone and voids the epsilon = ln 2
    guarantee, so the API refuses to pick one for you: a production
    deployment passes a secret drawn per release; certification
    fixtures pass their pinned public salt knowingly.

    Integer-only end to end: the geometric magnitude comes from the
    bit-length of a 52-bit md5 uniform (no float log, no float
    inverse-CDF), so the noisy counts hash-check cross-engine. One
    map-side-combined groupBy; noise is a per-GROUP expression, so the
    shuffle carries raw partial counts and the noise never touches
    row-level data. Released counts are clamped at 0 (post-processing
    preserves DP). Only the noisy count is released — surfacing the
    true count or the noise beside it would void the guarantee."""
    key = F.col(group_col).cast("string")
    g1 = _geometric_half(F.concat(F.lit(salt + "|a|"), key))
    g2 = _geometric_half(F.concat(F.lit(salt + "|b|"), key))
    return (
        df.groupBy(F.col(group_col))
        .agg(F.count(F.lit(1)).cast("long").alias("__true"))
        .select(
            group_col,
            F.greatest(
                F.col("__true") + (g1 - g2), F.lit(0).cast("long")
            ).alias("dp_count"),
        )
    )
