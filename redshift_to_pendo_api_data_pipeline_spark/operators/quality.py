"""Declarative data-quality constraints (the Deequ/dbt-test family).

A 100 TB ingest needs machine-checkable contracts on every table it
lands: key uniqueness, completeness, value ranges, referential
integrity. Each constraint here compiles to ONE aggregate expression
over a single scan of the checked table (plus one broadcast-friendly
anti-join for referential checks), so a full constraint suite costs one
pass per table — never one job per rule.

Everything is exact integer arithmetic over counts: (constraint,
n_violations, n_checked) rows, hash-checkable against any SQL engine.

The reference has no quality layer (records that fail the remote API are
quarantined after the fact, __init__.py:482-520); this is north-star
surface for the lake the parquet sink writes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F


@dataclass
class Check:
    """One named constraint; ``agg`` yields (n_violations, n_checked)."""

    name: str
    violations: object  # Column: 1 if the row violates, else 0
    checked: object | None = None  # Column: 1 if the row is in scope


def not_null(col: str) -> Check:
    return Check(name=f"not_null({col})", violations=F.col(col).isNull())


def in_range(col: str, lo=None, hi=None) -> Check:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < F.lit(lo))
    if hi is not None:
        cond = cond | (F.col(col) > F.lit(hi))
    return Check(name=f"in_range({col})", violations=F.col(col).isNotNull() & cond)


def matches(col: str, regex: str) -> Check:
    return Check(
        name=f"matches({col})",
        violations=F.col(col).isNotNull() & ~F.col(col).rlike(regex),
    )


def accepted_values(col: str, values: list) -> Check:
    return Check(
        name=f"accepted_values({col})",
        violations=F.col(col).isNotNull()
        & ~F.col(col).isin([F.lit(v) for v in values]),
    )


@dataclass
class Suite:
    """A constraint suite over one table: row-level checks fold into ONE
    aggregation; uniqueness folds into the same pass via count-distinct;
    referential checks each add one anti-join agg (broadcast-eligible
    when the parent key side is dimension-sized)."""

    checks: list[Check] = field(default_factory=list)
    unique_keys: list[tuple[str, ...]] = field(default_factory=list)
    references: list[tuple[str, DataFrame, str]] = field(default_factory=list)

    def require(self, check: Check) -> "Suite":
        self.checks.append(check)
        return self

    def require_unique(self, *cols: str) -> "Suite":
        self.unique_keys.append(tuple(cols))
        return self

    def require_reference(
        self, col: str, parent: DataFrame, parent_col: str
    ) -> "Suite":
        """Referential integrity: every non-null ``col`` value exists in
        ``parent.parent_col``."""
        self.references.append((col, parent, parent_col))
        return self


def run_suite(df: DataFrame, suite: Suite) -> DataFrame:
    """Evaluate the suite: (constraint, n_violations, n_checked) rows,
    ordered by constraint name. One scan covers all row-level + unique
    checks; each referential check is one anti-join aggregate."""
    spark = df.sparkSession
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in suite.checks:
        aggs.append(
            F.sum(F.when(c.violations, 1).otherwise(0)).alias(f"__v_{c.name}")
        )
    for cols in suite.unique_keys:
        aggs.append(
            F.count_distinct(*[F.col(x) for x in cols]).alias(
                f"__d_{','.join(cols)}"
            )
        )
    row = df.agg(*aggs).first()
    n_rows = row["__n_rows"]
    out = []
    for c in suite.checks:
        out.append((c.name, int(row[f"__v_{c.name}"]), int(n_rows)))
    for cols in suite.unique_keys:
        dups = int(n_rows) - int(row[f"__d_{','.join(cols)}"])
        out.append((f"unique({','.join(cols)})", dups, int(n_rows)))
    for col, parent, parent_col in suite.references:
        orphans = (
            df.select(F.col(col)).where(F.col(col).isNotNull())
            .join(
                F.broadcast(parent.select(F.col(parent_col).alias(col)).distinct()),
                col,
                "left_anti",
            )
            .count()
        )
        out.append((f"references({col})", int(orphans), int(n_rows)))
    from redshift_to_pendo_api_data_pipeline_spark.operators.routing import (
        local_df,
    )

    return local_df(
        spark, sorted(out),
        "constraint string, n_violations long, n_checked long",
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Data-profiling analyzer (the Deequ-analyzer / dbt-docs shape):
    one long-form row per profiled column with exact row, null and
    distinct counts — the summary a pipeline operator reads before
    choosing join keys, partition columns or constraint thresholds.

    Scale design: everything folds into ONE aggregation over one scan.
    Multiple exact count_distincts plan through Catalyst's Expand (the
    data is replicated once per distinct-aggregate map-side, then
    partial-aggregated before the single shuffle) — at 100 TB with many
    profiled columns, switch the distinct counters to approx_count_
    distinct to drop the Expand multiplier; counts stay exact either
    way on nulls/rows. Output is all-BIGINT, so it hash-matches any
    engine bit-for-bit."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
        ]
    row = df.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col("__n").alias("n_rows"),
                    F.col(f"__null_{c}").cast("long").alias("n_null"),
                    F.col(f"__dist_{c}").alias("n_distinct"),
                )
                for c in cols
            ])
        ).alias("p")
    )
    return stacked.select("p.column", "p.n_rows", "p.n_null", "p.n_distinct")


def key_skew_report(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """Join-key skew diagnostic (round 7) — the check you run BEFORE
    shuffling 100 TB on a key: the top_n hottest key values with their
    row counts and basis-point share of the table. A key whose hottest
    value holds >1% of a 100 TB table means one reducer gets >1 TB —
    the signal to salt, AQE-skew-split, or broadcast the other side.

    One map-side-combined groupBy (the only shuffle carries one row per
    (task, key)), a window-total share in exact integer basis points,
    and a TakeOrderedAndProject top-n — no global sort, no Python.
    share_bp uses the table's total rows, computed in the same plan via
    a window over the grouped relation (one row per DISTINCT key — the
    bounded relation, never the raw stream)."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        counts.withColumn("__tot", F.sum("n").over(Window.partitionBy()))
        .select(
            "key", "n",
            # exact integer basis points (div, not float division+cast:
            # engines disagree on double->int rounding at boundaries)
            F.expr("(n * 10000) div __tot").alias("share_bp"),
        )
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(top_n)
    )


def histogram_fixed(
    df, value_col: str, lo: float, hi: float, n_bins: int
):
    """Equi-width histogram with EXPLICIT bounds — the one-pass
    profiling histogram (explicit bounds keep it a single scan and make
    the bucket function a pure literal expression; a min/max-derived
    histogram is two passes and its bucket edges drift with outliers).

    Bucket arithmetic is fixed-point integer: value and bounds in
    cents, bucket = (v_fp - lo_fp) * n_bins div (hi_fp - lo_fp),
    clamped into [0, n_bins-1] so out-of-range values land in the edge
    buckets (profiling semantics: you want to SEE the mass piling at
    an edge). NULLs are excluded. One groupBy on a <= n_bins keyspace,
    fully partial map-side.
    """
    from pyspark.sql import functions as F

    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    lo_fp = int(round(lo * 100))
    hi_fp = int(round(hi * 100))
    v_fp = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    raw = F.expr(
        f"(__v_fp - {lo_fp}L) * {int(n_bins)}L div {hi_fp - lo_fp}L"
    )
    bucket = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(int(n_bins) - 1).cast("long"), raw),
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(v_fp.alias("__v_fp"))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            (F.lit(lo_fp) + F.col("bucket")
             * F.lit((hi_fp - lo_fp)) / F.lit(int(n_bins)))
            .cast("long").alias("bucket_lo_fp"),
            "n",
        )
    )


def table_fingerprint(df, key_cols: list[str]):
    """Order-independent table fingerprint for sync reconciliation —
    the answer to "did every row land?" after a tap->sink run without
    hauling either table anywhere: row count + an order-independent
    content checksum (sum of the md5-derived 32-bit integer of the
    concatenated key columns, mod-free in BIGINT — sum is commutative,
    so partitioning/ordering can't change it) + per-key-column min/max
    BOUNDS. Run the same fingerprint on source and sink; equal rows
    means equal multiset of keys with overwhelming probability, and the
    bounds localize a mismatch to a key range for bisection.

    One aggregation pass, no shuffle beyond the final single-row
    combine; md5 is the repo's cross-engine hash (same hex in DuckDB),
    so the fingerprint itself is oracle-checkable.
    """
    from pyspark.sql import functions as F

    concat = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    h32 = F.conv(F.substring(F.md5(concat), 1, 8), 16, 10).cast("long")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(h32).cast("long").alias("checksum"),
    ]
    for c in key_cols:
        aggs.append(F.min(F.col(c).cast("string")).alias(f"min_{c}"))
        aggs.append(F.max(F.col(c).cast("string")).alias(f"max_{c}"))
    return df.agg(*aggs)


def contingency_chi2(
    df, group_col: str, flag_col, scale: int = 10**6
):
    """Chi-square independence screen for a (group x binary outcome)
    contingency table in FIXED-POINT arithmetic — "does conversion
    rate differ by segment, beyond what chance explains":

        chi2_scaled = sum over cells of (obs*G - row*col)^2 * scale
                        div (row * col * G)

    algebraically chi2 * G * scale with obs/expected cross-multiplied
    so no float division happens per cell (expected = row*col/G never
    materializes). Monotone in the true chi-square statistic at fixed
    G; compare against a threshold calibrated once per G. DECIMAL(38,0)
    keeps the squared products exact.

    Shape: one groupBy on the group key (2 cells per group), then the
    bounded cell relation folds to one row.
    """
    from pyspark.sql import functions as F

    cells = df.groupBy(F.col(group_col).alias("g")).agg(
        F.sum(flag_col.cast("long")).cast("long").alias("pos"),
        F.count(F.lit(1)).cast("long").alias("row_n"),
    )
    tot = cells.agg(
        F.sum("pos").cast("long").alias("col_pos"),
        F.sum("row_n").cast("long").alias("grand"),
    )
    with_tot = cells.crossJoin(F.broadcast(tot)).select(
        "g", "pos", "row_n", "col_pos",
        (F.col("grand") - F.col("col_pos")).alias("col_neg"),
        "grand",
        (F.col("row_n") - F.col("pos")).alias("neg"),
    )
    # all products in DECIMAL(38,0) (term² overflows int64), the final
    # floor-division via `div` (returns BIGINT — the quotient is
    # bounded by grand·scale, well inside int64; Spark div == DuckDB //
    # for positives). No decimal `/` anywhere: its rounding scale
    # differs between engines.
    staged = with_tot.select(
        "g", "pos", "row_n",
        (
            F.col("pos").cast("decimal(38,0)") * F.col("grand")
            - F.col("row_n").cast("decimal(38,0)") * F.col("col_pos")
        ).alias("tp"),
        (
            F.col("neg").cast("decimal(38,0)") * F.col("grand")
            - F.col("row_n").cast("decimal(38,0)") * F.col("col_neg")
        ).alias("tn"),
        (
            F.col("row_n").cast("decimal(38,0)") * F.col("col_pos")
            * F.col("grand")
        ).alias("dp"),
        (
            F.col("row_n").cast("decimal(38,0)") * F.col("col_neg")
            * F.col("grand")
        ).alias("dn"),
    )
    contrib = (
        F.expr(f"CAST(tp * tp * {int(scale)} AS DECIMAL(38,0)) div dp")
        + F.expr(f"CAST(tn * tn * {int(scale)} AS DECIMAL(38,0)) div dn")
    )
    return staged.select(
        "g", "pos", "row_n", contrib.cast("long").alias("chi2_contrib_fp")
    )


def orphan_audit(
    relations: list[tuple[str, "DataFrame", str, "DataFrame", str]],
) -> "DataFrame":
    """Referential-integrity orphan audit across declared FK
    relationships: for each (name, child, fk_col, parent, pk_col),
    count child rows whose FK value has no parent row — the
    'did the pipeline drop parents before children' data-contract
    check, one report row per relationship.

    Shape: each relationship is one left_anti join on the FK key; the
    parent side collapses to its DISTINCT key dictionary first (a
    dimension-sized relation), so AQE broadcasts it where it fits and
    the child never shuffles more than once. NULL FKs are counted
    separately (a NULL is 'unknown', not 'orphaned')."""
    from pyspark.sql import functions as F

    out = None
    for name, child, fk, parent, pk in relations:
        keys = parent.select(F.col(pk).alias("__pk")).distinct()
        nn = child.where(F.col(fk).isNotNull())
        row = (
            nn.join(keys, nn[fk] == keys["__pk"], "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
            .crossJoin(
                child.agg(
                    F.count(F.lit(1)).cast("long").alias("n_child_rows"),
                    F.sum(F.when(F.col(fk).isNull(), 1).otherwise(0))
                    .cast("long").alias("n_null_fk"),
                )
            )
            .select(
                F.lit(name).alias("relationship"),
                "n_child_rows", "n_null_fk", "n_orphans",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def corr_matrix_pearson(
    df: "DataFrame",
    cols: list[str],
) -> "DataFrame":
    """Pairwise Pearson correlation across a column list from ONE
    corpus pass: a single aggregation computes every column's sum,
    sum-of-squares and every pair's cross-product as exact
    DECIMAL(38,0) sufficient statistics; r itself is the one float
    step — num / sqrt(den_a * den_b) evaluated in DOUBLE on both
    engines with identical association, surfaced at round-6 (the
    tf-idf float discipline; an all-integer r^2 would need ~2x38
    digits and is infeasible in either engine's fixed decimal).

    Column pairs are enum-bounded by contract, so the post-agg pair
    expansion is driver-built column algebra over a 1-row relation —
    no second pass, no per-pair scans."""
    from pyspark.sql import functions as F

    base = df.select(
        *[F.col(c).cast("decimal(19,0)").alias(c) for c in cols]
    )
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c)).alias(f"s_{c}"))
        aggs.append(
            F.sum(F.col(c) * F.col(c)).cast("decimal(38,0)").alias(f"ss_{c}")
        )
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(
                F.sum(F.col(a) * F.col(b)).cast("decimal(38,0)")
                .alias(f"sp_{a}_{b}")
            )
    mom = base.agg(*aggs)
    rows = None
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            num = f"CAST(n * sp_{a}_{b} - s_{a} * s_{b} AS DOUBLE)"
            den_a = f"CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE)"
            den_b = f"CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE)"
            row = mom.select(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.expr(
                    f"round({num} / sqrt({den_a} * {den_b}), 6)"
                ).alias("pearson_r"),
            )
            rows = row if rows is None else rows.unionByName(row)
    return rows


def overdispersion_screen(
    df, group_col: str, count_col: str, scale: int = 10**6,
):
    """Index-of-dispersion screen per group: var/mean of a count
    series in fixed point — the 'is this actually Poisson' check run
    BEFORE anomaly thresholds assume variance == mean (ratio >> 1 =
    overdispersed/bursty: thresholds must widen; ~1 = Poisson-like).

    Exact integer sufficient statistics (same device as
    `corr_matrix_pearson`): with n, S = sum x, Q = sum x^2 per group,

        dispersion_fp = scale * (n*Q - S^2) div (S * (n-1))

    which is (sample variance / mean) * scale, cross-multiplied so no
    intermediate float or division-before-multiplication loss.
    Groups with n < 2 or S = 0 are emitted with NULL dispersion. One
    map-side-combined groupBy.

    Returns (group, n_obs, mean_fp, dispersion_fp).
    """
    from pyspark.sql import functions as F

    g = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(F.col(count_col).cast("long")).cast("long").alias("__s"),
        F.sum(
            F.col(count_col).cast("decimal(38,0)") * F.col(count_col)
        ).alias("__q"),
    )
    return g.select(
        "g", "n_obs",
        F.expr(
            f"CAST(CAST(__s AS DECIMAL(38,0)) * {int(scale)}"
            " AS DECIMAL(38,0)) div n_obs"
        ).cast("long").alias("mean_fp"),
        F.when(
            (F.col("n_obs") > 1) & (F.col("__s") > 0),
            F.expr(
                f"CAST((n_obs * CAST(__q AS DECIMAL(38,0))"
                f" - CAST(__s AS DECIMAL(38,0)) * __s) * {int(scale)}"
                " AS DECIMAL(38,0))"
                " div (CAST(__s AS DECIMAL(38,0)) * (n_obs - 1))"
            ),
        ).cast("long").alias("dispersion_fp"),
    )


def cramers_v_matrix(
    df, col_pairs: list, scale: int = 10**6
):
    """Cramér's V association matrix over categorical column PAIRS —
    the profiling step after `profile_columns`: which categorical
    columns carry the same information (V near 1 = redundant encode,
    near 0 = independent), read before feature selection or
    denormalization decisions.

    Per pair: the contingency cells (bounded by the cardinality
    product), marginals broadcast back, chi2 assembled with the
    cross-multiplied exact-integer device of `contingency_chi2`
    generalized to r x c:

        chi2_fp = sum (o*N - r*c)^2 * scale div (r*c*N)

    and V = sqrt(chi2 / (N*(min(R,C)-1))) with the one sqrt at the
    end. Returns (col_a, col_b, n, n_lo_card, chi2_fp, v_fp) — one
    row per pair, unioned across the bounded pair list.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    outs = []
    for ca, cb in col_pairs:
        cells = df.groupBy(
            F.col(ca).alias("__a"), F.col(cb).alias("__b")
        ).agg(F.count(F.lit(1)).cast("long").alias("__o"))
        ra = cells.groupBy("__a").agg(
            F.sum("__o").cast("long").alias("__ra"))
        cbm = cells.groupBy("__b").agg(
            F.sum("__o").cast("long").alias("__cb"))
        tot = cells.agg(
            F.sum("__o").cast("long").alias("__n"),
            F.count_distinct("__a").cast("long").alias("__ka"),
            F.count_distinct("__b").cast("long").alias("__kb"),
        )
        hyd = (
            cells.join(F.broadcast(ra), "__a")
            .join(F.broadcast(cbm), "__b")
            .crossJoin(F.broadcast(tot))
        )
        # chi2 = sum o^2/e - N (the sum-over-PRESENT-cells identity:
        # zero cells contribute nothing to sum o^2/e, so the groupBy's
        # missing zero cells are correct by construction — the naive
        # (o*N - r*c)^2 form silently undercounts them)
        contrib = F.expr(
            f"CAST(CAST(__o AS DECIMAL(38,0)) * __o * __n * {int(scale)}"
            " AS DECIMAL(38,0))"
            " div (CAST(__ra AS DECIMAL(38,0)) * __cb)"
        )
        folded = hyd.agg(
            F.max("__n").alias("n"),
            F.max(F.least(F.col("__ka"), F.col("__kb")))
            .alias("n_lo_card"),
            (F.sum(contrib)
             - F.max("__n").cast("decimal(38,0)") * int(scale))
            .cast("long").alias("chi2_fp"),
        )
        outs.append(folded.select(
            F.lit(ca).alias("col_a"), F.lit(cb).alias("col_b"),
            F.col("n").cast("long").alias("n"),
            F.col("n_lo_card").cast("long").alias("n_lo_card"),
            "chi2_fp",
            F.round(
                F.sqrt(
                    F.col("chi2_fp").cast("double") / float(scale)
                    / (F.col("n").cast("double")
                       * (F.col("n_lo_card").cast("double") - 1.0))
                ), 6
            ).alias("v_fp"),
        ))
    return reduce(lambda a, b: a.unionAll(b), outs)


def partial_corr(
    df, x_col: str, y_col: str, z_col: str, scale: int = 10**6
):
    """First-order partial correlation r_xy.z — 'does x relate to y
    once z is held fixed': the confounder screen run after the raw
    Pearson matrix flags a pair. All three pairwise correlations
    assemble from ONE pass of exact integer sufficient statistics
    (the `corr_matrix_pearson` device), then

        r_xy.z = (r_xy - r_xz*r_yz) / sqrt((1-r_xz^2)(1-r_yz^2))

    evaluates in doubles on those exact sums (deterministic: products
    and sqrts of identical doubles). Inputs must be pre-quantized
    integer columns. Returns one row
    (n, r_xy, r_xz, r_yz, r_xy_given_z) — all rounded 1e-6.
    """
    from pyspark.sql import functions as F

    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    folded = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d(x_col)).alias("sx"), F.sum(d(y_col)).alias("sy"),
        F.sum(d(z_col)).alias("sz"),
        F.sum(d(x_col) * F.col(x_col)).alias("sxx"),
        F.sum(d(y_col) * F.col(y_col)).alias("syy"),
        F.sum(d(z_col) * F.col(z_col)).alias("szz"),
        F.sum(d(x_col) * F.col(y_col)).alias("sxy"),
        F.sum(d(x_col) * F.col(z_col)).alias("sxz"),
        F.sum(d(y_col) * F.col(z_col)).alias("syz"),
    )

    def r(sab, sa, sb, saa, sbb):
        num = F.expr(f"CAST(CAST(n AS DECIMAL(38,0)) * {sab}"
                     f" - {sa} * {sb} AS DOUBLE)")
        da = F.expr(f"CAST(CAST(n AS DECIMAL(38,0)) * {saa}"
                    f" - {sa} * {sa} AS DOUBLE)")
        db = F.expr(f"CAST(CAST(n AS DECIMAL(38,0)) * {sbb}"
                    f" - {sb} * {sb} AS DOUBLE)")
        return num / F.sqrt(da * db)

    rxy = r("sxy", "sx", "sy", "sxx", "syy")
    rxz = r("sxz", "sx", "sz", "sxx", "szz")
    ryz = r("syz", "sy", "sz", "syy", "szz")
    part = (rxy - rxz * ryz) / F.sqrt(
        (F.lit(1.0) - rxz * rxz) * (F.lit(1.0) - ryz * ryz)
    )
    return folded.select(
        "n",
        F.round(rxy, 6).alias("r_xy"),
        F.round(rxz, 6).alias("r_xz"),
        F.round(ryz, 6).alias("r_yz"),
        F.round(part, 6).alias("r_xy_given_z"),
    )
