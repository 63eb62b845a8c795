"""Distribution-comparison statistics at corpus scale.

Rank/ECDF two-sample tests, multiple-testing control, and the
distributed (Poisson) bootstrap — the screens a data-pipeline team runs
before trusting that two sources, two arms, or two snapshots "look the
same". Everything is exact-integer up to the final (optional) z score:

- Mann-Whitney / Wilcoxon rank-sum via DOUBLED midranks so ties never
  leave the integers (midrank with ties is a half-integer; 2*midrank
  is not).
- Two-sample Kolmogorov-Smirnov via cross-multiplied ECDFs
  (cum1*n2 - cum2*n1, never a float division per value).
- Benjamini-Hochberg step-up over fixed-point p-values (integer
  compare p_fp * m <= alpha_fp * rank).
- Poisson bootstrap: the classic distributed bootstrap (per-row
  multinomial weights are not partition-computable; independent
  Poisson(1) weights are, and B replicates ride one scan).

Scale shape: both tests collapse the data to the DISTINCT-VALUE
relation first (one groupBy on the value), then take prefix sums via
``analytics.global_prefix_sum`` — range-repartitioned, two exchanges,
no single-reducer global window. The bootstrap is one map-side weight
draw + one B-bounded aggregate.

Reference parity: the reference pipeline has no statistics layer;
these extend the engine for training-data curation (source drift,
A/B screens at extraction boundaries). Fixed-point conventions follow
`quality.contingency_chi2` (`quality.py:274`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
    global_prefix_sum,
)

# Poisson(1) CDF thresholds scaled to 2^20 (floor(cdf * 2^20)): a
# uniform 20-bit hash draw u maps to weight w = #{thresholds <= u},
# giving P(w=k) = e^-1/k! exactly to 2^-20. Truncated at 8 (tail mass
# < 2^-19): the bias on a mean estimate is orders below the CI width.
_POISSON1_CDF_2_20 = [385749, 771499, 964373, 1028665, 1044738,
                      1047952, 1048488, 1048565]


def mann_whitney_u(
    df: DataFrame, group_col: str, value_col: str,
) -> DataFrame:
    """Two-sample Mann-Whitney rank-sum test, exact integers, one row.

    ``group_col`` must be 0/1 (the two samples); ``value_col`` an
    integer-comparable column. Returns
    ``(n1, n2, u2, tie_cubes, z_fp)`` where ``u2 = 2*U1`` (doubled so
    tied midranks stay integral), ``tie_cubes = sum(t^3 - t)`` over
    tied groups, and ``z_fp`` the normal-approximation z with tie
    correction, rounded at 1e-6 (one sqrt — IEEE-exact, so it hashes
    cross-engine like `wilson_ci_by_group`).

    Shape: groupBy(value) collapses the data to the distinct-value
    relation; `global_prefix_sum` (2 exchanges, no global window) gives
    cnt_less per value; one bounded fold produces the statistic. With
    doubled ranks: dr(v) = 2*cnt_less(v) + cnt(v) + 1 and
    2*R1 = sum(n1_v * dr(v)); U1 = R1 - n1(n1+1)/2 so
    u2 = 2*R1 - n1*(n1+1).
    """
    per_value = df.groupBy(F.col(value_col).alias("__v")).agg(
        F.count(F.lit(1)).cast("long").alias("__cnt"),
        F.sum(F.col(group_col).cast("long")).cast("long").alias("__n1v"),
    )
    with_cum = global_prefix_sum(per_value, ["__v"], "__cnt",
                                 prefix_name="__cum")
    folded = with_cum.agg(
        F.sum("__n1v").cast("long").alias("n1"),
        F.sum(F.col("__cnt") - F.col("__n1v")).cast("long").alias("n2"),
        F.sum(
            F.col("__n1v").cast("decimal(38,0)")
            * (2 * (F.col("__cum") - F.col("__cnt"))
               + F.col("__cnt") + 1)
        ).alias("__2r1"),
        F.sum(
            F.col("__cnt").cast("decimal(38,0)") * F.col("__cnt")
            * F.col("__cnt") - F.col("__cnt")
        ).cast("decimal(38,0)").alias("tie_cubes"),
    )
    n = F.col("n1") + F.col("n2")
    folded = folded.withColumn(
        "u2_d",
        F.col("__2r1") - F.col("n1").cast("decimal(38,0)")
        * (F.col("n1") + 1),
    )
    u2 = F.col("u2_d")
    # z = (U1 - n1 n2 / 2) / sqrt(n1 n2 / 12 * ((n+1) - tie/(n(n-1))))
    # evaluated as doubles only here, at the end, on already-exact
    # integer sufficient statistics; doubled numerator halves fold in.
    mean2 = F.col("n1").cast("double") * F.col("n2").cast("double")
    var4 = (
        mean2 / 3.0
        * ((n.cast("double") + 1.0)
           - F.col("tie_cubes").cast("double")
           / (n.cast("double") * (n.cast("double") - 1.0)))
    )
    z = (u2.cast("double") - mean2) / F.sqrt(var4)
    return folded.select(
        "n1", "n2",
        u2.cast("long").alias("u2"),
        F.col("tie_cubes").cast("long").alias("tie_cubes"),
        F.round(z, 6).alias("z_fp"),
        # Cliff's delta — the ordinal effect size the U statistic
        # already contains: delta = 2*U1/(n1*n2) - 1 = (u2 - n1*n2)
        # div-scaled; +1 = group1 stochastically dominates, 0 = none.
        F.expr(
            "CAST((CAST(u2_d AS DECIMAL(38,0)) - CAST(n1 AS"
            " DECIMAL(38,0)) * n2) * 1000000 AS DECIMAL(38,0))"
            " div (CAST(n1 AS DECIMAL(38,0)) * n2)"
        ).cast("long").alias("cliffs_delta_fp"),
    )


def ks_two_sample(
    df: DataFrame, group_col: str, value_col: str, scale: int = 10**6,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D statistic, exact integers.

    D = max over values of |F1(v) - F2(v)|, computed as the integer
    max of |cum1*n2 - cum2*n1| (cross-multiplied — no per-value float
    division) and reported both raw (``d_num``) and as
    ``d_fp = d_num * scale div (n1*n2)``.

    One prefix pass covers BOTH cumulative counts: the per-value
    (cnt1, cnt2) pair packs into a single long ``cnt1 * 2^31 + cnt2``
    (each cumulative count is bounded by the sample size < 2^31), the
    prefix sum distributes over the packing, and div/mod unpack —
    halving the exchanges vs two prefix passes.
    """
    pack = F.lit(1 << 31)
    per_value = df.groupBy(F.col(value_col).alias("__v")).agg(
        (F.sum(F.col(group_col).cast("long")) * pack
         + F.sum(F.lit(1) - F.col(group_col).cast("long"))
         ).cast("long").alias("__packed"),
    )
    with_cum = global_prefix_sum(per_value, ["__v"], "__packed",
                                 prefix_name="__cumpk")
    unpacked = with_cum.select(
        F.expr("__cumpk div %d" % (1 << 31)).alias("__cum1"),
        F.expr("__cumpk %% %d" % (1 << 31)).alias("__cum2"),
    )
    # max|cum1*n2 - cum2*n1| needs n1, n2 first: broadcast the 1-row
    # totals back over the distinct-value relation (scalar crossJoin,
    # same shape as contingency_chi2's grand-total hydration).
    totals = unpacked.agg(
        F.max("__cum1").cast("long").alias("n1"),
        F.max("__cum2").cast("long").alias("n2"),
    )
    d = unpacked.crossJoin(F.broadcast(totals)).agg(
        F.max("n1").alias("n1"), F.max("n2").alias("n2"),
        F.max(
            F.abs(F.col("__cum1").cast("decimal(38,0)") * F.col("n2")
                  - F.col("__cum2").cast("decimal(38,0)") * F.col("n1"))
        ).alias("d_num"),
    )
    return d.select(
        "n1", "n2",
        F.col("d_num").cast("long").alias("d_num"),
        F.expr(
            "CAST(CAST(d_num AS DECIMAL(38,0)) * %d "
            "div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)" % int(scale)
        ).alias("d_fp"),
    )


def bh_fdr(
    df: DataFrame, key_col: str, p_fp_col: str,
    alpha_fp: int = 50000, scale: int = 10**6,
) -> DataFrame:
    """Benjamini-Hochberg step-up over fixed-point p-values.

    Tests ranked ascending by (p_fp, key); the BH frontier is the
    largest rank i with p_(i) <= alpha * i / m, evaluated as the exact
    integer comparison ``p_fp * m <= alpha_fp * i`` (both sides at the
    same ``scale``); every test at rank <= frontier is rejected.

    The ranking window is M-BOUNDED — m is the number of TESTS (one
    per segment/hypothesis), not the number of rows the tests were
    computed from, so the single-partition window is bounded by
    construction (same contract as `neyman_allocation`'s seat window).
    """
    m_tot = df.agg(F.count(F.lit(1)).cast("long").alias("__m"))
    w = Window.orderBy(F.col(p_fp_col).asc(), F.col(key_col).asc())
    ranked = (
        df.crossJoin(F.broadcast(m_tot))
        .withColumn("__rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "__hit",
            (F.col(p_fp_col).cast("decimal(38,0)") * F.col("__m")
             <= F.lit(int(alpha_fp)).cast("decimal(38,0)")
             * F.col("__rank")).cast("int"),
        )
    )
    frontier = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("__hit") == 1, F.col("__rank"))), F.lit(0)
        ).cast("long").alias("__frontier")
    )
    return (
        ranked.crossJoin(F.broadcast(frontier))
        .select(
            F.col(key_col),
            F.col(p_fp_col),
            F.col("__rank").alias("p_rank"),
            (F.col("__rank") <= F.col("__frontier"))
            .cast("int").alias("rejected"),
        )
    )


def poisson_bootstrap_weights(
    df: DataFrame, id_col: str, n_reps: int, seed: int = 41,
) -> DataFrame:
    """Per-(row, replicate) Poisson(1) bootstrap weights, map-side.

    The distributed bootstrap: exact multinomial resampling needs the
    global row count per draw, but independent Poisson(1) weights give
    each replicate a resample whose composition converges to the
    multinomial one (sum of weights concentrates at n) and are
    computable per-row from a hash — no coordination, no second scan.
    Emits ``(id, rep, w)`` with w > 0 only (zero-weight rows carry
    nothing through the weighted aggregate and are dropped early —
    ~37% of the exploded relation never shuffles).

    Weight draw: u = 20 low bits of xxhash64(id, rep, seed); w =
    #{cdf thresholds <= u} with Poisson(1) CDF thresholds at 2^-20
    resolution (`_POISSON1_CDF_2_20`).
    """
    u = F.pmod(
        F.xxhash64(F.col(id_col), F.col("rep"), F.lit(int(seed))),
        F.lit(1 << 20),
    )
    w = sum(
        (u >= F.lit(t)).cast("int") for t in _POISSON1_CDF_2_20
    )
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(1), F.lit(int(n_reps)))
            ).alias("rep"),
        )
        .withColumn("w", w.cast("long"))
        .where(F.col("w") > 0)
    )


def bootstrap_mean_ci(
    values: DataFrame, weights: DataFrame, id_col: str, value_col: str,
    n_reps: int, lo_ppm: int = 25000, hi_ppm: int = 975000,
    scale: int = 10**6,
) -> DataFrame:
    """Percentile-bootstrap CI of the mean from staged Poisson weights.

    ``weights`` is the (id, rep, w) relation (usually staged so the
    oracle reads the identical draws). Each replicate's weighted mean
    is the exact integer ``scale * sum(w*x) div sum(w)``; the CI is
    the nearest-rank [lo_ppm, hi_ppm] percentile pair over the
    B-bounded replicate-mean relation (B rows — the ranking window is
    bounded by the replicate count, never by data). Rank positions
    come from the ACTUAL replicate count, not the ``n_reps``
    parameter, so a missing replicate (all-zero Poisson weights, or
    staged weights that don't match ``values``) shifts the ranks
    correctly and shows up as ``n_reps < parameter`` in the output
    instead of silently emitting NULL bounds.

    One hash-join of weights to values (both sides big: shuffle on
    id), one B-bounded aggregate keyed by rep with map-side combine,
    one B-row fold. Returns a single row
    ``(n_reps, mean_fp, ci_lo_fp, ci_hi_fp)`` with the full-sample
    mean alongside the interval.
    """
    joined = weights.join(
        values.select(F.col(id_col), F.col(value_col).alias("__x")),
        id_col,
    )
    rep_means = joined.groupBy("rep").agg(
        F.expr(
            "CAST(CAST(%d AS DECIMAL(38,0)) * sum(CAST(w AS DECIMAL(38,0))"
            " * __x) div sum(CAST(w AS DECIMAL(38,0))) AS BIGINT)"
            % int(scale)
        ).alias("__mean_fp")
    )
    # nearest-rank positions derive from the ACTUAL replicate count
    # (a B-bounded window over rep_means), not the n_reps parameter:
    # a replicate whose Poisson weights are all zero (or staged
    # weights not matching values) leaves rep_means short, and ranks
    # computed from the parameter would then silently return NULL or
    # percentile-shifted bounds (r8 ADVICE). n_reps in the output is
    # the actual count, so a short run is visible to the caller.
    w_rank = Window.orderBy(F.col("__mean_fp").asc(), F.col("rep").asc())
    w_all = w_rank.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        rep_means.withColumn("__r", F.row_number().over(w_rank))
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
    )
    lo_rank = F.expr(
        "GREATEST(CAST(1 AS BIGINT),"
        f" (__n * {int(lo_ppm)} + 999999) DIV 1000000)"
    )
    hi_rank = F.expr(
        "GREATEST(CAST(1 AS BIGINT),"
        f" (__n * {int(hi_ppm)} + 999999) DIV 1000000)"
    )
    ci = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_reps"),
        F.max(F.when(F.col("__r") == lo_rank, F.col("__mean_fp")))
        .cast("long").alias("ci_lo_fp"),
        F.max(F.when(F.col("__r") == hi_rank, F.col("__mean_fp")))
        .cast("long").alias("ci_hi_fp"),
    )
    full = values.agg(
        F.expr(
            "CAST(CAST(%d AS DECIMAL(38,0)) * sum(CAST(%s AS"
            " DECIMAL(38,0))) div count(*) AS BIGINT)"
            % (int(scale), value_col)
        ).alias("mean_fp")
    )
    return ci.crossJoin(F.broadcast(full)).select(
        "n_reps", "mean_fp", "ci_lo_fp", "ci_hi_fp"
    )


def quantile_normalize(
    df: DataFrame, group_col: str, value_col: str, id_col: str,
) -> DataFrame:
    """Quantile normalization across groups: each row's value is
    replaced by the POOLED distribution's value at the row's
    within-group percentile — after which every group has (up to rank
    granularity) the same marginal distribution. The cross-source
    score-alignment step before comparing or thresholding quality
    scores mined from differently-calibrated sources (the genomics
    microarray technique, applied to corpus curation).

    Exact integer mapping: within-group rank r of n_g maps to pooled
    index ceil((r - 1/2)/n_g * N) — computed as
    ``((2r-1)*N + 2n_g - 1) div (2n_g)``, clamped to [1, N] — and a
    hash join on the index fetches the pooled value. Within-group
    ranks are partitioned windows (per-group, parallel); the pooled
    rank comes from `global_ranks` (range shuffle, offsets broadcast,
    no single-reducer window). Output: (id, group, value, qn_value).
    """
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        global_ranks,
    )

    w_g = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    ranked = df.select(
        F.col(id_col), F.col(group_col), F.col(value_col),
        F.row_number().over(w_g).cast("long").alias("__r"),
    )
    sizes = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("__ng")
    )
    pooled = global_ranks(
        df.select(F.col(value_col).alias("__pv"), F.col(id_col).alias("__pi")),
        ["__pv", "__pi"], rank_name="__gr", keep_total=True,
    ).select("__gr", "__pv", F.col("__total").alias("__n"))
    n_tot = pooled.agg(F.max("__n").cast("long").alias("__n"))
    with_idx = ranked.join(F.broadcast(sizes), group_col).crossJoin(
        F.broadcast(n_tot)
    ).select(
        id_col, group_col, value_col,
        F.greatest(
            F.lit(1).cast("long"),
            F.least(
                F.col("__n"),
                F.expr(
                    "CAST(CAST(2 * __r - 1 AS DECIMAL(38,0)) * __n"
                    " + 2 * __ng - 1 AS DECIMAL(38,0)) div (2 * __ng)"
                ).cast("long"),
            ),
        ).alias("__idx"),
    )
    return with_idx.join(
        pooled.select(F.col("__gr").alias("__idx"),
                      F.col("__pv").alias("qn_value")).hint("shuffle_hash"),
        "__idx",
    ).select(id_col, group_col, value_col, "qn_value")


def eb_shrunk_rates(
    df: DataFrame, group_col: str, flag_col: str, pseudo_n: int = 200,
    scale: int = 10**6,
) -> DataFrame:
    """Empirical-Bayes (Beta-prior) shrinkage of per-group rates — the
    small-sample fix for ranking groups by a rate: raw rates from tiny
    groups swing to 0%/100% and dominate leaderboards; shrinking each
    toward the GLOBAL rate with a ``pseudo_n``-strength prior

        shrunk = (pos + m * global_rate) / (n + m)
               = (pos*N + m*R) / (N * (n + m))        [exact rational]

    keeps the estimate honest until the group earns its evidence
    (m = pseudo_n observations' worth of prior). The fixed-point form
    is the right-hand rational cross-multiplied, one floor-div, no
    float rate anywhere.

    One group-key combiner aggregate + one scalar crossJoin. Returns
    (group, n, pos, raw_fp, shrunk_fp).
    """
    cells = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(flag_col).cast("long")).cast("long").alias("pos"),
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("__nn"),
        F.sum("pos").cast("long").alias("__rr"),
    )
    m = int(pseudo_n)
    return cells.crossJoin(F.broadcast(tot)).select(
        "g", "n", "pos",
        F.expr(
            f"CAST(CAST(pos AS DECIMAL(38,0)) * {int(scale)}"
            " AS DECIMAL(38,0)) div n"
        ).cast("long").alias("raw_fp"),
        F.expr(
            f"CAST((CAST(pos AS DECIMAL(38,0)) * __nn + {m} * __rr)"
            f" * {int(scale)} AS DECIMAL(38,0))"
            f" div (CAST(__nn AS DECIMAL(38,0)) * (n + {m}))"
        ).cast("long").alias("shrunk_fp"),
    )


def cochran_armitage_trend(
    df: DataFrame, score_col: str, flag_col: str,
) -> DataFrame:
    """Cochran-Armitage test for TREND in rates across ordered groups
    — the directional upgrade of the chi-square screen: 'does the
    return rate RISE with discount level', one tail, one degree of
    freedom. With bin scores s_i, sizes n_i, successes r_i, totals
    (N, R):

        T   = sum s_i * r_i - (sum s_i * n_i) * R / N
        Var = (R/N)(1 - R/N) * [sum s_i^2 n_i - (sum s_i n_i)^2 / N]

    Both are assembled from exact integer sufficient statistics
    cross-multiplied by N (t_num = N*sum(s r) - sum(s n)*R etc.), and
    the single z = T/sqrt(Var) evaluates in doubles at the very end —
    deterministic (one IEEE sqrt, round 1e-6). Returns one row
    (n_bins, n_total, pos_total, t_num, z_fp) where t_num = N*T.

    Shape: one score-key combiner aggregate (bin-bounded) + one fold.
    """
    cells = df.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(flag_col).cast("long")).cast("long").alias("r"),
    )
    folded = cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum("n").cast("long").alias("__nn"),
        F.sum("r").cast("long").alias("__rr"),
        F.sum(F.col("s").cast("decimal(38,0)") * F.col("r")).alias("__sr"),
        F.sum(F.col("s").cast("decimal(38,0)") * F.col("n")).alias("__sn"),
        F.sum(
            F.col("s").cast("decimal(38,0)") * F.col("s") * F.col("n")
        ).alias("__ssn"),
    )
    t_num = F.expr("CAST(__nn AS DECIMAL(38,0)) * __sr - __sn * __rr")
    # Var * N^3 = R*(N-R) * (N*ssn - sn^2)  — z = T/sqrt(Var) and
    # T = t_num/N, so z = t_num / sqrt(N * R*(N-R) * (N*ssn - sn^2) / N^2)
    # ... assembled in doubles from the exact integer pieces below.
    var_core = F.expr(
        "CAST(CAST(__nn AS DECIMAL(38,0)) * __ssn - __sn * __sn"
        " AS DECIMAL(38,0))"
    )
    z = (
        t_num.cast("double")
        / F.sqrt(
            F.col("__rr").cast("double")
            * (F.col("__nn") - F.col("__rr")).cast("double")
            / F.col("__nn").cast("double")
            * var_core.cast("double")
        )
    )
    return folded.select(
        "n_bins",
        F.col("__nn").alias("n_total"),
        F.col("__rr").alias("pos_total"),
        t_num.cast("long").alias("t_num"),
        F.round(z, 6).alias("z_fp"),
    )


def spearman_rho(
    df: DataFrame, x_col: str, y_col: str,
) -> DataFrame:
    """Spearman rank correlation — Pearson over midranks, the
    outlier-proof monotonic-association screen. DOUBLED midranks (the
    `mann_whitney_u` device) keep every sufficient statistic exactly
    integral even under heavy ties; the single sqrt-and-divide
    evaluates in doubles at the very end (IEEE-deterministic, round
    1e-6).

    Shape: each variable collapses to its DISTINCT-VALUE relation
    (combiner groupBy), takes a prefix pass (`global_prefix_sum`,
    checkpoint-pinned) to derive the doubled midrank per value, and
    joins back value->rank (big-big on the value key, shuffle_hash —
    the dictionary side is distinct-value-sized). One fold computes

        rho = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2))

    over the doubled ranks (the doubling cancels). Returns one row
    (n, rho_fp).
    """
    def doubled_ranks(col: str, out: str) -> DataFrame:
        per_v = df.groupBy(F.col(col).alias("__v")).agg(
            F.count(F.lit(1)).cast("long").alias("__cnt")
        )
        cum = global_prefix_sum(per_v, ["__v"], "__cnt",
                                prefix_name="__cum")
        return cum.select(
            F.col("__v").alias(col),
            (2 * (F.col("__cum") - F.col("__cnt"))
             + F.col("__cnt") + 1).cast("long").alias(out),
        )

    rx = doubled_ranks(x_col, "__rx")
    ry = doubled_ranks(y_col, "__ry")
    # width pins (SCALE.md AQE compute-amplification trap): both
    # rank-hydration exchanges are byte-small (two long columns), so
    # AQE coalesces the join+DECIMAL(38,0)-fold stages to 3-4 tasks;
    # user-pinned repartitions on the join keys are AQE-exempt and add
    # no exchange (each IS the exchange the shuffle_hash join needs)
    par = df.sparkSession.sparkContext.defaultParallelism
    ranked = (
        df.select(x_col, y_col)
        .repartition(par, x_col)
        .join(rx.hint("shuffle_hash"), x_col)
        .repartition(par, y_col)
        .join(ry.hint("shuffle_hash"), y_col)
    )
    folded = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__rx").cast("decimal(38,0)").alias("__sx"),
        F.sum("__ry").cast("decimal(38,0)").alias("__sy"),
        F.sum(F.col("__rx").cast("decimal(38,0)") * F.col("__rx"))
        .alias("__sxx"),
        F.sum(F.col("__ry").cast("decimal(38,0)") * F.col("__ry"))
        .alias("__syy"),
        F.sum(F.col("__rx").cast("decimal(38,0)") * F.col("__ry"))
        .alias("__sxy"),
    )
    num = F.expr(
        "CAST(n AS DECIMAL(38,0)) * __sxy - __sx * __sy"
    ).cast("double")
    den = F.sqrt(
        F.expr("CAST(CAST(n AS DECIMAL(38,0)) * __sxx - __sx * __sx"
               " AS DOUBLE)")
        * F.expr("CAST(CAST(n AS DECIMAL(38,0)) * __syy - __sy * __sy"
                 " AS DOUBLE)")
    )
    return folded.select(
        "n", F.round(num / den, 6).alias("rho_fp")
    )


def group_sequential_monitor(
    df: DataFrame, look_col: str, arm_col: str, flag_col: str,
    boundaries_fp: list,
) -> DataFrame:
    """Group-sequential A/B monitoring: at each interim LOOK, the
    cumulative two-proportion z compares against that look's spending
    boundary; the first crossing stops the experiment. The boundary
    SHAPE is the caller's (O'Brien-Fleming-style c*sqrt(K/k) passed as
    fixed-point literals — the alpha calibration of c is an offline
    table lookup, Jennison & Turnbull's tables, deliberately not
    recomputed here).

    Pooled two-proportion z at look k over cumulative counts
    (n1,x1,n0,x0):

        z = (x1/n1 - x0/n0) / sqrt(p(1-p)(1/n1 + 1/n0)),  p = (x1+x0)/N

    Cumulative counts come from a LOOK-BOUNDED window over the per-
    (look, arm) cell relation (one combiner groupBy of the data; the
    window runs over <= 2K rows). z evaluates in doubles on exact
    integer counts — one sqrt per look, round 1e-6. Returns per look:
    (look, n1, x1, n0, x0, z_fp, boundary_fp, crossed, stopped) where
    `stopped` marks the FIRST crossing look (decision point).
    """
    cells = df.groupBy(
        F.col(look_col).alias("look"),
        F.col(arm_col).cast("int").alias("__arm"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col(flag_col).cast("long")).cast("long").alias("__x"),
    )
    w = Window.partitionBy("__arm").orderBy("look").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cells.select(
        "look", "__arm",
        F.sum("__n").over(w).alias("__cn"),
        F.sum("__x").over(w).alias("__cx"),
    )
    a1 = cum.where(F.col("__arm") == 1).select(
        "look", F.col("__cn").alias("n1"), F.col("__cx").alias("x1")
    )
    a0 = cum.where(F.col("__arm") == 0).select(
        "look", F.col("__cn").alias("n0"), F.col("__cx").alias("x0")
    )
    looks = a1.join(a0, "look")
    b_entries = F.map_from_arrays(
        F.array(*[F.lit(i + 1) for i in range(len(boundaries_fp))]),
        F.array(*[F.lit(int(b)) for b in boundaries_fp]),
    )
    w_idx = Window.orderBy("look")  # look-bounded (<= K rows)
    idxed = looks.withColumn(
        "__k", F.row_number().over(w_idx)
    ).withColumn("boundary_fp", F.try_element_at(b_entries, F.col("__k")))
    p = (F.col("x1") + F.col("x0")).cast("double") / (
        F.col("n1") + F.col("n0")
    ).cast("double")
    z = (
        F.col("x1").cast("double") / F.col("n1").cast("double")
        - F.col("x0").cast("double") / F.col("n0").cast("double")
    ) / F.sqrt(
        p * (F.lit(1.0) - p)
        * (F.lit(1.0) / F.col("n1").cast("double")
           + F.lit(1.0) / F.col("n0").cast("double"))
    )
    # boundary crossing compared in INTEGER space: z_fp carries 6
    # decimals, so round(|z_fp|*1e6) is its exact fixed-point long —
    # the raw double product can land 1 ulp below the boundary (e.g.
    # 2.123456*1e6 -> 2123455.9999...) and flip crossed/stopped when
    # z sits exactly on the spending boundary (r8 ADVICE).
    with_z = idxed.withColumn("z_fp", F.round(z, 6)).withColumn(
        "crossed",
        (F.round(F.abs(F.col("z_fp")) * 1000000).cast("long")
         >= F.col("boundary_fp"))
        .cast("int"),
    )
    w_first = Window.orderBy("look").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return with_z.withColumn(
        "stopped",
        ((F.col("crossed") == 1)
         & (F.coalesce(F.max("crossed").over(w_first), F.lit(0)) == 0))
        .cast("int"),
    ).select(
        "look", "n1", "x1", "n0", "x0", "z_fp", "boundary_fp",
        "crossed", "stopped",
    )


def theil_sen_slope(
    df: DataFrame, group_col: str, x_col: str, y_col: str,
    scale: int = 10**6,
) -> DataFrame:
    """Theil-Sen robust slope per group — the median of all pairwise
    slopes, the outlier-proof regression line (up to ~29% contaminated
    points cannot move it; the OLS twin `grouped_ols_slope` moves with
    one bad row). Equal-x pairs are skipped (slope undefined), the
    standard convention.

    BOUNDEDNESS CONTRACT: the input must be pre-aggregated to a
    per-group series of BOUNDED length (e.g. monthly aggregates —
    months, not rows; the same contract as every per-entity window in
    the repo), because the pair expansion is quadratic in the series
    length by definition. Slopes are fixed-point integers
    ((dy*scale) div dx — truncation identical cross-engine, negatives
    included); the per-group median is the LOWER median (rank
    (m+1) div 2 of the sorted slope multiset — a deterministic VALUE
    even though tied row order is not).

    Returns (group, n_points, n_pairs, slope_fp).
    """
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
    )
    a = base.select("__g", F.col("__x").alias("__xa"),
                    F.col("__y").alias("__ya"))
    b = base.select("__g", F.col("__x").alias("__xb"),
                    F.col("__y").alias("__yb"))
    pairs = (
        a.join(b.hint("shuffle_hash"), "__g")
        # xa < xb both orders each unordered pair once AND excludes
        # equal-x pairs (undefined slope) in one predicate
        .where(F.col("__xa") < F.col("__xb"))
        .select(
            "__g",
            F.expr(
                f"CAST(CAST(__yb - __ya AS DECIMAL(38,0)) * {int(scale)}"
                " AS DECIMAL(38,0)) div (__xb - __xa)"
            ).cast("long").alias("__s"),
        )
    )
    w = Window.partitionBy("__g").orderBy(F.col("__s").asc())
    ranked = pairs.withColumn("__rn", F.row_number().over(w))
    counts = pairs.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    npts = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n_points")
    )
    med = (
        ranked.join(counts.hint("shuffle_hash"), "__g")
        .where(F.col("__rn") == F.expr("(n_pairs + 1) div 2"))
        .select("__g", "n_pairs", F.col("__s").alias("slope_fp"))
    )
    # LEFT join: a group whose pairs are all equal-x (n_pairs = 0,
    # slope undefined) must surface with NULL slope_fp, not vanish
    # from the report (r8 ADVICE — the inner join silently dropped it)
    return (
        npts.join(med.hint("shuffle_hash"), "__g", "left")
        .select(F.col("__g").alias(group_col), "n_points",
                F.coalesce(F.col("n_pairs"), F.lit(0).cast("long"))
                .alias("n_pairs"),
                "slope_fp")
    )


def qini_curve(
    df: DataFrame, score_col: str, treated_col: str, outcome_col: str,
    tiebreak: str, n_buckets: int = 10, scale: int = 10**6,
) -> DataFrame:
    """Qini / uplift curve by score decile — the acceptance report for
    an UPLIFT model (where `lift_table` grades pure propensity): rank
    by predicted uplift descending, and at each cumulative decile
    compare treated responders against control responders scaled to
    the treated volume:

        qini(k) = cumYt(k) - cumYc(k) * cumNt(k)/cumNc(k)

    A useful uplift score front-loads incremental responders; a random
    score walks the diagonal. Exact fixed point: the control term is
    one cross-multiplied div; per-bucket uplift (rate difference) is
    reported alongside.

    Same shape as `lift_table`: `global_ranks` deciles (no
    single-reducer ntile), per-bucket combiner aggregates, cumulative
    windows over the N_BUCKETS-bounded relation. Returns
    (bucket, n_treated, n_control, y_treated, y_control, uplift_fp,
    qini_fp).
    """
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        global_ranks,
    )

    n = int(n_buckets)
    ranked = global_ranks(
        df.select(
            F.col(score_col), F.col(tiebreak),
            F.col(treated_col).cast("long").alias("__t"),
            F.col(outcome_col).cast("long").alias("__y"),
        ),
        [F.col(score_col).desc(), F.col(tiebreak).asc()],
        keep_total=True,
    )
    bucket = F.expr(
        f"CASE WHEN __rank <= (__total % {n}) * ((__total div {n}) + 1) "
        f"THEN (__rank - 1) div ((__total div {n}) + 1) + 1 "
        f"ELSE (__total % {n}) "
        f"  + (__rank - 1 - (__total % {n}) * ((__total div {n}) + 1)) "
        f"    div (__total div {n}) + 1 END"
    )
    per = (
        ranked.withColumn("bucket", bucket.cast("long"))
        .groupBy("bucket")
        .agg(
            F.sum("__t").cast("long").alias("n_treated"),
            F.sum(F.lit(1) - F.col("__t")).cast("long").alias("n_control"),
            F.sum(F.col("__t") * F.col("__y")).cast("long")
            .alias("y_treated"),
            F.sum((F.lit(1) - F.col("__t")) * F.col("__y")).cast("long")
            .alias("y_control"),
        )
    )
    cum = "ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    return per.select(
        "bucket", "n_treated", "n_control", "y_treated", "y_control",
        F.expr(
            f"CAST(CASE WHEN n_treated > 0 AND n_control > 0 THEN"
            f" CAST(y_treated AS DECIMAL(38,0)) * {int(scale)}"
            f" div n_treated"
            f" - CAST(y_control AS DECIMAL(38,0)) * {int(scale)}"
            f" div n_control END AS BIGINT)"
        ).alias("uplift_fp"),
        F.expr(
            f"CAST(sum(y_treated) OVER ({cum}) * CAST({int(scale)}"
            f" AS DECIMAL(38,0))"
            f" - CAST(sum(y_control) OVER ({cum}) AS DECIMAL(38,0))"
            f" * sum(n_treated) OVER ({cum}) * {int(scale)}"
            f" div greatest(sum(n_control) OVER ({cum}), 1) AS BIGINT)"
        ).alias("qini_fp"),
    )


def kruskal_wallis(
    df: DataFrame, group_col: str, value_col: str,
) -> DataFrame:
    """Kruskal-Wallis H test — the k-group extension of
    `mann_whitney_u` ('do ANY of these sources draw from a different
    distribution'), the screen run before k pairwise tests + BH. With
    midrank sums R_g per group:

        H = 12/(n(n+1)) * sum_g R_g^2/n_g - 3(n+1),
        tie-corrected: H' = H / (1 - sum(t^3-t)/(n^3-n))

    DOUBLED midranks keep every rank sum integral (2R_g exact);
    the per-group fold then assembles H in doubles from exact sums
    (one division chain, deterministic, round 1e-6). Per-group rank
    sums come from the distinct-value relation + the pinned prefix
    pass — the same shape as the two-sample test, with a (value,
    group) cell relation instead of a 0/1 indicator.

    Returns one row: (n_total, n_groups, tie_cubes, h_fp) — compare
    h_fp against chi-square(k-1) quantiles offline.
    """
    cells = df.groupBy(
        F.col(value_col).alias("__v"), F.col(group_col).alias("__g")
    ).agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    per_value = cells.groupBy("__v").agg(
        F.sum("__cnt").cast("long").alias("__vt")
    )
    with_cum = global_prefix_sum(per_value, ["__v"], "__vt",
                                 prefix_name="__cum")
    # doubled midrank of value v: 2*cnt_less + cnt_eq + 1
    dr = with_cum.select(
        "__v",
        (2 * (F.col("__cum") - F.col("__vt")) + F.col("__vt") + 1)
        .cast("long").alias("__dr"),
        (F.col("__vt").cast("decimal(38,0)") * F.col("__vt")
         * F.col("__vt") - F.col("__vt")).alias("__tie"),
    )
    # hydrate each (value, group) cell with its value's doubled rank;
    # cell relation is distinct-(value,group)-bounded
    per_group = (
        cells.join(dr.hint("shuffle_hash"), "__v")
        .groupBy("__g")
        .agg(
            F.sum("__cnt").cast("long").alias("__ng"),
            F.sum(F.col("__cnt").cast("decimal(38,0)") * F.col("__dr"))
            .alias("__2rg"),
        )
    )
    ties = dr.agg(F.sum("__tie").cast("decimal(38,0)").alias("__tt"))
    folded = per_group.crossJoin(F.broadcast(ties)).agg(
        F.sum("__ng").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.max("__tt").cast("decimal(38,0)").alias("__tie_cubes"),
        # sum over groups of (2R_g)^2 / n_g — each term floor-divided
        # as an exact DECIMAL(38,0) BEFORE the sum (a float term sum
        # is partition-order dependent and can't hash; the floor loses
        # < 1 per group against terms of order n^3, invisible at
        # 1e-6 rounding and applied identically by both engines)
        F.sum(
            F.expr("CAST(__2rg * __2rg AS DECIMAL(38,0)) div __ng")
        ).cast("decimal(38,0)").alias("__s2"),
    )
    n = F.col("n_total").cast("double")
    # H with doubled ranks: R_g = 2R_g/2 so R_g^2 = (2R_g)^2/4
    h = (
        F.lit(12.0) / (n * (n + 1.0))
        * (F.col("__s2").cast("double") / 4.0)
        - 3.0 * (n + 1.0)
    )
    h_corr = h / (
        F.lit(1.0)
        - F.col("__tie_cubes").cast("double") / (n * n * n - n)
    )
    return folded.select(
        "n_total", "n_groups",
        F.col("__tie_cubes").cast("long").alias("tie_cubes"),
        F.round(h_corr, 6).alias("h_fp"),
    )


def mantel_haenszel_or(
    df: DataFrame, stratum_col: str, exposed_col: str, outcome_col: str,
    scale: int = 10**6,
) -> DataFrame:
    """Mantel-Haenszel pooled odds ratio across strata — the classic
    confounder-adjusted 2x2 effect measure (the epidemiology companion
    to `ipw_effect_stratified`'s risk difference): with per-stratum
    cells (a=exposed+, b=exposed-, c=unexposed+, d=unexposed-),

        OR_MH = sum_i(a_i*d_i/n_i) / sum_i(b_i*c_i/n_i)

    Per-stratum terms are quantized (a*d*scale div n) then summed as
    integers — the repo's no-float-term-sums rule; the final ratio is
    one more integer cross-division. Single-cell-zero strata
    contribute zero to the affected sum (the MH estimator's own
    convention — it downweights them naturally, no dropping needed).

    One stratum groupBy + one bounded fold. Returns
    (n_strata, n_rows, or_mh_fp) — or_mh_fp NULL when the denominator
    sum is zero (no discordant evidence).
    """
    cells = df.groupBy(F.col(stratum_col).alias("__s")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col(exposed_col).cast("long")
               * F.col(outcome_col).cast("long"))).cast("long").alias("a"),
        F.sum((F.col(exposed_col).cast("long")
               * (1 - F.col(outcome_col).cast("long"))))
        .cast("long").alias("b"),
        F.sum(((1 - F.col(exposed_col).cast("long"))
               * F.col(outcome_col).cast("long")))
        .cast("long").alias("c"),
        F.sum(((1 - F.col(exposed_col).cast("long"))
               * (1 - F.col(outcome_col).cast("long"))))
        .cast("long").alias("d"),
    )
    folded = cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("n").cast("long").alias("n_rows"),
        F.sum(F.expr(
            f"CAST(CAST(a AS DECIMAL(38,0)) * d * {int(scale)}"
            " AS DECIMAL(38,0)) div n"
        )).cast("decimal(38,0)").alias("__num"),
        F.sum(F.expr(
            f"CAST(CAST(b AS DECIMAL(38,0)) * c * {int(scale)}"
            " AS DECIMAL(38,0)) div n"
        )).cast("decimal(38,0)").alias("__den"),
    )
    return folded.select(
        "n_strata", "n_rows",
        F.when(
            F.col("__den") > 0,
            F.expr(
                f"CAST(__num * {int(scale)} AS DECIMAL(38,0)) div __den"
            ),
        ).cast("long").alias("or_mh_fp"),
    )


def mcnemar_test(
    df: DataFrame, id_col: str, before_col: str, after_col: str,
    scale: int = 10**6,
) -> DataFrame:
    """McNemar's test for PAIRED binary outcomes — 'did the same
    subjects flip' (before/after a launch, first half vs second half):
    only the DISCORDANT pairs carry information,

        chi2 = (b - c)^2 / (b + c)
        (b = yes->no flips, c = no->yes flips)

    surfaced exact fixed point ((b-c)^2 * scale div (b+c), NULL when
    no discordance). The marginal-change direction rides along as
    net_flips = c - b. One subject-level aggregate (the pairing) +
    one scalar fold. ``before_col``/``after_col`` must be 0/1 per
    subject row.

    Returns one row: (n_subjects, n_yes_no, n_no_yes, net_flips,
    chi2_fp).
    """
    per = df.select(
        F.col(id_col),
        F.col(before_col).cast("long").alias("__b0"),
        F.col(after_col).cast("long").alias("__a0"),
    )
    folded = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
        F.sum(F.expr("CAST(__b0 = 1 AND __a0 = 0 AS LONG)"))
        .cast("long").alias("n_yes_no"),
        F.sum(F.expr("CAST(__b0 = 0 AND __a0 = 1 AS LONG)"))
        .cast("long").alias("n_no_yes"),
    )
    return folded.select(
        "n_subjects", "n_yes_no", "n_no_yes",
        (F.col("n_no_yes") - F.col("n_yes_no")).cast("long")
        .alias("net_flips"),
        F.when(
            (F.col("n_yes_no") + F.col("n_no_yes")) > 0,
            F.expr(
                f"CAST(CAST(n_yes_no - n_no_yes AS DECIMAL(38,0))"
                f" * (n_yes_no - n_no_yes) * {int(scale)}"
                " AS DECIMAL(38,0)) div (n_yes_no + n_no_yes)"
            ),
        ).cast("long").alias("chi2_fp"),
    )


def cohens_kappa(
    df: DataFrame, rater_a_col: str, rater_b_col: str,
    scale: int = 10**6,
) -> DataFrame:
    """Cohen's kappa for two binary raters — chance-corrected
    agreement ('do these two labeling heuristics actually agree, or
    just both say yes a lot'): with observed agreement A and marginal
    chance agreement E = (ma*mb + (n-ma)*(n-mb))/n^2,

        kappa = (A/n - E) / (1 - E)
              = (n*A - ma*mb - (n-ma)*(n-mb))
                / (n^2 - ma*mb - (n-ma)*(n-mb))     [exact rational]

    — one cross-multiplied integer division, no float probability
    anywhere. One scalar aggregate. Returns
    (n, n_agree, kappa_fp); NULL kappa when the denominator is 0
    (both raters constant — agreement is undefined, not perfect).
    """
    folded = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            (F.col(rater_a_col).cast("long")
             == F.col(rater_b_col).cast("long")).cast("long")
        ).cast("long").alias("n_agree"),
        F.sum(F.col(rater_a_col).cast("long")).cast("long").alias("__ma"),
        F.sum(F.col(rater_b_col).cast("long")).cast("long").alias("__mb"),
    )
    chance = F.expr(
        "CAST(__ma AS DECIMAL(38,0)) * __mb"
        " + CAST(n - __ma AS DECIMAL(38,0)) * (n - __mb)"
    )
    den = F.col("n").cast("decimal(38,0)") * F.col("n") - chance
    return folded.select(
        "n", "n_agree",
        F.when(
            den != 0,
            F.expr(
                f"CAST((CAST(n AS DECIMAL(38,0)) * n_agree"
                f" - (CAST(__ma AS DECIMAL(38,0)) * __mb"
                f" + CAST(n - __ma AS DECIMAL(38,0)) * (n - __mb)))"
                f" * {int(scale)} AS DECIMAL(38,0))"
                " div (CAST(n AS DECIMAL(38,0)) * n"
                " - (CAST(__ma AS DECIMAL(38,0)) * __mb"
                " + CAST(n - __ma AS DECIMAL(38,0)) * (n - __mb)))"
            ),
        ).cast("long").alias("kappa_fp"),
    )


def cohens_d(
    df: DataFrame, group_col: str, value_col: str,
) -> DataFrame:
    """Cohen's d standardized mean difference — the effect SIZE beside
    the rank tests' significance (a tiny p with d = 0.02 is a launch
    nobody notices): d = (mean1 - mean0) / s_pooled with the pooled
    sample SD. Exact integer sufficient statistics per group (one
    combiner aggregate), the single subtraction/division/sqrt chain in
    doubles at the end (deterministic, round 1e-6). ``group_col``
    must be 0/1; ``value_col`` integer. Returns
    (n1, n0, mean1_fp, mean0_fp, d_fp); NULL d when either group has
    < 2 rows or pooled variance is 0.
    """
    g = df.groupBy(F.col(group_col).cast("int").alias("__g")).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col(value_col).cast("decimal(38,0)")).alias("__s"),
        F.sum(
            F.col(value_col).cast("decimal(38,0)") * F.col(value_col)
        ).alias("__q"),
    )
    a = g.where(F.col("__g") == 1).select(
        F.col("__n").alias("n1"), F.col("__s").alias("s1"),
        F.col("__q").alias("q1"),
    )
    b = g.where(F.col("__g") == 0).select(
        F.col("__n").alias("n0"), F.col("__s").alias("s0"),
        F.col("__q").alias("q0"),
    )
    j = a.crossJoin(F.broadcast(b))
    # per-group sum of squared deviations: q - s^2/n, exact-from-ints
    # evaluated in doubles (products < 2^53 is NOT guaranteed for the
    # decimals, but decimal->double conversion is nearest-even and
    # identical cross-engine on identical exact inputs)
    ss1 = (F.col("q1").cast("double")
           - F.col("s1").cast("double") * F.col("s1").cast("double")
           / F.col("n1").cast("double"))
    ss0 = (F.col("q0").cast("double")
           - F.col("s0").cast("double") * F.col("s0").cast("double")
           / F.col("n0").cast("double"))
    sp = F.sqrt(
        (ss1 + ss0)
        / (F.col("n1") + F.col("n0") - 2).cast("double")
    )
    m1 = F.col("s1").cast("double") / F.col("n1").cast("double")
    m0 = F.col("s0").cast("double") / F.col("n0").cast("double")
    ok = (F.col("n1") > 1) & (F.col("n0") > 1)
    return j.select(
        "n1", "n0",
        F.expr("CAST(s1 * 1000000 AS DECIMAL(38,0)) div n1")
        .cast("long").alias("mean1_fp"),
        F.expr("CAST(s0 * 1000000 AS DECIMAL(38,0)) div n0")
        .cast("long").alias("mean0_fp"),
        F.when(ok & (sp > 0.0), F.round((m1 - m0) / sp, 6))
        .alias("d_fp"),
    )
