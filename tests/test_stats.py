"""Distribution-comparison statistics (operators/stats.py).

Hand-computed fixtures for Mann-Whitney (doubled midranks, tie
correction), KS (cross-multiplied ECDF distance), Benjamini-Hochberg
(exact integer frontier), and the Poisson bootstrap (deterministic
hash draws, CI sanity) — plus a determinism regression for the
range-partitioned prefix operators the tests ride on (the round-7
dual-consumption bug: two consumers of an unpinned range exchange can
re-sample different boundaries).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.stats import (
    bh_fdr,
    bootstrap_mean_ci,
    ks_two_sample,
    mann_whitney_u,
    poisson_bootstrap_weights,
)


def test_mann_whitney_hand_computed(spark):
    # group1 = [1, 2, 2], group0 = [2, 3]; midranks: 1->1, 2->3, 3->5
    # R1 = 1 + 3 + 3 = 7 -> u2 = 2*R1 - n1(n1+1) = 14 - 12 = 2
    # ties: one group of 3 -> tie_cubes = 27 - 3 = 24
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 2), (0, 2), (0, 3)], "g long, v long"
    )
    row = mann_whitney_u(df, "g", "v").collect()[0]
    assert (row.n1, row.n2, row.u2, row.tie_cubes) == (3, 2, 2, 24)


def test_mann_whitney_no_ties_symmetry(spark):
    # disjoint supports: group1 all below group0 -> U1 = 0 -> u2 = 0
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (0, 10), (0, 11)], "g long, v long"
    )
    row = mann_whitney_u(df, "g", "v").collect()[0]
    assert row.u2 == 0 and row.tie_cubes == 0
    # and reversed: group1 all ABOVE -> U1 = n1*n2 -> u2 = 2*n1*n2
    df2 = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 10), (1, 11)], "g long, v long"
    )
    assert ks_two_sample(df2, "g", "v").collect()[0].d_fp == 10**6
    assert mann_whitney_u(df2, "g", "v").collect()[0].u2 == 2 * 2 * 2


def test_ks_hand_computed(spark):
    # g1 = [1, 2], g0 = [2, 3]: at v=1 |1*2 - 0*2| = 2 (D = 1/2)
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (0, 2), (0, 3)], "g long, v long"
    )
    row = ks_two_sample(df, "g", "v").collect()[0]
    assert (row.n1, row.n2, row.d_num) == (2, 2, 2)
    assert row.d_fp == 500000


def test_ks_identical_distributions_zero(spark):
    rows = [(g, v) for g in (0, 1) for v in (5, 7, 7, 9)]
    df = spark.createDataFrame(rows, "g long, v long")
    assert ks_two_sample(df, "g", "v").collect()[0].d_num == 0


def test_bh_fdr_frontier_exact(spark):
    # m=4, alpha=0.05: p=(0.01, 0.02, 0.04, 0.9) ->
    # thresholds alpha*i/m = (0.0125, 0.025, 0.0375, 0.05):
    # ranks 1,2 pass; rank 3 fails (0.04 > 0.0375); frontier = 2.
    df = spark.createDataFrame(
        [("a", 10000), ("b", 20000), ("c", 40000), ("d", 900000)],
        "k string, p_fp long",
    )
    out = {r.k: r.rejected for r in bh_fdr(df, "k", "p_fp").collect()}
    assert out == {"a": 1, "b": 1, "c": 0, "d": 0}


def test_bh_fdr_step_up_rescues_earlier_rank(spark):
    # step-up: rank 1 fails its own threshold but a LATER rank passes,
    # so everything at or below that rank is rejected.
    # m=2, alpha_fp=500000 (0.5): p=(0.3, 0.5); thresholds (0.25, 0.5):
    # rank1 0.3 > 0.25 but rank2 0.5 <= 0.5 -> both rejected.
    df = spark.createDataFrame(
        [("a", 300000), ("b", 500000)], "k string, p_fp long"
    )
    out = {
        r.k: r.rejected
        for r in bh_fdr(df, "k", "p_fp", alpha_fp=500000).collect()
    }
    assert out == {"a": 1, "b": 1}


def test_poisson_weights_deterministic_and_positive(spark):
    ids = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    w1 = poisson_bootstrap_weights(ids, "doc_id", n_reps=8, seed=7)
    w2 = poisson_bootstrap_weights(ids, "doc_id", n_reps=8, seed=7)
    rows1 = sorted(map(tuple, w1.collect()))
    rows2 = sorted(map(tuple, w2.collect()))
    assert rows1 == rows2
    ws = [w for _, _, w in rows1]
    assert all(1 <= w <= 8 for w in ws)
    # mean weight over kept rows ~ 1/(1-e^-1) ~ 1.58; loose sanity band
    kept_mean = sum(ws) / len(ws)
    assert 1.3 < kept_mean < 1.9
    # ~63.2% of (id, rep) draws survive the w>0 filter
    assert 0.55 < len(ws) / (300 * 8) < 0.72


def test_bootstrap_ci_brackets_full_mean(spark):
    vals = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97 + 10).cast("long").alias("x"),
    )
    w = poisson_bootstrap_weights(vals, "doc_id", n_reps=32, seed=3)
    row = bootstrap_mean_ci(vals, w, "doc_id", "x", n_reps=32).collect()[0]
    assert row.n_reps == 32
    assert row.ci_lo_fp < row.ci_hi_fp
    assert row.ci_lo_fp <= row.mean_fp <= row.ci_hi_fp


def test_bootstrap_ci_ranks_follow_actual_replicate_count(spark):
    """r8 ADVICE: ranks must derive from the ACTUAL replicate count —
    a replicate missing from the weights relation (e.g. all Poisson
    draws zero) must shift the nearest-rank positions, not silently
    emit NULL/misplaced bounds computed from the n_reps parameter."""
    vals = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 53 + 5).cast("long").alias("x"),
    )
    w = poisson_bootstrap_weights(vals, "doc_id", n_reps=20, seed=7)
    # drop two whole replicates: 18 actually present vs n_reps=20
    w_short = w.where(~F.col("rep").isin(3, 11))
    row = bootstrap_mean_ci(
        vals, w_short, "doc_id", "x", n_reps=20
    ).collect()[0]
    assert row.n_reps == 18
    # nearest-rank at 18 reps: lo = ceil(18*0.025) = 1, hi = ceil(18*0.975) = 18
    means = sorted(
        r.m for r in w_short.join(vals, "doc_id")
        .groupBy("rep")
        .agg(
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0))"
                " * sum(CAST(w AS DECIMAL(38,0)) * x)"
                " div sum(CAST(w AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("m")
        )
        .collect()
    )
    assert row.ci_lo_fp == means[0]
    assert row.ci_hi_fp == means[17]
    assert row.ci_lo_fp is not None and row.ci_hi_fp is not None


@pytest.mark.parametrize("op", ["sum", "rank", "max"])
def test_prefix_ops_deterministic_across_runs(spark, op):
    """Round-7 regression: the range exchange feeding two
    pid-keyed consumers must be pinned (localCheckpoint) — unpinned,
    each consumer can re-sample different range boundaries and the
    broadcast offsets silently misalign. Hash-shuffled input + 3 runs
    flushes the flap out."""
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        global_prefix_max_excl,
        global_prefix_sum,
        global_ranks,
    )

    base = (
        spark.range(0, 4000)
        .select((F.xxhash64("id") % 1000).alias("v"), "id")
        .repartition(7, "id")
    )
    outs = []
    for _ in range(3):
        if op == "sum":
            out = global_prefix_sum(base, ["v", "id"], "id", "cum")
            outs.append(sorted((r.v, r.id, r.cum) for r in out.collect()))
        elif op == "rank":
            out = global_ranks(base, ["v", "id"], rank_name="rk")
            outs.append(sorted((r.v, r.id, r.rk) for r in out.collect()))
        else:
            out = global_prefix_max_excl(base, ["v", "id"], "id", "pm")
            outs.append(sorted((r.v, r.id, r.pm) for r in out.collect()))
    assert outs[0] == outs[1] == outs[2]
    if op == "sum":
        # and the prefix itself is right: last cum == sum of all values
        total = sum(r.id for r in base.collect())
        assert max(c for _, _, c in outs[0]) == total


def test_lateness_histogram_hand_computed(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.temporal import (
        lateness_histogram,
    )

    # arrival order a=1..5; event times: 10, 30, 20, 60, 25 (us)
    # prev-max:              -, 10, 30, 30, 60 -> lateness 0,0,10,0,35
    rows = [(1, 10), (2, 30), (3, 20), (4, 60), (5, 25)]
    df = spark.createDataFrame(rows, "arr long, ts_us long")
    out = {r.bucket: (r.n_events, r.max_lateness_us)
           for r in lateness_histogram(
               df, ["arr"], "ts_us", bucket_us=20, max_buckets=3
           ).collect()}
    # lateness 0,0,0,10,35 -> buckets: 0 (x3 zeros), 0 (10//20=0), 1 (35//20=1)
    assert out == {0: (4, 10), 1: (1, 35)}


def test_lateness_histogram_overflow_bucket_caps(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.temporal import (
        lateness_histogram,
    )

    rows = [(1, 1000), (2, 0)]  # lateness 0, then 1000
    df = spark.createDataFrame(rows, "arr long, ts_us long")
    out = {r.bucket: r.n_events
           for r in lateness_histogram(
               df, ["arr"], "ts_us", bucket_us=10, max_buckets=5
           ).collect()}
    assert out == {0: 1, 5: 1}  # 1000//10=100 capped to the 5 bucket


def test_quantile_normalize_equalizes_marginals(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.stats import (
        quantile_normalize,
    )

    # two equally-sized groups with shifted distributions: after QN the
    # sorted qn_value multisets of both groups must be identical.
    rows = [("a", i, i * 10) for i in range(1, 21)] + [
        ("b", 100 + i, i * 10 + 500) for i in range(1, 21)
    ]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = quantile_normalize(df, "g", "v", "id").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r.qn_value)
    assert sorted(by_g["a"]) == sorted(by_g["b"])
    # qn values come from the pooled distribution
    pooled = sorted(v for _, _, v in rows)
    assert set(by_g["a"]) <= set(pooled)


def test_feature_hash_census_closes(spark):
    from pyspark.sql import functions as F
    from redshift_to_pendo_api_data_pipeline_spark.operators.classifier import (
        feature_hash_collision_audit,
    )

    dim = 16
    toks = spark.range(0, 100).select(
        F.concat(F.lit("tok"), F.col("id")).alias("tok")
    )
    tf = toks.select(
        "tok", F.pmod(F.xxhash64("tok"), F.lit(dim)).cast("int").alias("feat")
    )
    rows = feature_hash_collision_audit(tf, dim=dim).collect()
    assert sum(r.n_buckets for r in rows) == dim
    assert sum(r.n_tokens for r in rows) == 100
    assert any(r.tokens_in_bucket > 1 for r in rows)  # 100 tokens, 16 buckets


def test_ipw_effect_hand_computed(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        ipw_effect_stratified,
    )

    # stratum A: 2 treated (y=1,0), 2 control (y=0,0): p=1/2
    #   w1 = 1*4/2 = 2 ; w0 = 0
    # stratum B: 1 treated (y=1), 3 control (y=1,1,0): p=1/4
    #   w1 = 1*4/1 = 4 ; w0 = 2*4/3 = 8/3
    # stratum C: all treated -> dropped (positivity)
    rows = [("A", 1, 1), ("A", 1, 0), ("A", 0, 0), ("A", 0, 0),
            ("B", 1, 1), ("B", 0, 1), ("B", 0, 1), ("B", 0, 0),
            ("C", 1, 1), ("C", 1, 0)]
    df = spark.createDataFrame(rows, "s string, t long, y long")
    r = ipw_effect_stratified(df, "s", "t", "y").collect()[0]
    assert (r.n_used, r.n_strata_used, r.n_strata_dropped) == (8, 2, 1)
    # mu1 = (2+4)*1e6/8 = 750000 ; mu0 = floor(8/3*1e6)/8 = 2666666/8
    assert r.mu1_fp == 750000
    assert r.mu0_fp == 2666666 // 8
    assert r.ate_fp == r.mu1_fp - r.mu0_fp


def test_max_drawdown_hand_computed(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        max_drawdown_by_group,
    )

    # g1 series: 10, 7, 12, 4, 9 -> peaks 10,10,12,12,12
    # drawdowns: 0, 3, 0, 8, 3 -> max 8 at period 4
    # g2 monotone rising -> drawdown 0 everywhere, earliest period wins
    rows = [("g1", 1, 10), ("g1", 2, 7), ("g1", 3, 12),
            ("g1", 4, 4), ("g1", 5, 9),
            ("g2", 1, 5), ("g2", 2, 6)]
    df = spark.createDataFrame(rows, "g string, p long, v long")
    out = {r.g: (r.p, r.peak_value, r.v, r.drawdown)
           for r in max_drawdown_by_group(df, "g", "p", "v").collect()}
    assert out["g1"] == (4, 12, 4, 8)
    assert out["g2"] == (1, 5, 5, 0)


def test_engagement_curve_counts_distinct_days(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        engagement_curve,
    )

    # user 1: 2 distinct days in month 202401 (one day repeated);
    # user 2: 1 day; month 202402: user 1 one day.
    rows = [(1, "2024-01-01"), (1, "2024-01-01"), (1, "2024-01-05"),
            (2, "2024-01-03"), (1, "2024-02-02")]
    df = spark.createDataFrame(rows, "u long, d string").select(
        "u", F.to_date("d").alias("d"),
        (F.year("d") * 100 + F.month("d")).cast("long").alias("m"),
    )
    out = {(r.month, r.active_days): r.n_users
           for r in engagement_curve(df, "u", F.col("d"),
                                     F.col("m")).collect()}
    assert out == {(202401, 2): 1, (202401, 1): 1, (202402, 1): 1}


def test_pettitt_detects_level_shift(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        pettitt_changepoint,
    )

    # g1: clean level shift at t=10 (values 1..10 low, 11..20 high)
    rows = [("g1", t, 5 if t <= 10 else 50) for t in range(1, 21)]
    # g2: constant series -> all ranks tied, U_t = 0 everywhere
    rows += [("g2", t, 7) for t in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    out = {r.g: (r.n, r.k_stat, r.t_at_k) for r in
           pettitt_changepoint(df, "g", "t", "v").collect()}
    # hand: for t<=10, each low point has dr = 2*0+10+1 = 11 (10-way tie)
    # U_t = 11t - 21t = -10t -> |U_10| = 100 = K, attained at t=10
    assert out["g1"] == (20, 100, 10)
    assert out["g2"][1] == 0  # no signal in a constant series


def test_pettitt_direction_sign(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        pettitt_changepoint,
    )

    up = [("u", t, t) for t in range(1, 9)]       # rising series: u < 0
    down = [("d", t, 100 - t) for t in range(1, 9)]  # falling: u > 0
    df = spark.createDataFrame(up + down, "g string, t long, v long")
    out = {r.g: r.u_at_k for r in
           pettitt_changepoint(df, "g", "t", "v").collect()}
    assert out["u"] < 0 and out["d"] > 0


def test_target_encode_loo_leak_free(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.classifier import (
        target_encode_loo,
    )

    # cat A: y = 1,1,0 -> LOO: (2-1)/2, (2-1)/2, (2-0)/2
    # cat B singleton y=1 -> global fallback (3-1)/(4-1)... wait N=4:
    #   st=3, enc = (3-1)*1e6 // 3 = 666666
    rows = [(1, "A", 1), (2, "A", 1), (3, "A", 0), (4, "B", 1)]
    df = spark.createDataFrame(rows, "rid long, c string, y long")
    out = {r.rid: r.enc_fp for r in
           target_encode_loo(df, "c", "y", ["rid"]).collect()}
    assert out[1] == 500000 and out[2] == 500000
    assert out[3] == 1000000
    assert out[4] == (3 - 1) * 10**6 // 3


def test_isotonic_matches_pava_on_zigzag(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.classifier import (
        isotonic_fit_binned,
    )

    # zigzag rates: 0.2, 0.6, 0.4, 0.8 with equal n -> PAVA pools bins
    # 2 and 3 into 0.5; fit = 0.2, 0.5, 0.5, 0.8
    rows = [(10, 10, 2), (20, 10, 6), (30, 10, 4), (40, 10, 8)]
    df = spark.createDataFrame(rows, "b long, n long, pos long")
    out = {r.b: r.iso_fp for r in
           isotonic_fit_binned(df, "b", "n", "pos").collect()}
    assert out == {10: 200000, 20: 500000, 30: 500000, 40: 800000}


def test_isotonic_monotone_and_identity_on_sorted(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.classifier import (
        isotonic_fit_binned,
    )

    # already-monotone input -> fit == raw rates; always nondecreasing
    rows = [(1, 10, 1), (2, 10, 3), (3, 10, 7), (4, 10, 9)]
    df = spark.createDataFrame(rows, "b long, n long, pos long")
    got = sorted((r.b, r.rate_fp, r.iso_fp) for r in
                 isotonic_fit_binned(df, "b", "n", "pos").collect())
    assert all(r == i for _, r, i in got)
    isos = [i for _, _, i in got]
    assert isos == sorted(isos)


def test_rake_hand_computed(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.text import (
        rake_keywords,
    )

    # one doc: "deep learning is fun the deep net"
    # phrases: "deep learning", "fun", "deep net"
    # freq: deep 2, learning 1, fun 1, net 1
    # deg:  deep 2+2=4, learning 2, fun 1, net 2
    # scores(x1e6): deep 2e6, learning 2e6, fun 1e6, net 2e6
    # phrase scores: "deep learning" 4e6, "deep net" 4e6, "fun" 1e6
    df = spark.createDataFrame(
        [(1, "deep learning is fun the deep net")], "doc_id long, text string"
    )
    out = {r.phrase: (r.n_words, r.n_occurrences, r.score_fp)
           for r in rake_keywords(df, "text", "doc_id").collect()}
    assert out == {
        "deep learning": (2, 1, 4_000_000),
        "deep net": (2, 1, 4_000_000),
        "fun": (1, 1, 1_000_000),
    }


def test_rake_consecutive_and_edge_stopwords(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.text import (
        rake_keywords,
    )

    # consecutive stopwords + stopwords at both edges must not create
    # empty phrases (the regex-replace approach fails exactly here)
    df = spark.createDataFrame(
        [(1, "the a spark engine of the a fast scan the")],
        "doc_id long, text string",
    )
    out = rake_keywords(df, "text", "doc_id").collect()
    assert sorted(r.phrase for r in out) == ["fast scan", "spark engine"]
    assert all(r.n_words == 2 for r in out)


def test_blocking_quality_hand_computed(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.linkage import (
        blocking_quality,
    )

    # 5 records -> 10 possible pairs; candidates = 4 (incl. a reversed
    # duplicate + self pair that must canonicalize away); truth = 3,
    # of which 2 caught.
    cand = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 3), (3, 4), (1, 5)], "id_a long, id_b long"
    )
    truth = spark.createDataFrame(
        [(2, 1), (3, 4), (2, 5)], "id_a long, id_b long"
    )
    r = blocking_quality(cand, truth, 5).collect()[0]
    assert (r.n_records, r.n_possible) == (5, 10)
    assert (r.n_candidates, r.n_true, r.n_caught) == (3, 3, 2)
    assert r.reduction_ratio_fp == 10**6 - 3 * 10**6 // 10
    assert r.pair_completeness_fp == 2 * 10**6 // 3


def test_blocking_quality_no_truth_pairs_null_pc(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.linkage import (
        blocking_quality,
    )

    cand = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    truth = cand.where("id_a > 99")  # empty
    r = blocking_quality(cand, truth, 3).collect()[0]
    assert r.n_true == 0 and r.pair_completeness_fp is None


def test_pps_systematic_hand_case(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.sampling import (
        pps_systematic_sample,
    )

    # W = 100, k = 4 -> stride 25, offset 12: points 12, 37, 62, 87
    # cum intervals: a:[0,10) b:[10,20) c:[20,60) d:[60,100)
    # hits: a none... point 12 in b; 37 in c; 62, 87 in d
    rows = [("a", 10), ("b", 10), ("c", 40), ("d", 40)]
    df = spark.createDataFrame(rows, "doc string, w long")
    out = {r.doc: r.multiplicity for r in
           pps_systematic_sample(df, "doc", "w", k=4).collect()}
    assert out == {"b": 1, "c": 1, "d": 2}


def test_pps_total_multiplicity_near_k(spark):
    from pyspark.sql import functions as F
    from redshift_to_pendo_api_data_pipeline_spark.operators.sampling import (
        pps_systematic_sample,
    )

    df = spark.range(1, 301).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 37 + 1).cast("long").alias("w"),
    )
    out = pps_systematic_sample(df, "doc_id", "w", k=50).collect()
    tot = sum(r.multiplicity for r in out)
    assert 49 <= tot <= 51  # stride flooring slack


def test_weighted_quantiles_hand_case(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.sampling import (
        weighted_quantiles_exact,
    )

    # values 1..4 with weights 1, 1, 6, 2 (W=10):
    # q=0.5 -> target 5 -> value 3 (cum: 1,2,8,10)
    # q=0.1 -> target 1 -> value 1 ; q=0.9 -> target 9 -> value 4
    rows = [(1, 101, 1), (2, 102, 1), (3, 103, 6), (4, 104, 2)]
    df = spark.createDataFrame(rows, "v long, rid long, w long")
    out = {r.q_ppm: r.value for r in
           weighted_quantiles_exact(
               df, "v", "w", "rid",
               qs_ppm=[100000, 500000, 900000]).collect()}
    assert out == {100000: 1, 500000: 3, 900000: 4}


def test_linear_mmd_zero_for_identical_groups(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
        linear_mmd_by_group,
    )

    # same vectors in both groups -> identical means -> MMD^2 = 0;
    # a third shifted group must be strictly positive vs both
    v1, v2 = [1.0, -2.0, 3.0], [0.5, 0.5, 0.5]
    rows = ([("a", v1), ("a", v2), ("b", v1), ("b", v2)]
            + [("c", [x + 10.0 for x in v1]), ("c", [x + 10.0 for x in v2])])
    df = spark.createDataFrame(rows, "g string, vec array<double>")
    out = {(r.group_a, r.group_b): r.mmd2_fp
           for r in linear_mmd_by_group(df, "vec", "g", dim=3).collect()}
    assert out[("a", "b")] == 0
    assert out[("a", "c")] > 0 and out[("b", "c")] > 0
    # shift of +10 in 3 dims -> ||diff||^2 = 3 * (10^6*10)^2 / 1e6 = 3e8
    assert out[("a", "c")] == 3 * (10 * 10**6) ** 2 // 10**6


def test_lift_table_perfect_score_concentrates(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.classifier import (
        lift_table,
    )

    # 100 rows, 20 responders, score == outcome*1000 (perfect model),
    # 10 buckets of 10: buckets 1-2 all positive, rest zero.
    rows = [(i, 1000 if i < 20 else 0, 1 if i < 20 else 0)
            for i in range(100)]
    df = spark.createDataFrame(rows, "rid long, score long, y long")
    out = {r.bucket: (r.n, r.pos, r.rate_fp, r.cum_lift_fp)
           for r in lift_table(df, "score", "y", "rid").collect()}
    assert out[1] == (10, 10, 10**6, 5 * 10**6)   # lift 5x (base 20%)
    assert out[2][1] == 10 and out[2][3] == 5 * 10**6
    assert out[3][1] == 0
    assert out[10][3] == 10**6  # full population lift == 1


def test_eb_shrinkage_pulls_small_groups_to_global(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.stats import (
        eb_shrunk_rates,
    )

    # global rate 50%; tiny group "t" is 1/1 = 100% raw, big group
    # "b" is 499/999. With m=10: t shrinks hard, b barely moves.
    rows = [("t", 1)] + [("b", 1)] * 499 + [("b", 0)] * 500
    df = spark.createDataFrame(rows, "g string, y long")
    out = {r.g: (r.raw_fp, r.shrunk_fp)
           for r in eb_shrunk_rates(df, "g", "y", pseudo_n=10).collect()}
    assert out["t"][0] == 10**6
    # t shrunk: (1*1000 + 10*500)*1e6 // (1000*11) = 6000*1e6//11000
    assert out["t"][1] == 6000 * 10**6 // 11000
    assert abs(out["b"][1] - out["b"][0]) < 2000  # big group barely moves
    assert out["t"][1] < out["t"][0]  # pulled toward 50%


def test_cochran_armitage_detects_direction(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.stats import (
        cochran_armitage_trend,
    )

    # rates rise with score: s=0 -> 10%, s=1 -> 50%, s=2 -> 90%
    rows = ([(0, 1)] * 10 + [(0, 0)] * 90
            + [(1, 1)] * 50 + [(1, 0)] * 50
            + [(2, 1)] * 90 + [(2, 0)] * 10)
    df = spark.createDataFrame(rows, "s long, y long")
    r = cochran_armitage_trend(df, "s", "y").collect()[0]
    assert r.n_bins == 3 and r.n_total == 300 and r.pos_total == 150
    assert r.t_num > 0 and r.z_fp > 5  # strongly positive trend
    # reversed direction flips the sign
    df2 = df.selectExpr("CAST(2 - s AS LONG) AS s", "y")
    r2 = cochran_armitage_trend(df2, "s", "y").collect()[0]
    assert r2.t_num == -r.t_num and abs(r2.z_fp + r.z_fp) < 1e-9


def test_spearman_perfect_monotone_and_ties(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.stats import (
        spearman_rho,
    )

    # perfectly monotone (nonlinear!) relation -> rho = 1 exactly
    rows = [(i, i * i * i) for i in range(1, 30)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = spearman_rho(df, "x", "y").collect()[0]
    assert r.n == 29 and abs(r.rho_fp - 1.0) < 1e-9
    # reversed -> -1
    df2 = spark.createDataFrame([(i, -i * i * i) for i in range(1, 30)],
                                "x long, y long")
    assert abs(spearman_rho(df2, "x", "y").collect()[0].rho_fp + 1.0) < 1e-9
    # hand case with ties: x=(1,2,2,3), y=(10,20,20,40) -> rho = 1
    df3 = spark.createDataFrame(
        [(1, 10), (2, 20), (2, 20), (3, 40)], "x long, y long"
    )
    assert abs(spearman_rho(df3, "x", "y").collect()[0].rho_fp - 1.0) < 1e-9


def test_group_sequential_stops_at_first_crossing(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.stats import (
        group_sequential_monitor,
    )

    # look 1: arms identical (no signal); look 2 adds a huge effect.
    rows = ([(1, 1, 1)] * 50 + [(1, 1, 0)] * 50
            + [(1, 0, 1)] * 50 + [(1, 0, 0)] * 50
            + [(2, 1, 1)] * 90 + [(2, 1, 0)] * 10
            + [(2, 0, 1)] * 10 + [(2, 0, 0)] * 90)
    df = spark.createDataFrame(rows, "look long, arm int, y long")
    out = {r.look: (r.z_fp, r.crossed, r.stopped) for r in
           group_sequential_monitor(
               df, "look", "arm", "y",
               boundaries_fp=[3_000_000, 2_000_000]).collect()}
    z1, c1, s1 = out[1]
    z2, c2, s2 = out[2]
    assert abs(z1) < 0.5 and c1 == 0 and s1 == 0
    assert z2 > 2.0 and c2 == 1 and s2 == 1
    # cumulative counts: look 2 row carries both looks' denominators
    r2 = [r for r in group_sequential_monitor(
        df, "look", "arm", "y",
        boundaries_fp=[3_000_000, 2_000_000]).collect() if r.look == 2][0]
    assert r2.n1 == 200 and r2.n0 == 200


def test_group_sequential_stop_flag_only_first(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.stats import (
        group_sequential_monitor,
    )

    # effect present from look 1 on: both looks cross, only the FIRST
    # is the stop decision
    rows = ([(1, 1, 1)] * 95 + [(1, 1, 0)] * 5
            + [(1, 0, 1)] * 5 + [(1, 0, 0)] * 95
            + [(2, 1, 1)] * 95 + [(2, 1, 0)] * 5
            + [(2, 0, 1)] * 5 + [(2, 0, 0)] * 95)
    df = spark.createDataFrame(rows, "look long, arm int, y long")
    out = {r.look: (r.crossed, r.stopped) for r in
           group_sequential_monitor(
               df, "look", "arm", "y",
               boundaries_fp=[3_000_000, 2_000_000]).collect()}
    assert out[1] == (1, 1)
    assert out[2] == (1, 0)


def test_cramers_v_identical_and_independent(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.quality import (
        cramers_v_matrix,
    )

    # col b == col a (perfect association, V = 1); col c independent
    # coin (V ~ 0 on a balanced 2x2)
    rows = [(x, x, y) for x in ("p", "q") for y in ("u", "v")
            for _ in range(25)]
    df = spark.createDataFrame(rows, "a string, b string, c string")
    out = {(r.col_a, r.col_b): r.v_fp for r in
           cramers_v_matrix(df, [("a", "b"), ("a", "c")]).collect()}
    assert abs(out[("a", "b")] - 1.0) < 1e-4
    assert out[("a", "c")] < 1e-4


def test_partial_corr_removes_common_driver(spark):
    from pyspark.sql import functions as F
    from redshift_to_pendo_api_data_pipeline_spark.operators.quality import (
        partial_corr,
    )

    # x and y both driven by z (plus independent-ish residuals):
    # raw r_xy is high, partial r_xy.z collapses toward 0
    df = spark.range(0, 2000).select(
        (F.col("id") % 97).alias("z"),
        ((F.col("id") % 97) * 10 + F.col("id") % 7).alias("x"),
        ((F.col("id") % 97) * 10 + F.col("id") % 11).alias("y"),
    )
    r = partial_corr(df, "x", "y", "z").collect()[0]
    assert r.r_xy > 0.99
    assert abs(r.r_xy_given_z) < 0.35  # confounder explained the link


def test_logrank_identical_groups_zero(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.temporal import (
        logrank_test,
    )

    # same durations/events in both groups -> U = 0 exactly
    rows = [(g, d, e) for g in (0, 1)
            for d, e in [(5, 1), (10, 1), (10, 0), (20, 1), (30, 0)]]
    df = spark.createDataFrame(rows, "g int, dur long, ev int")
    r = logrank_test(df, "dur", "ev", "g").collect()[0]
    assert r.u_fp == 0 and abs(r.z_fp) < 1e-9


def test_logrank_detects_separated_hazards(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.temporal import (
        logrank_test,
    )

    # group 1 dies early (durations 1..20), group 0 late (41..60):
    # strong negative U for group-1-observed > expected at early times
    rows = ([(1, d, 1) for d in range(1, 21)]
            + [(0, d, 1) for d in range(41, 61)])
    df = spark.createDataFrame(rows, "g int, dur long, ev int")
    r = logrank_test(df, "dur", "ev", "g").collect()[0]
    assert abs(r.z_fp) > 3.0
    # dense-grid at-risk correctness: group 0 has no rows at early
    # times, yet its subjects ARE at risk there (a sparse cumsum
    # drops them). 40 distinct times, minus the final one where only
    # 1 subject remains (variance undefined, filtered) -> 39.
    assert r.n_times == 39


def test_pvm_bridge_identity_and_hand_case(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        price_volume_mix,
    )

    # g "a": period 1: Q=10, R=100 (p=10); period 2: Q=20, R=300 (p=15)
    # volume = dQ*p0 = 10*10 = 100; price = Q0*dp = 10*5 = 50
    # mix = dQ*dp = 10*5 = 50; delta = 200 = 100+50+50
    rows = [("a", 1, 10, 100), ("a", 2, 20, 300),
            ("b", 1, 5, 50), ("b", 2, 5, 50),   # unchanged -> all zero
            ("c", 1, 3, 30)]                     # one period -> dropped
    df = spark.createDataFrame(rows, "g string, p long, q long, r long")
    out = {r.g: r for r in
           price_volume_mix(df, "g", "p", "q", "r", 1, 2).collect()}
    a = out["a"]
    s = 10**6
    assert (a.delta_fp, a.volume_fp, a.price_fp, a.mix_fp) == (
        200 * s, 100 * s, 50 * s, 50 * s)
    b = out["b"]
    assert (b.delta_fp, b.volume_fp, b.price_fp, b.mix_fp) == (0, 0, 0, 0)
    assert "c" not in out
    # bridge identity holds exactly for every group
    for r in out.values():
        assert r.delta_fp == r.volume_fp + r.price_fp + r.mix_fp


def test_theil_sen_robust_to_outlier(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.stats import (
        theil_sen_slope,
    )

    # clean line y = 3x: slope exactly 3.0; one wild outlier cannot
    # move the pairwise-slope median (OLS would swing hard)
    rows = [("g", x, 3 * x) for x in range(1, 10)] + [("g", 10, 1000)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = theil_sen_slope(df, "g", "x", "y").collect()[0]
    assert r.n_points == 10 and r.n_pairs == 45
    assert r.slope_fp == 3_000_000


def test_theil_sen_skips_equal_x(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.stats import (
        theil_sen_slope,
    )

    # duplicate x values contribute no pair; 3 points, 2 usable pairs
    # wait: points (1,10),(1,20),(2,30): pairs with distinct x:
    # (1,10)-(2,30): 20 ; (1,20)-(2,30): 10 -> lower median = 10
    rows = [("g", 1, 10), ("g", 1, 20), ("g", 2, 30)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = theil_sen_slope(df, "g", "x", "y").collect()[0]
    assert r.n_pairs == 2
    assert r.slope_fp == 10_000_000


def test_theil_sen_degenerate_group_surfaces_null(spark):
    """r8 ADVICE: a group whose pairs are ALL equal-x (slope
    undefined) must appear in the output with n_pairs=0 and NULL
    slope_fp — the old inner join on the median row dropped it."""
    from redshift_to_pendo_api_data_pipeline_spark.operators.stats import (
        theil_sen_slope,
    )

    rows = [
        ("ok", 1, 10), ("ok", 2, 20),
        ("flat", 5, 1), ("flat", 5, 2), ("flat", 5, 3),
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r for r in theil_sen_slope(df, "g", "x", "y").collect()}
    assert set(got) == {"ok", "flat"}
    assert got["ok"].slope_fp == 10_000_000
    assert got["flat"].n_points == 3
    assert got["flat"].n_pairs == 0
    assert got["flat"].slope_fp is None


def test_qini_perfect_uplift_model(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.stats import (
        qini_curve,
    )

    # 200 rows, 2 deciles of 100. High-score decile: treatment lifts
    # response (treated 40/50 vs control 10/50); low-score decile: no
    # effect (20/50 both arms).
    rows = []
    rid = 0
    for i in range(50):
        rows.append((rid, 100, 1, 1 if i < 40 else 0)); rid += 1
    for i in range(50):
        rows.append((rid, 100, 0, 1 if i < 10 else 0)); rid += 1
    for i in range(50):
        rows.append((rid, 50, 1, 1 if i < 20 else 0)); rid += 1
    for i in range(50):
        rows.append((rid, 50, 0, 1 if i < 20 else 0)); rid += 1
    df = spark.createDataFrame(rows, "rid long, s long, t long, y long")
    out = {r.bucket: r for r in
           qini_curve(df, "s", "t", "y", "rid", n_buckets=2).collect()}
    b1, b2 = out[1], out[2]
    assert (b1.n_treated, b1.n_control) == (50, 50)
    assert b1.uplift_fp == (40 * 10**6 // 50) - (10 * 10**6 // 50)
    # cumulative qini at decile 1: 40 - 10*(50/50) = 30
    assert b1.qini_fp == 30 * 10**6
    # decile 2 adds no incremental: qini stays 30
    assert b2.qini_fp == 30 * 10**6
    assert b2.uplift_fp == 0


def test_cli_drift_report_and_gate(spark, tmp_path):
    import json as _json

    from redshift_to_pendo_api_data_pipeline_spark import cli

    cfgp = tmp_path / "drift.json"
    cfgp.write_text(_json.dumps({
        "input": "/root/testdata/sf0.001",
        "table": "documents",
        "value": "n_chars",
        "split": {"column": "source",
                  "a_values": [f"src{i}" for i in range(10)]},
        "threshold_fp": 1,      # any nonzero KS distance trips the gate
    }))
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main(["drift", "-c", str(cfgp)])
    rep = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["n_a"] > 0 and rep["n_b"] > 0
    assert "ks_d_fp" in rep and "mw_z" in rep and "cliffs_delta_fp" in rep
    assert rc == rep["drifted"]
    # permissive threshold -> exit 0
    cfg2 = _json.loads(cfgp.read_text()); cfg2["threshold_fp"] = 10**6 + 1
    cfgp.write_text(_json.dumps(cfg2))
    with redirect_stdout(io.StringIO()):
        assert cli.main(["drift", "-c", str(cfgp)]) == 0


def test_cli_drift_empty_cohort_is_config_error(spark, tmp_path):
    """r8 ADVICE: a split matching nothing (or everything) must exit
    with a clear config error instead of ANSI DIVIDE_BY_ZERO from
    n1*n2 = 0 inside ks_two_sample."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    from redshift_to_pendo_api_data_pipeline_spark import cli

    for a_values in (["no_such_source"],
                     [f"src{i}" for i in range(64)]):   # none / all
        cfgp = tmp_path / "drift.json"
        cfgp.write_text(_json.dumps({
            "input": "/root/testdata/sf0.001",
            "table": "documents",
            "value": "n_chars",
            "split": {"column": "source", "a_values": a_values},
        }))
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = cli.main(["drift", "-c", str(cfgp)])
        rep = _json.loads(buf.getvalue().strip().splitlines()[-1])
        assert rc == 2
        assert rep["error"] == "empty_cohort"


def test_kth_smallest_exact_matches_sort(spark):
    from pyspark.sql import functions as F
    from redshift_to_pendo_api_data_pipeline_spark.operators.analytics import (
        kth_smallest_exact,
    )

    df = spark.range(0, 5000).select(
        (F.xxhash64("id") % 100000).alias("v")
    )
    vals = sorted(r.v for r in df.collect())
    n = len(vals)
    for k in (1, 17, n // 2, int(n * 0.9), n):
        got = kth_smallest_exact(df, "v", k, n).collect()[0].kth_value
        assert got == vals[k - 1], (k, got, vals[k - 1])


def test_kruskal_wallis_identical_groups_zero(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.stats import (
        kruskal_wallis,
    )

    # three identical samples -> H ~ 0 (within quantization)
    rows = [(g, v) for g in ("a", "b", "c") for v in (1, 5, 9, 13)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kruskal_wallis(df, "g", "v").collect()[0]
    assert r.n_total == 12 and r.n_groups == 3
    assert abs(r.h_fp) < 0.01


def test_kruskal_wallis_separated_groups_large(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.stats import (
        kruskal_wallis,
    )

    # three fully separated samples: H approaches its maximum
    # (k-1 groups clearly distinct -> H ~ n-1 scale); for 3 groups of
    # 10 fully ordered, textbook H = 12/(30*31)*(sum Rg^2/10) - 3*31
    rows = ([("a", v) for v in range(0, 10)]
            + [("b", v) for v in range(100, 110)]
            + [("c", v) for v in range(200, 210)])
    df = spark.createDataFrame(rows, "g string, v long")
    r = kruskal_wallis(df, "g", "v").collect()[0]
    # Rg sums: 55, 155, 255 -> H = 12/(30*31)*(55^2+155^2+255^2)/10 - 93
    expect = 12.0 / (30 * 31) * ((55**2 + 155**2 + 255**2) / 10.0) - 93.0
    assert abs(r.h_fp - expect) < 0.01
    assert r.tie_cubes == 0


def test_mantel_haenszel_hand_case(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.stats import (
        mantel_haenszel_or,
    )

    # stratum A: a=4 b=1 c=1 d=4 (n=10): ad/n = 1.6, bc/n = 0.1
    # stratum B: a=2 b=2 c=2 d=2 (n=8):  ad/n = 0.5, bc/n = 0.5
    # OR_MH = (1.6+0.5)/(0.1+0.5) = 3.5
    rows = ([("A", 1, 1)] * 4 + [("A", 1, 0)] * 1
            + [("A", 0, 1)] * 1 + [("A", 0, 0)] * 4
            + [("B", 1, 1)] * 2 + [("B", 1, 0)] * 2
            + [("B", 0, 1)] * 2 + [("B", 0, 0)] * 2)
    df = spark.createDataFrame(rows, "s string, e long, y long")
    r = mantel_haenszel_or(df, "s", "e", "y").collect()[0]
    assert (r.n_strata, r.n_rows) == (2, 18)
    assert r.or_mh_fp == 3_500_000


def test_mantel_haenszel_null_when_no_discordance(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.stats import (
        mantel_haenszel_or,
    )

    # b*c = 0 everywhere -> denominator 0 -> NULL
    rows = [("A", 1, 1), ("A", 0, 0), ("A", 1, 1)]
    df = spark.createDataFrame(rows, "s string, e long, y long")
    assert mantel_haenszel_or(df, "s", "e", "y").collect()[0].or_mh_fp is None


def test_mcnemar_hand_case(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.stats import (
        mcnemar_test,
    )

    # 10 subjects: 3 yes->no, 7 no->yes, others concordant
    rows = ([(i, 1, 0) for i in range(3)]
            + [(i, 0, 1) for i in range(3, 10)]
            + [(i, 1, 1) for i in range(10, 15)]
            + [(i, 0, 0) for i in range(15, 20)])
    df = spark.createDataFrame(rows, "rid long, b long, a long")
    r = mcnemar_test(df, "rid", "b", "a").collect()[0]
    assert (r.n_yes_no, r.n_no_yes, r.net_flips) == (3, 7, 4)
    assert r.chi2_fp == (3 - 7) ** 2 * 10**6 // 10
    # all-concordant -> NULL chi2
    df2 = spark.createDataFrame([(1, 1, 1), (2, 0, 0)], "rid long, b long, a long")
    assert mcnemar_test(df2, "rid", "b", "a").collect()[0].chi2_fp is None


def test_cohens_kappa_hand_cases(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.stats import (
        cohens_kappa,
    )

    # perfect agreement (mixed marginals) -> kappa = 1
    rows = [(1, 1)] * 5 + [(0, 0)] * 5
    df = spark.createDataFrame(rows, "ra long, rb long")
    assert cohens_kappa(df, "ra", "rb").collect()[0].kappa_fp == 10**6
    # independent raters at 50/50: A=(1,1,0,0), B=(1,0,1,0) -> kappa 0
    df2 = spark.createDataFrame(
        [(1, 1), (1, 0), (0, 1), (0, 0)], "ra long, rb long"
    )
    assert cohens_kappa(df2, "ra", "rb").collect()[0].kappa_fp == 0
    # both raters constant -> denominator 0 -> NULL
    df3 = spark.createDataFrame([(1, 1), (1, 1)], "ra long, rb long")
    assert cohens_kappa(df3, "ra", "rb").collect()[0].kappa_fp is None


def test_cohens_d_hand_case(spark):
    import math

    from redshift_to_pendo_api_data_pipeline_spark.operators.stats import (
        cohens_d,
    )

    # group1 = (10, 14), group0 = (4, 8): means 12, 6; each SS = 8;
    # s_pooled = sqrt(16/2) = 2.828...; d = 6/2.8284 = 2.1213
    rows = [(1, 10), (1, 14), (0, 4), (0, 8)]
    df = spark.createDataFrame(rows, "g int, v long")
    r = cohens_d(df, "g", "v").collect()[0]
    assert (r.mean1_fp, r.mean0_fp) == (12_000_000, 6_000_000)
    assert abs(r.d_fp - 6.0 / math.sqrt(8.0)) < 1e-6
    # singleton group -> NULL d
    df2 = spark.createDataFrame([(1, 5), (0, 1), (0, 2)], "g int, v long")
    assert cohens_d(df2, "g", "v").collect()[0].d_fp is None
