"""Link prediction + clustering coefficients (operators/basket.py r7).

Brute-force-pinned on hand graphs, including duplicate/self-loop edge
hygiene and the hub cap.
"""

from __future__ import annotations

from itertools import combinations

from redshift_to_pendo_api_data_pipeline_spark.operators.basket import (
    clustering_coefficients,
    resource_allocation_links,
)


def _brute_ra(edge_set, scale=10**6):
    nodes = sorted({n for e in edge_set for n in e})
    adj = {n: {b if a == n else a for a, b in edge_set if n in (a, b)}
           for n in nodes}
    out = {}
    for x, y in combinations(nodes, 2):
        if (x, y) in edge_set:
            continue
        common = adj[x] & adj[y]
        if common:
            out[(x, y)] = (len(common),
                           sum(scale // len(adj[z]) for z in common))
    return out


def test_ra_matches_brute_force(spark):
    # path + square: 1-2, 2-3, 3-4, 4-1, 2-4 plus pendant 5-1
    edges = {(1, 2), (2, 3), (3, 4), (1, 4), (2, 4), (1, 5)}
    # feed duplicates, reversed edges, and a self-loop — must be ignored
    rows = [(a, b) for a, b in edges] + [(2, 1), (3, 3), (1, 2)]
    df = spark.createDataFrame(rows, "src long, dst long")
    got = {(r.item_x, r.item_y): (r.cn, r.ra_fp)
           for r in resource_allocation_links(df, "src", "dst").collect()}
    assert got == _brute_ra(edges)


def test_ra_hub_cap_drops_hub_centers(spark):
    # star: hub 1 connects 2..6; every leaf pair shares only the hub.
    rows = [(1, k) for k in range(2, 7)]
    df = spark.createDataFrame(rows, "src long, dst long")
    full = resource_allocation_links(df, "src", "dst").collect()
    assert len(full) == 10  # C(5,2) leaf pairs, each via the hub
    capped = resource_allocation_links(df, "src", "dst", max_deg=3).collect()
    assert capped == []  # hub (deg 5) excluded as a wedge center


def test_clustering_coefficients_hand_graph(spark):
    # triangle 1-2-3 plus pendant 4-1:
    # cc(1) = 2*1/(3*2) = 1/3; cc(2) = cc(3) = 1; 4 has deg 1 (absent)
    rows = [(1, 2), (2, 3), (1, 3), (1, 4)]
    df = spark.createDataFrame(rows, "src long, dst long")
    got = {r.node: (r.deg, r.n_tri, r.cc_fp)
           for r in clustering_coefficients(df, "src", "dst").collect()}
    assert got == {1: (3, 1, 333333), 2: (2, 1, 1000000),
                   3: (2, 1, 1000000)}


def test_clustering_coefficients_triangle_free(spark):
    # square: every node deg 2, zero triangles, cc = 0 everywhere
    rows = [(1, 2), (2, 3), (3, 4), (4, 1)]
    df = spark.createDataFrame(rows, "src long, dst long")
    got = clustering_coefficients(df, "src", "dst").collect()
    assert len(got) == 4
    assert all(r.n_tri == 0 and r.cc_fp == 0 for r in got)


def test_binary_sign_sig_packing(spark):
    from pyspark.sql import functions as F
    from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
        binary_sign_query_sig,
        binary_sign_sigs,
    )

    # dims 1 and 34 positive -> w0 bit 0, w1 bit 1
    vec = [0.0] * 64
    vec[0] = 1.5
    vec[33] = 0.2
    vec[2] = -3.0
    df = spark.createDataFrame([(7, vec)], "vec_id long, embedding array<double>")
    r = binary_sign_sigs(df, "embedding", "vec_id", 64).collect()[0]
    assert (r.sig_w0, r.sig_w1) == (1, 2)
    # driver-side query packing must agree exactly
    assert binary_sign_query_sig(vec, 64) == [1, 2]


def test_binary_quantized_topk_recall_on_clusters(spark):
    import math
    from pyspark.sql import functions as F
    from redshift_to_pendo_api_data_pipeline_spark.operators.similarity import (
        binary_quantized_topk,
        brute_force_topk,
    )

    # two well-separated sign patterns + noise: BQ must recover most of
    # the exact top-10 (same-cluster vectors share the query's sign bits)
    import random
    rng = random.Random(13)
    rows = []
    for i in range(200):
        base = 1.0 if i % 2 == 0 else -1.0
        vec = [base * (1.0 + 0.1 * rng.random()) for _ in range(64)]
        # flip a few dims as noise
        for _ in range(5):
            vec[rng.randrange(64)] *= -1
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = rows[0][1]
    exact = {r.vec_id for r in
             brute_force_topk(df, "embedding", "vec_id", q, k=10).collect()}
    bq = {r.vec_id for r in
          binary_quantized_topk(df, "embedding", "vec_id", q,
                                dim=64, k=10, rerank=40).collect()}
    assert len(exact & bq) >= 8


def test_degree_assortativity_star_is_negative_one(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.basket import (
        degree_assortativity,
    )

    # star graph: every edge joins the hub (deg 4) to a leaf (deg 1)
    # -> perfectly disassortative, r = -1
    rows = [(0, k) for k in range(1, 5)]
    df = spark.createDataFrame(rows, "src long, dst long")
    r = degree_assortativity(df, "src", "dst").collect()[0]
    assert r.n_edges == 4
    assert r.r_fp == -(10**6)


def test_degree_assortativity_regular_graph_null(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.basket import (
        degree_assortativity,
    )

    # cycle: all degrees equal -> zero variance -> r undefined (NULL)
    rows = [(1, 2), (2, 3), (3, 4), (4, 1)]
    df = spark.createDataFrame(rows, "src long, dst long")
    r = degree_assortativity(df, "src", "dst").collect()[0]
    assert r.r_fp is None


def test_overdispersion_constant_series_zero(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.quality import (
        overdispersion_screen,
    )

    rows = [("a", 5), ("a", 5), ("a", 5),
            ("b", 1), ("b", 9), ("b", 5),   # var 16, mean 5 -> 3.2
            ("c", 7)]                        # n=1 -> NULL
    df = spark.createDataFrame(rows, "g string, x long")
    out = {r.g: (r.n_obs, r.mean_fp, r.dispersion_fp)
           for r in overdispersion_screen(df, "g", "x").collect()}
    assert out["a"] == (3, 5_000_000, 0)
    assert out["b"] == (3, 5_000_000, 3_200_000)
    assert out["c"][2] is None


def test_phonetic_dict_pairing_stage_contract(spark):
    from pyspark.sql import functions as F
    from redshift_to_pendo_api_data_pipeline_spark.operators.dedup import (
        editdist_pairs,
        editdist_pairs_from_dict,
    )

    # "smith"/"smyth"/"smithe" soundex-block together (S530); "jones"
    # lands elsewhere — phonetic blocking catches the vowel-swap typo
    # a trailing-token blocker would miss on single-token names
    rows = [("smith",), ("smyth",), ("smithe",), ("jones",), ("smith",)]
    df = spark.createDataFrame(rows, "name string")
    dic = df.groupBy("name").agg(F.count(F.lit(1)).alias("n")).select(
        "name", "n", F.soundex("name").alias("__blk")
    )
    got = {(r.name_a, r.name_b): r.dist
           for r in editdist_pairs_from_dict(dic, max_dist=2).collect()}
    assert got == {("smith", "smithe"): 1, ("smith", "smyth"): 1,
                   ("smithe", "smyth"): 2}
    # and the parent operator still delegates identically (trailing-
    # token blocker on two-token names)
    rows2 = [("blue widget",), ("blue wiget",)]
    df2 = spark.createDataFrame(rows2, "name string")
    out2 = editdist_pairs(df2, "name", max_dist=2).collect()
    assert len(out2) == 0  # different trailing tokens -> blocked apart


def test_file_row_skew_counts_physical_files(spark, tmp_path):
    from pyspark.sql import functions as F
    from redshift_to_pendo_api_data_pipeline_spark.operators.layout import (
        file_row_skew,
    )

    # 3-file layout with known sizes 10 / 30 / 60 (one append per file
    # — range-sampled repartition may merge small ranges)
    p = str(tmp_path / "t.parquet")
    for lo, hi in [(0, 10), (10, 40), (40, 100)]:
        spark.range(lo, hi).coalesce(1).write.mode("append").parquet(p)
    r = file_row_skew(spark.read.parquet(p)).collect()[0]
    assert r.n_files == 3 and r.total_rows == 100
    assert (r.min_file_rows, r.max_file_rows) == (10, 60)
    # mean = 100 div 3 = 33 -> skew = 60*1e6 div 33
    assert r.skew_fp == 60 * 10**6 // 33


def test_oph_signature_dense_for_short_docs(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.dedup import (
        oph_minhash_signatures,
    )

    # a 5-word doc has ~3 shingles << k=16 bins: most bins empty, and
    # rotation densification must fill every slot (no NULLs)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    sig = oph_minhash_signatures(df, "text", "doc_id", k=16).collect()[0].sig
    assert len(sig) == 16
    assert all(v is not None for v in sig)
    # identical docs -> identical signatures (determinism)
    df2 = spark.createDataFrame(
        [(2, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    sig2 = oph_minhash_signatures(df2, "text", "doc_id", k=16).collect()[0].sig
    assert sig == sig2


def test_oph_recall_against_classic_minhash(spark):
    from pyspark.sql import functions as F
    from redshift_to_pendo_api_data_pipeline_spark.operators.dedup import (
        minhash_signatures,
        oph_minhash_signatures,
        candidates_from_signatures,
    )

    # 30 base docs, each with a near-duplicate (one word changed):
    # both signature families band into candidates; OPH must recover
    # a comparable share of the 30 true pairs
    base = [
        " ".join(f"tok{i}w{j}" for j in range(30)) for i in range(30)
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((2 * i, t))
        words = t.split()
        words[15] = "CHANGED"
        rows.append((2 * i + 1, " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    truth = {(2 * i, 2 * i + 1) for i in range(30)}

    classic = candidates_from_signatures(
        minhash_signatures(df, "text", "doc_id"), k=48, bands=8)
    oph = candidates_from_signatures(
        oph_minhash_signatures(df, "text", "doc_id"), k=48, bands=8)
    c_hits = {(r.id_a, r.id_b) for r in classic.collect()} & truth
    o_hits = {(r.id_a, r.id_b) for r in oph.collect()} & truth
    assert len(c_hits) >= 25          # classic catches nearly all
    assert len(o_hits) >= len(c_hits) - 5  # OPH within 5 pairs of classic
