"""Record-linkage operators: sorted-neighborhood candidates,
Fellegi–Sunter scoring, inclusion-dependency discovery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.linkage import (
    golden_records,
    inclusion_dependencies,
    linkage_scores,
    sorted_neighborhood_pairs,
)


def _brute_snm(rows, window):
    """Reference: sort by (key, id), all pairs within `window` ranks."""
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    out = set()
    for i, (ida, ka) in enumerate(ordered):
        for g in range(1, window + 1):
            if i + g < len(ordered):
                idb, kb = ordered[i + g]
                out.add((ida, idb, ka, kb, g))
    return out


def test_snm_matches_bruteforce(spark):
    rows = [(i, f"k{(i * 7) % 13:02d}") for i in range(40)]
    df = spark.createDataFrame(rows, ["id", "key"])
    got = {
        tuple(r)
        for r in sorted_neighborhood_pairs(df, "id", "key", window=3)
        .select("id_a", "id_b", "key_a", "key_b", "rank_gap")
        .collect()
    }
    assert got == _brute_snm(rows, 3)


def test_snm_pair_count_is_linear(spark):
    # n records, window w: exactly sum_{g=1..w} (n-g) pairs — the
    # linear candidate bound that is the operator's whole point
    n, w = 25, 4
    df = spark.createDataFrame(
        [(i, f"{i:03d}") for i in range(n)], ["id", "key"]
    )
    cnt = sorted_neighborhood_pairs(df, "id", "key", window=w).count()
    assert cnt == sum(n - g for g in range(1, w + 1))


def test_snm_window_validation(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "key"])
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, "id", "key", window=0)


def test_linkage_scores_weights_and_mask(spark):
    pairs = spark.createDataFrame(
        [("x", "x", 1, 1), ("x", "x", 1, 5), ("x", "y", 9, 9)],
        ["n_a", "n_b", "z_a", "z_b"],
    )
    rules = [
        ("name_eq", F.col("n_a") == F.col("n_b"), 10, -5),
        ("size_near", F.abs(F.col("z_a") - F.col("z_b")) <= 1, 4, -2),
    ]
    got = {
        (r["link_score"], r["agree_mask"])
        for r in linkage_scores(pairs, rules).collect()
    }
    # row1: both agree 10+4=14 mask 3; row2: name only 10-2=8 mask 1;
    # row3: size only -5+4=-1 mask 2
    assert got == {(14, 3), (8, 1), (-1, 2)}


def test_linkage_scores_validation(spark):
    df = spark.createDataFrame([(1,)], ["a"])
    with pytest.raises(ValueError, match="rule"):
        linkage_scores(df, [])


def test_inclusion_dependencies_counts(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (2,), (3,), (None,)], "v: int"
    )
    parent = spark.createDataFrame([(1,), (2,), (9,)], "v: int")
    row = inclusion_dependencies(
        [("c.v", child, "v", "p.v", parent, "v")]
    ).collect()[0]
    # distinct non-null child values {1,2,3}; 3 is a violation
    assert row["n_child_distinct"] == 3
    assert row["n_violations"] == 1
    assert row["containment_ppm"] == 2 * 1_000_000 // 3


def test_inclusion_dependencies_empty_child(spark):
    child = spark.createDataFrame([], "v: int")
    parent = spark.createDataFrame([(1,)], "v: int")
    row = inclusion_dependencies(
        [("c.v", child, "v", "p.v", parent, "v")]
    ).collect()[0]
    assert row["n_child_distinct"] == 0
    assert row["containment_ppm"] == 0


def test_inclusion_dependencies_multi_candidates_one_row_each(spark):
    a = spark.createDataFrame([(1,), (2,)], "v: int")
    b = spark.createDataFrame([(2,), (3,)], "v: int")
    out = inclusion_dependencies(
        [
            ("a.v", a, "v", "b.v", b, "v"),
            ("b.v", b, "v", "a.v", a, "v"),
        ]
    ).collect()
    assert len(out) == 2
    by_child = {r["child_ref"]: r for r in out}
    assert by_child["a.v"]["n_violations"] == 1
    assert by_child["b.v"]["n_violations"] == 1


def test_inclusion_dependencies_validation():
    with pytest.raises(ValueError, match="candidate"):
        inclusion_dependencies([])


def test_golden_records_modal_and_tiebreak(spark):
    rows = [
        # cluster 1: name modal 'acme' (2 vs 1); size ties 1-1-1 -> min 3
        (1, "acme", 3), (1, "acme", 9), (1, "acm", 7),
        # cluster 2: singleton passes through
        (2, "solo", 5),
    ]
    df = spark.createDataFrame(rows, ["cluster", "name", "size"])
    got = {
        (r["cluster"], r["n_members"], r["name"], r["size"])
        for r in golden_records(df, "cluster", ["name", "size"]).collect()
    }
    assert got == {(1, 3, "acme", 3), (2, 1, "solo", 5)}


def test_golden_records_validation(spark):
    df = spark.createDataFrame([(1, "a")], ["cluster", "name"])
    with pytest.raises(ValueError, match="field"):
        golden_records(df, "cluster", [])


def test_candidate_keys_singles_and_pairs(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.linkage import (
        candidate_keys,
    )

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 10), (3, "b", 10), (4, "b", 20)],
        ["pk", "grp", "val"],
    )
    rows = {r["candidate"]: r for r in candidate_keys(
        df, ["pk", "grp", "val"]).collect()}
    assert len(rows) == 3 + 3
    assert rows["pk"]["is_key"] and rows["pk"]["uniqueness_ppm"] == 1_000_000
    assert not rows["grp"]["is_key"] and rows["grp"]["n_distinct"] == 2
    assert rows["grp+val"]["n_distinct"] == 3  # (a,10),(b,10),(b,20)
    assert not rows["grp+val"]["is_key"]
    assert rows["grp+pk"]["is_key"]  # pk alone unique -> any pair with it


def test_candidate_keys_null_semantics_and_injective_encoding(spark):
    """r8 explode rewrite: single-column counts must IGNORE nulls
    (SQL COUNT DISTINCT), pair counts must COUNT a tuple containing a
    null, and the length-prefixed string encoding must not collide
    values whose raw concatenation would ('a'+'b|c' vs 'a|b'+'c')."""
    from redshift_to_pendo_api_data_pipeline_spark.operators.linkage import (
        candidate_keys,
    )

    df = spark.createDataFrame(
        [(1, None, "a"), (2, "x", "a"), (3, "x", None), (4, None, "a")],
        ["pk", "u", "v"],
    )
    rows = {r["candidate"]: r for r in candidate_keys(
        df, ["pk", "u", "v"]).collect()}
    assert rows["u"]["n_distinct"] == 1          # nulls ignored
    assert rows["v"]["n_distinct"] == 1
    # tuples WITH nulls count: (null,a),(x,a),(x,null) -> 3
    assert rows["u+v"]["n_distinct"] == 3
    assert rows["pk"]["is_key"]
    assert rows["pk+u"]["n_distinct"] == 4       # key propagation

    # adversarial separator strings: raw '|'-concat would collide
    # ('a'|'b|c' == 'a|b'|'c'); neither single column is a key, so
    # the pair genuinely goes through the encoded-digest path
    df2 = spark.createDataFrame(
        [(1, "a", "b|c"), (2, "a|b", "c"), (3, "a", "b|c")],
        ["pk", "s", "t"],
    )
    r2 = {r["candidate"]: r for r in candidate_keys(
        df2, ["s", "t"]).collect()}
    assert not r2["s"]["is_key"] and not r2["t"]["is_key"]
    assert r2["s+t"]["n_distinct"] == 2


def test_candidate_keys_validation(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.linkage import (
        candidate_keys,
    )

    df = spark.createDataFrame([(1,)], ["a"])
    with pytest.raises(ValueError, match="column"):
        candidate_keys(df, [])
    with pytest.raises(ValueError, match="max_width"):
        candidate_keys(df, ["a"], max_width=3)


def test_cli_mine_end_to_end(spark, capsys):
    import json

    from redshift_to_pendo_api_data_pipeline_spark.cli import cmd_mine

    sf = "/root/testdata/sf0.001"
    rc = cmd_mine({
        "tables": {
            "orders": f"{sf}/orders.parquet",
            "customer": f"{sf}/customer.parquet",
        },
        "key_columns": {"orders": ["o_orderkey", "o_custkey"]},
        "fk_candidates": [["orders.o_custkey", "customer.c_custkey"]],
    })
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    keys = {r["candidate"]: r for r in report["candidate_keys"]["orders"]}
    assert keys["o_orderkey"]["is_key"] is True
    assert keys["o_custkey"]["is_key"] is False
    fk = report["inclusion_dependencies"][0]
    assert fk["child_ref"] == "orders.o_custkey"
    assert fk["containment_ppm"] == 1_000_000


def test_mutual_best_match_hand_case(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.linkage import (
        mutual_best_match,
    )

    # 1-2 score 10 (mutual best); 2-3 score 5 (3's best is 2, but 2's
    # best is 1 -> dropped); 4-5 score 7 mutual
    pairs = spark.createDataFrame(
        [(1, 2, 10), (2, 3, 5), (4, 5, 7)],
        ["id_a", "id_b", "link_score"],
    )
    got = {
        (r["id_a"], r["id_b"], r["link_score"])
        for r in mutual_best_match(pairs).collect()
    }
    assert got == {(1, 2, 10), (4, 5, 7)}


def test_mutual_best_match_tiebreak(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.linkage import (
        mutual_best_match,
    )

    # node 1 ties between 2 and 3 -> lower partner id (2) wins; 2's
    # best is 1 -> (1,2) mutual; 3 left engaged to 1 one-sidedly
    pairs = spark.createDataFrame(
        [(1, 2, 9), (1, 3, 9)], ["id_a", "id_b", "link_score"]
    )
    got = {(r["id_a"], r["id_b"]) for r in mutual_best_match(pairs).collect()}
    assert got == {(1, 2)}


def test_streaming_linkage_bridge_matches_batch(spark, tmp_path):
    import pyspark.sql.functions as SF

    from redshift_to_pendo_api_data_pipeline_spark.operators.dedup import (
        incremental_editdist_pairs,
    )
    from redshift_to_pendo_api_data_pipeline_spark.streaming.linkage_bridge import (
        streaming_linkage_against_corpus,
    )

    corpus = spark.createDataFrame(
        [("rad bolt",), ("red bolt",), ("red bolt",), ("blue hinge",)],
        ["name"],
    )
    new_rows = spark.createDataFrame(
        [(1, "red bolt"), (2, "blue gear")], ["rid", "name"]
    )
    src = f"{tmp_path}/src"
    new_rows.write.parquet(src)
    stream = spark.readStream.schema("rid long, name string").parquet(src)
    got = []

    def sink(pairs, batch_id):
        got.extend(
            (r["name_new"], r["name_corpus"], r["dist"], r["n_corpus"])
            for r in pairs.collect()
        )

    q = streaming_linkage_against_corpus(
        stream, corpus, "name",
        stage_dict=f"{tmp_path}/dict.parquet",
        checkpoint=f"{tmp_path}/ckpt",
        on_pairs=sink,
    )
    q.awaitTermination(120)
    # pinned against the batch twin (corpus-side counts rehydrated)
    batch = {
        (r["name_new"], r["name_corpus"], r["dist"], r["n_corpus"])
        for r in incremental_editdist_pairs(
            new_rows, corpus, "name", max_dist=2).collect()
    }
    assert set(got) == batch
    assert ("red bolt", "red bolt", 0, 2) in batch


def test_editdist_banded_equals_naive_full_block(spark):
    """r8 s2 length-band sub-blocking must be RESULT-IDENTICAL to the
    full per-block self-join — including pairs whose lengths straddle a
    band boundary, and with no duplicated pairs from the 3-band offer."""
    from pyspark.sql import functions as F

    from redshift_to_pendo_api_data_pipeline_spark.operators.dedup import (
        editdist_pairs_from_dict,
    )

    # one block, lengths 2..12: 'ab', 'abc', ..., plus typo families
    names = ["ab", "abc", "abcd", "abcde", "abcdef",
             "zzzzz", "zzzzx", "zzzzxy", "qqqqqqqqqqqq"]
    dic = spark.createDataFrame(
        [(n, i + 1, "blk") for i, n in enumerate(names)],
        "name string, n long, __blk string",
    )
    got = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in editdist_pairs_from_dict(dic, max_dist=2).collect()
    }
    # naive reference: full self-join, no banding
    a = dic.selectExpr("name AS name_a")
    b = dic.selectExpr("name AS name_b")
    naive = (
        a.crossJoin(b)
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= 2)
    )
    want = {(r["name_a"], r["name_b"]): r["dist"] for r in naive.collect()}
    assert got == want
    # cross-band pair really present: 'abcd'(4, band 2) vs 'abcde'(5, band 2)?
    # bands = len div 2: 'abc'(1) vs 'abcd'(2) straddles — must be found
    assert ("abc", "abcd") in got
    # duplicates would show as a dict-size mismatch vs a list count
    rows = editdist_pairs_from_dict(dic, max_dist=2).collect()
    assert len(rows) == len(got)
