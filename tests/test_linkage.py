"""Record-linkage operators: sorted-neighborhood candidates,
Fellegi–Sunter scoring, inclusion-dependency discovery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.linkage import (
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
