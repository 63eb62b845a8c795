"""Curation funnel composition."""

from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators import curation as C
from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table


def test_quality_funnel_monotone_and_labelled(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = C.quality_funnel(
        docs,
        [
            ("min_length", C.min_length_stage("n_chars", 150)),
            ("lang", C.lang_allowlist_stage("lang", ["en"])),
            ("exact_dedup", C.exact_dedup_stage("text", "doc_id")),
        ],
    ).orderBy("stage_idx").collect()
    assert [r["stage"] for r in out] == ["input", "min_length", "lang", "exact_dedup"]
    counts = [r["n_docs"] for r in out]
    assert counts[0] == docs.count()
    assert all(a >= b for a, b in zip(counts, counts[1:]))  # funnel never grows
    assert counts[-1] > 0


def test_exact_dedup_stage_keeps_min_id_full_rows(spark):
    df = spark.createDataFrame(
        [(1, "same text", "en"), (2, "Same  TEXT", "en"), (3, "other", "en")],
        "doc_id long, text string, lang string",
    )
    out = C.exact_dedup_stage("text", "doc_id")(df).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [1, 3]
    assert set(out[0].asDict()) == {"doc_id", "text", "lang"}  # full row survives


def test_decontamination_stage_removes_overlap(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "totally clean words here")],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(9, "alpha beta gamma epsilon")], "doc_id long, text string"
    )
    out = C.decontamination_stage(eval_set, "text", "doc_id", 3)(corpus).collect()
    assert [r["doc_id"] for r in out] == [2]


def test_cli_curate_end_to_end(spark, tmp_path):
    """The curate subcommand: config in, curated parquet + attrition JSON
    out, stages applied in order (length -> lang -> exact dedup ->
    near-dup)."""
    import json as _json
    import subprocess
    import sys

    cfg = {
        "input": "/root/testdata/sf0.001",
        "table": "documents",
        "output": str(tmp_path / "curated"),
        "text_col": "text",
        "id_col": "doc_id",
        "stages": [
            {"kind": "min_length", "col": "n_chars", "min_chars": 10},
            {"kind": "exact_dedup"},
            {"kind": "neardup", "threshold": 0.8,
             "stage_dir": str(tmp_path / "sigs")},
        ],
    }
    cfg_path = tmp_path / "curate.json"
    cfg_path.write_text(_json.dumps(cfg))
    proc = subprocess.run(
        [sys.executable, "-m", "redshift_to_pendo_api_data_pipeline_spark.cli",
         "curate", "-c", str(cfg_path)],
        capture_output=True, text=True, timeout=600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = _json.loads(proc.stdout.strip().splitlines()[-1])
    att = report["attrition"]
    assert att["input"] >= att["min_length"] >= att["exact_dedup"] >= att["neardup"]
    curated = spark.read.parquet(cfg["output"])
    assert curated.count() == att["neardup"]
    assert set(curated.columns) >= {"doc_id", "text"}


def test_cli_profile_end_to_end(tmp_path):
    """The profile subcommand: config in, one JSON line of per-column
    row/null/exact-distinct counts out."""
    import json as _json
    import subprocess
    import sys

    cfg = {
        "input": "/root/testdata/sf0.001",
        "table": "orders",
        "columns": ["o_custkey", "o_orderstatus"],
    }
    cfg_path = tmp_path / "profile.json"
    cfg_path.write_text(_json.dumps(cfg))
    proc = subprocess.run(
        [sys.executable, "-m", "redshift_to_pendo_api_data_pipeline_spark.cli",
         "profile", "-c", str(cfg_path)],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    rep = _json.loads(line)
    assert rep["table"] == "orders"
    cols = {p["column"]: p for p in rep["profile"]}
    assert set(cols) == {"o_custkey", "o_orderstatus"}
    assert cols["o_custkey"]["n_rows"] > 0
    assert cols["o_orderstatus"]["n_distinct"] >= 1
    assert all(p["n_null"] == 0 for p in rep["profile"])


def test_strip_spans_stage_rewrites_not_drops(spark):
    """The span stage REWRITES text (rows survive, duplicated windows
    excised); only fully-duplicated documents fall out."""
    from redshift_to_pendo_api_data_pipeline_spark.operators.curation import (
        strip_spans_stage,
    )
    shared = "alpha beta gamma delta epsilon"
    rows = [
        (0, f"unique one two three {shared}", "en"),
        (1, f"{shared} other words here now", "en"),
        (2, shared, "en"),                       # nothing but the dup span
        (3, "totally novel text with no dups", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    out = {r["doc_id"]: r["text"]
           for r in strip_spans_stage("text", "doc_id", k=5)(df).collect()}
    assert 2 not in out                      # emptied -> dropped
    assert out[3] == "totally novel text with no dups"
    for w in shared.split():
        assert w not in out[0] and w not in out[1]
    assert "unique" in out[0] and "other" in out[1]
    assert set(out) == {0, 1, 3}


def test_quality_funnel_flags_matches_sequential_on_row_predicates(spark, sf_dir):
    """The one-scan flags funnel equals the sequential form when every
    stage is a pure row predicate, and its plan scans the table once."""
    from pyspark.sql import functions as F

    from redshift_to_pendo_api_data_pipeline_spark.operators.curation import (
        quality_funnel,
        quality_funnel_flags,
    )
    from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_chars", F.length("text")
    )
    seq = sorted(tuple(r) for r in quality_funnel(docs, [
        ("min_length", lambda d: d.where(F.col("n_chars") >= 30)),
        ("src_allow", lambda d: d.where(F.col("source") != "src0")),
        ("no_digits", lambda d: d.where(~F.col("text").rlike(r"\d{6,}"))),
    ]).collect())
    flags_df = quality_funnel_flags(docs, [
        ("min_length", F.col("n_chars") >= 30),
        ("src_allow", F.col("source") != "src0"),
        ("no_digits", ~F.col("text").rlike(r"\d{6,}")),
    ])
    assert sorted(tuple(r) for r in flags_df.collect()) == seq
    p = flags_df._jdf.queryExecution().executedPlan().toString()
    assert p.count("Scan parquet") <= 2


def test_funnel_drop_stages_never_broadcast_unbounded_id_sets(spark, sf_dir):
    """r6 verdict #1: the loser/hit/keep id sets the drop stages join
    against are corpus-cardinality (near-dup losers are 30-50% of a web
    corpus; a quality filter's keep set is the majority by construction)
    — broadcasting them is an OOM at 100 TB. Each stage's join must plan
    as a ShuffledHashJoin (the hinted scale-safe strategy), never a
    SortMergeJoin, and never a broadcast built from the unbounded set."""
    import tempfile

    from redshift_to_pendo_api_data_pipeline_spark.operators.classifier import (
        hashed_features,
        train_logreg,
        weights_fixed_point,
    )

    docs = load_table(spark, sf_dir, "documents")
    eval_set = docs.where(F.col("source") == "src19")
    corpus = docs.where(F.col("source") != "src19")
    feats = hashed_features(corpus, "text", "doc_id")
    labels = corpus.select(
        F.col("doc_id").alias("doc"),
        (F.col("source") == "src0").cast("int").alias("y"),
    )
    wfp = weights_fixed_point(train_logreg(feats, labels, n_epochs=1))

    with tempfile.TemporaryDirectory() as td:
        stages = {
            "neardup": C.neardup_stage("text", "doc_id", td, threshold=0.8),
            "decontam": C.decontamination_stage(eval_set, "text", "doc_id", 3),
            "classifier": C.classifier_filter_stage(wfp, "text", "doc_id",
                                                    min_logit_fp=0),
        }
        for name, stage in stages.items():
            p = stage(corpus)._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" not in p, name
            assert "ShuffledHashJoin" in p, name


def test_cli_classify_then_curate_with_classifier_stage(spark, tmp_path):
    """The classify subcommand trains and publishes the fixed-point
    weight table; a subsequent curate run consumes it as a funnel stage
    — the full train-once/filter-forever loop through the CLI."""
    import json as _json
    import subprocess
    import sys

    clf_cfg = {
        "input": "/root/testdata/sf0.001",
        "table": "documents",
        "text_col": "text",
        "id_col": "doc_id",
        "positive_sources": ["src0", "src1", "src2"],
        "weights_out": str(tmp_path / "weights"),
        "epochs": 3,
        "scores_out": str(tmp_path / "scores"),
    }
    p1 = tmp_path / "classify.json"
    p1.write_text(_json.dumps(clf_cfg))
    proc = subprocess.run(
        [sys.executable, "-m", "redshift_to_pendo_api_data_pipeline_spark.cli",
         "classify", "-c", str(p1)],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert rep["n_weights"] > 1 and rep["n_positive"] > 0
    scores = spark.read.parquet(clf_cfg["scores_out"])
    assert scores.count() == rep["n_docs"]
    assert dict(scores.dtypes)["logit_fp"] == "bigint"

    # threshold = median published logit — the top-p% selection a real
    # pipeline derives from the score distribution, not a magic constant
    logits = sorted(r["logit_fp"] for r in scores.collect())
    thr = logits[len(logits) // 2]
    cur_cfg = {
        "input": "/root/testdata/sf0.001",
        "table": "documents",
        "output": str(tmp_path / "curated"),
        "text_col": "text",
        "id_col": "doc_id",
        "stages": [
            {"kind": "classifier", "weights": clf_cfg["weights_out"],
             "min_logit_fp": thr},
        ],
    }
    p2 = tmp_path / "curate2.json"
    p2.write_text(_json.dumps(cur_cfg))
    proc2 = subprocess.run(
        [sys.executable, "-m", "redshift_to_pendo_api_data_pipeline_spark.cli",
         "curate", "-c", str(p2)],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    rep2 = _json.loads(proc2.stdout.strip().splitlines()[-1])
    att = rep2["attrition"]
    assert 0 < att["classifier"] < att["input"]
    kept = spark.read.parquet(cur_cfg["output"])
    n_above = scores.where(f"logit_fp >= {thr}").count()
    assert kept.count() == att["classifier"] == n_above


def test_containment_stage_drops_quote_keeps_container(spark, tmp_path):
    """The containment funnel stage: the short doc fully quoted inside a
    long one drops, the container and unrelated docs survive; no
    unbounded broadcast in the plan."""
    quote = "alpha beta gamma delta epsilon"
    rows = [
        (1, quote + " " + " ".join(f"filler{i}" for i in range(40)), "s"),
        (2, quote, "s"),
        (3, "totally unrelated words in this one", "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    stage = C.containment_stage("text", "doc_id", "source",
                                stage_dir=str(tmp_path), threshold=0.8)
    out = stage(df)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in p
