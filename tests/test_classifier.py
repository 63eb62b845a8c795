"""Quality-classifier family: full-batch JVM logistic regression over
hashed bag-of-words — the learned corpus filter (fasttext/CCNet/GPT-3
quality-classifier pattern)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators import classifier as C


def _toy_corpus(spark):
    """Linearly separable corpus: 'alpha'-family docs are the target
    domain, 'beta'-family are background; shared filler tokens force the
    model to find the discriminative ones."""
    rows = []
    for i in range(40):
        rows.append((i, "the quick alpha signal shines alpha bright today", 1))
    for i in range(40, 80):
        rows.append((i, "the quick beta noise drones beta dull today", 0))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def test_logreg_learns_separable_domains_and_scores_integer(spark):
    docs = _toy_corpus(spark)
    feats = C.hashed_features(docs, "text", "doc_id")
    labels = docs.select(F.col("doc_id").alias("doc"), "y")
    w = C.train_logreg(feats, labels, lr=1.0, n_epochs=8)
    wfp = C.weights_fixed_point(w)
    scores = {r["doc"]: r["logit_fp"]
              for r in C.score_logreg_fp(feats, wfp).collect()}
    assert len(scores) == 80
    # perfect separation on a separable corpus: every target doc's
    # integer logit above every background doc's
    pos = [scores[i] for i in range(40)]
    neg = [scores[i] for i in range(40, 80)]
    assert min(pos) > max(neg)
    # bias row present and weights all integers
    feats_w = {r["feat"]: r["w_fp"] for r in wfp.collect()}
    assert C.BIAS_FEAT in feats_w
    assert all(isinstance(v, int) for v in feats_w.values())


def test_logreg_training_plan_is_jvm_only(spark):
    """No Python anywhere in the training or scoring plans — the epochs
    are joins+aggregations, the weight table is broadcast."""
    docs = _toy_corpus(spark)
    feats = C.hashed_features(docs, "text", "doc_id")
    labels = docs.select(F.col("doc_id").alias("doc"), "y")
    w = C.train_logreg(feats, labels, n_epochs=1)
    scored = C.score_logreg_fp(feats, C.weights_fixed_point(w))
    p = scored._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "FlatMapGroupsInPandas"):
        assert node not in p
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


def test_hashed_features_exact_tf(spark):
    df = spark.createDataFrame([(1, "a b a  A")], "doc_id long, text string")
    rows = C.hashed_features(df, "text", "doc_id").collect()
    # normalize_text lowercases: 'a' x3 + 'b' x1 -> two features
    tfs = sorted(r["tf"] for r in rows)
    assert tfs == [1, 3]


def test_classifier_filter_stage_in_funnel(spark):
    """The learned filter composes into the curation funnel: train on
    the separable toy corpus, then a funnel of (length, classifier)
    stages keeps exactly the target-domain docs and reports attrition."""
    from redshift_to_pendo_api_data_pipeline_spark.operators.curation import (
        classifier_filter_stage,
        min_length_stage,
        quality_funnel,
    )

    docs = _toy_corpus(spark).withColumn("n_chars", F.length("text"))
    feats = C.hashed_features(docs, "text", "doc_id")
    labels = docs.select(F.col("doc_id").alias("doc"), "y")
    wfp = C.weights_fixed_point(
        C.train_logreg(feats, labels, lr=1.0, n_epochs=8))

    report = {r["stage"]: r["n_docs"] for r in quality_funnel(
        docs,
        [
            ("min_length", min_length_stage("n_chars", 10)),
            ("classifier", classifier_filter_stage(wfp, "text", "doc_id",
                                                   min_logit_fp=0)),
        ],
    ).collect()}
    assert report["input"] == 80
    assert report["min_length"] == 80
    assert report["classifier"] == 40  # exactly the target domain survives


def test_featureless_docs_get_bias_only_logit(spark):
    """r6 advice: a doc with zero in-vocab features (empty/whitespace
    text, or all tokens unseen in training) must get a bias-only logit
    when the doc universe is passed — and classifier_filter_stage must
    judge it by the threshold like any other doc: kept at a permissive
    threshold, dropped at a strict one. Without ``docs`` the historical
    inner-join semantics hold (no row emitted)."""
    from redshift_to_pendo_api_data_pipeline_spark.operators.curation import (
        classifier_filter_stage,
    )

    docs = _toy_corpus(spark)
    feats = C.hashed_features(docs, "text", "doc_id")
    labels = docs.select(F.col("doc_id").alias("doc"), "y")
    wfp = C.weights_fixed_point(
        C.train_logreg(feats, labels, lr=1.0, n_epochs=4))
    bias = wfp.where(F.col("feat") == C.BIAS_FEAT).first()["w_fp"]

    # universe with one empty-text and one all-OOV doc appended
    extra = spark.createDataFrame(
        [(200, "   ", 0), (201, "zzzquux flurble vex", 0)],
        "doc_id long, text string, y int",
    )
    universe = docs.unionByName(extra)
    all_feats = C.hashed_features(universe, "text", "doc_id")

    # without docs=: feature-less rows are absent (pinned legacy shape)
    no_universe = {r["doc"] for r in
                   C.score_logreg_fp(all_feats, wfp).collect()}
    assert 200 not in no_universe

    scored = {r["doc"]: r["logit_fp"] for r in C.score_logreg_fp(
        all_feats, wfp,
        docs=universe.select(F.col("doc_id").alias("doc"))).collect()}
    assert len(scored) == 82
    assert scored[200] == bias           # empty text -> bias-only
    # all-OOV tokens hash to features the training corpus never produced
    assert scored[201] == bias

    permissive = classifier_filter_stage(
        wfp, "text", "doc_id", min_logit_fp=min(scored.values()) - 1)
    strict = classifier_filter_stage(
        wfp, "text", "doc_id", min_logit_fp=bias + 1)
    kept_perm = {r["doc_id"] for r in permissive(universe).collect()}
    kept_strict = {r["doc_id"] for r in strict(universe).collect()}
    assert {200, 201} <= kept_perm and len(kept_perm) == 82
    assert 200 not in kept_strict and 201 not in kept_strict


def test_streaming_scores_match_batch(spark, tmp_path):
    """Streaming serving pins bit-for-bit to the batch scorer: train on
    the toy corpus, stage fixed-point weights, stream the same docs in
    micro-batches — per-doc integer logits must equal the batch path."""
    from redshift_to_pendo_api_data_pipeline_spark.streaming.quality_monitor import (
        score_stream,
    )

    docs = _toy_corpus(spark)
    feats = C.hashed_features(docs, "text", "doc_id")
    labels = docs.select(F.col("doc_id").alias("doc"), "y")
    wfp = C.weights_fixed_point(C.train_logreg(feats, labels, lr=1.0, n_epochs=4))
    w_path = str(tmp_path / "weights.parquet")
    wfp.write.parquet(w_path)

    batch_scores = {r["doc"]: r["logit_fp"] for r in
                    C.score_logreg_fp(feats, spark.read.parquet(w_path)).collect()}

    src = str(tmp_path / "incoming")
    docs.where(F.col("doc_id") < 40).coalesce(1).write.parquet(src)
    docs.where(F.col("doc_id") >= 40).coalesce(1).write.mode("append").parquet(src)
    got = {}

    def on_scores(df, batch_id):
        for r in df.collect():
            got[r["doc_id"]] = r["logit_fp"]

    q = score_stream(
        spark.readStream.schema("doc_id long, text string, y int")
        .option("maxFilesPerTrigger", 1).parquet(src),
        w_path, "text", "doc_id",
        checkpoint=str(tmp_path / "ckpt"),
        on_scores=on_scores,
    )
    q.awaitTermination(120)
    assert got == batch_scores and len(got) == 80


def test_exact_auc_perfect_and_tied(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.classifier import exact_auc

    # perfect separation -> AUC 1.0
    perfect = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], ["s", "y"]
    )
    row = exact_auc(perfect, "s", "y").collect()[0]
    assert (row["n_pos"], row["n_neg"], row["auc_ppm"]) == (2, 2, 1_000_000)
    # all scores tied -> AUC exactly 0.5 (tie-averaged ranks)
    tied = spark.createDataFrame(
        [(7, 0), (7, 1), (7, 0), (7, 1)], ["s", "y"]
    )
    assert exact_auc(tied, "s", "y").collect()[0]["auc_ppm"] == 500_000
    # hand case: scores 1,2,3,4 labels 0,1,0,1 -> pairs won 3/4
    hand = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 0), (4, 1)], ["s", "y"]
    )
    assert exact_auc(hand, "s", "y").collect()[0]["auc_ppm"] == 750_000


def test_exact_auc_one_class_is_null(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.classifier import exact_auc

    onec = spark.createDataFrame([(1, 1), (2, 1)], ["s", "y"])
    assert exact_auc(onec, "s", "y").collect()[0]["auc_ppm"] is None


def test_weak_label_votes_tiebreak_abstain(spark):
    from redshift_to_pendo_api_data_pipeline_spark.operators.classifier import (
        weak_label,
    )

    rules = {"x": ["apple", "pear"], "y": ["pear", "plum", "kiwi"]}
    docs = spark.createDataFrame(
        [
            (1, "apple apple pear"),   # x: 2 distinct, y: 1 -> x
            (2, "pear plum"),          # x: 1, y: 2 -> y
            (3, "pear kiwi apple plum"),  # x: 2, y: 3 -> y
            (4, "nothing matches"),    # abstain
            (5, "pear"),               # tie 1-1 -> label asc -> x
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["label"], r["n_hits"], r["n_labels_hit"])
        for r in weak_label(docs, "text", "doc_id", rules).collect()
    }
    assert got[1] == ("x", 2, 2)
    assert got[2] == ("y", 2, 2)
    assert got[3] == ("y", 3, 2)
    assert got[4] == ("__abstain", 0, 0)
    assert got[5] == ("x", 1, 2)


def test_weak_label_validation(spark):
    import pytest as _pytest

    from redshift_to_pendo_api_data_pipeline_spark.operators.classifier import (
        weak_label,
    )

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="rule"):
        weak_label(docs, "text", "doc_id", {})
