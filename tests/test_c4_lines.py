"""C4 line-level curation (curation.c4_line_filters /
corpus_line_dedup): planted lines exercise every published rule, and
the corpus line dedup keeps exactly one occurrence per duplicated line
in (doc, pos) order."""

from __future__ import annotations

from redshift_to_pendo_api_data_pipeline_spark.operators.curation import (
    c4_line_filters,
    corpus_line_dedup,
)

GOOD = "alpha beta gamma delta epsilon zeta."


def test_c4_line_filters_rules(spark):
    rows = [
        # survives: 3 good lines
        (1, "\n".join([GOOD, "one two three four five six!",
                       'quoted line with five words here"'])),
        # line attrition: no terminal punct / too short / javascript
        (2, "\n".join([GOOD, GOOD, "no terminal punctuation here",
                       "short line.", "enable javascript to view this."])),
        # doc poison: lorem ipsum
        (3, "\n".join([GOOD, GOOD, GOOD, "lorem ipsum dolor sit amet."])),
        # doc poison: code brace
        (4, "\n".join([GOOD, GOOD, GOOD, "function() { return 1; }."])),
        # too few surviving lines
        (5, "\n".join([GOOD, "no punct line at all", "tiny."])),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           c4_line_filters(df, "text", "doc_id").collect()}
    assert set(out) == {1}
    assert out[1]["n_lines_in"] == 3 and out[1]["n_lines_kept"] == 3
    # doc 2 would survive the doc gates but keeps only 2 of 5 lines
    out2 = {r["doc_id"]: r for r in
            c4_line_filters(df, "text", "doc_id", min_lines=2).collect()}
    assert out2[2]["n_lines_kept"] == 2
    assert "javascript" not in out2[2]["text"]
    assert 3 not in out2 and 4 not in out2  # poison is absolute


def test_corpus_line_dedup_keeps_first_occurrence(spark):
    rows = [
        (1, "shared one.\nunique a."),
        (2, "shared one.\nunique b.\nshared two."),
        (3, "shared two.\nshared one."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           corpus_line_dedup(df, "text", "doc_id").collect()}
    # doc 1 keeps both (first occurrence of 'shared one.')
    assert out[1]["text"] == "shared one.\nunique a."
    # doc 2 loses 'shared one.' but keeps its own 'shared two.' (first)
    assert out[2]["text"] == "unique b.\nshared two."
    # doc 3 loses every line -> dropped entirely
    assert 3 not in out
    assert out[1]["n_lines_kept"] == 2 and out[2]["n_lines_kept"] == 2


def test_corpus_line_dedup_blank_lines_exempt(spark):
    # blank separator lines are structure, not content: EVERY document
    # keeps its blank lines (deduping them corpus-wide would collapse
    # paragraph structure for all but the corpus-first doc)
    rows = [
        (1, "para one.\n\npara two."),
        (2, "alpha.\n\nbeta.\n\ngamma."),
        (3, "para one.\n\npara two."),  # content dupes of doc 1 excise
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           corpus_line_dedup(df, "text", "doc_id").collect()}
    assert out[1]["text"] == "para one.\n\npara two."
    assert out[2]["text"] == "alpha.\n\nbeta.\n\ngamma."
    # doc 3's content lines both excise; its blank line passes through
    assert out[3]["text"] == ""
    assert out[3]["n_lines_kept"] == 1
    # whitespace-only counts as blank
    df2 = spark.createDataFrame(
        [(1, "x.\n \ny."), (2, "z.\n \nw.")], "doc_id long, text string"
    )
    out2 = {r["doc_id"]: r["text"] for r in
            corpus_line_dedup(df2, "text", "doc_id").collect()}
    assert out2[1] == "x.\n \ny." and out2[2] == "z.\n \nw."


def test_cli_curate_c4_and_line_dedup_stages(spark, capsys, tmp_path):
    import json

    from pyspark.sql import functions as F

    from redshift_to_pendo_api_data_pipeline_spark.cli import cmd_curate

    src = str(tmp_path / "in")
    rows = [
        (1, "en", "alpha beta gamma delta epsilon zeta.\nshared line one two three four."),
        (2, "en", "alpha beta gamma delta epsilon zeta.\nshared line one two three four."),
        (3, "en", "no punct here at all\ntiny."),
    ]
    spark.createDataFrame(rows, "doc_id long, lang string, text string") \
        .withColumn("n_chars", F.length("text")) \
        .write.mode("overwrite").parquet(f"{src}/documents.parquet")
    out = str(tmp_path / "curated")
    rc = cmd_curate({
        "input": src, "table": "documents", "output": out,
        "text_col": "text", "id_col": "doc_id",
        "stages": [
            {"kind": "c4_lines", "min_line_words": 4, "min_lines": 1},
            {"kind": "line_dedup"},
        ],
    })
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    att = report["attrition"]
    assert att["input"] == 3 and att["c4_lines"] == 2
    curated = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    # doc 1 keeps both lines; doc 2 keeps nothing after line dedup
    assert set(curated) == {1}
    assert curated[1]["text"].count("\n") == 1
    assert "lang" in next(iter(curated.values())).asDict()  # passthrough cols
