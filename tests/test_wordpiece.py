"""WordPiece tokenizer (text.wordpiece_train / wordpiece_segment_words):
likelihood-gain pair scoring pinned against a pure-Python token-stream
reference, greedy longest-match segmentation semantics, and the staged
(word, token, k) mapping contract shared with BPE."""

from __future__ import annotations

from collections import Counter

from redshift_to_pendo_api_data_pipeline_spark.operators.text import (
    wordpiece_segment_greedy,
    wordpiece_segment_words,
    wordpiece_train,
)


def _reference_train(corpus_words: list[str], n_merges: int) -> list[str]:
    """Token-stream reference trainer: no distinct-word reduction, raw
    occurrence loops — the slow obvious implementation the distributed
    one must match bit-for-bit."""
    rows = [[w[0]] + ["##" + c for c in w[1:]] for w in corpus_words]
    pieces = sorted({s for r in rows for s in r})
    for _ in range(n_merges):
        sym_n: Counter = Counter()
        pair_n: Counter = Counter()
        for r in rows:
            sym_n.update(r)
            for i in range(len(r) - 1):
                pair_n[(r[i], r[i + 1])] += 1
        best = None
        for pair, n in pair_n.items():
            if n < 2:
                continue
            na, nb = sym_n[pair[0]], sym_n[pair[1]]
            if best is None:
                best = (pair, n, na, nb)
                continue
            lhs = n * best[2] * best[3]
            rhs = best[1] * na * nb
            if lhs > rhs or (lhs == rhs and pair < best[0]):
                best = (pair, n, na, nb)
        if best is None:
            break
        a, b = best[0]
        ab = a + (b[2:] if b.startswith("##") else b)
        pieces.append(ab)
        for r in rows:
            out, i = [], 0
            while i < len(r):
                if i + 1 < len(r) and r[i] == a and r[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(r[i])
                    i += 1
            r[:] = out
    return pieces


def test_wordpiece_train_matches_reference(spark):
    corpus = ["hugs"] * 10 + ["hug"] * 5 + ["pug"] * 4 + ["pun"] * 6 + [
        "bun"
    ] * 3
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(corpus)], "doc_id long, text string"
    )
    got = wordpiece_train(df, "text", n_merges=6)
    want = _reference_train(corpus, 6)
    assert got == want
    # the likelihood score must NOT pick the raw-frequency winner:
    # BPE's first merge here is ('u','##g') (count 19); WordPiece
    # divides by the huge count of '##u'/'##g' and prefers a rarer,
    # higher-gain pair
    first_merged = got[len([p for p in got if len(p.lstrip("#")) == 1]):]
    assert first_merged[0] != "ug"


def test_wordpiece_greedy_longest_match():
    vocab = {"un", "##aff", "##able", "##ab", "u", "##n", "[UNK]"}
    assert wordpiece_segment_greedy("unaffable", vocab) == [
        "un", "##aff", "##able",
    ]
    # no continuation for 'z' -> whole word is UNK
    assert wordpiece_segment_greedy("unz", vocab) == ["[UNK]"]
    # single-char word present directly
    assert wordpiece_segment_greedy("u", vocab) == ["u"]


def test_wordpiece_segment_words_mapping(spark):
    df = spark.createDataFrame(
        [(1, "banana bandana banana")], "doc_id long, text string"
    )
    vocab = wordpiece_train(df, "text", n_merges=4)
    mapping = {
        (r["word"], r["token"]): r["k"]
        for r in wordpiece_segment_words(df, "text", vocab).collect()
    }
    # mapping covers exactly the distinct words, k sums to piece counts
    words = {w for w, _ in mapping}
    assert words == {"banana", "bandana"}
    for w in words:
        pieces = wordpiece_segment_greedy(w, set(vocab))
        assert sum(k for (ww, _), k in mapping.items() if ww == w) == len(
            pieces
        )
