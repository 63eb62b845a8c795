"""Property test for the BPE safe-batch rule (operators/text.py
_safe_merge_batch): on ANY corpus, accepting the provably-safe prefix of
the ranked pair list and applying it in one scan must reproduce the
strictly-sequential merge list exactly. Pure-Python simulation of the
distributed loop (Counter-based counts stand in for the groupBy; the
ranking and the one-scan merge are the same code paths), so hypothesis
can hammer hundreds of random corpora without a Spark job.

This guards the round-4 proof obligations directly:
- mutual symbol-disjointness (no destroyed/created instances in-batch),
- the concat-collision guard ((a,bc) minting 'abc' while ('x','abc') or
  ('abc','y') sits in the batch),
- the unskipped-prefix rule,
- the strict count gap at the boundary (outside pairs tying an accepted
  count could win the lexicographic tiebreak mid-replay).
"""

from collections import Counter

from hypothesis import given, settings, strategies as st

from redshift_to_pendo_api_data_pipeline_spark.operators.text import (
    _bpe_train_local,
    _safe_merge_batch,
)


class _Row(dict):
    def __getitem__(self, k):
        return dict.__getitem__(self, k)


def _pair_rows(vocab):
    c = Counter()
    for syms, w in vocab:
        for i in range(len(syms) - 1):
            c[(syms[i], syms[i + 1])] += w
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    return [_Row(a=a, b=b, n=n) for (a, b), n in ranked]


def _apply_batch(vocab, batch):
    pair_set = frozenset(batch)
    for syms, _w in vocab:
        out, i, size = [], 0, len(syms)
        while i < size:
            if i + 1 < size and (syms[i], syms[i + 1]) in pair_set:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms[:] = out


def _batched_train(vocab, n_merges, cap):
    merges = []
    while len(merges) < n_merges:
        rows = _pair_rows(vocab)[: min(cap, n_merges - len(merges)) + 1]
        if not rows or rows[0]["n"] < 2:
            break
        batch = _safe_merge_batch(rows, min(cap, n_merges - len(merges)))
        if not batch:
            break
        merges.extend(batch)
        _apply_batch(vocab, batch)
    return merges[:n_merges]


# small alphabets maximize pair collisions, ties, and concat traps
words_strategy = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=8),
    min_size=1, max_size=30,
)


@settings(max_examples=300, deadline=None)
@given(words=words_strategy, cap=st.integers(min_value=1, max_value=8))
def test_safe_batch_equals_sequential(words, cap):
    wc = Counter(words)
    vocab_a = [(list(w), n) for w, n in sorted(wc.items())]
    vocab_b = [(list(w), n) for w, n in sorted(wc.items())]
    want = _bpe_train_local(vocab_a, n_merges=12)
    got = _batched_train(vocab_b, n_merges=12, cap=cap)
    assert got == want


@settings(max_examples=150, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=10),
        min_size=1, max_size=20,
    ),
    cap=st.integers(min_value=2, max_value=6),
)
def test_safe_batch_equals_sequential_binary_alphabet(words, cap):
    """Two-symbol alphabet: maximal tie density and self-adjacent chains
    (aaa..., abab...) — the concat-collision guard's worst case."""
    wc = Counter(words)
    vocab_a = [(list(w), n) for w, n in sorted(wc.items())]
    vocab_b = [(list(w), n) for w, n in sorted(wc.items())]
    assert _batched_train(vocab_b, 16, cap) == _bpe_train_local(vocab_a, 16)
