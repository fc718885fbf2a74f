"""Cross-implementation tests for q_bpe_tokens (operators/text.py).

The DuckDB oracle already pins the Spark output bit-exactly
(test_oracle_parity / partition stress), but Spark and the oracle share
the same merge-table design — so these tests add a genuinely
independent check: a DIFFERENT BPE algorithm (sequential
apply-each-merge-in-rank-order, vs the canonical lowest-rank-pair
loop), which provably agrees only when the merge table is consistent
(each merge's parts precede it). A table edit that silently broke
consistency would split the implementations here before it corrupted
parity.
"""

from __future__ import annotations

import pandas as pd

from fraud_detection_spark.operators.text import _BPE_MERGES, bpe_encode
from fraud_detection_spark.registry import load_all

REGISTRY = load_all()


def _bpe_sequential(word: str) -> list[str]:
    """Independent reimplementation: apply each merge in rank order,
    exhaustively, before moving to the next rank — equivalent to the
    canonical loop iff the merge table is consistent."""
    sym = list(word) + ["</w>"]
    for a, b in _BPE_MERGES:
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_merge_table_is_consistent():
    """Every merge's parts must be single characters or the results of
    strictly earlier merges — the property the single-step oracle and
    the sequential twin both rely on."""
    formed: set[str] = set()
    for a, b in _BPE_MERGES:
        for part in (a, b):
            assert len(part) == 1 or part == "</w>" or part in formed, (
                f"merge ({a!r},{b!r}): part {part!r} not formable yet"
            )
        formed.add(a + b)


def test_bpe_cross_implementation_parity(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    vocab = {w for t in docs.text for w in t.split(" ") if w}
    assert len(vocab) > 10
    for w in sorted(vocab):
        assert bpe_encode(w) == _bpe_sequential(w), w


def test_bpe_is_lossless_and_nontrivial(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    vocab = {w for t in docs.text for w in t.split(" ") if w}
    merged_something = False
    for w in sorted(vocab):
        toks = bpe_encode(w)
        assert "".join(toks) == w + "</w>", w
        if len(toks) < len(w) + 1:
            merged_something = True
    assert merged_something, "merge table never fired on the corpus vocabulary"


def test_bpe_spark_matches_python(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = {}
    memo: dict[str, int] = {}
    for r in docs.itertuples():
        ws = [w for w in r.text.split(" ") if w]
        n = 0
        for w in ws:
            if w not in memo:
                memo[w] = len(bpe_encode(w))
            n += memo[w]
        want[r.doc_id] = (len(ws), n)
    got = REGISTRY["q_bpe_tokens"].fn(spark, sf_dir).toPandas()
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.doc_id] == (r.n_ws_tokens, r.n_bpe_tokens), r.doc_id


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _ALPHABET = "abcdefghinorst"  # covers every char the merge table uses

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet=_ALPHABET, min_size=0, max_size=24))
    def test_bpe_implementations_agree_on_arbitrary_words(w):
        """Property form of the cross-implementation check: the canonical
        lowest-rank-pair loop and the sequential rank-order sweep must
        agree on EVERY string over the merge alphabet (not just the
        corpus vocabulary), and tokenization must stay lossless."""
        a, b = bpe_encode(w), _bpe_sequential(w)
        assert a == b, (w, a, b)
        assert "".join(a) == w + "</w>"

except ImportError:  # hypothesis is baked in; keep the suite importable anyway
    pass
