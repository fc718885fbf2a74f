"""Semantic tests for the corpus-curation operators (operators/corpus.py)
beyond the DuckDB hash parity that test_oracle_parity / the partition
stress suite already enforce:

- decontamination is cross-checked against an independent pure-python
  n-gram oracle (no SQL engine involved), so a shared mistake in the
  two SQL formulations cannot hide;
- the domain mix is verified to actually rebalance (near-uniform
  output mix from a skewed input) and to be a deterministic subset;
- percentiles are verified to be *elements* of their group (the
  PERCENTILE_DISC contract) and monotone across fractions;
- the broadcast-side contracts (eval grams / rate table broadcast,
  corpus never on the build side) are pinned via plan assertions.
"""

from __future__ import annotations

import pandas as pd
import pytest

from fraud_detection_spark.operators.corpus import _EVAL_MOD, _NGRAM
from fraud_detection_spark.plans.checks import assert_broadcast_join
from fraud_detection_spark.registry import load_all

REGISTRY = load_all()


def _python_decontaminate(docs: pd.DataFrame) -> pd.DataFrame:
    """Independent oracle: pure-python 8-gram overlap, no SQL engine."""

    def grams(text: str) -> set[str]:
        w = text.split(" ")
        return {
            " ".join(w[i : i + _NGRAM]) for i in range(len(w) - _NGRAM + 1)
        }

    eval_grams: set[str] = set()
    for _, r in docs[docs.doc_id % _EVAL_MOD == 0].iterrows():
        eval_grams |= grams(r.text)
    out = []
    for _, r in docs[docs.doc_id % _EVAL_MOD != 0].iterrows():
        n = len(grams(r.text) & eval_grams)
        out.append((r.doc_id, n, 1 if n > 0 else 0))
    return pd.DataFrame(out, columns=["doc_id", "n_shared_ngrams", "contaminated"])


def test_decontaminate_matches_python_oracle(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = _python_decontaminate(docs).sort_values("doc_id").reset_index(drop=True)
    got = (
        REGISTRY["q_decontaminate"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "n_shared_ngrams": "int64", "contaminated": "int64"}),
        want.astype({"doc_id": "int64", "n_shared_ngrams": "int64", "contaminated": "int64"}),
    )
    # the fixture corpus must actually exercise the positive path
    assert got.contaminated.sum() > 0, "no contaminated docs — test corpus degenerate"


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    assert_broadcast_join(REGISTRY["q_decontaminate"].fn(spark, sf_dir))


def test_domain_mix_rebalances(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    got = REGISTRY["q_domain_mix"].fn(spark, sf_dir).toPandas()
    in_counts = docs.lang.value_counts()
    out_counts = got.lang.value_counts()
    # skewed in (the corpus is en-heavy), near-uniform out: every
    # language's kept count concentrates around the smallest language's
    # size (rate-based sampling => binomial jitter, allow ±40%)
    target = in_counts.min()
    assert in_counts.max() > 1.5 * in_counts.min(), "input not skewed; test degenerate"
    for lang, n in out_counts.items():
        assert 0.6 * target <= n <= 1.4 * target, (lang, n, target)
        assert n <= in_counts[lang]
    # deterministic subset of the corpus
    assert set(got.doc_id) <= set(docs.doc_id)
    again = REGISTRY["q_domain_mix"].fn(spark, sf_dir).toPandas()
    assert sorted(got.doc_id) == sorted(again.doc_id)


def test_domain_mix_broadcasts_rate_table(spark, sf_dir):
    assert_broadcast_join(REGISTRY["q_domain_mix"].fn(spark, sf_dir))


def test_percentiles_are_group_elements_and_monotone(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    got = REGISTRY["q_percentiles"].fn(spark, sf_dir).toPandas()
    assert set(got.lang) == set(docs.lang)
    cols = ["p25", "p50", "p75", "p90", "p99"]
    for _, r in got.iterrows():
        vals = set(docs[docs.lang == r.lang].n_chars.astype(int))
        for c in cols:
            assert int(r[c]) in vals, (r.lang, c, r[c])
        assert list(r[cols]) == sorted(r[cols]), r.lang


@pytest.mark.parametrize("frac,idx", [(0.25, 2), (0.5, 4), (0.75, 7), (0.9, 8)])
def test_percentile_disc_definition(spark, frac, idx):
    """Pin the SQL-standard cume_dist ≥ fraction definition on a known
    10-element set (1..10) so an engine-side semantic change is caught
    even if both engines drift together on the real data."""
    row = spark.sql(
        f"SELECT percentile_disc({frac}) WITHIN GROUP (ORDER BY x) AS p "
        "FROM VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10) t(x)"
    ).collect()[0]
    assert int(row.p) == idx + 1
