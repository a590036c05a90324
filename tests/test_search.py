"""BM25 keyword search: exact-integer scoring, partial-top-k merge."""

import numpy as np
import pandas as pd

from zerox_ray.pipelines.search import (
    _corpus_stats,
    _term_scores,
    search_bm25,
)


def _reference_bm25(texts, terms, k):
    """Single-process golden: same integer formula, naive full scan."""
    toks = [t.split(" ") for t in texts]
    n = len(texts)
    total = sum(len(x) for x in toks)
    a = max(1, total // n)
    dfs = {t: sum(1 for x in toks if t in x) for t in terms}
    rows = []
    for did, x in enumerate(toks):
        dl = len(x)
        score = 0
        for t in terms:
            tf, df = x.count(t), dfs[t]
            if tf and df:
                score += (1_000_000 * 22 * a * tf * n) // (
                    df * (10 * a * tf + 3 * a + 9 * dl)
                )
        if score > 0:
            rows.append((did, score))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


def test_matches_single_process_golden(sf_dir):
    import pyarrow.parquet as pq

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    got = search_bm25(sf_dir).to_pandas()
    by_id = dict(zip(docs.doc_id, docs.text))
    # goldens computed on texts indexed by doc_id (doc_ids are 0..n-1)
    texts = [by_id[i] for i in range(len(docs))]
    exp = _reference_bm25(texts, ["table", "window", "merge"], 10)
    assert list(zip(got.doc_id, got.score_ppm)) == exp
    assert got["rank"].tolist() == list(range(1, len(exp) + 1))


def test_term_scores_numpy_and_bigint_paths_agree():
    tf = np.array([0, 1, 3, 7], dtype=np.int64)
    dl = np.array([10, 20, 30, 40], dtype=np.int64)
    fast = _term_scores(tf, dl, df_t=2, a=25, n=100)
    # force the bigint path by faking a huge corpus constant
    slow = [
        0 if t == 0 else (1_000_000 * 22 * 25 * int(t) * 100)
        // (2 * (10 * 25 * int(t) + 3 * 25 + 9 * int(d)))
        for t, d in zip(tf, dl)
    ]
    assert fast.tolist() == slow


def test_absent_term_contributes_nothing(sf_dir):
    base = search_bm25(sf_dir, terms=("table",)).to_pandas()
    plus = search_bm25(sf_dir, terms=("table", "zzznotaword")).to_pandas()
    assert base.equals(plus)


def test_corpus_stats_token_total(sf_dir):
    import pyarrow.parquet as pq

    total, dfs = _corpus_stats(sf_dir, ("table",))
    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    assert total == sum(len(t.split(" ")) for t in texts)
    assert dfs["table"] == sum(1 for t in texts if "table" in t.split(" "))
