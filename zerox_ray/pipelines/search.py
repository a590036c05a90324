"""Distributed keyword search (BM25 top-k) over the documents corpus.

The reference engine has no search operator; a training-data platform
needs one (corpus triage, query-based subset extraction). The ranking is
BM25 with the standard k1=1.2, b=0.75 — expressed in EXACT integer
arithmetic so the DuckDB oracle can value-check every score bit-for-bit:

- idf is the LINEAR form N/df (same rationale as tfidf_top_terms: log-idf
  would hang correctness on libm rounding; linear idf preserves the
  ranking for single-corpus scoring),
- avgdl is floored to an integer A = T // N (documented contract; the
  error vs true avgdl is < 1 token and identical on both sides),
- per-term score_ppm = floor(1e6 * (N/df) * tf*(k1+1) / (tf + k1*(1-b) +
  k1*b*dl/A)) — multiplying numerator and denominator by 10*A turns it
  into a pure integer ratio:

      score_ppm(t,d) = (1_000_000 * 22*A*tf*N) // (df * (10*A*tf + 3*A + 9*dl))

  (k1+1 = 11/5, k1*(1-b) = 3/10, k1*b = 9/10 — all over the common 10*A).

Scale shape (the 100 TB shape):
1. ONE stats pass over (text) computes T (total tokens) and df per query
   term as per-batch partials → one tiny grouped sum (|Q|+1 rows) —
   a scalar-sized broadcast, like the N every idf needs.
2. ONE scoring pass over (doc_id, text): vectorized token counts
   (pandas str.count with an anchored pattern ≡ exact token equality),
   integer BM25 per term, per-batch partial top-k — so the final
   exchange moves ≤ k rows per batch, never the corpus.
3. A k-row global merge picks the top k with a deterministic tie-break
   (score desc, doc_id asc).

Tokenization contract: tokens are the result of splitting on a single
space — exactly DuckDB's string_split(text, ' ') — so tf/dl match the
oracle on double spaces and empty strings too.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

from zerox_ray.pipelines.agg import bucketed_group_agg
from zerox_ray.sources.tables import read_table, table_num_rows

#: default probe query — terms present in every sf of the synthetic corpus
DEFAULT_QUERY = ("table", "window", "merge")
DEFAULT_K = 10

_TOTAL_KEY = "\x00total_tokens"  # NUL-prefixed: cannot collide with a term


def _token_count_pattern(term: str) -> str:
    """Anchored occurrence pattern: matches ``term`` exactly when it is a
    whole space-delimited token (run of non-space chars between spaces /
    string edges) — equivalent to counting x == term over split(' ')."""
    return r"(?:^| )" + re.escape(term) + r"(?= |$)"


def _corpus_stats(sf_dir: str, terms: tuple[str, ...]) -> tuple[int, dict[str, int]]:
    """(total token count T, df per query term) in one pruned pass.
    Partials are (term, df, toks) rows — |Q|+1 rows per BATCH — merged by
    one tiny grouped sum; only that |Q|+1-row table reaches the driver."""
    pats = {t: _token_count_pattern(t) for t in terms}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = int((df["text"].str.count(" ") + 1).sum())
        rows = [(_TOTAL_KEY, 0, toks)]
        for t, pat in pats.items():
            rows.append((t, int((df["text"].str.count(pat) > 0).sum()), 0))
        return pd.DataFrame(rows, columns=["term", "df", "toks"]).astype(
            {"df": "int64", "toks": "int64"}
        )

    ds = read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    merged = bucketed_group_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["term"],
        {"df": ("df", "sum"), "toks": ("toks", "sum")},
    ).to_pandas()
    by_term = dict(zip(merged["term"], merged["df"].astype(int)))
    total = int(merged.loc[merged["term"] == _TOTAL_KEY, "toks"].sum())
    return total, {t: by_term.get(t, 0) for t in terms}


def _term_scores(
    tf: np.ndarray, dl: np.ndarray, df_t: int, a: int, n: int
) -> np.ndarray:
    """Exact integer BM25 contribution of one term (ppm). Uses numpy
    int64 when the numerator provably fits, else Python bigints — the
    scores are identical, only the kernel changes (the bigint path is
    the >2^62 regime: huge corpora, where the per-batch candidate set is
    still small because tf > 0 filters first)."""
    out = np.zeros(len(tf), dtype=np.int64)
    nz = np.flatnonzero(tf)
    if df_t <= 0 or len(nz) == 0:
        return out
    tfn = tf[nz].astype(np.int64)
    dln = dl[nz].astype(np.int64)
    c = 1_000_000 * 22 * a * n
    if c * int(tfn.max()) < 2**62:
        num = c * tfn
        den = df_t * (10 * a * tfn + 3 * a + 9 * dln)
        out[nz] = num // den
    else:  # pragma: no cover - exercised only at extreme corpus sizes
        out[nz] = [
            (c * int(t)) // (df_t * (10 * a * int(t) + 3 * a + 9 * int(d)))
            for t, d in zip(tfn, dln)
        ]
    return out


def search_bm25(
    sf_dir: str,
    terms: tuple[str, ...] = DEFAULT_QUERY,
    k: int = DEFAULT_K,
) -> ray.data.Dataset:
    """BM25 top-k document search for a bag-of-words query.
    Output: (doc_id, score_ppm, rank), rank 1..k, ties broken on doc_id.
    Duplicate query terms are deduplicated (each DISTINCT term scores
    once) — declared contract, since the pats/dfs maps key by term.
    """
    terms = tuple(dict.fromkeys(terms))
    n = table_num_rows(f"{sf_dir}/documents.parquet")
    if n == 0:  # empty corpus → empty result, not a ZeroDivisionError
        import pyarrow as pa
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "score_ppm": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        )
    total, dfs = _corpus_stats(sf_dir, terms)
    a = max(1, total // n)  # floored avgdl (see module docstring)
    pats = {t: _token_count_pattern(t) for t in terms}

    def score_batch(df: pd.DataFrame) -> pd.DataFrame:
        dl = (df["text"].str.count(" ") + 1).to_numpy(dtype=np.int64)
        score = np.zeros(len(df), dtype=np.int64)
        for t, pat in pats.items():
            tf = df["text"].str.count(pat).to_numpy(dtype=np.int64)
            score += _term_scores(tf, dl, dfs[t], a, n)
        out = pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "score_ppm": score}
        )
        out = out[out["score_ppm"] > 0]
        # partial top-k: the exchange moves ≤ k rows per batch
        out = out.sort_values(
            ["score_ppm", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return out.assign(g=np.int64(0))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score_ppm", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(dtype=np.int64),
                "score_ppm": g["score_ppm"].to_numpy(dtype=np.int64),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    partials = ds.map_batches(score_batch, batch_format="pandas")
    return partials.groupby("g").map_groups(finish, batch_format="pandas")
