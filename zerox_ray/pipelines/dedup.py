"""Near-duplicate detection suites: MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine — the scale-out dedup operators a training-data pipeline
needs (none exist in the reference; SURVEY §2.8).

Scale design (the part that matters at 10^12 docs):
- signatures are computed per batch, vectorized (numpy minhash over
  crc64 shingle hashes);
- LSH banding explodes each doc into (band_id, band_key) rows, and the
  ONLY shuffle is the groupby on those keys — candidate generation never
  compares all pairs;
- candidate pairs are verified with exact similarity. At sandbox scale
  the verify stage broadcasts the needed columns via ``ray.put`` (small
  side); at 10^12-doc scale you'd replace the broadcast with a
  hash-partitioned re-join of (doc_id → tokens) on the candidate ids —
  the stage boundary is the same, only the lookup impl changes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray
import ray.data

from zerox_ray.functions.hashing import (
    band_keys,
    crc64_array,
    hamming64,
    jaccard,
    minhash_params,
    minhash_signature,
    rolling_fingerprint,
    simhash64,
    token_shingles,
)
from zerox_ray.functions.text import TOKEN_RE

PPM = 1_000_000


# --- MinHash + LSH -----------------------------------------------------------


class MinHashBander:
    """map_batches: documents → (band_id, band_key, doc_id) LSH rows.
    Permutation params are built once per actor/worker (seeded)."""

    def __init__(self, k: int = 64, n_bands: int = 16, shingle_n: int = 3):
        self.a, self.b = minhash_params(k)
        self.n_bands = n_bands
        self.shingle_n = shingle_n

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, bands, keys = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = TOKEN_RE.findall(text)
            sig = minhash_signature(
                crc64_array(token_shingles(toks, self.shingle_n)), self.a, self.b
            )
            for band_id, key in enumerate(band_keys(sig, self.n_bands)):
                doc_ids.append(doc_id)
                bands.append(band_id)
                keys.append(key)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "band_id": pd.Series(bands, dtype="int64"),
                "band_key": pd.Series(keys, dtype="int64"),
            }
        )


def _bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """One LSH bucket → candidate pairs (a < b)."""
    ids = sorted(set(df["doc_id"].tolist()))
    a_out, b_out = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a_out.append(ids[i])
            b_out.append(ids[j])
    return pd.DataFrame(
        {"doc_a": pd.Series(a_out, dtype="int64"), "doc_b": pd.Series(b_out, dtype="int64")}
    )


class JaccardVerifier:
    """Verify candidate pairs with EXACT shingle Jaccard.

    Broadcast lookup: the docs table ref is ``ray.put`` once on the
    driver; each worker `ray.get`s it once (zero-copy read of the Arrow
    table). Scale path: swap for a partitioned re-join on doc_id."""

    def __init__(self, docs_ref, shingle_n: int, threshold_ppm: int):
        table = ray.get(docs_ref)
        self.texts = dict(zip(table["doc_id"].to_pylist(), table["text"].to_pylist()))
        self.shingle_n = shingle_n
        self.threshold_ppm = threshold_ppm
        self._cache: dict[int, set] = {}

    def _shingles(self, doc_id: int) -> set:
        if doc_id not in self._cache:
            toks = TOKEN_RE.findall(self.texts[doc_id])
            self._cache[doc_id] = set(token_shingles(toks, self.shingle_n))
        return self._cache[doc_id]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_a": [], "doc_b": [], "jaccard_ppm": []}
        for a, b in zip(df["doc_a"], df["doc_b"]):
            j = int(jaccard(self._shingles(int(a)), self._shingles(int(b))) * PPM)
            if j >= self.threshold_ppm:
                rows["doc_a"].append(int(a))
                rows["doc_b"].append(int(b))
                rows["jaccard_ppm"].append(j)
        return pd.DataFrame(
            {k: pd.Series(v, dtype="int64") for k, v in rows.items()}
        )


def minhash_lsh_pairs(
    sf_dir: str,
    k: int = 64,
    n_bands: int = 16,
    shingle_n: int = 3,
    threshold_ppm: int = 500_000,
) -> ray.data.Dataset:
    """Full MinHash-LSH near-dup pipeline:
    shingle → minhash → band rows → groupby(band) → candidate pairs →
    dedupe pairs → exact-Jaccard verify → (doc_a, doc_b, jaccard_ppm)."""
    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    bands = ds.map_batches(
        MinHashBander(k, n_bands, shingle_n), batch_format="pandas"
    )
    cands = bands.groupby(["band_id", "band_key"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    # a pair surfaces once per colliding band — dedupe before the
    # (expensive) verify stage with an aggregating groupby (partial
    # combine inside each block, then a small shuffle)
    uniq = cands.groupby(["doc_a", "doc_b"]).count().select_columns(["doc_a", "doc_b"])
    docs_ref = ray.put(pq.read_table(path, columns=["doc_id", "text"]))
    return uniq.map_batches(
        JaccardVerifier,
        fn_constructor_kwargs={
            "docs_ref": docs_ref,
            "shingle_n": shingle_n,
            "threshold_ppm": threshold_ppm,
        },
        batch_format="pandas",
        concurrency=(1, 4),
    )


# --- SimHash -----------------------------------------------------------------


def _simhash_batch(df: pd.DataFrame) -> pd.DataFrame:
    # shingle features, not unigrams: unigram simhash is degenerate on
    # small-vocabulary corpora (every doc votes with the same words)
    sigs = [
        simhash64(token_shingles(TOKEN_RE.findall(t))) for t in df["text"]
    ]
    out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64")})
    # store as int64 bit-pattern (Arrow-friendly); 4×16-bit block keys for
    # hamming-distance blocking (docs within hamming k<=3 share >=1 block)
    s = np.array(sigs, dtype=np.uint64)
    out["simhash"] = s.astype(np.int64)
    for blk in range(4):
        out[f"block{blk}"] = ((s >> np.uint64(16 * blk)) & np.uint64(0xFFFF)).astype(
            "int64"
        )
    return out


def simhash_signatures(sf_dir: str) -> ray.data.Dataset:
    """Per-doc 64-bit simhash + the 4 16-bit block keys used for
    hamming-≤3 candidate blocking. Output: (doc_id, simhash, block0..3)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(_simhash_batch, batch_format="pandas")


MAX_BLOCK_DOCS = 512


def _simhash_block_pairs(df: pd.DataFrame, max_hamming: int) -> pd.DataFrame:
    rows = {"doc_a": [], "doc_b": [], "hamming": []}
    recs = sorted(
        zip(df["doc_id"].tolist(), df["simhash"].tolist())
    )
    if len(recs) > MAX_BLOCK_DOCS:
        # degenerate block (hash collapse) — cap the quadratic blow-up to
        # the first MAX_BLOCK_DOCS ids; NOT silent: emit a sentinel row
        # (doc_a = doc_b = -1, hamming = block size) so callers see it.
        rows["doc_a"].append(-1)
        rows["doc_b"].append(-1)
        rows["hamming"].append(len(recs))
        recs = recs[:MAX_BLOCK_DOCS]
    for i in range(len(recs)):
        for j in range(i + 1, len(recs)):
            h = hamming64(recs[i][1] & ((1 << 64) - 1), recs[j][1] & ((1 << 64) - 1))
            if h <= max_hamming:
                rows["doc_a"].append(recs[i][0])
                rows["doc_b"].append(recs[j][0])
                rows["hamming"].append(h)
    return pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in rows.items()})


def _explode_simhash_blocks(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, simhash, block0..3) → 4 rows (doc_id, simhash, block_id, key).

    One exploded table + ONE groupby replaces four groupby branches over a
    shared upstream — at scale a union of N groupbys re-executes the
    signature stage N times and runs N all-to-all shuffles; this runs one."""
    parts = []
    for blk in range(4):
        parts.append(
            pd.DataFrame(
                {
                    "doc_id": df["doc_id"].astype("int64"),
                    "simhash": df["simhash"].astype("int64"),
                    "block_id": np.full(len(df), blk, dtype=np.int64),
                    "key": df[f"block{blk}"].astype("int64"),
                }
            )
        )
    return pd.concat(parts, ignore_index=True)


def simhash_pairs(sf_dir: str, max_hamming: int = 3) -> ray.data.Dataset:
    """SimHash near-dup pairs: block on the 4 16-bit sub-keys (pigeonhole:
    hamming ≤3 ⇒ at least one identical block), verify exact hamming
    within blocks, dedupe. Output: (doc_a, doc_b, hamming)."""
    exploded = simhash_signatures(sf_dir).map_batches(
        _explode_simhash_blocks, batch_format="pandas"
    )
    pairs = exploded.groupby(["block_id", "key"]).map_groups(
        lambda g: _simhash_block_pairs(g, max_hamming), batch_format="pandas"
    )
    # a pair surfaces once per colliding block — collapse with a cheap
    # partial-aggregating groupby (not map_groups-per-pair)
    uniq = pairs.groupby(["doc_a", "doc_b"]).min("hamming")
    return uniq.map_batches(
        lambda df: df.rename(columns={"min(hamming)": "hamming"}),
        batch_format="pandas",
    )


# --- n-gram Jaccard with cheap blocking --------------------------------------


def _block_key_batch(df: pd.DataFrame, shingle_n: int) -> pd.DataFrame:
    """Blocking key = crc of the doc's lexicographically-smallest shingle
    (identical for any two docs sharing their rarest... smallest shingle);
    a cheap deterministic blocker that guarantees exact-dup capture."""
    keys = []
    for t in df["text"]:
        sh = token_shingles(TOKEN_RE.findall(t), shingle_n)
        keys.append(int(crc64_array([min(sh)] if sh else [b""])[0]) & 0x7FFFFFFF)
    return pd.DataFrame({"doc_id": df["doc_id"].astype("int64"), "block": pd.Series(keys, dtype="int64"), "text": df["text"]})


def _jaccard_block_pairs(df: pd.DataFrame, shingle_n: int, threshold_ppm: int) -> pd.DataFrame:
    recs = sorted(zip(df["doc_id"].tolist(), df["text"].tolist()))
    shingles = [set(token_shingles(TOKEN_RE.findall(t), shingle_n)) for _, t in recs]
    rows = {"doc_a": [], "doc_b": [], "jaccard_ppm": []}
    for i in range(len(recs)):
        for j in range(i + 1, len(recs)):
            jp = int(jaccard(shingles[i], shingles[j]) * PPM)
            if jp >= threshold_ppm:
                rows["doc_a"].append(recs[i][0])
                rows["doc_b"].append(recs[j][0])
                rows["jaccard_ppm"].append(jp)
    return pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in rows.items()})


def ngram_jaccard_pairs(
    sf_dir: str, shingle_n: int = 3, threshold_ppm: int = 800_000
) -> ray.data.Dataset:
    """Exact n-gram-Jaccard dedup within deterministic blocks.
    Output: (doc_a, doc_b, jaccard_ppm)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    blocked = ds.map_batches(
        lambda df: _block_key_batch(df, shingle_n), batch_format="pandas"
    )
    return blocked.groupby("block").map_groups(
        lambda g: _jaccard_block_pairs(g, shingle_n, threshold_ppm),
        batch_format="pandas",
    )


# --- embedding-cosine near-dup ----------------------------------------------


class HyperplaneBander:
    """Random-hyperplane (sign) LSH over an embedding column: 64-bit sign
    sketch split into 16-bit blocks as bucket keys (seeded planes built
    once per worker)."""

    def __init__(self, dim: int, n_bits: int = 64, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, n_bits))

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(df["embedding"].to_numpy())
        signs = (emb @ self.planes) > 0
        sketch = np.packbits(signs.astype(np.uint8), axis=1, bitorder="little").view(
            np.uint64
        )[:, 0]
        # explode: 4 rows per vector (block_id, key) so candidate
        # generation is ONE groupby shuffle, not four
        n = len(df)
        vec_ids = df["vec_id"].astype("int64").to_numpy()
        out = {
            "vec_id": np.tile(vec_ids, 4),
            "block_id": np.repeat(np.arange(4, dtype=np.int64), n),
            "key": np.concatenate(
                [
                    ((sketch >> np.uint64(16 * blk)) & np.uint64(0xFFFF)).astype(
                        np.int64
                    )
                    for blk in range(4)
                ]
            ),
        }
        return pd.DataFrame(out)


class CosineVerifier:
    """Exact cosine over candidate pairs via a broadcast embedding matrix."""

    def __init__(self, emb_ref, threshold_ppm: int):
        table = ray.get(emb_ref)
        ids = np.asarray(table["vec_id"].to_pylist())
        mat = np.array(table["embedding"].to_pylist(), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        self.row = {int(i): mat[j] for j, i in enumerate(ids)}
        self.threshold_ppm = threshold_ppm

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"vec_a": [], "vec_b": [], "cosine_ppm": []}
        for a, b in zip(df["vec_a"], df["vec_b"]):
            c = int(float(self.row[int(a)] @ self.row[int(b)]) * PPM)
            if c >= self.threshold_ppm:
                rows["vec_a"].append(int(a))
                rows["vec_b"].append(int(b))
                rows["cosine_ppm"].append(c)
        return pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in rows.items()})


def _vec_block_pairs(df: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(set(df["vec_id"].tolist()))
    a_out, b_out = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a_out.append(ids[i])
            b_out.append(ids[j])
    return pd.DataFrame(
        {"vec_a": pd.Series(a_out, dtype="int64"), "vec_b": pd.Series(b_out, dtype="int64")}
    )


def embedding_near_dup(
    sf_dir: str, threshold_ppm: int = 900_000, n_bits: int = 64
) -> ray.data.Dataset:
    """Embedding-cosine near-dup: sign-LSH bucketing → candidate pairs →
    exact cosine verify. Output: (vec_a, vec_b, cosine_ppm)."""
    path = f"{sf_dir}/embeddings.parquet"
    meta = pq.read_table(path, columns=["embedding"]).slice(0, 1)
    dim = len(meta["embedding"][0].as_py())
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    sk = ds.map_batches(
        HyperplaneBander,
        fn_constructor_kwargs={"dim": dim, "n_bits": n_bits},
        batch_format="pandas",
        concurrency=(1, 4),
    )
    cands = sk.groupby(["block_id", "key"]).map_groups(
        _vec_block_pairs, batch_format="pandas"
    )
    uniq = cands.groupby(["vec_a", "vec_b"]).count().select_columns(["vec_a", "vec_b"])
    emb_ref = ray.put(pq.read_table(path, columns=["vec_id", "embedding"]))
    return uniq.map_batches(
        CosineVerifier,
        fn_constructor_kwargs={"emb_ref": emb_ref, "threshold_ppm": threshold_ppm},
        batch_format="pandas",
        concurrency=(1, 4),
    )


# --- document fingerprint ----------------------------------------------------


def _fingerprint_batch(df: pd.DataFrame) -> pd.DataFrame:
    fps = [rolling_fingerprint(TOKEN_RE.findall(t)) for t in df["text"]]
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].astype("int64"),
            # int64 bit-pattern of the uint64 fingerprint (Arrow-friendly)
            "fingerprint": pd.Series(
                np.array(fps, dtype=np.uint64).astype(np.int64), dtype="int64"
            ),
        }
    )


def doc_fingerprints(sf_dir: str) -> ray.data.Dataset:
    """Order-sensitive rolling-hash fingerprints (exact-dup detection that
    survives column pruning: fingerprint equality ⇔ same token stream).
    Output: (doc_id, fingerprint)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(_fingerprint_batch, batch_format="pandas")
