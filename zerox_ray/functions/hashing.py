"""Deterministic hashing primitives for dedup / fingerprinting stages.

Everything here must be stable ACROSS PROCESSES AND RUNS — so no Python
``hash()`` (PYTHONHASHSEED-randomized); the base hash is md5 truncated
to 64 bits (``md5_64``), chosen because it is reproducible in ANSI SQL
(DuckDB ``('0x'||substring(md5(s),1,16))::UBIGINT``) so the driver's
oracle can recompute every signature exactly. The minhash permutation
family is the practical ``(a*x + b) mod 2^64`` wrap-around family with
seeded numpy parameters, and splitmix64 is the shared avalanche mix.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_M64 = (1 << 64) - 1


def _splitmix64_int(x: int) -> int:
    """splitmix64 finalizer — crc32 is linear over GF(2), which makes raw
    crc-derived bits heavily correlated across similar inputs (degenerate
    simhash/minhash on small vocabularies); this multiply-xorshift mix
    breaks the linearity."""
    z = (x + 0x9E3779B97F4A7C15) & _M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


def md5_64_array(items: list[bytes]) -> np.ndarray:
    """64-bit md5-derived hashes (uint64). The dedup family (minhash /
    simhash / jaccard blocking) hashes shingles with THIS because it is
    reproducible in ANSI SQL — DuckDB
    ``('0x'||substring(md5(s),1,16))::UBIGINT`` — which lets the
    driver's oracle recompute every signature exactly (the correctness
    gate is a value-hash compare, so "close" is not enough)."""
    return np.fromiter(
        (int(hashlib.md5(x).hexdigest()[:16], 16) for x in items),
        dtype=np.uint64,
        count=len(items),
    )


def crc32_array(arr: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Batched ``zlib.crc32`` over a pyarrow binary/string column,
    bit-identical to the scalar zlib result (verified in tests), so pid
    layouts / manifests keyed on crc32 are unaffected.

    Zero-copy: slices the Arrow data buffer through one memoryview
    instead of materializing a Python ``bytes`` per row — measured 2.7×
    over the ``to_pylist()`` loop on 50-byte urls. A "true" SIMD
    table-driven numpy crc (one lookup step per byte position across all
    rows) was A/B'd and LOST: 59 ms (length-sorted prefix slices) / 193 ms
    (boolean masks) vs 30 ms for this per-row C call on 100k urls — the
    zlib kernel is too fast per byte for row-parallel numpy to amortize
    its indexing at url-ish lengths."""
    import zlib

    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        if arr.num_chunks == 0:
            return np.empty(0, dtype=np.uint32)
        return np.concatenate([crc32_array(c) for c in arr.chunks])
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    arr = arr.cast(pa.large_binary())
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    if bufs[2] is None:  # all values empty → no data buffer
        return np.zeros(n, dtype=np.uint32)
    mv = memoryview(bufs[2])
    o = offs.tolist()
    crc32 = zlib.crc32
    return np.fromiter(
        (crc32(mv[o[i] : o[i + 1]]) for i in range(n)), dtype=np.uint32, count=n
    )


def minhash_params(k: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """K seeded odd multipliers + offsets for the wrap-around family."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 62, size=k).astype(np.uint64) | np.uint64(1)
    b = rng.randint(0, 1 << 62, size=k).astype(np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n_shingles,) uint64 → (K,) uint64 signature; empty input → all-max."""
    if shingle_hashes.size == 0:
        return np.full(a.shape[0], _MASK64, dtype=np.uint64)
    # (K, n) = a[:,None]*x[None,:] + b[:,None]  (mod 2^64 wrap-around)
    vals = a[:, None] * shingle_hashes[None, :] + b[:, None]
    return vals.min(axis=1)


def band_keys(signature: np.ndarray, n_bands: int) -> list[int]:
    """Split a signature into bands; one deterministic 63-bit key per band
    (LSH bucket keys). Key = md5_64 of ``"band:v0:v1:..."`` (decimal
    signature values), masked to 63 bits — SQL mirror:
    ``md5(band::VARCHAR || ':' || string_agg(h::VARCHAR,':' ORDER BY k))``
    then the same substring/UBIGINT cast and ``% 2^63``."""
    if n_bands <= 0 or signature.shape[0] % n_bands != 0:
        # r=0 would give EVERY doc identical band keys (all-pairs
        # candidate blow-up); a remainder would silently drop trailing
        # signature values — fail loudly instead
        raise ValueError(
            f"signature length {signature.shape[0]} must be a positive "
            f"multiple of n_bands={n_bands}"
        )
    r = signature.shape[0] // n_bands
    # one tolist() up front (python ints) + map(str, ...) measures ~1.7x
    # faster than per-value str(int(v)) — band_keys was 40% of the
    # bander's profile before this; text produced is byte-identical
    vals = signature.tolist()
    out = []
    for i in range(n_bands):
        s = f"{i}:" + ":".join(map(str, vals[i * r : (i + 1) * r]))
        out.append(
            int(hashlib.md5(s.encode()).hexdigest()[:16], 16) & 0x7FFFFFFFFFFFFFFF
        )
    return out


def token_shingles(tokens: list[str], n: int = 3) -> list[bytes]:
    return [" ".join(tokens[i : i + n]).encode() for i in range(len(tokens) - n + 1)]


def simhash64(features: list[str] | list[bytes]) -> int:
    """Classic 64-bit simhash (bit-vote of feature hashes); deterministic.
    Callers pick the feature set — shingles discriminate far better than
    unigrams on small-vocabulary corpora."""
    tokens = features
    if not tokens:
        return 0
    hashes = md5_64_array([t.encode() if isinstance(t, str) else t for t in tokens])
    bits = np.unpackbits(hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    # int64, NOT the default unsigned promotion: negative vote totals must
    # stay negative (uint wrap-around turns them into huge positives and
    # collapses every signature towards all-ones)
    votes = bits.sum(axis=0, dtype=np.int64) * 2 - len(tokens)
    out_bits = (votes > 0).astype(np.uint8)
    return int(np.packbits(out_bits, bitorder="little").view(np.uint64)[0])


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


_FP_BASE = 1_000_003
_FP_MASK = (1 << 64) - 1


def md5_64(data: bytes) -> int:
    """64-bit hash = first 16 hex chars of md5. Chosen over crc64 for the
    fingerprint fold because md5 is computable in ANSI SQL (DuckDB
    ``('0x'||substring(md5(t),1,16))::UBIGINT``), which lets the driver's
    DuckDB oracle recompute fingerprints exactly (value-hash gate)."""
    import hashlib

    return int(hashlib.md5(data).hexdigest()[:16], 16)


def rolling_fingerprint(tokens: list[str]) -> int:
    """Order-sensitive document fingerprint: Horner fold of md5-derived
    token hashes (mod 2^64). Two docs with the same tokens in the same
    order collide; any reorder/edit changes it. SQL-mirrorable: DuckDB
    ``list_reduce`` over ``regexp_extract_all`` tokens reproduces it."""
    if not tokens:
        return 0
    hs = md5_64_array([t.encode() for t in tokens]).tolist()
    h = 0
    for th in hs:  # Horner fold over the batch-hashed tokens
        h = (h * _FP_BASE + th) & _FP_MASK
    return h


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)
