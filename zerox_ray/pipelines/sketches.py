"""Mergeable sketch operators (streaming synopses).

The reference has no approximate aggregates (SURVEY §2.6); a 100 TB
engine needs them. Both operators here follow the ONE canonical scale
shape: per-batch PARTIAL sketch (vectorized numpy) → tiny groupby/sum
merge — the all-to-all moves sketch rows, never data rows.

- ``price_histogram`` — fixed-edge equi-width histogram (the mergeable
  synopsis behind approximate quantiles): partial ``np.bincount`` per
  batch, merged by bin id. Deterministic, so the DuckDB oracle mirrors
  the exact binning rule.
- ``histogram_quantiles`` — client-side linear interpolation over the
  merged histogram (approximate quantiles with error ≤ bin width).
- ``distinct_users_hll`` — HyperLogLog with a crc32-derived hash
  (deterministic across runs/cluster sizes): per-batch register-max
  partials, merged with a grouped max. Estimate checked against the
  exact distinct count in tests (rows-only driver check: hash-based
  estimates are not SQL-reproducible).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from zerox_ray.pipelines.agg import bucketed_group_agg
from zerox_ray.sources.tables import read_table

PRICE_LO = 0.0
PRICE_HI = 200_000.0
N_BINS = 256


def _group_indices(col) -> tuple[np.ndarray, pa.Array]:
    """Per-batch group factorization: dictionary-encode the group column
    (C kernel) instead of a pandas groupby — returns (int64 codes,
    dictionary values)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    enc = arr.dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return idx, enc.dictionary


#: dense (group x cell) partial planes are only safe while the per-batch
#: group cardinality is modest; past this many cells fall back to pandas
_DENSE_PLANE_MAX_CELLS = 1 << 24


def _hist_partial(t: pa.Table, n_bins: int, lo: float, hi: float) -> pa.Table:
    # Arrow-native: the price column leaves the object store zero-copy
    x = t["l_extendedprice"].to_numpy(zero_copy_only=False)
    width = (hi - lo) / n_bins
    bins = np.clip(((x - lo) // width).astype(np.int64), 0, n_bins - 1)
    counts = np.bincount(bins, minlength=n_bins)
    nz = np.nonzero(counts)[0]
    return pa.table(
        {
            "bin_id": pa.array(nz.astype(np.int64), pa.int64()),
            "n_items": pa.array(counts[nz].astype(np.int64), pa.int64()),
        }
    )


def price_histogram(
    sf_dir: str, n_bins: int = N_BINS, lo: float = PRICE_LO, hi: float = PRICE_HI
) -> ray.data.Dataset:
    """Equi-width histogram of lineitem extended price.
    Output: (bin_id, n_items) for non-empty bins."""
    ds = read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )
    partials = ds.map_batches(
        lambda t: _hist_partial(t, n_bins, lo, hi), batch_format="pyarrow"
    )
    return bucketed_group_agg(
        partials, ["bin_id"], {"n_items": ("n_items", "sum")}
    )


def histogram_quantiles(
    hist: pd.DataFrame,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    n_bins: int = N_BINS,
    lo: float = PRICE_LO,
    hi: float = PRICE_HI,
) -> pd.DataFrame:
    """Approximate quantiles from a merged (bin_id, n_items) histogram:
    linear interpolation inside the containing bin (error ≤ bin width)."""
    width = (hi - lo) / n_bins
    h = hist.sort_values("bin_id")
    counts = np.zeros(n_bins, dtype=np.int64)
    counts[h["bin_id"].to_numpy()] = h["n_items"].to_numpy()
    cum = np.cumsum(counts)
    total = cum[-1]
    rows = []
    for q in qs:
        target = q * total
        b = int(np.searchsorted(cum, target, side="left"))
        prev = cum[b - 1] if b > 0 else 0
        inside = (target - prev) / counts[b] if counts[b] else 0.0
        rows.append(
            {"q_ppm": int(q * 1_000_000), "value": lo + (b + inside) * width}
        )
    return pd.DataFrame(rows)


def price_quantiles(sf_dir: str) -> pd.DataFrame:
    """Approximate p50/p90/p99 of lineitem extended price via the merged
    histogram sketch. Output: (q_ppm, value)."""
    hist = price_histogram(sf_dir).to_pandas()
    return histogram_quantiles(hist)


def grouped_price_quantiles(
    sf_dir: str,
    group: str = "l_returnflag",
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    n_bins: int = N_BINS,
    lo: float = PRICE_LO,
    hi: float = PRICE_HI,
) -> ray.data.Dataset:
    """Per-GROUP approximate quantiles via mergeable histograms — the
    grouped form of ``price_quantiles``. The exact grouped quantile
    (relational.grouped_quantiles) needs every value of a group
    co-located; this sketch shuffles only (group, bin_id, count) rows —
    ≤ |groups|·256 regardless of data size — then interpolates per group
    INSIDE the reduce task (nothing ever lands on the driver).

    Scale shape: per-batch (group, bin) ``np.bincount`` partials → one
    bucketed exchange keyed on group → per-group cumsum + linear
    interpolation (error ≤ bin width). Deterministic binning and float
    arithmetic, so the DuckDB oracle reproduces values bit-for-bit.
    Output: (group, q_ppm, value)."""
    ds = read_table(
        f"{sf_dir}/lineitem.parquet", columns=[group, "l_extendedprice"]
    )
    width = (hi - lo) / n_bins

    def partial(t: pa.Table) -> pa.Table:
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        bins = np.clip(((x - lo) // width).astype(np.int64), 0, n_bins - 1)
        idx, dic = _group_indices(t[group])
        if len(dic) * n_bins > _DENSE_PLANE_MAX_CELLS:
            # high-cardinality batch: sparse pandas fold instead of a
            # dense bincount plane
            out = (
                pd.DataFrame({group: t[group].to_pandas(), "bin_id": bins})
                .groupby([group, "bin_id"], sort=False, as_index=False)
                .size()
                .rename(columns={"size": "n_items"})
                .astype({"bin_id": "int64", "n_items": "int64"})
            )
            return pa.Table.from_pandas(out, preserve_index=False)
        counts = np.bincount(idx * n_bins + bins, minlength=len(dic) * n_bins)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                group: dic.take(pa.array(nz // n_bins)),
                "bin_id": pa.array((nz % n_bins).astype(np.int64), pa.int64()),
                "n_items": pa.array(counts[nz].astype(np.int64), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    hist = bucketed_group_agg(
        partials, [group, "bin_id"], {"n_items": ("n_items", "sum")}
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        # many groups may share a coarse bucket — interpolate per key
        rows = []
        for key, h in g.groupby(group, sort=True):
            q = histogram_quantiles(h[["bin_id", "n_items"]], qs, n_bins, lo, hi)
            q.insert(0, group, key)
            rows.append(q)
        return pd.concat(rows, ignore_index=True)

    from zerox_ray.pipelines.agg import bucketed_group_map

    return bucketed_group_map(hist, group, finish)


# --- HyperLogLog distinct count ----------------------------------------------

HLL_P = 12  # 4096 registers → ~1.6% standard error


def _hll_hash(ids: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit avalanche hash (splitmix64) of int64 ids."""
    x = ids.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _hll_reg_rank(ids: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register, rank) arrays for a batch of int64 keys: low p bits pick
    the register; rank = position of the first set bit in the remaining
    64-p bits (width+1 when all zero)."""
    h = _hll_hash(ids)
    m = np.uint64(1 << p)
    reg = (h & (m - np.uint64(1))).astype(np.int64)
    rest = h >> np.uint64(p)
    width = 64 - p
    rank = np.full(len(h), width + 1, dtype=np.int64)
    found = np.zeros(len(h), dtype=bool)
    for bit in range(width):
        hit = (~found) & ((rest >> np.uint64(width - 1 - bit)) & np.uint64(1)).astype(
            bool
        )
        rank[hit] = bit + 1
        found |= hit
    return reg, rank


def _hll_partial(t: pa.Table, column: str, p: int) -> pa.Table:
    ids = t[column].to_numpy(zero_copy_only=False).astype(np.int64)
    reg, rank = _hll_reg_rank(ids, p)
    # dense register-max fold (2^p is small) — no pandas groupby needed
    regs = np.zeros(1 << p, dtype=np.int64)
    np.maximum.at(regs, reg, rank)
    nz = np.nonzero(regs)[0]  # rank >= 1 for every touched register
    return pa.table(
        {
            "register": pa.array(nz.astype(np.int64), pa.int64()),
            "rank": pa.array(regs[nz], pa.int64()),
        }
    )


def hll_estimate(registers: pd.DataFrame, p: int = HLL_P) -> float:
    """Standard HLL estimator with small-range (linear counting) switch."""
    m = 1 << p
    ranks = np.zeros(m, dtype=np.int64)
    ranks[registers["register"].to_numpy()] = registers["rank"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.exp2(-ranks.astype(np.float64)))
    zeros = int(np.sum(ranks == 0))
    if raw <= 2.5 * m and zeros:
        return m * float(np.log(m / zeros))
    return float(raw)


def distinct_users_hll(sf_dir: str, p: int = HLL_P) -> pd.DataFrame:
    """Approximate distinct user_id count over events via HLL.
    Output: one row (n_users_estimate,). Deterministic across runs and
    cluster shapes (hash-based, order-free register max-merge)."""
    ds = read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
    partials = ds.map_batches(
        lambda t: _hll_partial(t, "user_id", p), batch_format="pyarrow"
    )
    regs = bucketed_group_agg(
        partials, ["register"], {"rank": ("rank", "max")}
    ).to_pandas()
    return pd.DataFrame({"n_users_estimate": [int(round(hll_estimate(regs, p)))]})


def grouped_distinct_hll(
    sf_dir: str,
    group: str = "event_type",
    column: str = "user_id",
    p: int = HLL_P,
) -> ray.data.Dataset:
    """Approximate distinct ``column`` PER ``group`` via one HLL register
    plane per group — the sketch form of the exact two-level distinct
    (dataops.event_type_reach). The exact shape shuffles O(distinct
    pairs) rows TOTAL; this one ships ≤ |groups|·2^p register rows PER
    BATCH (each batch's rank-max combiner caps its own contribution
    regardless of how many distinct keys the batch holds) — the right
    trade at 10^12 events with high-cardinality keys.

    Scale shape: per-batch (group, register) rank-max partials → ONE
    bucketed exchange keyed on group → the reduce task max-merges its
    groups' partials and runs the standard HLL estimator (with the
    linear-counting switch) in place. A group's reduce input grows with
    the number of batches (partials, not raw keys); if that ever
    dominates, reinstate a (group, register) pre-merge exchange first —
    at the corpus sizes here the single exchange is strictly cheaper.
    Deterministic (splitmix64 hash, order-free max-merge), so the DuckDB
    oracle reproduces estimates bit-for-bit.
    Output: (group, n_users_estimate)."""
    ds = read_table(f"{sf_dir}/events.parquet", columns=[group, column])

    def partial(t: pa.Table) -> pa.Table:
        ids = t[column].to_numpy(zero_copy_only=False).astype(np.int64)
        reg, rank = _hll_reg_rank(ids, p)
        idx, dic = _group_indices(t[group])
        m = 1 << p
        if len(dic) * m > _DENSE_PLANE_MAX_CELLS:
            out = (
                pd.DataFrame(
                    {group: t[group].to_pandas(), "register": reg, "rank": rank}
                )
                .groupby([group, "register"], sort=False, as_index=False)["rank"]
                .max()
                .astype({"register": "int64", "rank": "int64"})
            )
            return pa.Table.from_pandas(out, preserve_index=False)
        dense = np.zeros(len(dic) * m, dtype=np.int64)
        np.maximum.at(dense, idx * m + reg, rank)
        nz = np.nonzero(dense)[0]
        return pa.table(
            {
                group: dic.take(pa.array(nz // m)),
                "register": pa.array((nz % m).astype(np.int64), pa.int64()),
                "rank": pa.array(dense[nz], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        # the ONE group-keyed exchange lands every partial of a group
        # here: max-merge registers and estimate in the same reduce task
        rows = []
        for key, h in g.groupby(group, sort=True):
            regs = h.groupby("register", as_index=False)["rank"].max()
            rows.append(
                {group: key, "n_users_estimate": int(round(hll_estimate(regs, p)))}
            )
        return pd.DataFrame(rows)

    from zerox_ray.pipelines.agg import bucketed_group_map

    return bucketed_group_map(partials, group, finish)


def distinct_users_exact(sf_dir: str) -> pd.DataFrame:
    """Exact distinct user count (the shuffle-based baseline the sketch
    replaces at scale). Output: one row (n_users,)."""
    ds = read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
    n = len(ds.unique("user_id"))
    return pd.DataFrame({"n_users": [n]})


# --- Bloom filter (mergeable membership sketch) ------------------------------

BLOOM_M = 1 << 16  # bits (8 KiB bitmap per partial)
BLOOM_J = 4  # hash functions
_N_BLOOM_MERGE_BUCKETS = 32


def _bloom_positions(h1: np.ndarray) -> np.ndarray:
    """(n, BLOOM_J) bit positions via Kirsch–Mitzenmacher double hashing:
    pos_i = (h1 + i*h2) mod m with h2 = splitmix64(h1) | 1 (odd stride
    → the i-sequence walks the whole ring). ONE extra avalanche per key
    instead of j independent hashes — and only one hash chain for the
    DuckDB oracle to mirror."""
    h2 = _hll_hash(h1) | np.uint64(1)
    i = np.arange(BLOOM_J, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(BLOOM_M)).astype(
        np.int64
    )


def _bloom_key_hash(ids: np.ndarray) -> np.ndarray:
    from zerox_ray.functions.hashing import md5_64_array

    return md5_64_array([str(int(d)).encode() for d in ids])


def _bloom_partial(t: pa.Table, column: str = "doc_id") -> pa.Table:
    """One batch → ONE (bucket, bitmap) row: the batch's keys OR-ed into
    a local 8 KiB bitmap. The sketch — not the keys — is what shuffles."""
    if t.num_rows == 0:  # empty block → empty partial, not IndexError
        return pa.table(
            {"bucket": pa.array([], pa.int64()), "bitmap": pa.array([], pa.binary())}
        )
    ids = t[column].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = _bloom_positions(_bloom_key_hash(ids))
    bitmap = np.zeros(BLOOM_M // 8, dtype=np.uint8)
    np.bitwise_or.at(
        bitmap, pos.ravel() // 8, np.uint8(1) << (pos.ravel() % 8).astype(np.uint8)
    )
    bucket = int(ids[0]) % _N_BLOOM_MERGE_BUCKETS
    return pa.table(
        {
            "bucket": pa.array([bucket], pa.int64()),
            "bitmap": pa.array([bitmap.tobytes()], pa.binary()),
        }
    )


def _or_merge(g: pd.DataFrame) -> np.ndarray:
    if len(g) == 0:  # empty input table → empty (all-zero) filter
        return np.zeros(BLOOM_M // 8, dtype=np.uint8)
    stack = np.stack([np.frombuffer(b, dtype=np.uint8) for b in g["bitmap"]])
    return np.bitwise_or.reduce(stack, axis=0)


def _merge_bitmap_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Shared bucket-tree OR-merge step for the Bloom pipelines."""
    return pd.DataFrame({"g": [0], "bitmap": [_or_merge(g).tobytes()]})


def bloom_probe(sf_dir: str) -> ray.data.Dataset:
    """Corpus membership Bloom filter, probed: build the filter over the
    documents' doc_id keys (md5-64 of the decimal id), then answer
    "is this id in the corpus?" for a fixed probe set — ids 0..99
    (present at every sf) and 1e9..1e9+99 (absent; any hit is a
    deterministic false positive of the 64 Ki-bit / 4-hash filter,
    reproduced bit-exactly by the oracle).

    Scale shape: per-batch 8 KiB bitmap partials → tree OR-merge over
    32 buckets → one final task owns the merged bitmap, probes it, and
    emits the probe rows. Keys never shuffle; the driver never holds the
    corpus. Output: (probe_id, present, n_set_bits)."""
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    partials = ds.map_batches(_bloom_partial, batch_format="pyarrow")

    merged = partials.groupby("bucket").map_groups(
        _merge_bitmap_bucket, batch_format="pandas"
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        bitmap = _or_merge(g)
        n_set = int(np.unpackbits(bitmap).sum())
        probe_ids = np.concatenate(
            [np.arange(100, dtype=np.int64), np.arange(100, dtype=np.int64) + 1_000_000_000]
        )
        pos = _bloom_positions(_bloom_key_hash(probe_ids))
        bits = (bitmap[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
        present = bits.all(axis=1).astype(np.int64)
        return pd.DataFrame(
            {
                "probe_id": probe_ids,
                "present": present,
                "n_set_bits": np.int64(n_set),
            }
        )

    return merged.groupby("g").map_groups(finish, batch_format="pandas")


def bloom_semi_join(sf_dir: str) -> ray.data.Dataset:
    """Sketch-accelerated semi-join: customers who (probably) placed an
    order, WITHOUT shuffling either table. The Bloom filter is built over
    orders.o_custkey (per-batch 8 KiB bitmap partials → bucket-tree
    OR-merge), the merged bitmap — 8 KiB regardless of table size — is
    broadcast once via ``ray.put``, and the customer scan keeps rows whose
    4 probe bits are all set. Deterministic false positives pass (the
    point of the operator: at 100 TB this is the cheap pre-filter BEFORE
    an exact join, shrinking the big side by ~|non-buyers|), and the
    oracle reproduces them bit-for-bit.
    Output: (c_custkey,) for rows passing the filter."""
    orders = read_table(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    partials = orders.map_batches(
        lambda t: _bloom_partial(t, "o_custkey"), batch_format="pyarrow"
    )

    merged = partials.groupby("bucket").map_groups(
        _merge_bitmap_bucket, batch_format="pandas"
    )
    # the merged filter is 8 KiB — a scalar-sized driver artifact, like
    # the N every idf needs; broadcast once to the probe stage
    bitmap_ref = ray.put(_or_merge(merged.to_pandas()))

    def probe(t: pa.Table) -> pa.Table:
        bitmap = ray.get(bitmap_ref)
        keys = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = _bloom_positions(_bloom_key_hash(keys))
        bits = (bitmap[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
        return pa.table({"c_custkey": pa.array(keys[bits.all(axis=1)], pa.int64())})

    customers = read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    return customers.map_batches(probe, batch_format="pyarrow")


# --- Count-Min sketch (heavy-hitter frequency estimates) ----------------------

CMS_D = 4  # depth (independent rows)
CMS_W = 1024  # width (counters per row)
_N_CMS_MERGE_BUCKETS = 32


def _cms_positions(h1: np.ndarray) -> np.ndarray:
    """(n, CMS_D) counter positions — the same Kirsch–Mitzenmacher double
    hashing as the Bloom filter (one avalanche, odd stride), so the
    DuckDB oracle reuses one hash chain."""
    h2 = _hll_hash(h1) | np.uint64(1)
    i = np.arange(CMS_D, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(CMS_W)).astype(
        np.int64
    )


def _cms_partial(t: pa.Table) -> pa.Table:
    """One batch → ONE (bucket, sketch) row: a local D×W counter plane.
    32 KiB of int64 shuffles per batch — never the keys."""
    if t.num_rows == 0:  # empty block → empty partial, not IndexError
        return pa.table(
            {"bucket": pa.array([], pa.int64()), "sketch": pa.array([], pa.binary())}
        )
    ids = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = _cms_positions(_bloom_key_hash(ids))
    sketch = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for j in range(CMS_D):
        np.add.at(sketch[j], pos[:, j], 1)
    bucket = int(ids[0]) % _N_CMS_MERGE_BUCKETS
    return pa.table(
        {
            "bucket": pa.array([bucket], pa.int64()),
            "sketch": pa.array([sketch.tobytes()], pa.binary()),
        }
    )


def _cms_merge(g: pd.DataFrame) -> np.ndarray:
    if len(g) == 0:  # empty input stream → all-zero counter plane
        return np.zeros((CMS_D, CMS_W), dtype=np.int64)
    stack = np.stack(
        [np.frombuffer(b, dtype=np.int64).reshape(CMS_D, CMS_W) for b in g["sketch"]]
    )
    return stack.sum(axis=0)


def _mg_compress(counts: dict[str, int], k: int) -> tuple[dict[str, int], int]:
    """Misra-Gries summary compression: if more than ``k`` keys are
    tracked, subtract the (k+1)-th largest count from every counter and
    drop the non-positive ones. Returns (compressed counters, deducted
    amount) — ``deducted`` is the per-key undercount this step may have
    introduced (0 when the summary was already within capacity, i.e. the
    EXACT regime)."""
    if len(counts) <= k:
        return counts, 0
    vals = sorted(counts.values(), reverse=True)
    cut = vals[k]  # (k+1)-th largest
    out = {key: c - cut for key, c in counts.items() if c > cut}
    return out, cut


#: meta-row key carrying a summary's accumulated decrement (its per-key
#: undercount bound). NUL-prefixed so it cannot collide with a real key.
_MG_DEFICIT_KEY = "\x00deficit"

MG_K = 32  # summary capacity (exact whenever true distinct ≤ k)
_N_MG_MERGE_BUCKETS = 32


def _mg_rows(
    counts: dict[str, int], deficit: int, bucket: int
) -> pd.DataFrame:
    keys = list(counts)
    return pd.DataFrame(
        {
            "bucket": np.int64(bucket),
            "key": pd.Series([*keys, _MG_DEFICIT_KEY], dtype="string"),
            "est_count": pd.Series(
                [*(counts[x] for x in keys), deficit], dtype="int64"
            ),
        }
    )


def _mg_partial(df: pd.DataFrame, column: str, k: int) -> pd.DataFrame:
    """One batch → ≤k+1 rows: the (key, est_count) counters plus one
    meta row holding the batch's decrement total. The summary — never the
    raw keys — is what shuffles."""
    if len(df) == 0:
        # empty block → an empty (zero-deficit) summary in bucket 0, so
        # every output block carries the same 3-column schema
        return _mg_rows({}, 0, bucket=0)
    vc = df[column].value_counts()
    counts, ded = _mg_compress(dict(zip(vc.index.astype(str), vc.to_numpy())), k)
    bucket = zlib.crc32(str(df[column].iloc[0]).encode()) % _N_MG_MERGE_BUCKETS
    return _mg_rows(counts, ded, bucket)


def _mg_merge_rows(g: pd.DataFrame, k: int) -> tuple[dict[str, int], int]:
    """Merge MG summaries (Agarwal et al., *Mergeable Summaries*): sum
    counters key-wise, then one compression step. Decrement totals ADD
    across inputs and merge steps — the merged summary's per-key
    undercount is ≤ that sum."""
    meta = g["key"] == _MG_DEFICIT_KEY
    ded_in = int(g.loc[meta, "est_count"].sum())
    summed = g.loc[~meta].groupby("key", sort=False)["est_count"].sum()
    counts, ded = _mg_compress(dict(zip(summed.index, summed.to_numpy())), k)
    return counts, ded_in + ded


def heavy_hitters(
    sf_dir: str, column: str = "event_type", k: int = MG_K
) -> ray.data.Dataset:
    """Misra-Gries heavy-hitter summary over the events stream: a bounded
    ≤k-counter synopsis with the guarantee true_count - err_bound ≤
    est_count ≤ true_count. When the true distinct-key count is ≤ k (the
    probe regime here: events carries a handful of event_type values vs
    k=32) no decrement ever fires, err_bound = 0, and the summary IS the
    exact grouped count — which is what lets the DuckDB oracle value-check
    the entire partial→merge machinery bit-for-bit. The approximate
    regime (distinct ≫ k) is exercised in pytest against the N/(k+1)
    error bound.

    Scale shape mirrors cms_probe: per-batch ≤k-row summaries (keys never
    shuffle in bulk) → bucket-tree MG-merge → one final task emits the
    surviving counters. Output: (key, est_count, err_bound)."""
    ds = read_table(f"{sf_dir}/events.parquet", columns=[column])
    partials = ds.map_batches(
        lambda df: _mg_partial(df, column, k), batch_format="pandas"
    )

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        counts, ded = _mg_merge_rows(g, k)
        out = _mg_rows(counts, ded, bucket=0)
        return out.rename(columns={"bucket": "g"})

    merged = partials.groupby("bucket").map_groups(
        merge_bucket, batch_format="pandas"
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        counts, ded = _mg_merge_rows(g, k)
        keys = sorted(counts)
        return pd.DataFrame(
            {
                "key": pd.Series(keys, dtype="string"),
                "est_count": pd.Series([counts[x] for x in keys], dtype="int64"),
                "err_bound": np.int64(ded),
            }
        )

    return merged.groupby("g").map_groups(finish, batch_format="pandas")


def grouped_heavy_hitters(
    sf_dir: str, group: str = "lang", column: str = "source", k: int = MG_K
) -> ray.data.Dataset:
    """Misra-Gries heavy hitters PER GROUP: one ≤k-counter summary per
    (group) — per-language top document sources here. Same guarantees as
    ``heavy_hitters`` applied group-wise: when a group's true distinct
    count is ≤ k (this corpus: 20 sources vs k=32) the summary IS the
    exact grouped count with err_bound 0, giving the whole grouped
    partial→merge machinery a bit-exact oracle; the approximate regime
    keeps the N_group/(k+1) undercount bound.

    Scale shape: per-batch per-group ≤k+1-row summaries (keys never
    shuffle in bulk) → ONE bucketed exchange keyed on group → per-group
    MG merge in the reduce task. Output: (group, key, est_count,
    err_bound)."""
    from zerox_ray.pipelines.agg import bucketed_group_map

    ds = read_table(f"{sf_dir}/documents.parquet", columns=[group, column])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for gval, h in df.groupby(group, sort=False):
            vc = h[column].value_counts()
            counts, ded = _mg_compress(
                dict(zip(vc.index.astype(str), vc.to_numpy())), k
            )
            keys = list(counts)
            frames.append(
                pd.DataFrame(
                    {
                        group: gval,
                        "key": pd.Series([*keys, _MG_DEFICIT_KEY], dtype="string"),
                        "est_count": pd.Series(
                            [*(counts[x] for x in keys), ded], dtype="int64"
                        ),
                    }
                )
            )
        if not frames:  # empty block → empty summary, stable schema
            return pd.DataFrame(
                {
                    group: pd.Series([], dtype="string"),
                    "key": pd.Series([], dtype="string"),
                    "est_count": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(frames, ignore_index=True)

    partials = ds.map_batches(partial, batch_format="pandas")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for gval, h in g.groupby(group, sort=True):
            counts, ded = _mg_merge_rows(h, k)
            for key in sorted(counts):
                out.append(
                    {
                        group: gval,
                        "key": key,
                        "est_count": counts[key],
                        "err_bound": ded,
                    }
                )
        if not out:  # every counter compressed away → empty typed frame
            return pd.DataFrame(
                {
                    group: pd.Series([], dtype="string"),
                    "key": pd.Series([], dtype="string"),
                    "est_count": pd.Series([], dtype="int64"),
                    "err_bound": pd.Series([], dtype="int64"),
                }
            )
        res = pd.DataFrame(out)
        return res.astype({"est_count": "int64", "err_bound": "int64"})

    return bucketed_group_map(partials, group, finish)


def cms_probe(sf_dir: str) -> ray.data.Dataset:
    """Count-Min sketch of per-user event frequencies, probed: build the
    D×W counter plane over the events stream (md5-64 of the decimal
    user_id), then estimate the event count of a fixed probe set —
    user ids 0..49 (present at every sf) and 1e9..1e9+9 (absent; their
    estimate is pure collision mass, reproduced exactly by the oracle).
    estimate(x) = min_j sketch[j][pos_j(x)] ≥ true count, deterministic
    given the data — so the oracle value-checks it bit-for-bit rather
    than asserting a bound.

    Scale shape mirrors bloom_probe: per-batch 32 KiB sketch partials →
    tree sum-merge over 32 buckets → one final task probes the merged
    plane. Keys never shuffle. Output: (probe_id, est_count,
    total_events)."""
    ds = read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
    partials = ds.map_batches(_cms_partial, batch_format="pyarrow")

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"g": [0], "sketch": [_cms_merge(g).tobytes()]})

    merged = partials.groupby("bucket").map_groups(
        merge_bucket, batch_format="pandas"
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        sketch = _cms_merge(g)
        total = int(sketch[0].sum())  # every event increments each row once
        probe_ids = np.concatenate(
            [np.arange(50, dtype=np.int64), np.arange(10, dtype=np.int64) + 1_000_000_000]
        )
        pos = _cms_positions(_bloom_key_hash(probe_ids))
        est = np.min(
            sketch[np.arange(CMS_D)[None, :], pos], axis=1
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "probe_id": probe_ids,
                "est_count": est,
                "total_events": np.int64(total),
            }
        )

    return merged.groupby("g").map_groups(finish, batch_format="pandas")


# --- exact distributed selection (iterative histogram narrowing) --------------

#: bins per narrowing round; each round shrinks every target's candidate
#: interval by this factor, so rounds = ceil(log_BINS(value range))
SELECT_BINS = 1024
EXACT_SELECT_QS_PPM = (500_000, 900_000, 990_000)


def _select_round_partial(
    t: pa.Table, states: list[tuple[int, int, int]], col: str
) -> pd.DataFrame:
    """One batch → (tgt, bin, cnt) count partials for every still-active
    target's current candidate interval. ≤ len(states)·SELECT_BINS rows."""
    x = t[col].to_numpy(zero_copy_only=False)
    cents = np.floor(x * 100).astype(np.int64)
    out_t: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    out_c: list[np.ndarray] = []
    for ti, (lo, hi, _k) in enumerate(states):
        if hi - lo <= 1:
            continue  # already resolved
        width = -(-(hi - lo) // SELECT_BINS)  # ceil div
        m = (cents >= lo) & (cents < hi)
        if not m.any():
            continue
        bins = (cents[m] - lo) // width
        cnt = np.bincount(bins, minlength=SELECT_BINS)
        nz = np.flatnonzero(cnt)
        out_t.append(np.full(len(nz), ti, dtype=np.int64))
        out_b.append(nz.astype(np.int64))
        out_c.append(cnt[nz].astype(np.int64))
    if not out_t:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("tgt", "bin", "cnt")}
        )
    return pd.DataFrame(
        {
            "tgt": np.concatenate(out_t),
            "bin": np.concatenate(out_b),
            "cnt": np.concatenate(out_c),
        }
    )


def exact_price_select(
    sf_dir: str, qs_ppm: tuple[int, ...] = EXACT_SELECT_QS_PPM
) -> pd.DataFrame:
    """EXACT order statistics of lineitem extended price (integer cents,
    floor(value·100)) WITHOUT a global sort: iterative histogram
    narrowing (distributed selection / BFPRT-by-histogram). Rank k for
    quantile q over n rows is k = ceil(q·n) (1-based k-th smallest).

    Scale shape: the sketch quantiles (``price_quantiles``) answer with
    ONE pass but ≤ bin-width error; this operator answers EXACTLY in
    ceil(log_1024(range)) passes (3 passes for a ~10^7-cent domain).
    Each pass streams the column and reduces to ≤ |targets|·1024
    (tgt, bin, cnt) rows — the all-to-all moves counts, never values,
    and the driver holds one interval triple per target (the
    bounded-driver-state contract). A global ``ds.sort`` would move
    every row of the table; three column scans are the cheaper trade at
    any scale where the table exceeds cluster memory.

    Output: (q_ppm, rank, value_cents) — one row per requested quantile."""
    path = f"{sf_dir}/lineitem.parquet"
    ds = read_table(path, columns=["l_extendedprice"])

    # pass 0: (min, max, count) — one narrow partial row per batch
    def mm_partial(t: pa.Table) -> pd.DataFrame:
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        c = np.floor(x * 100).astype(np.int64)
        return pd.DataFrame(
            {"lo": [int(c.min())], "hi": [int(c.max())], "n": [len(c)]}
        )

    mm = ds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    lo0, hi0, n = int(mm["lo"].min()), int(mm["hi"].max()) + 1, int(mm["n"].sum())

    # per-target state: (lo, hi) candidate interval, k = rank within it
    states = [
        (lo0, hi0, (q * n + 999_999) // 1_000_000) for q in qs_ppm
    ]
    ranks = [(q * n + 999_999) // 1_000_000 for q in qs_ppm]

    while any(hi - lo > 1 for lo, hi, _ in states):
        snapshot = list(states)
        counts = (
            read_table(path, columns=["l_extendedprice"])
            .map_batches(
                lambda t: _select_round_partial(t, snapshot, "l_extendedprice"),
                batch_format="pyarrow",
            )
        )
        merged = bucketed_group_agg(
            counts, ["tgt", "bin"], {"cnt": ("cnt", "sum")}
        ).to_pandas()  # ≤ |targets|·1024 rows — bounded driver state
        for ti, (lo, hi, k) in enumerate(states):
            if hi - lo <= 1:
                continue
            width = -(-(hi - lo) // SELECT_BINS)
            sub = merged[merged["tgt"] == ti].sort_values("bin")
            cum = sub["cnt"].cumsum()
            pos = int(np.searchsorted(cum.to_numpy(), k, side="left"))
            b = int(sub["bin"].iloc[pos])
            prev = int(cum.iloc[pos - 1]) if pos > 0 else 0
            new_lo = lo + b * width
            new_hi = min(hi, new_lo + width)
            states[ti] = (new_lo, new_hi, k - prev)

    return pd.DataFrame(
        {
            "q_ppm": pd.Series(list(qs_ppm), dtype="int64"),
            "rank": pd.Series(ranks, dtype="int64"),
            "value_cents": pd.Series([lo for lo, _, _ in states], dtype="int64"),
        }
    )


def exact_kth_smallest(ds: ray.data.Dataset, col: str, k: int) -> int:
    """EXACT k-th smallest (1-based) of an int64 column by the same
    histogram-narrowing loop as ``exact_price_select``, generalized to
    any (re-iterable — pass a materialized dataset) int column: each
    round streams the column once and reduces to ≤ SELECT_BINS
    (bin, cnt) rows; the driver holds one (lo, hi, k) triple. Rounds =
    ceil(log_1024(range))."""

    def mm_partial(t: pa.Table) -> pd.DataFrame:
        c = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(c) == 0:
            return pd.DataFrame({"lo": [], "hi": [], "n": []}, dtype="int64")
        return pd.DataFrame(
            {"lo": [int(c.min())], "hi": [int(c.max())], "n": [len(c)]}
        )

    mm = ds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    if mm["n"].sum() == 0:
        raise ValueError("exact_kth_smallest over an empty column")
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max()) + 1
    if not 1 <= k <= int(mm["n"].sum()):
        raise ValueError(f"rank {k} outside [1, {int(mm['n'].sum())}]")

    while hi - lo > 1:
        width = -(-(hi - lo) // SELECT_BINS)
        lo_c, hi_c = lo, hi

        def hist(t: pa.Table) -> pd.DataFrame:
            c = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            m = (c >= lo_c) & (c < hi_c)
            if not m.any():
                return pd.DataFrame({"bin": [], "cnt": []}, dtype="int64")
            cnt = np.bincount((c[m] - lo_c) // width, minlength=SELECT_BINS)
            nz = np.flatnonzero(cnt)
            return pd.DataFrame(
                {"bin": nz.astype(np.int64), "cnt": cnt[nz].astype(np.int64)}
            )

        merged = (
            bucketed_group_agg(
                ds.map_batches(hist, batch_format="pyarrow"),
                ["bin"],
                {"cnt": ("cnt", "sum")},
            )
            .to_pandas()
            .sort_values("bin")
        )
        cum = merged["cnt"].cumsum()
        pos = int(np.searchsorted(cum.to_numpy(), k, side="left"))
        b = int(merged["bin"].iloc[pos])
        prev = int(cum.iloc[pos - 1]) if pos > 0 else 0
        lo, hi, k = lo + b * width, min(hi, lo + (b + 1) * width), k - prev
    return lo


def exact_kth_largest(ds: ray.data.Dataset, col: str, k: int, n: int) -> int:
    """k-th LARGEST = (n − k + 1)-th smallest; ``n`` is the column's row
    count (callers usually already have it from the same reduce)."""
    return exact_kth_smallest(ds, col, n - k + 1)
