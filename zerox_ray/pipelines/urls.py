"""URL-level corpus operators: canonicalization + canonical-url dedup.

The crawl-side twin of the content dedups in pipelines/dedup.py: before
any url-keyed stage (snapshot collapse, link-graph joins, per-url
checkpointing) a real crawl first collapses url VARIANTS — tracking
params, fragments, case-insensitive hosts, default ports — onto one
canonical form (functions/urlx.py). Both ops are shuffle-light:
canonicalization is a per-batch pure map; the dedup is the engine's
standard two-exchange distinct composition (per-batch distinct pairs →
grouped distinct → per-canonical rollup).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from zerox_ray.functions.urlx import canonicalize_list
from zerox_ray.pipelines.agg import bucketed_group_agg


def canonical_urls(ds: ray.data.Dataset, url_col: str = "url") -> ray.data.Dataset:
    """Annotate: adds a ``canonical`` column next to ``url_col``.
    Shuffle-free per-batch map."""

    def add(t: pa.Table) -> pa.Table:
        return t.append_column(
            "canonical",
            pa.array(canonicalize_list(t[url_col].to_pylist()), pa.string()),
        )

    return ds.map_batches(add, batch_format="pyarrow")


def url_dedup(ds: ray.data.Dataset, url_col: str = "url") -> ray.data.Dataset:
    """Collapse url variants: (canonical, kept_url, n_variants) — one
    row per canonical form, keeping the lexicographically-lowest raw
    variant (deterministic, SQL-replayable) and counting DISTINCT raw
    variants observed.

    Exchanges: per-batch distinct (canonical, url) pairs → one grouped
    distinct on the pair → one tiny per-canonical rollup (the
    host_stats distinct-count composition)."""
    cu = canonical_urls(ds, url_col)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["canonical", url_col]].drop_duplicates()
        out = out.rename(columns={url_col: "url"})
        out["one"] = pd.Series(1, index=out.index, dtype="int64")
        return out

    distinct = bucketed_group_agg(
        cu.map_batches(pairs, batch_format="pandas"),
        ["canonical", "url"],
        {"one": ("one", "max")},
    )
    return bucketed_group_agg(
        distinct,
        ["canonical"],
        {"kept_url": ("url", "min"), "n_variants": ("one", "sum")},
    )


# --- URL quality features (the crawl-frontier filter signals) ------------------

#: RefinedWeb-style URL gates (Penedo et al. 2023 §3.1 filter by URL
#: before fetching): deep paths, parameterized/fragment urls and
#: digit-heavy urls correlate with spam/duplicate content. Constants
#: calibrated to the synthetic variant corpus so every gate has both
#: pass and fail mass.
URL_MAX_DEPTH = 3
URL_MAX_DIGIT_PPM = 200_000


def url_features(ds: ray.data.Dataset, url_col: str = "url") -> ray.data.Dataset:
    """Per-url crawl-filter feature vector + keep flag — the
    URL-level quality gate real pipelines run BEFORE fetching
    (RefinedWeb filters by URL first; UT1-style blocklists key on the
    same features). Output: (url, host, path_depth, url_len, n_params,
    digit_ppm, has_fragment, keep); keep = no query params, no
    fragment, path depth ≤ URL_MAX_DEPTH, digit density ≤
    URL_MAX_DIGIT_PPM.

    Scale shape: shuffle-free — one vectorized pandas-str pass per
    batch (compiled regex kernels, no Python loop); integer ppm
    arithmetic so the DuckDB oracle matches bit-for-bit."""

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        u = df[url_col].astype("string")
        host = (
            u.str.extract(r"^[a-z]+://([^/:?#]+)", expand=False)
            .str.lower()
            .fillna("")
        )
        path = u.str.extract(r"^[a-z]+://[^/?#]*(/[^?#]*)", expand=False).fillna("")
        qry = u.str.extract(r"\?([^#]*)", expand=False)
        n_params = np.where(
            qry.isna() | (qry == ""), 0, qry.str.count("&").fillna(0) + 1
        ).astype(np.int64)
        depth = path.str.count("/").astype("int64")
        ulen = u.str.len().astype("int64")
        digit_ppm = (u.str.count(r"[0-9]").astype("int64") * 1_000_000) // ulen
        frag = u.str.contains("#", regex=False).astype("int64")
        keep = (
            (n_params == 0)
            & (frag == 0)
            & (depth <= URL_MAX_DEPTH)
            & (digit_ppm <= URL_MAX_DIGIT_PPM)
        ).astype("int64")
        return pd.DataFrame(
            {
                "url": u,
                "host": host.astype("string"),
                "path_depth": depth,
                "url_len": ulen,
                "n_params": pd.Series(n_params, index=df.index),
                "digit_ppm": digit_ppm,
                "has_fragment": frag,
                "keep": keep,
            }
        )

    return ds.map_batches(feats, batch_format="pandas")
