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
