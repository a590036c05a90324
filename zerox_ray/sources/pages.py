"""Pages-table source: schema-validated, column-pruned parquet read.

The input contract is fixed by BASELINE.json input_hint:
(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string).
The reference's downloadFile/temp-dir ingest (node-zerox/src/utils/
file.ts:32-86; index.ts:141-157) collapses to ``ray.data.read_parquet`` —
payloads are already in the ``html`` column, no per-row fetch.

Column pruning at the read is mandatory at 100 TB: the OCR pipeline needs
only (url, html); ``text``/``lang``/``warc_ts`` never leave storage unless
a stage asks for them.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def validate_pages_schema(path: str | list[str]) -> None:
    """Fail fast (driver-side, one footer read) if the input does not carry
    the input_hint columns with the expected types. Extra columns are
    allowed; missing/mistyped ones are an error (SURVEY §1.2: the engine
    validates the fixed schema on read)."""
    if isinstance(path, (list, tuple)):
        files = list(path)
    elif os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    actual = pq.read_schema(files[0])
    for field in PAGES_SCHEMA:
        idx = actual.get_field_index(field.name)
        if idx < 0:
            raise ValueError(f"pages input missing column {field.name!r} ({path})")
        got = actual.field(idx).type
        if got != field.type and not (
            pa.types.is_large_binary(got) and pa.types.is_binary(field.type)
        ) and not (pa.types.is_large_string(got) and pa.types.is_string(field.type)):
            raise ValueError(
                f"pages column {field.name!r} has type {got}, expected {field.type}"
            )


def read_pages(
    path: str | list[str],
    columns: tuple[str, ...] = ("url", "html"),
    latest_snapshot_only: bool = False,
) -> ray.data.Dataset:
    """Streaming parquet scan of the pages table (dir, file, or explicit
    file list — the checkpoint runner passes per-shard lists), pruned to
    ``columns``.

    PRECONDITION (url uniqueness): the OCR pipeline assumes each url
    appears ONCE in its input — duplicates (multiple WARC snapshots of a
    url, which ``warc_ts`` makes realistic) would interleave duplicated
    page rows into one document (in-block) or trip the merge stage's
    overlap guard (across blocks). Pass ``latest_snapshot_only=True`` to
    collapse snapshots to the newest per url at ingest (one bucketed
    groupby — the snapshot-corpus path), or pre-deduplicate upstream.
    The same assumption underpins shard independence in
    state/manifest.py (all rows of a url in one shard)."""
    validate_pages_schema(path)
    cols = list(columns)
    # the snapshot collapse needs warc_ts (recency), url (the key) and
    # html (the crc32 tie-break) regardless of the caller's pruning;
    # the extra columns are dropped again after the collapse
    read_cols = cols if not latest_snapshot_only else list(
        dict.fromkeys(["warc_ts", "url", "html", *cols])
    )
    from zerox_ray.sources.tables import clean_read_schema

    paths = list(path) if isinstance(path, (list, tuple)) else path
    ds = ray.data.read_parquet(
        paths, columns=read_cols, schema=clean_read_schema(paths, read_cols)
    )
    if latest_snapshot_only:
        ds = latest_snapshots(ds, keep_columns=cols)
    return ds


#: coarse url-hash buckets for the snapshot-dedupe groupby


def latest_snapshots(
    ds: ray.data.Dataset, keep_columns: list[str] | None = None
) -> ray.data.Dataset:
    """Collapse multiple snapshots of a url to the newest (max warc_ts).

    Shape: the canonical coarse url-hash exchange
    (pipelines/agg.bucketed_group_map) → vectorized per-bucket "keep
    last" (sort + tail(1) per url). Ties on warc_ts break
    deterministically on payload crc32 so the kept row is identical
    across runs and block layouts."""
    import zlib

    from zerox_ray.pipelines.agg import bucketed_group_map

    def pick(g):
        g = g.copy()
        g["__h"] = [zlib.crc32(p) for p in g["html"]]
        g = g.sort_values(["url", "warc_ts", "__h"], kind="mergesort")
        out = g.groupby("url", sort=False).tail(1)
        cols = keep_columns or [c for c in out.columns if not c.startswith("__")]
        return out[cols]

    return bucketed_group_map(ds, "url", pick)


def snapshot_churn(path: str | list[str]) -> ray.data.Dataset:
    """Per-url crawl-churn statistics over a MULTI-snapshot pages table:
    how often was each url recrawled, how many distinct payload versions
    exist, and how far apart are the snapshots — the rollup a crawl
    operator runs before deciding recrawl budgets (and the profiling
    step before ``latest_snapshots`` collapses the corpus).

    Scale shape: per-batch combiner dedups (url, payload-hash) and
    pre-aggregates counts/ts-extents, so the ONE url-keyed exchange
    moves ≤ one row per (url, version) per batch — never payload bytes
    (the md5-64 hash travels instead of the html). The reduce merges
    partials per url. Output: (url, n_snapshots, n_versions,
    ts_span_us)."""
    import numpy as np
    import pandas as pd

    from zerox_ray.functions.hashing import md5_64_array
    from zerox_ray.pipelines.agg import bucketed_group_map

    ds = read_pages(path, columns=("url", "warc_ts", "html"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_64_array(list(df["html"])).astype(np.int64)  # two's-complement view
        ts = df["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        rows = pd.DataFrame({"url": df["url"], "h": h, "ts": ts})
        return rows.groupby(["url", "h"], as_index=False).agg(
            n=("ts", "size"), min_ts=("ts", "min"), max_ts=("ts", "max")
        ).astype({"h": "int64", "n": "int64", "min_ts": "int64", "max_ts": "int64"})

    partials = ds.map_batches(partial, batch_format="pandas")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("url", as_index=False).agg(
            n_snapshots=("n", "sum"),
            n_versions=("h", "nunique"),
            min_ts=("min_ts", "min"),
            max_ts=("max_ts", "max"),
        )
        out["ts_span_us"] = out["max_ts"] - out["min_ts"]
        return out[["url", "n_snapshots", "n_versions", "ts_span_us"]].astype(
            {"n_snapshots": "int64", "n_versions": "int64", "ts_span_us": "int64"}
        )

    return bucketed_group_map(partials, "url", finish)
