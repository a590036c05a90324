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
    path: str | list[str], columns: tuple[str, ...] = ("url", "html")
) -> ray.data.Dataset:
    """Streaming parquet scan of the pages table (dir, file, or explicit
    file list — the checkpoint runner passes per-shard lists), pruned to
    ``columns``."""
    validate_pages_schema(path)
    return ray.data.read_parquet(
        list(path) if isinstance(path, (list, tuple)) else path, columns=list(columns)
    )
