"""File/URL-mode ingest: local files or fetched URLs → the pages table.

S1/S2 parity (downloadFile, node-zerox/src/utils/file.ts:32-86;
py_zerox download_file, py_zerox/pyzerox/processor/utils.py): the
reference accepts a local path or an http(s) URL and stages the bytes in
a temp dir before processing. The Ray-native equivalent lands the bytes
straight in the canonical pages-table shape (url, warc_ts, html, text,
lang) so EVERY downstream pipeline — OCR, curation, graph — consumes a
file or a live URL exactly like a Common-Crawl parquet row:

- local files stream through ``ray.data.read_binary_files`` (no driver
  loop; Ray parallelizes the reads across the cluster and the bytes
  enter the object store once);
- URLs fan out as rows and fetch INSIDE an actor-pool ``map_batches``
  stage (``UrlFetcher``) — a warm urllib opener per actor, retry with
  backoff per URL, error rows under IGNORE (index.ts:338-352). This
  sandbox has no external network, so tests drive the fetcher against a
  localhost stub server (the models/_send pattern).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

#: timestamp for payloads with no modification time of their own —
#: deterministic so re-ingesting the same input yields identical rows
_EPOCH_US = 0

_PAGES_FIELDS = [
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
]


def _pages_table(
    urls: list[str], ts_us: list[int], payloads: list[bytes]
) -> pa.Table:
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts_us, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array([""] * len(urls), pa.string()),
            "lang": pa.array([""] * len(urls), pa.string()),
        }
    )


def read_files_as_pages(paths: str | list[str]) -> ray.data.Dataset:
    """Local file(s)/dir → pages table rows (one per file).

    ``url`` is the ``file://`` form of the absolute path, ``warc_ts``
    the file's mtime (the closest analogue of a crawl timestamp), and
    ``html`` the raw bytes — the classify stage's magic sniffing routes
    PDFs/Office/HTML exactly as it does for crawled payloads. The read
    itself is ``ray.data.read_binary_files``: distributed, streaming,
    no driver-side loop."""
    import os

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def to_pages(batch: pa.Table) -> pa.Table:
        paths_col = batch["path"].to_pylist()
        urls, ts = [], []
        for p in paths_col:
            urls.append("file://" + os.path.abspath(p))
            try:
                ts.append(int(os.stat(p).st_mtime * 1_000_000))
            except OSError:
                ts.append(_EPOCH_US)
        return _pages_table(urls, ts, batch["bytes"].to_pylist())

    return ds.map_batches(to_pages, batch_format="pyarrow")


class UrlFetcher:
    """Actor-pool URL fetcher: rows of (url) → pages-table rows.

    One urllib opener per actor (warm connection state), per-URL retry
    with exponential backoff (``max_retries`` re-fetches, the reference's
    runRetries shape, utils/common.ts:62-80). Failures become rows with
    empty ``html`` and ``lang='ERROR'`` under errorMode IGNORE — the
    pages schema has no status column, and classify already routes
    empty payloads to ERROR — or raise under THROW. ``warc_ts`` comes
    from the Last-Modified header when the server sends one, else 0:
    both are deterministic for a fixed server state."""

    def __init__(
        self,
        timeout_s: float = 30.0,
        max_retries: int = 1,
        retry_backoff_s: float = 1.0,
        error_mode: str = "IGNORE",
    ):
        import urllib.request

        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.retry_backoff_s = retry_backoff_s
        self.error_mode = error_mode
        self.opener = urllib.request.build_opener()

    def _fetch(self, url: str) -> tuple[bytes, int]:
        import email.utils
        import time

        attempt = 0
        while True:
            try:
                with self.opener.open(url, timeout=self.timeout_s) as resp:
                    payload = resp.read()
                    lm = resp.headers.get("Last-Modified")
                    ts = _EPOCH_US
                    if lm:
                        try:
                            ts = int(
                                email.utils.parsedate_to_datetime(lm).timestamp()
                                * 1_000_000
                            )
                        except (TypeError, ValueError):
                            pass
                    return payload, ts
            except Exception:
                if attempt >= self.max_retries:
                    raise
            time.sleep(self.retry_backoff_s * (2**attempt))
            attempt += 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls_in = batch["url"].to_pylist()
        urls, ts, payloads, langs = [], [], [], []
        for url in urls_in:
            try:
                payload, t = self._fetch(url)
            except Exception:
                if self.error_mode == "THROW":
                    raise
                urls.append(url)
                ts.append(_EPOCH_US)
                payloads.append(b"")
                langs.append("ERROR")
                continue
            urls.append(url)
            ts.append(t)
            payloads.append(payload)
            langs.append("")
        t = _pages_table(urls, ts, payloads)
        return t.set_column(
            t.schema.get_field_index("lang"), "lang", pa.array(langs, pa.string())
        )


def read_urls_as_pages(
    urls: list[str],
    *,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 16,
    **fetcher_kwargs,
) -> ray.data.Dataset:
    """URL list → pages table, fetched by a ``UrlFetcher`` actor pool.

    Small batches (payloads are unbounded binary) and an autoscaling
    pool; the URL list itself is tiny metadata, so ``from_items`` is
    fine at any realistic list size — a billion-URL frontier would come
    from a parquet read instead and feed the same fetch stage."""
    ds = ray.data.from_items([{"url": u} for u in urls])
    return ds.map_batches(
        UrlFetcher,
        fn_constructor_kwargs=fetcher_kwargs,
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
