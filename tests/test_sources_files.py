"""File/URL-mode ingest (S1/S2, downloadFile file.ts:32-86): local files
and fetched URLs must land in the canonical pages-table shape and flow
through the flagship OCR pipeline unchanged. URL fetch is driven against
a localhost stub HTTP server — real socket, no external network."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

from zerox_ray.sources.files import read_files_as_pages, read_urls_as_pages
from zerox_ray.sources.pages import PAGES_SCHEMA

HTML = b"<html><body><main><p>" + b"hello web page content " * 40 + b"</p></main></body></html>"


def _schema_names_types(ds):
    s = ds.schema()
    return list(zip(s.names, [str(t) for t in s.types]))


class TestFileIngest:
    def test_local_files_become_pages_rows(self, ray_session, tmp_path):
        for i in range(3):
            (tmp_path / f"doc{i}.html").write_bytes(HTML + str(i).encode())
        ds = read_files_as_pages(str(tmp_path))
        df = ds.to_pandas().sort_values("url").reset_index(drop=True)
        assert len(df) == 3
        assert list(df.columns) == [f.name for f in PAGES_SCHEMA]
        assert df["url"].str.startswith("file://").all()
        assert df["html"].map(lambda b: b.startswith(HTML[:10])).all()
        assert (df["warc_ts"].astype("int64") > 0).all()  # mtime, not epoch

    def test_files_flow_through_run_ocr(self, ray_session, tmp_path):
        from zerox_ray import run_ocr

        (tmp_path / "a.html").write_bytes(HTML)
        docs = run_ocr(read_files_as_pages(str(tmp_path))).to_pandas()
        assert len(docs) == 1
        assert docs["ocr_successful"].iloc[0] >= 1
        assert "hello web page content" in docs["markdown"].iloc[0]


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802
        self.server.hits.setdefault(self.path, 0)
        self.server.hits[self.path] += 1
        if self.path == "/missing":
            self.send_error(404)
            return
        if self.path == "/flaky" and self.server.hits[self.path] == 1:
            self.send_error(503)
            return
        body = HTML + self.path.encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Last-Modified", "Wed, 01 Jan 2025 00:00:00 GMT")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):
        pass


@pytest.fixture()
def http_stub():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    server.hits = {}
    threading.Thread(target=server.serve_forever, daemon=True).start()
    server.base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        yield server
    finally:
        server.shutdown()
        server.server_close()


class TestUrlIngest:
    def test_fetch_fills_pages_schema(self, ray_session, http_stub):
        urls = [f"{http_stub.base}/p{i}" for i in range(4)]
        df = (
            read_urls_as_pages(urls, retry_backoff_s=0.0)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        assert list(df.columns) == [f.name for f in PAGES_SCHEMA]
        assert len(df) == 4
        assert df["html"].map(lambda b: b.startswith(HTML[:10])).all()
        # Last-Modified → warc_ts (2025-01-01 in µs)
        assert (df["warc_ts"].astype("int64") == 1735689600000000).all()
        assert (df["lang"] == "").all()

    def test_error_rows_under_ignore_and_raise_under_throw(
        self, ray_session, http_stub
    ):
        urls = [f"{http_stub.base}/ok", f"{http_stub.base}/missing"]
        df = read_urls_as_pages(
            urls, max_retries=0, retry_backoff_s=0.0
        ).to_pandas()
        bad = df[df["url"].str.endswith("/missing")]
        assert (bad["lang"] == "ERROR").to_numpy().all()
        assert (bad["html"] == b"").to_numpy().all()
        with pytest.raises(Exception):
            read_urls_as_pages(
                urls, max_retries=0, retry_backoff_s=0.0, error_mode="THROW"
            ).materialize()

    def test_retry_refetches_transient_failures(self, ray_session, http_stub):
        df = read_urls_as_pages(
            [f"{http_stub.base}/flaky"], max_retries=2, retry_backoff_s=0.0
        ).to_pandas()
        assert (df["lang"] == "").all()  # succeeded on refetch
        assert http_stub.hits["/flaky"] == 2
