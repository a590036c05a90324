"""JSONL pages source + sink — the newline-delimited-JSON interchange
format (one page object per line) that sits between ad-hoc exports and
the columnar/WARC containers. Binary payloads travel base64-encoded
(JSON is text; raw html bytes are not valid UTF-8 in general), and the
µs-precision capture timestamp rides as a plain integer so the round
trip is exact — any encoding or precision defect changes the extracted
markdown and fails the flagship byte-identity oracle
(``ocr_jsonl_roundtrip``).

Line schema (all fields required):
    {"url": str, "warc_ts_us": int, "html_b64": str}

Scale shape mirrors sources/warc.py: one input file == one Ray block
(``read_binary_files``), parsed in one streaming pass per block; the
sink writes one content-addressed file per block (atomic tmp+rename).
Malformed lines fail loudly with file + line number — silent skips
would surface as missing documents three stages later.
"""

from __future__ import annotations

import base64
import json
import os

import pyarrow as pa
import ray.data


def serialize_jsonl(urls, tss_us, payloads) -> bytes:
    """Rows → JSONL bytes (one object per line, ``\\n``-terminated)."""
    lines = []
    for u, ts, p in zip(urls, tss_us, payloads):
        lines.append(
            json.dumps(
                {
                    "url": u,
                    "warc_ts_us": int(ts),
                    "html_b64": base64.b64encode(bytes(p)).decode("ascii"),
                },
                separators=(",", ":"),
            )
        )
    return ("\n".join(lines) + "\n").encode() if lines else b""


def parse_jsonl(data: bytes, path: str = "<bytes>"):
    """JSONL bytes → (urls, tss_us, payloads). Raises ValueError with
    file + line number on any malformed or incomplete record."""
    urls: list[str] = []
    tss: list[int] = []
    payloads: list[bytes] = []
    for ln, line in enumerate(data.split(b"\n"), 1):
        if not line.strip():
            continue
        try:
            obj = json.loads(line)
            urls.append(obj["url"])
            tss.append(int(obj["warc_ts_us"]))
            payloads.append(base64.b64decode(obj["html_b64"], validate=True))
        except (KeyError, ValueError, TypeError) as e:
            raise ValueError(f"{path}:{ln}: malformed JSONL page record: {e}")
    return urls, tss, payloads


def read_jsonl_pages(paths: str | list[str]) -> ray.data.Dataset:
    """JSONL dir/file(s) → canonical pages Dataset (url, warc_ts, html)."""
    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse_batch(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list[int] = []
        payloads: list[bytes] = []
        for path, data in zip(t["path"].to_pylist(), t["bytes"].to_pylist()):
            u, s, p = parse_jsonl(data, path)
            urls += u
            tss += s
            payloads += p
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(payloads, pa.binary()),
            }
        )

    return files.map_batches(parse_batch, batch_format="pyarrow")


def write_jsonl_files(ds: ray.data.Dataset, out_dir: str) -> int:
    """Distributed JSONL sink: one content-addressed file per block
    (atomic tmp+rename — a re-run overwrites, never corrupts). Returns
    the number of files written."""
    import zlib

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n": pa.array([0], pa.int64())})
        urls = t["url"].to_pylist()
        tss = [v.value for v in t["warc_ts"]]
        payloads = t["html"].to_pylist()
        data = serialize_jsonl(urls, tss, payloads)
        crc = zlib.crc32(data) & 0xFFFFFFFF
        name = f"pages-{crc:08x}-{t.num_rows}.jsonl"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"n": pa.array([1], pa.int64())})

    written = ds.map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    ).sum("n")
    return int(written or 0)
