"""Deterministic synthesis of the Common-Crawl-style ``pages`` input table.

The BASELINE.json input_hint fixes the pipeline's input shape:
``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)``. The provided testdata has no such table, so this module
derives one deterministically from ``documents.parquet`` (doc_id, text,
lang, …) at each scale factor — the analogue of the reference's
``shared/inputs`` corpus (40 docs + golden outputs,
node-zerox/tests/README.md) recast as seeded Parquet.

Everything here is a pure function of (doc_id, text), so a DuckDB oracle
can recompute the EXPECTED pipeline output directly from the registered
``documents`` view (see __ray_entry__.oracle_sql) — that is what makes the
driver's value-hash correctness gate meaningful for the extraction
pipeline.

THE PLAN (mirrored line-for-line by the oracle SQL — keep in sync):
  url        = 'https://example.org/doc/' || doc_id
  is_err     = doc_id % 101 == 13          (corrupt payload → 1 ERROR page)
  n_pages    = 1 if is_err else 24 if doc_id % 50 == 0 else 1 + doc_id % 4
               (the %50 arm is the skew exercise: giant docs)
  kind       = 'pdf' if doc_id % 10 == 7 else 'html'   (PDF branch ~10%)
  L          = ceil(len(text) / n_pages)
  chunk_i    = text[(i-1)*L : i*L]   (1-indexed; the expected page content)
  filler     = doc_id % 97 == 3 → payload padded with large HTML comments
               (wide-record exercise; stripped before parsing, no output
               effect)
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

URL_PREFIX = "https://example.org/doc/"
GEN_VERSION = 4  # v4: deterministic inter-doc related links in the footer
EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
ROWS_PER_FILE = 4096

_NAV = (
    b'<nav class="site-nav"><ul>'
    b'<li><a href="/">home</a></li>'
    b'<li><a href="/about">about us</a></li>'
    b'<li><a href="/contact">contact</a></li>'
    b'<li><a href="/login">log in</a></li>'
    b"</ul></nav>"
)
_FOOTER = (
    b"<footer><p>"
    b'<a href="/terms">terms of service</a> '
    b'<a href="/privacy">privacy policy</a> '
    b'<a href="/sitemap">site map</a> (c) example</p></footer>'
)
_FILLER = b"<!-- " + b"boilerplate-filler " * 64 + b"-->\n"


def plan_doc(doc_id: int, text: str) -> dict:
    """The deterministic per-document plan (see module docstring)."""
    is_err = doc_id % 101 == 13
    if is_err:
        np_ = 1
    elif doc_id % 50 == 0:
        np_ = 24
    else:
        np_ = 1 + doc_id % 4
    kind = "corrupt" if is_err else ("pdf" if doc_id % 10 == 7 else "html")
    chunk_len = -(-len(text) // np_)  # ceil
    chunks = [text[(i - 1) * chunk_len : i * chunk_len] for i in range(1, np_ + 1)]
    return {
        "url": f"{URL_PREFIX}{doc_id}",
        "is_err": is_err,
        "n_pages": np_,
        "kind": kind,
        "chunks": chunks,
        "filler": doc_id % 97 == 3,
    }


def related_links(doc_id: int, n_docs: int) -> list[int]:
    """Deterministic inter-doc link targets: the synthetic web graph.
    Closed form so the SQL oracle reproduces every edge from doc_id
    alone: target_j = (doc_id*31 + 7j + 3) mod n_docs, j = 0..2."""
    return [(doc_id * 31 + 7 * j + 3) % n_docs for j in range(3)]


def build_html(
    doc_id: int,
    chunks: list[str],
    filler: bool,
    n_docs: int = 0,
    url_for=None,
) -> bytes:
    parts = [
        b"<html><head><title>doc %d</title></head><body>\n" % doc_id,
        _NAV,
        b"\n<article>\n",
    ]
    for i, c in enumerate(chunks, 1):
        esc = c.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        parts.append(b'<div class="page" data-page="%d"><p>%s</p></div>\n' % (i, esc.encode()))
        if filler:
            parts.append(_FILLER * 8)
    parts += [b"</article>\n", _FOOTER]
    if n_docs > 0:
        # inter-doc links live INSIDE a footer element, so the
        # boilerplate strip removes them and every extracted-markdown
        # oracle is unaffected — they exist only for the link-graph
        # operators (pipelines/graph.py). ``url_for`` rewrites the link
        # TARGETS into another url namespace (the multihost corpus).
        if url_for is None:
            url_for = lambda t: f"{URL_PREFIX}{t}"  # noqa: E731
        rel = "".join(
            f'<a href="{url_for(t)}">related {j}</a> '
            for j, t in enumerate(related_links(doc_id, n_docs))
        )
        parts.append(b'<footer class="related">%s</footer>' % rel.encode())
    parts += [b"\n</body></html>\n"]
    return b"".join(parts)


def build_pdf(chunks: list[str]) -> bytes:
    parts = [b"%PDF-1.4\n%zx-synthetic\n"]
    for c in chunks:
        parts.append(b"stream\n" + c.encode() + b"\nendstream\n")
    parts.append(b"%%EOF\n")
    return b"".join(parts)


def build_corrupt(doc_id: int) -> bytes:
    return b"\x00\x01ZXCORRUPT" + str(doc_id).encode() * 4


def build_payload(doc_id: int, text: str, n_docs: int = 0) -> bytes:
    p = plan_doc(doc_id, text)
    if p["kind"] == "corrupt":
        return build_corrupt(doc_id)
    if p["kind"] == "pdf":
        return build_pdf(p["chunks"])
    return build_html(doc_id, p["chunks"], p["filler"], n_docs)


def generate_pages_table(documents_path: str, repeat: int = 1) -> pa.Table:
    """documents.parquet → pages table (url, warc_ts, html, text, lang).

    ``repeat`` > 1 deterministically replicates the corpus with distinct
    urls (replica-prefixed) for BENCHMARK load only — the oracle plan in
    the module docstring applies to repeat=1."""
    docs = pq.read_table(documents_path, columns=["doc_id", "text", "lang"])
    doc_ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()
    urls, tss, payloads, out_texts, out_langs = [], [], [], [], []
    n_docs = len(doc_ids)
    payload_cache = [
        build_payload(d, t, n_docs) for d, t in zip(doc_ids, texts)
    ]
    for r in range(repeat):
        prefix = URL_PREFIX if r == 0 else f"https://example.org/r{r}/doc/"
        for d, t, lg, pl in zip(doc_ids, texts, langs, payload_cache):
            urls.append(f"{prefix}{d}")
            tss.append(EPOCH_US + d * 1_000_000 + r)
            payloads.append(pl)
            out_texts.append(t)
            out_langs.append(lg)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        }
    )


def generate_media_table(n_rows: int = 256) -> pa.Table:
    """Deterministic fake multimodal table (media_id, kind, payload, meta).

    Payloads use tiny self-describing headers (ZXIMG: width/height +
    pseudo-pixels; ZXAUD: sample rate/count + pseudo-samples) so the
    decode/feature stages have real bytes to parse while the actual
    image/audio codecs stay stubbed (no PIL/ffmpeg in this runtime)."""
    import numpy as _np

    def _zximg(arr) -> bytes:
        hh, ww = arr.shape
        return (
            b"ZXIMG" + ww.to_bytes(4, "big") + hh.to_bytes(4, "big")
            + _np.ascontiguousarray(arr.astype(_np.uint8)).tobytes()
        )

    def _striped_page(w: int, h: int, seed: int):
        """Text-page-like plane: dark 'text lines' every 4th row on a
        near-white ground (drives orientation + tall-split heuristics)."""
        a = _np.full((h, w), 255, dtype=_np.uint8)
        for y in range(0, h, 4):
            a[y, : max(1, w - 1 - (seed + y) % 3)] = 40 + (seed + y) % 30
        return a

    ids, kinds, payloads = [], [], []
    for i in range(n_rows):
        ids.append(i)
        if i % 3 == 2:
            sr, n = 8000, 64 + (i % 17) * 8
            body = bytes((j * 31 + i) % 256 for j in range(n))
            payloads.append(b"ZXAUD" + sr.to_bytes(4, "big") + n.to_bytes(4, "big") + body)
            kinds.append("audio")
        elif i % 29 == 6:
            # tall receipt-style image (aspect > 5): text bands separated
            # by ≥5 empty rows at deterministic positions → tall-split case
            w, h = 16, 120
            a = _np.full((h, w), 255, dtype=_np.uint8)
            for band in range(4):
                top = band * 30
                a[top : top + 22, :] = _striped_page(w, 22, i + band)
            payloads.append(_zximg(a))
            kinds.append("image")
        elif i % 29 == 12:
            # 90°-rotated text page → orientation-correction case
            payloads.append(_zximg(_np.rot90(_striped_page(24, 16, i), -1)))
            kinds.append("image")
        elif i % 29 == 20:
            # uniform-border-padded page → trim case
            core = _striped_page(12, 10, i)
            a = _np.full((core.shape[0] + 6, core.shape[1] + 6), 255, dtype=_np.uint8)
            a[3:-3, 3:-3] = core
            payloads.append(_zximg(a))
            kinds.append("image")
        else:
            w, h = 8 + i % 24, 8 + (i * 7) % 24
            body = bytes((x * 13 + i) % 256 for x in range(w * h))
            payloads.append(b"ZXIMG" + w.to_bytes(4, "big") + h.to_bytes(4, "big") + body)
            kinds.append("image")
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def _atomic_write_dir(final_dir: str, writer) -> None:
    parent = os.path.dirname(final_dir)
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=parent, prefix=".gen-")
    try:
        writer(tmp)
        os.rename(tmp, final_dir)
    except OSError:
        # lost the rename race → someone else generated it; that's fine
        if not os.path.isdir(final_dir):
            raise
    finally:
        if os.path.isdir(tmp) and tmp != final_dir:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)



def _sf_tag(sf_dir: str) -> str:
    """Cache-key tag for a testdata dir: leaf name + a fingerprint of the
    source documents.parquet (abspath/size/mtime). Basename alone would
    let two corpora that share a leaf dir name — or an edited-in-place
    documents.parquet — silently reuse each other's cached pages."""
    import zlib as _zlib

    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    doc = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(doc)
        ident = f"{os.path.abspath(doc)}:{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        ident = os.path.abspath(doc)
    return f"{base}-{_zlib.crc32(ident.encode()):08x}"


def pages_dir_for(
    sf_dir: str, cache_root: str = "/tmp/zerox_ray_cache", repeat: int = 1
) -> str:
    """Directory of pages-*.parquet for a testdata sf dir; generated once,
    cached, written atomically (tmpdir + rename) so concurrent callers and
    resumed runs see either nothing or the complete corpus."""
    tag = _sf_tag(sf_dir)
    name = "pages" if repeat == 1 else f"pages-x{repeat}"
    out = os.path.join(cache_root, f"v{GEN_VERSION}", tag, name)
    if os.path.isdir(out):
        return out

    def write(tmp: str) -> None:
        table = generate_pages_table(os.path.join(sf_dir, "documents.parquet"), repeat)
        for start in range(0, table.num_rows, ROWS_PER_FILE):
            part = table.slice(start, ROWS_PER_FILE)
            pq.write_table(part, os.path.join(tmp, f"pages-{start // ROWS_PER_FILE:05d}.parquet"))

    _atomic_write_dir(out, write)
    return out


def generate_sheet_pages_table(documents_path: str) -> pa.Table:
    """documents.parquet → pages table of ZXSHEET structured-data payloads.

    THE SHEET PLAN (mirrored by the ``structured_pages`` SQL oracle in
    __ray_entry__.py — keep in sync):
      n_sheets = 1 + doc_id % 3
      L        = ceil(len(text) / n_sheets)
      sheet i (1-indexed): name "Sheet{i}", cell = text[(i-1)*L : i*L]
      page content = functions.sheetx.sheet_to_html(name, cell)
    """
    from zerox_ray.functions.sheetx import build_sheet_payload

    docs = pq.read_table(documents_path, columns=["doc_id", "text", "lang"])
    urls, tss, payloads, out_texts, out_langs = [], [], [], [], []
    for d, t, lg in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist(), docs["lang"].to_pylist()
    ):
        n = 1 + d % 3
        L = -(-len(t) // n)
        sheets = [(f"Sheet{i}", t[(i - 1) * L : i * L]) for i in range(1, n + 1)]
        urls.append(f"https://example.org/sheet/{d}")
        tss.append(EPOCH_US + d * 1_000_000)
        payloads.append(build_sheet_payload(sheets))
        out_texts.append(t)
        out_langs.append(lg)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        }
    )


def sheet_pages_dir_for(sf_dir: str, cache_root: str = "/tmp/zerox_ray_cache") -> str:
    """Cached structured-data pages corpus for a testdata sf dir."""
    tag = _sf_tag(sf_dir)
    out = os.path.join(cache_root, f"v{GEN_VERSION}", tag, "sheet-pages")
    if os.path.isdir(out):
        return out

    def write(tmp: str) -> None:
        table = generate_sheet_pages_table(os.path.join(sf_dir, "documents.parquet"))
        pq.write_table(table, os.path.join(tmp, "pages-00000.parquet"))

    _atomic_write_dir(out, write)
    return out


def generate_snapshot_pages_table(documents_path: str) -> pa.Table:
    """documents.parquet → MULTI-SNAPSHOT pages table: each url appears
    1 + doc_id % 3 times with distinct warc_ts; only the NEWEST snapshot
    carries the real payload — older ones carry deterministic stale
    decoys that would produce DIFFERENT markdown if wrongly kept. Every
    7th doc additionally gets a decoy that TIES the newest warc_ts,
    constructed so the real payload wins the crc32 tie-break
    (sources/pages.py::latest_snapshots). Running the OCR pipeline with
    ``latest_snapshot_only=True`` over this table must therefore produce
    byte-identical output to the repeat=1 corpus — which is exactly what
    the ``ocr_snapshot_ingest`` oracle (the ocr_documents SQL) checks."""
    import zlib

    docs = pq.read_table(documents_path, columns=["doc_id", "text", "lang"])
    n_docs = docs.num_rows
    urls, tss, payloads, out_texts, out_langs = [], [], [], [], []

    def add(d: int, ts: int, pl: bytes, t: str, lg: str) -> None:
        urls.append(f"{URL_PREFIX}{d}")
        tss.append(ts)
        payloads.append(pl)
        out_texts.append(t)
        out_langs.append(lg)

    for d, t, lg in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist(), docs["lang"].to_pylist()
    ):
        real = build_payload(d, t, n_docs)
        n_snap = 1 + d % 3
        newest_ts = EPOCH_US + d * 1_000_000 + (n_snap - 1)
        for s in range(n_snap - 1):
            add(d, EPOCH_US + d * 1_000_000 + s,
                build_payload(d, f"STALE SNAPSHOT {s} {t}"), t, lg)
        add(d, newest_ts, real, t, lg)
        if d % 7 == 0:
            # the kept row is max (warc_ts, crc32): pad the decoy until
            # its crc32 sorts BELOW the real payload's. When the real
            # crc32 is small this can fail cheaply — skip the decoy then
            # (most %7 docs still exercise the tie-break; deterministic)
            decoy = build_payload(d, f"TIED STALE {t}")
            for _ in range(64):
                if zlib.crc32(decoy) < zlib.crc32(real):
                    add(d, newest_ts, decoy, t, lg)
                    break
                decoy += b"#"
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        }
    )


def snapshot_pages_dir_for(
    sf_dir: str, cache_root: str = "/tmp/zerox_ray_cache"
) -> str:
    """Cached multi-snapshot pages corpus for a testdata sf dir."""
    tag = _sf_tag(sf_dir)
    out = os.path.join(cache_root, f"v{GEN_VERSION}", tag, "snapshot-pages")
    if os.path.isdir(out):
        return out

    def write(tmp: str) -> None:
        table = generate_snapshot_pages_table(
            os.path.join(sf_dir, "documents.parquet")
        )
        pq.write_table(table, os.path.join(tmp, "pages-00000.parquet"))

    _atomic_write_dir(out, write)
    return out


def warc_dir_for(
    sf_dir: str, cache_root: str = "/tmp/zerox_ray_cache", gzip: bool = True
) -> str:
    """The SAME corpus as ``pages_dir_for``, serialized to standard
    ``.warc.gz`` files (Common Crawl's on-disk container — see
    sources/warc.py): url/warc_ts/html per record, ROWS_PER_FILE records
    per file. Because the records round-trip to the identical pages
    table, every pages-plan oracle (ocr_documents et al.) applies to a
    WARC-ingested run unchanged."""
    from zerox_ray.sources.warc import serialize_warc

    tag = _sf_tag(sf_dir)
    name = "warc-gz" if gzip else "warc"
    out = os.path.join(cache_root, f"v{GEN_VERSION}", tag, name)
    if os.path.isdir(out):
        return out
    ext = ".warc.gz" if gzip else ".warc"

    def write(tmp: str) -> None:
        table = generate_pages_table(os.path.join(sf_dir, "documents.parquet"))
        urls = table["url"].to_pylist()
        tss = [t.value for t in table["warc_ts"]]
        payloads = table["html"].to_pylist()
        for start in range(0, table.num_rows, ROWS_PER_FILE):
            end = min(start + ROWS_PER_FILE, table.num_rows)
            fname = f"part-{start // ROWS_PER_FILE:05d}{ext}"
            data = serialize_warc(
                urls[start:end], tss[start:end], payloads[start:end],
                fname, gzip=gzip,
            )
            with open(os.path.join(tmp, fname), "wb") as fh:
                fh.write(data)

    _atomic_write_dir(out, write)
    return out


#: multihost corpus: pages spread over MH_HOSTS synthetic hosts so the
#: host-level graph family (pipelines/graph.py host_graph / host_rank /
#: host_stats / host_quota) has a real multi-host url namespace. 23 is
#: prime and coprime with the link closed form's constants, so hosts mix.
MH_HOSTS = 23


def mh_url(doc_id: int) -> str:
    """The multihost url closed form (mirrored by the host-family SQL
    oracles in __ray_entry__.py — keep in sync):
    host(d) = 'h' || (d mod 23) || '.example.net'."""
    return f"https://h{doc_id % MH_HOSTS}.example.net/doc/{doc_id}"


def generate_multihost_pages_table(documents_path: str) -> pa.Table:
    """documents.parquet → MULTIHOST pages table: same per-doc payload
    plan as ``generate_pages_table`` (same kinds, chunks, filler) but the
    page url AND the embedded related-link targets live in the
    ``mh_url`` namespace — so in-corpus link extraction with
    prefix='https://h' yields a 23-host graph whose every edge is
    SQL-replayable from doc_id alone (testgen.related_links +
    mh_url)."""
    docs = pq.read_table(documents_path, columns=["doc_id", "text", "lang"])
    n_docs = docs.num_rows
    urls, tss, payloads, out_texts, out_langs = [], [], [], [], []
    for d, t, lg in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist(), docs["lang"].to_pylist()
    ):
        p = plan_doc(d, t)
        if p["kind"] == "corrupt":
            pl = build_corrupt(d)
        elif p["kind"] == "pdf":
            pl = build_pdf(p["chunks"])
        else:
            pl = build_html(d, p["chunks"], p["filler"], n_docs, url_for=mh_url)
        urls.append(mh_url(d))
        tss.append(EPOCH_US + d * 1_000_000)
        payloads.append(pl)
        out_texts.append(t)
        out_langs.append(lg)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        }
    )


def multihost_pages_dir_for(
    sf_dir: str, cache_root: str = "/tmp/zerox_ray_cache"
) -> str:
    """Cached multihost pages corpus for a testdata sf dir."""
    tag = _sf_tag(sf_dir)
    out = os.path.join(cache_root, f"v{GEN_VERSION}", tag, "multihost-pages")
    if os.path.isdir(out):
        return out

    def write(tmp: str) -> None:
        table = generate_multihost_pages_table(
            os.path.join(sf_dir, "documents.parquet")
        )
        for start in range(0, table.num_rows, ROWS_PER_FILE):
            part = table.slice(start, ROWS_PER_FILE)
            pq.write_table(
                part,
                os.path.join(tmp, f"pages-{start // ROWS_PER_FILE:05d}.parquet"),
            )

    _atomic_write_dir(out, write)
    return out


def media_path_for(sf_dir: str, cache_root: str = "/tmp/zerox_ray_cache") -> str:
    """Cached fake multimodal table for a sf dir (row count scales with sf)."""
    tag = _sf_tag(sf_dir)
    out = os.path.join(cache_root, f"v{GEN_VERSION}", tag, "media")
    if os.path.isdir(out):
        return out
    n = max(64, pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows // 2)

    def write(tmp: str) -> None:
        pq.write_table(generate_media_table(n), os.path.join(tmp, "media-00000.parquet"))

    _atomic_write_dir(out, write)
    return out


# --- pure-python golden builders (pytest oracles, independent of Ray) --------


def expected_pages_rows(documents_path: str) -> list[dict]:
    """Golden per-page rows computed straight from the plan (no HTML/PDF
    round-trip) — the unit-level oracle for byte-identity."""
    docs = pq.read_table(documents_path, columns=["doc_id", "text"])
    rows = []
    for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        p = plan_doc(d, t)
        if p["is_err"]:
            rows.append(
                {"url": p["url"], "page_index": 1, "content": "", "content_length": 0, "status": "ERROR"}
            )
            continue
        for i, c in enumerate(p["chunks"], 1):
            rows.append(
                {"url": p["url"], "page_index": i, "content": c, "content_length": len(c), "status": "SUCCESS"}
            )
    return rows


def expected_documents_rows(documents_path: str) -> list[dict]:
    """Golden per-document rows (markdown = SUCCESS pages joined '\\n\\n',
    reference join: index.ts:566 / zerox.py:172)."""
    docs = pq.read_table(documents_path, columns=["doc_id", "text"])
    rows = []
    for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        p = plan_doc(d, t)
        if p["is_err"]:
            rows.append(
                {"url": p["url"], "markdown": "", "total_pages": 1, "ocr_successful": 0, "ocr_failed": 1}
            )
        else:
            rows.append(
                {
                    "url": p["url"],
                    "markdown": "\n\n".join(p["chunks"]),
                    "total_pages": p["n_pages"],
                    "ocr_successful": p["n_pages"],
                    "ocr_failed": 0,
                }
            )
    return rows


def generate_video_table(n_rows: int = 64) -> pa.Table:
    """Deterministic fake video table (media_id, payload): ZXVID
    containers — magic + width + height + n_frames (4-byte big-endian
    each) + n_frames constant-value uint8 planes ((i*31 + f*7) % 256), so
    every sampled frame's dims and pixel mean have closed forms the
    frame-features oracle replays exactly. Real video codecs (ffmpeg)
    stay stubbed, same policy as generate_media_table."""
    ids, payloads = [], []
    for i in range(n_rows):
        w = 8 + i % 13
        h = 8 + (i * 5) % 11
        nf = 4 + i % 9
        frames = b"".join(
            bytes([(i * 31 + f * 7) % 256]) * (w * h) for f in range(nf)
        )
        payloads.append(
            b"ZXVID"
            + w.to_bytes(4, "big")
            + h.to_bytes(4, "big")
            + nf.to_bytes(4, "big")
            + frames
        )
        ids.append(i)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def video_path_for(sf_dir: str, cache_root: str = "/tmp/zerox_ray_cache") -> str:
    """Cached fake video table for a sf dir (row count scales with sf)."""
    tag = _sf_tag(sf_dir)
    out = os.path.join(cache_root, f"v{GEN_VERSION}", tag, "video")
    if os.path.isdir(out):
        return out
    n = max(64, pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows // 4)

    def write(tmp: str) -> None:
        pq.write_table(generate_video_table(n), os.path.join(tmp, "video-00000.parquet"))

    _atomic_write_dir(out, write)
    return out


def jsonl_dir_for(sf_dir: str, cache_root: str = "/tmp/zerox_ray_cache") -> str:
    """The SAME corpus as ``pages_dir_for``, serialized to JSONL shards
    (sources/jsonl.py — base64 payloads, µs timestamps as ints). The
    records round-trip to the identical pages table, so every
    pages-plan oracle applies to a JSONL-ingested run unchanged."""
    from zerox_ray.sources.jsonl import serialize_jsonl

    tag = _sf_tag(sf_dir)
    out = os.path.join(cache_root, f"v{GEN_VERSION}", tag, "jsonl")
    if os.path.isdir(out):
        return out

    def write(tmp: str) -> None:
        table = generate_pages_table(os.path.join(sf_dir, "documents.parquet"))
        urls = table["url"].to_pylist()
        tss = [t.value for t in table["warc_ts"]]
        payloads = table["html"].to_pylist()
        for start in range(0, table.num_rows, ROWS_PER_FILE):
            end = min(start + ROWS_PER_FILE, table.num_rows)
            fname = f"part-{start // ROWS_PER_FILE:05d}.jsonl"
            data = serialize_jsonl(
                urls[start:end], tss[start:end], payloads[start:end]
            )
            with open(os.path.join(tmp, fname), "wb") as fh:
                fh.write(data)

    _atomic_write_dir(out, write)
    return out
