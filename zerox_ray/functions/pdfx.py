"""PDF-like binary payload handling: magic sniffing, page splitting, text.

The reference routes on a ``%PDF`` magic-number sniff
(node-zerox/src/utils/file.ts:95-98) and rasterizes PDFs into ordered page
images (file.ts:153-207; py_zerox/pyzerox/processor/pdf.py:14-33). No PDF
library exists in this runtime, so the engine defines a deterministic
synthetic PDF container ("zx-pdf") that the test generator emits and this
module parses — a stand-in for a warm pdfium/poppler parser held in the
splitter actor pool. The container keeps real PDF framing conventions
(``%PDF-`` header, ``stream``/``endstream`` page sections, ``%%EOF``) so
the classify/sniff logic is the real thing.

A real-PDF parser would slot in here behind the same two functions; it is
intentionally stubbed (see ``parse_real_pdf``).
"""

from __future__ import annotations

import re

PDF_MAGIC = b"%PDF-"
CFB_MAGIC = b"\xd0\xcf\x11\xe0"  # legacy Office (utils/file.ts:89-92)
ZX_MARKER = b"%zx-synthetic"

_STREAM_RE = re.compile(rb"stream\n([\s\S]*?)\nendstream")


def is_pdf_payload(payload: bytes) -> bool:
    """Magic-number sniff (utils/file.ts:95-98)."""
    return payload[:5] == PDF_MAGIC


def is_cfb_payload(payload: bytes) -> bool:
    """Legacy-Office sniff (utils/file.ts:89-92)."""
    return payload[:4] == CFB_MAGIC


def split_pdf_pages(payload: bytes, max_page: int | None = None) -> list[bytes]:
    """One PDF payload → ordered per-page stream fragments (the engine
    analogue of convertPdfToImages' 1-doc→N-images fan-out,
    file.ts:153-207). Raises ValueError on a non-zx container so the caller
    can emit an ERROR row (errorMode semantics, index.ts:338-352).
    ``max_page`` stops the scan after that many pages — giant-doc chunk
    rows use it so a chunk pays only for its prefix, not the whole doc."""
    if not is_pdf_payload(payload):
        raise ValueError("not a PDF payload")
    if ZX_MARKER not in payload[:64]:
        return parse_real_pdf(payload)
    out = []
    for m in _STREAM_RE.finditer(payload):
        out.append(m.group(1))
        if max_page is not None and len(out) >= max_page:
            break
    return out


def pdf_page_count(payload: bytes) -> int:
    """Cheap page-count metadata (getNumberOfPagesFromPdf,
    utils/file.ts:332-340) — feeds skew-aware planning."""
    return len(_STREAM_RE.findall(payload))


def extract_pdf_text(fragment: bytes) -> str:
    """Per-page text extraction from a zx-pdf stream fragment (the
    deterministic stand-in for the vision-model OCR of a rasterized page)."""
    return fragment.decode("utf-8", errors="replace")


def rasterize_pdf_pages(
    payload: bytes,
    *,
    density: int = 300,
    height: int = 2048,
    fmt: str = "png",
    pages: list[int] | None = None,
    pdftoppm: str | None = None,
) -> list[bytes]:
    """Poppler rasterize seam (M6, convertPdfWithPoppler,
    node-zerox/src/utils/file.ts:279-308): PDF payload → ordered per-page
    image bytes via the ``pdftoppm`` subprocess, when the cluster ships
    it — ``pdftoppm -<fmt> -r <density> -scale-to-y <height>
    -scale-to-x -1 [-f N -l N]`` exactly as the reference shells out.
    Defaults mirror convertPdfToImages (file.ts:154-156: density 300,
    height 2048). ``pages`` selects 1-based page numbers (the reference's
    pagesToConvertAsImages); None converts all. ``pdftoppm`` lets the
    actor-pool wrapper pass its once-per-actor resolved binary (the
    soffice seam pattern, stages/split.py). Raises a clearly-marked
    NotImplementedError when poppler is absent, which the splitter turns
    into an ERROR row under errorMode IGNORE."""
    if pdftoppm is None:
        import shutil

        pdftoppm = shutil.which("pdftoppm")
    if pdftoppm is None:  # pragma: no cover - runtime has no poppler
        raise NotImplementedError(
            "PDF rasterization requires poppler (pdftoppm), which is not "
            "available in this runtime — the text-extraction path "
            "(parse_real_pdf / zx-synthetic containers) is unaffected"
        )
    import os
    import subprocess
    import tempfile

    def run(td: str, src: str, first: int | None, last: int | None) -> None:
        cmd = [pdftoppm, f"-{fmt}", "-r", str(density), "-scale-to-y",
               str(height), "-scale-to-x", "-1"]
        if first is not None:
            cmd += ["-f", str(first), "-l", str(last)]
        subprocess.run(
            cmd + [src, os.path.join(td, "page")],
            check=True,
            capture_output=True,
            timeout=300,
        )

    with tempfile.TemporaryDirectory(prefix="zx-raster-") as td:
        src = os.path.join(td, "doc.pdf")
        with open(src, "wb") as fh:
            fh.write(payload)
        if pages is None:
            run(td, src, None, None)
        else:
            for p in pages:
                run(td, src, p, p)
        # pdftoppm names page-NN.<fmt>; lexical sort of the zero-padded
        # suffix IS page order (the reference readdir+filter+sort,
        # file.ts:300-307)
        names = sorted(
            n for n in os.listdir(td)
            if n.startswith("page") and n.endswith(f".{fmt}")
        )
        out = []
        for n in names:
            with open(os.path.join(td, n), "rb") as fh:
                out.append(fh.read())
        return out


def parse_real_pdf(payload: bytes) -> list[bytes]:
    """Real-PDF parsing seam (M6, poppler fallback in the reference,
    file.ts:184-206): uses pypdf when the cluster ships it (import-try,
    mirroring the openpyxl seam in sheetx.py); otherwise a clearly-marked
    NotImplementedError. The Ray-side plumbing (actor pool, fragment
    schema, error rows) is identical either way."""
    try:
        import pypdf
    except ImportError as exc:  # pragma: no cover - runtime has no pypdf
        raise NotImplementedError(
            "real PDF parsing requires pypdf (or pdfium/poppler), not "
            "available in this environment; zx-synthetic containers are "
            "fully supported"
        ) from exc
    import io

    reader = pypdf.PdfReader(io.BytesIO(payload))
    return [(page.extract_text() or "").encode() for page in reader.pages]
