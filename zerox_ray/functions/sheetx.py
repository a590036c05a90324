"""Structured-data (spreadsheet) branch: sheets are pages.

Parity: convertExcelToHtml (node-zerox/src/utils/file.ts:210-276) renders
each sheet as an HTML ``<table>`` string, and
extractPagesFromStructuredDataFile (file.ts:311-329) turns those sheets
directly into Page rows — structured data SKIPS the vision model: the
page's content IS the sheet HTML.

Two payload encodings route here:
- ``ZXSHEET`` — a deterministic text container (this runtime has no xlsx
  codec): magic line, then one ``== sheet:<name> ==`` header per sheet
  followed by its cell text. Fully supported; used by tests/oracles.
- real ``.xlsx`` (ZIP magic ``PK\\x03\\x04``) — parsed via openpyxl when
  available, else a clearly-marked NotImplementedError (swap-in point on
  a cluster that ships openpyxl; the Ray-side plumbing is identical).
"""

from __future__ import annotations

SHEET_MAGIC = b"ZXSHEET\n"
_SHEET_HDR = b"== sheet:"


def build_sheet_payload(sheets: list[tuple[str, str]]) -> bytes:
    """[(name, cell_text), ...] → ZXSHEET container bytes.

    Headers are LENGTH-PREFIXED (``== sheet:<name_len>:<cell_len> ==``)
    so a cell whose text contains the header marker can never round-trip
    into phantom sheets — the parser reads exact byte counts, it never
    splits on content."""
    parts = [SHEET_MAGIC]
    for name, cell in sheets:
        nb, cb = name.encode(), cell.encode()
        parts.append(_SHEET_HDR + str(len(nb)).encode() + b":" + str(len(cb)).encode() + b" ==\n")
        parts.append(nb + b"\n")
        parts.append(cb + b"\n")
    return b"".join(parts)


def _escape(text: str) -> str:
    """Minimal HTML escaping, mirrored 1:1 by the SQL oracle
    (__ray_entry__.oracle_sql: nested replace())."""
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def sheet_to_html(name: str, cell: str) -> str:
    """One sheet → the reference's per-sheet HTML shape: heading + table
    (file.ts:241-266 builds ``<h1>`` + ``<table>`` rows per sheet)."""
    return f"<h1>{_escape(name)}</h1>\n<table><tr><td>{_escape(cell)}</td></tr></table>"


def split_sheet_pages(payload: bytes) -> list[bytes]:
    """ZXSHEET payload → ordered per-sheet page fragments (each fragment
    is the rendered sheet HTML, utf-8). Sequential length-prefixed parse:
    cell content is read by byte count, never pattern-matched, so content
    containing the header marker is unambiguous; a malformed container
    raises (→ ERROR row under errorMode IGNORE) rather than mis-splitting."""
    if not payload.startswith(SHEET_MAGIC):
        return split_xlsx_pages(payload)
    pages: list[bytes] = []
    pos = len(SHEET_MAGIC)
    while pos < len(payload):
        if payload[pos : pos + len(_SHEET_HDR)] != _SHEET_HDR:
            raise ValueError(f"ZXSHEET: expected sheet header at offset {pos}")
        eol = payload.index(b" ==\n", pos)
        try:
            name_len, cell_len = (
                int(x) for x in payload[pos + len(_SHEET_HDR) : eol].split(b":")
            )
        except ValueError:
            raise ValueError(
                f"ZXSHEET: malformed length-prefixed header at offset {pos}"
            ) from None
        # negative/oversized prefixes would walk pos BACKWARD (an
        # infinite loop, which error_mode cannot catch) — reject loudly
        if not (0 <= name_len <= len(payload) and 0 <= cell_len <= len(payload)):
            raise ValueError(
                f"ZXSHEET: length prefix out of range at offset {pos}"
            )
        pos = eol + 4
        name = payload[pos : pos + name_len].decode("utf-8", errors="replace")
        pos += name_len + 1  # +1: writer-added newline after the name
        cell = payload[pos : pos + cell_len]
        pos += cell_len + 1
        if pos > len(payload) + 1:
            raise ValueError("ZXSHEET: truncated payload (cell shorter than header)")
        pages.append(sheet_to_html(name, cell.decode("utf-8", errors="replace")).encode())
    if not pages:
        raise ValueError("ZXSHEET payload contains no sheets")
    return pages


def split_xlsx_pages(payload: bytes) -> list[bytes]:
    """Real-xlsx path — openpyxl when present, else an explicit stub."""
    try:
        import io

        import openpyxl  # noqa: F401
    except ImportError as exc:  # pragma: no cover - runtime has no openpyxl
        raise NotImplementedError(
            "xlsx parsing requires openpyxl, which is not available in this "
            "runtime; ZXSHEET containers are fully supported"
        ) from exc
    wb = openpyxl.load_workbook(io.BytesIO(payload), read_only=True)  # pragma: no cover
    pages = []  # pragma: no cover
    for ws in wb.worksheets:  # pragma: no cover
        rows = "".join(
            "<tr>" + "".join(f"<td>{_escape(str(c.value) if c.value is not None else '')}</td>" for c in row) + "</tr>"
            for row in ws.iter_rows()
        )
        pages.append(f"<h1>{_escape(ws.title)}</h1>\n<table>{rows}</table>".encode())
    return pages  # pragma: no cover
