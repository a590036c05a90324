"""HTML logical-page splitting and DOM-heuristic boilerplate stripping.

This is the engine's deterministic "OCR": where the reference rasterizes a
page image and asks a vision LLM for markdown
(node-zerox/src/models/openAI.ts:93-157), this engine extracts the main
content of an HTML payload with classic content-extraction heuristics —
per-block text length, link-text ratio, tag density, boilerplate-tag
priors — so the result is a pure, byte-deterministic function of the
payload (the north-star invariant: byte-identical extracted text per url).

No external HTML parser is used (none is available in the runtime);
parsing is compiled-regex byte/str scanning, which is also what keeps the
per-batch UDF cheap. All regexes are module-level (compiled once per
worker process).

Page model parity: the reference turns one document into N ordered page
images (node-zerox/src/utils/file.ts:153-207); here one HTML payload is
split into N logical pages on explicit page-break markers
(``<div class="page">`` sections), falling back to a single page.
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass

# --- byte-level structure scanning (pre-split, operates on raw payload) ------

_COMMENT_RE_B = re.compile(rb"<!--[\s\S]*?-->")
_SCRIPT_STYLE_RE_B = re.compile(rb"<(script|style)\b[\s\S]*?</\1>", re.I)
# page boundaries are the START markers; each page runs to the next
# marker (or end of body). Matching `…[\s\S]*?</div>` instead would end
# a page at the FIRST closing div — truncating any page whose content
# nests a div — and a case-sensitive scan would miss `<DIV CLASS=…>`.
_PAGE_DIV_START_RE_B = re.compile(rb"<div\s[^>]*class=\"page\"[^>]*>", re.I)
_BODY_RE_B = re.compile(rb"<body\b[^>]*>([\s\S]*?)</body>", re.I)
_NAV_RE_B = re.compile(rb"<(nav|header)\b[\s\S]*?</\1>", re.I)
_FOOTER_RE_B = re.compile(rb"<(footer|aside)\b[\s\S]*?</\1>", re.I)

# --- str-level block scoring (post-split, operates on decoded fragments) -----

_BLOCK_TAGS = "p|h[1-6]|li|td|pre|blockquote"
_BLOCK_RE = re.compile(r"<(" + _BLOCK_TAGS + r")\b[^>]*>([\s\S]*?)</\1>", re.I)
_LINK_RE = re.compile(r"<a\b[^>]*>([\s\S]*?)</a>", re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_NAV_RE = re.compile(r"<(nav|header)\b[\s\S]*?</\1>", re.I)
_FOOTER_RE = re.compile(r"<(footer|aside)\b[\s\S]*?</\1>", re.I)

#: keep a block only if link-text/text ratio is at or below this
MAX_LINK_RATIO = 1.0 / 3.0


@dataclass(slots=True)
class Block:
    """One candidate text block with its boilerplate-scoring features."""

    tag: str
    text: str
    link_ratio: float
    tag_count: int

    @property
    def keep(self) -> bool:
        return bool(self.text) and self.link_ratio <= MAX_LINK_RATIO


def strip_tags(fragment: str) -> str:
    """Inner text of an HTML fragment, entity-unescaped, whitespace preserved
    verbatim (the byte-identity invariant depends on not normalizing).
    The containment guards skip regex/unescape passes that would be
    no-ops — semantics identical, ~2x faster on tag-free inner text."""
    text = _TAG_RE.sub("", fragment) if "<" in fragment else fragment
    return _html.unescape(text) if "&" in text else text


def parse_blocks(fragment_html: str) -> list[Block]:
    """Scan block-level elements and compute boilerplate features for each."""
    blocks: list[Block] = []
    for m in _BLOCK_RE.finditer(fragment_html):
        tag, inner = m.group(1).lower(), m.group(2)
        text = strip_tags(inner)
        # case-insensitive guard matching _LINK_RE's re.I — a plain
        # '"<a" in inner' would score uppercase anchor tags as zero links
        if "<a" in inner or "<A" in inner:
            link_len = sum(len(strip_tags(g)) for g in _LINK_RE.findall(inner))
        else:
            link_len = 0
        ratio = link_len / len(text) if text else 1.0
        blocks.append(Block(tag, text, ratio, inner.count("<")))
    return blocks


def extract_main_text(fragment_html: str) -> str:
    """Boilerplate-strip one logical page: drop nav/header/footer/aside
    containers (structural prior), score remaining blocks by link-text
    ratio, join the kept block texts with a blank line.

    This is the engine analogue of the per-page "OCR to markdown" model call
    (node-zerox/src/models/openAI.ts:93-157), made deterministic.
    """
    cleaned = _NAV_RE.sub("", _FOOTER_RE.sub("", fragment_html))
    kept = [b.text for b in parse_blocks(cleaned) if b.keep]
    return "\n\n".join(kept)


def split_html_pages(payload: bytes, max_page: int | None = None) -> list[bytes]:
    """Split one HTML payload into ordered logical-page fragments.

    Each fragment carries the document's nav/footer boilerplate alongside the
    page section, so the downstream scorer genuinely exercises the
    boilerplate heuristics per page (mirroring how each zerox page image
    contains the full page incl. headers/footers).

    Returns HTML fragment byte strings in document order. A payload without
    explicit page markers is a single page.
    """
    body = payload
    if b"<!--" in body:  # guard: the sub is a no-op without the marker
        body = _COMMENT_RE_B.sub(b"", body)
    low = body.lower()  # one linear pass replaces case-insensitive regex scans
    if b"<script" in low or b"<style" in low:
        body = _SCRIPT_STYLE_RE_B.sub(b"", body)
        low = body.lower()
    # find-based <body>…</body> slice — byte-equivalent to _BODY_RE_B
    # (first open tag with a word boundary, first close tag after it;
    # no match → whole payload), ~5x faster than the lazy regex scan
    i = low.find(b"<body")
    while i >= 0:
        nxt = low[i + 5 : i + 6]
        if not (nxt.isalnum() or nxt == b"_"):
            break
        i = low.find(b"<body", i + 1)
    if i >= 0:
        j = low.find(b">", i)
        k = low.find(b"</body>", j + 1) if j >= 0 else -1
        if j >= 0 and k >= 0:
            body = body[j + 1 : k]
    nav = b"\n".join(mm.group(0) for mm in _NAV_RE_B.finditer(body))
    foot = b"\n".join(mm.group(0) for mm in _FOOTER_RE_B.finditer(body))
    # ``max_page`` (giant-doc chunk rows): stop scanning once max_page+1
    # markers are found — the +1 supplies the last wanted page's end bound
    starts = []
    for mm in _PAGE_DIV_START_RE_B.finditer(body):
        starts.append(mm.start())
        if max_page is not None and len(starts) > max_page:
            break
    if not starts:
        return [body]
    keep = starts if max_page is None else starts[:max_page]
    bounds = starts + [len(body)]
    pages = []
    for i in range(len(keep)):
        p = body[bounds[i] : bounds[i + 1]]
        # close the page at its LAST </div> before the next marker: a
        # nested div no longer truncates the page (the old lazy
        # `…[\s\S]*?</div>` regex ended at the FIRST closer), and for
        # well-formed pages the bytes are identical to that regex match
        end = p.rfind(b"</div>")
        if end >= 0:
            p = p[: end + 6]
        pages.append(p)
    return [nav + b"\n" + p + b"\n" + foot for p in pages]
