"""Scalar string / markdown functions.

Behavioral parity targets (reference, /root/reference):
- ``format_markdown``: TS ``formatMarkdown`` (node-zerox/src/utils/common.ts:50-60)
  is normative (the golden outputs come from the node tests); the PY variant
  (py_zerox/pyzerox/processor/text.py:7-12) differs and is provided separately.
- ``sanitize_filename``: node-zerox/src/index.ts:556-562.
- casing helpers: node-zerox/src/utils/common.ts:1-33.
- ``is_valid_url``: node-zerox/src/utils/common.ts:39-47.

All functions are pure and deterministic — they run vectorized-ish inside
``map_batches`` UDFs (compiled module-level regexes, no per-call state).
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

# -- format_markdown (TS-normative, 3-step placeholder trick) ----------------

# 1) preserve non-html/markdown fenced blocks
_PRESERVE_RE = re.compile(r"```(?!html|markdown)(\w+)([\s\S]*?)```")
# 2) strip html/markdown fences and bare fences
_STRIP_RE = re.compile(r"```(?:html|markdown)|````(?:html|markdown)|```")
# 3) restore preserved blocks
_RESTORE_RE = re.compile(r"§§§(\w+)([\s\S]*?)§§§")


def format_markdown(text: str) -> str:
    """Strip ```html / ```markdown fences while preserving other fenced code
    blocks. Byte-exact parity with the TS reference (utils/common.ts:50-60).

    Fast path: all three passes are provably no-ops without a fence or a
    placeholder marker in the input (the restore pass DOES rewrite
    pre-existing §§§…§§§ spans, so both markers must be absent)."""
    if "```" not in text and "§§§" not in text:
        return text
    out = _PRESERVE_RE.sub("§§§\\1\\2§§§", text)
    out = _STRIP_RE.sub("", out)
    out = _RESTORE_RE.sub("```\\1\\2```", out)
    return out


# -- PY-variant (kept for parity documentation; NOT used by the pipeline) ----

_PY_MD_BLOCK_RE = re.compile(r"^```[a-z]*\n([\s\S]*?)\n```$")
_PY_CODE_BLOCK_RE = re.compile(r"^```\n([\s\S]*?)\n```$")


def format_markdown_py(text: str) -> str:
    """PY-SDK variant (py_zerox/pyzerox/processor/text.py:7-12) — full-string
    fence unwrap only. Provided for parity; the pipeline uses the TS variant."""
    out = _PY_MD_BLOCK_RE.sub(r"\1", text)
    out = _PY_CODE_BLOCK_RE.sub(r"\1", out)
    return out


# -- misc scalar helpers ------------------------------------------------------

#: JS \w / \s are ASCII in the reference — mirror with re.ASCII
_NON_WORD_RE = re.compile(r"[^\w\s]", re.ASCII)
_WS_RUN_RE = re.compile(r"\s+", re.ASCII)


def sanitize_filename(name: str, max_len: int = 255) -> str:
    """Exact mirror of the reference chain (index.ts:558-562):
    delete non-word/non-space chars, collapse whitespace runs to one
    '_', lowercase, truncate. Used to derive partition-safe keys."""
    out = _NON_WORD_RE.sub("", name)
    out = _WS_RUN_RE.sub("_", out)
    return out.lower()[:max_len]


_SNAKE_RE = re.compile(r"_([a-z])")
_CAMEL_RE = re.compile(r"[A-Z]")


def snake_to_camel(s: str) -> str:
    """utils/common.ts:82-83."""
    return _SNAKE_RE.sub(lambda m: m.group(1).upper(), s)


def camel_to_snake(s: str) -> str:
    """utils/common.ts:1-2 — EVERY capital becomes '_'+lower, the
    leading one included ('PageCount' → '_page_count', as the TS does)."""
    return _CAMEL_RE.sub(lambda m: "_" + m.group(0).lower(), s)


def convert_keys_to_snake_case(d: dict | None) -> dict:
    """utils/common.ts:4-14."""
    return {camel_to_snake(k): v for k, v in (d or {}).items()}


def convert_keys_to_camel_case(d: dict | None) -> dict:
    """utils/common.ts:16-33 (shallow; nested handling not needed here)."""
    return {snake_to_camel(k): v for k, v in (d or {}).items()}


def is_valid_url(s: str) -> bool:
    """http/https predicate (utils/common.ts:39-47; PY utils.py:36-46)."""
    try:
        u = urlparse(s)
    except ValueError:
        return False
    return u.scheme in ("http", "https") and bool(u.netloc)


# -- tokenization primitives shared by dataops --------------------------------

TOKEN_RE = re.compile(r"[a-z]+")
STOPWORDS = ("the", "a", "and", "of", "to")
STOPWORD_RE = re.compile(r"\b(?:" + "|".join(STOPWORDS) + r")\b")
