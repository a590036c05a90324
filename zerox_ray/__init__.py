"""zerox_ray — a Ray-Data-native document→markdown extraction engine.

A from-scratch reimplementation of the data-processing capabilities of
getomni-ai/zerox (reference at /root/reference, studied read-only):
Common-Crawl-style web pages (url, warc_ts, html, text, lang) stream
through `ray.data` pipelines that split each payload into logical pages,
strip boilerplate with DOM heuristics, score/extract each page with a
pluggable (deterministic by default) model, and reassemble per-url
markdown byte-identically via a groupby(url) shuffle.

Design: Dataset → map_batches over zero-copy Arrow batches; actor pools
for stateful stages; groupby/map_groups only where per-url colocation is
semantically required (reassembly, maintain_format fold).
"""

from zerox_ray.config import ZeroxConfig
from zerox_ray.pipelines.ocr import extracted_pages, run_ocr, write_markdown_files
from zerox_ray.sources.files import read_files_as_pages, read_urls_as_pages
from zerox_ray.sources.jsonl import read_jsonl_pages, write_jsonl_files
from zerox_ray.sources.warc import read_warc_pages, write_warc_files

__all__ = [
    "ZeroxConfig",
    "run_ocr",
    "extracted_pages",
    "write_markdown_files",
    "read_files_as_pages",
    "read_urls_as_pages",
    "read_jsonl_pages",
    "write_jsonl_files",
    "read_warc_pages",
    "write_warc_files",
]
__version__ = "0.1.0"
