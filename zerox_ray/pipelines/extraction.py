"""Schema-driven structured extraction (the reference's extraction mode).

Parity map:
- splitSchema plan step (node-zerox/src/utils/common.ts:85-121) decides the
  per-page vs full-doc stages at pipeline-BUILD time (driver-side).
- per-page extraction (index.ts:381-479): here an actor-pool map_batches
  over the scored page rows — input is the page's extracted markdown (the
  directImageExtraction variant would feed the fragment bytes instead;
  same stage, different input column).
- full-doc extraction (index.ts:482-537): pages joined with
  "\\n<hr><hr>\\n" (G2) inside the pid-bucket group, then one model call.
- merge (index.ts:435-443, 539-552): per-page results become
  {key: [{page, value}, ...]}, full-doc results shallow-merge on top —
  an order-sensitive grouped reduce (sorted by page_index).

Output of ``extract_documents``: (url, extracted) where ``extracted`` is a
canonical JSON string (sorted keys) — deterministic for value-hash checks.
``extract_pages`` emits typed flat columns per schema property instead.
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa

from zerox_ray.config import ZeroxConfig
from zerox_ray.functions.schema import split_schema
from zerox_ray.models.base import create_model
from zerox_ray.pipelines.ocr import scored_fragments
from zerox_ray.stages.reassemble import DOC_JOIN
from zerox_ray.stages.score import STATUS_ERROR, STATUS_SUCCESS

_ARROW_TYPES = {
    "string": pa.string(),
    "integer": pa.int64(),
    "number": pa.float64(),
    "boolean": pa.bool_(),
}


def _prop_type(prop_schema: dict) -> pa.DataType:
    t = prop_schema.get("type", "string")
    if t not in _ARROW_TYPES:
        # fail at pipeline BUILD (extract_pages validates every property
        # through here) — a silent string fallback would instead crash
        # inside map_batches when a model returns a list/dict value
        raise ValueError(
            f"unsupported extraction property type {t!r}; supported: "
            f"{sorted(_ARROW_TYPES)} (nest complex values as JSON strings)"
        )
    return _ARROW_TYPES[t]


class PageExtractor:
    """Actor-pool map_batches: SUCCESS page rows → per-property columns
    (handleExtraction analogue, openAI.ts:159-215; schema captured in the
    actor ctor like A4)."""

    def __init__(self, schema: dict, model_provider: str = "deterministic", model_kwargs: dict | None = None):
        self.schema = schema
        self.model = create_model(model_provider, **(model_kwargs or {}))
        self.props = list(schema.get("properties", {}))

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = [s == STATUS_SUCCESS for s in batch["status"].to_pylist()]
        urls, pids, idxs = [], [], []
        values: dict[str, list] = {k: [] for k in self.props}
        for keep, url, pid, idx, content in zip(
            mask,
            batch["url"].to_pylist(),
            batch["pid"].to_pylist(),
            batch["page_index"].to_pylist(),
            batch["content"].to_pylist(),
        ):
            if not keep:
                continue
            ex = self.model.extract(content, self.schema)
            urls.append(url)
            pids.append(pid)
            idxs.append(idx)
            for k in self.props:
                values[k].append(ex.extracted.get(k))
        cols = {
            "url": pa.array(urls, pa.string()),
            "pid": pa.array(pids, pa.int64()),
            "page_index": pa.array(idxs, pa.int64()),
        }
        for k in self.props:
            cols[k] = pa.array(values[k], _prop_type(self.schema["properties"][k]))
        return pa.table(cols)


def _direct_rows(batch: pa.Table) -> pa.Table:
    """Fragment rows → extractor-input rows with the RAW page payload as
    ``content`` (directImageExtraction/extractOnly parity, reference
    index.ts:125, 457-459: extraction consumes the page directly; the OCR
    model never runs). Error fragments become status=ERROR rows."""
    content = [
        f.decode("utf-8", errors="replace") for f in batch["fragment"].to_pylist()
    ]
    status = [
        STATUS_ERROR if k == "error" else STATUS_SUCCESS
        for k in batch["kind"].to_pylist()
    ]
    return pa.table(
        {
            "url": batch["url"],
            "pid": batch["pid"],
            "page_index": batch["page_index"],
            "content": pa.array(content, pa.large_string()),
            "status": pa.array(status, pa.string()),
        }
    )


def _content_rows(pages, cfg: ZeroxConfig, num_partitions: int | None):
    """The extractor's input rows: OCR'd page markdown normally, raw
    fragment text when ``cfg.extract_only`` — same columns either way, so
    both extraction pipelines are mode-agnostic downstream."""
    if not cfg.extract_only:
        return scored_fragments(pages, cfg, num_partitions)
    from zerox_ray.pipelines.ocr import _fragments

    frags = _fragments(pages, cfg, num_partitions)
    return frags.map_batches(
        _direct_rows, batch_format="pyarrow", zero_copy_batch=True
    )


def extract_pages(
    pages,
    cfg: ZeroxConfig,
    num_partitions: int | None = None,
):
    """Per-page structured extraction table: (url, pid, page_index,
    <one typed column per schema property>). Uses the page schema from
    split_schema when extract_per_page is set, else the whole schema."""
    if cfg.schema is None:
        raise ValueError("extraction requires cfg.schema (index.ts:118-123)")
    _, per_page = split_schema(cfg.schema, cfg.extract_per_page)
    schema = per_page if per_page is not None else cfg.schema
    from zerox_ray.pipelines.ocr import _stage_kwargs

    for prop in schema.get("properties", {}).values():
        _prop_type(prop)  # build-time validation (clear driver error)
    rows = _content_rows(pages, cfg, num_partitions)
    fn, kwargs = _stage_kwargs(
        cfg,
        PageExtractor,
        {
            "schema": schema,
            "model_provider": cfg.model_provider,
            "model_kwargs": cfg.resolved_model_kwargs(),
        },
        cfg.score_batch_size,
    )
    return rows.map_batches(fn, **kwargs)


def _merge_bucket(
    df: pd.DataFrame,
    full_doc_schema: dict | None,
    per_page_schema: dict | None,
    model_provider: str,
    model_kwargs: dict | None,
) -> pd.DataFrame:
    """One pid bucket of scored page rows → (url, extracted-JSON) rows.

    The G5 grouped reduce: per-page values appended in page order as
    {key: [{page, value}...]}, full-doc values shallow-merged on top
    (index.ts:435-443, 539-552)."""
    from zerox_ray.stages.reassemble import _cached_model

    model = _cached_model(model_provider, model_kwargs)
    all_urls = set(df["url"])
    df = df[df["status"] == STATUS_SUCCESS].sort_values(
        ["url", "page_index"], kind="mergesort"
    )
    out_urls: list = []
    out_json: list = []
    # urls whose pages ALL failed still get a row with an empty
    # extraction object — mirroring run_ocr, which keeps one documents
    # row per url (empty markdown) rather than dropping the url
    for url in sorted(all_urls - set(df["url"])):
        out_urls.append(url)
        out_json.append("{}")
    for url, g in df.groupby("url", sort=True):
        merged: dict = {}
        if per_page_schema is not None:
            # column zip, not iterrows — measured ~10× faster in the
            # identical maintain_format fold loop (reassemble.py:216)
            for pi, content in zip(
                g["page_index"].to_numpy(), g["content"].tolist()
            ):
                ex = model.extract(content, per_page_schema)
                for k, v in ex.extracted.items():
                    merged.setdefault(k, []).append({"page": int(pi), "value": v})
        if full_doc_schema is not None:
            doc_content = DOC_JOIN.join(g["content"])  # G2 separator
            ex = model.extract(doc_content, full_doc_schema)
            merged.update(ex.extracted)  # shallow merge (index.ts:548-552)
        out_urls.append(url)
        out_json.append(json.dumps(merged, sort_keys=True, separators=(",", ":")))
    # typed columns: an empty group block must carry (string, string),
    # not the float64 default, for schema-stable exchange output
    return pd.DataFrame(
        {
            "url": pd.Series(out_urls, dtype="string"),
            "extracted": pd.Series(out_json, dtype="string"),
        }
    )


def extract_documents(
    pages,
    cfg: ZeroxConfig,
    num_partitions: int | None = None,
):
    """Document-level extraction: (url, extracted) with the per-page /
    full-doc split driven by cfg.extract_per_page (splitSchema)."""
    if cfg.schema is None:
        raise ValueError("extraction requires cfg.schema")
    full_doc, per_page = split_schema(cfg.schema, cfg.extract_per_page)
    rows = _content_rows(pages, cfg, num_partitions)
    return rows.groupby("pid").map_groups(
        _merge_bucket,
        batch_format="pandas",
        fn_kwargs={
            "full_doc_schema": full_doc,
            "per_page_schema": per_page,
            "model_provider": cfg.model_provider,
            "model_kwargs": cfg.resolved_model_kwargs(),
        },
    )
