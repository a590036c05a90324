"""Scorer: per-page model stage (fragment → markdown content row).

Parity: processOCR (node-zerox/src/index.ts:256-355) — per page: cleanup →
model completion with retries → CompletionProcessor.process normalization
(utils/model.ts:26-59) → Page row. Runs as an ACTOR POOL: the model client
is built ONCE per actor in __init__ (reference builds one model per run,
index.ts:248-253; litellm validations run at init,
modellitellm.py:53-68 — here they fail fast at pool start).

Retry parity: runRetries (utils/common.ts:62-80) — in-UDF retry loop with
page granularity, layered under Ray's own task retries.

Error rows are DATA (status/error columns), never poisoned blocks
(errorMode IGNORE, index.ts:338-352); THROW re-raises.
"""

from __future__ import annotations

import pyarrow as pa

from zerox_ray.models.base import create_model

EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("pid", pa.int64()),
        ("page_index", pa.int64()),
        ("content", pa.large_string()),
        ("content_length", pa.int64()),
        ("status", pa.string()),
        ("error", pa.string()),
        ("input_tokens", pa.int64()),
        ("output_tokens", pa.int64()),
    ]
)

STATUS_SUCCESS = "SUCCESS"
STATUS_ERROR = "ERROR"


def completion_to_row(url, pid, page_index, completion) -> dict:
    """CompletionProcessor.process analogue (utils/model.ts:26-59)."""
    failed = completion.error is not None
    content = "" if failed else completion.content
    return {
        "url": url,
        "pid": pid,
        "page_index": page_index,
        "content": content,
        "content_length": len(content),
        "status": STATUS_ERROR if failed else STATUS_SUCCESS,
        "error": completion.error or "",
        "input_tokens": completion.input_tokens,
        "output_tokens": completion.output_tokens,
    }


def rows_to_table(rows: list[dict]) -> pa.Table:
    cols = {name: [r[name] for r in rows] for name in EXTRACTED_SCHEMA.names}
    return pa.table(
        {n: pa.array(cols[n], EXTRACTED_SCHEMA.field(n).type) for n in EXTRACTED_SCHEMA.names}
    )


class Scorer:
    """Actor-pool map_batches: fragment rows → extracted page rows."""

    def __init__(
        self,
        model_provider: str = "deterministic",
        model_kwargs: dict | None = None,
        error_mode: str = "IGNORE",
        max_retries: int = 1,
    ):
        # once per actor: model client construction + validation
        self.model = create_model(model_provider, **(model_kwargs or {}))
        self.error_mode = error_mode
        self.max_retries = max_retries

    def _complete_with_retries(self, fragment: bytes, kind: str):
        attempt = 0
        while True:
            try:
                return self.model.complete(fragment, kind)
            except Exception as exc:  # noqa: BLE001
                if attempt >= self.max_retries:
                    if self.error_mode == "THROW":
                        raise
                    from zerox_ray.models.base import Completion

                    return Completion("", 0, 0, error=str(exc)[:256])
                attempt += 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for url, pid, idx, kind, frag in zip(
            batch["url"].to_pylist(),
            batch["pid"].to_pylist(),
            batch["page_index"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["fragment"].to_pylist(),
        ):
            if kind == "error":
                from zerox_ray.models.base import Completion

                err = frag.decode("utf-8", errors="replace") or "corrupt payload"
                if self.error_mode == "THROW":
                    raise ValueError(f"{url}: {err}")
                comp = Completion("", 0, 0, error=err)
            else:
                comp = self._complete_with_retries(frag, kind)
            rows.append(completion_to_row(url, pid, idx, comp))
        return rows_to_table(rows)
