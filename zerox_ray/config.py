"""Pipeline configuration (the engine's ZeroxArgs analogue,
node-zerox/src/types.ts:4-44; py_zerox/pyzerox/core/zerox.py:26-39).

Field parity map:
- maintain_format  ← maintainFormat (types.ts:28)
- select_pages     ← pagesToConvertAsImages / select_pages (types.ts:35;
                     zerox.py:89-95) — normalized + sorted at build time
                     (index.ts:159-163)
- error_mode       ← errorMode THROW/IGNORE (types.ts:172-175)
- max_retries      ← maxRetries (types.ts:27; utils/common.ts:62-80)
- model_provider / model_kwargs ← createModel args (models/index.ts:48-80)
- extraction schema fields ← schema/extractPerPage/extractOnly (types.ts:41,25,21)
- prompt           ← custom system prompt override (index.ts:76)
- concurrency-ish knobs are per-stage Ray settings, not per-document
  semaphores (reference concurrency=10, index.ts:48).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ZeroxConfig:
    # semantics
    maintain_format: bool = False
    select_pages: list[int] | None = None
    error_mode: str = "IGNORE"  # "IGNORE" keeps ERROR rows; "THROW" raises
    max_retries: int = 1
    # model (scorer stage) — class resolved via models.base.create_model
    model_provider: str = "deterministic"
    model_kwargs: dict = field(default_factory=dict)
    prompt: str | None = None
    # structured extraction (pipelines/extraction.py)
    schema: dict | None = None
    extract_per_page: list[str] | None = None
    extract_only: bool = False
    # physical knobs (per-stage Ray Data settings)
    split_batch_size: int = 64       # payload-heavy rows → small batches
    score_batch_size: int = 256
    # page_count-aware skew handling: docs estimated above this many
    # pages are pre-chunked into page-range work items so split/score
    # cost per row is bounded (stages/split.py:chunk_giant_docs).
    # None disables chunking. Default 64 = pathological-PDF guard that
    # never fires on typical web documents (see GIANT_PAGE_THRESHOLD).
    giant_page_threshold: int | None = 64
    actor_concurrency: tuple[int, int] | int | None = None  # None → (1, CPUs)
    # None → auto: actor pools iff the model provider holds real state
    # (network clients, warm parsers); the deterministic model is a pure
    # function, so its stages run as fusable stateless tasks instead —
    # actor pools would add startup + an un-fusable operator boundary for
    # zero amortization benefit.
    stateful_stages: bool | None = None

    def resolved_model_kwargs(self) -> dict:
        """Model ctor kwargs with the custom system-prompt override
        threaded in (reference: ``prompt`` replaces the OCR system prompt,
        index.ts:76; py zerox.py:82-83). Every stage that constructs a
        model goes through this — prompt is config, never dead weight."""
        kwargs = dict(self.model_kwargs)
        if self.prompt is not None:
            kwargs["prompt"] = self.prompt
        return kwargs

    def __post_init__(self) -> None:
        if self.error_mode not in ("IGNORE", "THROW"):
            raise ValueError(f"error_mode must be IGNORE or THROW, got {self.error_mode!r}")
        if self.select_pages is not None:
            # normalize int → [int], sort, dedupe (index.ts:159-163; zerox.py:89-95)
            if isinstance(self.select_pages, int):
                self.select_pages = [self.select_pages]
            self.select_pages = sorted(set(int(p) for p in self.select_pages))
            if any(p < 1 for p in self.select_pages):
                raise ValueError("select_pages are 1-indexed and must be >= 1")
        if self.extract_only and self.schema is None:
            # mode invariant (index.ts:118-123)
            raise ValueError("extract_only requires a schema")
