"""Deterministic default model: boilerplate-strip "vision OCR" + rule-based
structured extraction.

Replaces the reference's networked, non-deterministic LLM call
(node-zerox/src/models/openAI.ts:93-157) with a pure function of the page
fragment, so the distributed pipeline's output is byte-identical per url
across runs and cluster sizes (north-star invariant) and fully offline-
testable — the same role the mocked OpenAIModel plays in the reference's
performance tests (node-zerox/tests/performance.test.ts:16-36).

maintain_format parity: the reference injects the PRIOR page's markdown
into the prompt (CONSISTENCY_PROMPT, constants.ts:8-9; sequential loop
index.ts:357-365). Deterministically, this model makes the conditioning
byte-observable: when a prior tail is supplied, the page content is
prefixed with a format-continuity marker derived from the prior page's
last ``PRIOR_TAIL_CHARS`` characters.
"""

from __future__ import annotations

import math
import zlib

from zerox_ray.functions.htmlx import extract_main_text
from zerox_ray.functions.pdfx import extract_pdf_text
from zerox_ray.functions.text import TOKEN_RE, format_markdown
from zerox_ray.models.base import (
    Completion,
    Extraction,
    ScorerModel,
    register_model,
)

#: characters of the prior page carried as conditioning context
PRIOR_TAIL_CHARS = 16
#: deterministic token accounting: 1 token ≈ 4 bytes/chars (ceil)
_CHARS_PER_TOKEN = 4


def _tokens(n: int) -> int:
    return math.ceil(n / _CHARS_PER_TOKEN)


@register_model("deterministic")
class DeterministicExtractorModel(ScorerModel):
    """Pure-function page model; safe to construct in every scorer actor."""

    def __init__(
        self,
        prior_tail_chars: int = PRIOR_TAIL_CHARS,
        prompt: str | None = None,
        logprobs: bool = False,
    ):
        self.prior_tail_chars = prior_tail_chars
        # logprobs opt-in (reference types.ts:234-242 via llmParams): the
        # deterministic stand-in scores each content token by length —
        # stable across runs, so the column is testable end-to-end
        self.logprobs = logprobs
        # custom system prompt (ZeroxConfig.prompt → createModel,
        # reference index.ts:76). The real models send it to the LLM; the
        # deterministic model makes the conditioning byte-observable with
        # a stable marker prefix derived from the prompt text.
        if prompt is not None:
            self.system_prompt = prompt
        self._prompt_marker = (
            "" if prompt is None else f"<!-- prompt:{zlib.crc32(prompt.encode()):08x} -->\n"
        )

    def complete(
        self,
        fragment: bytes,
        kind: str,
        maintain_format: bool = False,
        prior_tail: str = "",
    ) -> Completion:
        in_tok = _tokens(len(fragment))
        if kind == "html":
            text = extract_main_text(fragment.decode("utf-8", errors="replace"))
        elif kind == "pdf":
            text = extract_pdf_text(fragment)
        elif kind == "sheet":
            # structured data BYPASSES the model (file.ts:311-329): the
            # page content IS the rendered sheet HTML — so neither the
            # prompt marker nor maintain_format conditioning may touch it
            text = fragment.decode("utf-8", errors="replace")
            tail = text[-self.prior_tail_chars :] if self.prior_tail_chars > 0 else ""
            return Completion(text, in_tok, _tokens(len(text)), tail=tail)
        else:
            return Completion("", in_tok, 0, error=f"unsupported payload kind {kind!r}")
        text = self._prompt_marker + format_markdown(text)
        # text[-0:] is the WHOLE string — 0 must mean "no conditioning"
        tail = text[-self.prior_tail_chars :] if self.prior_tail_chars > 0 else ""
        if maintain_format and prior_tail:
            text = f"<!-- cont:{prior_tail} -->\n{text}"
        lp = None
        if self.logprobs:
            lp = [
                {"token": t, "logprob": -len(t) / 10.0}
                for t in TOKEN_RE.findall(text)
            ]
        return Completion(text, in_tok, _tokens(len(text)), tail=tail, logprobs=lp)

    def extract(self, content: str, schema: dict) -> Extraction:
        """Rule-based structured extraction: each schema property is computed
        deterministically from the content by property name (stand-in for
        handleExtraction's json_schema response, openAI.ts:159-215).

        Supported property names: first_token, n_tokens, n_chars; unknown
        properties extract as None (null), mirroring optional schema keys.
        """
        toks = TOKEN_RE.findall(content)
        known = {
            "first_token": toks[0] if toks else "",
            "n_tokens": len(toks),
            "n_chars": len(content),
        }
        out = {k: known.get(k) for k in schema.get("properties", {})}
        return Extraction(out, _tokens(len(content)), _tokens(len(str(out))))
