"""JSON-schema plan helpers and LLM-param validation.

Parity targets: ``splitSchema`` (node-zerox/src/utils/common.ts:85-121),
``validateLLMParams`` (node-zerox/src/utils/model.ts:61-119).
Both are driver-side plan steps (run once at pipeline build, not per row).
"""

from __future__ import annotations

#: per-provider default LLM params (utils/model.ts:61-83)
DEFAULT_LLM_PARAMS: dict[str, dict] = {
    "openai": {"frequencyPenalty": 0, "maxTokens": 4000, "presencePenalty": 0, "temperature": 0, "topP": 1, "logprobs": False},
    "azure": {"frequencyPenalty": 0, "maxTokens": 4000, "presencePenalty": 0, "temperature": 0, "topP": 1, "logprobs": False},
    "bedrock": {"maxTokens": 4000, "temperature": 0, "topP": 1},
    "google": {"maxOutputTokens": 4000, "temperature": 0, "topP": 1},
    "deterministic": {},
    "base": {},
}


def validate_llm_params(params: dict, provider: str) -> dict:
    """Key/type check against per-provider defaults (model.ts:84-119):
    unknown keys or mismatched types raise; missing keys take defaults.
    An unknown provider raises too (the reference throws for providers
    without a defaults table) — an empty-defaults fallback would reject
    every standard param with a misleading 'invalid param' message."""
    if provider not in DEFAULT_LLM_PARAMS:
        raise ValueError(
            f"no LLM-param defaults for provider {provider!r}; known: "
            f"{sorted(DEFAULT_LLM_PARAMS)}"
        )
    defaults = DEFAULT_LLM_PARAMS[provider]
    out = dict(defaults)
    for key, value in params.items():
        if key not in defaults:
            raise ValueError(f"invalid LLM param {key!r} for provider {provider!r}")
        # bool is an int subclass in Python — check it explicitly FIRST so
        # logprobs=1.5 and temperature=True are rejected (the reference's
        # validateLLMParams distinguishes boolean from number, model.ts:84-119)
        if isinstance(defaults[key], bool) or isinstance(value, bool):
            ok = isinstance(defaults[key], bool) and isinstance(value, bool)
        else:
            ok = isinstance(value, type(defaults[key])) or (
                isinstance(value, (int, float))
                and isinstance(defaults[key], (int, float))
            )
        if not ok:
            raise ValueError(f"LLM param {key!r} has wrong type {type(value).__name__}")
        out[key] = value
    return out


def split_schema(schema: dict, extract_per_page: list[str] | None = None) -> tuple[dict | None, dict | None]:
    """Partition a JSON Schema's properties into (full_doc_schema,
    per_page_schema) by the extract_per_page key list (common.ts:85-121).

    FAITHFUL LIMITATION: like the reference, sub-schemas are rebuilt
    from only {type, properties, required} — top-level keys such as
    $defs/definitions/additionalProperties are dropped, so a property
    holding a $ref would dangle in the split result (the reference does
    the same; keep split schemas self-contained).

    Returns (full_doc, per_page); either may be None when empty."""
    if not extract_per_page:
        return schema, None
    per_page_keys = set(extract_per_page)
    props = schema.get("properties", {})
    full = {k: v for k, v in props.items() if k not in per_page_keys}
    page = {k: v for k, v in props.items() if k in per_page_keys}
    required = schema.get("required") or []

    def build(sub: dict, keys_in_page: bool) -> dict | None:
        if not sub:
            return None
        return {
            "type": schema.get("type"),
            "properties": sub,
            "required": [
                k for k in required if (k in per_page_keys) == keys_in_page
            ],
        }

    return build(full, False), build(page, True)
