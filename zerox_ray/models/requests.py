"""Pure provider request/response assembly — the network-free half of
every LLM transport, factored out so it is golden-fixture testable.

Parity targets (behavior, not code):
- OpenAI messages + ``response_format: json_schema``
  (node-zerox/src/models/openAI.ts:93-215)
- Azure OpenAI: same message shape, api-version 2024-10-21, deployment
  routing, ``model: ""`` in the body (models/azure.ts:26-197)
- Bedrock InvokeModel body with ``anthropic_version`` and the forced
  ``tool_choice: {name: "json", type: "tool"}`` for extraction
  (models/bedrock.ts:107-220)
- Google generateContent: images-first part ordering,
  ``responseMimeType``/``responseSchema`` for extraction
  (models/google.ts:89-169)
- litellm message shape incl. the SECOND system message for
  maintain_format (py_zerox/pyzerox/models/modellitellm.py:108-155)
- key-case conversion helpers (utils/common.ts:1-33): snake-casing is
  SHALLOW, camel-casing is RECURSIVE — mirrored exactly.

Everything here is a pure function of its arguments: the provider classes
(models/providers.py) call these to assemble the exact request a live
transport would send, and raise only at the send itself (this sandbox has
no network).
"""

from __future__ import annotations

import base64
import re

from zerox_ray.functions.prompts import SYSTEM_PROMPT_BASE, consistency_prompt

OPENAI_COMPLETIONS_URL = "https://api.openai.com/v1/chat/completions"
AZURE_API_VERSION = "2024-10-21"  # azure.ts:33
BEDROCK_ANTHROPIC_VERSION = "bedrock-2023-05-31"  # bedrock.ts:137
GOOGLE_EXTRACTION_FALLBACK_PROMPT = "Extract schema data"  # google.ts:146

_CAMEL_RE = re.compile(r"[A-Z]")
_SNAKE_RE = re.compile(r"_([a-z])")


def camel_to_snake_case(s: str) -> str:
    """camelToSnakeCase (common.ts:1-2)."""
    return _CAMEL_RE.sub(lambda m: "_" + m.group(0).lower(), s)


def snake_to_camel_case(s: str) -> str:
    """snakeToCamelCase (common.ts:82-83)."""
    return _SNAKE_RE.sub(lambda m: m.group(1).upper(), s)


def convert_keys_to_snake_case(obj: dict | None) -> dict:
    """convertKeysToSnakeCase (common.ts:23-33). Deliberately SHALLOW —
    the reference maps only the top-level keys (values pass through), and
    the request bodies spread the result, so depth changes would change
    bytes on the wire."""
    if not isinstance(obj, dict):
        return obj if obj is not None else {}
    return {camel_to_snake_case(k): v for k, v in obj.items()}


def convert_keys_to_camel_case(obj):
    """convertKeysToCamelCase (common.ts:4-21). RECURSIVE, descends into
    lists — used on response logprobs payloads."""
    if isinstance(obj, list):
        return [convert_keys_to_camel_case(v) for v in obj]
    if not isinstance(obj, dict):
        return obj if obj is not None else {}
    return {
        snake_to_camel_case(k): convert_keys_to_camel_case(v)
        for k, v in obj.items()
    }


def encode_image_to_base64(buffer: bytes) -> str:
    """encodeImageToBase64 (utils/image.ts)."""
    return base64.b64encode(buffer).decode("ascii")


def _openai_image_part(buffer: bytes) -> dict:
    return {
        "type": "image_url",
        "image_url": {"url": f"data:image/png;base64,{encode_image_to_base64(buffer)}"},
    }


def _anthropic_image_part(buffer: bytes) -> dict:
    return {
        "type": "image",
        "source": {
            "data": encode_image_to_base64(buffer),
            "media_type": "image/png",
            "type": "base64",
        },
    }


def _google_image_part(buffer: bytes) -> dict:
    """createPartFromBase64(data, "image/png") (@google/genai)."""
    return {
        "inlineData": {
            "data": encode_image_to_base64(buffer),
            "mimeType": "image/png",
        }
    }


def _message_content(input, image_part, text_key=True) -> list:
    """createMessageContent (openAI.ts:55-91 and twins): the extraction
    input is a list of image buffers, a plain text string, or a dict
    ``{"image_buffers": [...], "text": ...}`` (the reference reads image
    PATHS from disk; payloads here are already in-memory Arrow bytes)."""

    def text_part(text: str) -> dict:
        return {"text": text, "type": "text"} if text_key else {"text": text}

    if isinstance(input, list):
        return [image_part(b) for b in input]
    if isinstance(input, str):
        return [text_part(input)]
    images = [image_part(b) for b in input.get("image_buffers", [])]
    return [*images, text_part(input["text"])]


# ---------------------------------------------------------------- OpenAI


def openai_ocr_request(
    *,
    model: str,
    api_key: str,
    llm_params: dict | None = None,
    buffers: list[bytes],
    maintain_format: bool = False,
    prior_page: str = "",
    prompt: str | None = None,
) -> dict:
    """handleOCR request assembly (openAI.ts:93-136): system prompt, an
    OPTIONAL SECOND system message carrying the consistency prompt, then
    one user message with every page image."""
    messages: list = [{"role": "system", "content": prompt or SYSTEM_PROMPT_BASE}]
    if maintain_format and prior_page:
        messages.append({"role": "system", "content": consistency_prompt(prior_page)})
    messages.append(
        {"role": "user", "content": [_openai_image_part(b) for b in buffers]}
    )
    return {
        "url": OPENAI_COMPLETIONS_URL,
        "headers": {
            "Authorization": f"Bearer {api_key}",
            "Content-Type": "application/json",
        },
        "body": {
            "messages": messages,
            "model": model,
            **convert_keys_to_snake_case(llm_params),
        },
    }


def openai_extraction_request(
    *,
    model: str,
    api_key: str,
    llm_params: dict | None = None,
    input,
    schema: dict,
    prompt: str | None = None,
) -> dict:
    """handleExtraction request assembly (openAI.ts:159-194): optional
    system prompt, one user message, and the json_schema response_format
    pinning the extraction schema."""
    messages: list = []
    if prompt:
        messages.append({"role": "system", "content": prompt})
    messages.append(
        {"role": "user", "content": _message_content(input, _openai_image_part)}
    )
    return {
        "url": OPENAI_COMPLETIONS_URL,
        "headers": {
            "Authorization": f"Bearer {api_key}",
            "Content-Type": "application/json",
        },
        "body": {
            "messages": messages,
            "model": model,
            "response_format": {
                "json_schema": {"name": "extraction", "schema": schema},
                "type": "json_schema",
            },
            **convert_keys_to_snake_case(llm_params),
        },
    }


# ----------------------------------------------------------------- Azure


def azure_ocr_request(
    *,
    deployment: str,
    api_key: str,
    endpoint: str,
    llm_params: dict | None = None,
    buffers: list[bytes],
    maintain_format: bool = False,
    prior_page: str = "",
    prompt: str | None = None,
) -> dict:
    """AzureModel.handleOCR (azure.ts:96-130): identical message shape to
    OpenAI; the deployment routes via the URL and the body's model is the
    EMPTY STRING (azure.ts:128 passes model: "")."""
    base = openai_ocr_request(
        model="",
        api_key=api_key,
        llm_params=llm_params,
        buffers=buffers,
        maintain_format=maintain_format,
        prior_page=prior_page,
        prompt=prompt,
    )
    return _azureify(base, deployment=deployment, api_key=api_key, endpoint=endpoint)


def azure_extraction_request(
    *,
    deployment: str,
    api_key: str,
    endpoint: str,
    llm_params: dict | None = None,
    input,
    schema: dict,
    prompt: str | None = None,
) -> dict:
    """AzureModel.handleExtraction (azure.ts:151-177)."""
    base = openai_extraction_request(
        model="",
        api_key=api_key,
        llm_params=llm_params,
        input=input,
        schema=schema,
        prompt=prompt,
    )
    return _azureify(base, deployment=deployment, api_key=api_key, endpoint=endpoint)


def _azureify(base: dict, *, deployment: str, api_key: str, endpoint: str) -> dict:
    return {
        "url": (
            f"{endpoint.rstrip('/')}/openai/deployments/{deployment}"
            f"/chat/completions?api-version={AZURE_API_VERSION}"
        ),
        "headers": {"api-key": api_key, "Content-Type": "application/json"},
        "body": base["body"],
    }


# --------------------------------------------------------------- Bedrock


def bedrock_ocr_request(
    *,
    model_id: str,
    llm_params: dict | None = None,
    buffers: list[bytes],
    maintain_format: bool = False,
    prior_page: str = "",
    prompt: str | None = None,
) -> dict:
    """BedrockModel.handleOCR (bedrock.ts:107-149): unlike OpenAI, the
    consistency prompt is APPENDED to the single system string (there is
    no system role in the Anthropic body), and max_tokens defaults to
    4096 when the params carry none."""
    system_prompt = prompt or SYSTEM_PROMPT_BASE
    if maintain_format and prior_page:
        system_prompt += f"\n\n{consistency_prompt(prior_page)}"
    llm_params = llm_params or {}
    body = {
        "anthropic_version": BEDROCK_ANTHROPIC_VERSION,
        "max_tokens": llm_params.get("maxTokens") or 4096,
        "messages": [
            {
                "role": "user",
                "content": [_anthropic_image_part(b) for b in buffers],
            }
        ],
        "system": system_prompt,
        **convert_keys_to_snake_case(llm_params),
    }
    return {
        "modelId": model_id,
        "accept": "application/json",
        "contentType": "application/json",
        "body": body,
    }


def bedrock_extraction_request(
    *,
    model_id: str,
    llm_params: dict | None = None,
    input,
    schema: dict,
    prompt: str | None = None,
) -> dict:
    """BedrockModel.handleExtraction (bedrock.ts:167-203): the schema
    rides as a TOOL named "json" with a forced tool_choice — Anthropic
    models have no response_format, so extraction is a forced tool call
    whose ``input`` IS the extracted object."""
    llm_params = llm_params or {}
    body = {
        "anthropic_version": BEDROCK_ANTHROPIC_VERSION,
        "max_tokens": llm_params.get("maxTokens") or 4096,
        "messages": [
            {
                "role": "user",
                "content": _message_content(input, _anthropic_image_part),
            }
        ],
        "tool_choice": {"name": "json", "type": "tool"},
        "tools": [{"input_schema": schema, "name": "json"}],
        **convert_keys_to_snake_case(llm_params),
    }
    if prompt is not None:  # JSON.stringify drops undefined (bedrock.ts:192)
        body["system"] = prompt
    return {
        "modelId": model_id,
        "accept": "application/json",
        "contentType": "application/json",
        "body": body,
    }


# ---------------------------------------------------------------- Google


def google_ocr_request(
    *,
    model: str,
    llm_params: dict | None = None,
    buffers: list[bytes],
    maintain_format: bool = False,
    prior_page: str = "",
    prompt: str | None = None,
) -> dict:
    """GoogleModel.handleOCR (google.ts:89-120): part order is IMAGES
    FIRST, then the system prompt text, then the consistency text —
    Gemini's image-understanding guidance, opposite of the OpenAI order."""
    parts: list = [_google_image_part(b) for b in buffers]
    parts.append({"text": prompt or SYSTEM_PROMPT_BASE})
    if maintain_format and prior_page:
        parts.append({"text": consistency_prompt(prior_page)})
    return {
        "model": model,
        "contents": parts,
        "config": convert_keys_to_snake_case(llm_params),
    }


def google_extraction_request(
    *,
    model: str,
    llm_params: dict | None = None,
    input,
    schema: dict,
    prompt: str | None = None,
) -> dict:
    """GoogleModel.handleExtraction (google.ts:133-157): schema goes in
    the CONFIG (responseMimeType/responseSchema, camelCase — the snake
    conversion applies only to the user llm params), with the literal
    "Extract schema data" fallback prompt."""
    parts = _message_content(input, _google_image_part, text_key=False)
    parts.append({"text": prompt or GOOGLE_EXTRACTION_FALLBACK_PROMPT})
    return {
        "model": model,
        "contents": parts,
        "config": {
            **convert_keys_to_snake_case(llm_params),
            "responseMimeType": "application/json",
            "responseSchema": schema,
        },
    }


# --------------------------------------------------------------- litellm


def litellm_ocr_messages(
    *,
    system_prompt: str = None,
    maintain_format: bool = False,
    prior_page: str = "",
    image_buffer: bytes,
) -> list[dict]:
    """litellm _prepare_messages (modellitellm.py:108-155): system prompt,
    an optional SECOND system message with the consistency text, then one
    user message holding exactly one image part."""
    messages: list[dict] = [
        {"role": "system", "content": system_prompt or SYSTEM_PROMPT_BASE}
    ]
    if maintain_format and prior_page:
        messages.append({"role": "system", "content": consistency_prompt(prior_page)})
    messages.append(
        {
            "role": "user",
            "content": [_openai_image_part(image_buffer)],
        }
    )
    return messages


# ------------------------------------------------------------- responses


def parse_openai_completion(data: dict, *, want_logprobs: bool = False) -> dict:
    """OpenAI/Azure chat.completions response → normalized completion
    fields (openAI.ts:140-152). Logprobs are camelized recursively and
    only the ``content`` list survives — exactly the reference."""
    out = {
        "content": data["choices"][0]["message"]["content"] or "",
        "input_tokens": data.get("usage", {}).get("prompt_tokens", 0),
        "output_tokens": data.get("usage", {}).get("completion_tokens", 0),
    }
    if want_logprobs:
        lp = convert_keys_to_camel_case(data["choices"][0].get("logprobs"))
        out["logprobs"] = lp.get("content") if isinstance(lp, dict) else None
    return out


def parse_openai_extraction(data: dict, *, want_logprobs: bool = False) -> dict:
    """openAI.ts:198-209 — NOTE the reference returns the raw content
    STRING for OpenAI (Azure json-parses it, azure.ts:180); callers parse."""
    out = {
        "extracted": data["choices"][0]["message"]["content"],
        "input_tokens": data.get("usage", {}).get("prompt_tokens", 0),
        "output_tokens": data.get("usage", {}).get("completion_tokens", 0),
    }
    if want_logprobs:
        lp = convert_keys_to_camel_case(data["choices"][0].get("logprobs"))
        out["logprobs"] = lp.get("content") if isinstance(lp, dict) else None
    return out


def parse_bedrock_completion(body: dict) -> dict:
    """bedrock.ts:156-160."""
    usage = body.get("usage") or {}
    return {
        "content": body["content"][0]["text"],
        "input_tokens": usage.get("input_tokens") or 0,
        "output_tokens": usage.get("output_tokens") or 0,
    }


def parse_bedrock_extraction(body: dict) -> dict:
    """bedrock.ts:210-214 — the forced tool call's ``input`` IS the object."""
    usage = body.get("usage") or {}
    return {
        "extracted": body["content"][0]["input"],
        "input_tokens": usage.get("input_tokens") or 0,
        "output_tokens": usage.get("output_tokens") or 0,
    }


def parse_google_completion(resp: dict) -> dict:
    """google.ts:122-126 (response.text / usageMetadata)."""
    meta = resp.get("usageMetadata") or {}
    return {
        "content": resp.get("text") or "",
        "input_tokens": meta.get("promptTokenCount") or 0,
        "output_tokens": meta.get("candidatesTokenCount") or 0,
    }


def parse_google_extraction(resp: dict) -> dict:
    """google.ts:159-163 — empty text parses to the empty object."""
    import json

    meta = resp.get("usageMetadata") or {}
    text = resp.get("text")
    return {
        "extracted": json.loads(text) if text else {},
        "input_tokens": meta.get("promptTokenCount") or 0,
        "output_tokens": meta.get("candidatesTokenCount") or 0,
    }
