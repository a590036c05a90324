"""Golden-fixture tests for provider request assembly (VERDICT round-2
item 1): each provider × {OCR, OCR+maintain_format, extraction} must
produce the exact request its reference transport sends —
openAI.ts:93-215, azure.ts:96-197, bedrock.ts:107-220, google.ts:89-169,
modellitellm.py:108-155 — with ``complete()`` raising only at the
transport seam (``_send``)."""

import base64
import json

import pytest

from zerox_ray.functions.prompts import SYSTEM_PROMPT_BASE, consistency_prompt
from zerox_ray.models import create_model
from zerox_ray.models.requests import (
    convert_keys_to_camel_case,
    convert_keys_to_snake_case,
    parse_bedrock_completion,
    parse_bedrock_extraction,
    parse_google_completion,
    parse_google_extraction,
    parse_openai_completion,
)

PNG = b"\x89PNG\r\n\x1a\nfakepagebytes"
B64 = base64.b64encode(PNG).decode("ascii")
OPENAI_IMG = {"type": "image_url", "image_url": {"url": f"data:image/png;base64,{B64}"}}
ANTHROPIC_IMG = {
    "type": "image",
    "source": {"data": B64, "media_type": "image/png", "type": "base64"},
}
GOOGLE_IMG = {"inlineData": {"data": B64, "mimeType": "image/png"}}
SCHEMA = {
    "type": "object",
    "properties": {"title": {"type": "string"}},
    "required": ["title"],
}
PRIOR = "# Prior Page\n\ntail text"


class TestKeyCaseHelpers:
    def test_snake_is_shallow(self):
        # common.ts:23-33 maps only top-level keys
        got = convert_keys_to_snake_case({"maxTokens": 9, "nested": {"topP": 1}})
        assert got == {"max_tokens": 9, "nested": {"topP": 1}}
        assert convert_keys_to_snake_case(None) == {}

    def test_camel_is_recursive(self):
        got = convert_keys_to_camel_case(
            {"content": [{"top_logprobs": [{"log_prob": -0.1}]}]}
        )
        assert got == {"content": [{"topLogprobs": [{"logProb": -0.1}]}]}


class TestOpenAIRequests:
    def _model(self, **kw):
        return create_model("openai", model="gpt-4o-mini", credentials={"api_key": "sk-test"}, **kw)

    def test_ocr_golden(self):
        req = self._model().build_ocr_request([PNG])
        assert req == {
            "url": "https://api.openai.com/v1/chat/completions",
            "headers": {
                "Authorization": "Bearer sk-test",
                "Content-Type": "application/json",
            },
            "body": {
                "messages": [
                    {"role": "system", "content": SYSTEM_PROMPT_BASE},
                    {"role": "user", "content": [OPENAI_IMG]},
                ],
                "model": "gpt-4o-mini",
                # validated defaults, snake-cased (model.ts:61-83)
                "frequency_penalty": 0,
                "max_tokens": 4000,
                "presence_penalty": 0,
                "temperature": 0,
                "top_p": 1,
                "logprobs": False,
            },
        }

    def test_ocr_maintain_format_second_system_message(self):
        req = self._model().build_ocr_request(
            [PNG], maintain_format=True, prior_page=PRIOR
        )
        msgs = req["body"]["messages"]
        assert [m["role"] for m in msgs] == ["system", "system", "user"]
        assert msgs[1]["content"] == consistency_prompt(PRIOR)
        # no conditioning without a prior page (openAI.ts:106)
        req2 = self._model().build_ocr_request([PNG], maintain_format=True)
        assert [m["role"] for m in req2["body"]["messages"]] == ["system", "user"]

    def test_ocr_prompt_override_and_params(self):
        req = self._model(prompt="custom sys", temperature=0.5, logprobs=True).build_ocr_request([PNG])
        assert req["body"]["messages"][0]["content"] == "custom sys"
        assert req["body"]["temperature"] == 0.5
        assert req["body"]["logprobs"] is True

    def test_extraction_golden(self):
        req = self._model().build_extraction_request("page one text", SCHEMA)
        assert req["body"]["response_format"] == {
            "json_schema": {"name": "extraction", "schema": SCHEMA},
            "type": "json_schema",
        }
        # string input → single text part, no system message without prompt
        assert req["body"]["messages"] == [
            {"role": "user", "content": [{"text": "page one text", "type": "text"}]}
        ]

    def test_extraction_image_and_mixed_inputs(self):
        m = self._model(prompt="extract this")
        req = m.build_extraction_request([PNG, PNG], SCHEMA)
        assert req["body"]["messages"][0] == {"role": "system", "content": "extract this"}
        assert req["body"]["messages"][1]["content"] == [OPENAI_IMG, OPENAI_IMG]
        mixed = m.build_extraction_request(
            {"image_buffers": [PNG], "text": "caption"}, SCHEMA
        )
        assert mixed["body"]["messages"][1]["content"] == [
            OPENAI_IMG,
            {"text": "caption", "type": "text"},
        ]

    def test_complete_fails_only_at_transport(self):
        # no network in this sandbox: assembly/validation must all pass,
        # and the failure is the connection itself (URLError), not a stub
        import urllib.error

        m = self._model(max_retries=0, timeout_s=0.2)
        m.credentials["base_url"] = "http://127.0.0.1:1/v1/chat/completions"
        with pytest.raises((urllib.error.URLError, ConnectionError, TimeoutError)):
            m.complete(PNG, "html")


class TestAzureRequests:
    def _model(self, **kw):
        return create_model(
            "azure",
            model="my-deployment",
            credentials={"api_key": "az-key", "endpoint": "https://org.openai.azure.com"},
            **kw,
        )

    def test_ocr_golden(self):
        req = self._model().build_ocr_request([PNG])
        assert req["url"] == (
            "https://org.openai.azure.com/openai/deployments/my-deployment"
            "/chat/completions?api-version=2024-10-21"
        )
        assert req["headers"] == {"api-key": "az-key", "Content-Type": "application/json"}
        # azure.ts:128: the body's model is the EMPTY string
        assert req["body"]["model"] == ""
        assert req["body"]["messages"][0]["content"] == SYSTEM_PROMPT_BASE
        assert req["body"]["messages"][1]["content"] == [OPENAI_IMG]

    def test_extraction_matches_openai_shape(self):
        req = self._model().build_extraction_request("txt", SCHEMA)
        assert req["body"]["response_format"]["type"] == "json_schema"
        assert req["body"]["model"] == ""


class TestBedrockRequests:
    def _model(self, **kw):
        return create_model(
            "bedrock",
            model="anthropic.claude-3-haiku-20240307-v1:0",
            credentials={"region": "us-east-1"},
            **kw,
        )

    def test_ocr_golden(self):
        req = self._model().build_ocr_request([PNG])
        assert req == {
            "modelId": "anthropic.claude-3-haiku-20240307-v1:0",
            "accept": "application/json",
            "contentType": "application/json",
            "body": {
                "anthropic_version": "bedrock-2023-05-31",
                "max_tokens": 4000,  # validated default overrides the 4096 fallback
                "messages": [{"role": "user", "content": [ANTHROPIC_IMG]}],
                "system": SYSTEM_PROMPT_BASE,
                "temperature": 0,
                "top_p": 1,
            },
        }

    def test_ocr_consistency_appends_to_system(self):
        # bedrock.ts:120-122: APPENDED to the single system string,
        # not a second message (Anthropic bodies have one system field)
        req = self._model().build_ocr_request(
            [PNG], maintain_format=True, prior_page=PRIOR
        )
        assert req["body"]["system"] == (
            SYSTEM_PROMPT_BASE + "\n\n" + consistency_prompt(PRIOR)
        )
        assert len(req["body"]["messages"]) == 1

    def test_extraction_forced_tool_choice(self):
        req = self._model().build_extraction_request("text in", SCHEMA)
        body = req["body"]
        assert body["tool_choice"] == {"name": "json", "type": "tool"}
        assert body["tools"] == [{"input_schema": SCHEMA, "name": "json"}]
        assert "system" not in body  # undefined prompt is dropped (bedrock.ts:192)
        req2 = self._model(prompt="sys").build_extraction_request("x", SCHEMA)
        assert req2["body"]["system"] == "sys"

    def test_body_is_json_serializable(self):
        req = self._model().build_ocr_request([PNG])
        json.dumps(req["body"])  # the transport JSON.stringifies it


class TestGoogleRequests:
    def _model(self, **kw):
        return create_model(
            "google", model="gemini-2.0-flash", credentials={"api_key": "g-key"}, **kw
        )

    def test_ocr_images_first_then_prompt(self):
        # google.ts:98-113: image parts FIRST, then the prompt text,
        # then the consistency text
        req = self._model().build_ocr_request(
            [PNG, PNG], maintain_format=True, prior_page=PRIOR
        )
        assert req["model"] == "gemini-2.0-flash"
        assert req["contents"] == [
            GOOGLE_IMG,
            GOOGLE_IMG,
            {"text": SYSTEM_PROMPT_BASE},
            {"text": consistency_prompt(PRIOR)},
        ]
        assert req["config"] == {
            "max_output_tokens": 4000,
            "temperature": 0,
            "top_p": 1,
        }

    def test_extraction_schema_in_config(self):
        req = self._model().build_extraction_request("body text", SCHEMA)
        assert req["contents"] == [
            {"text": "body text"},  # google parts carry no "type" key
            {"text": "Extract schema data"},  # google.ts:146 fallback
        ]
        assert req["config"]["responseMimeType"] == "application/json"
        assert req["config"]["responseSchema"] == SCHEMA
        assert req["config"]["top_p"] == 1  # user params stay snake-cased


class TestLiteLLMRequests:
    def test_ocr_messages_golden(self):
        m = create_model("litellm", model="gemini/gemini-2.0-flash", temperature=0.1)
        req = m.build_ocr_request([PNG], maintain_format=True, prior_page=PRIOR)
        assert req["model"] == "gemini/gemini-2.0-flash"
        assert req["kwargs"] == {"temperature": 0.1}
        assert req["messages"] == [
            {"role": "system", "content": SYSTEM_PROMPT_BASE},
            {"role": "system", "content": consistency_prompt(PRIOR)},
            {"role": "user", "content": [OPENAI_IMG]},
        ]

    def test_single_image_contract(self):
        m = create_model("litellm", model="x")
        with pytest.raises(ValueError, match="one image"):
            m.build_ocr_request([PNG, PNG])

    def test_extraction_unsupported(self):
        m = create_model("litellm", model="x")
        with pytest.raises(NotImplementedError, match="OCR-only"):
            m.build_extraction_request("t", SCHEMA)


class TestResponseParsing:
    def test_openai_completion_with_logprobs(self):
        data = {
            "choices": [
                {
                    "message": {"content": "# MD"},
                    "logprobs": {
                        "content": [
                            {"token": "#", "logprob": -0.01, "top_logprobs": []}
                        ]
                    },
                }
            ],
            "usage": {"prompt_tokens": 11, "completion_tokens": 7},
        }
        out = parse_openai_completion(data, want_logprobs=True)
        assert out == {
            "content": "# MD",
            "input_tokens": 11,
            "output_tokens": 7,
            # camelized recursively, only .content kept (openAI.ts:146-150)
            "logprobs": [{"token": "#", "logprob": -0.01, "topLogprobs": []}],
        }

    def test_openai_completion_null_logprobs(self):
        data = {"choices": [{"message": {"content": "x"}, "logprobs": None}], "usage": {}}
        assert parse_openai_completion(data, want_logprobs=True)["logprobs"] is None

    def test_bedrock_parsers(self):
        comp = {"content": [{"text": "md"}], "usage": {"input_tokens": 3, "output_tokens": 4}}
        assert parse_bedrock_completion(comp) == {
            "content": "md", "input_tokens": 3, "output_tokens": 4,
        }
        ext = {"content": [{"input": {"title": "T"}}], "usage": {}}
        assert parse_bedrock_extraction(ext)["extracted"] == {"title": "T"}

    def test_google_parsers(self):
        resp = {"text": '{"title": "T"}', "usageMetadata": {"promptTokenCount": 2, "candidatesTokenCount": 5}}
        assert parse_google_completion(resp) == {
            "content": '{"title": "T"}', "input_tokens": 2, "output_tokens": 5,
        }
        assert parse_google_extraction(resp)["extracted"] == {"title": "T"}
        assert parse_google_extraction({"text": ""})["extracted"] == {}

    def test_extract_transport_seam_and_json_parse(self):
        m = create_model("openai", model="m", credentials={"api_key": "k"})
        # with a fake transport the OpenAI string payload is json-parsed
        m._send = lambda req: {
            "choices": [{"message": {"content": '{"title": "V"}'}}],
            "usage": {"prompt_tokens": 1, "completion_tokens": 2},
        }
        got = m.extract("text", SCHEMA)
        assert got.extracted == {"title": "V"}
        assert (got.input_tokens, got.output_tokens) == (1, 2)

    def test_complete_with_fake_transport_carries_logprobs(self):
        m = create_model(
            "openai", model="m", credentials={"api_key": "k"}, logprobs=True
        )
        m._send = lambda req: {
            "choices": [
                {
                    "message": {"content": "md out"},
                    "logprobs": {"content": [{"token": "md", "logprob": -0.5}]},
                }
            ],
            "usage": {"prompt_tokens": 9, "completion_tokens": 3},
        }
        c = m.complete(PNG, "html")
        assert c.content == "md out"
        assert c.logprobs == [{"token": "md", "logprob": -0.5}]
