"""LLM provider models — real request assembly, transport-seam stubs.

Parity targets: OpenAIModel (node-zerox/src/models/openAI.ts:93-215),
AzureModel (models/azure.ts:22-197), BedrockModel (models/bedrock.ts:25-220),
GoogleModel (models/google.ts:21-169), litellm PY model
(py_zerox/pyzerox/models/modellitellm.py:17-155).

Each provider builds the EXACT request its live transport would send —
message shaping, base64 image parts, ``response_format: json_schema``,
Bedrock's forced ``tool_choice: {name: "json"}`` — through the pure
builders in models/requests.py (golden-fixture tested offline). The only
thing that raises is ``_send``, the network call itself: this sandbox has
no network, and a user who plugs in a transport overrides one method.

Constructors perform the reference's fail-fast credential/param validation
(modellitellm.py:53-68 runs validations at init — here: at actor-pool
start). The scorer stage treats these classes identically to the
deterministic model: swap the class, keep the pipeline.
"""

from __future__ import annotations

from zerox_ray.functions.schema import validate_llm_params
from zerox_ray.models import requests as rq
from zerox_ray.models.base import Completion, Extraction, ScorerModel, register_model


class _NetworkedModel(ScorerModel):
    provider = "base"
    stateful = True  # holds an HTTP client/session → actor-pool stages

    def __init__(
        self,
        model: str = "",
        credentials: dict | None = None,
        prompt: str | None = None,
        **llm_params,
    ):
        credentials = credentials or {}
        missing = [k for k in self.required_credentials if not credentials.get(k)]
        if missing:
            raise ValueError(
                f"{self.provider}: missing credentials {missing} "
                "(reference: createModel validation, models/index.ts:48-80)"
            )
        self.model = model
        self.credentials = credentials
        # ZeroxConfig.prompt override (index.ts:76): the system prompt the
        # transport sends in place of SYSTEM_PROMPT_BASE
        self.prompt = prompt
        if prompt is not None:
            self.system_prompt = prompt
        self.llm_params = validate_llm_params(llm_params, self.provider)

    required_credentials: tuple[str, ...] = ()

    # -- request assembly (pure, overridden per provider) ----------------
    def build_ocr_request(
        self,
        buffers: list[bytes],
        maintain_format: bool = False,
        prior_page: str = "",
    ) -> dict:
        raise NotImplementedError

    def build_extraction_request(self, input, schema: dict) -> dict:
        raise NotImplementedError

    # -- response parsing (pure, overridden per provider) ----------------
    def parse_ocr_response(self, data: dict) -> dict:
        raise NotImplementedError

    def parse_extraction_response(self, data: dict) -> dict:
        raise NotImplementedError

    # -- the transport seam: the ONLY thing that raises offline ----------
    def _send(self, request: dict) -> dict:
        raise NotImplementedError(
            f"{self.provider} requires network access, unavailable in this "
            "environment — subclass and override _send(request) with a real "
            "transport (HTTP POST of request['body'] to request['url'])"
        )

    def complete(
        self, fragment, kind, maintain_format=False, prior_tail=""
    ) -> Completion:
        request = self.build_ocr_request(
            [fragment], maintain_format=maintain_format, prior_page=prior_tail
        )
        data = self._send(request)
        parsed = self.parse_ocr_response(data)
        return Completion(
            content=parsed["content"],
            input_tokens=parsed["input_tokens"],
            output_tokens=parsed["output_tokens"],
            logprobs=parsed.get("logprobs"),
        )

    def extract(self, content, schema) -> Extraction:
        request = self.build_extraction_request(content, schema)
        data = self._send(request)
        parsed = self.parse_extraction_response(data)
        extracted = parsed["extracted"]
        if isinstance(extracted, str):  # OpenAI returns the raw JSON string
            import json

            extracted = json.loads(extracted)
        return Extraction(
            extracted=extracted,
            input_tokens=parsed["input_tokens"],
            output_tokens=parsed["output_tokens"],
        )

    @property
    def _want_logprobs(self) -> bool:
        return bool(self.llm_params.get("logprobs"))


@register_model("openai")
class OpenAIModel(_NetworkedModel):
    provider = "openai"
    required_credentials = ("api_key",)

    def build_ocr_request(self, buffers, maintain_format=False, prior_page=""):
        return rq.openai_ocr_request(
            model=self.model,
            api_key=self.credentials["api_key"],
            llm_params=self.llm_params,
            buffers=buffers,
            maintain_format=maintain_format,
            prior_page=prior_page,
            prompt=self.prompt,
        )

    def build_extraction_request(self, input, schema):
        return rq.openai_extraction_request(
            model=self.model,
            api_key=self.credentials["api_key"],
            llm_params=self.llm_params,
            input=input,
            schema=schema,
            prompt=self.prompt,
        )

    def parse_ocr_response(self, data):
        return rq.parse_openai_completion(data, want_logprobs=self._want_logprobs)

    def parse_extraction_response(self, data):
        return rq.parse_openai_extraction(data, want_logprobs=self._want_logprobs)


@register_model("azure")
class AzureModel(_NetworkedModel):
    provider = "azure"
    required_credentials = ("api_key", "endpoint")

    def build_ocr_request(self, buffers, maintain_format=False, prior_page=""):
        return rq.azure_ocr_request(
            deployment=self.model,
            api_key=self.credentials["api_key"],
            endpoint=self.credentials["endpoint"],
            llm_params=self.llm_params,
            buffers=buffers,
            maintain_format=maintain_format,
            prior_page=prior_page,
            prompt=self.prompt,
        )

    def build_extraction_request(self, input, schema):
        return rq.azure_extraction_request(
            deployment=self.model,
            api_key=self.credentials["api_key"],
            endpoint=self.credentials["endpoint"],
            llm_params=self.llm_params,
            input=input,
            schema=schema,
            prompt=self.prompt,
        )

    def parse_ocr_response(self, data):
        return rq.parse_openai_completion(data, want_logprobs=self._want_logprobs)

    def parse_extraction_response(self, data):
        return rq.parse_openai_extraction(data, want_logprobs=self._want_logprobs)


@register_model("bedrock")
class BedrockModel(_NetworkedModel):
    provider = "bedrock"
    required_credentials = ("region",)

    def build_ocr_request(self, buffers, maintain_format=False, prior_page=""):
        return rq.bedrock_ocr_request(
            model_id=self.model,
            llm_params=self.llm_params,
            buffers=buffers,
            maintain_format=maintain_format,
            prior_page=prior_page,
            prompt=self.prompt,
        )

    def build_extraction_request(self, input, schema):
        return rq.bedrock_extraction_request(
            model_id=self.model,
            llm_params=self.llm_params,
            input=input,
            schema=schema,
            prompt=self.prompt,
        )

    def parse_ocr_response(self, data):
        return rq.parse_bedrock_completion(data)

    def parse_extraction_response(self, data):
        return rq.parse_bedrock_extraction(data)


@register_model("google")
class GoogleModel(_NetworkedModel):
    provider = "google"
    required_credentials = ("api_key",)

    def build_ocr_request(self, buffers, maintain_format=False, prior_page=""):
        return rq.google_ocr_request(
            model=self.model,
            llm_params=self.llm_params,
            buffers=buffers,
            maintain_format=maintain_format,
            prior_page=prior_page,
            prompt=self.prompt,
        )

    def build_extraction_request(self, input, schema):
        return rq.google_extraction_request(
            model=self.model,
            llm_params=self.llm_params,
            input=input,
            schema=schema,
            prompt=self.prompt,
        )

    def parse_ocr_response(self, data):
        return rq.parse_google_completion(data)

    def parse_extraction_response(self, data):
        return rq.parse_google_extraction(data)


@register_model("litellm")
class LiteLLMModel(_NetworkedModel):
    """litellm PY model (modellitellm.py:17-155): kwargs pass straight to
    ``litellm.acompletion`` (the reference does NO param-key validation
    for this provider — litellm validates downstream per backing model),
    and every request carries exactly ONE image."""

    provider = "litellm"
    required_credentials = ()

    def __init__(self, model: str = "", credentials=None, prompt=None, **kwargs):
        self.model = model
        self.credentials = credentials or {}
        self.prompt = prompt
        if prompt is not None:
            self.system_prompt = prompt
        self.llm_params = dict(kwargs)  # passthrough, modellitellm.py:95

    def build_ocr_request(self, buffers, maintain_format=False, prior_page=""):
        if len(buffers) != 1:
            raise ValueError(
                "litellm OCR sends exactly one image per request "
                "(modellitellm.py:142-153)"
            )
        return {
            "model": self.model,
            "messages": rq.litellm_ocr_messages(
                system_prompt=self.prompt,
                maintain_format=maintain_format,
                prior_page=prior_page,
                image_buffer=buffers[0],
            ),
            "kwargs": dict(self.llm_params),
        }

    def parse_ocr_response(self, data):
        return rq.parse_openai_completion(data)

    def build_extraction_request(self, input, schema):
        raise NotImplementedError(
            "the reference litellm model is OCR-only (modellitellm.py has "
            "no extraction handler) — use the openai/azure/bedrock/google "
            "providers for structured extraction"
        )
