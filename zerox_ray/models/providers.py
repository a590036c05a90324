"""LLM provider model stubs — the pluggable real-model surface.

Parity targets: OpenAIModel (node-zerox/src/models/openAI.ts:93-215),
AzureModel (models/azure.ts:22-197), BedrockModel (models/bedrock.ts:25-220),
GoogleModel (models/google.ts:21-169), litellm PY model
(py_zerox/pyzerox/models/modellitellm.py:17-155).

This sandbox has no network, so ``complete``/``extract`` raise; the
constructors perform the reference's fail-fast credential/param validation
(modellitellm.py:53-68 runs validations at init — here: at actor-pool
start). The scorer stage treats these classes identically to the
deterministic model: swap the class, keep the pipeline.
"""

from __future__ import annotations

from zerox_ray.functions.schema import validate_llm_params
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
        # real transport would send in place of SYSTEM_PROMPT_BASE
        if prompt is not None:
            self.system_prompt = prompt
        self.llm_params = validate_llm_params(llm_params, self.provider)

    required_credentials: tuple[str, ...] = ()

    def complete(self, fragment, kind, maintain_format=False, prior_tail="") -> Completion:
        raise NotImplementedError(
            f"{self.provider} requires network access, unavailable in this environment"
        )

    def extract(self, content, schema) -> Extraction:
        raise NotImplementedError(
            f"{self.provider} requires network access, unavailable in this environment"
        )


@register_model("openai")
class OpenAIModel(_NetworkedModel):
    provider = "openai"
    required_credentials = ("api_key",)


@register_model("azure")
class AzureModel(_NetworkedModel):
    provider = "azure"
    required_credentials = ("api_key", "endpoint")


@register_model("bedrock")
class BedrockModel(_NetworkedModel):
    provider = "bedrock"
    required_credentials = ("region",)


@register_model("google")
class GoogleModel(_NetworkedModel):
    provider = "google"
    required_credentials = ("api_key",)
