"""Unit tests for the model interface, mock model, and provider stubs."""

import pytest

from zerox_ray.models import DeterministicExtractorModel, create_model
from zerox_ray.testgen import build_html, build_pdf


@pytest.fixture
def model():
    return DeterministicExtractorModel()


class TestComplete:
    def test_html(self, model):
        frag = b'<nav><a href="/">x</a></nav><p>hello world content</p>'
        c = model.complete(frag, "html")
        assert c.content == "hello world content" and c.error is None
        assert c.input_tokens > 0 and c.output_tokens > 0

    def test_pdf(self, model):
        c = model.complete(b"some pdf page text", "pdf")
        assert c.content == "some pdf page text"

    def test_unknown_kind_errors(self, model):
        c = model.complete(b"\x00junk", "unknown")
        assert c.error is not None and c.content == ""

    def test_maintain_format_marker_and_tail(self, model):
        c1 = model.complete(b"<p>first page content here</p>", "html", maintain_format=True)
        assert c1.content == "first page content here"
        assert c1.tail == "page content here"[-16:]
        c2 = model.complete(
            b"<p>second page</p>", "html", maintain_format=True, prior_tail=c1.tail
        )
        assert c2.content == f"<!-- cont:{c1.tail} -->\nsecond page"
        # tail is from BASE content, not the decorated content
        assert c2.tail == "second page"

    def test_fence_strip_applied(self, model):
        c = model.complete(b"<p>```markdown\nX\n```</p>", "html")
        assert c.content == "\nX\n"


class TestExtract:
    def test_known_fields(self, model):
        schema = {
            "type": "object",
            "properties": {
                "first_token": {"type": "string"},
                "n_tokens": {"type": "integer"},
                "n_chars": {"type": "integer"},
                "mystery": {"type": "string"},
            },
        }
        ex = model.extract("alpha beta gamma", schema)
        assert ex.extracted == {
            "first_token": "alpha",
            "n_tokens": 3,
            "n_chars": 16,
            "mystery": None,
        }

    def test_empty_content(self, model):
        ex = model.extract("", {"properties": {"first_token": {}, "n_tokens": {}}})
        assert ex.extracted == {"first_token": "", "n_tokens": 0}


class TestProviders:
    def test_factory_default(self):
        m = create_model("deterministic")
        assert isinstance(m, DeterministicExtractorModel)

    def test_unknown_provider(self):
        with pytest.raises(ValueError, match="unknown model provider"):
            create_model("nope")

    def test_credential_fail_fast(self):
        with pytest.raises(ValueError, match="missing credentials"):
            create_model("openai")

    def test_networked_transport_fails_at_the_socket(self):
        # a real urllib transport now backs _send; with no reachable
        # endpoint the failure is the connection, after assembly passes
        import urllib.error

        m = create_model(
            "openai", credentials={"api_key": "k"}, max_retries=0, timeout_s=0.2
        )
        m.credentials["base_url"] = "http://127.0.0.1:1/v1/chat/completions"
        with pytest.raises((urllib.error.URLError, ConnectionError, TimeoutError)):
            m.complete(b"x", "html")

    def test_llm_param_validation_at_init(self):
        with pytest.raises(ValueError, match="invalid LLM param"):
            create_model("openai", credentials={"api_key": "k"}, bogus=1)
