"""Unit tests for scalar string functions (byte-exact cases mirror the TS
reference formatMarkdown semantics, node-zerox/src/utils/common.ts:50-60)."""

import pytest

from zerox_ray.functions.schema import split_schema, validate_llm_params
from zerox_ray.functions.text import (
    camel_to_snake,
    format_markdown,
    format_markdown_py,
    is_valid_url,
    sanitize_filename,
    snake_to_camel,
)


class TestFormatMarkdown:
    def test_strips_markdown_fence(self):
        assert format_markdown("```markdown\n# Hi\n```") == "\n# Hi\n"

    def test_strips_html_fence(self):
        assert format_markdown("```html\n<b>x</b>\n```") == "\n<b>x</b>\n"

    def test_preserves_other_language_blocks(self):
        src = "before\n```python\nprint(1)\n```\nafter"
        assert format_markdown(src) == src

    def test_strips_bare_fences(self):
        assert format_markdown("```\ncode\n```") == "\ncode\n"

    def test_mixed(self):
        src = "```markdown\nA\n```\n```js\nx\n```"
        assert format_markdown(src) == "\nA\n\n```js\nx\n```"

    def test_identity_on_plain_text(self):
        assert format_markdown("plain **bold** text") == "plain **bold** text"

    def test_py_variant_full_string_only(self):
        assert format_markdown_py("```md\nX\n```") == "X"
        # PY variant does NOT strip inner fences (whole-string anchor)
        assert format_markdown_py("a\n```\nX\n```") == "a\n```\nX\n```"


def test_sanitize_filename():
    # reference chain (index.ts:558-562): delete [^\w\s], \s+ → '_',
    # lowercase, truncate — punctuation is DELETED, not underscored
    assert sanitize_filename("https://Example.org/Doc 1!") == "httpsexampleorgdoc_1"
    assert sanitize_filename("My-File (v2)") == "myfile_v2"
    assert len(sanitize_filename("x" * 500)) == 255


def test_casing_helpers():
    assert snake_to_camel("max_tokens") == "maxTokens"
    assert camel_to_snake("maxTokens") == "max_tokens"
    # TS replaces EVERY capital, the leading one included
    assert camel_to_snake("PageCount") == "_page_count"


def test_is_valid_url():
    assert is_valid_url("https://a.b/c")
    assert is_valid_url("http://a.b")
    assert not is_valid_url("ftp://a.b")
    assert not is_valid_url("not a url")


def test_split_schema_no_per_page():
    schema = {"type": "object", "properties": {"a": {"type": "string"}}, "required": ["a"]}
    full, page = split_schema(schema, None)
    assert full == schema and page is None


def test_split_schema_partition():
    schema = {
        "type": "object",
        "properties": {"a": {"type": "string"}, "b": {"type": "integer"}},
        "required": ["a", "b"],
    }
    full, page = split_schema(schema, ["b"])
    assert full["properties"] == {"a": {"type": "string"}} and full["required"] == ["a"]
    assert page["properties"] == {"b": {"type": "integer"}} and page["required"] == ["b"]


def test_split_schema_all_per_page():
    schema = {"type": "object", "properties": {"a": {}}, "required": []}
    full, page = split_schema(schema, ["a"])
    assert full is None and page is not None


def test_validate_llm_params():
    out = validate_llm_params({"temperature": 0.5}, "openai")
    assert out["temperature"] == 0.5 and out["maxTokens"] == 4000
    with pytest.raises(ValueError):
        validate_llm_params({"nope": 1}, "openai")
    with pytest.raises(ValueError):
        validate_llm_params({"temperature": "hot"}, "openai")
