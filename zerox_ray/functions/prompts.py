"""Prompt constants (reference: node-zerox/src/constants.ts:8-23;
py_zerox/pyzerox/constants/prompts.py:1-16).

The deterministic default model ignores these, but pluggable LLM provider
models (models/providers.py) consume them, preserving the reference's
prompt-override surface (custom ``prompt`` arg, index.ts:76).
"""

SYSTEM_PROMPT_BASE = """
Convert the following document to markdown.
Return only the markdown with no explanation text. Do not include delimiters like ```markdown or ```html.

RULES:
  - You must include all information on the page. Do not exclude headers, footers, or subtext.
  - Return tables in an HTML format.
  - Charts & infographics must be interpreted to a markdown format. Prefer table format when applicable.
  - Logos should be wrapped in brackets. Ex: <logo>Coca-Cola<logo>
  - Watermarks should be wrapped in brackets. Ex: <watermark>OFFICIAL COPY<watermark>
  - Page numbers should be wrapped in brackets. Ex: <page_number>14<page_number> or <page_number>9/22<page_number>
  - Prefer using ☐ and ☑ for check boxes.
"""


def consistency_prompt(prior_page: str) -> str:
    """CONSISTENCY_PROMPT (constants.ts:8-9): prior-page conditioning text
    for maintain_format mode."""
    return (
        "Markdown must maintain consistent formatting with the following "
        f'page: \n\n """{prior_page}"""'
    )
