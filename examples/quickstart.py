"""Quickstart: the reference's zerox() call, re-expressed on this engine.

Reference (py_zerox, README.md:392-414):

    result = await zerox(file_path="cs101.pdf", model="gpt-4o-mini",
                         output_dir="./output", select_pages=None)
    # → ZeroxOutput(pages=[Page(content=..., page=1), ...])

Here the unit of work is a PARQUET TABLE of documents, not one file —
but the call shape maps one-to-one:

    reference argument          engine equivalent
    ------------------          -----------------
    file_path                   a row of the pages table (url, html)
    model / credentials         ZeroxConfig(model_provider=..., model_kwargs=...)
    maintain_format             ZeroxConfig(maintain_format=True)
    select_pages                ZeroxConfig(select_pages=[...])
    output_dir (.md files)      write_markdown_files(docs, out_dir)
    ZeroxOutput.pages           extracted_pages(pages)   (per-page table)
    ZeroxOutput (markdown etc.) run_ocr(pages)           (per-doc table)
    extract + schema            extract_documents(pages, ZeroxConfig(schema=...))

Run:  python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    from zerox_ray import ZeroxConfig, run_ocr, write_markdown_files
    from zerox_ray.pipelines.extraction import extract_documents
    from zerox_ray.testgen import pages_dir_for

    # a small Common-Crawl-style pages table (url, warc_ts, html, text, lang)
    pages = pages_dir_for("/root/testdata/sf0.001")

    # 1. document → markdown (the flagship path)
    docs = run_ocr(pages)
    print(docs.take(2))

    # 2. maintain_format: each page conditioned on the prior page's tail
    mf = run_ocr(pages, ZeroxConfig(maintain_format=True))
    print(mf.count(), "documents with format continuity")

    # 3. write one .md per document (reference's output_dir behavior)
    n = write_markdown_files(docs, "/tmp/zerox_quickstart_md")
    print(n, "markdown files written")

    # 4. schema-driven structured extraction
    schema = {
        "type": "object",
        "properties": {"first_token": {"type": "string"}, "n_tokens": {"type": "integer"}},
    }
    extracted = extract_documents(pages, ZeroxConfig(schema=schema))
    print(extracted.take(1))

    ray.shutdown()


if __name__ == "__main__":
    main()
