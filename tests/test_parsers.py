"""Unit tests for the HTML block scorer and the zx-pdf container parser."""

import pytest

from zerox_ray.functions import htmlx, pdfx
from zerox_ray.testgen import build_html, build_pdf, plan_doc


class TestHtmlBlocks:
    def test_link_farm_dropped(self):
        frag = '<li><a href="/">home</a></li><p>real content with enough text here</p>'
        blocks = htmlx.parse_blocks(frag)
        assert [b.keep for b in blocks] == [False, True]

    def test_nav_container_dropped(self):
        frag = "<nav><p>plain text inside nav</p></nav><p>keep me please ok</p>"
        assert htmlx.extract_main_text(frag) == "keep me please ok"

    def test_entity_unescape(self):
        assert htmlx.extract_main_text("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"

    def test_whitespace_preserved_verbatim(self):
        assert htmlx.extract_main_text("<p>  spaced  out  </p>") == "  spaced  out  "

    def test_multiple_blocks_joined(self):
        out = htmlx.extract_main_text("<p>one</p><h2>two</h2><p>three</p>")
        assert out == "one\n\ntwo\n\nthree"

    def test_split_pages_ordering(self):
        payload = build_html(1, ["alpha", "beta", "gamma"], filler=False)
        frags = htmlx.split_html_pages(payload)
        assert len(frags) == 3
        texts = [htmlx.extract_main_text(f.decode()) for f in frags]
        assert texts == ["alpha", "beta", "gamma"]

    def test_no_page_markers_single_page(self):
        frags = htmlx.split_html_pages(b"<html><body><p>only one</p></body></html>")
        assert len(frags) == 1
        assert htmlx.extract_main_text(frags[0].decode()) == "only one"

    def test_comments_and_scripts_stripped(self):
        payload = (
            b"<html><body><!-- junk --><script>var x = '<p>no</p>';</script>"
            b"<p>yes this is the content</p></body></html>"
        )
        frags = htmlx.split_html_pages(payload)
        assert htmlx.extract_main_text(frags[0].decode()) == "yes this is the content"


class TestPdf:
    def test_magic_sniffs(self):
        assert pdfx.is_pdf_payload(b"%PDF-1.4\nrest")
        assert not pdfx.is_pdf_payload(b"<html>")
        assert pdfx.is_cfb_payload(b"\xd0\xcf\x11\xe0junk")

    def test_split_and_text_roundtrip(self):
        payload = build_pdf(["page one", "page two"])
        frags = pdfx.split_pdf_pages(payload)
        assert [pdfx.extract_pdf_text(f) for f in frags] == ["page one", "page two"]
        assert pdfx.pdf_page_count(payload) == 2

    def test_non_pdf_raises(self):
        with pytest.raises(ValueError):
            pdfx.split_pdf_pages(b"<html>")

    def test_real_pdf_stubbed(self):
        with pytest.raises(NotImplementedError):
            pdfx.split_pdf_pages(b"%PDF-1.7\nreal pdf bytes")


class TestImportTrySeams:
    """Every real-codec seam must work BOTH ways: NotImplementedError
    without the library, real parse when a module is present (faked here —
    the runtime ships none of them)."""

    def test_real_pdf_without_pypdf(self):
        with pytest.raises(NotImplementedError, match="pypdf"):
            pdfx.parse_real_pdf(b"%PDF-1.7\nreal pdf bytes")

    def test_real_pdf_with_fake_pypdf(self, monkeypatch):
        import sys
        import types

        class FakePage:
            def __init__(self, t):
                self._t = t

            def extract_text(self):
                return self._t

        class FakeReader:
            def __init__(self, fh):
                self.pages = [FakePage("page one"), FakePage(None)]

        mod = types.ModuleType("pypdf")
        mod.PdfReader = FakeReader
        monkeypatch.setitem(sys.modules, "pypdf", mod)
        frags = pdfx.parse_real_pdf(b"%PDF-1.7\nreal pdf bytes")
        assert frags == [b"page one", b""]

    def test_media_decode_without_pil(self):
        from zerox_ray.pipelines.media import _decode_real

        with pytest.raises(NotImplementedError, match="PIL"):
            _decode_real(b"\x89PNG fake")

    def test_media_decode_with_fake_pil(self, monkeypatch):
        import sys
        import types

        class FakeImg:
            def convert(self, mode):
                return [[0, 255], [128, 64]]

        pil = types.ModuleType("PIL")
        img_mod = types.ModuleType("PIL.Image")
        img_mod.open = lambda fh: FakeImg()
        pil.Image = img_mod
        monkeypatch.setitem(sys.modules, "PIL", pil)
        monkeypatch.setitem(sys.modules, "PIL.Image", img_mod)
        from zerox_ray.pipelines.media import _decode_real

        out = _decode_real(b"\x89PNG fake")
        assert out["kind"] == "image" and out["width"] == 2 and out["height"] == 2

    def test_heic_sniffed_and_error_row(self):
        import pyarrow as pa

        from zerox_ray.stages.classify import ClassifyPayload
        from zerox_ray.stages.split import PageSplitter

        heic = b"\x00\x00\x00\x18ftypheic" + b"\x00" * 32
        batch = pa.table(
            {
                "url": pa.array(["u"], pa.string()),
                "html": pa.array([heic], pa.binary()),
            }
        )
        classified = ClassifyPayload(4)(batch)
        assert classified["kind"][0].as_py() == "heic"
        out = PageSplitter()(classified)
        assert out["kind"][0].as_py() == "error"
        assert b"pillow-heif" in out["fragment"][0].as_py()


def test_plan_doc_chunking_covers_text():
    p = plan_doc(6, "abcdefghij")  # np = 1 + 6%4 = 3
    assert p["n_pages"] == 3
    assert "".join(p["chunks"]) == "abcdefghij"


def test_plan_doc_error_and_skew_arms():
    assert plan_doc(13, "x" * 50)["is_err"]
    assert plan_doc(100, "x" * 50)["n_pages"] == 24
    assert plan_doc(7, "x" * 50)["kind"] == "pdf"


class TestHtmlSplitEdges:
    def test_nested_div_page_not_truncated(self):
        from zerox_ray.functions.htmlx import extract_main_text, split_html_pages

        p = (
            b'<html><body><div class="page"><div class="box">x</div>'
            b"<p>Main body text</p></div>"
            b'<div class="page"><p>second</p></div></body></html>'
        )
        pages = split_html_pages(p)
        assert len(pages) == 2
        texts = [extract_main_text(x.decode()) for x in pages]
        assert texts == ["Main body text", "second"]

    def test_uppercase_page_markers_recognized(self):
        from zerox_ray.functions.htmlx import split_html_pages

        p = (
            b'<html><body><DIV CLASS="page"><p>a</p></DIV>'
            b'<DIV CLASS="page"><p>b</p></DIV></body></html>'
        )
        assert len(split_html_pages(p)) == 2

    def test_max_page_prefix_bound(self):
        from zerox_ray.functions.htmlx import split_html_pages
        from zerox_ray.testgen import build_html

        raw = build_html(3, ["p1", "p2", "p3", "p4"], False)
        full = split_html_pages(raw)
        pref = split_html_pages(raw, max_page=2)
        assert len(pref) == 2
        assert pref == full[:2]  # byte-identical prefix

    def test_uppercase_link_blocks_scored(self):
        from zerox_ray.functions.htmlx import extract_main_text

        frag = '<li><A HREF="/x">Archives</A></li><p>real content here</p>'
        # the uppercase link farm must be dropped, the paragraph kept
        assert extract_main_text(frag) == "real content here"


def test_error_row_survives_select_pages_without_page_1():
    """A corrupt doc under select_pages=[2] must still surface as an
    ERROR row (the error row is not a page; select must not filter it)."""
    import pandas as pd
    import ray.data

    from zerox_ray import ZeroxConfig, extracted_pages
    from zerox_ray.testgen import build_corrupt

    ds = ray.data.from_items(
        [{"url": "u1", "html": build_corrupt(9), "text": "", "lang": "en"}]
    )
    pages = extracted_pages(ds, ZeroxConfig(select_pages=[2])).to_pandas()
    assert len(pages) == 1
    assert pages.status.iloc[0] == "ERROR"


def test_sheet_negative_length_prefix_raises():
    """Malformed ZXSHEET length prefixes must raise, never loop forever."""
    import pytest

    from zerox_ray.functions.sheetx import SHEET_MAGIC, split_sheet_pages

    bad = SHEET_MAGIC + b"== sheet:-10:-12 ==\nXXXX"
    with pytest.raises(ValueError, match="out of range"):
        split_sheet_pages(bad)


def test_zxaud_truncation_raises():
    from zerox_ray.pipelines.media import decode_payload
    import pytest

    p = b"ZXAUD" + (8000).to_bytes(4, "big") + (1000).to_bytes(4, "big") + b"short"
    with pytest.raises(ValueError, match="truncated"):
        decode_payload(p)


def test_read_pages_snapshot_collapse_with_pruned_columns(sf_dir):
    """latest_snapshot_only must work even when the caller prunes away
    the url/html columns the collapse itself needs."""
    from zerox_ray.sources.pages import read_pages
    from zerox_ray.testgen import snapshot_pages_dir_for

    ds = read_pages(
        snapshot_pages_dir_for(sf_dir),
        columns=("url", "text"),
        latest_snapshot_only=True,
    )
    df = ds.to_pandas()
    assert list(df.columns) == ["url", "text"]
    assert df.url.is_unique


def test_html_sniff_tolerates_bom_and_whitespace():
    """Leading BOM/whitespace must not turn valid HTML into an ERROR row."""
    import pandas as pd
    import ray.data

    from zerox_ray import run_ocr

    ds = ray.data.from_items(
        [
            {"url": "u1", "html": b"\xef\xbb\xbf<html><body><p>bom page</p></body></html>",
             "text": "", "lang": "en"},
            {"url": "u2", "html": b"\n  <html><body><p>ws page</p></body></html>",
             "text": "", "lang": "en"},
        ]
    )
    docs = run_ocr(ds).to_pandas().sort_values("url")
    assert docs.ocr_failed.sum() == 0
    assert docs.markdown.tolist() == ["bom page", "ws page"]


def test_extraction_rejects_complex_property_types_at_build():
    import pytest

    from zerox_ray.pipelines.extraction import _prop_type

    with pytest.raises(ValueError, match="unsupported extraction property"):
        _prop_type({"type": "array"})


def test_unknown_provider_fails_at_build():
    import pytest

    from zerox_ray.models.base import is_stateful_provider

    with pytest.raises(ValueError, match="unknown model provider"):
        is_stateful_provider("determinstic")
