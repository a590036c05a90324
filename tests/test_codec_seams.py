"""Codec-seam tests that run ONLY where the real libraries exist
(VERDICT round-2 item 7): this sandbox ships none of pypdf / openpyxl /
PIL / pillow-heif / pytesseract / libreoffice, so every test here skips
cleanly today — but on any runtime that DOES ship them, these catch seam
bit-rot (wrong API call, wrong output shape) that the stub-path tests
cannot. Fixtures are built in-test with the same library (no vendored
binaries).

Reference seams: convertFileToPdf (file.ts:129-150), HEIC convert
(image.ts:101-126), poppler fallback (file.ts:279-308), xlsx sheets
(file.ts:363-376), Tesseract OSD (image.ts:51-70 / tesseract.ts:5-75).
"""

import shutil

import numpy as np
import pytest


class TestRealPdfSeam:
    def test_parse_real_pdf_roundtrip(self):
        pypdf = pytest.importorskip("pypdf")
        import io

        from zerox_ray.functions.pdfx import parse_real_pdf

        w = pypdf.PdfWriter()
        w.add_blank_page(width=200, height=200)
        w.add_blank_page(width=200, height=200)
        buf = io.BytesIO()
        w.write(buf)
        pages = parse_real_pdf(buf.getvalue())
        assert len(pages) == 2
        assert all(isinstance(p, bytes) for p in pages)

    def test_stub_raises_without_pypdf(self):
        try:
            import pypdf  # noqa: F401

            pytest.skip("pypdf present — stub path not reachable")
        except ImportError:
            pass
        from zerox_ray.functions.pdfx import parse_real_pdf

        with pytest.raises(NotImplementedError, match="pypdf"):
            parse_real_pdf(b"%PDF-1.4 anything")


class TestXlsxSeam:
    def test_split_xlsx_pages_sheets_as_pages(self):
        openpyxl = pytest.importorskip("openpyxl")
        import io

        from zerox_ray.functions.sheetx import split_xlsx_pages

        wb = openpyxl.Workbook()
        ws = wb.active
        ws.title = "First"
        ws.append(["a", 1])
        ws.append(["b", 2])
        wb.create_sheet("Second").append(["only", "row"])
        buf = io.BytesIO()
        wb.save(buf)
        pages = split_xlsx_pages(buf.getvalue())
        assert len(pages) == 2  # one page per sheet (file.ts:363-376)
        assert b"<h1>First</h1>" in pages[0] and b"<td>a</td>" in pages[0]
        assert b"<h1>Second</h1>" in pages[1]


class TestHeicSeam:
    def test_heic_to_jpeg_roundtrip(self):
        heif = pytest.importorskip("pillow_heif")
        Image = pytest.importorskip("PIL.Image")
        import io

        from zerox_ray.stages.split import heic_to_jpeg

        heif.register_heif_opener()
        img = Image.new("RGB", (16, 16), (200, 10, 10))
        buf = io.BytesIO()
        img.save(buf, format="HEIF")
        out = heic_to_jpeg(buf.getvalue())
        assert out[:3] == b"\xff\xd8\xff"  # JPEG SOI
        back = Image.open(io.BytesIO(out))
        assert back.size == (16, 16)


class TestPopplerRasterizeSeam:
    def _pdf_bytes(self):
        pypdf = pytest.importorskip("pypdf")
        import io

        w = pypdf.PdfWriter()
        w.add_blank_page(width=200, height=300)
        w.add_blank_page(width=200, height=300)
        buf = io.BytesIO()
        w.write(buf)
        return buf.getvalue()

    def test_rasterize_pdf_pages_runs_pdftoppm(self):
        if shutil.which("pdftoppm") is None:
            pytest.skip("poppler (pdftoppm) not on PATH")
        from zerox_ray.functions.pdfx import rasterize_pdf_pages

        images = rasterize_pdf_pages(self._pdf_bytes(), height=64)
        assert len(images) == 2
        assert all(img[:8] == b"\x89PNG\r\n\x1a\n" for img in images)

    def test_rasterize_page_subset(self):
        if shutil.which("pdftoppm") is None:
            pytest.skip("poppler (pdftoppm) not on PATH")
        from zerox_ray.functions.pdfx import rasterize_pdf_pages

        images = rasterize_pdf_pages(self._pdf_bytes(), height=64, pages=[2])
        assert len(images) == 1

    def test_stub_raises_without_poppler(self):
        if shutil.which("pdftoppm") is not None:
            pytest.skip("poppler present — stub path not reachable")
        from zerox_ray.functions.pdfx import rasterize_pdf_pages

        with pytest.raises(NotImplementedError, match="pdftoppm"):
            rasterize_pdf_pages(b"%PDF-1.4 anything")

    def test_actor_stage_emits_error_rows_without_poppler(self):
        """The Ray-side plumbing is real either way: one payload row in,
        (url, page_index, image, status) rows out, ERROR under IGNORE,
        raise under THROW (index.ts:338-352)."""
        import pyarrow as pa

        from zerox_ray.stages.split import PdfRasterize

        batch = pa.table(
            {
                "url": ["https://example.org/doc/1"],
                "html": [b"%PDF-1.4 not really"],
            }
        )
        stage = PdfRasterize()
        if stage.pdftoppm is not None:
            pytest.skip("poppler present — error path not deterministic")
        out = stage(batch)
        assert out.column_names == ["url", "page_index", "image", "status"]
        assert out["status"].to_pylist() == ["ERROR"]
        assert out["image"].to_pylist() == [b""]
        with pytest.raises(NotImplementedError):
            PdfRasterize(error_mode="THROW")(batch)

    def test_actor_stage_rasterizes_when_poppler_present(self):
        if shutil.which("pdftoppm") is None:
            pytest.skip("poppler (pdftoppm) not on PATH")
        import pyarrow as pa

        from zerox_ray.stages.split import PdfRasterize

        batch = pa.table(
            {"url": ["https://example.org/doc/1"], "html": [self._pdf_bytes()]}
        )
        out = PdfRasterize(height=64)(batch)
        assert out["status"].to_pylist() == ["OK", "OK"]
        assert out["page_index"].to_pylist() == [0, 1]


class TestOfficeSeam:
    def test_convert_office_payload_runs_soffice(self, tmp_path):
        if shutil.which("soffice") is None:
            pytest.skip("libreoffice (soffice) not on PATH")
        from zerox_ray.stages.split import convert_office_payload

        # minimal RTF: soffice converts it like legacy office docs
        out = convert_office_payload(rb"{\rtf1 hello}")
        assert out[:5] == b"%PDF-"


class TestOsdSeam:
    def test_osd_available_is_honest(self):
        from zerox_ray.stages.image_ops import osd_available

        have = True
        try:
            import pytesseract  # noqa: F401
            from PIL import Image  # noqa: F401
        except ImportError:
            have = False
        have = have and shutil.which("tesseract") is not None
        assert osd_available() == have

    def test_detect_rotation_osd_fallback_matches_heuristic(self):
        """Without OSD the seam must be BYTE-EQUIVALENT to the variance
        heuristic (the media_cleanup oracles pin this)."""
        from zerox_ray.stages.image_ops import (
            detect_rotation,
            detect_rotation_osd,
            osd_available,
        )

        if osd_available():
            pytest.skip("real OSD present — fallback path not reachable")
        rng = np.random.RandomState(7)
        for _ in range(5):
            img = rng.randint(0, 255, size=(40, 30)).astype(np.float64)
            assert detect_rotation_osd(img) == detect_rotation(img)

    def test_osd_detects_upright_text(self):
        pytesseract = pytest.importorskip("pytesseract")
        Image = pytest.importorskip("PIL.Image")
        ImageDraw = pytest.importorskip("PIL.ImageDraw")
        if shutil.which("tesseract") is None:
            pytest.skip("tesseract binary not on PATH")
        from zerox_ray.stages.image_ops import detect_rotation_osd

        img = Image.new("L", (400, 200), 255)
        d = ImageDraw.Draw(img)
        for i, line in enumerate(["The quick brown fox", "jumps over the dog"]):
            d.text((20, 40 + 60 * i), line, fill=0)
        arr = np.asarray(img, dtype=np.float64)
        assert detect_rotation_osd(arr) == 0


class TestMediaCleanupSeamWiring:
    def test_actor_resolves_rotation_fn_once(self):
        from zerox_ray.pipelines.media import MediaCleanup
        from zerox_ray.stages.image_ops import (
            detect_rotation,
            detect_rotation_osd,
            osd_available,
        )

        mc = MediaCleanup()
        want = detect_rotation_osd if osd_available() else detect_rotation
        assert mc.rotation_fn is want
