"""Structured-data (sheets-as-pages) branch + image cleanup ops."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from zerox_ray import run_ocr
from zerox_ray.functions.sheetx import (
    build_sheet_payload,
    sheet_to_html,
    split_sheet_pages,
    split_xlsx_pages,
)
from zerox_ray.pipelines.media import (
    decode_payload,
    media_cleanup,
    media_cleanup_features,
)
from zerox_ray.stages.image_ops import (
    cleanup_image,
    compress_image,
    detect_rotation,
    rotate,
    split_tall_image,
    trim_edges,
)
from zerox_ray.testgen import sheet_pages_dir_for


def _striped(w, h):
    a = np.full((h, w), 255, dtype=np.uint8)
    for y in range(0, h, 4):
        a[y, : w - 2] = 50
    return a


class TestSheetBranch:
    def test_roundtrip_and_escape(self):
        p = build_sheet_payload([("Sheet1", "a & <b>"), ("Sheet2", "x\ny")])
        pages = split_sheet_pages(p)
        assert pages == [
            b"<h1>Sheet1</h1>\n<table><tr><td>a &amp; &lt;b&gt;</td></tr></table>",
            b"<h1>Sheet2</h1>\n<table><tr><td>x\ny</td></tr></table>",
        ]

    def test_header_marker_in_cell_roundtrips(self):
        """A cell containing the literal sheet-header marker must stay ONE
        sheet (length-prefixed parse — no phantom sheets, ADVICE fix)."""
        evil = "before\n== sheet:FakeName ==\nafter"
        pages = split_sheet_pages(build_sheet_payload([("Real", evil)]))
        assert len(pages) == 1
        assert b"FakeName" in pages[0] and pages[0].startswith(b"<h1>Real</h1>")

    def test_xlsx_stub_raises(self):
        with pytest.raises(NotImplementedError):
            split_xlsx_pages(b"PK\x03\x04 not a real zip")

    def test_pipeline_sheets_are_pages(self, sf_dir):
        docs = run_ocr(sheet_pages_dir_for(sf_dir)).to_pandas()
        assert len(docs) == 500
        assert (docs.ocr_failed == 0).all()
        # doc_id 5 → 1 + 5%3 = 3 sheets
        row = docs[docs.url == "https://example.org/sheet/5"].iloc[0]
        assert row.total_pages == 3
        assert row.markdown.count("<table>") == 3
        assert row.markdown.startswith("<h1>Sheet1</h1>")

    def test_sheet_content_matches_renderer(self, sf_dir):
        import pyarrow.parquet as pq

        from zerox_ray.pipelines.ocr import extracted_pages

        got = extracted_pages(sheet_pages_dir_for(sf_dir)).to_pandas()
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        d, text = 7, t["text"][7].as_py()
        ns = 1 + d % 3
        L = -(-len(text) // ns)
        for i in range(1, ns + 1):
            exp = sheet_to_html(f"Sheet{i}", text[(i - 1) * L : i * L])
            g = got[(got.url == f"https://example.org/sheet/{d}") & (got.page_index == i)]
            assert g.content.iloc[0] == exp


class TestImageOps:
    def test_trim_strips_uniform_border(self):
        core = _striped(12, 10)
        pad = np.full((16, 18), 255, dtype=np.uint8)
        pad[3:13, 3:15] = core
        t = trim_edges(pad)
        # trim reaches the outermost non-background pixel: border rows/cols
        # of the result all contain content, interior blanks are kept
        assert t.shape[0] <= 10 and t.shape[1] <= 12
        assert (t[0] != 255).any() and (t[-1] != 255).any()
        assert (t[:, 0] != 255).any() and (t[:, -1] != 255).any()

    def test_trim_uniform_image(self):
        assert trim_edges(np.full((5, 5), 7, dtype=np.uint8)).shape == (1, 1)

    def test_orientation_roundtrip(self):
        up = _striped(24, 16)
        assert detect_rotation(up) == 0
        rot = np.rot90(up, -1)
        deg = detect_rotation(rot)
        assert deg == 90
        assert np.array_equal(rotate(rot, deg), up)

    def test_tall_split_at_empty_runs(self):
        tall = np.full((120, 16), 255, dtype=np.uint8)
        for b in range(4):
            tall[b * 30 : b * 30 + 22, :12] = 60
        secs = split_tall_image(tall)
        assert len(secs) >= 4
        assert sum(s.shape[0] for s in secs) == 120
        # every section boundary falls in an empty band (no band is cut)
        y = 0
        for s in secs[:-1]:
            y += s.shape[0]
            assert (tall[y] > 230).mean() > 0.95

    def test_short_image_not_split(self):
        a = _striped(20, 40)  # aspect 2 < 5
        assert len(split_tall_image(a)) == 1

    def test_compress_respects_cap(self):
        enc = lambda arr: b"HDR" + arr.tobytes()
        big = np.zeros((64, 64), dtype=np.uint8)
        out = compress_image(big, 300, enc)
        assert len(out) <= 300

    def test_cleanup_composition(self):
        pad = np.full((22, 30), 255, dtype=np.uint8)
        pad[3:19, 3:27] = _striped(24, 16)
        secs = cleanup_image(pad)
        assert len(secs) == 1 and secs[0].shape[0] <= 16

    def test_media_cleanup_pipeline(self, sf_dir):
        out = media_cleanup(sf_dir).to_pandas()
        # tall planted images (media_id % 29 == 6, % 3 != 2) split into >1 fragment
        tall_ids = [i for i in range(250) if i % 29 == 6 and i % 3 != 2]
        for mid in tall_ids[:3]:
            assert (out.media_id == mid).sum() > 1
        # every image fragment decodes and matches its recorded dims
        frag = out[(out.media_id == tall_ids[0])].iloc[0]
        d = decode_payload(bytes(frag.payload))
        assert (d["width"], d["height"]) == (frag.width, frag.height)

    def test_media_cleanup_features(self, sf_dir):
        out = media_cleanup_features(sf_dir).to_pandas()
        # only the three closed-form branches survive the filter
        assert set(out.media_id % 29) <= {6, 12, 20}
        # tall receipts split into exactly 5 fragments (empty runs at
        # 25/55/85/115 over a 120-row raster)
        tall = out[out.media_id % 29 == 6]
        assert (tall.groupby("media_id").fragment_index.count() == 5).all()
        assert (tall.width == 16).all()
        # rotated pages trim to 23x13 after the 90-degree correction
        rot = out[out.media_id % 29 == 12]
        assert ((rot.width == 23) & (rot.height == 13)).all()
        # padded pages trim the uniform border down to the 11x9 core
        padded = out[out.media_id % 29 == 20]
        assert ((padded.width == 11) & (padded.height == 9)).all()
        # features are self-consistent
        assert (out.n_units == out.width * out.height).all()
        assert out.mean_value_ppm.between(0, 255_000_000).all()

    def test_media_cleanup_size_cap(self, sf_dir):
        out = media_cleanup(sf_dir, max_bytes=80).to_pandas()
        img = out[out.width > 0]
        assert (img.payload.map(lambda p: len(bytes(p))) <= 80).all()


class TestFrameSampling:
    def test_sampler_explodes_and_reencodes(self):
        import numpy as np
        import pandas as pd

        from zerox_ray.pipelines.media import FrameSampler, decode_payload
        from zerox_ray.testgen import generate_video_table

        vids = generate_video_table(8).to_pandas()
        out = FrameSampler(k=4)(vids)
        # every video has nf >= 4 → exactly 4 frames each
        assert len(out) == 32
        assert (out.groupby("media_id").size() == 4).all()
        for r in out.itertuples():
            d = decode_payload(bytes(r.payload))
            i, fi = int(r.media_id), int(r.frame_index)
            assert d["width"] == 8 + i % 13
            assert d["height"] == 8 + (i * 5) % 11
            assert (d["data"] == (i * 31 + fi * 7) % 256).all()
        # sampled indices strictly increase and stay in range
        per = out.groupby("media_id").frame_index.apply(list)
        for i, idxs in per.items():
            nf = 4 + i % 9
            assert idxs == sorted(set(idxs))
            assert all(0 <= x < nf for x in idxs)

    def test_real_codec_seam_and_error_modes(self):
        import pandas as pd
        import pytest as _pytest

        from zerox_ray.pipelines.media import FrameSampler, decode_video

        with _pytest.raises(NotImplementedError):
            decode_video(b"\x00\x01not-a-container")
        bad = pd.DataFrame({"media_id": [1], "payload": [b"garbage"]})
        assert len(FrameSampler(k=4)(bad)) == 0  # IGNORE drops it
        with _pytest.raises(NotImplementedError):
            FrameSampler(k=4, error_mode="THROW")(bad)

    def test_pipeline_matches_oracle_counts(self, sf_dir):
        from zerox_ray.pipelines.media import media_frames

        got = media_frames(sf_dir).to_pandas()
        assert got.media_id.nunique() >= 64
        assert (got.groupby("media_id").size() == 4).all()
        assert set(got.columns) == {"media_id", "frame_index", "n_frames", "payload"}

    def test_oversampling_k_covers_all_frames_once(self):
        import pandas as pd

        from zerox_ray.pipelines.media import FrameSampler
        from zerox_ray.testgen import generate_video_table

        vids = generate_video_table(12).to_pandas()
        out = FrameSampler(k=100)(vids)  # k far above every n_frames
        per = out.groupby("media_id")
        for i, g in per:
            nf = 4 + int(i) % 9
            # all nf frames exactly once, in order — no duplicates
            assert sorted(g.frame_index) == list(range(nf))
            assert len(g) == nf
