"""JSONL pages source/sink: framing round-trip, malformed-line errors,
and sink→source identity."""

import pytest

from zerox_ray.sources.jsonl import parse_jsonl, serialize_jsonl


class TestFraming:
    def test_roundtrip_arbitrary_bytes(self):
        urls = ["https://a/1", "https://b/2"]
        tss = [1_704_067_200_000_001, 1_704_067_200_999_999]
        payloads = [b"\x00\xffbinary\nnewline", b"<html>ok</html>"]
        u, s, p = parse_jsonl(serialize_jsonl(urls, tss, payloads))
        assert (u, s, p) == (urls, tss, payloads)

    def test_empty(self):
        assert serialize_jsonl([], [], []) == b""
        assert parse_jsonl(b"") == ([], [], [])

    def test_malformed_line_fails_loudly(self):
        good = serialize_jsonl(["u"], [1], [b"x"])
        bad = good + b'{"url": "v"}\n'  # missing fields
        with pytest.raises(ValueError, match=":2:"):
            parse_jsonl(bad, "f.jsonl")
        with pytest.raises(ValueError, match="f.jsonl:1"):
            parse_jsonl(b"not json at all\n", "f.jsonl")

    def test_invalid_base64_fails(self):
        with pytest.raises(ValueError):
            parse_jsonl(
                b'{"url":"u","warc_ts_us":1,"html_b64":"!!!not-b64!!!"}\n'
            )


class TestSinkSource:
    def test_write_read_identity(self, sf_dir, tmp_path):
        import pandas as pd

        from zerox_ray.sources.jsonl import read_jsonl_pages, write_jsonl_files
        from zerox_ray.testgen import jsonl_dir_for

        src = read_jsonl_pages(jsonl_dir_for(sf_dir))
        n_files = write_jsonl_files(src, str(tmp_path / "out"))
        assert n_files >= 1
        back = read_jsonl_pages(str(tmp_path / "out")).to_pandas()
        orig = read_jsonl_pages(jsonl_dir_for(sf_dir)).to_pandas()
        for df in (back, orig):
            df["html"] = df["html"].apply(bytes)
        pd.testing.assert_frame_equal(
            back.sort_values("url").reset_index(drop=True),
            orig.sort_values("url").reset_index(drop=True),
        )
