"""WARC source/sink tests (sources/warc.py) — framing, gzip members,
round-trip fidelity, error paths, and the distributed sink/reader pair."""

import os

import pyarrow as pa
import pytest
import ray.data

from zerox_ray.sources.warc import (
    build_warc_record,
    build_warcinfo,
    parse_warc,
    read_warc_pages,
    serialize_warc,
    write_warc_files,
)

TS = 1_704_067_200_123_456  # 2024-01-01T00:00:00.123456Z


def test_single_record_roundtrip():
    rec = build_warc_record("https://a.example/x", TS, b"<html>hi</html>")
    urls, tss, payloads = parse_warc(rec)
    assert urls == ["https://a.example/x"]
    assert tss == [TS]
    assert payloads == [b"<html>hi</html>"]


def test_whole_second_date_form_accepted():
    rec = build_warc_record("https://a/x", 1_704_067_200_000_000, b"p")
    rec = rec.replace(b"2024-01-01T00:00:00.000000Z", b"2024-01-01T00:00:00Z")
    _, tss, _ = parse_warc(rec)
    assert tss == [1_704_067_200_000_000]


def test_warcinfo_and_non_response_records_skipped():
    data = build_warcinfo("f.warc") + build_warc_record("https://a/1", TS, b"x")
    urls, _, payloads = parse_warc(data)
    assert urls == ["https://a/1"] and payloads == [b"x"]


def test_payload_containing_warc_magic_is_framed_by_length():
    evil = b"WARC/1.0\r\nWARC-Type: response\r\n\r\n fake"
    data = serialize_warc(["https://a/1", "https://a/2"], [TS, TS + 1], [evil, b"ok"])
    urls, tss, payloads = parse_warc(data)
    assert payloads == [evil, b"ok"]
    assert tss == [TS, TS + 1]


def test_gzip_members_roundtrip():
    data = serialize_warc(
        ["https://a/1", "https://a/2"], [TS, TS + 7], [b"one", b"two"],
        gzip=True,
    )
    assert data[:2] == b"\x1f\x8b"
    urls, tss, payloads = parse_warc(data)
    assert urls == ["https://a/1", "https://a/2"]
    assert payloads == [b"one", b"two"]


def test_truncated_record_raises_with_path():
    rec = build_warc_record("https://a/1", TS, b"payload")
    with pytest.raises(ValueError, match="trunc.warc"):
        parse_warc(rec[:-10], "trunc.warc")


def test_bad_http_content_length_raises():
    rec = build_warc_record("https://a/1", TS, b"payload")
    bad = rec.replace(b"Content-Length: 7", b"Content-Length: 9", 1)
    # the HTTP-level length is the SECOND Content-Length header; patching
    # it desyncs HTTP body length from the actual payload
    assert bad != rec
    with pytest.raises(ValueError, match="HTTP Content-Length|truncated|terminator"):
        parse_warc(bad, "bad.warc")


def test_missing_warc_version_raises():
    with pytest.raises(ValueError, match="expected"):
        parse_warc(b"NOTWARC\r\n\r\n", "x.warc")


def test_distributed_sink_and_reader(tmp_path):
    urls = [f"https://w.example/{i}" for i in range(50)]
    tss = [TS + i for i in range(50)]
    payloads = [f"<p>doc {i}</p>".encode() for i in range(50)]
    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(urls),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(payloads, pa.binary()),
            }
        )
    )
    out = str(tmp_path / "warcs")
    n = write_warc_files(pages, out, gzip=True)
    assert n == 50
    files = [f for f in os.listdir(out) if f.endswith(".warc.gz")]
    assert files and not any(f.endswith(".tmp") for f in os.listdir(out))
    back = read_warc_pages(out).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(back) == 50
    got = dict(zip(back["url"], back["html"]))
    assert got == dict(zip(urls, payloads))
    ts_got = dict(zip(back["url"], back["warc_ts"]))
    for u, t in zip(urls, tss):
        assert ts_got[u].value == t * 1000  # pandas .value is ns; ours µs


def test_warc_corpus_matches_pages_corpus():
    """warc_dir_for serializes the exact pages_dir_for corpus."""
    from zerox_ray.testgen import pages_dir_for, warc_dir_for

    sf = "/root/testdata/sf0.001"
    pages = ray.data.read_parquet(pages_dir_for(sf)).to_pandas()
    warc = read_warc_pages(warc_dir_for(sf)).to_pandas()
    assert len(pages) == len(warc)
    p = pages.sort_values("url").reset_index(drop=True)
    w = warc.sort_values("url").reset_index(drop=True)
    assert (p["url"] == w["url"]).all()
    assert all(bytes(a) == bytes(b) for a, b in zip(p["html"], w["html"]))
    assert (p["warc_ts"].astype("int64") == w["warc_ts"].astype("int64")).all()


def test_checkpoint_runner_over_warc_input(tmp_path):
    """The ray-job runner processes raw WARC shards with the same
    resume semantics; output matches the parquet-input run."""
    import glob

    import pyarrow.parquet as pq

    from zerox_ray.state.manifest import CheckpointedOcrRunner
    from zerox_ray.testgen import pages_dir_for, warc_dir_for

    sf = "/root/testdata/sf0.001"
    out_w = str(tmp_path / "warc_out")
    runner = CheckpointedOcrRunner(
        warc_dir_for(sf), out_w, files_per_shard=1, input_format="warc"
    )
    # first submission: one shard only (simulated interruption)
    s1 = runner.run(max_shards=1)
    assert s1["processed_shards"] == [0]
    # resume: remaining shards, shard 0 skipped
    s2 = runner.run()
    assert 0 in s2["skipped_shards"]

    out_p = str(tmp_path / "pq_out")
    CheckpointedOcrRunner(pages_dir_for(sf), out_p, files_per_shard=1).run()

    def collect(root):
        rows = {}
        for f in glob.glob(f"{root}/shard=*/*.parquet"):
            t = pq.read_table(f, columns=["url", "markdown"])
            rows.update(zip(t["url"].to_pylist(), t["markdown"].to_pylist()))
        return rows

    assert collect(out_w) == collect(out_p)


def test_warc_roundtrip_property():
    """Property: ANY byte payloads (including CRLFs, WARC magic, gzip
    magic, control chars) round-trip through serialize→parse, plain and
    gzipped."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    payloads_st = st.lists(
        st.binary(min_size=0, max_size=200), min_size=1, max_size=8
    )

    @settings(max_examples=60, deadline=None)
    @given(payloads=payloads_st, gz=st.booleans())
    def check(payloads, gz):
        urls = [f"https://p.example/{i}" for i in range(len(payloads))]
        tss = [TS + 1_000_003 * i for i in range(len(payloads))]
        data = serialize_warc(urls, tss, payloads, gzip=gz)
        u, t, p = parse_warc(data)
        assert u == urls and t == tss and p == [bytes(x) for x in payloads]

    check()
