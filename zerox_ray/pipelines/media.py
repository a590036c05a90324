"""Multimodal columns: opaque binary payloads + typed metadata, processed
by actor-pool map_batches stages.

Real image/audio codecs are NOT in this runtime, so the decode step is
split in two:
- ``ZX*`` self-describing synthetic containers (zerox_ray/testgen.py
  ``generate_media_table``) decode fully — exercising the REAL Ray-side
  plumbing: schema, binary batches, actor signature, small batch sizes,
  typed feature output;
- anything else routes to ``_decode_real`` which raises
  NotImplementedError (clearly-marked stub — swap in PIL/ffmpeg on a
  cluster that has them; nothing else in the stage changes).

Feature extraction is numpy over the decoded byte planes. ``resize`` is a
deterministic stride-2 downsample re-encoded into the same container —
the shape of a real thumbnailing stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from zerox_ray.sources.tables import read_table

from zerox_ray.testgen import media_path_for

IMG_MAGIC = b"ZXIMG"
AUD_MAGIC = b"ZXAUD"


def _decode_real(payload: bytes):
    """Real-codec decode seam: PIL when the cluster ships it (import-try,
    mirroring the openpyxl/pypdf seams); else a clearly-marked
    NotImplementedError. Audio (libsndfile/ffmpeg) stays stubbed."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - runtime has no PIL
        raise NotImplementedError(
            "real media codecs (PIL/libsndfile/ffmpeg) are unavailable in "
            "this runtime; ZX* synthetic containers are fully supported"
        ) from exc
    import io

    img = Image.open(io.BytesIO(payload)).convert("L")
    data = np.asarray(img, dtype=np.uint8)
    return {
        "kind": "image",
        "width": int(data.shape[1]),
        "height": int(data.shape[0]),
        "data": data,
    }


def decode_payload(payload: bytes) -> dict:
    """payload → {'kind', 'shape'/'sr', 'data': np.ndarray} or raise."""
    if payload[:5] == IMG_MAGIC:
        w = int.from_bytes(payload[5:9], "big")
        h = int.from_bytes(payload[9:13], "big")
        data = np.frombuffer(payload[13 : 13 + w * h], dtype=np.uint8).reshape(h, w)
        return {"kind": "image", "width": w, "height": h, "data": data}
    if payload[:5] == AUD_MAGIC:
        sr = int.from_bytes(payload[5:9], "big")
        n = int.from_bytes(payload[9:13], "big")
        data = np.frombuffer(payload[13 : 13 + n], dtype=np.uint8)
        if len(data) != n:  # truncated container → ERROR row, not a
            # silently short sample plane (images get this for free:
            # their reshape raises on truncation)
            raise ValueError(f"ZXAUD: truncated payload ({len(data)} of {n} bytes)")
        return {"kind": "audio", "sample_rate": sr, "n_samples": n, "data": data}
    return _decode_real(payload)


def encode_image(data: np.ndarray) -> bytes:
    h, w = data.shape
    return IMG_MAGIC + w.to_bytes(4, "big") + h.to_bytes(4, "big") + data.tobytes()


class MediaFeatureExtractor:
    """Actor-pool map_batches: media rows → typed feature rows.

    Small batches on purpose: multi-MB binary payloads × batch_size ×
    concurrency must fit the worker heap (SURVEY §4 memory rule)."""

    def __init__(self, error_mode: str = "IGNORE"):
        self.error_mode = error_mode

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {
            "media_id": [], "kind": [], "width": [], "height": [],
            "sample_rate": [], "n_units": [], "mean_value_ppm": [], "status": [],
        }
        for mid, payload in zip(df["media_id"], df["payload"]):
            try:
                d = decode_payload(bytes(payload))
            except Exception:  # noqa: BLE001
                if self.error_mode == "THROW":
                    raise
                rows["media_id"].append(int(mid))
                rows["kind"].append("unknown")
                rows["width"].append(0)
                rows["height"].append(0)
                rows["sample_rate"].append(0)
                rows["n_units"].append(0)
                rows["mean_value_ppm"].append(0)
                rows["status"].append("ERROR")
                continue
            rows["media_id"].append(int(mid))
            rows["kind"].append(d["kind"])
            rows["width"].append(d.get("width", 0))
            rows["height"].append(d.get("height", 0))
            rows["sample_rate"].append(d.get("sample_rate", 0))
            rows["n_units"].append(int(d["data"].size))
            rows["mean_value_ppm"].append(int(d["data"].mean() * 1_000_000) if d["data"].size else 0)
            rows["status"].append("SUCCESS")
        out = pd.DataFrame(rows)
        for c in ("media_id", "width", "height", "sample_rate", "n_units", "mean_value_ppm"):
            out[c] = out[c].astype("int64")
        return out


class ImageResizer:
    """Actor-pool map_batches: deterministic stride-2 downsample of image
    payloads (audio passes through untouched). 1 row in → 1 row out with
    a re-encoded payload — the thumbnailing stage shape."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_payloads = []
        for payload in df["payload"]:
            payload = bytes(payload)
            if payload[:5] == IMG_MAGIC:
                d = decode_payload(payload)
                out_payloads.append(encode_image(np.ascontiguousarray(d["data"][::2, ::2])))
            else:
                out_payloads.append(payload)
        return pd.DataFrame(
            {
                "media_id": df["media_id"].astype("int64"),
                "payload": pd.Series(out_payloads, dtype=object, index=df.index),
            }
        )


class MediaCleanup:
    """Actor-pool map_batches: cleanupImage composition over image rows
    (trim → orientation-correct → tall-split → size-cap compress; I1–I4,
    stages/image_ops.py). 1 image row → M fragment rows; audio/unknown
    rows pass through as fragment 0."""

    def __init__(
        self,
        max_bytes: int = 15 * 1024 * 1024,  # 15 MB cap (index.ts:68)
        correct_orientation: bool = True,
        trim: bool = True,
    ):
        from zerox_ray.stages.image_ops import (
            detect_rotation,
            detect_rotation_osd,
            osd_available,
        )

        self.max_bytes = max_bytes
        self.correct_orientation = correct_orientation
        self.trim = trim
        # I2 seam, resolved ONCE per actor (A1 pool-management parity:
        # the reference holds a warm Tesseract scheduler per worker,
        # tesseract.ts:5-75): real OSD when the node ships
        # pytesseract + the tesseract binary, else the deterministic
        # variance heuristic — same call shape, same actor slot.
        self.rotation_fn = (
            detect_rotation_osd if osd_available() else detect_rotation
        )

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from zerox_ray.stages.image_ops import cleanup_image, compress_image

        ids, fragments, payloads, widths, heights = [], [], [], [], []
        for mid, payload in zip(df["media_id"], df["payload"]):
            payload = bytes(payload)
            if payload[:5] != IMG_MAGIC:
                ids.append(int(mid))
                fragments.append(0)
                payloads.append(payload)
                widths.append(0)
                heights.append(0)
                continue
            d = decode_payload(payload)
            for fi, section in enumerate(
                cleanup_image(
                    d["data"],
                    self.correct_orientation,
                    self.trim,
                    rotation_fn=self.rotation_fn,
                )
            ):
                enc = compress_image(
                    np.ascontiguousarray(section),
                    self.max_bytes,
                    lambda a: encode_image(np.ascontiguousarray(a)),
                )
                dd = decode_payload(enc)
                ids.append(int(mid))
                fragments.append(fi)
                payloads.append(enc)
                widths.append(int(dd["width"]))
                heights.append(int(dd["height"]))
        return pd.DataFrame(
            {
                "media_id": pd.Series(ids, dtype="int64"),
                "fragment_index": pd.Series(fragments, dtype="int64"),
                "payload": pd.Series(payloads, dtype=object),
                "width": pd.Series(widths, dtype="int64"),
                "height": pd.Series(heights, dtype="int64"),
            }
        )


def media_cleanup(sf_dir: str, max_bytes: int = 15 * 1024 * 1024) -> ray.data.Dataset:
    """Image cleanup pipeline over the media table.
    Output: (media_id, fragment_index, payload, width, height)."""
    ds = read_table(media_path_for(sf_dir))
    # NOTE: Ray logs a per-pool actor-restart caveat (core_worker.cc,
    # ray#53727) for every Ray Data actor pool in local mode — it comes
    # from the MapWorker's own stored ctor spec, is benign, and is not
    # silenceable from user code
    return ds.map_batches(
        MediaCleanup,
        fn_constructor_kwargs={"max_bytes": max_bytes},
        batch_format="pandas",
        batch_size=64,
        concurrency=(1, 4),
    )


def media_features(sf_dir: str) -> ray.data.Dataset:
    """Features over the (generated, cached) media table.
    Output: (media_id, kind, width, height, sample_rate, n_units,
    mean_value_ppm, status)."""
    ds = read_table(media_path_for(sf_dir))
    return ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pandas",
        batch_size=64,
        concurrency=(1, 4),
    )


def media_thumbnails(sf_dir: str) -> ray.data.Dataset:
    """Resize stage over the media table. Output: (media_id, payload)."""
    ds = read_table(media_path_for(sf_dir))
    return ds.map_batches(
        ImageResizer, batch_format="pandas", batch_size=64, concurrency=(1, 4)
    )


def media_thumbnail_features(sf_dir: str) -> ray.data.Dataset:
    """Feature extraction over the RESIZED media table — composes the
    thumbnailing actor pool with the feature extractor, so the stride-2
    downsample itself is value-checkable (its dims, sizes and pixel means
    have closed forms per generator branch). Output: same schema as
    media_features."""
    return media_thumbnails(sf_dir).map_batches(
        MediaFeatureExtractor,
        batch_format="pandas",
        batch_size=64,
        concurrency=(1, 4),
    )


def _fragment_features(df: pd.DataFrame) -> pd.DataFrame:
    """Cleanup fragments → per-fragment feature rows (keeps fragment_index,
    unlike MediaFeatureExtractor which is per-media)."""
    n_units, ppm = [], []
    for payload in df["payload"]:
        d = decode_payload(bytes(payload))
        n = int(d["data"].size)
        n_units.append(n)
        ppm.append(int(d["data"].mean() * 1_000_000) if n else 0)
    return pd.DataFrame(
        {
            "media_id": df["media_id"].astype("int64").to_numpy(),
            "fragment_index": df["fragment_index"].astype("int64").to_numpy(),
            "width": df["width"].astype("int64").to_numpy(),
            "height": df["height"].astype("int64").to_numpy(),
            "n_units": pd.Series(n_units, dtype="int64"),
            "mean_value_ppm": pd.Series(ppm, dtype="int64"),
        }
    )


def media_cleanup_features(sf_dir: str) -> ray.data.Dataset:
    """Value-check surface for the CLEANUP stage (trim → orient →
    tall-split → compress): runs the real pipeline over the generator
    branches whose cleanup outcome has a closed form — tall receipts
    (media_id%29==6: 5 split fragments), rotated pages (%29==12: trim +
    90° correction), padded pages (%29==20: border trim) — and emits
    per-fragment dims + pixel means, both mirrored exactly by the
    DuckDB oracle. The gradient branch is excluded on purpose: its
    rotation outcome is variance-threshold-dependent on an unstructured
    raster (no closed form); it stays covered by media_features and the
    pytest value checks. Output: (media_id, fragment_index, width,
    height, n_units, mean_value_ppm)."""
    def keep(t: pa.Table) -> pa.Table:
        mid = t["media_id"].to_numpy()  # no modulo kernel in this pyarrow
        m29 = mid % 29
        mask = (mid % 3 != 2) & ((m29 == 6) | (m29 == 12) | (m29 == 20))
        return t.filter(pa.array(mask))

    ds = read_table(media_path_for(sf_dir))
    ds = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        MediaCleanup, batch_format="pandas", batch_size=64, concurrency=(1, 4)
    )
    return ds.map_batches(_fragment_features, batch_format="pandas")


# --- video frame sampling ------------------------------------------------------

VID_MAGIC = b"ZXVID"


def decode_video(payload: bytes) -> dict:
    """ZXVID container → {'width','height','n_frames','data': (nf,h,w)}.
    Real video codecs route through the same NotImplementedError seam as
    images/audio (_decode_real policy)."""
    if payload[:5] != VID_MAGIC:
        raise NotImplementedError(
            "real video codecs (ffmpeg) are unavailable in this runtime; "
            "ZXVID synthetic containers are fully supported"
        )
    w = int.from_bytes(payload[5:9], "big")
    h = int.from_bytes(payload[9:13], "big")
    nf = int.from_bytes(payload[13:17], "big")
    data = np.frombuffer(payload[17 : 17 + nf * w * h], dtype=np.uint8).reshape(
        nf, h, w
    )
    return {"width": w, "height": h, "n_frames": nf, "data": data}


class FrameSampler:
    """Actor-pool map_batches: video rows → k evenly-spaced frame rows,
    each re-encoded as a standalone ZXIMG payload (1 row in → k rows out,
    the video-ingest fan-out shape). Sampled indices are
    floor(j*n_frames/k), strictly increasing for n_frames ≥ k. Small
    batches on purpose — multi-frame payloads are the fattest rows in
    the engine."""

    def __init__(self, k: int = 4, error_mode: str = "IGNORE"):
        self.k = k
        self.error_mode = error_mode

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, fidx, nfs, payloads = [], [], [], []
        for mid, payload in zip(df["media_id"], df["payload"]):
            try:
                d = decode_video(bytes(payload))
            except Exception:  # noqa: BLE001
                if self.error_mode == "THROW":
                    raise
                continue  # IGNORE: undecodable video contributes no frames
            nf = d["n_frames"]
            kk = min(self.k, nf)  # clamp BEFORE spacing: k > nf must
            # sample all nf frames once, not duplicate the early ones
            for j in range(kk):
                fi = (j * nf) // kk
                ids.append(int(mid))
                fidx.append(fi)
                nfs.append(nf)
                payloads.append(encode_image(np.ascontiguousarray(d["data"][fi])))
        return pd.DataFrame(
            {
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_index": pd.Series(fidx, dtype="int64"),
                "n_frames": pd.Series(nfs, dtype="int64"),
                # explicit object dtype: an all-dropped batch would
                # otherwise emit a float64 payload column that cannot
                # unify with the binary blocks of non-empty batches
                "payload": pd.Series(payloads, dtype=object),
            }
        )


def media_frames(sf_dir: str, k: int = 4) -> ray.data.Dataset:
    """Frame sampling over the (generated, cached) video table.
    Output: (media_id, frame_index, n_frames, payload)."""
    from zerox_ray.testgen import video_path_for

    ds = read_table(video_path_for(sf_dir))
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"k": k},
        batch_format="pandas",
        batch_size=32,
        concurrency=(1, 4),
    )


def media_frame_features(sf_dir: str, k: int = 4) -> ray.data.Dataset:
    """Value-check surface for frame sampling: per-sampled-frame dims +
    pixel means (closed form per the ZXVID generator), so the whole
    decode → sample → re-encode path is oracle-checked. Output:
    (media_id, frame_index, width, height, mean_value_ppm)."""

    def features(df: pd.DataFrame) -> pd.DataFrame:
        widths, heights, ppm = [], [], []
        for payload in df["payload"]:
            d = decode_payload(bytes(payload))
            widths.append(int(d["width"]))
            heights.append(int(d["height"]))
            ppm.append(int(d["data"].mean() * 1_000_000) if d["data"].size else 0)
        return pd.DataFrame(
            {
                "media_id": df["media_id"].astype("int64").to_numpy(),
                "frame_index": df["frame_index"].astype("int64").to_numpy(),
                "width": pd.Series(widths, dtype="int64"),
                "height": pd.Series(heights, dtype="int64"),
                "mean_value_ppm": pd.Series(ppm, dtype="int64"),
            }
        )

    return media_frames(sf_dir, k).map_batches(features, batch_format="pandas")
