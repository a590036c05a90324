"""Image cleanup ops (I1–I4): trim, orientation, tall-split, compress.

These reimplement the reference's pixel heuristics as vectorized numpy
over decoded grayscale planes:

- ``trim_edges``    — cleanupImage's sharp ``.trim()`` step
  (node-zerox/src/utils/image.ts:23-27): strip uniform border rows/cols
  matching the top-left (background) pixel.
- ``detect_rotation`` / ``rotate`` — determineOptimalRotation
  (image.ts:51-70) uses a Tesseract OSD model; the deterministic
  stand-in detects text-line direction by comparing row-mean vs
  column-mean variance (text pages stripe horizontally) and returns the
  k×90° correction. A real OSD client drops into the same actor slot.
- ``split_tall_image`` — the aspect-ratio>5 empty-row-run segmentation
  (image.ts:116-231), constants faithful: luma>230 = empty pixel, >95%
  empty pixels = empty row, runs of ≥5 empty rows are candidate splits,
  ideal cuts at i·h/ceil(aspect) matched within radius min(150, h/3).
- ``compress_image`` — compressImage's iterative size-cap loop
  (image.ts:78-114, quality 90→20 until ≤ maxSize): the codec-free
  stand-in halves resolution (stride-2) per iteration until the encoded
  payload fits; same contract (bytes in, smaller bytes out, loop until
  under cap).

All functions are pure; the pipeline stage (pipelines/media.py
``media_cleanup``) runs them inside an actor-pool ``map_batches`` with
small batches (multi-MB payload rule, SURVEY §4).
"""

from __future__ import annotations

import numpy as np

#: aspect ratio beyond which a page image is split (constants.ts:1)
ASPECT_RATIO_THRESHOLD = 5
#: a pixel with luma above this is "empty" (image.ts:137)
EMPTY_PIXEL_LUMA = 230
#: a row with more than this fraction of empty pixels is empty (image.ts:153)
EMPTY_ROW_RATIO = 0.95
#: minimum consecutive empty rows forming a split candidate (image.ts:159)
MIN_EMPTY_RUN = 5


def trim_edges(data: np.ndarray) -> np.ndarray:
    """Strip uniform border rows/columns equal to the corner pixel."""
    bg = data[0, 0]
    rows = np.where((data != bg).any(axis=1))[0]
    cols = np.where((data != bg).any(axis=0))[0]
    if len(rows) == 0 or len(cols) == 0:
        return data[:1, :1]  # fully uniform image → 1×1
    return data[rows[0] : rows[-1] + 1, cols[0] : cols[-1] + 1]


def detect_rotation(data: np.ndarray) -> int:
    """0 or 90: degrees to rotate counter-clockwise so text lines run
    horizontally (row-mean variance dominates for upright text)."""
    if data.size == 0 or min(data.shape) < 2:
        return 0
    row_var = float(np.var(data.mean(axis=1)))
    col_var = float(np.var(data.mean(axis=0)))
    return 90 if col_var > row_var * 1.5 else 0


#: memoized osd_available() result — a process-wide property (imports +
#: PATH don't change mid-run), so the probe (two imports + a PATH scan)
#: runs once per worker process, not once per page image
_OSD_PROBE: bool | None = None


def osd_available() -> bool:
    """True iff the real Tesseract OSD path is usable on this node
    (pytesseract + PIL importable AND the tesseract binary on PATH) —
    probed once per process and cached; the cleanup pool's __init__ uses
    it to resolve the rotation fn once per actor, and the per-call guard
    in detect_rotation_osd hits only the cache."""
    global _OSD_PROBE
    if _OSD_PROBE is None:
        try:
            import pytesseract  # noqa: F401
            from PIL import Image  # noqa: F401
        except ImportError:
            _OSD_PROBE = False
        else:
            import shutil

            _OSD_PROBE = shutil.which("tesseract") is not None
    return _OSD_PROBE


def detect_rotation_osd(data: np.ndarray) -> int:
    """I2 real path (determineOptimalRotation, image.ts:51-70, backed by
    the Tesseract OSD scheduler of tesseract.ts:5-75): pytesseract's
    orientation-and-script detection when the cluster ships it, else the
    deterministic variance heuristic — the same actor slot either way.
    Returns counter-clockwise degrees, like ``detect_rotation``."""
    if not osd_available():
        return detect_rotation(data)
    import pytesseract
    from PIL import Image

    osd = pytesseract.image_to_osd(
        Image.fromarray(data.astype(np.uint8)),
        output_type=pytesseract.Output.DICT,
    )
    # OSD reports the clockwise rotation NEEDED to upright the page
    # (tesseract.ts:52-61 applies it directly); normalize to ccw
    return (360 - int(osd.get("rotate", 0))) % 360


def rotate(data: np.ndarray, degrees: int) -> np.ndarray:
    """Rotate counter-clockwise by a multiple of 90°."""
    k = (degrees // 90) % 4
    return np.rot90(data, k) if k else data


def _empty_rows(data: np.ndarray) -> np.ndarray:
    """Boolean mask of visually-empty rows (image.ts:133-156)."""
    empty_frac = (data > EMPTY_PIXEL_LUMA).mean(axis=1)
    return empty_frac > EMPTY_ROW_RATIO


def split_tall_image(data: np.ndarray) -> list[np.ndarray]:
    """Aspect-aware segmentation at empty-row runs.

    Shares image.ts:116-231's structure and constants (>230 luma,
    >0.95 empty ratio, ≥5-row runs, ≤150 px radius, ceil(aspect)
    sections) but DELIBERATELY diverges in the snapping step: the
    search radius is min(150, h//3) of the FULL height (the reference
    uses section_height/3) with an inclusive bound, candidates are
    empty-run midpoints, there is no ``last split + 50`` monotonic
    margin, and an unmatched target cuts at the ideal line instead of
    the reference's [last+50, h-50] clamp. The reference's pixel
    margins assume ~10³-px page rasters and degenerate on small
    images (its fallback can emit split points past the image end);
    this variant degrades gracefully at any raster size while
    agreeing with the reference's choice whenever a significant empty
    run sits near the ideal cut — the common case on real pages."""
    h, w = data.shape
    aspect = h / max(w, 1)
    if aspect <= ASPECT_RATIO_THRESHOLD:
        return [data]
    empty = _empty_rows(data)
    # candidate split points: midpoints of runs of >= MIN_EMPTY_RUN rows
    candidates: list[int] = []
    run_start = None
    for y in range(h + 1):
        if y < h and empty[y]:
            if run_start is None:
                run_start = y
        elif run_start is not None:
            if y - run_start >= MIN_EMPTY_RUN:
                candidates.append((run_start + y - 1) // 2)
            run_start = None
    n_sections = int(np.ceil(aspect))
    radius = min(150, h // 3)
    cuts = []
    for i in range(1, n_sections):
        ideal = i * h // n_sections
        near = [c for c in candidates if abs(c - ideal) <= radius]
        cuts.append(min(near, key=lambda c: abs(c - ideal)) if near else ideal)
    cuts = sorted(set(cuts))
    sections, prev = [], 0
    for c in cuts + [h]:
        if c > prev:
            sections.append(data[prev:c, :])
        prev = c
    return sections or [data]


def compress_image(data: np.ndarray, max_bytes: int, encode) -> bytes:
    """Re-encode under a byte cap by halving resolution per attempt
    (quality-ladder contract of image.ts:78-114; floor 1×1)."""
    out = encode(data)
    while len(out) > max_bytes and data.size > 1:
        data = data[::2, ::2]
        out = encode(data)
    return out


def cleanup_image(
    data: np.ndarray,
    correct_orientation: bool = True,
    trim: bool = True,
    rotation_fn=detect_rotation,
) -> list[np.ndarray]:
    """cleanupImage composition (image.ts:17-47): trim → rotate → split.
    ``rotation_fn`` is the I2 seam: the media actor pool passes
    ``detect_rotation_osd`` when the node has real Tesseract OSD, else
    the default variance heuristic (identical call shape)."""
    if trim:
        data = trim_edges(data)
    if correct_orientation:
        data = rotate(data, rotation_fn(data))
    return split_tall_image(data)
