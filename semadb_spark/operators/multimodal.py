"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

Outside the reference's surface (it has no binary types, SURVEY.md §1.2) —
these are the training-data-pipeline operators a 100 TB corpus needs. Design:

- An asset row is ``(asset_id string, media_type string, content binary,
  meta struct<...>)`` — the blob is never interpreted by Spark itself;
  Parquet stores it as BYTE_ARRAY and column pruning means queries that
  don't touch ``content`` never read it.
- Decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` kernels: bytes travel driver-free, one Python process per
  core, batch size bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  (set ``media.target_batch_rows`` lower for large blobs so a batch fits in
  worker memory).
- **The codec step is stubbed**: real decoders (PIL/ffmpeg/librosa) are not
  in this environment. ``decode_image`` tries the real library and falls
  back to a *deterministic fake* derived from the content hash, flagged by
  ``USING_FAKE_DECODE``. Every surrounding piece — schema, null handling,
  batch shapes, 1->N frame explode, partition sizing — is real and tested,
  so swapping in a real codec changes one function body.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)


def asset_schema(id_col: str = "asset_id") -> T.StructType:
    return T.StructType(
        [
            T.StructField(id_col, T.StringType(), False),
            T.StructField("media_type", T.StringType(), True),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("meta", MEDIA_META_TYPE, True),
        ]
    )


try:  # real decoder if available
    from PIL import Image  # noqa: F401

    USING_FAKE_DECODE = False
except ImportError:
    USING_FAKE_DECODE = True


def parse_image_header(data: bytes) -> dict | None:
    """Pure-Python image header parser: -> {format, width, height} or None.

    The middle tier between PIL and the deterministic fake: PNG / GIF /
    JPEG / BMP are public formats whose dimensions live in fixed header
    fields, so width/height/format come from REAL bytes in any environment
    — no decoder library needed. Pixel-level work (mean_luma, resize)
    still needs PIL; a blob whose header doesn't parse falls through to
    the caller's fallback.

    Formats (all public specs):
    - PNG: 8-byte signature, then the IHDR chunk carries width/height as
      big-endian u32 at bytes 16..24.
    - GIF: "GIF87a"/"GIF89a", logical screen width/height as little-endian
      u16 at bytes 6..10.
    - JPEG: walk the marker stream from SOI to the first SOF0-SOF15 frame
      header (skipping non-frame markers by their 2-byte lengths); height
      and width are big-endian u16 at frame offset 3 and 5.
    - BMP: "BM", width/height as little-endian i32 at bytes 18 and 22
      (height may be negative for top-down rows; dimensions are abs).
    """
    import struct

    if len(data) < 10:
        return None
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24 and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        return {"format": "png", "width": int(w), "height": int(h)}
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return {"format": "gif", "width": int(w), "height": int(h)}
    if data[:2] == b"\xff\xd8":  # JPEG SOI
        pos = 2
        n = len(data)
        while pos + 4 <= n:
            if data[pos] != 0xFF:
                return None  # corrupt marker stream
            marker = data[pos + 1]
            if marker == 0xFF:  # fill byte padding
                pos += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2  # standalone marker, no length
                continue
            if marker == 0xD9:  # EOI before any frame header
                return None
            seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
            is_sof = 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC)
            if is_sof:
                if pos + 9 > n:
                    return None
                h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
                return {"format": "jpeg", "width": int(w), "height": int(h)}
            pos += 2 + seglen
        return None
    if data[:2] == b"BM" and len(data) >= 26:
        # validate the DIB header size field before claiming BMP — any text
        # blob starting "BM" would otherwise report garbage dimensions.
        # Valid sizes: 12 (BITMAPCOREHEADER), 40 (BITMAPINFOHEADER),
        # 108 (V4), 124 (V5)
        dib = struct.unpack("<I", data[14:18])[0]
        if dib == 12:
            w, h = struct.unpack("<HH", data[18:22])
            return {"format": "bmp", "width": int(w), "height": int(h)}
        if dib in (40, 108, 124):
            w, h = struct.unpack("<ii", data[18:26])
            return {"format": "bmp", "width": abs(int(w)), "height": abs(int(h))}
    return None


def _hash64(data: bytes) -> tuple[str, int]:
    digest = hashlib.md5(data).hexdigest()
    return digest, int(digest[:15], 16)  # 60-bit, DuckDB-reproducible


def decode_image(content: bytes) -> np.ndarray:
    """bytes -> (h, w) grayscale uint8 array.

    Real path uses PIL when importable; otherwise a deterministic fake whose
    dims/pixels derive from the content hash (so tests and the DuckDB oracle
    can predict every downstream feature)."""
    if not USING_FAKE_DECODE:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(content)).convert("L"))
    _, h64 = _hash64(content)
    w = 16 + h64 % 64
    h = 16 + (h64 >> 6) % 64
    rng = np.random.default_rng(h64 % (1 << 32))
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def image_features(
    df: DataFrame, content_col: str = "content", id_col: str = "asset_id"
) -> DataFrame:
    """-> (id, n_bytes, content_md5, format, width, height, mean_luma).
    Rows with a null blob are dropped (consistent with never-indexed
    missing values).

    Three-tier metadata: blobs that parse as a real image format
    (:func:`parse_image_header` — PNG/GIF/JPEG/BMP, pure Python) report
    bytes-derived format/width/height in EVERY environment; PIL (when
    importable) additionally supplies real pixels for mean_luma;
    unrecognized blobs fall through to the deterministic hash-fake with
    ``format`` null — so the fake never masquerades as a parsed image."""
    out_schema = (
        f"{id_col} string, n_bytes long, content_md5 string, "
        "format string, width int, height int, mean_luma double"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf[content_col].notna()]
            if pdf.empty:
                continue
            rows = []
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                data = bytes(content)
                digest, _ = _hash64(data)
                hdr = parse_image_header(data)
                if hdr is not None:
                    fmt, w, h = hdr["format"], hdr["width"], hdr["height"]
                    if not USING_FAKE_DECODE:
                        img = decode_image(data)
                        luma = float(img.mean()) / 255.0
                    else:
                        # dims/format are real bytes; pixels need a decoder
                        luma = None
                else:
                    img = decode_image(data)
                    fmt, w, h = None, img.shape[1], img.shape[0]
                    luma = float(img.mean()) / 255.0
                rows.append((str(aid), len(data), digest, fmt, w, h, luma))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_bytes", "content_md5", "format", "width",
                    "height", "mean_luma",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(extract, out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    id_col: str = "asset_id",
) -> DataFrame:
    """-> (id, content binary) resized. Fake path re-encodes the decoded
    array with nearest-neighbour index sampling — shape-correct end to end."""
    out_schema = f"{id_col} string, content binary"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf[content_col].notna()]
            if pdf.empty:
                continue
            out = []
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                img = decode_image(bytes(content))
                ys = (np.arange(height) * img.shape[0] // height).clip(0, img.shape[0] - 1)
                xs = (np.arange(width) * img.shape[1] // width).clip(0, img.shape[1] - 1)
                resized = img[np.ix_(ys, xs)]
                out.append((str(aid), resized.tobytes()))
            yield pd.DataFrame(out, columns=[id_col, "content"])

    return df.select(id_col, content_col).mapInPandas(resize, out_schema)


def sample_frames(
    df: DataFrame,
    every_ms: int,
    content_col: str = "content",
    id_col: str = "asset_id",
    duration_col: str = "meta.duration_ms",
) -> DataFrame:
    """Video frame sampling: 1 asset row -> N frame rows
    (id, frame_idx, frame_ms, frame_md5). The real decoder would emit frame
    bytes; the stub emits the per-frame content fingerprint so the 1->N
    batch-shape plumbing (the hard Spark part) is fully exercised."""
    out_schema = f"{id_col} string, frame_idx int, frame_ms long, frame_md5 string"
    dur_field = duration_col.split(".")[-1]

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf[content_col].notna() & pdf["_dur"].notna()]
            if pdf.empty:
                continue
            rows = []
            for aid, content, dur in zip(pdf[id_col], pdf[content_col], pdf["_dur"]):
                data = bytes(content)
                n = max(int(dur) // every_ms, 0)
                for i in range(n):
                    fp = hashlib.md5(data + f":{i}".encode()).hexdigest()
                    rows.append((str(aid), i, i * every_ms, fp))
            if rows:
                yield pd.DataFrame(
                    rows, columns=[id_col, "frame_idx", "frame_ms", "frame_md5"]
                )

    src = df.select(id_col, content_col, F.col(duration_col).alias("_dur"))
    return src.mapInPandas(frames, out_schema)


def audio_stats(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "asset_id",
    meta_col: str = "meta",
) -> DataFrame:
    """Pure-expression audio bookkeeping (no decode needed): bytes, implied
    sample count at 16-bit mono, ratio vs declared duration."""
    n_bytes = F.length(F.col(content_col)).cast("long")
    sr = F.col(f"{meta_col}.sample_rate")
    dur = F.col(f"{meta_col}.duration_ms")
    implied_samples = (n_bytes / 2).cast("long")
    return df.select(
        F.col(id_col),
        n_bytes.alias("n_bytes"),
        implied_samples.alias("implied_samples"),
        F.when(
            sr.isNotNull() & dur.isNotNull() & (sr > 0) & (dur > 0),
            implied_samples.cast("double") / (sr.cast("double") * dur / 1000.0),
        ).alias("fill_ratio"),
    )


def repartition_for_media(
    df: DataFrame, target_batch_rows: int = 256, approx_rows: int | None = None
) -> DataFrame:
    """Spread blob rows so an Arrow batch of ``target_batch_rows`` bounds
    worker memory: partitions = rows / target (blobs make row *count*, not
    bytes, the binding constraint for pandas kernels)."""
    n = approx_rows if approx_rows is not None else df.count()
    parts = max(1, min(n // max(target_batch_rows, 1) or 1, 100_000))
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(max(parts, parallelism))
