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
- **Codec tiers**: PIL/ffmpeg/librosa are not in this environment, but
  PNG and BMP pixel layers are public-spec zlib/raw — decoded for real by
  the pure-NumPy ``decode_png_np``/``decode_bmp_np`` (all five PNG
  scanline filters, color types 0/2/3/4/6 at bit depth 8; BMP 8/24/32bpp
  with palette + padding + row order). ``decode_image`` tries PIL, then
  the NumPy decoders, and only then falls back to a *deterministic fake*
  derived from the content hash (flagged by ``USING_FAKE_DECODE``) for
  entropy-coded formats (JPEG/GIF) no local code can decode. Every
  surrounding piece — schema, null handling, batch shapes, 1->N frame
  explode, partition sizing — is real and tested.
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
    — no decoder library needed. Pixel-level work (mean_luma, resize) is
    also real for PNG/BMP via :func:`decode_png_np`/:func:`decode_bmp_np`;
    only entropy-coded pixels (JPEG/GIF) still need PIL. A blob whose
    header doesn't parse falls through to the caller's fallback.

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


def _luma(rgb: np.ndarray) -> np.ndarray:
    """(h, w, >=3) uint8 -> (h, w) uint8 — ITU-R 601-2 integer luma, the
    same truncating formula PIL's ``convert("L")`` documents, so the
    NumPy decoders and the PIL path agree on mean_luma."""
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the PNG per-scanline filters (spec §9: None/Sub/Up/Average/
    Paeth) -> (h, stride) uint8. Rows are sequential by construction (each
    depends on the previous reconstructed row); within a row, Sub is a
    per-channel cumulative sum and Average/Paeth walk pixel-by-pixel with
    the ``bpp`` channel lanes vectorized (lanes are independent: every
    reference is at x-bpp, same lane)."""
    rows = np.frombuffer(raw, dtype=np.uint8)[: h * (1 + stride)].reshape(
        h, 1 + stride
    )
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    k = stride // bpp
    for y in range(h):
        ft = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) % 256
        elif ft == 1:  # Sub: cumulative per channel lane, mod 256
            cur = (np.cumsum(line.reshape(k, bpp), axis=0) % 256).reshape(
                stride
            )
        elif ft in (3, 4):  # Average / Paeth: sequential along x
            arr = line.reshape(k, bpp)
            pr = prev.reshape(k, bpp)
            cur2 = np.empty((k, bpp), dtype=np.int32)
            a = np.zeros(bpp, dtype=np.int32)
            c = np.zeros(bpp, dtype=np.int32)
            for i in range(k):
                b = pr[i]
                if ft == 3:
                    cur2[i] = (arr[i] + ((a + b) >> 1)) % 256
                else:
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                    )
                    cur2[i] = (arr[i] + pred) % 256
                a = cur2[i]
                c = b
            cur = cur2.reshape(stride)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = cur.astype(np.uint8)
        prev = out[y].astype(np.int32)
    return out


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png_np(data: bytes) -> np.ndarray | None:
    """Pure NumPy+zlib PNG decode -> (h, w) grayscale uint8, or None for
    variants outside scope (bit depth != 8, interlaced, truncated).

    PNG's pixel layer is just zlib over filtered scanlines (public spec,
    RFC 2083) — no codec library needed: parse the chunk stream, inflate
    the concatenated IDATs, reverse the scanline filters, then map color
    type to luma (0 gray, 2 RGB, 3 palette via PLTE, 4 gray+alpha,
    6 RGBA). This is what makes mean_luma REAL bytes in this container,
    where PIL is absent."""
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos = 8
    n = len(data)
    w = h = None
    color_type = None
    plte = None
    idat = []
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            return None
        if ctype == b"IHDR":
            if length < 13:
                return None
            w, h, bit_depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
            if bit_depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                return None
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if w is None or not idat or color_type not in _PNG_CHANNELS:
        return None
    if color_type == 3 and plte is None:
        return None
    ch = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) < h * (1 + stride):
        return None
    px = _png_unfilter(raw, h, stride, ch).reshape(h, w, ch)
    if color_type == 0:
        return px[..., 0]
    if color_type == 4:
        return px[..., 0]  # gray, alpha dropped (PIL convert("L") parity)
    if color_type == 3:
        idx = px[..., 0]
        if idx.size and int(idx.max()) >= len(plte):
            return None  # palette index out of range — corrupt PLTE/IDAT
        return _luma(plte[idx])
    return _luma(px)  # 2 (RGB) / 6 (RGBA, alpha dropped)


def decode_bmp_np(data: bytes) -> np.ndarray | None:
    """Pure NumPy BMP decode -> (h, w) grayscale uint8, or None outside
    scope (compressed, bpp not in {8, 24, 32}). Handles 4-byte row
    padding, bottom-up vs top-down row order, and the 8-bit palette."""
    import struct

    if data[:2] != b"BM" or len(data) < 30:
        return None
    (offset,) = struct.unpack("<I", data[10:14])
    (dib,) = struct.unpack("<I", data[14:18])
    if dib not in (40, 108, 124):
        return None
    w, h_signed = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    compression = struct.unpack("<I", data[30:34])[0] if len(data) >= 34 else 0
    if compression != 0 or bpp not in (8, 24, 32) or w <= 0 or h_signed == 0:
        return None
    h = abs(h_signed)
    row_bytes = (w * bpp // 8 + 3) & ~3
    if len(data) < offset + row_bytes * h:
        return None
    rows = np.frombuffer(
        data, dtype=np.uint8, count=row_bytes * h, offset=offset
    ).reshape(h, row_bytes)
    if h_signed > 0:  # bottom-up storage
        rows = rows[::-1]
    if bpp == 8:
        pal_off = 14 + dib
        n_entries = min(256, (offset - pal_off) // 4)
        if n_entries <= 0:
            return None  # pixel offset at/inside the palette — corrupt header
        pal = np.frombuffer(
            data, dtype=np.uint8, count=n_entries * 4, offset=pal_off
        ).reshape(-1, 4)  # BGRX
        idx = rows[:, :w]
        if idx.size and int(idx.max()) >= len(pal):
            return None  # pixel indexes past the stored palette
        bgr = pal[idx][..., :3]
        return _luma(bgr[..., ::-1])
    px = rows[:, : w * (bpp // 8)].reshape(h, w, bpp // 8)
    return _luma(px[..., 2::-1])  # BGR(A) -> RGB


def try_decode_image_np(content: bytes) -> np.ndarray | None:
    """Library-free real pixel decode for the formats whose pixel layer is
    public-spec + zlib (PNG) or raw (BMP); None for entropy-coded formats
    (JPEG/GIF) which genuinely need a codec library.

    Never raises: an untrusted corpus WILL contain blobs that pass the
    magic-byte check but are malformed inside (bad filter bytes, palette
    indexes past the stored palette, truncated chunk streams). One such
    blob must degrade to the documented luma=None / deterministic-fake
    contract, not fail the whole Spark task, so any decode error here
    collapses to None."""
    try:
        if content[:8] == b"\x89PNG\r\n\x1a\n":
            return decode_png_np(content)
        if content[:2] == b"BM":
            return decode_bmp_np(content)
    except Exception:
        return None
    return None


def decode_image(content: bytes) -> np.ndarray:
    """bytes -> (h, w) grayscale uint8 array.

    Three real tiers before any fake: PIL when importable (all formats);
    the pure-NumPy PNG/BMP decoders (:func:`try_decode_image_np`) in any
    environment; then a deterministic fake whose dims/pixels derive from
    the content hash (so tests and the DuckDB oracle can predict every
    downstream feature) for blobs nothing can decode here."""
    if not USING_FAKE_DECODE:
        import io

        from PIL import Image

        try:
            return np.asarray(Image.open(io.BytesIO(content)).convert("L"))
        except Exception:
            pass  # corrupt blob: fall through the same tiers as no-PIL
    img = try_decode_image_np(content)
    if img is not None:
        return img
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
    bytes-derived format/width/height in EVERY environment; mean_luma is
    real pixels whenever anything here can decode them — PIL when
    importable, else the pure-NumPy PNG/BMP decoders
    (:func:`try_decode_image_np`); entropy-coded JPEG/GIF without PIL
    report luma null. Unrecognized blobs fall through to the
    deterministic hash-fake with ``format`` null — so the fake never
    masquerades as a parsed image."""
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
                    img = None
                    if not USING_FAKE_DECODE:
                        import io

                        from PIL import Image

                        try:
                            img = np.asarray(
                                Image.open(io.BytesIO(data)).convert("L")
                            )
                        except Exception:
                            img = None  # corrupt body under a valid header
                    if img is None:
                        # PNG/BMP pixels are real via the NumPy decoders;
                        # entropy-coded formats still need a codec library.
                        # A header-valid blob whose body won't decode reports
                        # luma NULL — never the hash-fake (which would
                        # masquerade as measured pixels).
                        img = try_decode_image_np(data)
                    luma = (
                        float(img.mean()) / 255.0 if img is not None else None
                    )
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
