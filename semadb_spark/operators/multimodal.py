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
  the pixel layers of PNG (zlib scanlines), BMP (raw rows), baseline
  JPEG (huffman + DCT, ITU-T T.81), and GIF (LZW palette indexes, incl.
  the FULL animation model — GCE delays/transparency/disposal composited
  on the logical screen, ``decode_gif_frames_np`` + the ``gif_frames``
  explode operator) are public spec — decoded for real by the pure-NumPy
  decoders (PNG: all five scanline filters, color types 0/2/3/4/6 at
  every legal bit depth 1/2/4/8/16 + Adam7 interlace; BMP:
  1/4/8/24/32bpp incl. RLE8/RLE4, palette + padding + row order; JPEG:
  baseline sequential, progressive (T.81 Annex G multi-scan), AND
  lossless predictive (SOF3, Annex H), incl. subsampling + restart
  intervals, Y plane as luma). ``decode_image``
  tries PIL, then the NumPy decoders, and only then falls back to a
  *deterministic fake* derived from the content hash (flagged by
  ``USING_FAKE_DECODE``) for formats no local code can
  decode (arithmetic-coded JPEG). Audio: WAV/PCM is raw samples
  behind a chunked RIFF header — ``decode_wav_np`` decodes PCM 8/16/24/32
  + IEEE float for real (``decode_aiff_np`` likewise for the big-endian
  AIFF twin incl. AIFC 'sowt') and ``audio_features`` reports
  rate/duration/rms/peak from bytes; FLAC is LOSSLESS public spec
  (RFC 9639) and ``decode_flac_np`` reconstructs exact PCM (Rice
  residuals + fixed/LPC predictors + stereo decorrelation) within a byte
  budget; the lossy codecs are HEADER-real (``parse_audio_header``: MP3
  frame headers + Xing, Ogg Vorbis/Opus ident + granule duration,
  ADTS-AAC frame chain) with decode-derived columns NULL. Every
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
    also real for PNG/BMP/baseline-JPEG via :func:`decode_png_np` /
    :func:`decode_bmp_np` / :func:`decode_jpeg_np`; only GIF pixels (LZW)
    and non-baseline JPEG still need PIL. A blob whose header doesn't
    parse falls through to the caller's fallback.

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
    - WebP (RFC 9649): RIFF container; dimensions from the first
      bitstream chunk (VP8 lossy keyframe 14-bit fields, VP8L lossless
      bit-packed 14+14, VP8X 24-bit canvas). Pixels stay header-real
      (VP8 entropy decode needs a real codec).
    - TIFF 6.0: endian magic, then ImageWidth/ImageLength (tags 256/257,
      SHORT or LONG) from the first IFD.
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
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP" and len(data) >= 30:
        # WebP (RFC 9649): dimensions live in the first bitstream chunk
        fourcc = data[12:16]
        p = 20  # chunk payload start
        if fourcc == b"VP8 " and data[p + 3 : p + 6] == b"\x9d\x01\x2a":
            # lossy keyframe: 14-bit width/height after the start code
            w = struct.unpack("<H", data[p + 6 : p + 8])[0] & 0x3FFF
            h = struct.unpack("<H", data[p + 8 : p + 10])[0] & 0x3FFF
            return {"format": "webp", "width": int(w), "height": int(h)}
        if fourcc == b"VP8L" and data[p] == 0x2F:
            # lossless: 14+14 bits LSB-first after the 0x2F signature
            b = struct.unpack("<I", data[p + 1 : p + 5])[0]
            return {"format": "webp", "width": int((b & 0x3FFF) + 1),
                    "height": int(((b >> 14) & 0x3FFF) + 1)}
        if fourcc == b"VP8X":
            # extended: 24-bit canvas width/height minus one
            w = int.from_bytes(data[p + 4 : p + 7], "little") + 1
            h = int.from_bytes(data[p + 7 : p + 10], "little") + 1
            return {"format": "webp", "width": w, "height": h}
        return None
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        # TIFF 6.0: walk the first IFD for ImageWidth(256)/ImageLength(257)
        end = "<" if data[:2] == b"II" else ">"
        try:
            (ifd,) = struct.unpack(end + "I", data[4:8])
            (cnt,) = struct.unpack(end + "H", data[ifd : ifd + 2])
            w = h = None
            for i in range(cnt):
                e = ifd + 2 + 12 * i
                tag, typ = struct.unpack(end + "HH", data[e : e + 4])
                if tag not in (256, 257):
                    continue
                if typ == 3:  # SHORT, value inline left-justified
                    (v,) = struct.unpack(end + "H", data[e + 8 : e + 10])
                elif typ == 4:  # LONG
                    (v,) = struct.unpack(end + "I", data[e + 8 : e + 12])
                else:
                    return None
                if tag == 256:
                    w = int(v)
                else:
                    h = int(v)
            if w and h:
                return {"format": "tiff", "width": w, "height": h}
        except struct.error:
            return None
        return None
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

# legal (color type -> bit depths) combinations, PNG spec table 11.1
_PNG_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
               4: (8, 16), 6: (8, 16)}

# Adam7 pass grids: (x_start, y_start, x_step, y_step), spec §8.2
_PNG_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_pass_samples(
    chunk: bytes, ph: int, pw: int, ch: int, depth: int
) -> np.ndarray:
    """Unfilter + unpack one (sub-)image's scanlines -> (ph, pw, ch) uint8
    samples. Sub-byte depths unpack bit-planes row-wise (single-channel
    only, per spec); depth 16 keeps the most-significant byte (the
    standard 8-bit reduction)."""
    bits_px = ch * depth
    stride = (pw * bits_px + 7) // 8
    fbpp = max(1, bits_px // 8)  # filters act on whole bytes below depth 8
    arr = _png_unfilter(chunk, ph, stride, fbpp)
    if depth == 8:
        return arr.reshape(ph, pw, ch)
    if depth == 16:
        return arr.reshape(ph, pw, ch, 2)[..., 0]
    bits = np.unpackbits(arr, axis=1)[:, : pw * depth]
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (bits.reshape(ph, pw, depth) * weights).sum(axis=2)
    return vals.astype(np.uint8)[..., None]


def decode_png_np(data: bytes) -> np.ndarray | None:
    """Pure NumPy+zlib PNG decode -> (h, w) grayscale uint8, or None for
    out-of-scope variants (truncated streams, illegal depth/color combos).

    PNG's pixel layer is just zlib over filtered scanlines (public spec,
    RFC 2083) — no codec library needed: parse the chunk stream, inflate
    the concatenated IDATs, reverse the scanline filters, then map color
    type to luma (0 gray, 2 RGB, 3 palette via PLTE, 4 gray+alpha,
    6 RGBA). All legal bit depths decode: 1/2/4 unpack bit-planes and
    scale gray to 8-bit (palette indexes stay raw), 16 reduces to the
    most-significant byte. Adam7 interlacing reassembles the seven
    per-pass sub-images, each filtered independently (spec §8.2). This is
    what makes mean_luma REAL bytes in this container, where PIL is
    absent."""
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos = 8
    n = len(data)
    w = h = None
    color_type = None
    depth = None
    interlace = 0
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
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
            if comp != 0 or filt != 0 or interlace not in (0, 1):
                return None
            if depth not in _PNG_DEPTHS.get(color_type, ()):
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
    samples = np.zeros((h, w, ch), dtype=np.uint8)
    passes = _PNG_ADAM7 if interlace else ((0, 0, 1, 1),)
    off = 0
    try:
        for x0, y0, xs, ys in passes:
            pw = -(-(w - x0) // xs) if w > x0 else 0
            ph = -(-(h - y0) // ys) if h > y0 else 0
            if pw == 0 or ph == 0:
                continue  # empty pass emits no scanlines (spec §8.2)
            stride = (pw * ch * depth + 7) // 8
            nbytes = ph * (1 + stride)
            if off + nbytes > len(raw):
                return None
            samples[y0::ys, x0::xs] = _png_pass_samples(
                raw[off : off + nbytes], ph, pw, ch, depth
            )
            off += nbytes
    except ValueError:
        return None  # unknown filter type inside a pass
    if color_type == 3:
        idx = samples[..., 0]
        if idx.size and int(idx.max()) >= len(plte):
            return None  # palette index out of range — corrupt PLTE/IDAT
        return _luma(plte[idx])
    if depth in (1, 2, 4):  # gray: scale to full 8-bit range
        samples = (samples.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(
            np.uint8
        )
    if color_type in (0, 4):
        return samples[..., 0]  # gray(, alpha dropped: convert("L") parity)
    return _luma(samples)  # 2 (RGB) / 6 (RGBA, alpha dropped)


def _bmp_rle(
    data: bytes, offset: int, w: int, h: int, nibble: bool
) -> np.ndarray | None:
    """Decode BI_RLE8/BI_RLE4 (Windows BMP spec): (count, value) runs,
    0-count escapes for end-of-line / end-of-bitmap / position delta, and
    word-aligned absolute mode. RLE bitmaps are stored bottom-up; returns
    the palette-index grid top-down. None on truncated streams."""
    idx = np.zeros((h, w), dtype=np.uint8)
    x = y = 0  # y counts stored rows (bottom-up)
    i = offset
    n = len(data)
    while i + 1 < n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt:
            if y >= h:
                return None
            if nibble:
                pix = (val >> 4, val & 0xF)
                end = min(x + cnt, w)
                for k in range(end - x):
                    idx[y, x + k] = pix[k & 1]
            else:
                idx[y, x : min(x + cnt, w)] = val
            x += cnt
        elif val == 0:  # end of line
            y += 1
            x = 0
        elif val == 1:  # end of bitmap
            return idx[::-1]
        elif val == 2:  # delta
            if i + 2 > n:
                return None
            x += data[i]
            y += data[i + 1]
            i += 2
        else:  # absolute mode: val literal pixels, word-aligned
            if y >= h:
                return None
            if nibble:
                nb = (val + 1) // 2
                if i + nb > n:
                    return None
                for k in range(val):
                    b = data[i + (k >> 1)]
                    v = (b >> 4) if k % 2 == 0 else b & 0xF
                    if x + k < w:
                        idx[y, x + k] = v
                i += nb + (nb & 1)
            else:
                if i + val > n:
                    return None
                end = min(x + val, w)
                idx[y, x:end] = np.frombuffer(
                    data, dtype=np.uint8, count=end - x, offset=i
                )
                i += val + (val & 1)
            x += val
    return None  # ran out of bytes before the end-of-bitmap escape


def decode_bmp_np(data: bytes) -> np.ndarray | None:
    """Pure NumPy BMP decode -> (h, w) grayscale uint8, or None outside
    scope (bitfields/embedded-codec compressions). Handles bpp
    1/4/8/24/32, BI_RLE8/BI_RLE4 run-length compression, 4-byte row
    padding, bottom-up vs top-down row order, and sub-byte palette
    index unpacking."""
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
    if w <= 0 or h_signed == 0:
        return None
    ok = (
        (compression == 0 and bpp in (1, 4, 8, 24, 32))
        or (compression == 1 and bpp == 8)
        or (compression == 2 and bpp == 4)
    )
    if not ok:
        return None
    h = abs(h_signed)
    if bpp <= 8:
        pal_off = 14 + dib
        n_entries = min(1 << bpp, (offset - pal_off) // 4)
        if n_entries <= 0:
            return None  # pixel offset at/inside the palette — corrupt header
        pal = np.frombuffer(
            data, dtype=np.uint8, count=n_entries * 4, offset=pal_off
        ).reshape(-1, 4)  # BGRX
    if compression:  # RLE is bottom-up by definition
        if h_signed < 0:
            return None
        idx = _bmp_rle(data, offset, w, h, nibble=(compression == 2))
        if idx is None or (idx.size and int(idx.max()) >= len(pal)):
            return None
        return _luma(pal[idx][..., :3][..., ::-1])
    row_bytes = ((w * bpp + 31) // 32) * 4
    if len(data) < offset + row_bytes * h:
        return None
    rows = np.frombuffer(
        data, dtype=np.uint8, count=row_bytes * h, offset=offset
    ).reshape(h, row_bytes)
    if h_signed > 0:  # bottom-up storage
        rows = rows[::-1]
    if bpp <= 8:
        if bpp == 8:
            idx = rows[:, :w]
        else:  # 1/4-bit: MSB-first bit-plane unpack per row
            bits = np.unpackbits(rows, axis=1)[:, : w * bpp]
            if bpp == 1:
                idx = bits
            else:
                weights = np.array([8, 4, 2, 1], dtype=np.uint8)
                idx = (bits.reshape(h, w, 4) * weights).sum(axis=2).astype(
                    np.uint8
                )
        if idx.size and int(idx.max()) >= len(pal):
            return None  # pixel indexes past the stored palette
        bgr = pal[idx][..., :3]
        return _luma(bgr[..., ::-1])
    px = rows[:, : w * (bpp // 8)].reshape(h, w, bpp // 8)
    return _luma(px[..., 2::-1])  # BGR(A) -> RGB


# -- baseline JPEG (ITU-T T.81), pure NumPy --------------------------------


def _zigzag_flat() -> np.ndarray:
    """(64,) map: zigzag position k -> row-major flat index (T.81 fig. 5),
    generated by diagonal traversal instead of embedding the table."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag.reverse()  # even anti-diagonals run bottom-left -> top-right
        order.extend(diag)
    return np.asarray([r * 8 + c for r, c in order], dtype=np.int64)


_JPEG_ZIGZAG = _zigzag_flat()


def _dct8_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis C[u, x] = c(u)/2 * cos((2x+1)u*pi/16);
    forward F = C f C^T, inverse f = C^T F C (T.81 A.3.3)."""
    u = np.arange(8, dtype=np.float64)
    C = np.cos((2.0 * u[None, :] + 1.0) * u[:, None] * np.pi / 16.0) / 2.0
    C[0] *= 1.0 / np.sqrt(2.0)
    return C


_DCT8 = _dct8_basis()


class _JpegHuff:
    """Canonical huffman decode table from a DHT segment's (BITS, VALUES)
    (T.81 Annex C code assignment): codes of each length are consecutive
    integers, doubling at each length step."""

    def __init__(self, counts: list[int], values: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                self.lookup[(ln, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


def _jpeg_huff_decode(tab: _JpegHuff, bits: np.ndarray, pos: int) -> tuple[int, int]:
    code = 0
    nb = len(bits)
    for ln in range(1, 17):
        if pos >= nb:
            raise ValueError("truncated JPEG scan")
        code = (code << 1) | int(bits[pos])
        pos += 1
        v = tab.lookup.get((ln, code))
        if v is not None:
            return v, pos
    raise ValueError("invalid JPEG huffman code")


def _jpeg_receive_extend(bits: np.ndarray, pos: int, size: int) -> tuple[int, int]:
    """Read ``size`` magnitude bits and sign-extend them (T.81 F.2.2.1
    EXTEND: values with a 0 first bit are negative, offset by 1-2^size)."""
    if size == 0:
        return 0, pos
    if pos + size > len(bits):
        raise ValueError("truncated JPEG scan")
    v = 0
    for _ in range(size):
        v = (v << 1) | int(bits[pos])
        pos += 1
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v, pos


def _jpeg_decode_block(
    bits: np.ndarray, pos: int, dc_tab: _JpegHuff, ac_tab: _JpegHuff, pred: int
) -> tuple[np.ndarray, int, int]:
    """One 8x8 block in ZIGZAG coefficient order: DC size category + diff,
    then AC (run, size) symbols with EOB / ZRL (T.81 F.2.2)."""
    coef = np.zeros(64, dtype=np.float64)
    t, pos = _jpeg_huff_decode(dc_tab, bits, pos)
    diff, pos = _jpeg_receive_extend(bits, pos, t)
    pred += diff
    coef[0] = pred
    k = 1
    while k < 64:
        rs, pos = _jpeg_huff_decode(ac_tab, bits, pos)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        v, pos = _jpeg_receive_extend(bits, pos, s)
        coef[k] = float(v)
        k += 1
    return coef, pos, pred


# Pixel budget for the pure-Python JPEG correctness tier (~1 s/megapixel):
# blobs larger than this decline to the PIL tier / luma-NULL contract
# rather than pinning an executor. Knob, not a constant — pipelines that
# genuinely want pure-NumPy decode of big scans can raise it.
JPEG_NP_MAX_PIXELS = 4_000_000


def decode_jpeg_np(data: bytes) -> np.ndarray | None:
    """Pure NumPy JPEG decode -> (h, w) LUMA uint8, or None for variants
    outside scope (arithmetic-coded SOFs, 12-bit DCT precision, 16-bit
    quant tables, truncated streams). Baseline sequential decodes here;
    progressive (SOF2) dispatches to :func:`_decode_jpeg_progressive`,
    lossless (SOF3) to :func:`_decode_jpeg_lossless`.

    Baseline JPEG's pixel layer is fully public spec (ITU-T T.81): marker
    segments carry the quant + huffman tables, the scan is huffman-coded
    (DC prediction + AC run-length in zigzag order), and each block
    inverts through dequant + IDCT. This decoder entropy-decodes EVERY
    component (the bitstream interleaves them) but runs the IDCT only for
    the first SOF component — JPEG's Y channel IS the ITU-R 601 luma this
    module reports, so the chroma planes would be converted straight back
    out (PIL's ``convert("L")`` of the RGB reconstruction equals Y up to
    integer rounding and RGB clipping). Restart intervals (DRI/RSTn)
    reset the DC predictors per segment, as specified.

    This is the correctness tier, not the throughput tier: the huffman
    loop is per-bit Python (~1 s per megapixel). With PIL importable the
    fast path runs first; without it, real pixels still beat a fake.
    """
    import struct

    if data[:2] != b"\xff\xd8":
        return None
    n = len(data)
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _JpegHuff] = {}
    sof = None
    scomp = None
    dri = 0
    scan_start = None
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        if marker == 0xD9:
            break
        if pos + 4 > n:
            return None
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            return None
        if marker == 0xDB:  # DQT (one or more tables; zigzag order)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0 or b + 65 > len(body):
                    return None  # 16-bit tables / truncated: out of scope
                qt[tq] = np.frombuffer(
                    body[b + 1 : b + 65], dtype=np.uint8
                ).astype(np.float64)
                b += 65
        elif marker == 0xC4:  # DHT (one or more tables)
            b = 0
            while b < len(body):
                if b + 17 > len(body):
                    return None
                tc, th = body[b] >> 4, body[b] & 0x0F
                counts = list(body[b + 1 : b + 17])
                nv = sum(counts)
                if b + 17 + nv > len(body):
                    return None
                huff[(tc, th)] = _JpegHuff(counts, list(body[b + 17 : b + 17 + nv]))
                b += 17 + nv
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential DCT
            if len(body) < 6:
                return None
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8 or len(body) < 6 + 3 * nc or h == 0 or w == 0:
                return None
            if int(h) * int(w) > JPEG_NP_MAX_PIXELS:
                # circuit breaker (r10): the huffman loop is per-bit Python
                # (~1 s/megapixel) — on an untrusted 100 TB corpus a 50 MP
                # bomb would pin an executor for a minute. Past the cap
                # this tier declines (None -> PIL tier or the documented
                # luma-NULL contract) instead of decoding.
                return None
            comps = []
            for ci in range(nc):
                cid = body[6 + 3 * ci]
                hv = body[7 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * ci]))
            if any(hc < 1 or vc < 1 for _, hc, vc, _ in comps):
                return None
            sof = (int(h), int(w), comps)
        elif marker == 0xC2:  # progressive DCT: the multi-scan path
            return _decode_jpeg_progressive(data)
        elif marker == 0xC3:  # lossless sequential: the predictive path
            return _decode_jpeg_lossless(data)
        elif marker in (0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # arithmetic / differential: out of scope
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                return None
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if not body:
                return None
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                return None
            scomp = []
            for ci in range(ns):
                cs = body[1 + 2 * ci]
                tt = body[2 + 2 * ci]
                scomp.append((cs, tt >> 4, tt & 0x0F))
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if sof is None or scan_start is None or scomp is None:
        return None
    h, w, comps = sof

    # unstuff the entropy-coded bytes, splitting at restart markers
    segments: list[list[int]] = [[]]
    i = scan_start
    while i < n:
        b = data[i]
        if b != 0xFF:
            segments[-1].append(b)
            i += 1
            continue
        m = data[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            segments[-1].append(0xFF)
            i += 2
            continue
        if 0xD0 <= m <= 0xD7:
            segments.append([])
            i += 2
            continue
        break  # EOI or next marker ends the scan

    # scan-component -> (dc table, ac table, quant table) resolution
    tabs = []
    for cid, hc, vc, tq in comps:
        entry = next(((d, a) for cs, d, a in scomp if cs == cid), None)
        if entry is None or tq not in qt:
            return None
        d, a = entry
        if (0, d) not in huff or (1, a) not in huff:
            return None
        tabs.append((huff[(0, d)], huff[(1, a)], qt[tq]))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    total_mcus = mcux * mcuy
    y_h, y_v = comps[0][1], comps[0][2]
    yplane = np.zeros((mcuy * y_v * 8, mcux * y_h * 8), dtype=np.float64)
    C = _DCT8
    mcu = 0
    try:
        for seg in segments:
            if mcu >= total_mcus:
                break
            bits = np.unpackbits(np.asarray(seg, dtype=np.uint8))
            bpos = 0
            preds = [0] * len(comps)
            in_seg = 0
            while mcu < total_mcus:
                my, mx = divmod(mcu, mcux)
                for ci, (cid, hc, vc, tq) in enumerate(comps):
                    dc_tab, ac_tab, q = tabs[ci]
                    for vy in range(vc):
                        for hx in range(hc):
                            coef, bpos, preds[ci] = _jpeg_decode_block(
                                bits, bpos, dc_tab, ac_tab, preds[ci]
                            )
                            if ci == 0:
                                blk = np.zeros(64, dtype=np.float64)
                                blk[_JPEG_ZIGZAG] = coef * q  # dezigzag+dequant
                                f = C.T @ blk.reshape(8, 8) @ C
                                y0 = (my * y_v + vy) * 8
                                x0 = (mx * y_h + hx) * 8
                                yplane[y0 : y0 + 8, x0 : x0 + 8] = f
                mcu += 1
                in_seg += 1
                if dri and in_seg == dri:
                    break  # next restart segment resets predictors
    except ValueError:
        return None  # truncated / corrupt entropy stream
    if mcu < total_mcus:
        return None  # truncated scan
    out = np.clip(np.round(yplane + 128.0), 0.0, 255.0).astype(np.uint8)
    return out[:h, :w]


def _jpeg_receive(bits: np.ndarray, pos: int, size: int) -> tuple[int, int]:
    """Read ``size`` raw bits MSB-first (no sign extension) — EOBRUN
    appendages and refinement correction bits."""
    if size == 0:
        return 0, pos
    if pos + size > len(bits):
        raise ValueError("truncated JPEG scan")
    v = 0
    for _ in range(size):
        v = (v << 1) | int(bits[pos])
        pos += 1
    return v, pos


def _jpeg_entropy_segments(data: bytes, start: int) -> tuple[list, int]:
    """Unstuff one scan's entropy-coded bytes from ``start``, splitting at
    restart markers -> (list of byte-value lists, position of the marker
    that ended the scan)."""
    n = len(data)
    segments: list[list[int]] = [[]]
    i = start
    while i < n:
        b = data[i]
        if b != 0xFF:
            segments[-1].append(b)
            i += 1
            continue
        m = data[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            segments[-1].append(0xFF)
            i += 2
            continue
        if 0xD0 <= m <= 0xD7:
            segments.append([])
            i += 2
            continue
        break  # EOI or next marker segment ends the scan
    return segments, i


def _jpeg_scan_dc(
    units, coef, scomp, huff, bits, bpos, preds, ah, al
) -> tuple[int, list[int]]:
    """One restart segment of a DC scan (Ss=0). First pass (Ah=0) decodes
    size+diff huffman pairs into ``pred << Al``; refinement (Ah>0) reads
    one raw bit per block ORed in at ``Al`` (T.81 G.1.2.1-G.1.2.2)."""
    for ci, by, bx in units:
        block = coef[ci][by, bx]
        if ah == 0:
            t, bpos = _jpeg_huff_decode(huff[(0, scomp[ci][1])], bits, bpos)
            diff, bpos = _jpeg_receive_extend(bits, bpos, t)
            preds[ci] += diff
            block[0] = preds[ci] << al
        else:
            bit, bpos = _jpeg_receive(bits, bpos, 1)
            if bit:
                block[0] |= 1 << al
    return bpos, preds


def _jpeg_scan_ac_first(
    blocks, coef_c, ac_tab, bits, bpos, ss, se, al, eobrun
) -> tuple[int, int]:
    """One restart segment of a first AC scan (Ah=0): run/size symbols in
    the Ss..Se band, values scaled by 2^Al, EOBn run lengths skipping
    whole blocks (T.81 G.1.2.3, figure G.3)."""
    for by, bx in blocks:
        if eobrun > 0:
            eobrun -= 1
            continue
        block = coef_c[by, bx]
        k = ss
        while k <= se:
            rs, bpos = _jpeg_huff_decode(ac_tab, bits, bpos)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL: sixteen zero coefficients
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    ext, bpos = _jpeg_receive(bits, bpos, r)
                    eobrun += ext
                break
            k += r
            if k > se:
                raise ValueError("JPEG AC run past band end")
            v, bpos = _jpeg_receive_extend(bits, bpos, s)
            block[k] = v << al if v >= 0 else -((-v) << al)
            k += 1
    return bpos, eobrun


def _jpeg_scan_ac_refine(
    blocks, coef_c, ac_tab, bits, bpos, ss, se, al, eobrun
) -> tuple[int, int]:
    """One restart segment of an AC refinement scan (Ah>0): newly-nonzero
    coefficients arrive as (run, 1) symbols with a sign bit; every
    nonzero-history coefficient passed over consumes a correction bit
    that may add ±2^Al toward its sign (T.81 G.1.2.3, figure G.7)."""
    p1 = 1 << al
    m1 = -1 << al
    for by, bx in blocks:
        block = coef_c[by, bx]
        k = ss
        if eobrun == 0:
            while k <= se:
                rs, bpos = _jpeg_huff_decode(ac_tab, bits, bpos)
                r, s = rs >> 4, rs & 0x0F
                val = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            ext, bpos = _jpeg_receive(bits, bpos, r)
                            eobrun += ext
                        break
                    # r == 15: run of 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("JPEG refinement size must be 1")
                    bit, bpos = _jpeg_receive(bits, bpos, 1)
                    val = p1 if bit else m1
                while k <= se:
                    c = int(block[k])
                    if c != 0:
                        bit, bpos = _jpeg_receive(bits, bpos, 1)
                        if bit and (c & p1) == 0:
                            block[k] = c + (p1 if c >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    block[k] = val
                k += 1
        if eobrun > 0:
            # EOB run: correction bits only, for the rest of the band
            while k <= se:
                c = int(block[k])
                if c != 0:
                    bit, bpos = _jpeg_receive(bits, bpos, 1)
                    if bit and (c & p1) == 0:
                        block[k] = c + (p1 if c >= 0 else m1)
                k += 1
            eobrun -= 1
    return bpos, eobrun


def _decode_jpeg_progressive(data: bytes) -> np.ndarray | None:
    """Pure NumPy progressive-JPEG decode -> (h, w) LUMA uint8, or None
    outside scope. Progressive JPEG (ITU-T T.81 Annex G, SOF2) spreads
    each block's DCT coefficients over MULTIPLE scans: spectral selection
    slices the zigzag band (Ss..Se) and successive approximation delivers
    magnitude bits top-down (Ah/Al), so the image sharpens as scans
    arrive. This decoder accumulates per-component coefficient planes
    across every scan — interleaved DC scans walk MCU geometry,
    non-interleaved scans walk the component's own block grid, restart
    markers reset DC predictors and EOB runs — then dequantizes and
    inverse-DCTs the Y plane exactly like the baseline path.

    Same tier contract as :func:`decode_jpeg_np` (which dispatches here
    on SOF2): per-bit Python entropy decode, ``JPEG_NP_MAX_PIXELS``
    circuit breaker, None on truncated/corrupt streams."""
    import struct

    n = len(data)
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _JpegHuff] = {}
    sof = None
    dri = 0
    coef: list[np.ndarray] | None = None
    geo = None
    try:
        while pos + 2 <= n:
            if data[pos] != 0xFF:
                return None
            marker = data[pos + 1]
            if marker == 0xFF:
                pos += 1
                continue
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                pos += 2
                continue
            if marker == 0xD9:
                break
            if pos + 4 > n:
                return None
            (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            body = data[pos + 4 : pos + 2 + seglen]
            if len(body) != seglen - 2:
                return None
            if marker == 0xDB:
                b = 0
                while b < len(body):
                    pq, tq = body[b] >> 4, body[b] & 0x0F
                    if pq != 0 or b + 65 > len(body):
                        return None
                    qt[tq] = np.frombuffer(
                        body[b + 1 : b + 65], dtype=np.uint8
                    ).astype(np.float64)
                    b += 65
            elif marker == 0xC4:
                b = 0
                while b < len(body):
                    if b + 17 > len(body):
                        return None
                    tc, th = body[b] >> 4, body[b] & 0x0F
                    counts = list(body[b + 1 : b + 17])
                    nv = sum(counts)
                    if b + 17 + nv > len(body):
                        return None
                    huff[(tc, th)] = _JpegHuff(
                        counts, list(body[b + 17 : b + 17 + nv])
                    )
                    b += 17 + nv
            elif marker == 0xC2:
                if sof is not None or len(body) < 6:
                    return None
                prec, h, w, nc = struct.unpack(">BHHB", body[:6])
                if prec != 8 or len(body) < 6 + 3 * nc or h == 0 or w == 0:
                    return None
                if int(h) * int(w) > JPEG_NP_MAX_PIXELS:
                    return None  # same circuit breaker as baseline
                comps = []
                for ci in range(nc):
                    cid = body[6 + 3 * ci]
                    hv = body[7 + 3 * ci]
                    comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * ci]))
                if any(hc < 1 or vc < 1 for _, hc, vc, _ in comps):
                    return None
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-int(w) // (8 * hmax))
                mcuy = -(-int(h) // (8 * vmax))
                coef = []
                nonint = []
                for _, hc, vc, _ in comps:
                    coef.append(
                        np.zeros((mcuy * vc, mcux * hc, 64), dtype=np.int64)
                    )
                    cw = -(-int(w) * hc // hmax)
                    ch = -(-int(h) * vc // vmax)
                    nonint.append((-(-ch // 8), -(-cw // 8)))
                sof = (int(h), int(w), comps)
                geo = (hmax, vmax, mcux, mcuy, nonint)
            elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None
            elif marker == 0xDD:
                if len(body) < 2:
                    return None
                (dri,) = struct.unpack(">H", body[:2])
            elif marker == 0xDA:
                if sof is None or coef is None or not body:
                    return None
                h, w, comps = sof
                hmax, vmax, mcux, mcuy, nonint = geo
                ns = body[0]
                if len(body) < 1 + 2 * ns + 3:
                    return None
                scan = []  # (component index, dc table id, ac table id)
                for si in range(ns):
                    cs = body[1 + 2 * si]
                    tt = body[2 + 2 * si]
                    ci = next(
                        (i for i, c in enumerate(comps) if c[0] == cs), None
                    )
                    if ci is None:
                        return None
                    scan.append((ci, tt >> 4, tt & 0x0F))
                ss_, se_ = body[1 + 2 * ns], body[2 + 2 * ns]
                aa = body[3 + 2 * ns]
                ah, al = aa >> 4, aa & 0x0F
                if se_ > 63 or ss_ > se_ or (ss_ > 0 and ns != 1):
                    return None
                if ss_ == 0 and se_ != 0:
                    return None  # DC scans carry ONLY coefficient 0 (G.1.1.1)
                segments, pos = _jpeg_entropy_segments(data, pos + 2 + seglen)
                # unit list: interleaved MCU walk (ns > 1, DC bands only)
                # or the single component's own block grid (T.81 A.2.2)
                if ns > 1:
                    units_all = []
                    for mcu in range(mcux * mcuy):
                        my, mx = divmod(mcu, mcux)
                        for si, (ci, _, _) in enumerate(scan):
                            _, hc, vc, _ = comps[ci]
                            for vy in range(vc):
                                for hx in range(hc):
                                    units_all.append(
                                        (ci, my * vc + vy, mx * hc + hx)
                                    )
                    per_unit = sum(comps[ci][1] * comps[ci][2]
                                   for ci, _, _ in scan)
                    step = dri * per_unit if dri else 0
                else:
                    ci = scan[0][0]
                    bh, bw = nonint[ci]
                    units_all = [
                        (ci, by, bx) for by in range(bh) for bx in range(bw)
                    ]
                    step = dri if dri else 0
                # resolve tables up front (refinement DC needs none)
                if ss_ == 0 and ah == 0:
                    for ci, td, _ in scan:
                        if (0, td) not in huff:
                            return None
                if ss_ > 0:
                    ta = scan[0][2]
                    if (1, ta) not in huff:
                        return None
                    ac_tab = huff[(1, ta)]
                    coef_c = coef[scan[0][0]]
                off = 0
                eobrun = 0
                scomp = {ci: (ci, td, ta) for ci, td, ta in scan}
                for seg in segments:
                    if off >= len(units_all):
                        break
                    take = units_all[off : off + step] if step else (
                        units_all[off:]
                    )
                    bits = np.unpackbits(np.asarray(seg, dtype=np.uint8))
                    if ss_ == 0:
                        preds = [0] * len(comps)
                        _jpeg_scan_dc(
                            take, coef, scomp, huff, bits, 0, preds, ah, al
                        )
                    else:
                        blocks = [(by, bx) for _, by, bx in take]
                        eobrun = 0  # restart resets the EOB run
                        if ah == 0:
                            _jpeg_scan_ac_first(
                                blocks, coef_c, ac_tab, bits, 0,
                                ss_, se_, al, eobrun,
                            )
                        else:
                            _jpeg_scan_ac_refine(
                                blocks, coef_c, ac_tab, bits, 0,
                                ss_, se_, al, eobrun,
                            )
                    off += len(take)
                if off < len(units_all):
                    return None  # truncated scan
                continue  # pos already advanced past the entropy data
            pos += 2 + seglen
        if sof is None or coef is None:
            return None
        h, w, comps = sof
        tq = comps[0][3]
        if tq not in qt:
            return None
        q = qt[tq]
        y_blocks = coef[0]
        bh, bw = y_blocks.shape[:2]
        C = _DCT8
        # dequant + dezigzag the whole Y plane in one vectorized pass,
        # then batched IDCT: (bh*bw, 8, 8) einsum against the DCT basis
        deq = y_blocks.reshape(-1, 64).astype(np.float64) * q[None, :]
        spat = np.zeros((deq.shape[0], 64), dtype=np.float64)
        spat[:, _JPEG_ZIGZAG] = deq
        blocks8 = spat.reshape(-1, 8, 8)
        pix = np.einsum("ur,nuv,vc->nrc", C, blocks8, C, optimize=True)
        yplane = (
            pix.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        out = np.clip(np.round(yplane + 128.0), 0.0, 255.0).astype(np.uint8)
        return out[:h, :w]
    except (ValueError, IndexError):
        return None


def _decode_jpeg_lossless(data: bytes) -> np.ndarray | None:
    """Pure NumPy lossless-JPEG decode (SOF3, ITU-T T.81 Annex H) ->
    (h, w) LUMA uint8, or None outside scope. Lossless JPEG is huffman-
    coded PREDICTION residuals, no DCT: each sample's difference from one
    of seven neighbor predictors (left / above / above-left combinations,
    H.1.2.1) is coded with the DC size-category tables; the first sample
    of the scan and of each restart interval predicts 2^(P-Pt-1), the
    rest of that line falls back to the left-neighbor predictor (H.1.2.2);
    reconstruction is modulo 2^16. This is the DNG / medical-imagery
    variant. Scope: sampling factors 1 (interleaved multi-component OK),
    precision 2-16 scaled to 8-bit luma, point transform applied as the
    spec's left shift. Same per-bit correctness-tier contract and
    ``JPEG_NP_MAX_PIXELS`` breaker as the DCT paths."""
    import struct

    n = len(data)
    pos = 2
    huff: dict[tuple[int, int], _JpegHuff] = {}
    sof = None
    dri = 0
    try:
        while pos + 2 <= n:
            if data[pos] != 0xFF:
                return None
            marker = data[pos + 1]
            if marker == 0xFF:
                pos += 1
                continue
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                pos += 2
                continue
            if marker == 0xD9:
                break
            if pos + 4 > n:
                return None
            (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            body = data[pos + 4 : pos + 2 + seglen]
            if len(body) != seglen - 2:
                return None
            if marker == 0xC4:
                b = 0
                while b < len(body):
                    if b + 17 > len(body):
                        return None
                    tc, th = body[b] >> 4, body[b] & 0x0F
                    counts = list(body[b + 1 : b + 17])
                    nv = sum(counts)
                    huff[(tc, th)] = _JpegHuff(
                        counts, list(body[b + 17 : b + 17 + nv])
                    )
                    b += 17 + nv
            elif marker == 0xC3:
                if len(body) < 6:
                    return None
                prec, h, w, nc = struct.unpack(">BHHB", body[:6])
                if not 2 <= prec <= 16 or h == 0 or w == 0:
                    return None
                if int(h) * int(w) > JPEG_NP_MAX_PIXELS:
                    return None
                comps = []
                for ci in range(nc):
                    hv = body[7 + 3 * ci]
                    if hv != 0x11:
                        return None  # subsampled lossless: out of scope
                    comps.append(body[6 + 3 * ci])
                sof = (int(prec), int(h), int(w), comps)
            elif marker == 0xDD:
                (dri,) = struct.unpack(">H", body[:2])
            elif marker == 0xDA:
                if sof is None or not body:
                    return None
                prec, h, w, comps = sof
                ns = body[0]
                if len(body) < 1 + 2 * ns + 3 or ns != len(comps):
                    return None
                tabs = []
                for si in range(ns):
                    td = body[2 + 2 * si] >> 4
                    if (0, td) not in huff:
                        return None
                    tabs.append(huff[(0, td)])
                psel = body[1 + 2 * ns]  # Ss = predictor selector
                pt = body[3 + 2 * ns] & 0x0F  # Al = point transform
                if not 1 <= psel <= 7 or pt >= prec:
                    return None
                segments, _ = _jpeg_entropy_segments(data, pos + 2 + seglen)
                planes = [
                    np.zeros((h, w), dtype=np.int64) for _ in range(ns)
                ]
                default = 1 << (prec - pt - 1)
                total = h * w
                idx = 0
                for seg in segments:
                    if idx >= total:
                        break
                    bits = np.unpackbits(np.asarray(seg, dtype=np.uint8))
                    bpos = 0
                    seg_start = idx
                    count = dri if dri else total - idx
                    for _ in range(min(count, total - idx)):
                        y, x = divmod(idx, w)
                        sy, sx = divmod(seg_start, w)
                        for ci in range(ns):
                            p = planes[ci]
                            if idx == seg_start:
                                pred = default
                            elif y == sy:
                                # rest of the scan's / restart interval's
                                # first line: 1-D left predictor (H.1.2.2)
                                pred = int(p[y, x - 1])
                            elif x == 0:
                                pred = int(p[y - 1, 0])
                            else:
                                a = int(p[y, x - 1])
                                b = int(p[y - 1, x])
                                c = int(p[y - 1, x - 1])
                                pred = (
                                    a, b, c, a + b - c,
                                    a + ((b - c) >> 1),
                                    b + ((a - c) >> 1),
                                    (a + b) >> 1,
                                )[psel - 1]
                            s, bpos = _jpeg_huff_decode(
                                tabs[ci], bits, bpos
                            )
                            if s == 16:
                                diff = 32768
                            else:
                                diff, bpos = _jpeg_receive_extend(
                                    bits, bpos, s
                                )
                            p[y, x] = (pred + diff) & 0xFFFF
                        idx += 1
                if idx < total:
                    return None
                out = planes[0] << pt
                if prec > 8:
                    out = out >> (prec - 8)
                elif prec < 8:
                    out = out * 255 // ((1 << prec) - 1)
                return np.clip(out, 0, 255).astype(np.uint8)
            pos += 2 + seglen
        return None
    except (ValueError, IndexError):
        return None


# -- GIF (GIF87a/89a), pure NumPy -------------------------------------------


def _gif_lzw(data: bytes, pos: int, npix: int, min_size: int):
    """Decode one GIF image's LZW sub-block stream (spec appendix F:
    variable-width codes LSB-first, clear/EOI, width growth at table-size
    powers of two, 12-bit cap) -> (palette-index bytes, pos after the
    block terminator), or (None, pos) on malformed input."""
    chunks = []
    while pos < len(data):
        ln = data[pos]
        pos += 1
        if ln == 0:
            break
        chunks.append(data[pos : pos + ln])
        pos += ln
    stream = b"".join(chunks)
    bits = np.unpackbits(
        np.frombuffer(stream, dtype=np.uint8), bitorder="little"
    )
    clear = 1 << min_size
    eoi = clear + 1
    out = bytearray()
    width = min_size + 1
    table: list[bytes | None] = [bytes([i]) for i in range(clear)] + [None, None]
    prev: bytes | None = None
    bp = 0
    nb = len(bits)
    try:
        while len(out) < npix:
            if bp + width > nb:
                return None, pos  # truncated stream
            code = 0
            for i in range(width):
                code |= int(bits[bp + i]) << i
            bp += width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [None, None]
                width = min_size + 1
                prev = None
                continue
            if code == eoi:
                break
            if prev is None:
                if code >= clear:
                    return None, pos
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if entry is None:
                    return None, pos
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None, pos
            if len(table) == (1 << width) and width < 12:
                width += 1
            out += entry
            prev = entry
    except IndexError:
        return None, pos
    if len(out) < npix:
        return None, pos
    return bytes(out[:npix]), pos


def _gif_deinterlace(idx: np.ndarray) -> np.ndarray:
    """Reverse the 4-pass GIF row interleave (spec appendix E)."""
    h = idx.shape[0]
    de = np.empty_like(idx)
    rows = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        rows.extend(range(start, h, step))
    de[np.asarray(rows, dtype=np.int64)] = idx
    return de


def decode_gif_np(data: bytes) -> np.ndarray | None:
    """Pure NumPy+Python GIF decode of the FIRST image frame -> (h, w)
    grayscale uint8, or None for malformed/truncated streams.

    GIF's pixel layer is LZW over palette indexes (public spec, GIF89a) —
    variable-width codes LSB-first, clear/EOI codes, width growth at each
    table-size power of two with NO early change, 12-bit cap, 4-pass
    interlace option. Local color tables override the global one.
    Animation frames beyond the first and extension blocks (GCE
    transparency etc.) are skipped — mean_luma/resize semantics here are
    single-image; :func:`decode_gif_frames_np` composites the full
    animation."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        return None
    import struct

    sw, sh, flags = struct.unpack("<HHB", data[6:11])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(data):
            return None
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(-1, 3)
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while p < len(data):
            ln = data[p]
            p += 1
            if ln == 0:
                return p
            p += ln
        return p

    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            return None  # no image frame present
        if b == 0x21:  # extension: label + sub-blocks
            pos = skip_subblocks(pos + 2)
            continue
        if b != 0x2C:
            return None
        break
    if pos >= len(data):
        return None
    # image descriptor
    if pos + 10 > len(data):
        return None
    _l, _t, w, h, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
    pos += 10
    pal = gct
    if iflags & 0x80:  # local color table
        n = 2 << (iflags & 0x07)
        if pos + 3 * n > len(data):
            return None
        pal = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(-1, 3)
        pos += 3 * n
    if pal is None or w == 0 or h == 0 or pos >= len(data):
        return None
    interlaced = bool(iflags & 0x40)

    min_size = data[pos]
    pos += 1
    if not (2 <= min_size <= 11):
        return None
    out, pos = _gif_lzw(data, pos, w * h, min_size)
    if out is None:
        return None
    idx = np.frombuffer(out, dtype=np.uint8).reshape(h, w)
    if idx.size and int(idx.max()) >= len(pal):
        return None
    if interlaced:
        idx = _gif_deinterlace(idx)
    return _luma(pal[idx])


def decode_gif_frames_np(
    data: bytes, max_frames: int = 256
) -> list[tuple[int, np.ndarray]] | None:
    """Pure NumPy+Python ANIMATED GIF decode -> list of (delay_ms,
    full-logical-screen luma uint8) composited frames, or None if no
    frame decodes. The full GIF89a animation model (public spec §23):

    - Graphic Control Extension per frame: delay (1/100 s units ->
      delay_ms = x10), transparency index (transparent pixels keep the
      canvas), disposal method.
    - Compositing canvas at the logical-screen size, initialized to the
      background color (or black without a GCT); each sub-image draws at
      its (left, top) offset.
    - Disposal 0/1 leave the canvas; 2 restores the frame's REGION to
      background; 3 restores the pre-frame canvas.

    Frames past ``max_frames`` (or a malformed tail) are dropped — the
    frames already decoded still return, matching the lenient
    header-tier contract. A single-image GIF returns one frame whose
    luma equals :func:`decode_gif_np` composited at its offset."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        return None
    import struct

    sw, sh, flags = struct.unpack("<HHB", data[6:11])
    bg_index = data[11]
    if sw == 0 or sh == 0:
        return None
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(data):
            return None
        gct = np.frombuffer(
            data, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(-1, 3)
        pos += 3 * n
    if gct is not None and bg_index < len(gct):
        bg_rgb = gct[bg_index]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    frames: list[tuple[int, np.ndarray]] = []
    delay_ms = 0
    transparent = None
    disposal = 0
    while pos < len(data) and len(frames) < max_frames:
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos + 2 > len(data):
                break
            label = data[pos + 1]
            if label == 0xF9 and pos + 7 <= len(data) and data[pos + 2] >= 4:
                packed = data[pos + 3]
                disposal = (packed >> 2) & 0x7
                delay_ms = struct.unpack_from("<H", data, pos + 4)[0] * 10
                transparent = data[pos + 6] if packed & 0x1 else None
            # skip label + sub-blocks
            p = pos + 2
            while p < len(data):
                ln = data[p]
                p += 1
                if ln == 0:
                    break
                p += ln
            pos = p
            continue
        if b != 0x2C or pos + 10 > len(data):
            break
        left, top, w, h, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        pos += 10
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(data):
                break
            pal = np.frombuffer(
                data, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(-1, 3)
            pos += 3 * n
        if pal is None or w == 0 or h == 0 or pos >= len(data):
            break
        min_size = data[pos]
        pos += 1
        if not (2 <= min_size <= 11):
            break
        out, pos = _gif_lzw(data, pos, w * h, min_size)
        if out is None:
            break
        idx = np.frombuffer(out, dtype=np.uint8).reshape(h, w)
        if idx.size and int(idx.max()) >= len(pal):
            break
        if iflags & 0x40:
            idx = _gif_deinterlace(idx)
        # clip the sub-image to the logical screen (malformed offsets)
        y1, x1 = min(top + h, sh), min(left + w, sw)
        if top >= sh or left >= sw:
            region = None
        else:
            region = (top, y1, left, x1)
        before = canvas.copy() if disposal == 3 else None
        if region is not None:
            t, y1, l_, x1 = region
            sub = pal[idx[: y1 - t, : x1 - l_]]
            if transparent is not None:
                opaque = idx[: y1 - t, : x1 - l_] != transparent
                np.copyto(canvas[t:y1, l_:x1], sub, where=opaque[..., None])
            else:
                canvas[t:y1, l_:x1] = sub
        frames.append((delay_ms, _luma(canvas)))
        # dispose AFTER the frame is emitted (spec: disposal says what
        # happens to the region before the NEXT frame draws)
        if disposal == 2 and region is not None:
            t, y1, l_, x1 = region
            canvas[t:y1, l_:x1] = bg_rgb
        elif disposal == 3 and before is not None:
            canvas = before
        delay_ms, transparent, disposal = 0, None, 0
    return frames or None


def try_decode_image_np(content: bytes) -> np.ndarray | None:
    """Library-free real pixel decode for the formats whose pixel layer is
    public-spec: zlib scanlines (PNG), raw rows (BMP), baseline AND
    progressive huffman+DCT (JPEG, :func:`decode_jpeg_np`), and LZW
    palette indexes (GIF, :func:`decode_gif_np`); None only for
    out-of-scope variants (arithmetic-coded JPEG, 16-bit PNG,
    compressed BMP).

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
        if content[:2] == b"\xff\xd8":
            return decode_jpeg_np(content)
        if content[:6] in (b"GIF87a", b"GIF89a"):
            return decode_gif_np(content)
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
    importable, else the pure-NumPy PNG/BMP/baseline-JPEG decoders
    (:func:`try_decode_image_np`); GIF and out-of-scope JPEG variants
    without PIL report luma null. Unrecognized blobs fall through to the
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
                        # PNG/BMP/baseline-JPEG pixels are real via the
                        # NumPy decoders; GIF (LZW) still needs a codec
                        # library. A header-valid blob whose body won't
                        # decode reports luma NULL — never the hash-fake
                        # (which would masquerade as measured pixels).
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


def gif_frames(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "asset_id",
    max_frames: int = 256,
) -> DataFrame:
    """REAL animated-GIF frame explode: 1 asset row -> N composited
    frame rows (id, frame_idx, delay_ms, width, height, mean_luma,
    frame_md5) via :func:`decode_gif_frames_np` — full GIF89a animation
    semantics (GCE delay/transparency, disposal 0-3) composited on the
    logical-screen canvas, pure NumPy, no decoder library. Non-GIF and
    malformed blobs emit no rows (same lenient contract as the other
    decode kernels); frame_md5 fingerprints the composited luma bytes so
    downstream frame-level dedup is content-addressed, not
    container-addressed. Arrow-batched mapInPandas; blobs never touch
    the driver."""
    out_schema = (
        f"{id_col} string, frame_idx int, delay_ms long, width int, "
        "height int, mean_luma double, frame_md5 string"
    )

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf[content_col].notna()]
            if pdf.empty:
                continue
            rows = []
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                decoded = decode_gif_frames_np(bytes(content), max_frames)
                if not decoded:
                    continue
                for i, (delay, luma) in enumerate(decoded):
                    rows.append(
                        (
                            str(aid), i, int(delay),
                            int(luma.shape[1]), int(luma.shape[0]),
                            float(luma.mean()) / 255.0,
                            hashlib.md5(luma.tobytes()).hexdigest(),
                        )
                    )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[id_col, "frame_idx", "delay_ms", "width",
                             "height", "mean_luma", "frame_md5"],
                )

    return df.select(id_col, content_col).mapInPandas(explode, out_schema)


def decode_wav_np(data: bytes) -> tuple[np.ndarray, int] | None:
    """Pure NumPy WAV decode -> (mono float64 samples in [-1, 1],
    sample_rate), or None outside scope (compressed codecs, truncated
    RIFF). WAV's pixel-equivalent is raw PCM behind a chunked RIFF header
    (public spec) — no audio library needed: walk the chunks, read
    ``fmt `` (format/channels/rate/bits), slice ``data``. Supports PCM
    uint8 / int16 / int24 / int32 and IEEE float32/64; multi-channel
    downmixes by mean. Never raises on malformed bytes (callers treat
    None as 'not decodable here')."""
    import struct

    try:
        if data[:4] != b"RIFF" or data[8:12] != b"WAVE" or len(data) < 44:
            return None
        pos = 12
        fmt = None
        payload = None
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + clen]
            if cid == b"fmt " and len(body) >= 16:
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                payload = body
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if fmt is None or payload is None:
            return None
        audio_format, channels, rate, _byte_rate, _align, bits = fmt
        if channels < 1 or rate <= 0:
            return None
        if audio_format == 1:  # integer PCM
            if bits == 8:
                x = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
                x = (x - 128.0) / 128.0
            elif bits == 16:
                n16 = len(payload) // 2
                x = np.frombuffer(payload, dtype="<i2", count=n16).astype(
                    np.float64
                ) / 32768.0
            elif bits == 24:
                n24 = len(payload) // 3
                raw = np.frombuffer(payload, dtype=np.uint8, count=n24 * 3)
                x = (
                    raw[0::3].astype(np.int32)
                    | (raw[1::3].astype(np.int32) << 8)
                    | (raw[2::3].astype(np.int32) << 16)
                )
                x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float64)
                x /= float(1 << 23)
            elif bits == 32:
                n32 = len(payload) // 4
                x = np.frombuffer(payload, dtype="<i4", count=n32).astype(
                    np.float64
                ) / float(1 << 31)
            else:
                return None
        elif audio_format == 3:  # IEEE float
            if bits == 32:
                x = np.frombuffer(
                    payload, dtype="<f4", count=len(payload) // 4
                ).astype(np.float64)
            elif bits == 64:
                x = np.frombuffer(payload, dtype="<f8", count=len(payload) // 8)
            else:
                return None
        else:
            return None  # compressed codecs need a real library
        frames = len(x) // channels
        if frames == 0:
            return None
        x = x[: frames * channels].reshape(frames, channels).mean(axis=1)
        return x, int(rate)
    except Exception:
        return None


def decode_aiff_np(data: bytes) -> tuple[np.ndarray, int] | None:
    """Pure NumPy AIFF decode -> (mono float64 samples in [-1, 1],
    sample_rate), or None outside scope (AIFC compressed variants,
    truncated chunks). AIFF is WAV's big-endian twin (public spec,
    Apple 1989): an IFF ``FORM``/``AIFF`` container whose ``COMM`` chunk
    carries channels / frames / bits and the sample rate as an 80-bit
    IEEE-754 extended float, and whose ``SSND`` chunk is big-endian
    integer PCM after an 8-byte offset/blocksize prefix. AIFC passes
    only when the compression type is ``NONE``; ``sowt``
    (little-endian 16-bit, the common Mac variant) byte-swaps.
    Multi-channel downmixes by mean. Never raises on malformed bytes."""
    import struct

    try:
        if data[:4] != b"FORM" or data[8:12] not in (b"AIFF", b"AIFC"):
            return None
        is_aifc = data[8:12] == b"AIFC"
        pos = 12
        comm = None
        ssnd = None
        compress = b"NONE"
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (clen,) = struct.unpack(">I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + clen]
            if cid == b"COMM" and len(body) >= 18:
                channels, frames, bits = struct.unpack(">HIH", body[:8])
                # 80-bit extended float: 1+15 bit sign/exponent, 64-bit
                # explicit-leading-one mantissa
                (se,) = struct.unpack(">H", body[8:10])
                (mant,) = struct.unpack(">Q", body[10:18])
                exp = (se & 0x7FFF) - 16383
                rate = mant * 2.0 ** (exp - 63)
                if se & 0x8000:
                    rate = -rate
                comm = (channels, frames, bits, int(round(rate)))
                if is_aifc and len(body) >= 22:
                    compress = body[18:22]
            elif cid == b"SSND" and len(body) >= 8:
                (off,) = struct.unpack(">I", body[:4])
                ssnd = body[8 + off :]
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if comm is None or ssnd is None:
            return None
        channels, frames, bits, rate = comm
        if channels < 1 or rate <= 0 or frames == 0:
            return None
        if compress not in (b"NONE", b"sowt"):
            return None  # compressed AIFC needs a real codec
        bswap = compress == b"sowt"
        if bits <= 8:
            x = np.frombuffer(ssnd, dtype=np.int8).astype(np.float64) / 128.0
        elif bits <= 16:
            dt = "<i2" if bswap else ">i2"
            x = np.frombuffer(ssnd, dtype=dt, count=len(ssnd) // 2).astype(
                np.float64
            ) / 32768.0
        elif bits <= 24:
            n24 = len(ssnd) // 3
            raw = np.frombuffer(ssnd, dtype=np.uint8, count=n24 * 3)
            hi, mid, lo = (
                (raw[2::3], raw[1::3], raw[0::3]) if bswap
                else (raw[0::3], raw[1::3], raw[2::3])
            )
            x = (
                (hi.astype(np.int32) << 16)
                | (mid.astype(np.int32) << 8)
                | lo.astype(np.int32)
            )
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float64)
            x /= float(1 << 23)
        elif bits <= 32:
            dt = "<i4" if bswap else ">i4"
            x = np.frombuffer(ssnd, dtype=dt, count=len(ssnd) // 4).astype(
                np.float64
            ) / float(1 << 31)
        else:
            return None
        nfr = min(frames, len(x) // channels)
        if nfr == 0:
            return None
        x = x[: nfr * channels].reshape(nfr, channels).mean(axis=1)
        return x, int(rate)
    except Exception:
        return None


# MPEG audio frame-header tables (public spec, ISO/IEC 11172-3 + 13818-3).
# Bitrate kbps by [version-group][layer][index 1..14]; 0 = "free", 15 = bad.
_MP3_BITRATES = {
    ("1", 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    ("1", 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    ("1", 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    ("2", 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    ("2", 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    ("2", 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {"1": (44100, 48000, 32000), "2": (22050, 24000, 16000),
              "2.5": (11025, 12000, 8000)}


def _mp3_frame_at(data: bytes, pos: int) -> dict | None:
    """Parse one MPEG audio frame header at ``pos``; None if not a valid
    sync/field combination."""
    if pos + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    ver_bits = (b1 >> 3) & 0x3
    version = {0: "2.5", 2: "2", 3: "1"}.get(ver_bits)
    layer = {1: 3, 2: 2, 3: 1}.get((b1 >> 1) & 0x3)
    if version is None or layer is None:
        return None
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / invalid
    group = "1" if version == "1" else "2"
    bitrate = _MP3_BITRATES[(group, layer)][br_idx - 1]
    rate = _MP3_RATES[version][sr_idx]
    padding = (b2 >> 1) & 0x1
    mode = (b3 >> 6) & 0x3
    spf = 384 if layer == 1 else (
        1152 if layer == 2 or version == "1" else 576
    )
    if layer == 1:
        flen = (12 * bitrate * 1000 // rate + padding) * 4
    else:
        flen = spf // 8 * bitrate * 1000 // rate + padding
    return {
        "version": version, "layer": layer, "bitrate_kbps": bitrate,
        "sample_rate": rate, "channels": 1 if mode == 3 else 2,
        "samples_per_frame": spf, "frame_len": flen, "mono": mode == 3,
    }


def parse_mp3_header(data: bytes) -> dict | None:
    """Header-real MP3 metadata WITHOUT decoding audio — the audio twin of
    :func:`parse_image_header`'s bytes-real image stats. Skips an ID3v2
    tag, locates the first frame sync whose NEXT frame also syncs (the
    standard false-sync guard), reads version/layer/bitrate/sample-rate/
    channels from the 4-byte frame header, and derives duration: from the
    Xing/Info frame count when the VBR header is present, else from the
    CBR byte-length estimate (audio bytes x 8 / bitrate). Decode stays
    NULL-tier (compressed codecs need a real library); never raises on
    malformed bytes."""
    try:
        n = len(data)
        pos = 0
        if data[:3] == b"ID3" and n >= 10:
            size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | (
                (data[8] & 0x7F) << 7
            ) | (data[9] & 0x7F)
            # syncsafe size excludes the 10-byte header and the optional
            # v2.4 footer (flag 0x10, 10 bytes AFTER the frames) but
            # includes any extended header, so audio starts at
            # 10 + size (+ 10 for the footer)
            pos = 10 + size + (10 if data[5] & 0x10 else 0)
        first = None
        limit = min(n - 4, pos + 65536)
        while pos <= limit:
            frame = _mp3_frame_at(data, pos)
            if frame is not None and frame["frame_len"] >= 4:
                nxt = pos + frame["frame_len"]
                # false-sync guard: the NEXT frame must also sync; a frame
                # ending exactly at EOF is a complete 1..N-frame file, but
                # a first frame extending PAST EOF is random bytes
                if (nxt <= n and nxt + 4 > n) or _mp3_frame_at(
                    data, nxt
                ) is not None:
                    first = (pos, frame)
                    break
            pos += 1
        if first is None:
            return None
        start, f = first
        audio_bytes = n - start - (128 if data[-128:-125] == b"TAG" else 0)
        frames = None
        vbr = False
        # Xing/Info VBR header sits after the Layer III side info
        if f["layer"] == 3:
            side = (17 if f["mono"] else 32) if f["version"] == "1" else (
                9 if f["mono"] else 17
            )
            x = start + 4 + side
            if data[x : x + 4] in (b"Xing", b"Info") and x + 12 <= n:
                import struct

                (flags,) = struct.unpack(">I", data[x + 4 : x + 8])
                if flags & 0x1:
                    (frames,) = struct.unpack(">I", data[x + 8 : x + 12])
                    vbr = data[x : x + 4] == b"Xing"
        if frames is not None:
            duration_ms = int(
                frames * f["samples_per_frame"] * 1000 // f["sample_rate"]
            )
        else:
            # multiply by 1000 BEFORE the integer division: dividing first
            # truncates to whole seconds and quantizes duration_ms to
            # second granularity (a 2.9 s file would report 2000 ms)
            duration_ms = int(audio_bytes * 8 * 1000 // (f["bitrate_kbps"] * 1000))
        return {
            "format": "mp3",
            "mpeg_version": f["version"],
            "layer": f["layer"],
            "bitrate_kbps": f["bitrate_kbps"],
            "sample_rate": f["sample_rate"],
            "channels": f["channels"],
            "vbr": vbr,
            "frames": frames,
            "duration_ms": duration_ms,
            "audio_start": start,
        }
    except Exception:
        return None


def parse_flac_header(data: bytes) -> dict | None:
    """Header-real FLAC metadata from the STREAMINFO block (RFC 9639 /
    xiph FLAC format §metadata_block_streaminfo) — no decode. Walks the
    metadata blocks after the "fLaC" magic until STREAMINFO (type 0, and
    in a conformant stream the FIRST block), unpacks the bit-packed
    sample rate (20 bits) / channels-1 (3) / bits-per-sample-1 (5) /
    total samples (36), and derives the EXACT duration. Never raises."""
    try:
        if data[:4] != b"fLaC":
            return None
        pos = 4
        while pos + 4 <= len(data):
            hdr = data[pos]
            btype = hdr & 0x7F
            blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
            body = data[pos + 4 : pos + 4 + blen]
            if btype == 0:
                if len(body) < 18:
                    return None
                # bytes 10..18: 20-bit rate | 3-bit chans-1 | 5-bit bps-1
                # | 36-bit total samples, MSB-first
                bits = int.from_bytes(body[10:18], "big")
                rate = bits >> 44
                channels = ((bits >> 41) & 0x7) + 1
                bps = ((bits >> 36) & 0x1F) + 1
                total = bits & ((1 << 36) - 1)
                if rate == 0:
                    return None
                return {
                    "format": "flac",
                    "sample_rate": int(rate),
                    "channels": int(channels),
                    "bits_per_sample": int(bps),
                    "total_samples": int(total) or None,
                    "duration_ms": (
                        int(total * 1000 // rate) if total else None
                    ),
                }
            if hdr & 0x80:  # last-metadata-block flag, STREAMINFO absent
                return None
            pos += 4 + blen
        return None
    except Exception:
        return None


class _FlacBits:
    """MSB-first bit cursor over a byte buffer for the FLAC frame layer.

    ``read`` dots an unpacked-bit slice with powers of two (vectorized,
    no per-bit Python); ``unary`` finds the next set bit with a widening
    ``argmax`` window (Rice quotients are almost always tiny);
    ``read_signed_array`` bulk-reads N fixed-width two's-complement ints
    in one reshape+matmul — the warmup/verbatim/escaped-residual path."""

    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes, start_byte: int = 0):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = start_byte * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > len(self.bits):
            raise ValueError("truncated FLAC stream")
        self.pos = p + n
        if n <= 56:
            w = self.bits[p : p + n].astype(np.int64)
            return int(w @ (np.int64(1) << np.arange(n - 1, -1, -1, dtype=np.int64)))
        v = 0
        for b in self.bits[p : p + n].tolist():
            v = (v << 1) | b
        return v

    def unary(self) -> int:
        bits, p, n = self.bits, self.pos, len(self.bits)
        span = 64
        while True:
            w = bits[p : min(p + span, n)]
            if w.size == 0:
                raise ValueError("truncated FLAC stream")
            q = int(np.argmax(w))
            if w[q]:
                self.pos = p + q + 1
                return q
            if p + w.size >= n:
                raise ValueError("truncated FLAC stream")
            span *= 4

    def read_signed_array(self, count: int, width: int) -> np.ndarray:
        if width == 0:
            return np.zeros(count, dtype=np.int64)
        p = self.pos
        if width > 32 or p + count * width > len(self.bits):
            raise ValueError("truncated FLAC stream")
        self.pos = p + count * width
        w = self.bits[p : p + count * width].astype(np.int64).reshape(count, width)
        v = w @ (np.int64(1) << np.arange(width - 1, -1, -1, dtype=np.int64))
        return np.where(v >= np.int64(1) << (width - 1), v - (np.int64(1) << width), v)

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


_FLAC_FRAME_RATES = (None, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
                     32000, 44100, 48000, 96000)


def _flac_rice_partition(br: _FlacBits, count: int, param: int) -> np.ndarray:
    """Rice-decode ``count`` residuals at parameter ``param``: unary
    quotient, ``param`` remainder bits, zigzag to signed (RFC 9639 §9.2.7).
    The quotient scan is per-sample Python (the stop bit's position depends
    on the previous remainder), each step two cheap NumPy ops."""
    out = np.empty(count, dtype=np.int64)
    una, read = br.unary, br.read
    for i in range(count):
        u = (una() << param) | read(param)
        out[i] = (u >> 1) ^ -(u & 1)
    return out


def _flac_residual(br: _FlacBits, block_size: int, order: int) -> np.ndarray:
    """Coded residual section: 2-bit method (Rice 4-bit / Rice2 5-bit
    params), 4-bit partition order, per-partition parameter with the
    all-ones escape to raw fixed-width values (RFC 9639 §9.2.7)."""
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if block_size % nparts:
        raise ValueError("FLAC partition order does not divide block")
    chunks = []
    for part in range(nparts):
        cnt = (block_size >> po) - (order if part == 0 else 0)
        if cnt < 0:
            raise ValueError("FLAC partition shorter than predictor order")
        param = br.read(pbits)
        if param == escape:
            width = br.read(5)
            chunks.append(br.read_signed_array(cnt, width))
        else:
            chunks.append(_flac_rice_partition(br, cnt, param))
    return np.concatenate(chunks) if chunks else np.zeros(0, dtype=np.int64)


def _flac_unfix(warm: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    """Invert a fixed-order predictor: the residual is the order-th
    difference of the signal, so integrate ``order`` times, seeding each
    level from the warmup samples' difference pyramid — O(order) cumsums,
    fully vectorized (RFC 9639 §9.2.5)."""
    if order == 0:
        return res
    cur = res
    for j in range(order, 0, -1):
        seed = np.diff(warm, n=j - 1)[-1] if j > 1 else 0
        if j > 1:
            cur = seed + np.cumsum(cur)
        else:
            cur = warm[-1] + np.cumsum(cur)
    return np.concatenate([warm, cur])


def _flac_unlpc(
    warm: np.ndarray, res: np.ndarray, coefs: list[int], shift: int
) -> np.ndarray:
    """Invert an LPC subframe: x[i] = res[i] + (sum c_j * x[i-1-j]) >> shift.
    The arithmetic right shift sits INSIDE the recursion, so this is
    inherently sequential — a plain-int Python loop (correctness tier,
    same contract as the JPEG huffman loop)."""
    order = len(coefs)
    buf = [int(v) for v in warm] + [0] * len(res)
    rl = res.tolist()
    for i, rv in enumerate(rl):
        base = order + i
        acc = 0
        for j in range(order):
            acc += coefs[j] * buf[base - 1 - j]
        buf[base] = rv + (acc >> shift)
    return np.asarray(buf, dtype=np.int64)


def _flac_subframe(br: _FlacBits, block_size: int, bps: int) -> np.ndarray:
    """One subframe: zero pad bit, 6-bit type, wasted-bits unary, then the
    constant / verbatim / fixed / LPC body (RFC 9639 §9.2.3-9.2.6)."""
    if br.read(1):
        raise ValueError("FLAC subframe pad bit set")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    ebps = bps - wasted
    if ebps <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if ftype == 0:  # CONSTANT
        v = br.read_signed_array(1, ebps)[0]
        x = np.full(block_size, v, dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        x = br.read_signed_array(block_size, ebps)
    elif 8 <= ftype <= 12:  # FIXED, order 0-4
        order = ftype - 8
        warm = br.read_signed_array(order, ebps)
        res = _flac_residual(br, block_size, order)
        x = _flac_unfix(warm, res, order)
    elif ftype >= 32:  # LPC, order 1-32
        order = (ftype & 0x1F) + 1
        warm = br.read_signed_array(order, ebps)
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = br.read_signed_array(1, 5)[0]
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = br.read_signed_array(order, prec).tolist()
        res = _flac_residual(br, block_size, order)
        x = _flac_unlpc(warm, res, coefs, int(shift))
    else:
        raise ValueError("reserved FLAC subframe type")
    return x << wasted if wasted else x


def _flac_frame_header(br: _FlacBits, info: dict) -> tuple[int, int, int, int]:
    """Frame header -> (block_size, sample_rate, channel_assignment,
    bits_per_sample); raises on reserved/invalid fields (RFC 9639 §9.1).
    The coded
    frame/sample number (UTF-8-style, up to 36 bits) is read and
    discarded — frames are decoded in stream order."""
    sync = br.read(14)
    if sync != 0x3FFE:
        raise ValueError("lost FLAC frame sync")
    if br.read(1):
        raise ValueError("reserved FLAC frame bit set")
    br.read(1)  # blocking strategy (fixed/variable): informational here
    bs_code = br.read(4)
    sr_code = br.read(4)
    chan_code = br.read(4)
    ss_code = br.read(3)
    if br.read(1):
        raise ValueError("reserved FLAC frame bit set")
    # coded number: leading-ones count picks the byte length, like UTF-8
    lead = br.read(8)
    extra = 0
    if lead >= 0xC0:
        b = lead
        while b & 0x40:
            extra += 1
            b <<= 1
    for _ in range(extra):
        if br.read(8) & 0xC0 != 0x80:
            raise ValueError("bad FLAC coded number continuation")
    if bs_code == 0:
        raise ValueError("reserved FLAC block size code")
    if bs_code == 1:
        block_size = 192
    elif bs_code <= 5:
        block_size = 576 << (bs_code - 2)
    elif bs_code == 6:
        block_size = br.read(8) + 1
    elif bs_code == 7:
        block_size = br.read(16) + 1
    else:
        block_size = 256 << (bs_code - 8)
    if sr_code == 0:
        rate = info["sample_rate"]
    elif sr_code <= 11:
        rate = _FLAC_FRAME_RATES[sr_code]
    elif sr_code == 12:
        rate = br.read(8) * 1000
    elif sr_code == 13:
        rate = br.read(16)
    elif sr_code == 14:
        rate = br.read(16) * 10
    else:
        raise ValueError("invalid FLAC sample rate code")
    ss_map = {0: info["bits_per_sample"], 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
    if ss_code not in ss_map:
        raise ValueError("reserved FLAC sample size code")
    if chan_code > 10:
        raise ValueError("reserved FLAC channel assignment")
    br.read(8)  # header CRC-8 (not re-verified: sync + field checks gate)
    return block_size, rate, chan_code, ss_map[ss_code]


# Byte budget for the pure-NumPy FLAC correctness tier: the Rice quotient
# scan is per-sample Python, so an adversarial multi-hundred-MB blob on an
# untrusted corpus would pin an executor. Past the cap this tier declines
# (header-real metadata still reports). Knob, not a constant.
FLAC_NP_MAX_BYTES = 16_000_000


def decode_flac_np(data: bytes) -> tuple[np.ndarray, int] | None:
    """Pure NumPy FLAC decode -> (mono float64 samples in [-1, 1],
    sample_rate), or None outside scope (truncated streams, reserved
    codes, blobs past ``FLAC_NP_MAX_BYTES``). FLAC is a fully public spec
    (RFC 9639) and LOSSLESS, so this is real PCM, not an approximation:
    frames carry constant / verbatim / fixed-order / LPC subframes with
    Rice-coded residuals; fixed predictors invert as vectorized repeated
    cumulative sums, LPC inverts in a plain-int loop (the shift sits
    inside the recursion), stereo decorrelation (left/right/mid-side)
    reconstructs exact channels, wasted bits shift back in. Multi-channel
    downmixes by mean, normalized at 2^(bps-1) like :func:`decode_wav_np`.

    This is the correctness tier of the audio ladder (the analogue of the
    baseline-JPEG decoder): per-sample Python in the Rice scan, so
    throughput is ~1 s per million samples — real features for test /
    sampled slices, header-real metadata for the full corpus sweep.
    Never raises on malformed bytes."""
    try:
        if len(data) > FLAC_NP_MAX_BYTES:
            return None
        info = parse_flac_header(data)
        if info is None:
            return None
        # skip metadata blocks to the first audio frame
        pos = 4
        while pos + 4 <= len(data):
            hdr = data[pos]
            blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
            pos += 4 + blen
            if hdr & 0x80:
                break
        br = _FlacBits(data, pos)
        total = info["total_samples"]
        chans: list[list[np.ndarray]] = [[] for _ in range(info["channels"])]
        got = 0
        while (total is None or got < total) and br.pos + 32 <= len(br.bits):
            block_size, rate, chan_code, bps = _flac_frame_header(br, info)
            if chan_code <= 7:  # independent channels
                n_sub = chan_code + 1
                subs = [_flac_subframe(br, block_size, bps) for _ in range(n_sub)]
            else:  # stereo decorrelation: the DIFFERENCE channel carries +1 bit
                side_idx = 1 if chan_code in (8, 10) else 0
                subs = [
                    _flac_subframe(
                        br, block_size, bps + (1 if i == side_idx else 0)
                    )
                    for i in range(2)
                ]
                if chan_code == 8:  # left/side: right = left - side
                    subs = [subs[0], subs[0] - subs[1]]
                elif chan_code == 9:  # right/side: left = right + side
                    subs = [subs[1] + subs[0], subs[1]]
                else:  # mid/side (mid = (l+r)>>1 with side's low bit)
                    mid2 = (subs[0] << 1) | (subs[1] & 1)
                    subs = [(mid2 + subs[1]) >> 1, (mid2 - subs[1]) >> 1]
            if len(subs) != info["channels"]:
                return None
            br.align()
            br.read(16)  # frame footer CRC-16
            for ci, s in enumerate(subs):
                chans[ci].append(s)
            got += block_size
        if got == 0:
            return None
        full = np.stack([np.concatenate(c) for c in chans])
        if total is not None:
            if got < total:
                return None  # truncated: fewer samples than STREAMINFO
            full = full[:, :total]
        mono = full.mean(axis=0)
        return mono / float(1 << (info["bits_per_sample"] - 1)), int(
            info["sample_rate"]
        )
    except Exception:
        return None


def parse_ogg_header(data: bytes) -> dict | None:
    """Header-real Ogg metadata for the two common codecs — no decode.
    Reads the first page's ("OggS" capture pattern, RFC 3533 §6) first
    packet: a Vorbis identification header (Vorbis I spec §4.2.2: packet
    type 1 + "vorbis", channels u8, sample rate u32le) or an OpusHead
    (RFC 7845 §5.1: channels u8, pre-skip u16le, input rate u32le), and
    derives duration from the LAST page's granule position of the same
    logical stream — total PCM samples for Vorbis (spec §A.2), a 48 kHz
    count minus pre-skip for Opus (RFC 7845 §4). Never raises."""
    import struct

    try:
        if data[:4] != b"OggS" or len(data) < 58:
            return None
        serial = struct.unpack_from("<I", data, 14)[0]
        n_segs = data[26]
        payload = 27 + n_segs
        pkt = data[payload : payload + 30]
        codec = rate = channels = None
        nominal = pre_skip = 0
        gran_rate = None  # the clock the granule counts in
        if len(pkt) >= 16 and pkt[0] == 1 and pkt[1:7] == b"vorbis":
            codec = "vorbis"
            channels = pkt[11]
            rate = struct.unpack_from("<I", pkt, 12)[0]
            nominal = (
                struct.unpack_from("<i", pkt, 20)[0] if len(pkt) >= 24 else 0
            )
            gran_rate = rate
        elif len(pkt) >= 19 and pkt[:8] == b"OpusHead":
            codec = "opus"
            channels = pkt[9]
            pre_skip = struct.unpack_from("<H", pkt, 10)[0]
            rate = struct.unpack_from("<I", pkt, 12)[0]  # INPUT rate, info
            gran_rate = 48000  # Opus granules always count 48 kHz samples
        if codec is None or not channels or not rate:
            return None
        # last granule of THIS stream: scan pages from the end (a capture
        # pattern inside packet bytes fails the version/serial checks)
        granule = None
        pos = len(data)
        while granule is None and pos > 4:
            pos = data.rfind(b"OggS", 0, pos)
            if pos < 0:
                break
            if (
                pos + 27 <= len(data)
                and data[pos + 4] == 0  # stream_structure_version
                and struct.unpack_from("<I", data, pos + 14)[0] == serial
            ):
                g = struct.unpack_from("<q", data, pos + 6)[0]
                if g >= 0:
                    granule = g
        total = None
        if granule is not None:
            total = max(0, int(granule) - pre_skip)
        return {
            "format": "ogg",
            "codec": codec,
            "sample_rate": int(rate),
            "channels": int(channels),
            "bitrate_nominal": int(nominal) or None,
            "pre_skip": int(pre_skip) if codec == "opus" else None,
            "total_samples": total,
            "duration_ms": (
                None if total is None else int(total * 1000 // gran_rate)
            ),
        }
    except Exception:
        return None


_ADTS_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
               16000, 12000, 11025, 8000, 7350)


def parse_adts_header(data: bytes) -> dict | None:
    """Header-real ADTS AAC metadata — no decode. Validates the 12-bit
    sync + fixed-header fields (ISO/IEC 14496-3 §1.A.2.2), requires the
    next frame to sync too (the same false-sync guard as MP3), then walks
    the frame chain: each AAC frame carries 1024 PCM samples per channel,
    so duration = frames x 1024 / rate. Never raises."""
    try:
        n = len(data)

        def frame_at(p):
            if p + 7 > n or data[p] != 0xFF or (data[p + 1] & 0xF6) != 0xF0:
                return None
            sr_idx = (data[p + 2] >> 2) & 0xF
            if sr_idx >= len(_ADTS_RATES):
                return None
            chan = ((data[p + 2] & 0x1) << 2) | (data[p + 3] >> 6)
            flen = ((data[p + 3] & 0x3) << 11) | (data[p + 4] << 3) | (
                data[p + 5] >> 5
            )
            if flen < 7:
                return None
            return {
                "profile": (data[p + 2] >> 6) + 1,
                "sample_rate": _ADTS_RATES[sr_idx],
                "channels": chan,
                "frame_len": flen,
            }

        first = frame_at(0)
        if first is None:
            return None
        nxt = first["frame_len"]
        if not ((nxt <= n and nxt + 7 > n) or frame_at(nxt) is not None):
            return None
        frames, pos = 0, 0
        while pos + 7 <= n:
            f = frame_at(pos)
            if f is None:
                break
            frames += 1
            pos += f["frame_len"]
        rate = first["sample_rate"]
        return {
            "format": "aac_adts",
            "profile": first["profile"],
            "sample_rate": rate,
            "channels": first["channels"],
            "frames": frames,
            "duration_ms": int(frames * 1024 * 1000 // rate),
        }
    except Exception:
        return None


def parse_mp4_header(data: bytes) -> dict | None:
    """Header-real ISO-BMFF (MP4 / M4A / MOV) metadata — no decode.
    Walks the box tree (ISO/IEC 14496-12: u32 size + fourcc, u64
    largesize when size == 1): duration from ``moov/mvhd``
    (timescale + duration, version 0/1 layouts), channels + sample rate
    from the first ``mp4a`` sample entry under ``stbl/stsd``
    (AudioSampleEntry: channelcount at payload offset 16, 16.16-fixed
    samplerate at 24), and presentation width/height from the first
    ``tkhd`` with nonzero dims (16.16-fixed, the video-track signal
    :func:`video_features` reports). Never raises on malformed bytes."""
    import struct

    if len(data) < 12 or data[4:8] != b"ftyp":
        return None
    containers = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}
    found: dict = {}

    def walk(lo: int, hi: int, depth: int) -> None:
        pos = lo
        while pos + 8 <= hi and depth < 8:
            size = struct.unpack(">I", data[pos : pos + 8][:4])[0]
            btype = data[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:
                if pos + 16 > hi:
                    return
                (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
                body = pos + 16
            elif size == 0:
                size = hi - pos  # box extends to end of file
            if size < 8 or pos + size > hi:
                return
            if btype in containers:
                walk(body, pos + size, depth + 1)
            elif btype == b"mvhd" and "duration" not in found:
                v = data[body]
                if v == 1 and body + 32 <= hi:
                    (ts,) = struct.unpack(">I", data[body + 20 : body + 24])
                    (dur,) = struct.unpack(">Q", data[body + 24 : body + 32])
                elif v == 0 and body + 20 <= hi:
                    ts, dur = struct.unpack(
                        ">II", data[body + 12 : body + 20]
                    )
                else:
                    return
                if ts:
                    found["duration"] = (int(dur), int(ts))
            elif btype == b"tkhd" and "width" not in found:
                # track width/height: 16.16 fixed at the end of the box
                # (v0 payload offset 76, v1 offset 88 per ISO 14496-12)
                v = data[body]
                woff = body + (88 if v == 1 else 76)
                if woff + 8 <= pos + size:
                    tw, th = struct.unpack(">II", data[woff : woff + 8])
                    if tw and th:
                        found["width"] = tw >> 16
                        found["height"] = th >> 16
            elif btype == b"stsd" and "rate" not in found:
                # version+flags(4) + entry_count(4), then sample entries
                e = body + 8
                while e + 8 <= pos + size:
                    (esz,) = struct.unpack(">I", data[e : e + 4])
                    if esz < 8:
                        break
                    if data[e + 4 : e + 8] == b"mp4a" and e + 36 <= hi:
                        (chans,) = struct.unpack(
                            ">H", data[e + 24 : e + 26]
                        )
                        (rate_fx,) = struct.unpack(
                            ">I", data[e + 32 : e + 36]
                        )
                        found["rate"] = rate_fx >> 16
                        found["channels"] = chans
                    e += esz
            pos += size

    try:
        walk(0, len(data), 0)
        if "duration" not in found:
            return None
        dur, ts = found["duration"]
        rate = found.get("rate")
        return {
            "format": "mp4",
            "sample_rate": int(rate) if rate else None,
            "channels": int(found["channels"]) if rate else None,
            "duration_ms": int(dur * 1000 // ts),
            "total_samples": (
                int(dur * rate // ts) if rate else None
            ),
            "width": found.get("width"),
            "height": found.get("height"),
        }
    except Exception:
        return None


def parse_audio_header(data: bytes) -> dict | None:
    """Sniff + parse header-real metadata for the compressed audio
    formats (MP3 / FLAC / Ogg-Vorbis / ADTS-AAC / ISO-BMFF M4A) — the
    dispatch :func:`audio_features` uses for non-WAV blobs. Returns None
    for unrecognized bytes. FLAC additionally decodes to real PCM through
    :func:`decode_flac_np`; the lossy codecs' decode-derived columns stay
    NULL-tier (MP3/Vorbis/AAC synthesis needs a real decoder library)."""
    flac = parse_flac_header(data)
    if flac is not None:
        return flac
    ogg = parse_ogg_header(data)
    if ogg is not None:
        return ogg
    mp4 = parse_mp4_header(data)
    if mp4 is not None:
        return mp4
    adts = parse_adts_header(data)
    if adts is not None:
        return adts
    return parse_mp3_header(data)


def audio_features(
    df: DataFrame, content_col: str = "content", id_col: str = "asset_id"
) -> DataFrame:
    """Real per-asset audio features from audio bytes -> (id, n_bytes,
    sample_rate, n_samples, duration_ms, rms, peak). WAV/PCM is decoded
    for real in any environment (:func:`decode_wav_np`), and FLAC decodes
    to REAL lossless PCM through the pure-NumPy tier
    (:func:`decode_flac_np`, r11) up to its byte budget; remaining
    compressed blobs (MP3 r10; Ogg-Vorbis / ADTS-AAC / oversize FLAC r11)
    get HEADER-real sample_rate/duration_ms (+ exact n_samples where the
    container records it: FLAC total-samples, Ogg granule) via
    :func:`parse_audio_header` with decode-derived columns NULL;
    anything else reports NULL feature columns (never fake audio) — the
    same tier contract as image mean_luma. Arrow-batched mapInPandas,
    blobs never touch the driver."""
    out_schema = (
        f"{id_col} string, n_bytes long, sample_rate int, n_samples long, "
        "duration_ms long, rms double, peak double"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf[content_col].notna()]
            if pdf.empty:
                continue
            rows = []
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                data = bytes(content)
                dec = decode_wav_np(data)
                if dec is None:
                    dec = decode_aiff_np(data)
                if dec is None:
                    dec = decode_flac_np(data)
                if dec is None:
                    hdr = parse_audio_header(data)
                    if hdr is not None:
                        rows.append(
                            (str(aid), len(data), hdr["sample_rate"],
                             hdr.get("total_samples"),
                             hdr["duration_ms"], None, None)
                        )
                    else:
                        rows.append(
                            (str(aid), len(data), None, None, None, None, None)
                        )
                    continue
                x, rate = dec
                rows.append(
                    (
                        str(aid),
                        len(data),
                        rate,
                        len(x),
                        int(len(x) * 1000 // rate),
                        float(np.sqrt(np.mean(x * x))),
                        float(np.abs(x).max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_bytes", "sample_rate", "n_samples",
                    "duration_ms", "rms", "peak",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(extract, out_schema)


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


def video_features(
    df: DataFrame, content_col: str = "content", id_col: str = "asset_id"
) -> DataFrame:
    """Container-real per-asset video metadata -> (id, n_bytes, format,
    width, height, duration_ms). ISO-BMFF blobs (MP4/MOV) report bytes-
    derived dims (first tkhd with nonzero presentation size) and mvhd
    duration via :func:`parse_mp4_header`; unrecognized blobs report NULL
    metadata columns. Frame DECODE stays a declared stub
    (:func:`sample_frames` — H.264/VP9 entropy decode needs a real
    codec); the Spark-side plumbing (schema, Arrow batches, 1->N
    explode) is real and tested. Arrow-batched mapInPandas, blobs never
    touch the driver."""
    out_schema = (
        f"{id_col} string, n_bytes long, format string, width int, "
        "height int, duration_ms long"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf[content_col].notna()]
            if pdf.empty:
                continue
            rows = []
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                data = bytes(content)
                hdr = parse_mp4_header(data)
                if hdr is not None and hdr.get("width"):
                    rows.append(
                        (str(aid), len(data), hdr["format"], hdr["width"],
                         hdr["height"], hdr["duration_ms"])
                    )
                else:
                    rows.append(
                        (str(aid), len(data), None, None, None, None)
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_bytes", "format", "width", "height",
                         "duration_ms"],
            )

    return df.select(id_col, content_col).mapInPandas(extract, out_schema)


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


# -- ID3 tags (MP3 metadata content, beyond the frame-header tier) -----------

_ID3V2_TEXT_FRAMES = {
    # v2.3/2.4 four-char ids -> output keys; TYER (v2.3) and TDRC (v2.4)
    # both land on "year" (first four chars of the timestamp)
    "TIT2": "title", "TPE1": "artist", "TALB": "album",
    "TYER": "year", "TDRC": "year", "TCON": "genre", "TRCK": "track",
}
_ID3V22_TEXT_FRAMES = {
    "TT2": "title", "TP1": "artist", "TAL": "album",
    "TYE": "year", "TCO": "genre", "TRK": "track",
}
_ID3_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def _id3_text(payload: bytes) -> str | None:
    if not payload:
        return None
    enc = _ID3_ENCODINGS.get(payload[0])
    if enc is None:
        return None
    txt = payload[1:].decode(enc, "replace").strip("\x00").strip()
    return txt or None


def _syncsafe(b: bytes) -> int:
    return ((b[0] & 0x7F) << 21) | ((b[1] & 0x7F) << 14) | (
        (b[2] & 0x7F) << 7) | (b[3] & 0x7F)


def parse_id3_tags(data: bytes) -> dict | None:
    """Extract ID3 tag CONTENT (title/artist/album/year/genre/track) from
    an MP3 blob: ID3v2.2/2.3/2.4 text frames (all four spec encodings),
    overlaid on an ID3v1 trailer when present (v2 wins per field — it is
    the richer, newer tag). Returns None when neither tag exists; never
    raises on hostile bytes. ID3v1 genre is surfaced as its numeric
    ``genre_id`` (the 80+ name table is an external registry; a wrong
    name is worse than an id). Public specs: id3.org ID3v1, ID3v2.3/2.4
    informal standards.
    """
    try:
        out: dict = {}
        n = len(data)
        if n >= 128 and data[-128:-125] == b"TAG":
            t = data[-128:]

            def v1field(a, b):
                s = t[a:b].split(b"\x00", 1)[0].decode("latin-1", "replace").strip()
                return s or None

            out = {
                "title": v1field(3, 33), "artist": v1field(33, 63),
                "album": v1field(63, 93), "year": v1field(93, 97),
                "genre_id": t[127],
            }
            # ID3v1.1 track: comment[28]==0 and comment[29]!=0
            if t[125] == 0 and t[126] != 0:
                out["track"] = str(t[126])
        if data[:3] == b"ID3" and n >= 10:
            major = data[3]
            tag_size = _syncsafe(data[6:10])
            pos = 10
            # Extended header flag is 0x40 (0x10 is the v2.4 footer, which
            # sits AFTER the frames and is excluded from tag_size — nothing
            # to skip here). v2.4 ext size is syncsafe and includes itself;
            # v2.3 ext size is a plain 4-byte int excluding the size field.
            # v2.2 has no extended header (0x40 there means compression).
            if major >= 3 and data[5] & 0x40 and n >= 14:
                if major >= 4:
                    pos = 10 + max(_syncsafe(data[10:14]), 6)
                else:
                    pos = 14 + int.from_bytes(data[10:14], "big")
            end = min(n, 10 + tag_size)
            while pos + 6 <= end:
                if major == 2:
                    fid = data[pos : pos + 3].decode("latin-1", "replace")
                    fsize = int.from_bytes(data[pos + 3 : pos + 6], "big")
                    hdr_len = 6
                    key = _ID3V22_TEXT_FRAMES.get(fid)
                else:
                    if pos + 10 > end:
                        break
                    fid = data[pos : pos + 4].decode("latin-1", "replace")
                    raw = data[pos + 4 : pos + 8]
                    fsize = _syncsafe(raw) if major >= 4 else int.from_bytes(raw, "big")
                    hdr_len = 10
                    key = _ID3V2_TEXT_FRAMES.get(fid)
                if not fid.strip("\x00") or fsize < 0:
                    break
                payload = data[pos + hdr_len : pos + hdr_len + fsize]
                if key and len(payload) == fsize:
                    txt = _id3_text(payload)
                    if txt:
                        out[key] = txt[:4] if key == "year" and len(txt) > 4 else txt
                pos += hdr_len + fsize
        return out or None
    except Exception:
        return None


def audio_tags(df: DataFrame, content_col: str = "content",
               id_col: str = "asset_id") -> DataFrame:
    """Per-asset ID3 tag columns -> (id, title, artist, album, year,
    track, genre, genre_id); all NULL when the blob carries no tag.
    Arrow-batched mapInPandas, blobs never touch the driver — the same
    plumbing contract as audio_features."""
    out_schema = (
        f"{id_col} string, title string, artist string, album string, "
        "year string, track string, genre string, genre_id int"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf[content_col].notna()]
            if pdf.empty:
                continue
            rows = []
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                tags = parse_id3_tags(bytes(content)) or {}
                rows.append((
                    str(aid), tags.get("title"), tags.get("artist"),
                    tags.get("album"), tags.get("year"), tags.get("track"),
                    tags.get("genre"), tags.get("genre_id"),
                ))
            yield pd.DataFrame(rows, columns=[
                id_col, "title", "artist", "album", "year", "track",
                "genre", "genre_id"])

    return df.select(id_col, content_col).mapInPandas(extract, schema=out_schema)
