"""Multimodal plumbing tests: schema, batch shapes (incl. empty partitions
and nulls), 1->N frame explode, determinism of the stubbed decode against
driver-side recompute."""

import hashlib

import numpy as np
from pyspark.sql import Row, functions as F

from semadb_spark.operators import multimodal as mm


def _assets(spark, n=20):
    rows = [
        Row(
            asset_id=f"a{i}",
            media_type="image" if i % 2 == 0 else "video",
            content=f"payload-{i}".encode() if i % 5 != 0 else None,
            meta=Row(
                width=None,
                height=None,
                sample_rate=16000,
                duration_ms=1000 * (i % 4),
                codec="fake",
            ),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, mm.asset_schema())


def test_asset_schema_roundtrip(spark, tmp_path):
    df = _assets(spark)
    path = str(tmp_path / "assets")
    df.write.parquet(path)
    back = spark.read.parquet(path)
    assert back.schema["content"].dataType.typeName() == "binary"
    assert back.count() == 20
    # column pruning: a meta-only projection must not read content
    plan = back.select("asset_id", "meta.codec")._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan


def test_image_features_deterministic_and_null_safe(spark):
    df = _assets(spark).repartition(8)  # forces some empty/partial batches
    feats = {r.asset_id: r for r in mm.image_features(df).collect()}
    assert len(feats) == 16  # nulls dropped (4 of 20)
    data = b"payload-1"
    r = feats["a1"]
    assert r.content_md5 == hashlib.md5(data).hexdigest()
    assert r.n_bytes == len(data)
    img = mm.decode_image(data)
    assert (r.height, r.width) == img.shape
    assert abs(r.mean_luma - img.mean() / 255.0) < 1e-9
    # stable across runs
    again = {r.asset_id: r for r in mm.image_features(df).collect()}
    assert again["a1"] == r


def test_resize_shapes(spark):
    df = _assets(spark)
    out = {r.asset_id: bytes(r.content) for r in mm.resize_images(df, 8, 6).collect()}
    assert len(out) == 16
    assert all(len(v) == 8 * 6 for v in out.values())
    # deterministic content
    img = mm.decode_image(b"payload-2")
    ys = (np.arange(6) * img.shape[0] // 6).clip(0, img.shape[0] - 1)
    xs = (np.arange(8) * img.shape[1] // 8).clip(0, img.shape[1] - 1)
    assert out["a2"] == img[np.ix_(ys, xs)].tobytes()


def test_sample_frames_one_to_many(spark):
    df = _assets(spark)
    frames = mm.sample_frames(df, every_ms=500).collect()
    # duration_ms = 1000*(i%4); n_frames = dur/500; nulls dropped
    expected = sum(
        (1000 * (i % 4)) // 500 for i in range(20) if i % 5 != 0
    )
    assert len(frames) == expected
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r)
    a3 = sorted(by_asset["a3"], key=lambda r: r.frame_idx)  # dur 3000 -> 6 frames
    assert [r.frame_ms for r in a3] == [0, 500, 1000, 1500, 2000, 2500]
    assert a3[2].frame_md5 == hashlib.md5(b"payload-3:2").hexdigest()
    # zero-duration assets emit no frames
    assert "a4" not in by_asset


def test_audio_stats_expressions(spark):
    df = _assets(spark)
    stats = {r.asset_id: r for r in mm.audio_stats(df).collect()}
    r = stats["a2"]  # dur 2000ms, sr 16000, content 9 bytes
    assert r.n_bytes == 9 and r.implied_samples == 4
    assert abs(r.fill_ratio - 4 / (16000 * 2.0)) < 1e-12
    assert stats["a4"].fill_ratio is None  # zero duration -> null, not div0


def test_repartition_for_media(spark):
    df = _assets(spark, 50)
    out = mm.repartition_for_media(df, target_batch_rows=10, approx_rows=50)
    assert out.rdd.getNumPartitions() >= 5


def test_parse_image_header_real_bytes(spark):
    """Header parsing gives REAL bytes-derived format/width/height for the
    public formats with no decoder library present (PIL absent in this
    environment): PNG IHDR, GIF screen descriptor, JPEG SOF walk (past
    APP0/DQT segments), BMP info header. Text blobs stay on the fake path
    with format null."""
    import struct

    from semadb_spark.operators import multimodal as mm

    png = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 640, 480) + b"\x08\x00\x00\x00\x00" + b"\x00" * 4
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    # JPEG: SOI, APP0 (16 bytes), DQT (dummy 8 bytes), SOF0 frame header
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xdb" + struct.pack(">H", 8) + b"\x00" * 6
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 1080, 1920) + b"\x03" + b"\x00" * 9
    )
    # BMP file header (14 bytes) + BITMAPINFOHEADER (DIB size 40)
    bmp = (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 40)
        + struct.pack("<ii", 64, -128) + b"\x00" * 8
    )
    # BITMAPCOREHEADER variant (DIB size 12, unsigned 16-bit dims)
    bmp_core = (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 12)
        + struct.pack("<HH", 48, 32) + b"\x00" * 8
    )
    assert mm.parse_image_header(png) == {"format": "png", "width": 640, "height": 480}
    assert mm.parse_image_header(gif) == {"format": "gif", "width": 320, "height": 200}
    assert mm.parse_image_header(jpeg) == {"format": "jpeg", "width": 1920, "height": 1080}
    assert mm.parse_image_header(bmp) == {"format": "bmp", "width": 64, "height": 128}
    assert mm.parse_image_header(bmp_core) == {"format": "bmp", "width": 48, "height": 32}
    assert mm.parse_image_header(b"plain text, not an image") is None
    assert mm.parse_image_header(b"\xff\xd8\xff\xd9") is None  # empty JPEG
    # a text blob that happens to start "BM" must NOT sniff as BMP (the DIB
    # header size field at bytes 14..18 gates the claim)
    assert mm.parse_image_header(b"BMW dealers report record sales this y") is None

    # end-to-end through the Spark kernel: real images report parsed dims
    # and format; a text blob keeps the deterministic fake (format null)
    rows = [("png1", png), ("gif1", gif), ("jpg1", jpeg), ("txt1", b"hello world")]
    df = spark.createDataFrame(rows, "asset_id string, content binary")
    got = {r["asset_id"]: r for r in mm.image_features(df).collect()}
    assert (got["png1"]["format"], got["png1"]["width"], got["png1"]["height"]) == ("png", 640, 480)
    assert (got["gif1"]["format"], got["gif1"]["width"], got["gif1"]["height"]) == ("gif", 320, 200)
    assert (got["jpg1"]["format"], got["jpg1"]["width"], got["jpg1"]["height"]) == ("jpeg", 1920, 1080)
    assert got["txt1"]["format"] is None
    # fake dims for unparseable blobs stay the hash-derived contract the
    # DuckDB oracle predicts
    _, h64 = mm._hash64(b"hello world")
    assert got["txt1"]["width"] == 16 + h64 % 64
    assert got["txt1"]["height"] == 16 + (h64 >> 6) % 64
    if mm.USING_FAKE_DECODE:
        assert got["png1"]["mean_luma"] is None  # no decoder: no fake luma


def _png_bytes(px: np.ndarray, color_type: int, filters: list[int],
               plte: np.ndarray | None = None) -> bytes:
    """Hand-rolled PNG encoder for decoder tests: applies the REQUESTED
    per-row filter forward (spec §9), so every filter path in
    decode_png_np gets exercised against an independently constructed
    pixel array."""
    import struct
    import zlib

    h, w = px.shape[:2]
    ch = px.shape[2] if px.ndim == 3 else 1
    flat = px.reshape(h, w * ch).astype(np.int32)
    bpp = ch
    lines = []
    prev = np.zeros(w * ch, dtype=np.int32)
    for y, ft in zip(range(h), filters):
        cur = flat[y]
        if ft == 0:
            enc = cur
        elif ft == 1:
            a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = (cur - a) % 256
        elif ft == 2:
            enc = (cur - prev) % 256
        elif ft == 3:
            a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = (cur - ((a + prev) >> 1)) % 256
        else:  # paeth
            a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            c = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a,
                            np.where(pb <= pc, prev, c))
            enc = (cur - pred) % 256
        lines.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    out += chunk(b"IDAT", zlib.compress(b"".join(lines)))
    return out + chunk(b"IEND", b"")


def test_decode_png_np_all_filters_and_color_types():
    """Pure-NumPy PNG decode is REAL pixels: every scanline filter
    (None/Sub/Up/Average/Paeth) and color type (gray, RGB, palette,
    gray+alpha, RGBA) round-trips a known array exactly."""
    rng = np.random.default_rng(42)
    filters = [0, 1, 2, 3, 4, 4, 3, 2]
    # grayscale (type 0)
    g = rng.integers(0, 256, size=(8, 11), dtype=np.uint8)
    got = mm.decode_png_np(_png_bytes(g, 0, filters))
    np.testing.assert_array_equal(got, g)
    # RGB (type 2): decoder returns ITU-R 601 integer luma
    rgb = rng.integers(0, 256, size=(8, 7, 3), dtype=np.uint8)
    want = mm._luma(rgb)
    np.testing.assert_array_equal(mm.decode_png_np(_png_bytes(rgb, 2, filters)), want)
    # RGBA (type 6): alpha dropped
    rgba = rng.integers(0, 256, size=(8, 5, 4), dtype=np.uint8)
    np.testing.assert_array_equal(
        mm.decode_png_np(_png_bytes(rgba, 6, filters)), mm._luma(rgba)
    )
    # gray+alpha (type 4): first channel
    ga = rng.integers(0, 256, size=(8, 6, 2), dtype=np.uint8)
    np.testing.assert_array_equal(
        mm.decode_png_np(_png_bytes(ga, 4, filters)), ga[..., 0]
    )
    # palette (type 3)
    plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(8, 9), dtype=np.uint8)
    np.testing.assert_array_equal(
        mm.decode_png_np(_png_bytes(idx, 3, filters, plte=plte)),
        mm._luma(plte[idx]),
    )
    # out-of-scope variants decline cleanly (fall through to the fake)
    assert mm.decode_png_np(b"\x89PNG\r\n\x1a\x00garbage") is None
    bad_depth = bytearray(_png_bytes(g, 0, filters))
    bad_depth[24] = 16  # bit depth field inside IHDR
    assert mm.decode_png_np(bytes(bad_depth)) is None


def _bmp_bytes(px_rgb: np.ndarray, bpp: int = 24, top_down: bool = False,
               plte: np.ndarray | None = None) -> bytes:
    import struct

    h, w = px_rgb.shape[:2]
    row_raw = w * bpp // 8
    row_pad = (row_raw + 3) & ~3
    pal = b""
    if bpp == 8:
        pal = b"".join(
            bytes([int(b), int(g), int(r), 0]) for r, g, b in plte
        )
    offset = 14 + 40 + len(pal)
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        if bpp == 8:
            line = px_rgb[y].astype(np.uint8).tobytes()
        elif bpp == 24:
            line = px_rgb[y, :, ::-1].astype(np.uint8).tobytes()  # BGR
        else:  # 32: BGRA
            bgra = np.concatenate(
                [px_rgb[y, :, ::-1], np.full((w, 1), 255, np.uint8)], axis=1
            )
            line = bgra.astype(np.uint8).tobytes()
        rows.append(line + b"\x00" * (row_pad - row_raw))
    body = b"".join(rows)
    hh = -h if top_down else h
    return (b"BM" + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
            + struct.pack("<IiiHHIIiiII", 40, w, hh, 1, bpp, 0, len(body),
                          2835, 2835, 0, 0) + pal + body)


def test_decode_bmp_np_variants():
    """BMP decode handles 24-bit bottom-up (the default on-disk layout),
    top-down (negative height), 4-byte row padding, 32-bit BGRA, and
    8-bit palette."""
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)  # w=5 -> padded rows
    want = mm._luma(rgb)
    np.testing.assert_array_equal(mm.decode_bmp_np(_bmp_bytes(rgb, 24)), want)
    np.testing.assert_array_equal(
        mm.decode_bmp_np(_bmp_bytes(rgb, 24, top_down=True)), want
    )
    np.testing.assert_array_equal(mm.decode_bmp_np(_bmp_bytes(rgb, 32)), want)
    plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(6, 5), dtype=np.uint8)
    np.testing.assert_array_equal(
        mm.decode_bmp_np(_bmp_bytes(idx, 8, plte=plte)), mm._luma(plte[idx])
    )
    # compressed (BI_RLE8) declines
    import struct
    raw = bytearray(_bmp_bytes(rgb, 24))
    raw[30:34] = struct.pack("<I", 1)
    assert mm.decode_bmp_np(bytes(raw)) is None


def test_image_features_real_luma_for_png_bmp(spark):
    """image_features reports REAL mean_luma for PNG/BMP blobs in this
    PIL-free container (the NumPy decoders), and null luma for
    entropy-coded formats it cannot decode — never fake pixels for a blob
    that parsed as a real image."""
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, size=(9, 9), dtype=np.uint8)
    png = _png_bytes(g, 0, [0, 1, 2, 3, 4, 0, 1, 2, 3])
    rgb = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    bmp = _bmp_bytes(rgb, 24)
    jpeg_hdr = bytes.fromhex("ffd8ffc0001108001100160301220002110103110100ffd9")
    df = spark.createDataFrame(
        [Row(asset_id="png", content=bytearray(png)),
         Row(asset_id="bmp", content=bytearray(bmp)),
         Row(asset_id="jpg", content=bytearray(jpeg_hdr))])
    rows = {r["asset_id"]: r for r in mm.image_features(df).collect()}
    assert rows["png"]["format"] == "png"
    assert abs(rows["png"]["mean_luma"] - float(g.mean()) / 255.0) < 1e-9
    assert rows["bmp"]["format"] == "bmp"
    assert abs(rows["bmp"]["mean_luma"] - float(mm._luma(rgb).mean()) / 255.0) < 1e-9
    assert rows["jpg"]["format"] == "jpeg" and rows["jpg"]["mean_luma"] is None


def test_malformed_blobs_degrade_not_raise(spark):
    """An untrusted corpus WILL contain blobs that pass the magic-byte
    check but are malformed inside (ADVICE r8): a short 8bpp palette with
    pixel indexes past it, a pixel offset at/inside the palette, and a
    corrupt-but-well-framed PNG filter byte. Each must collapse to
    None/luma-null — one bad blob must never fail the Spark task."""
    import struct
    import zlib

    rng = np.random.default_rng(11)
    # 8bpp BMP whose pixels index entry 15 but palette stores 4 entries
    plte4 = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = np.full((4, 4), 15, dtype=np.uint8)
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in plte4)
    offset = 14 + 40 + len(pal)
    body = b"".join(idx[y].tobytes() for y in range(3, -1, -1))
    short_pal = (b"BM" + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
                 + struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 8, 0, len(body),
                               2835, 2835, 0, 0) + pal + body)
    assert mm.decode_bmp_np(short_pal) is None
    # pixel offset <= palette start (offset points INTO the header)
    bad_off = bytearray(short_pal)
    bad_off[10:14] = struct.pack("<I", 14 + 40)  # zero palette entries
    assert mm.decode_bmp_np(bytes(bad_off)) is None
    # well-framed PNG whose first scanline declares filter type 9
    g = rng.integers(0, 256, size=(5, 5), dtype=np.uint8)
    good = _png_bytes(g, 0, [0] * 5)
    raw = bytearray(b"\x09" + g[0].tobytes())
    for y in range(1, 5):
        raw += bytearray(b"\x00" + g[y].tobytes())
    bad_idat = zlib.compress(bytes(raw))
    # splice: reuse header/IEND from the good encoding, swap IDAT body

    def chunk(ctype: bytes, cbody: bytes) -> bytes:
        return (struct.pack(">I", len(cbody)) + ctype + cbody
                + struct.pack(">I", zlib.crc32(ctype + cbody)))

    hdr_end = 8 + 12 + 13  # signature + IHDR chunk
    bad_png = good[:hdr_end] + chunk(b"IDAT", bad_idat) + chunk(b"IEND", b"")
    assert mm.try_decode_image_np(bad_png) is None
    # PNG palette with out-of-range pixel index
    plte2 = rng.integers(0, 256, size=(2, 3), dtype=np.uint8)
    hi_idx = np.full((4, 4), 200, dtype=np.uint8)
    assert mm.decode_png_np(_png_bytes(hi_idx, 3, [0] * 4, plte=plte2)) is None
    # end-to-end: malformed blobs flow through image_features as a task
    df = spark.createDataFrame(
        [Row(asset_id="badbmp", content=bytearray(short_pal)),
         Row(asset_id="badpng", content=bytearray(bad_png))])
    rows = {r["asset_id"]: r for r in mm.image_features(df).collect()}
    # headers parsed (format real) but pixels undecodable -> luma null
    assert rows["badbmp"]["format"] == "bmp"
    assert rows["badbmp"]["mean_luma"] is None
    assert rows["badpng"]["format"] == "png"
    assert rows["badpng"]["mean_luma"] is None


# -- baseline JPEG round-trip (decoder in multimodal, encoder here) ---------

def _jpeg_huff_spec(symbols):
    """Fixed-length canonical table: all symbols at length L (< 2^L of
    them, so the all-ones code is never assigned). The decoder's Annex C
    canonical assignment then maps symbol i -> code i at length L."""
    import math

    syms = sorted(set(symbols))
    L = max(1, math.ceil(math.log2(len(syms) + 1)))
    bits = [0] * 16
    bits[L - 1] = len(syms)
    codes = {s: (L, i) for i, s in enumerate(syms)}
    return bits, syms, codes


class _BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes_stuffed(self):
        bits = self.bits + [1] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


def _fdct_zz(block):
    C = mm._DCT8
    F = C @ (block.astype(np.float64) - 128.0) @ C.T
    return np.round(F).astype(np.int64).ravel()[mm._JPEG_ZIGZAG]


def _block_symbols(coef_zz, pred):
    """-> (symbol stream, new DC pred). Symbols: ("dc", size, diff) and
    ("ac", run<<4|size, value)."""
    syms = []
    diff = int(coef_zz[0]) - pred
    syms.append(("dc", int(abs(diff)).bit_length(), diff))
    run = 0
    for k in range(1, 64):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            syms.append(("ac", 0xF0, None))
            run -= 16
        syms.append(("ac", (run << 4) | int(abs(v)).bit_length(), v))
        run = 0
    if run:
        syms.append(("ac", 0x00, None))  # EOB
    return syms, int(coef_zz[0])


def _jpeg_bytes(y, cbcr=None, restart=0):
    """Hand-rolled baseline JPEG encoder (T.81): grayscale when cbcr is
    None, else 4:2:0 YCbCr with Y sampled 2x2 (cbcr = (cb, cr) at half
    resolution). All-ones quant table (near-lossless), fixed-length
    canonical huffman tables derived from the actually-emitted symbols."""
    import struct

    h, w = y.shape
    if cbcr is None:
        comps = [(1, 1, 1)]
        planes = [y]
    else:
        comps = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]
        planes = [y, cbcr[0], cbcr[1]]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    assert h % (8 * vmax) == 0 and w % (8 * hmax) == 0, "test image dims"
    mcux, mcuy = w // (8 * hmax), h // (8 * vmax)

    # pass 1: per-MCU symbol streams, restart-aware DC reset
    def mcu_stream():
        preds = [0] * len(comps)
        for mcu in range(mcux * mcuy):
            if restart and mcu and mcu % restart == 0:
                yield "RST", None
                preds = [0] * len(comps)
            my, mx = divmod(mcu, mcux)
            out = []
            for ci, (cid, hc, vc) in enumerate(comps):
                p = planes[ci]
                for vy in range(vc):
                    for hx in range(hc):
                        y0, x0 = (my * vc + vy) * 8, (mx * hc + hx) * 8
                        coef = _fdct_zz(p[y0 : y0 + 8, x0 : x0 + 8])
                        syms, preds[ci] = _block_symbols(coef, preds[ci])
                        out.extend(syms)
            yield "MCU", out

    stream = list(mcu_stream())
    dc_syms = [s[1] for _, syms in stream if syms for s in syms if s[0] == "dc"]
    ac_syms = [s[1] for _, syms in stream if syms for s in syms if s[0] == "ac"]
    dc_bits, dc_vals, dc_codes = _jpeg_huff_spec(dc_syms)
    ac_bits, ac_vals, ac_codes = _jpeg_huff_spec(ac_syms or [0x00])

    # pass 2: bit-pack, splitting at restarts
    segs = [_BitWriter()]
    for kind, syms in stream:
        if kind == "RST":
            segs.append(_BitWriter())
            continue
        bw = segs[-1]
        for s in syms:
            if s[0] == "dc":
                ln, code = dc_codes[s[1]]
                bw.write(code, ln)
                size, v = s[1], s[2]
            else:
                ln, code = ac_codes[s[1]]
                bw.write(code, ln)
                size, v = s[1] & 0x0F, s[2]
            if size:
                field = v if v >= 0 else v + (1 << size) - 1
                bw.write(field, size)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xDB, b"\x00" + b"\x01" * 64)  # all-ones quant, id 0
    sofb = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hc, vc in comps:
        sofb += bytes([cid, (hc << 4) | vc, 0])
    out += seg(0xC0, sofb)
    out += seg(0xC4, bytes([0x00] + dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10] + ac_bits) + bytes(ac_vals))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sosb = bytes([len(comps)])
    for cid, _, _ in comps:
        sosb += bytes([cid, 0x00])
    sosb += b"\x00\x3f\x00"
    out += seg(0xDA, sosb)
    for i, bw in enumerate(segs):
        if i:
            out += bytes([0xFF, 0xD0 + ((i - 1) % 8)])
        out += bw.tobytes_stuffed()
    return out + b"\xff\xd9"


def test_decode_jpeg_np_roundtrip():
    """Baseline JPEG decode is REAL pixels: block-constant images (whose
    DCT is exactly integral) round-trip EXACTLY through the all-ones-quant
    encoder; arbitrary images round-trip within DCT rounding (<= 3 LSB)."""
    rng = np.random.default_rng(5)
    # block-constant 24x16 grayscale: exact
    vals = rng.integers(0, 256, size=(3, 2), dtype=np.uint8)
    y = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    got = mm.decode_jpeg_np(_jpeg_bytes(y))
    np.testing.assert_array_equal(got, y)
    # arbitrary 16x24 grayscale: within rounding
    y2 = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    got2 = mm.decode_jpeg_np(_jpeg_bytes(y2))
    assert got2.shape == y2.shape
    assert int(np.abs(got2.astype(int) - y2.astype(int)).max()) <= 3


def test_decode_jpeg_np_color_and_restart():
    """4:2:0 YCbCr: the decoder entropy-decodes the interleaved chroma
    blocks (bitstream position must stay exact) and returns the Y plane;
    restart intervals reset the DC predictors per segment."""
    rng = np.random.default_rng(9)
    y = rng.integers(0, 256, size=(32, 48), dtype=np.uint8)
    cb = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    cr = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    got = mm.decode_jpeg_np(_jpeg_bytes(y, cbcr=(cb, cr)))
    assert got.shape == y.shape
    assert int(np.abs(got.astype(int) - y.astype(int)).max()) <= 3
    # with restart markers every 2 MCUs
    got_r = mm.decode_jpeg_np(_jpeg_bytes(y, cbcr=(cb, cr), restart=2))
    assert int(np.abs(got_r.astype(int) - y.astype(int)).max()) <= 3
    # grayscale with restarts too
    got_g = mm.decode_jpeg_np(_jpeg_bytes(y, restart=3))
    assert int(np.abs(got_g.astype(int) - y.astype(int)).max()) <= 3


def test_decode_jpeg_np_rejects_out_of_scope():
    """Progressive SOF2, truncated scans, and 16-bit quant tables decline
    to None (fall through to the luma-null contract) instead of raising."""
    import struct

    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    good = _jpeg_bytes(y)
    # flip SOF0 -> SOF2 (progressive)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert mm.decode_jpeg_np(prog) is None
    # truncate the scan
    assert mm.decode_jpeg_np(good[: len(good) // 2]) is None
    assert mm.try_decode_image_np(good[: len(good) // 2]) is None
    # 16-bit quant table (Pq=1)
    i = good.index(b"\xff\xdb")
    bad_q = bytearray(good)
    bad_q[i + 4] = 0x10
    assert mm.decode_jpeg_np(bytes(bad_q)) is None


def test_image_features_jpeg_real_luma(spark):
    """image_features reports REAL mean_luma for baseline JPEG blobs via
    the pure-NumPy decoder — the former 'entropy-coded formats report
    null' carve-out now applies only to GIF and out-of-scope JPEGs."""
    rng = np.random.default_rng(13)
    vals = rng.integers(0, 256, size=(2, 2), dtype=np.uint8)
    y = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    blob = _jpeg_bytes(y)
    df = spark.createDataFrame([Row(asset_id="jpg", content=bytearray(blob))])
    rows = {r["asset_id"]: r for r in mm.image_features(df).collect()}
    assert rows["jpg"]["format"] == "jpeg"
    assert rows["jpg"]["width"] == 16 and rows["jpg"]["height"] == 16
    assert abs(rows["jpg"]["mean_luma"] - float(y.mean()) / 255.0) < 1e-9


# -- GIF round-trip (decoder in multimodal, LZW encoder here) ---------------

def _gif_bytes(idx, pal, interlace=False, lct=False, with_gce=True):
    """Hand-rolled GIF89a encoder: literal-only LZW (valid stream, no
    compression) whose table counter mirrors the decoder's, so width
    growth and mid-stream clear codes are exercised for real. ``lct``
    stores the palette as a LOCAL color table and a decoy global one."""
    import struct

    h, w = idx.shape
    n_pal = len(pal)
    assert n_pal & (n_pal - 1) == 0 and n_pal >= 4
    s = n_pal.bit_length() - 2  # 2^(s+1) entries
    min_size = max(2, n_pal.bit_length() - 1)
    clear, eoi = 1 << min_size, (1 << min_size) + 1
    bits = []

    def emit(code, width):
        for i in range(width):
            bits.append((code >> i) & 1)

    width = min_size + 1
    table_len = clear + 2
    emit(clear, width)
    prevset = False
    if interlace:
        order = []
        for st, sp in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order.extend(range(st, h, sp))
        seq = idx[np.asarray(order)].ravel()
    else:
        seq = idx.ravel()
    for v in seq:
        emit(int(v), width)
        if prevset:
            table_len += 1
            if table_len == (1 << width) and width < 12:
                width += 1
            if table_len >= 4094:
                emit(clear, width)
                width = min_size + 1
                table_len = clear + 2
                prevset = False
                continue
        prevset = True
    emit(eoi, width)
    by = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i : i + 8]):
            b |= bit << j
        by.append(b)

    pal_bytes = bytes(int(x) for x in np.asarray(pal, dtype=np.uint8).ravel())
    decoy = bytes(3 * n_pal)  # all-black global table when lct overrides
    out = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | s, 0, 0)
    out += decoy if lct else pal_bytes
    if with_gce:  # graphic control extension: decoder must skip it
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    iflags = (0x40 if interlace else 0) | ((0x80 | s) if lct else 0)
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([iflags])
    if lct:
        out += pal_bytes
    out += bytes([min_size])
    for i in range(0, len(by), 255):
        chunk = by[i : i + 255]
        out += bytes([len(chunk)]) + bytes(chunk)
    return out + b"\x00\x3b"


def test_decode_gif_np_roundtrip():
    """GIF LZW decode is REAL pixels: palette indexes round-trip exactly
    (the literal-only LZW stream still exercises variable code widths and
    mid-stream clears), with interlace de-permutation and local-color-
    table override both pinned."""
    rng = np.random.default_rng(17)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(23, 11), dtype=np.uint8)
    want = mm._luma(pal[idx])
    np.testing.assert_array_equal(mm.decode_gif_np(_gif_bytes(idx, pal)), want)
    np.testing.assert_array_equal(
        mm.decode_gif_np(_gif_bytes(idx, pal, interlace=True)), want
    )
    np.testing.assert_array_equal(
        mm.decode_gif_np(_gif_bytes(idx, pal, lct=True)), want
    )
    # wide image forces code-width growth past min_size+1
    big = rng.integers(0, 16, size=(40, 80), dtype=np.uint8)
    np.testing.assert_array_equal(
        mm.decode_gif_np(_gif_bytes(big, pal)), mm._luma(pal[big])
    )
    # malformed streams decline: truncated LZW, trailer-only, bad index
    full = _gif_bytes(idx, pal)
    assert mm.decode_gif_np(full[: len(full) - 20]) is None
    assert mm.decode_gif_np(b"GIF89a" + full[6:13] + b"\x3b") is None
    assert mm.try_decode_image_np(full[: len(full) - 20]) is None


def test_image_features_gif_real_luma(spark):
    """image_features now reports REAL mean_luma for GIF blobs in the
    PIL-free container — every header format (PNG/BMP/JPEG/GIF) has a
    real pixel tier; only out-of-scope variants report luma null."""
    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, size=(9, 13), dtype=np.uint8)
    blob = _gif_bytes(idx, pal)
    df = spark.createDataFrame([Row(asset_id="gif", content=bytearray(blob))])
    rows = {r["asset_id"]: r for r in mm.image_features(df).collect()}
    assert rows["gif"]["format"] == "gif"
    assert rows["gif"]["width"] == 13 and rows["gif"]["height"] == 9
    want = float(mm._luma(pal[idx]).mean()) / 255.0
    assert abs(rows["gif"]["mean_luma"] - want) < 1e-9


# -- WAV round-trip ----------------------------------------------------------

def _wav_bytes(x, rate, bits=16, fmt=1, channels=1, extra_chunk=True):
    """Minimal RIFF/WAVE encoder for decoder tests: PCM 8/16/24/32 or
    IEEE float32/64, optional junk chunk before data (walker must skip)."""
    import struct

    arr = np.asarray(x, dtype=np.float64)
    if channels > 1:
        arr = np.repeat(arr[:, None], channels, axis=1).ravel()
    if fmt == 1:
        if bits == 8:
            payload = (np.clip(arr, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
        elif bits == 16:
            payload = (np.clip(arr, -1, 1) * 32767).astype("<i2").tobytes()
        elif bits == 24:
            v = (np.clip(arr, -1, 1) * ((1 << 23) - 1)).astype(np.int32)
            v = np.where(v < 0, v + (1 << 24), v)
            b = np.empty((len(v), 3), dtype=np.uint8)
            b[:, 0] = v & 0xFF
            b[:, 1] = (v >> 8) & 0xFF
            b[:, 2] = (v >> 16) & 0xFF
            payload = b.tobytes()
        else:
            payload = (np.clip(arr, -1, 1) * ((1 << 31) - 1)).astype("<i4").tobytes()
    else:
        payload = arr.astype("<f4" if bits == 32 else "<f8").tobytes()
    block = channels * bits // 8
    fmt_body = struct.pack("<HHIIHH", fmt, channels, rate, rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if extra_chunk:
        chunks += b"LIST" + struct.pack("<I", 5) + b"junk!" + b"\x00"  # odd len: padded
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_np_roundtrip_and_features(spark):
    """WAV decode is REAL samples for every PCM width + IEEE float, with
    chunk-walking (junk chunks skipped), stereo downmix, and the
    audio_features kernel reporting real rate/duration/rms/peak; non-WAV
    blobs report NULL features."""
    rng = np.random.default_rng(23)
    t = np.arange(1600) / 16000.0
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    for bits, fmt, tol in ((8, 1, 2e-2), (16, 1, 1e-4), (24, 1, 1e-6),
                           (32, 1, 1e-9), (32, 3, 1e-7), (64, 3, 1e-12)):
        dec = mm.decode_wav_np(_wav_bytes(x, 16000, bits=bits, fmt=fmt))
        assert dec is not None, (bits, fmt)
        got, rate = dec
        assert rate == 16000 and len(got) == len(x)
        assert float(np.abs(got - x).max()) <= tol, (bits, fmt)
    # stereo downmix: duplicated channels mean back to the mono signal
    got2, _ = mm.decode_wav_np(_wav_bytes(x, 8000, bits=16, channels=2))
    assert len(got2) == len(x) and float(np.abs(got2 - x).max()) <= 1e-4
    # malformed declines
    assert mm.decode_wav_np(b"RIFFxxxxWAVE") is None
    assert mm.decode_wav_np(_wav_bytes(x, 16000)[:50]) is None
    full = bytearray(_wav_bytes(x, 16000))
    full[20] = 0x55  # compressed codec id
    assert mm.decode_wav_np(bytes(full)) is None

    from pyspark.sql import Row

    df = spark.createDataFrame([
        Row(asset_id="wav", content=bytearray(_wav_bytes(x, 16000))),
        Row(asset_id="txt", content=bytearray(b"not audio at all")),
    ])
    rows = {r["asset_id"]: r for r in mm.audio_features(df).collect()}
    w = rows["wav"]
    assert w["sample_rate"] == 16000 and w["n_samples"] == 1600
    assert w["duration_ms"] == 100
    assert abs(w["rms"] - float(np.sqrt(np.mean(x * x)))) < 1e-3
    assert abs(w["peak"] - 0.5) < 1e-3
    assert rows["txt"]["sample_rate"] is None and rows["txt"]["rms"] is None
    assert rows["txt"]["n_bytes"] == 16


def _mp3_frame(version="1", layer=3, br_idx=9, sr_idx=0, pad=0, mode=0,
               fill=b"\x00"):
    """Hand-rolled MPEG audio frame: 4-byte header + zero payload of the
    spec frame length (the same tables parse_mp3_header reads)."""
    from semadb_spark.operators import multimodal as mm

    ver_bits = {"1": 3, "2": 2, "2.5": 0}[version]
    layer_bits = {1: 3, 2: 2, 3: 1}[layer]
    b1 = 0xE0 | (ver_bits << 3) | (layer_bits << 1) | 1
    b2 = (br_idx << 4) | (sr_idx << 2) | (pad << 1)
    b3 = mode << 6
    hdr = bytes([0xFF, b1, b2, b3])
    f = mm._mp3_frame_at(hdr, 0)
    assert f is not None
    return hdr + fill * (f["frame_len"] - 4), f


def test_parse_mp3_header_cbr_and_tags():
    from semadb_spark.operators import multimodal as mm

    # MPEG1 Layer III, idx9=128 kbps, 44100 Hz, stereo; 40 frames CBR
    frame, f = _mp3_frame()
    assert f["bitrate_kbps"] == 128 and f["sample_rate"] == 44100
    assert f["frame_len"] == 144 * 128000 // 44100  # 417, spec formula
    data = frame * 40
    got = mm.parse_mp3_header(data)
    assert got["format"] == "mp3" and got["mpeg_version"] == "1"
    assert got["sample_rate"] == 44100 and got["bitrate_kbps"] == 128
    assert got["channels"] == 2 and got["frames"] is None and not got["vbr"]
    # CBR duration estimate: bytes*8*1000/bitrate — MILLISECOND granular
    # (40 frames = 16680 bytes -> 1042 ms, not a 1000 ms whole-second floor)
    want_ms = int(len(data) * 8 * 1000 // 128000)
    assert want_ms % 1000 != 0, "fixture must exercise sub-second precision"
    assert got["duration_ms"] == want_ms
    # ID3v2 prefix (syncsafe size) + trailing ID3v1 "TAG" block skipped
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0x02, 0x01]) + b"\x00" * 0x101
    tagged = id3 + data + b"TAG" + b"\x00" * 125
    got2 = mm.parse_mp3_header(tagged)
    assert got2["audio_start"] == len(id3)
    assert got2["duration_ms"] == want_ms  # ID3v1/v2 bytes excluded
    # false sync inside garbage does not fool the next-frame guard
    garbage = b"\xff\xfb" + b"\x12" * 100
    assert mm.parse_mp3_header(garbage) is None
    assert mm.parse_mp3_header(b"not audio at all") is None


def test_parse_mp3_header_versions_and_xing():
    import struct

    from semadb_spark.operators import multimodal as mm

    # MPEG2 Layer III mono 24 kHz idx4=32 kbps, 576 samples/frame
    frame2, f2 = _mp3_frame(version="2", br_idx=4, sr_idx=1, mode=3)
    assert f2["sample_rate"] == 24000 and f2["samples_per_frame"] == 576
    got = mm.parse_mp3_header(frame2 * 10)
    assert got["mpeg_version"] == "2" and got["channels"] == 1
    # Xing VBR header: side info for MPEG1 stereo Layer III = 32 bytes
    frames_n = 250
    payload = bytearray(b"\x00" * 32 + b"Xing" + struct.pack(">I", 1)
                        + struct.pack(">I", frames_n))
    frame1, f1 = _mp3_frame()
    body = bytearray(frame1)
    body[4 : 4 + len(payload)] = payload
    got = mm.parse_mp3_header(bytes(body) + frame1 * 3)
    assert got["vbr"] and got["frames"] == frames_n
    assert got["duration_ms"] == frames_n * 1152 * 1000 // 44100


def test_audio_features_mp3_header_real(spark):
    """audio_features fills sample_rate/duration_ms for MP3 from the frame
    header (decode-derived columns stay NULL) — header-real tier."""
    from semadb_spark.operators import multimodal as mm

    frame, _ = _mp3_frame()
    mp3 = frame * 40
    rows = [("m1", bytearray(mp3)), ("x1", bytearray(b"\x01\x02\x03"))]
    df = spark.createDataFrame(rows, "asset_id string, content binary")
    got = {r["asset_id"]: r for r in mm.audio_features(df).collect()}
    assert got["m1"]["sample_rate"] == 44100
    assert got["m1"]["duration_ms"] == int(len(mp3) * 8 * 1000 // 128000)
    assert got["m1"]["rms"] is None and got["m1"]["n_samples"] is None
    assert got["x1"]["sample_rate"] is None


def test_jpeg_np_max_pixels_breaker(monkeypatch):
    """The pure-Python JPEG tier declines oversized frames instead of
    decoding them (executor-pinning guard); the knob is a module global."""
    import numpy as np

    from semadb_spark.operators import multimodal as mm

    y = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 256
    data = _jpeg_bytes(y)
    assert mm.decode_jpeg_np(data) is not None
    monkeypatch.setattr(mm, "JPEG_NP_MAX_PIXELS", 63)
    assert mm.decode_jpeg_np(data) is None  # 8x8 = 64 > 63: declined
    # decode_image still degrades gracefully through the tier contract
    assert mm.decode_image(data) is not None


def test_parse_flac_header():
    """STREAMINFO bit unpacking (RFC 9639): 44100 Hz stereo 16-bit,
    88200 total samples -> exactly 2000 ms; skip-to-STREAMINFO past a
    leading PADDING block; garbage and truncated blocks -> None."""
    import struct

    from semadb_spark.operators import multimodal as mm

    def streaminfo(rate, chans, bps, total):
        bits = (rate << 44) | ((chans - 1) << 41) | ((bps - 1) << 36) | total
        body = b"\x00" * 10 + struct.pack(">Q", bits) + b"\x00" * 16
        return bytes([0x80]) + len(body).to_bytes(3, "big") + body

    flac = b"fLaC" + streaminfo(44100, 2, 16, 88200)
    got = mm.parse_flac_header(flac)
    assert got == {"format": "flac", "sample_rate": 44100, "channels": 2,
                   "bits_per_sample": 16, "total_samples": 88200,
                   "duration_ms": 2000}
    # PADDING (type 1) before STREAMINFO still resolves (lenient walk)
    pad = bytes([0x01]) + (4).to_bytes(3, "big") + b"\x00" * 4
    got2 = mm.parse_flac_header(b"fLaC" + pad + streaminfo(48000, 1, 24, 0))
    assert got2["sample_rate"] == 48000 and got2["channels"] == 1
    assert got2["total_samples"] is None and got2["duration_ms"] is None
    assert mm.parse_flac_header(b"fLaCxx") is None
    assert mm.parse_flac_header(b"not flac at all") is None


def _ogg_page(serial, granule, payload, seq=0, htype=2):
    import struct

    segs = []
    rest = len(payload)
    while rest >= 255:
        segs.append(255)
        rest -= 255
    segs.append(rest)
    return (b"OggS" + bytes([0, htype]) + struct.pack("<q", granule)
            + struct.pack("<III", serial, seq, 0) + bytes([len(segs)])
            + bytes(segs) + payload)


def test_parse_ogg_header():
    """Vorbis ident header on page 0 + duration from the LAST page's
    granule of the same serial (Vorbis I spec §A.2); a second logical
    stream's pages are ignored; non-vorbis Ogg -> None."""
    import struct

    from semadb_spark.operators import multimodal as mm

    ident = (bytes([1]) + b"vorbis" + struct.pack("<I", 0) + bytes([2])
             + struct.pack("<I", 22050) + struct.pack("<iii", 0, 64000, 0)
             + bytes([0xB8, 0x01]))
    data = (_ogg_page(7, 0, ident, seq=0)
            + _ogg_page(99, 999999, b"\x00" * 10, seq=0)   # other stream
            + _ogg_page(7, 44100, b"\x00" * 20, seq=1, htype=4))
    got = mm.parse_ogg_header(data)
    assert got["format"] == "ogg" and got["codec"] == "vorbis"
    assert got["sample_rate"] == 22050 and got["channels"] == 2
    assert got["bitrate_nominal"] == 64000
    assert got["total_samples"] == 44100 and got["duration_ms"] == 2000
    # Opus (RFC 7845): 48 kHz granule clock minus pre-skip, input rate
    # is informational
    opus_head = (b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312)
                 + struct.pack("<I", 16000) + struct.pack("<h", 0)
                 + bytes([0]))
    odata = (_ogg_page(9, 0, opus_head)
             + _ogg_page(9, 48000 + 312, b"\x00" * 6, seq=1, htype=4))
    og = mm.parse_ogg_header(odata)
    assert og["codec"] == "opus" and og["channels"] == 2
    assert og["pre_skip"] == 312 and og["total_samples"] == 48000
    assert og["duration_ms"] == 1000  # granule clock is 48 kHz, not 16k
    # unknown first packet -> None, garbage -> None
    assert mm.parse_ogg_header(
        _ogg_page(7, 0, b"Speex   " + b"\x00" * 10)) is None
    assert mm.parse_ogg_header(b"OggSnope") is None


def _adts_frame(sr_idx=4, chan=2, profile_bits=1, payload=100):
    flen = 7 + payload
    b = bytearray(7 + payload)
    b[0] = 0xFF
    b[1] = 0xF1  # MPEG-4, layer 00, no CRC
    b[2] = (profile_bits << 6) | (sr_idx << 2) | ((chan >> 2) & 1)
    b[3] = ((chan & 3) << 6) | ((flen >> 11) & 3)
    b[4] = (flen >> 3) & 0xFF
    b[5] = ((flen & 7) << 5) | 0x1F
    b[6] = 0xFC
    return bytes(b)


def test_parse_adts_header():
    """ADTS fixed-header fields + frame-chain walk (ISO/IEC 14496-3
    §1.A.2.2): 43 frames @ 44100 -> 43*1024/44100 s; false-sync guard
    rejects a lone sync in garbage; MP3 bytes do not sniff as ADTS."""
    from semadb_spark.operators import multimodal as mm

    data = _adts_frame() * 43
    got = mm.parse_adts_header(data)
    assert got["format"] == "aac_adts" and got["profile"] == 2
    assert got["sample_rate"] == 44100 and got["channels"] == 2
    assert got["frames"] == 43
    assert got["duration_ms"] == int(43 * 1024 * 1000 // 44100)
    assert mm.parse_adts_header(b"\xff\xf1" + b"\x00" * 40) is None
    # an MP3 frame header must not parse as ADTS (disjoint sync layers)
    frame, _ = _mp3_frame()
    assert mm.parse_adts_header(frame * 3) is None
    # and vice versa: ADTS must not parse as MP3
    assert mm.parse_mp3_header(data) is None


def test_audio_features_header_real_formats(spark):
    """audio_features fills sample_rate/duration_ms (and exact n_samples
    for FLAC/Ogg) for every header-real compressed format, decode columns
    NULL — one dispatch through the real Spark kernel."""
    import struct

    from semadb_spark.operators import multimodal as mm

    def streaminfo(rate, chans, bps, total):
        bits = (rate << 44) | ((chans - 1) << 41) | ((bps - 1) << 36) | total
        body = b"\x00" * 10 + struct.pack(">Q", bits) + b"\x00" * 16
        return bytes([0x80]) + len(body).to_bytes(3, "big") + body

    flac = b"fLaC" + streaminfo(48000, 2, 16, 96000)
    ident = (bytes([1]) + b"vorbis" + struct.pack("<I", 0) + bytes([1])
             + struct.pack("<I", 16000) + struct.pack("<iii", 0, 0, 0)
             + bytes([0xB8, 0x01]))
    ogg = _ogg_page(5, 0, ident) + _ogg_page(5, 8000, b"\x00" * 8, seq=1,
                                             htype=4)
    aac = _adts_frame() * 10
    rows = [("f1", bytearray(flac)), ("o1", bytearray(ogg)),
            ("a1", bytearray(aac)), ("x1", bytearray(b"\x00\x01"))]
    df = spark.createDataFrame(rows, "asset_id string, content binary")
    got = {r["asset_id"]: r for r in mm.audio_features(df).collect()}
    assert (got["f1"]["sample_rate"], got["f1"]["n_samples"],
            got["f1"]["duration_ms"]) == (48000, 96000, 2000)
    assert (got["o1"]["sample_rate"], got["o1"]["n_samples"],
            got["o1"]["duration_ms"]) == (16000, 8000, 500)
    assert got["a1"]["sample_rate"] == 44100
    assert got["a1"]["duration_ms"] == int(10 * 1024 * 1000 // 44100)
    assert got["a1"]["n_samples"] is None  # ADTS records no sample total
    assert all(got[k]["rms"] is None for k in ("f1", "o1", "a1"))
    assert got["x1"]["sample_rate"] is None


def _agif_bytes(sw, sh, pal, frames, bg_index=0):
    """Hand-rolled ANIMATED GIF89a: logical screen + GCT + per-frame GCE
    (delay/transparency/disposal) + sub-image descriptors, literal-only
    LZW per frame (same valid-stream trick as _gif_bytes)."""
    import struct

    n_pal = len(pal)
    s = n_pal.bit_length() - 2
    min_size = max(2, n_pal.bit_length() - 1)
    clear, eoi = 1 << min_size, (1 << min_size) + 1

    def lzw(idx):
        bits = []

        def emit(code, width):
            for i in range(width):
                bits.append((code >> i) & 1)

        width = min_size + 1
        table_len = clear + 2
        emit(clear, width)
        prevset = False
        for v in idx.ravel():
            emit(int(v), width)
            if prevset:
                table_len += 1
                if table_len == (1 << width) and width < 12:
                    width += 1
            prevset = True
        emit(eoi, width)
        by = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j, bit in enumerate(bits[i : i + 8]):
                b |= bit << j
            by.append(b)
        out = bytes([min_size])
        for i in range(0, len(by), 255):
            chunk = by[i : i + 255]
            out += bytes([len(chunk)]) + bytes(chunk)
        return out + b"\x00"

    pal_bytes = bytes(int(x) for x in np.asarray(pal, dtype=np.uint8).ravel())
    out = b"GIF89a" + struct.pack("<HHBBB", sw, sh, 0x80 | s, bg_index, 0)
    out += pal_bytes
    for f in frames:
        trans = f.get("transparent")
        packed = (f.get("disposal", 0) << 2) | (1 if trans is not None else 0)
        out += (b"\x21\xf9\x04" + bytes([packed])
                + struct.pack("<H", f.get("delay_cs", 0))
                + bytes([trans if trans is not None else 0]) + b"\x00")
        idx = f["idx"]
        h, w = idx.shape
        out += b"\x2c" + struct.pack(
            "<HHHH", f.get("left", 0), f.get("top", 0), w, h) + bytes([0])
        out += lzw(idx)
    return out + b"\x3b"


def test_decode_gif_frames_np_compositing():
    """Full GIF89a animation semantics: GCE delays (x10 ms), sub-image
    offsets onto the logical-screen canvas, transparency keeping the
    canvas, disposal 2 restoring the region to background, disposal 3
    restoring the prior canvas."""
    from semadb_spark.operators import multimodal as mm

    pal = np.array([[0, 0, 0], [255, 255, 255], [255, 0, 0], [0, 255, 0]],
                   dtype=np.uint8)
    L = {i: int((pal[i][0] * 299 + pal[i][1] * 587 + pal[i][2] * 114) // 1000)
         for i in range(4)}
    frames = [
        # frame 0: full screen white, 100 ms, disposal 1 (leave)
        {"idx": np.full((6, 6), 1, dtype=np.uint8), "delay_cs": 10,
         "disposal": 1},
        # frame 1: 2x2 red patch at (2,2), 200 ms, disposal 2 (restore bg)
        {"idx": np.full((2, 2), 2, dtype=np.uint8), "left": 2, "top": 2,
         "delay_cs": 20, "disposal": 2},
        # frame 2: 2x2 at origin, green diagonal, index 0 TRANSPARENT
        {"idx": np.array([[3, 0], [0, 3]], dtype=np.uint8),
         "transparent": 0},
    ]
    data = _agif_bytes(6, 6, pal, frames)
    got = mm.decode_gif_frames_np(data)
    assert got is not None and len(got) == 3
    delays = [d for d, _ in got]
    assert delays == [100, 200, 0]
    f0, f1, f2 = (luma for _, luma in got)
    assert f0.shape == (6, 6) and (f0 == L[1]).all()
    assert (f1[2:4, 2:4] == L[2]).all()           # red patch composited
    assert (f1[0, 0] == L[1]) and (f1[5, 5] == L[1])  # rest still white
    # frame 2: disposal-2 restored (2:4,2:4) to background black before
    # drawing; transparent 0s keep the canvas (white at (0,1)/(1,0))
    assert (f2[2:4, 2:4] == L[0]).all()
    assert f2[0, 0] == L[3] and f2[1, 1] == L[3]
    assert f2[0, 1] == L[1] and f2[1, 0] == L[1]
    # disposal 3: frame draws, then the canvas reverts for the next frame
    frames3 = [
        {"idx": np.full((4, 4), 1, dtype=np.uint8), "disposal": 1},
        {"idx": np.full((4, 4), 2, dtype=np.uint8), "disposal": 3},
        {"idx": np.array([[3]], dtype=np.uint8)},
    ]
    g3 = mm.decode_gif_frames_np(_agif_bytes(4, 4, pal, frames3))
    assert len(g3) == 3
    assert (g3[1][1] == L[2]).all()               # frame 1 shows red
    assert g3[2][1][0, 0] == L[3]                 # frame 2 drew its pixel
    assert (g3[2][1][1:, 1:] == L[1]).all()       # rest REVERTED to white
    # single-frame GIFs from the existing builder still decode (1 frame)
    idx = (np.add.outer(np.arange(5), np.arange(7)) % 4).astype(np.uint8)
    one = mm.decode_gif_frames_np(_gif_bytes(idx, pal))
    assert len(one) == 1
    np.testing.assert_array_equal(one[0][1], mm.decode_gif_np(_gif_bytes(idx, pal)))
    # malformed tail: decoded prefix returns, garbage returns None
    trunc = data[: len(data) - 8]
    assert 1 <= len(mm.decode_gif_frames_np(trunc)) <= 3
    assert mm.decode_gif_frames_np(b"not a gif") is None


def test_gif_frames_operator(spark):
    """gif_frames explodes REAL composited animation frames through the
    Spark kernel: per-frame delay/dims/mean_luma/md5; non-GIF blobs emit
    nothing; frame_md5 is content-addressed (identical composited frames
    in different containers hash equal)."""
    from semadb_spark.operators import multimodal as mm

    pal = np.array([[0, 0, 0], [255, 255, 255], [255, 0, 0], [0, 255, 0]],
                   dtype=np.uint8)
    anim = _agif_bytes(6, 6, pal, [
        {"idx": np.full((6, 6), 1, dtype=np.uint8), "delay_cs": 5,
         "disposal": 1},
        {"idx": np.full((3, 3), 2, dtype=np.uint8), "left": 3, "top": 3,
         "delay_cs": 7},
    ])
    rows = [("g1", bytearray(anim)), ("x1", bytearray(b"not a gif")),
            ("g2", bytearray(anim))]
    df = spark.createDataFrame(rows, "asset_id string, content binary")
    got = mm.gif_frames(df).collect()
    by_asset: dict = {}
    for r in got:
        by_asset.setdefault(r["asset_id"], []).append(r)
    assert "x1" not in by_asset
    g1 = sorted(by_asset["g1"], key=lambda r: r["frame_idx"])
    assert [r["delay_ms"] for r in g1] == [50, 70]
    assert all((r["width"], r["height"]) == (6, 6) for r in g1)
    assert abs(g1[0]["mean_luma"] - 1.0) < 1e-9  # all-white frame
    assert g1[1]["mean_luma"] < 1.0
    # content-addressed: the same animation under another id hashes equal
    g2 = sorted(by_asset["g2"], key=lambda r: r["frame_idx"])
    assert [r["frame_md5"] for r in g1] == [r["frame_md5"] for r in g2]


# -- FLAC: hand-rolled encoder (RFC 9639) + lossless round-trip --------------


class _FlacW:
    """MSB-first bit writer for the FLAC test encoder."""

    def __init__(self):
        self.bits: list[int] = []

    def w(self, value, nbits):
        v = int(value) & ((1 << nbits) - 1)
        for i in range(nbits - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def unary(self, q):
        self.bits.extend([0] * q + [1])

    def rice(self, v, param):
        u = (v << 1) if v >= 0 else (-v << 1) - 1
        self.unary(u >> param)
        self.w(u, param)

    def tobytes(self):
        while len(self.bits) % 8:
            self.bits.append(0)
        return np.packbits(np.asarray(self.bits, dtype=np.uint8)).tobytes()


def _flac_crc8(data):
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _flac_crc16(data):
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _flac_subframe_bits(w, x, bps, kind, order=0, param=10, po=0,
                        wasted=0, escape_width=None):
    """Encode one subframe. kind: constant | verbatim | fixed | lpc."""
    x = np.asarray(x, dtype=np.int64)
    if wasted:
        assert not np.any(x & ((1 << wasted) - 1))
        x = x >> wasted
    ebps = bps - wasted
    if kind == "constant":
        w.w(0, 1); w.w(0, 6)
    elif kind == "verbatim":
        w.w(0, 1); w.w(1, 6)
    elif kind == "fixed":
        w.w(0, 1); w.w(8 + order, 6)
    else:
        w.w(0, 1); w.w(32 | (order - 1), 6)
    if wasted:
        w.w(1, 1)
        w.unary(wasted - 1)
    else:
        w.w(0, 1)
    if kind == "constant":
        w.w(int(x[0]), ebps)
        return
    if kind == "verbatim":
        for v in x.tolist():
            w.w(v, ebps)
        return
    coefs, shift = None, 0
    if kind == "fixed":
        res = np.diff(x, n=order) if order else x.copy()
        for v in x[:order].tolist():
            w.w(v, ebps)
    else:  # lpc: fixed-order-2-as-LPC coefficients through the real formula
        coefs = {1: [1], 2: [2, -1], 3: [3, -3, 1]}[order]
        shift = 0
        res = np.array(
            [int(x[i]) - (sum(c * int(x[i - 1 - j]) for j, c in enumerate(coefs))
                          >> shift)
             for i in range(order, len(x))], dtype=np.int64)
        for v in x[:order].tolist():
            w.w(v, ebps)
        prec = 15
        w.w(prec - 1, 4)
        w.w(shift, 5)
        for c in coefs:
            w.w(c, prec)
    # residual: method 0 (4-bit rice params), partition order po
    w.w(0, 2)
    w.w(po, 4)
    nparts = 1 << po
    bs = len(x)
    assert bs % nparts == 0
    k = 0
    for part in range(nparts):
        cnt = (bs >> po) - (order if part == 0 else 0)
        if escape_width is not None:
            w.w(0xF, 4)
            w.w(escape_width, 5)
            for v in res[k:k + cnt].tolist():
                w.w(v, escape_width)
        else:
            w.w(param, 4)
            for v in res[k:k + cnt].tolist():
                w.rice(v, param)
        k += cnt


def _flac_frame(chans, bps, frame_idx, chan_mode="independent", **sub_kw):
    """One frame: header (+CRC8), per-channel subframes, CRC16."""
    bs = len(chans[0])
    hw = _FlacW()
    hw.w(0x3FFE, 14); hw.w(0, 1); hw.w(0, 1)
    hw.w(7, 4)           # block size: 16-bit value-1 follows coded number
    hw.w(0, 4)           # sample rate: from STREAMINFO
    code = {"independent": len(chans) - 1, "left_side": 8,
            "right_side": 9, "mid_side": 10}[chan_mode]
    hw.w(code, 4)
    hw.w({8: 1, 16: 4, 24: 6}[bps], 3); hw.w(0, 1)
    assert frame_idx < 0x80
    hw.w(frame_idx, 8)   # coded number, single byte
    hw.w(bs - 1, 16)
    hdr = hw.tobytes()
    hdr += bytes([_flac_crc8(hdr)])
    bw = _FlacW()
    if chan_mode == "independent":
        subs = [(c, bps) for c in chans]
    else:
        l, r = np.asarray(chans[0], np.int64), np.asarray(chans[1], np.int64)
        if chan_mode == "left_side":
            subs = [(l, bps), (l - r, bps + 1)]
        elif chan_mode == "right_side":
            subs = [(l - r, bps + 1), (r, bps)]
        else:
            subs = [((l + r) >> 1, bps), (l - r, bps + 1)]
    kinds = sub_kw.pop("kinds", ["fixed"] * len(subs))
    orders = sub_kw.pop("orders", [2] * len(subs))
    for (x, sbps), kind, order in zip(subs, kinds, orders):
        _flac_subframe_bits(bw, x, sbps, kind, order=order, **sub_kw)
    body = bw.tobytes()
    return hdr + body + _flac_crc16(hdr + body).to_bytes(2, "big")


def _flac_file(chans, rate, bps, frames_of=4096, **frame_kw):
    """Full FLAC stream: STREAMINFO + frames of `frames_of` samples."""
    chans = [np.asarray(c, dtype=np.int64) for c in chans]
    total = len(chans[0])
    si = _FlacW()
    si.w(frames_of, 16); si.w(frames_of, 16)
    si.w(0, 24); si.w(0, 24)
    si.w(rate, 20); si.w(len(chans) - 1, 3); si.w(bps - 1, 5)
    si.w(total, 36)
    body = si.tobytes() + b"\x00" * 16  # md5 unset
    out = b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body
    idx = 0
    for start in range(0, total, frames_of):
        blk = [c[start:start + frames_of] for c in chans]
        out += _flac_frame(blk, bps, idx, **frame_kw)
        idx += 1
    return out


def _walk(n, step=60, seed=0, bits=16):
    rng = np.random.default_rng(seed)
    x = np.cumsum(rng.integers(-step, step + 1, size=n))
    lim = (1 << (bits - 1)) - 1
    return np.clip(x, -lim, lim).astype(np.int64)


def _flac_expected_mono(chans, bps):
    full = np.stack([np.asarray(c, dtype=np.int64) for c in chans])
    return full.mean(axis=0) / float(1 << (bps - 1))


def test_decode_flac_np_fixed_orders_lossless():
    """Every fixed predictor order 0-4 + constant + verbatim round-trips
    BIT-EXACT (FLAC is lossless): mono, multiple frames."""
    from semadb_spark.operators import multimodal as mm

    x = _walk(1000, seed=1)
    for kind, order in [("fixed", 0), ("fixed", 1), ("fixed", 2),
                        ("fixed", 3), ("fixed", 4), ("verbatim", 0)]:
        data = _flac_file([x], 44100, 16, frames_of=250,
                          kinds=["fixed"], orders=[order]
                          ) if kind == "fixed" else _flac_file(
            [x], 44100, 16, frames_of=250, kinds=["verbatim"], orders=[0])
        got = mm.decode_flac_np(data)
        assert got is not None, (kind, order)
        mono, rate = got
        assert rate == 44100
        np.testing.assert_array_equal(mono, _flac_expected_mono([x], 16)), (
            kind, order)
    const = np.full(600, -1234, dtype=np.int64)
    data = _flac_file([const], 8000, 16, frames_of=300, kinds=["constant"])
    mono, rate = mm.decode_flac_np(data)
    assert rate == 8000
    np.testing.assert_array_equal(mono, _flac_expected_mono([const], 16))


def test_decode_flac_np_lpc_and_partitions():
    """LPC subframes (real coefficient formula, shift inside recursion),
    partition order > 0, and the escaped raw-width partition encoding."""
    from semadb_spark.operators import multimodal as mm

    x = _walk(800, seed=2)
    for order in (1, 2, 3):
        data = _flac_file([x], 32000, 16, frames_of=400,
                          kinds=["lpc"], orders=[order])
        got = mm.decode_flac_np(data)
        assert got is not None, order
        np.testing.assert_array_equal(got[0], _flac_expected_mono([x], 16))
    # rice partitions: po=2 over a 400-sample block
    data = _flac_file([x], 32000, 16, frames_of=400, po=2)
    np.testing.assert_array_equal(
        mm.decode_flac_np(data)[0], _flac_expected_mono([x], 16))
    # escape partitions: raw 18-bit residuals
    data = _flac_file([x], 32000, 16, frames_of=400, escape_width=18)
    np.testing.assert_array_equal(
        mm.decode_flac_np(data)[0], _flac_expected_mono([x], 16))


def test_decode_flac_np_stereo_decorrelation_and_wasted():
    """left/side, right/side, mid/side reconstruct EXACT channels (the
    side channel carries bps+1 bits); wasted-bits subframes shift back."""
    from semadb_spark.operators import multimodal as mm

    l, r = _walk(500, seed=3), _walk(500, seed=4)
    want = _flac_expected_mono([l, r], 16)
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        data = _flac_file([l, r], 48000, 16, frames_of=250, chan_mode=mode)
        got = mm.decode_flac_np(data)
        assert got is not None, mode
        mono, rate = got
        assert rate == 48000
        np.testing.assert_array_equal(mono, want), mode
    # wasted bits: all samples share 3 low zero bits
    xw = (_walk(400, seed=5, bits=12) << 3)
    data = _flac_file([xw], 16000, 16, frames_of=200, wasted=3)
    np.testing.assert_array_equal(
        mm.decode_flac_np(data)[0], _flac_expected_mono([xw], 16))


def test_decode_flac_np_declines_out_of_scope(monkeypatch):
    """Byte budget declines (header metadata still reports); truncated
    stream -> None; STREAMINFO total shorter than frames trims exactly."""
    from semadb_spark.operators import multimodal as mm

    x = _walk(300, seed=6)
    data = _flac_file([x], 44100, 16, frames_of=300)
    monkeypatch.setattr(mm, "FLAC_NP_MAX_BYTES", 10)
    assert mm.decode_flac_np(data) is None
    assert mm.parse_flac_header(data)["total_samples"] == 300
    monkeypatch.undo()
    assert mm.decode_flac_np(data[:60]) is None
    assert mm.decode_flac_np(b"fLaC") is None
    assert mm.decode_flac_np(b"garbage bytes") is None


def test_audio_features_flac_real_pcm(spark):
    """audio_features decodes FLAC to REAL PCM: rms/peak are exact
    (lossless), n_samples from the stream, duration from rate — while an
    Ogg blob in the same batch stays header-real (rms NULL)."""
    from semadb_spark.operators import multimodal as mm
    import struct

    l, r = _walk(441, seed=7), _walk(441, seed=8)
    flac = _flac_file([l, r], 44100, 16, frames_of=441, chan_mode="mid_side")
    ident = (bytes([1]) + b"vorbis" + struct.pack("<I", 0) + bytes([2])
             + struct.pack("<I", 22050) + struct.pack("<iii", 0, 64000, 0)
             + bytes([0xB8, 0x01]))
    ogg = _ogg_page(7, 0, ident, seq=0) + _ogg_page(
        7, 22050, b"\x00" * 20, seq=1, htype=4)
    df = spark.createDataFrame(
        [("f1", bytearray(flac)), ("o1", bytearray(ogg))],
        "asset_id string, content binary")
    rows = {row["asset_id"]: row for row in mm.audio_features(df).collect()}
    mono = _flac_expected_mono([l, r], 16)
    f = rows["f1"]
    assert f["sample_rate"] == 44100 and f["n_samples"] == 441
    assert f["duration_ms"] == 10
    assert abs(f["rms"] - float(np.sqrt(np.mean(mono * mono)))) < 1e-12
    assert abs(f["peak"] - float(np.abs(mono).max())) < 1e-12
    o = rows["o1"]
    assert o["sample_rate"] == 22050 and o["rms"] is None
    assert o["duration_ms"] == 1000


# -- progressive JPEG: hand-rolled multi-scan encoder (T.81 Annex G) ---------


class _ProgScanEnc:
    """Event-stream encoder for one progressive scan: collects huffman
    symbols on pass 1, emits bits on pass 2. Events: ("sym", s),
    ("bits", v, n), ("RST",). EOB runs and refinement correction bits
    follow the spec's deferral rules (figures G.4/G.7): the EOB symbol
    carries bits buffered since the run began; within-block correction
    bits flush right after each emitted symbol."""

    def __init__(self):
        self.events = []
        self.eobrun = 0
        self.carried = []  # bits that flush with the EOB symbol
        self.current = []  # bits that flush after a within-block symbol

    def sym(self, s):
        self.events.append(("sym", s))

    def bits(self, v, n):
        if n:
            self.events.append(("bits", v, n))

    def flush_current(self):
        for b in self.current:
            self.bits(b, 1)
        self.current = []

    def flush_eob(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            self.bits(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
            for b in self.carried:
                self.bits(b, 1)
            self.carried = []

    def restart(self):
        self.flush_eob()
        self.events.append(("RST",))

    def end_block(self, r):
        if r > 0 or self.current:
            self.eobrun += 1
            self.carried.extend(self.current)
            self.current = []
            if self.eobrun == 0x7FFF:
                self.flush_eob()


def _prog_field(v, size):
    return v if v >= 0 else v + (1 << size) - 1


def _prog_ac_first(enc, block, ss, se, al):
    r = 0
    for k in range(ss, se + 1):
        v = int(block[k])
        t = (v >> al) if v >= 0 else -((-v) >> al)
        if t == 0:
            r += 1
            continue
        enc.flush_eob()
        while r > 15:
            enc.sym(0xF0)
            r -= 16
        size = abs(t).bit_length()
        enc.sym((r << 4) | size)
        enc.bits(_prog_field(t, size), size)
        r = 0
    enc.end_block(r)


def _prog_ac_refine(enc, block, ss, se, al):
    absval = [abs(int(block[k])) >> al for k in range(ss, se + 1)]
    eob_k = max((k for k, t in zip(range(ss, se + 1), absval) if t == 1),
                default=ss - 1)
    r = 0
    for k in range(ss, se + 1):
        t = absval[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob_k:
            enc.flush_eob()
            enc.sym(0xF0)
            r -= 16
            enc.flush_current()
        if t > 1:  # nonzero history: one correction bit
            enc.current.append(t & 1)
            continue
        enc.flush_eob()
        enc.sym((r << 4) | 1)
        enc.bits(1 if int(block[k]) > 0 else 0, 1)
        enc.flush_current()
        r = 0
    enc.end_block(r)


def _prog_units(comps, planes_coef, mcux, mcuy):
    units = []
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci, (cid, hc, vc) in enumerate(comps):
            for vy in range(vc):
                for hx in range(hc):
                    units.append((ci, my * vc + vy, mx * hc + hx))
    return units


def _jpeg_bytes_progressive(y, cbcr=None, restart=0, y_bands=((1, 5), (6, 63))):
    """Hand-rolled PROGRESSIVE JPEG (T.81 Annex G) with the standard scan
    script: interleaved DC at Al=1 then a DC refinement to Al=0; per
    component, first AC scans of each spectral band at Al=1, then an AC
    refinement of the full band to Al=0. All-ones quant, per-scan
    fixed-length huffman tables (redefined between scans), optional
    restart interval in the DC scan."""
    import struct

    h, w = y.shape
    if cbcr is None:
        comps = [(1, 1, 1)]
        planes = [y]
    else:
        comps = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]
        planes = [y, cbcr[0], cbcr[1]]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    assert h % (8 * vmax) == 0 and w % (8 * hmax) == 0, "test image dims"
    mcux, mcuy = w // (8 * hmax), h // (8 * vmax)
    # coefficient planes, block-indexed, zigzag order
    pc = []
    for ci, (cid, hc, vc) in enumerate(comps):
        p = planes[ci]
        bh, bw = p.shape[0] // 8, p.shape[1] // 8
        arr = np.zeros((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                arr[by, bx] = _fdct_zz(p[by * 8 : by * 8 + 8,
                                         bx * 8 : bx * 8 + 8])
        pc.append(arr)

    scans = []  # (scan_comps, ss, se, ah, al, events, needs_dc, needs_ac)

    # scan 1: interleaved DC, Al=1 (with optional restart interval)
    enc = _ProgScanEnc()
    preds = [0] * len(comps)
    units = _prog_units(comps, pc, mcux, mcuy)
    per_mcu = sum(hc * vc for _, hc, vc in comps)
    for ui, (ci, by, bx) in enumerate(units):
        if restart and ui and ui % (restart * per_mcu) == 0:
            enc.restart()
            preds = [0] * len(comps)
        t = int(pc[ci][by, bx][0]) >> 1
        diff = t - preds[ci]
        preds[ci] = t
        size = abs(diff).bit_length()
        enc.sym(size)
        enc.bits(_prog_field(diff, size), size)
    scans.append((list(range(len(comps))), 0, 0, 0, 1, enc, True, False))

    # scan 2: DC refinement to Al=0 — raw bits, no huffman (DRI still
    # applies: restart markers split the segments here too)
    enc = _ProgScanEnc()
    for ui, (ci, by, bx) in enumerate(units):
        if restart and ui and ui % (restart * per_mcu) == 0:
            enc.restart()
        enc.bits((int(pc[ci][by, bx][0]) >> 0) & 1, 1)
    scans.append((list(range(len(comps))), 0, 0, 1, 0, enc, False, False))

    # per component: AC first scans per band at Al=1, then refinement.
    # Non-interleaved scans count the restart interval in BLOCKS of the
    # scanned component (T.81 §C.4 MCU=1 data unit), resetting the EOB run.
    for ci in range(len(comps)):
        bh, bw = pc[ci].shape[:2]
        bands = y_bands if ci == 0 else ((1, 63),)
        for ss, se in bands:
            enc = _ProgScanEnc()
            for bi in range(bh * bw):
                if restart and bi and bi % restart == 0:
                    enc.restart()
                _prog_ac_first(enc, pc[ci][bi // bw, bi % bw], ss, se, 1)
            enc.flush_eob()
            scans.append(([ci], ss, se, 0, 1, enc, False, True))
        enc = _ProgScanEnc()
        for bi in range(bh * bw):
            if restart and bi and bi % restart == 0:
                enc.restart()
            _prog_ac_refine(enc, pc[ci][bi // bw, bi % bw], 1, 63, 0)
        enc.flush_eob()
        scans.append(([ci], 1, 63, 1, 0, enc, False, True))

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xDB, b"\x00" + b"\x01" * 64)
    sofb = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hc, vc in comps:
        sofb += bytes([cid, (hc << 4) | vc, 0])
    out += seg(0xC2, sofb)
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    for scomps, ss, se, ah, al, enc, needs_dc, needs_ac in scans:
        syms = [e[1] for e in enc.events if e[0] == "sym"]
        codes = None
        if needs_dc or needs_ac:
            bits_spec, vals, codes = _jpeg_huff_spec(syms or [0x00])
            cls = 0x10 if needs_ac else 0x00
            out += seg(0xC4, bytes([cls] + bits_spec) + bytes(vals))
        sosb = bytes([len(scomps)])
        for ci in scomps:
            sosb += bytes([comps[ci][0], 0x00])
        sosb += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sosb)
        segs = [_BitWriter()]
        for e in enc.events:
            if e[0] == "RST":
                segs.append(_BitWriter())
            elif e[0] == "sym":
                ln, code = codes[e[1]]
                segs[-1].write(code, ln)
            else:
                segs[-1].write(e[1], e[2])
        for i, bwr in enumerate(segs):
            if i:
                out += bytes([0xFF, 0xD0 + ((i - 1) % 8)])
            out += bwr.tobytes_stuffed()
    return out + b"\xff\xd9"


def test_decode_jpeg_progressive_matches_baseline():
    """Progressive decode == baseline decode of the SAME coefficients,
    bit-for-bit: the successive-approximation ladder (DC Al=1 -> refine;
    AC bands at Al=1 -> full-band refinement with EOB runs + correction
    bits) reconstructs every coefficient exactly."""
    rng = np.random.default_rng(21)
    # block-constant: sparse ACs -> long EOB runs across blocks
    vals = rng.integers(0, 256, size=(3, 4), dtype=np.uint8)
    y_flat = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    base = mm.decode_jpeg_np(_jpeg_bytes(y_flat))
    prog = mm.decode_jpeg_np(_jpeg_bytes_progressive(y_flat))
    np.testing.assert_array_equal(prog, base)
    # dense random: every refinement path (ZRL runs, correction bits)
    y2 = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    base2 = mm.decode_jpeg_np(_jpeg_bytes(y2))
    prog2 = mm.decode_jpeg_np(_jpeg_bytes_progressive(y2))
    np.testing.assert_array_equal(prog2, base2)
    assert int(np.abs(prog2.astype(int) - y2.astype(int)).max()) <= 3


def test_decode_jpeg_progressive_color_subsampled_and_restart():
    """4:2:0 progressive: interleaved DC walks MCU geometry while the
    per-component AC scans walk each component's OWN block grid; restart
    markers in the DC scan reset predictors; a single-band script
    (no split) also reconstructs."""
    rng = np.random.default_rng(22)
    y = rng.integers(0, 256, size=(32, 48), dtype=np.uint8)
    cb = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    cr = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    base = mm.decode_jpeg_np(_jpeg_bytes(y, cbcr=(cb, cr)))
    prog = mm.decode_jpeg_np(_jpeg_bytes_progressive(y, cbcr=(cb, cr)))
    np.testing.assert_array_equal(prog, base)
    prog_r = mm.decode_jpeg_np(
        _jpeg_bytes_progressive(y, cbcr=(cb, cr), restart=2))
    np.testing.assert_array_equal(prog_r, base)
    prog_one = mm.decode_jpeg_np(
        _jpeg_bytes_progressive(y, y_bands=((1, 63),)))
    np.testing.assert_array_equal(
        prog_one, mm.decode_jpeg_np(_jpeg_bytes(y)))


def test_decode_jpeg_progressive_declines_out_of_scope(monkeypatch):
    """Truncated progressive scans, DC scans with Se>0, and the pixel
    circuit breaker all decline to None instead of raising."""
    rng = np.random.default_rng(23)
    y = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    good = _jpeg_bytes_progressive(y)
    assert mm.decode_jpeg_np(good) is not None
    assert mm.decode_jpeg_np(good[: len(good) * 2 // 3]) is None
    monkeypatch.setattr(mm, "JPEG_NP_MAX_PIXELS", 64)
    assert mm.decode_jpeg_np(good) is None
    monkeypatch.undo()
    # baseline relabeled as SOF2 (DC scan with Se=63) stays out of scope
    flipped = _jpeg_bytes(y).replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert mm.decode_jpeg_np(flipped) is None


def test_image_features_progressive_jpeg_real_luma(spark):
    """image_features reports REAL mean_luma for progressive JPEG blobs
    through the Spark kernel — the fake-decode carve-out now applies only
    to arithmetic/lossless JPEG."""
    rng = np.random.default_rng(24)
    vals = rng.integers(0, 256, size=(2, 2), dtype=np.uint8)
    y = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    blob = _jpeg_bytes_progressive(y)
    df = spark.createDataFrame([("p1", bytearray(blob))],
                               "asset_id string, content binary")
    row = mm.image_features(df).collect()[0]
    assert row["width"] == 16 and row["height"] == 16
    assert abs(row["mean_luma"] - float(y.mean()) / 255.0) < 0.02


# -- PNG: sub-byte depths, 16-bit, Adam7 interlace ---------------------------


def _png_filter_fwd(packed, bpp, filters):
    """Forward-filter packed rows (byte domain, spec §9) -> scanline bytes."""
    ph, stride = packed.shape
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(ph):
        ft = filters[y % len(filters)]
        cur = packed[y].astype(np.int32)
        a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]]) if (
            stride > bpp) else np.zeros(stride, np.int32)
        c = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]]) if (
            stride > bpp) else np.zeros(stride, np.int32)
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = (cur - a) % 256
        elif ft == 2:
            enc = (cur - prev) % 256
        elif ft == 3:
            enc = (cur - ((a + prev) >> 1)) % 256
        else:
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a,
                            np.where(pb <= pc, prev, c))
            enc = (cur - pred) % 256
        lines.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
        prev = cur
    return b"".join(lines)


def _png_pack(samp, depth):
    """(ph, pw, ch) samples -> (ph, stride) packed bytes at ``depth``."""
    ph, pw, ch = samp.shape
    if depth == 8:
        return samp.astype(np.uint8).reshape(ph, pw * ch)
    if depth == 16:
        v = samp.astype(np.uint16)
        out = np.empty((ph, pw * ch * 2), dtype=np.uint8)
        out[:, 0::2] = (v >> 8).reshape(ph, -1)
        out[:, 1::2] = (v & 0xFF).reshape(ph, -1)
        return out
    assert ch == 1
    bits = ((samp[..., 0:1].astype(np.uint8)[..., None]
             >> np.arange(depth - 1, -1, -1)) & 1).reshape(ph, pw * depth)
    pad = (-bits.shape[1]) % 8
    if pad:
        bits = np.concatenate(
            [bits, np.zeros((ph, pad), dtype=np.uint8)], axis=1)
    return np.packbits(bits, axis=1)


def _png_bytes_ext(samp, color_type, depth, interlace=0,
                   filters=(0, 1, 2, 3, 4), plte=None):
    """PNG encoder covering every legal depth + Adam7: per-pass forward
    filtering over packed rows (samples uint8, or uint16 at depth 16)."""
    import struct
    import zlib

    if samp.ndim == 2:
        samp = samp[..., None]
    h, w, ch = samp.shape
    bpp = max(1, ch * depth // 8)
    passes = mm._PNG_ADAM7 if interlace else ((0, 0, 1, 1),)
    raw = b""
    for x0, y0, xs, ys in passes:
        sub = samp[y0::ys, x0::xs]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        raw += _png_filter_fwd(_png_pack(sub, depth), bpp, filters)

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    out += chunk(b"IDAT", zlib.compress(raw))
    return out + chunk(b"IEND", b"")


def test_decode_png_np_sub_byte_and_16bit_depths():
    """Bit depths 1/2/4 (gray scaled to 8-bit, palette raw indexes) and
    16 (MSB reduction) decode exactly, filters exercised on packed rows."""
    rng = np.random.default_rng(31)
    for d in (1, 2, 4):
        g = rng.integers(0, 1 << d, size=(7, 13), dtype=np.uint8)
        got = mm.decode_png_np(_png_bytes_ext(g, 0, d))
        want = (g.astype(np.uint16) * 255 // ((1 << d) - 1)).astype(np.uint8)
        np.testing.assert_array_equal(got, want), d
    plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    for d in (2, 4):
        idx = rng.integers(0, 1 << d, size=(6, 9), dtype=np.uint8)
        got = mm.decode_png_np(_png_bytes_ext(idx, 3, d, plte=plte))
        np.testing.assert_array_equal(got, mm._luma(plte[idx])), d
    g16 = rng.integers(0, 1 << 16, size=(5, 8), dtype=np.uint16)
    np.testing.assert_array_equal(
        mm.decode_png_np(_png_bytes_ext(g16, 0, 16)),
        (g16 >> 8).astype(np.uint8))
    rgb16 = rng.integers(0, 1 << 16, size=(4, 6, 3), dtype=np.uint16)
    np.testing.assert_array_equal(
        mm.decode_png_np(_png_bytes_ext(rgb16, 2, 16)),
        mm._luma((rgb16 >> 8).astype(np.uint8)))


def test_decode_png_np_adam7_interlace():
    """Adam7 reassembles the seven per-pass sub-images (each filtered
    independently): odd dims, sub-byte palette, tiny images with empty
    passes, and truncated interlaced streams."""
    rng = np.random.default_rng(32)
    g = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
    np.testing.assert_array_equal(
        mm.decode_png_np(_png_bytes_ext(g, 0, 8, interlace=1)), g)
    rgba = rng.integers(0, 256, size=(10, 11, 4), dtype=np.uint8)
    np.testing.assert_array_equal(
        mm.decode_png_np(_png_bytes_ext(rgba, 6, 8, interlace=1)),
        mm._luma(rgba))
    plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(12, 7), dtype=np.uint8)
    np.testing.assert_array_equal(
        mm.decode_png_np(_png_bytes_ext(idx, 3, 4, interlace=1, plte=plte)),
        mm._luma(plte[idx]))
    tiny = rng.integers(0, 256, size=(3, 2), dtype=np.uint8)  # empty passes
    np.testing.assert_array_equal(
        mm.decode_png_np(_png_bytes_ext(tiny, 0, 8, interlace=1)), tiny)
    blob = _png_bytes_ext(g, 0, 8, interlace=1)
    assert mm.decode_png_np(blob[: len(blob) - 30]) is None


# -- WebP / TIFF image headers, ISO-BMFF audio headers -----------------------


def test_parse_image_header_webp_and_tiff():
    """Header-real dimensions for WebP (VP8 lossy keyframe, VP8L
    lossless bit-packed, VP8X extended canvas) and TIFF (both endians,
    SHORT and LONG tag types)."""
    import struct
    from semadb_spark.operators import multimodal as mm

    def riff(fourcc, payload):
        chunk = fourcc + struct.pack("<I", len(payload)) + payload
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    vp8 = riff(b"VP8 ", b"\x00\x00\x00" + b"\x9d\x01\x2a"
               + struct.pack("<HH", 320, 240) + b"\x00" * 8)
    assert mm.parse_image_header(vp8) == {
        "format": "webp", "width": 320, "height": 240}
    bits = (99 & 0x3FFF) | ((49 & 0x3FFF) << 14)
    vp8l = riff(b"VP8L", b"\x2f" + struct.pack("<I", bits) + b"\x00" * 6)
    assert mm.parse_image_header(vp8l) == {
        "format": "webp", "width": 100, "height": 50}
    vp8x = riff(b"VP8X", b"\x00" * 4 + (799).to_bytes(3, "little")
                + (599).to_bytes(3, "little") + b"\x00" * 4)
    assert mm.parse_image_header(vp8x) == {
        "format": "webp", "width": 800, "height": 600}
    assert mm.parse_image_header(riff(b"ALPH", b"\x00" * 12)) is None

    def tiff(end, typ, w, h):
        fmt = "<" if end == b"II" else ">"
        magic = b"II*\x00" if end == b"II" else b"MM\x00*"
        out = magic + struct.pack(fmt + "I", 8) + struct.pack(fmt + "H", 2)
        for tag, v in ((256, w), (257, h)):
            if typ == 3:
                out += struct.pack(fmt + "HHIHH", tag, 3, 1, v, 0)
            else:
                out += struct.pack(fmt + "HHII", tag, 4, 1, v)
        return out + struct.pack(fmt + "I", 0)

    assert mm.parse_image_header(tiff(b"II", 3, 640, 480)) == {
        "format": "tiff", "width": 640, "height": 480}
    assert mm.parse_image_header(tiff(b"MM", 4, 123, 45)) == {
        "format": "tiff", "width": 123, "height": 45}
    assert mm.parse_image_header(b"II*\x00\xff\xff\xff\xff") is None


def _mp4_box(btype, payload):
    return (8 + len(payload)).to_bytes(4, "big") + btype + payload


def _m4a_bytes(rate=44100, chans=2, timescale=1000, duration=2500,
               mvhd_v=0):
    import struct

    if mvhd_v:
        mvhd = _mp4_box(b"mvhd", bytes([1, 0, 0, 0]) + b"\x00" * 16
                        + struct.pack(">IQ", timescale, duration)
                        + b"\x00" * 80)
    else:
        mvhd = _mp4_box(b"mvhd", bytes([0, 0, 0, 0]) + b"\x00" * 8
                        + struct.pack(">II", timescale, duration)
                        + b"\x00" * 80)
    mp4a = _mp4_box(b"mp4a", b"\x00" * 16 + struct.pack(">HH", chans, 16)
                    + b"\x00" * 4 + struct.pack(">I", rate << 16))
    stsd = _mp4_box(b"stsd", b"\x00" * 4 + (1).to_bytes(4, "big") + mp4a)
    trak = _mp4_box(b"trak", _mp4_box(b"mdia", _mp4_box(
        b"minf", _mp4_box(b"stbl", stsd))))
    moov = _mp4_box(b"moov", mvhd + trak)
    ftyp = _mp4_box(b"ftyp", b"M4A \x00\x00\x02\x00isomiso2")
    return ftyp + moov


def test_parse_mp4_header_and_audio_features(spark):
    """ISO-BMFF duration from mvhd (both versions) + channels/rate from
    the mp4a sample entry; audio_features reports header-real columns
    with decode-derived NULL; moov-less files decline."""
    from semadb_spark.operators import multimodal as mm

    got = mm.parse_mp4_header(_m4a_bytes())
    assert got == {"format": "mp4", "sample_rate": 44100, "channels": 2,
                   "duration_ms": 2500,
                   "total_samples": 2500 * 44100 // 1000,
                   "width": None, "height": None}
    v1 = mm.parse_mp4_header(_m4a_bytes(rate=48000, chans=1,
                                        timescale=48000, duration=96000,
                                        mvhd_v=1))
    assert v1["duration_ms"] == 2000 and v1["sample_rate"] == 48000
    assert v1["channels"] == 1
    assert mm.parse_mp4_header(_mp4_box(b"ftyp", b"M4A ")) is None
    assert mm.parse_mp4_header(b"not a box") is None
    df = spark.createDataFrame([("m1", bytearray(_m4a_bytes()))],
                               "asset_id string, content binary")
    row = mm.audio_features(df).collect()[0]
    assert row["sample_rate"] == 44100 and row["duration_ms"] == 2500
    assert row["n_samples"] == 110250 and row["rms"] is None


def test_image_features_webp_tiff_header_real(spark):
    """image_features: WebP/TIFF blobs report bytes-real format/dims with
    mean_luma NULL (pixels need a real codec) — never the hash-fake."""
    import struct
    from semadb_spark.operators import multimodal as mm

    payload = (b"VP8 " + struct.pack("<I", 16) + b"\x00\x00\x00"
               + b"\x9d\x01\x2a" + struct.pack("<HH", 64, 32) + b"\x00" * 6)
    webp = b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload
    df = spark.createDataFrame([("w1", bytearray(webp))],
                               "asset_id string, content binary")
    row = mm.image_features(df).collect()[0]
    assert row["format"] == "webp"
    assert (row["width"], row["height"]) == (64, 32)
    assert row["mean_luma"] is None


# -- lossless JPEG (SOF3, T.81 Annex H) --------------------------------------


def _jpeg_bytes_lossless(planes, prec=8, psel=1, pt=0, restart=0):
    """Hand-rolled lossless JPEG: per-sample prediction residuals coded
    with DC size-category huffman; planes are coded-domain ints (already
    point-transformed when pt > 0), interleaved one sample per component."""
    import struct

    planes = [np.asarray(p, dtype=np.int64) for p in planes]
    h, w = planes[0].shape
    ns = len(planes)
    default = 1 << (prec - pt - 1)
    total = h * w

    syms = []  # (size, diff) stream, restart-aware

    def diffs():
        idx = 0
        while idx < total:
            seg_start = idx
            count = restart if restart else total
            out = []
            for _ in range(min(count, total - idx)):
                y, x = divmod(idx, w)
                sy = seg_start // w
                for p in planes:
                    if idx == seg_start:
                        pred = default
                    elif y == sy:
                        pred = int(p[y, x - 1])
                    elif x == 0:
                        pred = int(p[y - 1, 0])
                    else:
                        a, b, c = (int(p[y, x - 1]), int(p[y - 1, x]),
                                   int(p[y - 1, x - 1]))
                        pred = (a, b, c, a + b - c, a + ((b - c) >> 1),
                                b + ((a - c) >> 1), (a + b) >> 1)[psel - 1]
                    d = ((int(p[y, x]) - pred + 32768) & 0xFFFF) - 32768
                    if d == -32768:
                        out.append((16, None))  # diff 32768, no extra bits
                    else:
                        out.append((abs(d).bit_length(), d))
                idx += 1
            yield out

    stream = list(diffs())
    for seg in stream:
        syms.extend(s for s, _ in seg)
    bits_spec, vals, codes = _jpeg_huff_spec(syms or [0])

    def seg_marker(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    sofb = struct.pack(">BHHB", prec, h, w, ns)
    for ci in range(ns):
        sofb += bytes([ci + 1, 0x11, 0])
    out += seg_marker(0xC3, sofb)
    out += seg_marker(0xC4, bytes([0x00] + bits_spec) + bytes(vals))
    if restart:
        out += seg_marker(0xDD, struct.pack(">H", restart))
    sosb = bytes([ns])
    for ci in range(ns):
        sosb += bytes([ci + 1, 0x00])
    sosb += bytes([psel, 0, pt])
    out += seg_marker(0xDA, sosb)
    for i, seg in enumerate(stream):
        if i:
            out += bytes([0xFF, 0xD0 + ((i - 1) % 8)])
        bw = _BitWriter()
        for s, d in seg:
            ln, code = codes[s]
            bw.write(code, ln)
            if s and s != 16:
                bw.write(d if d >= 0 else d + (1 << s) - 1, s)
        out += bw.tobytes_stuffed()
    return out + b"\xff\xd9"


def test_decode_jpeg_lossless_all_predictors():
    """SOF3 is LOSSLESS: every predictor 1-7 round-trips an arbitrary
    8-bit image EXACTLY; restart intervals (mid-line) reset prediction."""
    rng = np.random.default_rng(41)
    y = rng.integers(0, 256, size=(9, 13), dtype=np.uint8).astype(np.int64)
    for psel in range(1, 8):
        got = mm.decode_jpeg_np(_jpeg_bytes_lossless([y], psel=psel))
        assert got is not None, psel
        np.testing.assert_array_equal(got, y.astype(np.uint8)), psel
    got_r = mm.decode_jpeg_np(_jpeg_bytes_lossless([y], psel=4, restart=5))
    np.testing.assert_array_equal(got_r, y.astype(np.uint8))


def test_decode_jpeg_lossless_precision_and_multicomp():
    """16-bit precision reduces to the high byte (incl. the SSSS=16 /
    diff=32768 no-extra-bits path); 12-bit with a point transform shifts
    back; interleaved 3-component scans return the first plane."""
    rng = np.random.default_rng(42)
    g16 = rng.integers(0, 1 << 16, size=(6, 7)).astype(np.int64)
    g16[0, 0], g16[0, 1] = 0, 32768  # force the SSSS=16 escape
    got = mm.decode_jpeg_np(_jpeg_bytes_lossless([g16], prec=16))
    np.testing.assert_array_equal(got, (g16 >> 8).astype(np.uint8))
    # 12-bit, point transform 2: coded domain shifts back then reduces
    g12 = rng.integers(0, 1 << 10, size=(5, 8)).astype(np.int64)
    got12 = mm.decode_jpeg_np(_jpeg_bytes_lossless([g12], prec=12, pt=2))
    np.testing.assert_array_equal(
        got12, np.clip((g12 << 2) >> 4, 0, 255).astype(np.uint8))
    # interleaved RGB-ish: first component is the reported luma plane
    planes = [rng.integers(0, 256, size=(4, 6)).astype(np.int64)
              for _ in range(3)]
    got3 = mm.decode_jpeg_np(_jpeg_bytes_lossless(planes, psel=7))
    np.testing.assert_array_equal(got3, planes[0].astype(np.uint8))


def test_decode_jpeg_lossless_declines_out_of_scope():
    """Truncated lossless scans and subsampled lossless decline to None."""
    rng = np.random.default_rng(43)
    y = rng.integers(0, 256, size=(8, 8)).astype(np.int64)
    good = _jpeg_bytes_lossless([y])
    assert mm.decode_jpeg_np(good[: len(good) - 12]) is None
    sub = bytearray(good)
    i = sub.index(b"\xff\xc3")
    sub[i + 11] = 0x22  # sampling factors != 1x1
    assert mm.decode_jpeg_np(bytes(sub)) is None


# -- AIFF (big-endian PCM) + BMP low-depth / RLE -----------------------------


def _aiff_bytes(x, rate, bits=16, channels=1, compress=None):
    """AIFF/AIFC encoder: COMM with the 80-bit extended-float rate, SSND
    big-endian PCM (or little-endian for 'sowt')."""
    import struct

    x = np.asarray(x)
    frames = x.shape[0]
    flat = x.reshape(-1)
    # 80-bit extended float from an int rate
    e = rate.bit_length() - 1
    mant = rate << (63 - e)
    f80 = struct.pack(">HQ", 16383 + e, mant)
    comm_body = struct.pack(">HIH", channels, frames, bits) + f80
    form_type = b"AIFF"
    if compress:
        comm_body += compress + b"\x00"  # pstring name (empty)
        form_type = b"AIFC"
    if bits == 16:
        dt = "<i2" if compress == b"sowt" else ">i2"
        pcm = flat.astype(dt).tobytes()
    elif bits == 8:
        pcm = flat.astype(np.int8).tobytes()
    else:
        raise AssertionError
    chunks = b""
    for cid, body in ((b"COMM", comm_body),
                      (b"SSND", struct.pack(">II", 0, 0) + pcm)):
        chunks += cid + struct.pack(">I", len(body)) + body
        if len(body) & 1:
            chunks += b"\x00"
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + form_type + chunks


def test_decode_aiff_np_roundtrip(spark):
    """AIFF decodes REAL big-endian PCM: 80-bit rate parse, stereo
    downmix, signed 8-bit, AIFC 'sowt' byte-swap; compressed AIFC
    declines; audio_features reports exact rms."""
    from semadb_spark.operators import multimodal as mm

    rng = np.random.default_rng(51)
    st = rng.integers(-30000, 30000, size=(200, 2)).astype(np.int64)
    mono, rate = mm.decode_aiff_np(_aiff_bytes(st, 44100, channels=2))
    assert rate == 44100
    np.testing.assert_allclose(mono, st.mean(axis=1) / 32768.0, rtol=0, atol=0)
    x8 = rng.integers(-128, 128, size=100).astype(np.int64)
    m8, r8 = mm.decode_aiff_np(_aiff_bytes(x8, 8000, bits=8))
    assert r8 == 8000
    np.testing.assert_allclose(m8, x8 / 128.0)
    xs = rng.integers(-30000, 30000, size=150).astype(np.int64)
    ms, rs = mm.decode_aiff_np(_aiff_bytes(xs, 22050, compress=b"sowt"))
    assert rs == 22050
    np.testing.assert_allclose(ms, xs / 32768.0)
    assert mm.decode_aiff_np(_aiff_bytes(xs, 22050, compress=b"ima4")) is None
    assert mm.decode_aiff_np(b"FORMxxxxAIFF") is None
    df = spark.createDataFrame(
        [("a1", bytearray(_aiff_bytes(st, 44100, channels=2)))],
        "asset_id string, content binary")
    row = mm.audio_features(df).collect()[0]
    assert row["sample_rate"] == 44100 and row["n_samples"] == 200
    want = st.mean(axis=1) / 32768.0
    assert abs(row["rms"] - float(np.sqrt(np.mean(want * want)))) < 1e-12


def _bmp_raw(w, h, bpp, rows_packed, pal, compression=0, rle=b""):
    import struct

    pal_bytes = b"".join(bytes([b, g, r, 0]) for r, g, b in pal)
    offset = 14 + 40 + len(pal_bytes)
    body = rle if compression else rows_packed
    hdr = (b"BM" + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, compression,
                         len(body), 0, 0, len(pal), 0))
    return hdr + pal_bytes + body


def test_decode_bmp_np_low_depth_and_rle():
    """1/4-bit palette rows (MSB-first, padded) and BI_RLE8/BI_RLE4
    (runs, absolute mode, EOL/EOB/delta escapes) decode exactly."""
    from semadb_spark.operators import multimodal as mm

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    # 4-bit, 3x2, bottom-up: rows pack two nibbles/byte, padded to 4
    want_idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    rows = bytes([0x01, 0x20, 0, 0]) + bytes([0x32, 0x10, 0, 0])
    packed = rows[4:8] + rows[0:4]  # bottom-up storage
    got = mm.decode_bmp_np(_bmp_raw(3, 2, 4, packed, pal))
    np.testing.assert_array_equal(
        got, mm._luma(np.array(pal, dtype=np.uint8)[want_idx]))
    # 1-bit, 10x1: bits MSB-first across two bytes
    bits_row = bytes([0b10110001, 0b01000000, 0, 0])
    got1 = mm.decode_bmp_np(_bmp_raw(10, 1, 1, bits_row, pal[:2]))
    idx1 = np.array([[1, 0, 1, 1, 0, 0, 0, 1, 0, 1]], dtype=np.uint8)
    np.testing.assert_array_equal(
        got1, mm._luma(np.array(pal[:2], dtype=np.uint8)[idx1]))
    # RLE8 4x3: run, EOL, absolute(3)+pad, delta skip, EOB
    rle8 = bytes([4, 2,            # row0 (bottom): 2 2 2 2
                  0, 0,            # EOL
                  0, 3, 1, 0, 3, 0,  # absolute: 1 0 3 (+pad)
                  1, 1,            # then one pixel of 1
                  0, 0,            # EOL
                  0, 2, 1, 0,      # delta: skip 1 px
                  3, 3,            # 3 pixels of 3
                  0, 1])           # EOB
    got8 = mm.decode_bmp_np(_bmp_raw(4, 3, 8, b"", pal, compression=1,
                                     rle=rle8))
    idx8 = np.array([[0, 3, 3, 3],
                     [1, 0, 3, 1],
                     [2, 2, 2, 2]], dtype=np.uint8)
    np.testing.assert_array_equal(
        got8, mm._luma(np.array(pal, dtype=np.uint8)[idx8]))
    # RLE4 5x2: alternating-nibble run + odd absolute
    rle4 = bytes([4, 0x12,         # 1 2 1 2
                  1, 0x30,         # 3
                  0, 0,            # EOL
                  0, 3, 0x01, 0x20,  # absolute 0 1 2 (word-aligned)
                  2, 0x33,         # 3 3
                  0, 1])           # EOB
    got4 = mm.decode_bmp_np(_bmp_raw(5, 2, 4, b"", pal, compression=2,
                                     rle=rle4))
    idx4 = np.array([[0, 1, 2, 3, 3],
                     [1, 2, 1, 2, 3]], dtype=np.uint8)
    np.testing.assert_array_equal(
        got4, mm._luma(np.array(pal, dtype=np.uint8)[idx4]))
    # truncated RLE (no EOB) declines
    assert mm.decode_bmp_np(_bmp_raw(4, 3, 8, b"", pal, compression=1,
                                     rle=bytes([4, 2]))) is None


# -- adversarial robustness: decoders never raise on mutated bytes -----------


def test_decoders_never_raise_on_mutated_blobs():
    """The untrusted-corpus contract: every decoder returns None (or a
    valid decode) on arbitrarily corrupted inputs — truncations, byte
    flips, and splices of valid media — and NEVER raises. 900+ mutants
    across all formats."""
    from semadb_spark.operators import multimodal as mm

    rng = np.random.default_rng(99)
    y8 = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    pal = np.array([[0, 0, 0], [255, 255, 255], [255, 0, 0], [0, 255, 0]],
                   dtype=np.uint8)
    samples = rng.integers(-2000, 2000, size=300).astype(np.int64)
    valid = [
        _png_bytes_ext(y8, 0, 8),
        _png_bytes_ext(y8, 0, 8, interlace=1),
        _png_bytes_ext((y8 & 1), 3, 1, plte=pal),
        _jpeg_bytes(y8),
        _jpeg_bytes_progressive(y8),
        _jpeg_bytes_lossless([y8.astype(np.int64)]),
        _gif_bytes(np.zeros((8, 8), dtype=np.uint8), pal),
        _bmp_bytes(np.stack([y8] * 3, axis=-1), bpp=24),
        _wav_bytes(np.zeros(64), 8000),
        _aiff_bytes(samples, 22050),
        _flac_file([samples], 16000, 16, frames_of=300),
        _m4a_bytes(),
    ]
    decoders = [
        mm.decode_png_np, mm.decode_jpeg_np, mm.decode_gif_np,
        mm.decode_bmp_np, mm.decode_wav_np, mm.decode_aiff_np,
        mm.decode_flac_np, mm.try_decode_image_np,
        mm.parse_image_header, mm.parse_audio_header,
    ]
    for blob in valid:
        blob = bytes(blob)
        mutants = [blob[: len(blob) // 3], blob[: len(blob) - 5],
                   blob[5:], blob + blob[:40]]
        for _ in range(8):
            b = bytearray(blob)
            for _ in range(4):
                b[rng.integers(0, len(b))] = rng.integers(0, 256)
            mutants.append(bytes(b))
        for m in mutants:
            for dec in decoders:
                dec(m)  # must not raise; return value unconstrained


def test_flac_roundtrip_property():
    """Property: ANY int16 signal round-trips bit-exact through every
    (subframe kind, stereo mode, partition order) combination."""
    from hypothesis import given, settings, strategies as st
    from semadb_spark.operators import multimodal as mm

    @settings(max_examples=12, deadline=None)
    @given(
        seed=st.integers(0, 2**31),
        step=st.integers(1, 12000),
        mode=st.sampled_from(
            ["independent", "left_side", "right_side", "mid_side"]),
        order=st.integers(0, 4),
        po=st.sampled_from([0, 1, 2]),
    )
    def check(seed, step, mode, order, po):
        l = _walk(256, step=step, seed=seed)
        r = _walk(256, step=step, seed=seed + 1)
        data = _flac_file([l, r], 32000, 16, frames_of=128,
                          chan_mode=mode, orders=[order, order], po=po)
        got = mm.decode_flac_np(data)
        assert got is not None
        np.testing.assert_array_equal(got[0], _flac_expected_mono([l, r], 16))

    check()


def test_png_roundtrip_property():
    """Property: ANY image round-trips through every (depth, color type,
    interlace) combination with mixed filters."""
    from hypothesis import given, settings, strategies as st
    from semadb_spark.operators import multimodal as mm

    @settings(max_examples=12, deadline=None)
    @given(
        seed=st.integers(0, 2**31),
        w=st.integers(1, 17),
        h=st.integers(1, 12),
        depth=st.sampled_from([1, 2, 4, 8, 16]),
        interlace=st.sampled_from([0, 1]),
    )
    def check(seed, w, h, depth, interlace):
        rng = np.random.default_rng(seed)
        if depth == 16:
            g = rng.integers(0, 1 << 16, size=(h, w)).astype(np.uint16)
            want = (g >> 8).astype(np.uint8)
        else:
            g = rng.integers(0, 1 << depth, size=(h, w)).astype(np.uint8)
            want = (g.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(
                np.uint8) if depth < 8 else g
        got = mm.decode_png_np(_png_bytes_ext(g, 0, depth,
                                              interlace=interlace))
        np.testing.assert_array_equal(got, want)

    check()


def test_video_features_isobmff_dims(spark):
    """video_features: ISO-BMFF blobs with a video tkhd report
    container-real dims + duration; audio-only MP4 and junk report NULL
    metadata. Audio features stay unaffected by the tkhd addition."""
    import struct
    from semadb_spark.operators import multimodal as mm

    def m4v_bytes(w, h, timescale=600, duration=1200):
        mvhd = _mp4_box(b"mvhd", bytes([0, 0, 0, 0]) + b"\x00" * 8
                        + struct.pack(">II", timescale, duration)
                        + b"\x00" * 80)
        tkhd = _mp4_box(b"tkhd", bytes([0, 0, 0, 7]) + b"\x00" * 72
                        + struct.pack(">II", w << 16, h << 16))
        moov = _mp4_box(b"moov", mvhd + _mp4_box(b"trak", tkhd))
        return _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov

    got = mm.parse_mp4_header(m4v_bytes(1920, 1080))
    assert got["width"] == 1920 and got["height"] == 1080
    assert got["duration_ms"] == 2000 and got["sample_rate"] is None
    df = spark.createDataFrame(
        [("v1", bytearray(m4v_bytes(640, 360))),
         ("a1", bytearray(_m4a_bytes())),
         ("x1", bytearray(b"not video"))],
        "asset_id string, content binary")
    rows = {r["asset_id"]: r for r in mm.video_features(df).collect()}
    v = rows["v1"]
    assert (v["width"], v["height"]) == (640, 360)
    assert v["format"] == "mp4" and v["duration_ms"] == 2000
    assert rows["a1"]["width"] is None  # audio-only: no video dims
    assert rows["x1"]["format"] is None


# -- ID3 tags ----------------------------------------------------------------


def _id3v1(title="My Song", artist="The Band", album="LP", year="1999",
           track=None, genre=17):
    t = bytearray(b"TAG")
    for s, w in ((title, 30), (artist, 30), (album, 30), (year, 4)):
        t += s.encode("latin-1").ljust(w, b"\x00")
    comment = bytearray(30)
    if track is not None:
        comment[28] = 0
        comment[29] = track
    t += comment
    t.append(genre)
    return bytes(t)


def _id3v2_frame(fid, text, enc=3, major=4):
    if enc == 0:
        payload = b"\x00" + text.encode("latin-1")
    elif enc == 1:
        payload = b"\x01" + text.encode("utf-16")
    else:
        payload = b"\x03" + text.encode("utf-8")
    size = len(payload)
    if major >= 4:
        sz = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                    (size >> 7) & 0x7F, size & 0x7F])
    else:
        sz = size.to_bytes(4, "big")
    return fid.encode() + sz + b"\x00\x00" + payload


def _id3v2(frames, major=4):
    body = b"".join(frames)
    size = len(body)
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                (size >> 7) & 0x7F, size & 0x7F])
    return b"ID3" + bytes([major, 0, 0]) + ss + body


def test_id3v1_trailer():
    from semadb_spark.operators.multimodal import parse_id3_tags

    blob = b"\xffdummyaudio" + _id3v1(track=7)
    tags = parse_id3_tags(blob)
    assert tags["title"] == "My Song" and tags["artist"] == "The Band"
    assert tags["year"] == "1999" and tags["genre_id"] == 17
    assert tags["track"] == "7"


def test_id3v2_text_frames_win_over_v1():
    from semadb_spark.operators.multimodal import parse_id3_tags

    v2 = _id3v2([
        _id3v2_frame("TIT2", "Nouveau Titre é"),
        _id3v2_frame("TPE1", "Artiste", enc=1),     # utf-16 with BOM
        _id3v2_frame("TDRC", "2024-05-01T12:00"),   # v2.4 timestamp -> year
    ])
    blob = v2 + b"audio" + _id3v1(title="Old Title")
    tags = parse_id3_tags(blob)
    assert tags["title"] == "Nouveau Titre é"      # v2 beats v1
    assert tags["artist"] == "Artiste"
    assert tags["year"] == "2024"
    assert tags["album"] == "LP"                    # v1 fills v2 gaps


def test_id3v23_plain_sizes_and_v22_ids():
    from semadb_spark.operators.multimodal import parse_id3_tags

    v23 = _id3v2([_id3v2_frame("TALB", "Album23", major=3)], major=3)
    assert parse_id3_tags(v23 + b"x")["album"] == "Album23"
    # v2.2: 3-char ids, 3-byte sizes
    payload = b"\x00Tape"
    fr = b"TT2" + len(payload).to_bytes(3, "big") + payload
    body = fr
    ss = bytes([0, 0, (len(body) >> 7) & 0x7F, len(body) & 0x7F])
    v22 = b"ID3" + bytes([2, 0, 0]) + ss + body
    assert parse_id3_tags(v22 + b"x")["title"] == "Tape"


def _ss4(size):
    return bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                  (size >> 7) & 0x7F, size & 0x7F])


def test_id3v2_extended_header_and_footer():
    from semadb_spark.operators.multimodal import parse_id3_tags

    # v2.4 ext header (flag 0x40): syncsafe size INCLUDING itself
    fr = _id3v2_frame("TIT2", "ExtTitle")
    ext = _ss4(6) + bytes([1, 0])           # size=6: 4 size + flag count + flags
    body = ext + fr
    v24 = b"ID3" + bytes([4, 0, 0x40]) + _ss4(len(body)) + body
    assert parse_id3_tags(v24 + b"x")["title"] == "ExtTitle"

    # v2.4 footer (flag 0x10) lives AFTER the frames — must not shift start
    fr2 = _id3v2_frame("TIT2", "FootTitle")
    footer = b"3DI" + bytes([4, 0, 0x10]) + _ss4(len(fr2))
    v24f = b"ID3" + bytes([4, 0, 0x10]) + _ss4(len(fr2)) + fr2 + footer
    assert parse_id3_tags(v24f)["title"] == "FootTitle"

    # v2.3 ext header: plain 4-byte size EXCLUDING the size field itself
    fr3 = _id3v2_frame("TALB", "ExtAlbum", major=3)
    ext3 = (6).to_bytes(4, "big") + b"\x00\x00" + (0).to_bytes(4, "big")
    body3 = ext3 + fr3
    v23 = b"ID3" + bytes([3, 0, 0x40]) + _ss4(len(body3)) + body3
    assert parse_id3_tags(v23 + b"x")["album"] == "ExtAlbum"


def test_id3_hostile_bytes_never_raise():
    from semadb_spark.operators.multimodal import parse_id3_tags

    assert parse_id3_tags(b"") is None
    assert parse_id3_tags(b"no tags here at all") is None
    v2 = _id3v2([_id3v2_frame("TIT2", "x" * 100)])
    for cut in (5, 11, 20, len(v2) - 3):
        parse_id3_tags(v2[:cut])  # must not raise
    garbage = b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f" + b"\xff" * 50
    parse_id3_tags(garbage)


def test_audio_tags_operator(spark):
    from semadb_spark.operators.multimodal import audio_tags

    v2 = _id3v2([_id3v2_frame("TIT2", "Song A")])
    df = spark.createDataFrame(
        [("a", bytearray(v2 + b"audio")), ("b", bytearray(b"untagged")),
         ("c", None)],
        "asset_id string, content binary",
    )
    rows = {r["asset_id"]: r for r in audio_tags(df).collect()}
    assert rows["a"]["title"] == "Song A"
    assert rows["b"]["title"] is None and rows["b"]["genre_id"] is None
    assert "c" not in rows  # null blobs dropped like audio_features
