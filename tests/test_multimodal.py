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
