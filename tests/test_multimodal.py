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
