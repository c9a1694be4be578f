"""C5: multimodal column plumbing — schema contract, Arrow batch path,
determinism, null payloads, byte-aware repartition."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgre_to_clickhouse_spark.operators import multimodal as M


def test_bmp_codec_roundtrip():
    import numpy as np

    rng = np.random.default_rng(7)
    for h, w in [(8, 8), (5, 3), (1, 1), (4, 7)]:  # odd widths exercise row padding
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        data = M.encode_bmp(arr)
        assert data[:2] == b"BM"
        back = M.decode_bmp(data)
        assert back.shape == (h, w, 3)
        assert (back == arr).all()


def test_ppm_codec_roundtrip():
    import numpy as np

    rng = np.random.default_rng(8)
    arr = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    data = M.encode_ppm(arr)
    assert data[:2] == b"P6"
    assert (M.decode_ppm(data) == arr).all()


def test_wav_codec_roundtrip():
    import numpy as np

    rng = np.random.default_rng(9)
    mono = (rng.standard_normal(300) * 10000).astype(np.int16)
    pcm, rate = M.decode_wav(M.encode_wav(mono, 22050))
    assert rate == 22050 and (pcm == mono).all()
    stereo = (rng.standard_normal((100, 2)) * 10000).astype(np.int16)
    pcm2, rate2 = M.decode_wav(M.encode_wav(stereo, 8000))
    assert rate2 == 8000 and pcm2.shape == (100, 2) and (pcm2 == stereo).all()


def test_decode_dispatch_real_codecs():
    """_decode_image/_decode_audio must route real container bytes
    through the real codecs, not the deterministic fake."""
    import numpy as np

    arr = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    assert (M._decode_image(M.encode_bmp(arr)) == arr).all()
    assert (M._decode_image(M.encode_ppm(arr)) == arr).all()
    pcm = (np.arange(64) - 32).astype(np.int16)
    out = M._decode_audio(M.encode_wav(pcm, 16000))
    assert np.allclose(out, pcm.astype(np.float32) / 32768.0)


def test_media_schema_roundtrip(spark):
    media = M.synthetic_media(spark, 16)
    assert media.schema == M.MEDIA_SCHEMA
    assert media.count() == 16
    img = media.filter(F.col("modality") == "image").first()
    assert img.image_meta.width == 8 and img.audio_meta is None


def test_feature_extraction_shape_and_determinism(spark):
    media = M.synthetic_media(spark, 16)
    f1 = {r.media_id: r.feature for r in M.extract_features(media).collect()}
    f2 = {r.media_id: r.feature for r in M.extract_features(media).collect()}
    assert set(f1) == set(range(16))
    assert all(len(v) == M.FEATURE_DIM for v in f1.values())
    assert f1 == f2  # content-derived fake decode → reproducible


def test_feature_extraction_null_payload(spark):
    media = M.synthetic_media(spark, 4).withColumn(
        "payload", F.when(F.col("media_id") == 0, None).otherwise(F.col("payload"))
    )
    out = {r.media_id: r for r in M.extract_features(media).collect()}
    assert out[0].feature is None and out[0].payload_bytes is None
    assert out[1].feature is not None


def test_media_repartition_spreads_rows(spark):
    media = M.synthetic_media(spark, 64)
    out = M.media_repartition(media, target_bytes=512)  # force multiple buckets
    assert out.count() == 64
    assert out.rdd.getNumPartitions() > 1


def test_feature_path_is_arrow_not_row_python(spark):
    media = M.synthetic_media(spark, 4)
    df = M.extract_features(media)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()
    assert "BatchEvalPython" not in plan


def test_resize_images_shape(spark):
    media = M.synthetic_media(spark, 8)
    out = {r.media_id: r for r in M.resize_images(media, width=4, height=4).collect()}
    assert set(out) == {0, 2, 4, 6}  # images only (even ids)
    assert all(len(r.pixels) == 4 * 4 * 3 for r in out.values())
    # deterministic
    out2 = {r.media_id: r.pixels for r in M.resize_images(media, 4, 4).collect()}
    assert {k: v.pixels for k, v in out.items()} == out2


def test_sample_video_frames_explodes(spark):
    media = M.synthetic_media(spark, 4)
    out = M.sample_video_frames(media, n_frames=3).collect()
    assert len(out) == 4 * 3
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 1, 2] for v in by_media.values())
    feats = {(r.media_id, r.frame_idx): tuple(r.frame_feature) for r in out}
    assert len(set(feats.values())) == len(feats)  # frames differ per index
