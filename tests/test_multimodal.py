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


def test_png_codec_roundtrip_all_filters_and_levels():
    """Encode→decode must be the identity for every PNG filter type
    (None/Sub/Up/Average/Paeth), mixed per-scanline filters, and both
    stored (level 0) and compressed deflate streams."""
    import numpy as np

    from postgre_to_clickhouse_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    for h, w in [(8, 8), (5, 3), (1, 1), (16, 7)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for level in (0, 9):
            for filters in (None, [1] * h, [2] * h, [3] * h, [4] * h,
                            [y % 5 for y in range(h)]):
                out = decode_png(encode_png(img, compress_level=level, filters=filters))
                assert np.array_equal(out, img), (h, w, level, filters)


def test_png_stored_size_closed_form():
    """Level-0 (stored deflate) PNG byte count is closed-form — the
    contract the multimodal_image_stats oracle's payload_bytes CASE
    relies on: 8 sig + 25 IHDR + 12+len(idat) IDAT + 12 IEND, with
    idat = 2 + 5·ceil(n/65535) + n + 4 for n raw filtered bytes."""
    import numpy as np

    from postgre_to_clickhouse_spark.operators.multimodal import encode_png

    for h, w in [(8, 8), (4, 16), (64, 80)]:
        n = h * (1 + w * 3)
        blocks = -(-n // 65535)
        expect = 8 + 25 + 12 + (2 + 5 * blocks + n + 4) + 12
        img = np.zeros((h, w, 3), dtype=np.uint8)
        assert len(encode_png(img, compress_level=0)) == expect


def test_png_grayscale_decodes_to_rgb():
    """Color-type-0 (grayscale) PNGs decode with channels replicated —
    hand-built via the chunk writer so the decoder, not the encoder,
    is what's under test."""
    import struct as _struct
    import zlib

    import numpy as np

    from postgre_to_clickhouse_spark.operators.multimodal import (
        PNG_SIG,
        _png_chunk,
        decode_png,
    )

    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    raw = b"".join(b"\x00" + gray[y].tobytes() for y in range(3))
    data = (
        PNG_SIG
        + _png_chunk(b"IHDR", _struct.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert out.shape == (3, 4, 3)
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)
    assert np.array_equal(out[:, :, 2], gray)


def test_media_from_ids_mix_dispatch(spark):
    """fmt='mix' emits PNG for odd ids, BMP for even, and image_stats
    decodes both to identical pixel content (same closed-form rule)."""
    from postgre_to_clickhouse_spark.operators.multimodal import (
        PNG_SIG,
        image_stats,
        media_from_ids,
    )

    ids = spark.range(0, 6).withColumnRenamed("id", "doc_id")
    media = media_from_ids(ids, id_col="doc_id", height=8, width=8, fmt="mix")
    rows = {r.doc_id: bytes(r.payload) for r in media.collect()}
    for i, payload in rows.items():
        if i % 2 == 1:
            assert payload[:8] == PNG_SIG
            assert len(payload) == 268
        else:
            assert payload[:2] == b"BM"
            assert len(payload) == 246
    stats = {r.doc_id: r for r in image_stats(media).collect()}
    for i in range(6):
        expect = sum((i * 7 + j) % 256 for j in range(192))
        assert stats[i].pixel_sum == expect, i
        assert stats[i].corner_tl == (i * 7) % 256


def test_extract_features_quarantines_corrupt_payloads(spark):
    """on_error='null': truncated/garbage blobs yield null cells, valid
    rows in the SAME batch still decode; default mode stays loud."""
    import numpy as np
    import pytest as _pytest

    good = M.encode_bmp(np.full((4, 4, 3), 7, dtype=np.uint8))
    rows = [
        (1, "image", bytearray(good)),
        (2, "image", bytearray(good[:10])),          # truncated BMP header
        (3, "image", bytearray(b"P6 garbage not a ppm")),  # lying magic
        (4, "image", None),
    ]
    media = spark.createDataFrame(rows, "media_id long, modality string, payload binary")
    out = {r.media_id: r for r in M.extract_features(media, on_error="null").collect()}
    assert out[1].feature is not None and out[1].payload_bytes == len(good)
    assert out[2].feature is None and out[2].payload_bytes is None
    assert out[3].feature is None
    assert out[4].feature is None
    with _pytest.raises(Exception):
        M.extract_features(media).collect()  # default: loud


# --------------------------------------------------------------------------
# r6: baseline JPEG codec (operators/jpeg.py)
# --------------------------------------------------------------------------
def _smooth(img):
    import numpy as np

    s = img.astype(float)
    for _ in range(3):
        s = (np.roll(s, 1, 0) + np.roll(s, -1, 0) + np.roll(s, 1, 1) + np.roll(s, -1, 1) + s) / 5
    return s.astype(np.uint8)


def _psnr(a, b):
    import numpy as np

    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def test_jpeg_block_constant_exact():
    """Block-constant grayscale survives the all-8 quantization
    EXACTLY — DC-only blocks, power-of-two IDCT scales (this is what
    makes the mix3 driver oracle closed-form)."""
    import numpy as np

    from postgre_to_clickhouse_spark.operators import jpeg as J

    q8 = np.full((8, 8), 8, dtype=np.int32)
    for v in (0, 32, 127, 160, 191, 243):
        img = np.zeros((16, 16), dtype=np.uint8)
        img[:8, :8] = v
        img[:8, 8:] = min(255, v + 4)
        img[8:, :8] = min(255, v + 8)
        img[8:, 8:] = min(255, v + 12)
        out = J.decode_jpeg(J.encode_jpeg(img, quant_lum=q8))
        assert (out == np.stack([img] * 3, axis=2)).all(), v


def test_jpeg_fixture_payload_length_constant():
    """The mix3 oracle hardcodes 336 payload bytes; assert it over the
    ENTIRE v domain (all 32 values) so no doc_id can hit a byte-
    stuffing length variation."""
    import numpy as np

    from postgre_to_clickhouse_spark.operators import jpeg as J

    q8 = np.full((8, 8), 8, dtype=np.int32)
    lens = set()
    for m in range(32):
        v = 160 + m
        img = np.zeros((16, 16), dtype=np.uint8)
        img[:8, :8] = v
        img[:8, 8:] = v + 4
        img[8:, :8] = v + 8
        img[8:, 8:] = v + 12
        lens.add(len(J.encode_jpeg(img, quant_lum=q8)))
    assert lens == {336}


def test_jpeg_roundtrip_psnr():
    """General lossy path: AC coefficients, run-length/ZRL/EOB, odd
    dimensions (edge-replicated padding), grayscale + RGB 4:4:4."""
    import numpy as np

    from postgre_to_clickhouse_spark.operators import jpeg as J

    rng = np.random.default_rng(42)
    gray = _smooth(rng.integers(0, 256, size=(24, 33), dtype=np.uint8))
    out = J.decode_jpeg(J.encode_jpeg(gray, quality=95))
    assert out.shape == (24, 33, 3)
    assert _psnr(out[:, :, 0], gray) > 35

    yy, xx = np.mgrid[0:17, 0:21]
    rgb = np.stack([(yy * 7) % 256, (xx * 11) % 256, ((yy + xx) * 5) % 256], axis=2).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(rgb, quality=95))
    assert out.shape == (17, 21, 3)
    assert _psnr(out, rgb) > 30


def test_jpeg_restart_markers():
    """DRI/RSTn: byte-aligned restarts with DC-prediction resets decode
    identically to the unrestarted stream."""
    import numpy as np

    from postgre_to_clickhouse_spark.operators import jpeg as J

    rng = np.random.default_rng(5)
    img = _smooth(rng.integers(0, 256, size=(16, 40), dtype=np.uint8))  # 10 MCUs
    plain = J.decode_jpeg(J.encode_jpeg(img, quality=90))
    restarted = J.decode_jpeg(J.encode_jpeg(img, quality=90, restart_interval=2))
    assert (plain == restarted).all()


def test_jpeg_rejects_progressive():
    import numpy as np
    import pytest as _pytest

    from postgre_to_clickhouse_spark.operators import jpeg as J

    data = bytearray(J.encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    # flip SOF0 (0xC0) to SOF2 (progressive) in place
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with _pytest.raises(NotImplementedError):
        J.decode_jpeg(bytes(data))


def test_media_from_ids_mix3_jpeg_arm(spark):
    """mix3: per-row three-format dispatch; the JPEG arm decodes back
    to its closed-form block pattern exactly."""
    import numpy as np

    from postgre_to_clickhouse_spark.operators.multimodal import (
        image_stats,
        media_from_ids,
    )

    ids = spark.range(9).select(F.col("id").alias("doc_id"))
    media = media_from_ids(ids, id_col="doc_id", height=8, width=8, fmt="mix3")
    rows = {r.doc_id: bytes(r.payload) for r in media.collect()}
    assert rows[0][:2] == b"BM" and rows[3][:2] == b"BM"
    assert rows[1][:8] == M.PNG_SIG and rows[4][:8] == M.PNG_SIG
    assert rows[2][:2] == b"\xff\xd8" and len(rows[2]) == 336
    stats = {r.doc_id: r for r in image_stats(media).collect()}
    for i in (2, 5, 8):
        v = 160 + (i * 7) % 32
        assert stats[i].width == 16 and stats[i].height == 16
        assert stats[i].pixel_sum == 768 * v + 4608
        assert stats[i].corner_tl == v and stats[i].corner_br == v + 12
    for i in (0, 1, 3, 4):
        assert stats[i].pixel_sum == sum((i * 7 + j) % 256 for j in range(192))


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 chroma subsampling: 16x16 MCUs (4 Y blocks + Cb + Cr),
    box-downsampled chroma on encode, box-upsampled on decode — the
    sampling-factor path real-world JPEGs overwhelmingly use."""
    import numpy as np

    from postgre_to_clickhouse_spark.operators import jpeg as J

    yy, xx = np.mgrid[0:22, 0:30]
    rgb = np.stack([(yy * 5) % 256, (xx * 9) % 256, ((yy + xx) * 3) % 256], axis=2).astype(np.uint8)
    rgb = np.stack([_smooth(rgb[:, :, c]) for c in range(3)], axis=2)
    enc = J.encode_jpeg(rgb, quality=92, subsample=True)
    dec = J.decode_jpeg(enc)
    assert dec.shape == (22, 30, 3)
    assert _psnr(dec, rgb) > 27
    # restart markers interleave correctly with multi-block MCUs
    dec2 = J.decode_jpeg(J.encode_jpeg(rgb, quality=92, subsample=True, restart_interval=1))
    assert (dec == dec2).all()


def test_gif_codec_lossless_roundtrip():
    """r6 GIF89a codec: full LZW (dict build, width growth, KwKwK,
    clear-on-overflow) — animation roundtrips losslessly."""
    import numpy as np

    from postgre_to_clickhouse_spark.operators import gif as G

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, size=(17, 23), dtype=np.uint8) for _ in range(5)]
    data = G.encode_gif(frames)
    assert data[:6] == b"GIF89a"
    back = G.decode_gif(data)
    assert len(back) == 5
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)
    assert data == G.encode_gif(frames)  # byte-deterministic
    # long constant runs stress the clear/width path
    flat = [np.zeros((64, 64), dtype=np.uint8), np.full((64, 64), 255, dtype=np.uint8)]
    back2 = G.decode_gif(G.encode_gif(flat))
    assert np.array_equal(back2[0], flat[0]) and np.array_equal(back2[1], flat[1])


def test_gif_video_stats_match_frame_formula(spark):
    import numpy as np

    from postgre_to_clickhouse_spark.operators.multimodal import (
        gif_frame_stats,
        gif_from_ids,
    )
    from pyspark.sql import functions as F

    ids = spark.range(6).select(F.col("id").alias("doc_id"))
    stats = {(r.doc_id, r.frame_idx): r for r in gif_frame_stats(gif_from_ids(ids)).collect()}
    for i in range(6):
        base = ((i * 7 + np.arange(64)) % 256).reshape(8, 8)
        for f in range(4):
            fr = (np.roll(base, -f, axis=0) + f) % 256
            s = stats[(i, f)]
            assert s.px_sum == int(fr.sum()) and s.first_px == int(fr[0, 0])


def test_extract_features_decodes_gif_and_jpeg(spark):
    """The feature extractor's magic-byte dispatch covers all five real
    codecs — GIF (first frame) and JPEG included since r6."""
    import numpy as np

    from postgre_to_clickhouse_spark.operators import gif as G
    from postgre_to_clickhouse_spark.operators import jpeg as J

    gif = G.encode_gif([np.full((8, 8), 5, dtype=np.uint8)])
    jpg = J.encode_jpeg(np.full((8, 8), 9, dtype=np.uint8),
                        quant_lum=np.full((8, 8), 8, dtype=np.int32))
    media = spark.createDataFrame(
        [(1, "image", bytearray(gif)), (2, "image", bytearray(jpg))],
        "media_id long, modality string, payload binary",
    )
    out = {r.media_id: r for r in M.extract_features(media).collect()}
    # constant images -> per-chunk mean == the constant, std == 0
    assert abs(out[1].feature[0] - 5.0) < 1e-6 and abs(out[1].feature[1]) < 1e-6
    assert abs(out[2].feature[0] - 9.0) < 1e-6
