"""Multimodal plumbing: schemas, Arrow batch shapes, 1→N frame fan-out.
BMP images and WAV audio decode FOR REAL (pure numpy/stdlib); compressed
formats stay stubbed behind fake=True."""

import pytest

from typesense_spark.ops import multimodal


def test_compressed_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"xx", fake=False)  # not a BMP, no fake


def test_fake_decode_deterministic():
    a = multimodal.decode_image(b"payload", fake=True)
    b = multimodal.decode_image(b"payload", fake=True)
    assert a.shape == (8, 8, 3) and (a == b).all()
    c = multimodal.decode_image(b"other", fake=True)
    assert (a != c).any()


def test_feature_extraction_schema_and_determinism(spark):
    media = multimodal.synth_media(spark, n=24)
    feats = multimodal.extract_features(media)
    assert [f.name for f in feats.schema.fields] == [
        "media_id", "payload_sha", "n_bytes", "mean_byte_milli", "feature_vec",
    ]
    rows1 = {r["media_id"]: r for r in feats.collect()}
    rows2 = {r["media_id"]: r for r in multimodal.extract_features(media.repartition(7)).collect()}
    assert len(rows1) == 24
    for k in rows1:
        assert rows1[k]["payload_sha"] == rows2[k]["payload_sha"]
        assert rows1[k]["mean_byte_milli"] == rows2[k]["mean_byte_milli"]
        assert len(rows1[k]["feature_vec"]) == 3


def test_frame_sampling_fanout(spark):
    media = multimodal.synth_media(spark, n=24)
    frames = multimodal.sample_frames(media, every_ms=1000)
    rows = frames.collect()
    vids = {r["media_id"] for r in rows}
    metas = {
        r["media_id"]: r["meta_duration_ms"]
        for r in media.where("kind = 'video'").collect()
    }
    assert vids == set(metas)
    per_vid = {}
    for r in rows:
        per_vid.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in per_vid.items():
        assert sorted(idxs) == list(range(metas[mid] // 1000))


def test_bmp_roundtrip_real_decode():
    import numpy as np

    rng = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    payload = multimodal.encode_bmp(rng)
    out = multimodal.decode_image(payload)  # REAL decode, no fake flag
    assert out.shape == (5, 7, 3) and (out == rng).all()


def test_resize_nearest():
    import numpy as np

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[2:, 2:] = 255
    small = multimodal.resize_image(img, 2, 2)
    assert small.shape == (2, 2, 3)
    assert small[0, 0, 0] == 0 and small[1, 1, 0] == 255


def test_wav_real_decode_and_features(spark):
    """A 440 Hz sine decodes to the right rate/length; zero-crossing
    rate ≈ 2·f/rate and RMS ≈ amp/√2 — real DSP, not a stub."""
    payload = multimodal.synth_wav(freq_hz=440, rate=8000, ms=500)
    rate, pcm = multimodal.decode_audio_wav(payload)
    assert rate == 8000 and len(pcm) == 4000
    media = multimodal.synth_media(spark, n=12)
    feats = {r["media_id"]: r for r in multimodal.audio_features(media).collect()}
    audio_ids = {r["media_id"]: r for r in media.where("kind = 'audio'").collect()}
    assert set(feats) == set(audio_ids)
    for mid, r in feats.items():
        assert r["duration_ms"] == 250 and r["sample_rate"] == 8000
        # sine at amplitude 0.5 → RMS ≈ 0.354
        assert 330 <= r["rms_milli"] <= 380
        # zcr ≈ 2·freq/rate; freqs are 200..400 Hz at 8 kHz
        assert 40_000 <= r["zcr_micro"] <= 110_000


def test_image_features_real_bmp_path(spark):
    """synth_media images are real BMPs: the feature extractor takes the
    REAL decode path and per-channel means equal the solid BMP shade."""
    media = multimodal.synth_media(spark, n=9)
    feats = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    for r in media.where("kind = 'image'").collect():
        mid = r["media_id"]
        shade = (mid * 37) % 256
        assert feats[mid]["mean_byte_milli"] == shade * 1000
        for v in feats[mid]["feature_vec"]:
            assert abs(v - shade / 255.0) < 1e-6


def test_media_neardup_via_similarity(spark):
    """Cross-module: media feature vectors feed the embedding near-dup
    operator — duplicate images pair, distinct shades don't."""
    import numpy as np

    from pyspark.sql import functions as F

    from typesense_spark.ops.similarity import cosine_dup_pairs

    # cosine is scale-invariant, so non-dups need different channel
    # RATIOS (colors), not just brightness: ids 0,1 share one color,
    # the rest get distinct hues
    colors = [(40, 80, 120), (40, 80, 120), (200, 10, 10), (10, 200, 10),
              (10, 10, 200), (150, 150, 10)]
    rows = []
    for i, color in enumerate(colors):
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        img[:, :] = color
        img[0, 0] = (i, i, i)  # tiny per-id perturbation
        rows.append((i, "image", "image/bmp", bytearray(multimodal.encode_bmp(img)), 8, 8, None))
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    vecs = multimodal.extract_features(media).select(
        F.col("media_id").alias("vec_id"), F.col("feature_vec").alias("embedding")
    )
    pairs = {(r["vec_a"], r["vec_b"]) for r in cosine_dup_pairs(vecs, threshold_micro=999_990).collect()}
    assert (0, 1) in pairs
    assert all(a < 2 and b < 2 for a, b in pairs)
