"""Multimodal plumbing: schemas, Arrow batch shapes, deterministic fake
decode, 1→N frame fan-out. Real decode is stubbed (no media libs here)."""

import pytest

from typesense_spark.ops import multimodal


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"xx", fake=False)


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
