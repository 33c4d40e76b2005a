"""Multimodal plumbing: schemas, batch shapes, deterministic fake decode,
and the NotImplementedError seam for real codecs."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from lsearch_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media(spark, 60).cache()


def test_synth_media_deterministic(spark, media):
    again = mm.synth_media(spark, 60)
    a = sorted((r["media_id"], bytes(r["payload"])) for r in media.collect())
    b = sorted((r["media_id"], bytes(r["payload"])) for r in again.collect())
    assert a == b


def test_image_features(spark, media):
    feats = mm.decode_image_features(media).collect()
    assert len(feats) == media.filter(F.col("kind") == "image").count()
    for r in feats:
        assert 0.0 <= r["mean_r"] <= 1.0 and r["width"] > 0
    # deterministic across runs
    again = {r["media_id"]: r["phash"] for r in mm.decode_image_features(media).collect()}
    assert all(again[r["media_id"]] == r["phash"] for r in feats)


def test_audio_features(spark, media):
    feats = mm.decode_audio_features(media).collect()
    assert len(feats) == media.filter(F.col("kind") == "audio").count()
    for r in feats:
        assert r["duration_s"] > 0 and 0.0 <= r["rms"] <= 1.5


def test_frame_sampling(spark, media):
    frames = mm.sample_frames(media, every_n=7)
    pdf = frames.toPandas()
    vids = media.filter(F.col("kind") == "video").collect()
    want = sum(len(range(0, r["n_frames"], 7)) for r in vids)
    assert len(pdf) == want
    assert (pdf["frame_idx"] % 7 == 0).all()


def test_audio_empty_payload_yields_zero_row(spark):
    """Empty payloads must produce zero-feature rows, not disappear —
    consumers that count or join audio media by media_id rely on it."""
    rows = [(1, "audio", bytearray(b""), None, None, None, 16000),
            (2, "audio", bytearray(b"\x10\x90" * 50), None, None, None, 16000)]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.decode_audio_features(media).collect()}
    assert set(feats) == {1, 2}
    assert feats[1]["duration_s"] == 0.0 and feats[1]["rms"] == 0.0 and feats[1]["zero_crossings"] == 0
    assert feats[2]["duration_s"] > 0.0 and feats[2]["rms"] > 0.0


def test_real_decode_is_explicit_stub(spark, media):
    with pytest.raises(Exception) as exc:
        mm.decode_image_features(media, decode="real").collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(exc.value, NotImplementedError)
