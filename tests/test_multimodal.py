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


def test_real_decode_is_explicit_stub_for_compressed(spark, media):
    """synth_media payloads are random bytes (not BMP/PPM/WAV), so the
    real path falls through to the import-gated codec libraries."""
    with pytest.raises(Exception) as exc:
        mm.decode_image_features(media, decode="real").collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(exc.value, NotImplementedError)


# ---------------------------------------------- native real decode (no deps)
import numpy as np


def test_decode_bmp_roundtrip():
    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (5, 6, 3)).astype(np.uint8)
    w, h = 6, 5
    stride = (w * 3 + 3) & ~3
    rowbytes = np.zeros((h, stride), np.uint8)
    rowbytes[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
    px = rowbytes.tobytes()
    payload = (
        b"BM" + (54 + len(px)).to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True) + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little") + b"\x00" * 24 + px
    )
    out = mm.decode_bmp(payload)
    assert out is not None and np.array_equal(out, rgb)
    assert mm.decode_bmp(b"notabmp") is None


def test_decode_ppm_roundtrip():
    rng = np.random.RandomState(8)
    rgb = rng.randint(0, 256, (4, 7, 3)).astype(np.uint8)
    payload = b"P6\n# a comment\n7 4\n255\n" + rgb.tobytes()
    out = mm.decode_ppm(payload)
    assert out is not None and np.array_equal(out, rgb)
    assert mm.decode_ppm(b"P5\n1 1\n255\n\x00") is None


def test_decode_wav_roundtrip_and_stereo_mix():
    rate = 8000
    mono = np.array([0, 16384, -16384, 32767, -32768], dtype="<i2")
    hdr = (
        b"RIFF" + (36 + mono.nbytes).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + mono.nbytes.to_bytes(4, "little")
    )
    s, r = mm.decode_wav(hdr + mono.tobytes())
    assert r == rate and len(s) == 5
    assert np.allclose(s, mono.astype(np.float64) / 32768.0)
    # stereo: channels mean-mixed
    stereo = np.array([100, 300, -200, 200], dtype="<i2")  # 2 frames
    hdr2 = (
        b"RIFF" + (36 + stereo.nbytes).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * 4).to_bytes(4, "little")
        + (4).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + stereo.nbytes.to_bytes(4, "little")
    )
    s2, _ = mm.decode_wav(hdr2 + stereo.tobytes())
    assert np.allclose(s2, [200 / 32768.0, 0.0])
    assert mm.decode_wav(b"RIFFxxxxNOPE") is None


def test_real_image_features_native(spark):
    """decode='real' works end-to-end on BMP payloads with NO codec lib:
    channel means match a numpy ground truth computed from the pixels."""
    media = mm.synth_real_media(spark, 12).cache()
    feats = {r["media_id"]: r for r in mm.decode_image_features(media, decode="real").collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in media.filter(F.col("kind") == "image").collect()}
    assert set(feats) == set(src)
    for mid, payload in src.items():
        rgb = mm.decode_bmp(payload).astype(np.float64) / 255.0
        assert abs(feats[mid]["mean_r"] - rgb[:, :, 0].mean()) < 1e-12
        assert abs(feats[mid]["mean_b"] - rgb[:, :, 2].mean()) < 1e-12


def test_real_audio_features_native(spark):
    media = mm.synth_real_media(spark, 12).cache()
    feats = {r["media_id"]: r for r in mm.decode_audio_features(media, decode="real").collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in media.filter(F.col("kind") == "audio").collect()}
    assert set(feats) == set(src)
    for mid, payload in src.items():
        s, r = mm.decode_wav(payload)
        assert feats[mid]["sample_rate"] == r
        assert abs(feats[mid]["duration_s"] - len(s) / r) < 1e-9
        assert abs(feats[mid]["rms"] - float(np.sqrt((s * s).mean()))) < 1e-9
