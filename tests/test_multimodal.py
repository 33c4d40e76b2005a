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
    """decode='real' works end-to-end on BMP AND compressed PNG payloads
    with NO codec lib: channel means match a numpy ground truth computed
    from the pixels."""
    media = mm.synth_real_media(spark, 12).cache()
    feats = {r["media_id"]: r for r in mm.decode_image_features(media, decode="real").collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in media.filter(F.col("kind") == "image").collect()}
    assert set(feats) == set(src)
    assert any(p.startswith(b"\x89PNG") for p in src.values())  # real compressed rows
    for mid, payload in src.items():
        arr = mm.decode_bmp(payload)
        if arr is None:
            arr = mm.decode_png(payload)
        rgb = arr.astype(np.float64) / 255.0
        assert abs(feats[mid]["mean_r"] - rgb[:, :, 0].mean()) < 1e-12
        assert abs(feats[mid]["mean_b"] - rgb[:, :, 2].mean()) < 1e-12


def test_decode_png_roundtrip_and_filters():
    """encode_png -> decode_png is lossless; decode handles ALL five
    scanline filters (forward-filtered streams built by hand), gray,
    RGBA (alpha dropped) and palette color types; truncated / foreign
    bytes return None."""
    import zlib

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (11, 9, 3)).astype(np.uint8)
    assert (mm.decode_png(mm.encode_png(rgb)) == rgb).all()

    # hand-filter the same image with each filter type per row
    h, w, ch = rgb.shape
    stride = w * ch
    flat = rgb.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = y % 5
        cur = flat[y]
        a = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
        b = prev
        c = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - a) & 0xFF
        elif f == 2:
            enc = (cur - b) & 0xFF
        elif f == 3:
            enc = (cur - (a + b) // 2) & 0xFF
        else:
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
            enc = (cur - pred) & 0xFF
        raw += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = cur

    def chunk(typ, data):
        return (len(data).to_bytes(4, "big") + typ + data
                + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))
    assert (mm.decode_png(png) == rgb).all()

    # gray (ct=0): replicated to 3 channels
    g = rng.randint(0, 256, (5, 4)).astype(np.uint8)
    graw = b"".join(b"\x00" + g[y].tobytes() for y in range(5))
    ihdr_g = (4).to_bytes(4, "big") + (5).to_bytes(4, "big") + bytes([8, 0, 0, 0, 0])
    png_g = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_g)
             + chunk(b"IDAT", zlib.compress(graw)) + chunk(b"IEND", b""))
    out_g = mm.decode_png(png_g)
    assert (out_g[:, :, 0] == g).all() and (out_g[:, :, 2] == g).all()

    # RGBA (ct=6): alpha dropped
    rgba = rng.randint(0, 256, (3, 3, 4)).astype(np.uint8)
    araw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    ihdr_a = (3).to_bytes(4, "big") + (3).to_bytes(4, "big") + bytes([8, 6, 0, 0, 0])
    png_a = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_a)
             + chunk(b"IDAT", zlib.compress(araw)) + chunk(b"IEND", b""))
    assert (mm.decode_png(png_a) == rgba[:, :, :3]).all()

    # palette (ct=3)
    pal = rng.randint(0, 256, (4, 3)).astype(np.uint8)
    idx = rng.randint(0, 4, (6, 5)).astype(np.uint8)
    praw = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))
    ihdr_p = (5).to_bytes(4, "big") + (6).to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
    png_p = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_p)
             + chunk(b"PLTE", pal.tobytes())
             + chunk(b"IDAT", zlib.compress(praw)) + chunk(b"IEND", b""))
    assert (mm.decode_png(png_p) == pal[idx]).all()

    assert mm.decode_png(b"notapng") is None
    assert mm.decode_png(mm.encode_png(rgb)[:40]) is None


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
