"""Multimodal columns for training-data pipelines.

Media are opaque `binary` payloads with typed metadata — the Spark-side
plumbing (schemas, Arrow batch shapes, partitioning) is real and
tested. The codec step is pluggable: `decode=\"fake\"` (default)
derives deterministic features from the payload bytes so tests are
stable everywhere; `decode=\"real\"` uses the optional codec libraries
(Pillow for images, soundfile for audio, PyAV for video) when they are
importable and raises NotImplementedError with the exact dependency
otherwise (this container ships none of them — the real branches are
import-gated, not dead code).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _optional(module: str, hint: str):
    """Import an optional codec library or raise at the decode seam."""
    import importlib

    try:
        return importlib.import_module(module)
    except ImportError as e:
        raise NotImplementedError(
            f"decode='real' needs {module} ({hint}) — not installed in this "
            f"environment; decode='fake' is the deterministic stand-in"
        ) from e

MEDIA_SCHEMA = "media_id long, kind string, payload binary, width int, height int, n_frames int, sample_rate int"
IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, mean_r double, mean_g double, mean_b double, phash long"
)
AUDIO_FEATURES_SCHEMA = "media_id long, sample_rate int, duration_s double, rms double, zero_crossings long"
FRAME_SCHEMA = "media_id long, frame_idx int, frame_payload binary"


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(64 + int(rng.randint(0, 256)))
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                int(rng.randint(16, 512)) if kind != "audio" else None,
                int(rng.randint(16, 512)) if kind != "audio" else None,
                int(rng.randint(1, 300)) if kind == "video" else (1 if kind == "image" else None),
                16000 if kind == "audio" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_pixel_stats(payload: bytes) -> tuple[float, float, float, int]:
    """Deterministic stand-in for decode+aggregate: derive 'channel means'
    and a perceptual-hash-like value from a digest of the payload."""
    d = hashlib.sha256(payload).digest()
    return d[0] / 255.0, d[1] / 255.0, d[2] / 255.0, int.from_bytes(d[8:16], "big", signed=True)


def _real_pixel_stats(payload: bytes) -> tuple[float, float, float, int]:
    """Pillow decode: channel means + 8x8 average-hash (aHash)."""
    import io

    Image = _optional("PIL.Image", "pip install pillow")
    img = Image.open(io.BytesIO(payload)).convert("RGB")
    arr = np.asarray(img, dtype=np.float64) / 255.0
    mr, mg, mb = arr.mean(axis=(0, 1))
    g = np.asarray(img.convert("L").resize((8, 8)), dtype=np.float64)
    bits = (g > g.mean()).flatten()
    ph = int(np.packbits(bits).view(">u8")[0])
    if ph >= 1 << 63:
        ph -= 1 << 64
    return float(mr), float(mg), float(mb), ph


def decode_image_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """mapInPandas over image rows -> per-image features. The Arrow batch
    shape, schema and partitioning are the production plumbing; the pixel
    decode is faked by default (real path import-gates Pillow)."""
    pixel_stats = _real_pixel_stats if decode == "real" else _fake_pixel_stats

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [pixel_stats(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": pdf["width"].astype("int32"),
                    "height": pdf["height"].astype("int32"),
                    "mean_r": [s[0] for s in stats],
                    "mean_g": [s[1] for s in stats],
                    "mean_b": [s[2] for s in stats],
                    "phash": pd.Series([s[3] for s in stats], dtype="int64"),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(it, IMAGE_FEATURES_SCHEMA)


def decode_audio_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """Whole-batch vectorized: all payloads in an Arrow batch concatenate
    into ONE sample array; per-row duration/RMS/zero-crossings come from
    segmented reductions (np.add.reduceat) — no per-row python loop."""

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if decode == "real":
                import io

                sf = _optional("soundfile", "pip install soundfile")
                samples = [sf.read(io.BytesIO(bytes(p)))[0] if len(bytes(p)) else np.empty(0) for p in pdf["payload"]]
                lens = np.array([len(s) for s in samples], dtype=np.int64)
                cat = np.concatenate([s for s in samples if len(s)]) if lens.any() else np.empty(0)
            else:
                bufs = [bytes(p) for p in pdf["payload"]]
                lens = np.array([len(b) for b in bufs], dtype=np.int64)
                cat = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.float64) / 127.5 - 1.0
            n = len(pdf)
            # empty payloads get explicit zero-feature rows (never dropped:
            # consumers count/join audio by media_id); reduceat runs over
            # the non-empty segments only, results scatter back by mask
            dur = np.zeros(n, dtype=np.float64)
            rms = np.zeros(n, dtype=np.float64)
            zc = np.zeros(n, dtype=np.int64)
            keep = lens > 0
            if keep.any():
                kl = lens[keep]
                starts = np.concatenate(([0], np.cumsum(kl)[:-1]))
                sumsq = np.add.reduceat(cat * cat, starts)
                # zero crossings: sign flips within each segment only — the
                # diff at each segment boundary is masked out before reduceat
                sb = np.signbit(cat).astype(np.int8)
                d = np.abs(np.diff(sb, append=np.int8(0)))
                d[np.cumsum(kl) - 1] = 0
                sr = pdf["sample_rate"].to_numpy().astype(np.float64)
                dur[keep] = kl / sr[keep]
                rms[keep] = np.sqrt(sumsq / kl)
                zc[keep] = np.add.reduceat(d, starts).astype(np.int64)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64").to_numpy(),
                    "sample_rate": pdf["sample_rate"].astype("int32").to_numpy(),
                    "duration_s": dur,
                    "rms": rms,
                    "zero_crossings": zc,
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(it, AUDIO_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10, decode: str = "fake") -> DataFrame:
    """Video -> one row per sampled frame. Fake frame payload = slice of
    the source payload (deterministic); real path would demux here."""

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if decode == "real":
                import io

                av = _optional("av", "pip install av (PyAV/ffmpeg)")
                for _, row in pdf.iterrows():
                    with av.open(io.BytesIO(bytes(row["payload"]))) as container:
                        frames = [
                            (int(row["media_id"]), i, bytes(fr.to_ndarray().tobytes()))
                            for i, fr in enumerate(container.decode(video=0))
                            if i % every_n == 0
                        ]
                    if frames:
                        yield pd.DataFrame(frames, columns=["media_id", "frame_idx", "frame_payload"])
                continue
            bufs = [bytes(p) for p in pdf["payload"]]
            lens = np.array([len(b) for b in bufs], dtype=np.int64)
            nf = pdf["n_frames"].to_numpy().astype(np.int64)
            counts = -(-np.maximum(nf, 0) // every_n)  # ceil(n_frames/every_n)
            row_of = np.repeat(np.arange(len(pdf)), counts)  # video index per frame
            first = np.concatenate(([0], np.cumsum(counts[:-1]))) if len(counts) else counts
            frame_idx = (np.arange(int(counts.sum())) - np.repeat(first, counts)) * every_n
            # fake 'demux': an 8-byte window into the source payload —
            # gathered for the whole batch with one fancy-index (the only
            # residual python is materializing bytes objects for output)
            cat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
            base = np.concatenate(([0], np.cumsum(lens)[:-1]))
            offs = base[row_of] + (frame_idx * 7) % np.maximum(lens[row_of] - 8, 1)
            windows = cat[np.minimum(offs[:, None] + np.arange(8), (base + lens)[row_of][:, None] - 1)]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64").to_numpy()[row_of],
                    "frame_idx": pd.Series(frame_idx, dtype="int32"),
                    "frame_payload": [w.tobytes() for w in windows],
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(it, FRAME_SCHEMA)
