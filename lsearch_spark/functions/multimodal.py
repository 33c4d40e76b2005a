"""Multimodal columns for training-data pipelines.

Media are opaque `binary` payloads with typed metadata — the Spark-side
plumbing (schemas, Arrow batch shapes, partitioning) is real and
tested; the actual codec step is STUBBED (image/audio libraries are not
in this container): `decode=\"fake\"` derives deterministic features
from the payload bytes so tests are stable, `decode=\"real\"` raises
NotImplementedError at the exact seam where Pillow/ffmpeg would slot in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def decode_image_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """mapInPandas over image rows -> per-image features. The Arrow batch
    shape, schema and partitioning are the production plumbing; only the
    pixel decode is faked/stubbed."""

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real image decode needs Pillow/libvips — not in this container; "
                    "plug in here: bytes -> ndarray -> channel means + pHash"
                )
            stats = [_fake_pixel_stats(bytes(p)) for p in pdf["payload"]]
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
            if decode == "real":
                raise NotImplementedError("real audio decode needs soundfile/ffmpeg — plug in here")
            if not len(pdf):
                continue
            bufs = [bytes(p) for p in pdf["payload"]]
            lens = np.array([len(b) for b in bufs], dtype=np.int64)
            keep = lens > 0  # reduceat needs non-empty segments
            pdf, bufs, lens = pdf[keep], [b for b, k in zip(bufs, keep) if k], lens[keep]
            if not len(pdf):
                continue
            cat = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.float64) / 127.5 - 1.0
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            sumsq = np.add.reduceat(cat * cat, starts)
            # zero crossings: sign flips within each segment only — the
            # diff at each segment boundary is masked out before reduceat
            sb = np.signbit(cat).astype(np.int8)
            d = np.abs(np.diff(sb, append=np.int8(0)))
            d[np.cumsum(lens) - 1] = 0
            zc = np.add.reduceat(d, starts)
            sr = pdf["sample_rate"].to_numpy().astype(np.float64)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64").to_numpy(),
                    "sample_rate": pdf["sample_rate"].astype("int32").to_numpy(),
                    "duration_s": lens / sr,
                    "rms": np.sqrt(sumsq / lens),
                    "zero_crossings": zc.astype(np.int64),
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(it, AUDIO_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10, decode: str = "fake") -> DataFrame:
    """Video -> one row per sampled frame. Fake frame payload = slice of
    the source payload (deterministic); real path would demux here."""

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError("real frame demux needs ffmpeg — plug in here")
            if not len(pdf):
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
