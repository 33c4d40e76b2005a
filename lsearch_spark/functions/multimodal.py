"""Multimodal columns for training-data pipelines.

Media are opaque `binary` payloads with typed metadata — the Spark-side
plumbing (schemas, Arrow batch shapes, partitioning) is real and
tested. The codec step is pluggable: `decode=\"fake\"` (default)
derives deterministic features from the payload bytes so tests are
stable everywhere; `decode=\"real\"` decodes BMP (24-bit) and PPM (P6)
images, baseline PNG (8-bit gray/RGB/RGBA/palette, all five scanline
filters — a real COMPRESSED format, inflated with the stdlib's zlib)
and WAV (PCM 8/16-bit) audio natively in numpy with no external
dependency, and falls back to the optional codec libraries (Pillow for
other image formats, soundfile for other audio, PyAV for video) when
they are importable, raising NotImplementedError with the exact
dependency otherwise (the remaining compressed-codec branches are
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


def synth_media_rows(n: int, seed: int = 42) -> list[tuple]:
    """The deterministic fake-media row generator, Spark-free (so entry
    oracles can replay the exact table as a pure-Python twin)."""
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
    return rows


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    return spark.createDataFrame(synth_media_rows(n, seed), MEDIA_SCHEMA)


def synth_real_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media table whose payloads are REAL uncompressed
    containers (24-bit BMP images, 16-bit PCM WAV audio) that
    decode='real' decodes natively — end-to-end testable without any
    codec library. Video rows keep fake payloads (no dependency-free
    standard container exists; the real demux stays PyAV-gated)."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image" and i % 6 == 3:
            # every other image row is a REAL compressed PNG (zlib IDAT)
            w, h = int(rng.randint(4, 24)), int(rng.randint(4, 24))
            rgb = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            rows.append((i, kind, bytearray(encode_png(rgb)), w, h, 1, None))
        elif kind == "image":
            w, h = int(rng.randint(4, 24)), int(rng.randint(4, 24))
            rgb = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            stride = (w * 3 + 3) & ~3
            rowbytes = np.zeros((h, stride), np.uint8)
            rowbytes[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
            px = rowbytes.tobytes()
            header = (
                b"BM" + (54 + len(px)).to_bytes(4, "little") + b"\x00\x00\x00\x00"
                + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
                + w.to_bytes(4, "little", signed=True) + h.to_bytes(4, "little", signed=True)
                + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
                + b"\x00" * 24
            )
            rows.append((i, kind, bytearray(header + px), w, h, 1, None))
        elif kind == "audio":
            rate = 8000
            nsamp = int(rng.randint(16, 400))
            pcm = (rng.randint(-32768, 32768, nsamp)).astype("<i2").tobytes()
            hdr = (
                b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVE"
                + b"fmt " + (16).to_bytes(4, "little")
                + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
                + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
                + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
                + b"data" + len(pcm).to_bytes(4, "little")
            )
            rows.append((i, kind, bytearray(hdr + pcm), None, None, None, rate))
        else:
            rows.append((i, kind, bytearray(rng.bytes(128)), 32, 32, int(rng.randint(1, 60)), None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_pixel_stats(payload: bytes) -> tuple[float, float, float, int]:
    """Deterministic stand-in for decode+aggregate: derive 'channel means'
    and a perceptual-hash-like value from a digest of the payload."""
    d = hashlib.sha256(payload).digest()
    return d[0] / 255.0, d[1] / 255.0, d[2] / 255.0, int.from_bytes(d[8:16], "big", signed=True)


def decode_bmp(payload: bytes) -> np.ndarray | None:
    """Native numpy decode of an uncompressed 24-bit BMP -> (h, w, 3)
    RGB array, or None if the payload is not such a BMP. Pure public
    file-format knowledge: 'BM' magic, pixel-array offset at byte 10,
    width/height at 18/22, bpp at 28, BI_RGB compression at 30,
    bottom-up rows padded to 4 bytes."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if off + stride * h > len(payload):
        return None
    rows = np.frombuffer(payload, np.uint8, stride * h, off).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if flip else rgb


def decode_ppm(payload: bytes) -> np.ndarray | None:
    """Native numpy decode of a binary PPM (P6, maxval<=255) -> (h, w, 3)
    RGB array, or None if not such a PPM."""
    if not payload.startswith(b"P6"):
        return None
    # header = magic, width, height, maxval as whitespace-separated ASCII
    # tokens (comment lines start with '#'), then ONE whitespace byte
    toks, i, n = [], 2, len(payload)
    while len(toks) < 3 and i < n:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < n and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        toks.append(payload[i:j])
        i = j
    try:
        w, h, maxv = (int(t) for t in toks)
    except (ValueError, TypeError):
        return None
    i += 1  # the single whitespace after maxval
    if maxv > 255 or w <= 0 or h <= 0 or i + w * h * 3 > n:
        return None
    return np.frombuffer(payload, np.uint8, w * h * 3, i).reshape(h, w, 3)


def decode_png(payload: bytes) -> np.ndarray | None:
    """Native numpy+stdlib-zlib decode of a baseline PNG -> (h, w, 3)
    RGB array, or None if not such a PNG. Pure public file-format
    knowledge (the PNG spec): 8-byte signature, length-type-data-crc
    chunks, IHDR geometry, zlib-compressed IDAT scanlines each prefixed
    by a filter byte (0 none / 1 sub / 2 up / 3 average / 4 paeth).
    Supports 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
    6 (RGBA, alpha dropped), non-interlaced — the overwhelmingly common
    shapes; anything else returns None and falls through to the
    import-gated Pillow path. The first COMPRESSED format the engine
    decodes with zero dependencies."""
    import zlib

    if len(payload) < 45 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, n = 8, len(payload)
    ihdr, idat, plte = None, [], None
    while pos + 8 <= n:
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # skip CRC
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ct, comp, filt, interlace = ihdr[8], ihdr[9], ihdr[10], ihdr[11], ihdr[12]
    if depth != 8 or ct not in (0, 2, 3, 6) or comp or filt or interlace:
        return None
    ch = {0: 1, 2: 3, 3: 1, 6: 4}[ct]
    stride = w * ch
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    if w <= 0 or h <= 0 or len(raw) < h * (1 + stride):
        return None
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = raw[y * (1 + stride)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (1 + stride) + 1
        ).astype(np.int32)
        if f == 0:
            cur = line
        elif f == 1:  # sub: recurrence per channel -> cumsum mod 256
            cur = line.reshape(w, ch).cumsum(0).reshape(stride) & 0xFF
        elif f == 2:  # up
            cur = (line + prev) & 0xFF
        elif f in (3, 4):  # average / paeth: sequential in x
            cur = np.zeros(stride, np.int32)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                a = cur[x * ch - ch : x * ch] if x else np.zeros(ch, np.int32)
                b = prev[s]
                if f == 3:
                    cur[s] = (line[s] + (a + b) // 2) & 0xFF
                else:
                    c = prev[x * ch - ch : x * ch] if x else np.zeros(ch, np.int32)
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                    cur[s] = (line[s] + pred) & 0xFF
        else:
            return None
        out[y] = cur.astype(np.uint8)
        prev = cur
    if ct == 2:
        return out.reshape(h, w, 3)
    if ct == 6:
        return out.reshape(h, w, 4)[:, :, :3]
    if ct == 0:
        return np.repeat(out.reshape(h, w, 1), 3, axis=2)
    # palette: each byte indexes PLTE's RGB triples
    if plte is None or len(plte) < 3:
        return None
    pal = np.frombuffer(plte, np.uint8)
    pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
    idx = out.reshape(h, w)
    if idx.max(initial=0) >= pal.shape[0]:
        return None
    return pal[idx]


def encode_png(rgb: np.ndarray) -> bytes:
    """Minimal baseline PNG encoder ((h, w, 3) uint8, filter 0 rows,
    one zlib IDAT) — the roundtrip twin of decode_png, used by
    synth_real_media and the tests; also a legitimate tiny sink."""
    import zlib

    h, w = rgb.shape[:2]
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    )
    raw = b"".join(b"\x00" + rgb[y].astype(np.uint8).tobytes() for y in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big") + typ + data
            + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _ahash64(gray: np.ndarray) -> int:
    """8x8 box-average aHash of a grayscale array (box resampling — the
    Pillow path's filter differs slightly, so hashes are comparable only
    within one decoder; documented)."""
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    cs = np.zeros((h + 1, w + 1), dtype=np.float64)
    cs[1:, 1:] = gray.cumsum(0).cumsum(1)  # summed-area table: exact box means
    area = (ys[1:, None] - ys[:-1, None]) * (xs[None, 1:] - xs[None, :-1])
    g = (
        cs[ys[1:], :][:, xs[1:]] - cs[ys[:-1], :][:, xs[1:]]
        - cs[ys[1:], :][:, xs[:-1]] + cs[ys[:-1], :][:, xs[:-1]]
    ) / np.maximum(area, 1)
    bits = (g > g.mean()).flatten()
    ph = int(np.packbits(bits).view(">u8")[0])
    return ph - (1 << 64) if ph >= 1 << 63 else ph


def _real_pixel_stats(payload: bytes) -> tuple[float, float, float, int]:
    """Real decode: native numpy for BMP/PPM/PNG (PNG via stdlib zlib —
    a real COMPRESSED format with zero dependencies), Pillow for
    anything else. Features: channel means + 8x8 average-hash (aHash)."""
    arr = decode_bmp(payload)
    if arr is None:
        arr = decode_ppm(payload)
    if arr is None:
        arr = decode_png(payload)
    if arr is not None:
        a = arr.astype(np.float64) / 255.0
        mr, mg, mb = a.mean(axis=(0, 1))
        gray = a[:, :, 0] * 0.299 + a[:, :, 1] * 0.587 + a[:, :, 2] * 0.114
        return float(mr), float(mg), float(mb), _ahash64(gray * 255.0)
    import io

    Image = _optional("PIL.Image", "pip install pillow (payload is not BMP/PPM)")
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


def decode_wav(payload: bytes) -> tuple[np.ndarray, int] | None:
    """Native numpy decode of a PCM WAV (8- or 16-bit) -> (mono float64
    samples in [-1, 1], sample_rate), or None if not such a WAV. Walks
    RIFF chunks ('fmt ' then 'data'); multi-channel audio is mean-mixed."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, n = 12, len(payload)
    fmt = data = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        sz = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or channels < 1 or rate <= 0 or bits not in (8, 16):
        return None
    if bits == 16:
        raw = np.frombuffer(data, np.int16, len(data) // 2).astype(np.float64) / 32768.0
    else:
        raw = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
    frames = len(raw) // channels
    return raw[: frames * channels].reshape(frames, channels).mean(axis=1), rate


def decode_audio_features(media: DataFrame, decode: str = "fake") -> DataFrame:
    """Whole-batch vectorized: all payloads in an Arrow batch concatenate
    into ONE sample array; per-row duration/RMS/zero-crossings come from
    segmented reductions (np.add.reduceat) — no per-row python loop."""

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if decode == "real":
                # native numpy for PCM WAV; soundfile only for other formats
                samples = []
                rates = pd.to_numeric(pdf["sample_rate"], errors="coerce").fillna(0).to_numpy(np.float64)
                for j, p in enumerate(pdf["payload"]):
                    b = bytes(p)
                    wav = decode_wav(b) if b else None
                    if wav is not None:
                        samples.append(wav[0])
                        rates[j] = wav[1]
                    elif b:
                        import io

                        sf = _optional("soundfile", "pip install soundfile (payload is not PCM WAV)")
                        s, r = sf.read(io.BytesIO(b))
                        samples.append(s if s.ndim == 1 else s.mean(axis=1))
                        rates[j] = r
                    else:
                        samples.append(np.empty(0))
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
                sr = (
                    rates
                    if decode == "real"
                    else pdf["sample_rate"].to_numpy().astype(np.float64)
                )
                dur[keep] = kl / np.maximum(sr[keep], 1.0)
                rms[keep] = np.sqrt(sumsq / kl)
                zc[keep] = np.add.reduceat(d, starts).astype(np.int64)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64").to_numpy(),
                    "sample_rate": (
                        rates.astype(np.int32)
                        if decode == "real"
                        else pdf["sample_rate"].astype("int32").to_numpy()
                    ),
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
