"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, batch iteration, partition sizing, UDF
signatures) is real and tested; the codec step is STUBBED — this container
has no image/audio libraries, so decoding dispatches to a deterministic fake
(`_fake_decode`) unless a real decoder is registered.  Swap in Pillow/librosa
by calling :func:`register_decoder`.

Design points for 100 TB of media:
- `mapInPandas` (Arrow batches) so each Python worker sees columnar chunks,
  never row-at-a-time;
- binary payloads stay opaque until the last moment (parquet reads prune to
  the metadata columns unless features are requested);
- feature outputs are fixed-width arrays → columnar, joinable with the
  embedding similarity operators.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 32

_DECODER: Optional[Callable[[bytes, str], np.ndarray]] = None


def register_decoder(fn: Callable[[bytes, str], np.ndarray]) -> None:
    """Install a real decoder: fn(payload, mime) -> float32[FEATURE_DIM]."""
    global _DECODER
    _DECODER = fn


def _fake_decode(payload: bytes, mime: str) -> np.ndarray:
    """Deterministic stand-in for decode+feature-extract: hash the payload
    into a unit-norm pseudo-embedding.  Keeps every downstream op testable."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32).astype(np.float64)
    v = (raw / np.float64(2**32)) - 0.5
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def extract_features(df: DataFrame, payload_col: str = "payload",
                     mime_col: str = "mime",
                     id_col: str = "media_id") -> DataFrame:
    """media → (media_id, feature: array<float>) via Arrow-batched UDF."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _DECODER or _fake_decode
        for b in batches:
            feats = [
                decode(p if p is not None else b"", m).tolist()
                for p, m in zip(b[payload_col], b[mime_col])
            ]
            yield pd.DataFrame({"media_id": b[id_col], "feature": feats})

    return df.select(id_col, payload_col, mime_col).mapInPandas(run, out_schema)


_RESIZER: Optional[Callable[[bytes, str, int, int], bytes]] = None


def register_resizer(fn: Callable[[bytes, str, int, int], bytes]) -> None:
    """Install a real image resizer: fn(payload, mime, w, h) -> payload."""
    global _RESIZER
    _RESIZER = fn


def _fake_resize(payload: bytes, mime: str, w: int, h: int) -> bytes:
    """Deterministic stand-in (no codecs in this sandbox): tag + truncate
    proportionally to the pixel-count ratio, so output sizes behave like a
    real re-encode and the Spark plumbing (schema, batch shape,
    partition-parallel Arrow exchange) is exercised for real."""
    header = f"resized:{w}x{h}:".encode()
    keep = max(1, min(len(payload), (len(payload) * w * h) // max(1, 1 << 20)))
    return header + (payload or b"")[:keep]


def resize_media(df: DataFrame, width: int, height: int,
                 payload_col: str = "payload", mime_col: str = "mime",
                 id_col: str = "media_id") -> DataFrame:
    """media → (media_id, payload: binary, width, height) resized via
    Arrow-batched mapInPandas (the codec itself is pluggable —
    register_resizer; the sandbox default is a deterministic fake)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        resize = _RESIZER or _fake_resize
        for b in batches:
            out = [
                resize(p if p is not None else b"", m, width, height)
                for p, m in zip(b[payload_col], b[mime_col])
            ]
            yield pd.DataFrame({
                "media_id": b[id_col],
                "payload": out,
                "width": [width] * len(b),
                "height": [height] * len(b),
            })

    return df.select(id_col, payload_col, mime_col).mapInPandas(
        run, out_schema)


# ---------------------------------------------------------------------------
# Real codec: uncompressed 24-bit BMP (pure numpy — no image libraries)
# ---------------------------------------------------------------------------
#
# The one format this sandbox can decode for real: BITMAPFILEHEADER +
# BITMAPINFOHEADER, BI_RGB, 24bpp, bottom-up rows, 4-byte row padding.
# Registered through the same `register_decoder` seam a Pillow-backed
# deployment would use, so one oracled query exercises a NON-fake decode
# end-to-end (encode → real byte format → decode → integer features the
# oracle re-derives with closed-form integer math).

import struct as _struct


def encode_bmp(pixels: np.ndarray) -> bytes:
    """uint8[h, w, 3] RGB → uncompressed 24-bit BMP bytes."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_bmp needs uint8[h, w, 3]")
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    pad = b"\x00" * (row_size - w * 3)
    # bottom-up row order, BGR channel order — the classic BMP layout
    body = b"".join(
        pixels[y, :, ::-1].tobytes() + pad for y in range(h - 1, -1, -1)
    )
    header = _struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                        2835, 2835, 0, 0)
    return header + info + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes → uint8[h, w, 3] RGB."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = _struct.unpack_from("<I", payload, 10)[0]
    w, h_signed = _struct.unpack_from("<ii", payload, 18)
    bpp = _struct.unpack_from("<H", payload, 28)[0]
    comp = _struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit BI_RGB supported")
    top_down = h_signed < 0
    h = abs(h_signed)
    row_size = (w * 3 + 3) & ~3
    if offset + row_size * h > len(payload):
        raise ValueError("truncated BMP body")
    arr = np.frombuffer(payload, np.uint8, count=row_size * h, offset=offset)
    arr = arr.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)[..., ::-1]
    if not top_down:
        arr = arr[::-1]
    return np.ascontiguousarray(arr)


def bmp_unit_features(payload: bytes, mime: str) -> np.ndarray:
    """A REAL registered decoder (see register_decoder): decode the BMP,
    take a FEATURE_DIM-bin intensity histogram, L2-normalize."""
    px = decode_bmp(payload)
    hist = np.bincount(
        (px.reshape(-1).astype(np.int64) * FEATURE_DIM) // 256,
        minlength=FEATURE_DIM)[:FEATURE_DIM].astype(np.float64)
    n = np.linalg.norm(hist)
    return (hist / n if n > 0 else hist).astype(np.float32)


def bmp_pixel_stats(df: DataFrame, payload_col: str = "payload",
                    id_col: str = "media_id") -> DataFrame:
    """Integer pixel statistics through the REAL BMP decode, Arrow-batched.

    Output per row: (media_id, width, height, sum_all, n_bright,
    pos_checksum) — pos_checksum is Σ flat_index·value over the decoded
    (row-major y, x, channel) order, so a decoder that mis-handles
    bottom-up rows, BGR order or row padding produces a different value
    even when the permutation-invariant sums agree.  All integers → the
    DuckDB oracle re-derives them exactly.
    """
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sum_all", T.LongType()),
        T.StructField("n_bright", T.LongType()),
        T.StructField("pos_checksum", T.LongType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx_cache: dict = {}
        for b in batches:
            rows = []
            for mid, p in zip(b[id_col], b[payload_col]):
                px = decode_bmp(bytes(p))
                h, w, _ = px.shape
                flat = px.reshape(-1).astype(np.int64)
                idx = idx_cache.get(flat.size)
                if idx is None:
                    idx = np.arange(flat.size, dtype=np.int64)
                    idx_cache[flat.size] = idx
                rows.append((int(mid), w, h, int(flat.sum()),
                             int((flat >= 128).sum()),
                             int((idx * flat).sum())))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "sum_all", "n_bright",
                "pos_checksum"])

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# Real codec #2: WAV (RIFF header + 16-bit PCM — pure struct/numpy)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16[n] mono PCM → RIFF/WAVE bytes (fmt chunk + data chunk)."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav needs int16[n] mono")
    data = samples.tobytes()  # little-endian on all supported platforms
    fmt = _struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    out = (b"RIFF" + _struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
           + b"WAVE"
           + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
           + b"data" + _struct.pack("<I", len(data)) + data)
    return out


def decode_wav(payload: bytes):
    """RIFF/WAVE bytes → (sample_rate, int16[n]).  PCM16 mono/stereo
    only; walks the chunk list (extra chunks like LIST are skipped, as a
    real reader must)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        ln = _struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = _struct.unpack_from(
                "<HHIIHH", body, 0)
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only 16-bit PCM supported")
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # RIFF chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    if channels and channels > 1:
        samples = samples.reshape(-1, channels)
    return rate, samples


def wav_sample_stats(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "media_id") -> DataFrame:
    """Integer PCM statistics through the REAL WAV decode, Arrow-batched:
    (media_id, rate, n_samples, sum_s, n_pos, pos_checksum) — the audio
    sibling of :func:`bmp_pixel_stats`, with the same position-weighted
    checksum discipline (byte-order or chunk-walk bugs break the hash)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sum_s", T.LongType()),
        T.StructField("n_pos", T.LongType()),
        T.StructField("pos_checksum", T.LongType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx_cache: dict = {}
        for b in batches:
            rows = []
            for mid, p in zip(b[id_col], b[payload_col]):
                rate, s = decode_wav(bytes(p))
                s = s.reshape(-1).astype(np.int64)
                idx = idx_cache.get(s.size)
                if idx is None:
                    idx = np.arange(s.size, dtype=np.int64)
                    idx_cache[s.size] = idx
                rows.append((int(mid), rate, s.size, int(s.sum()),
                             int((s > 0).sum()), int((idx * s).sum())))
            yield pd.DataFrame(rows, columns=[
                "media_id", "rate", "n_samples", "sum_s", "n_pos",
                "pos_checksum"])

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms).

    The expansion is pure Catalyst (sequence + explode); actual frame decode
    is the registered decoder's job."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                           F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Typed-metadata profile per kind — prunes payload at the scan."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("width").alias("avg_width"),
        F.avg("height").alias("avg_height"),
        F.avg("duration_ms").alias("avg_duration_ms"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
    )


def synthetic_media_df(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests (payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
        for b in batches:
            ids = b["id"].to_numpy()
            rows = []
            for i in ids:
                k = kinds[int(i) % 3]
                payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": k,
                        "mime": mimes[k],
                        "payload": payload,
                        "width": 64 + int(i) % 512 if k == "image" else None,
                        "height": 64 + int(i * 7) % 512 if k == "image" else None,
                        "duration_ms": (1000 + int(i) % 9000)
                        if k != "image" else None,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n_rows).mapInPandas(gen, MEDIA_SCHEMA)
