"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern (100 TB design): media lives as `binary` columns (or object-store
URIs) beside typed metadata; decode / feature-extract / resize / frame-
sample run as Arrow-batched pandas iterators (`mapInPandas`) so each
executor processes whole record batches without per-row Python overhead.
Partitioning: payloads are large, so repartition by size budget (rows per
partition ~ executor-memory / max payload) before the decode stage.

The actual image/audio codecs are NOT in this container, so `decode_*`
below are deterministic STUBS behind the real Spark plumbing — schema,
batch iteration, and UDF signatures are production-shaped; swap the stub
body for PIL/torchaudio/ffmpeg in a real deployment.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_bytes", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("content_digest", StringType()),
        StructField("thumbnail", BinaryType()),
    ]
)


def attach_fake_payload(docs: DataFrame) -> DataFrame:
    """Make documents multimodal-shaped: binary payload + metadata struct.

    In production the payload is the raw media; here it is the UTF-8 text
    (deterministic), which keeps every downstream shape honest.
    """
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, "image/png")
            .when(F.col("doc_id") % 3 == 1, "audio/wav")
            .otherwise("video/mp4")
            .alias("media_type"),
            F.col("n_chars").alias("orig_size"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def _stub_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decode. REPLACE with real codecs in deployment.

    Raises NotImplementedError for media types the stub doesn't model,
    mirroring how a real decoder surfaces unsupported formats.
    """
    if media_type not in ("image/png", "audio/wav", "video/mp4"):
        raise NotImplementedError(f"no codec for {media_type}")
    n = len(payload)
    digest = hashlib.md5(payload).hexdigest()
    return {
        "payload_bytes": n,
        "width": 64 + n % 576 if media_type == "image/png" else 0,
        "height": 64 + (n * 7) % 576 if media_type == "image/png" else 0,
        "n_frames": 1 if media_type == "image/png" else n % 300,
        "content_digest": digest,
        # "thumbnail": resized media; stub = first 16 payload bytes
        "thumbnail": payload[:16],
    }


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode stage: (doc_id, payload, meta) -> DECODED_SCHEMA.

    mapInPandas so one Python worker handles whole Arrow batches; the
    surrounding plan (projection pushdown into the scan, partition sizing)
    stays with Catalyst.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                if payload is None:
                    continue  # missing blob: nothing to decode
                media_type = meta["media_type"]
                try:
                    d = _stub_decode(bytes(payload), media_type)
                except NotImplementedError:
                    continue  # unsupported media: drop, never mis-decode
                rows.append({"doc_id": doc_id, "media_type": media_type, **d})
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in DECODED_SCHEMA.fields],
            )

    return df.mapInPandas(batches, DECODED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_digest", StringType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, k: int = 8) -> DataFrame:
    """Frame-sampling stage for video payloads: up to `k` evenly spaced
    frame indices per video, one output row per sampled frame.

    Arrow-batched fan-out (`mapInPandas` with a >1 output-per-input
    ratio) — the canonical shape for video: a 100 TB corpus of 1-minute
    clips becomes ~10^2 more rows after sampling, so this stage must
    produce frames executor-side, never collect-and-explode. The stub
    "frame" is md5(payload:idx)-derived bytes — deterministic and
    reproducible in SQL, which is what lets the registered query carry
    a FULL DuckDB oracle even though the stage itself is Python: the
    oracle proves the Arrow plumbing preserves the decode semantics
    bit-for-bit. Swap the digest lines for real ffmpeg frame extraction
    in deployment; every shape survives unchanged.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                if payload is None or meta["media_type"] != "video/mp4":
                    continue  # missing blob or not a video
                raw = bytes(payload)
                n_frames = len(raw) % 300
                if n_frames <= 0:
                    continue
                for idx in sorted({kk * n_frames // k for kk in range(k)}):
                    digest = hashlib.md5(raw + b":" + str(idx).encode()).hexdigest()
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "n_frames": n_frames,
                            "frame_idx": idx,
                            "frame_digest": digest,
                            "frame_bytes": bytes.fromhex(digest)[:8],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.mapInPandas(batches, FRAME_SCHEMA)


AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("win_idx", IntegerType()),
        StructField("energy", LongType()),
        StructField("peak", IntegerType()),
    ]
)

AUDIO_WIN, AUDIO_HOP = 256, 128


def audio_window_features(df: DataFrame) -> DataFrame:
    """Sliding-window feature extraction for audio payloads: per 256-
    sample window (hop 128), exact integer energy (sum of squared
    samples) and peak amplitude — the fan-out stage a speech pipeline
    runs before VAD/feature models.

    The stub "PCM" is the payload's unsigned bytes (deterministic, so
    the registered query carries a FULL DuckDB oracle proving the Arrow
    plumbing end-to-end); real torchaudio/librosa decode drops into the
    same batch iterator with every shape unchanged. NumPy-vectorized
    inside each Arrow batch: stride-tricked windows, one matmul-free
    reduction per batch — no per-sample Python."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                if meta["media_type"] != "audio/wav":
                    continue
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = raw.shape[0]
                if n < AUDIO_WIN:
                    continue
                n_wins = (n - AUDIO_WIN) // AUDIO_HOP + 1
                idx = (
                    np.arange(n_wins)[:, None] * AUDIO_HOP
                    + np.arange(AUDIO_WIN)[None, :]
                )
                wins = raw[idx].astype(np.int64)
                energy = (wins * wins).sum(axis=1)
                peak = wins.max(axis=1)
                for w in range(n_wins):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "n_samples": n,
                            "win_idx": w,
                            "energy": int(energy[w]),
                            "peak": int(peak[w]),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_WINDOW_SCHEMA.fields])

    return df.mapInPandas(batches, AUDIO_WINDOW_SCHEMA)
