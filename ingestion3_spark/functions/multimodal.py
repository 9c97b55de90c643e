"""Multimodal column operators: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schema contract, batch shape, partitioning,
error routing — is real and tested; the actual codec calls are stubbed
behind ``DECODERS`` because no image/audio libraries ship in this
container. ``deterministic_fake_decoder`` stands in so the distributed
path (including output shapes) is exercised end-to-end; swapping in a real
decoder is a one-line registration.

Analog in the reference: the harvesters' per-record payload parse
(XML/JSON blob column -> typed record, ``mappers/Mapper.scala:633-1010``)
— here the blob is bytes and the parse is a media decode.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id string, media binary, mime string, width int, height int, "
    "duration_ms int"
)

FEATURE_SCHEMA = (
    "doc_id string, mime string, ok boolean, error string, "
    "feature array<float>, meta_width int, meta_height int"
)

FRAME_SCHEMA = "doc_id string, frame_idx int, frame array<float>"


def deterministic_fake_decoder(payload: bytes, mime: str) -> np.ndarray:
    """Stand-in decode: a deterministic 8-dim feature from the bytes.

    Real deployments register e.g. PIL/torchvision/ffmpeg decoders here —
    see DECODERS. Raises on empty payload to exercise error routing.
    """
    if not payload:
        raise ValueError("empty media payload")
    arr = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float32), 8)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32)


DECODERS: dict[str, Callable[[bytes, str], np.ndarray]] = {
    "image/png": deterministic_fake_decoder,
    "image/jpeg": deterministic_fake_decoder,
    "audio/wav": deterministic_fake_decoder,
    "video/mp4": deterministic_fake_decoder,
}


def register_decoder(mime: str, fn: Callable[[bytes, str], np.ndarray]) -> None:
    DECODERS[mime] = fn


def _decode_real(payload: bytes, mime: str) -> np.ndarray:
    """Entry point for real codecs. STUB: no media libraries in this
    container — register one or rely on the deterministic fake."""
    fn = DECODERS.get(mime)
    if fn is None:
        raise NotImplementedError(f"no decoder registered for {mime}")
    return fn(payload, mime)


def extract_features(df: DataFrame) -> DataFrame:
    """media binary -> fixed-width feature vector, Arrow-batched.

    Per-row failures become (ok=false, error=...) rows — the engine's
    error-routing contract (a bad blob never kills the batch), matching
    cdc/validate.py semantics.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "ok": [], "error": [], "feature": [],
                "meta_width": pdf["width"], "meta_height": pdf["height"],
            }
            for payload, mime in zip(pdf["media"], pdf["mime"]):
                try:
                    feat = _decode_real(bytes(payload) if payload is not None else b"", mime)
                    out["ok"].append(True)
                    out["error"].append(None)
                    out["feature"].append(feat.tolist())
                except Exception as e:  # noqa: BLE001 — route, don't die
                    out["ok"].append(False)
                    out["error"].append(f"{type(e).__name__}: {e}")
                    out["feature"].append(None)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video binary -> one row per sampled frame (frame-sample plumbing).

    The fake 'decoder' emits ceil(duration/every_ms) deterministic frames;
    a real ffmpeg-backed decoder keeps the identical contract.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame": []}
            for doc_id, payload, dur in zip(pdf["doc_id"], pdf["media"], pdf["duration_ms"]):
                if payload is None or dur is None:
                    continue
                n = max(1, int(dur) // every_ms)
                base = _decode_real(bytes(payload), "video/mp4")
                for i in range(n):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame"].append((base + np.float32(i)).tolist())
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def make_media_fixture(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Seeded binary-media table for tests/benches (no external data)."""
    rng = np.random.default_rng(seed)
    mimes = ["image/png", "image/jpeg", "audio/wav", "video/mp4"]
    rows = []
    for i in range(n):
        size = int(rng.integers(64, 4096))
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        if i % 17 == 0:
            payload = b""  # seeded-bad rows exercise error routing
        rows.append((
            f"media-{i:06d}", bytearray(payload), mimes[i % 4],
            int(rng.integers(16, 4096)), int(rng.integers(16, 4096)),
            int(rng.integers(500, 60_000)),
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
