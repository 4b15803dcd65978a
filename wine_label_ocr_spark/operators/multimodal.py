"""Multimodal payload plumbing: opaque binary columns + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct, processed through Arrow-batched ``mapInPandas`` — the
exact shape the reference uses for its pixel payloads (one ndarray per
document, ``final_run_ocr.py:389-396``), generalized to any modality.

The actual codec work (JPEG decode, audio resample, video frame-sample)
needs libraries this container does not ship, so the decode kernels are
STUBS: ``decode_stub`` raises ``NotImplementedError`` unless
``fake=True``, in which case a clearly-marked deterministic fake produces
stable shapes/features from the bytes alone. The Spark-side plumbing —
schema, batching, partitioning, UDF signature — is real and tested; a
production deploy swaps ``_fake_decode`` for Pillow/ffmpeg kernels with
no plan changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, functions as F

MEDIA_META_DDL = ("media_type string, width int, height int, channels int, "
                  "duration_ms int, codec string")

FEATURES_DDL = (
    "url string, media_type string, width int, height int, channels int, "
    "n_frames int, feature array<float>, decode_ok boolean, error string"
)

N_FEATURES = 16


def _fake_decode(payload: bytes) -> dict:
    """DETERMINISTIC FAKE decode — stands in for a real codec.

    Shapes and a 16-dim feature vector derived purely from the bytes, so
    tests and plans are stable. NOT a real decoder.
    """
    d = hashlib.md5(payload or b"").digest()
    w = 64 + d[0] % 192
    h = 64 + d[1] % 192
    feat = [((d[i % 16] * (i + 1)) % 255) / 255.0 for i in range(N_FEATURES)]
    return {"width": w, "height": h, "channels": 3,
            "n_frames": 1 + d[2] % 4, "feature": feat}


def decode_stub(payload: bytes, fake: bool = False) -> dict:
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "real image/audio decode requires Pillow/ffmpeg (not in this "
        "container); pass fake=True for the deterministic stand-in")


def extract_media_features(df: DataFrame, payload_col: str = "payload",
                           fake: bool = True) -> DataFrame:
    """binary payloads → per-item features via Arrow-batched mapInPandas.

    Input: (url STRING, payload BINARY, media_type STRING). Pure map —
    inherits partitioning; per-executor memory is bounded by the Arrow
    batch size times max payload size, so callers feeding video should
    lower ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """
    def run(batches: Iterable) -> Iterator:
        import pandas as pd
        for pdf in batches:
            out = []
            for url, payload, mtype in zip(pdf["url"], pdf["payload"],
                                           pdf["media_type"]):
                try:
                    r = decode_stub(bytes(payload) if payload is not None else b"",
                                    fake=fake)
                    out.append((url, mtype, r["width"], r["height"],
                                r["channels"], r["n_frames"],
                                r["feature"], True, None))
                except Exception as e:  # tolerant parse, ST8 analog
                    out.append((url, mtype, None, None, None, None,
                                None, False, str(e)[:200]))
            yield pd.DataFrame(out, columns=[
                "url", "media_type", "width", "height", "channels",
                "n_frames", "feature", "decode_ok", "error"])

    return df.select("url", payload_col, "media_type") \
             .withColumnRenamed(payload_col, "payload") \
             .mapInPandas(run, schema=FEATURES_DDL)


def frame_sample_plan(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame-sampling as a plan: explode frame indices (metadata-only
    here; a real decoder would emit one row per sampled frame's pixels)."""
    return (df.withColumn("frame_idx",
                          F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)))
            .filter(F.pmod(F.col("frame_idx"), F.lit(every_n)) == 0))
