"""Multimodal payload plumbing: opaque binary columns + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct, processed through Arrow-batched ``mapInPandas`` — the
exact shape the reference uses for its pixel payloads (one ndarray per
document, ``final_run_ocr.py:389-396``), generalized to any modality.

Image METADATA decode is REAL: ``parse_image_header`` reads PNG IHDR,
JPEG SOFn, and GIF logical-screen headers with pure stdlib byte walking —
no codec library needed — yielding true width/height/channels. Pixel-level
work (full raster decode, audio resample, video frame-sample) needs
libraries this container does not ship, so those kernels remain STUBS:
the placeholder feature vector is derived deterministically from the
parsed header (documented below), and ``decode_stub`` on a non-image
payload raises ``NotImplementedError`` unless ``fake=True``. The
Spark-side plumbing — schema, batching, partitioning, UDF signature — is
real and tested; a production deploy swaps the feature kernel for
Pillow/ffmpeg with no plan changes.
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


# JPEG start-of-frame markers that carry dimensions (C4=DHT, C8=JPG ext,
# CC=DAC are NOT SOF and are excluded)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_image_header(payload: bytes) -> dict | None:
    """REAL stdlib image-metadata decode: PNG IHDR / JPEG SOFn / GIF LSD.

    Returns ``{format, width, height, channels}`` or None if the bytes are
    not a recognizable image. No codec library involved — this is a pure
    header walk, the analog of the reference reading frame shape before OCR
    (final_run_ocr.py:389-396).
    """
    if not payload:
        return None
    p = bytes(payload)
    if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 26 and p[12:16] == b"IHDR":
        return {"format": "png",
                "width": int.from_bytes(p[16:20], "big"),
                "height": int.from_bytes(p[20:24], "big"),
                "channels": _PNG_CHANNELS.get(p[25], 3)}
    if p[:2] == b"\xff\xd8":
        i = 2
        while i + 10 <= len(p):
            if p[i] != 0xFF:
                return None
            marker = p[i + 1]
            if marker in _JPEG_SOF:
                return {"format": "jpeg",
                        "height": int.from_bytes(p[i + 5:i + 7], "big"),
                        "width": int.from_bytes(p[i + 7:i + 9], "big"),
                        "channels": p[i + 9]}
            if marker == 0xFF:  # fill byte: next byte may be the marker
                i += 1
                continue
            if 0xD0 <= marker <= 0xD9:  # standalone (SOI/EOI/RSTn), no length
                i += 2
                continue
            seglen = int.from_bytes(p[i + 2:i + 4], "big")
            if seglen < 2:
                return None
            i += 2 + seglen
        return None
    if p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
        return {"format": "gif",
                "width": int.from_bytes(p[6:8], "little"),
                "height": int.from_bytes(p[8:10], "little"),
                "channels": 3}
    return None


def parse_wav_header(payload: bytes) -> dict | None:
    """REAL stdlib audio-metadata decode: RIFF/WAVE fmt + data chunks.

    Returns ``{format, channels, sample_rate, duration_ms}`` or None.
    Chunk walk tolerates unknown chunks (LIST, INFO, ...) and truncation.
    """
    if not payload:
        return None
    p = bytes(payload)
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    i = 12
    channels = rate = block_align = None
    data_len = None
    while i + 8 <= len(p):
        cid = p[i:i + 4]
        clen = int.from_bytes(p[i + 4:i + 8], "little")
        if cid == b"fmt " and i + 16 <= len(p):
            channels = int.from_bytes(p[i + 10:i + 12], "little")
            rate = int.from_bytes(p[i + 12:i + 16], "little")
            block_align = int.from_bytes(p[i + 20:i + 22], "little") or None
        elif cid == b"data":
            data_len = clen
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if not channels or not rate:
        return None
    duration_ms = None
    if data_len is not None and block_align:
        duration_ms = int(data_len / (rate * block_align) * 1000)
    return {"format": "wav", "channels": channels, "sample_rate": rate,
            "duration_ms": duration_ms}


def header_features(width: int, height: int, channels: int) -> list[float]:
    """Placeholder feature kernel over the REAL parsed dimensions.

    Pixel statistics need a raster decode this container can't do, so the
    vector is a deterministic function of (width, height, channels) — the
    documented seam where a production deploy plugs Pillow/ffmpeg in.
    """
    return [((width * (i + 3) + height * (i + 7) + channels * (i + 1)) % 255)
            / 255.0 for i in range(N_FEATURES)]


def decode_stub(payload: bytes, fake: bool = False) -> dict:
    """Header-real decode: true dims from the byte header when the payload
    is PNG/JPEG/GIF; otherwise the deterministic fake (``fake=True``) or
    ``NotImplementedError`` (non-image modalities need ffmpeg etc.)."""
    hdr = parse_image_header(payload)
    if hdr is not None:
        return {"width": hdr["width"], "height": hdr["height"],
                "channels": hdr["channels"], "n_frames": 1,
                "feature": header_features(hdr["width"], hdr["height"],
                                           hdr["channels"])}
    wav = parse_wav_header(payload)
    if wav is not None:
        return {"width": None, "height": None,
                "channels": wav["channels"], "n_frames": 1,
                "feature": header_features(wav["sample_rate"] % 65536,
                                           wav["duration_ms"] or 0,
                                           wav["channels"])}
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "payload is not a PNG/JPEG/GIF; full media decode requires "
        "Pillow/ffmpeg (not in this container); pass fake=True for the "
        "deterministic stand-in")


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
