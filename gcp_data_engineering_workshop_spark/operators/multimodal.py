"""Multimodal-column plumbing (SURVEY.md §2 C12).

Pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column with a typed metadata struct alongside; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so bytes
stream through Python in columnar batches (never row-at-a-time), and
the partitioning/pruning story stays plain Spark.

Header METADATA parsing is REAL: ``parse_image_header`` reads
width/height straight from PNG/JPEG/GIF/BMP container bytes (pure
struct offsets, no codec library), which is all a metadata pass
needs at 100 TB — pixel DECODE is the part that stays stubbed
(``_fake_decode`` derives deterministic fake features) because the
container has no image libraries. The Spark-side contract — schema,
batch iteration, UDF signature, partition sizing — is real and
tested; swap ``_fake_decode`` for a real decoder
(PIL/torchaudio/etc.) on a cluster with the libs installed.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, checksum bigint"
)


def as_media(docs: DataFrame) -> DataFrame:
    """Wrap documents as (id, media struct) rows: opaque binary
    payload + typed metadata — the storage contract for multimodal
    columns."""
    return docs.select(
        "doc_id",
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.encode("text", "utf-8").alias("payload"),
            F.length("text").cast("bigint").alias("n_chars"),
            F.col("source").alias("origin"),
        ).alias("media"),
    )


def parse_image_header(payload: bytes):
    """REAL container-header parsing — (media_type, width, height)
    for PNG / JPEG / GIF / BMP payloads, None otherwise. Reads fixed
    offsets (and, for JPEG, walks segment markers to the first SOF);
    no codec library involved, which is exactly how a metadata-only
    pass avoids paying decode cost for 100 TB of blobs."""
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", payload[16:24])
        return "image/png", w, h
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return "image/gif", w, h
    if len(payload) >= 26 and payload[:2] == b"BM":
        w, h = struct.unpack("<ii", payload[18:26])
        return "image/bmp", w, abs(h)
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", payload[i + 2:i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                return "image/jpeg", w, h
            i += 2 + seg_len
    return None


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real image decode.

    STUB: real decoders are unavailable in this container. Derives
    (width, height, checksum) from the bytes so tests are stable.
    """
    checksum = 0
    for b in payload[:256]:
        checksum = (checksum * 31 + b) % ((1 << 31) - 1)
    width = 64 + checksum % 512
    height = 64 + (checksum // 512) % 512
    return width, height, checksum


def decode_stub(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (doc_id, media) rows.
    Real header parsing for recognized image containers
    (parse_image_header — true width/height and sniffed media type),
    deterministic fake features otherwise; real plumbing either
    way."""

    def one(m) -> tuple[str, int, int, int]:
        payload = bytes(m["payload"])
        fw, fh, checksum = _fake_decode(payload)
        hdr = parse_image_header(payload)
        if hdr is not None:
            mt, w, h = hdr
            return mt, w, h, checksum
        return m["media_type"], fw, fh, checksum

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["media"].map(one)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": decoded.map(lambda d: d[0]),
                "n_bytes": pdf["media"].map(
                    lambda m: len(bytes(m["payload"]))).astype("int64"),
                "width": decoded.map(lambda d: d[1]).astype("int32"),
                "height": decoded.map(lambda d: d[2]).astype("int32"),
                "checksum": decoded.map(lambda d: d[3]).astype("int64"),
            })

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_offset_bytes bigint, "
    "frame_checksum bigint"
)


def frame_sample_stub(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video-style frame sampling plumbing: each payload yields
    n_frames evenly-spaced 'frames' (deterministic byte-slices here —
    STUB for a real codec's keyframe extraction). One input row fans
    out to n rows inside the same Arrow batch, which is the shape a
    real frame sampler has: no shuffle, output co-partitioned with
    the input."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_offset_bytes": [],
                   "frame_checksum": []}
            for doc_id, m in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(m["payload"])
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    off = min(i * step, max(len(payload) - 1, 0))
                    chunk = payload[off:off + step]
                    cks = 0
                    for b in chunk[:64]:
                        cks = (cks * 31 + b) % ((1 << 31) - 1)
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset_bytes"].append(off)
                    out["frame_checksum"].append(cks)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
