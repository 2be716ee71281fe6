"""Multimodal-column plumbing (SURVEY.md §2 C12).

Pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column with a typed metadata struct alongside; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so bytes
stream through Python in columnar batches (never row-at-a-time), and
the partitioning/pruning story stays plain Spark.

The actual codec work is STUBBED (this environment has no image/audio
libraries): ``decode_stub`` derives deterministic fake features from
the bytes. The Spark-side contract — schema, batch iteration, UDF
signature, partition sizing — is real and tested; swap
``_fake_decode`` for a real decoder (PIL/torchaudio/etc.) on a
cluster with the libs installed.
"""

from __future__ import annotations

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
    Real plumbing, fake codec (see _fake_decode)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["media"].map(lambda m: bytes(m["payload"]))
            decoded = payloads.map(_fake_decode)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media"].map(lambda m: m["media_type"]),
                "n_bytes": payloads.map(len).astype("int64"),
                "width": decoded.map(lambda d: d[0]).astype("int32"),
                "height": decoded.map(lambda d: d[1]).astype("int32"),
                "checksum": decoded.map(lambda d: d[2]).astype("int64"),
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
