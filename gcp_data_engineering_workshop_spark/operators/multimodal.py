"""Multimodal-column plumbing (SURVEY.md §2 C12/C13).

Pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column with a typed metadata struct alongside; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so bytes
stream through Python in columnar batches (never row-at-a-time), and
the partitioning/pruning story stays plain Spark.

Decode depth is tiered, most-real first:
  1. REAL pixel decode for PNG (zlib inflate + scanline unfilter),
     uncompressed 24-bit BMP, GIF (LZW decompression, per frame for
     animations), and baseline JPEG (canonical Huffman entropy
     decode, dequant + IDCT, 4:2:0 chroma upsampling, YCbCr->RGB) —
     see operators/imagecodec.py. These emit true
     width/height/channels, a mean-luminance feature, and a CRC of
     the raw pixels.
  2. REAL container-header parse (``parse_image_header``) when full
     decode isn't possible (progressive/arithmetic JPEG; truncated
     containers): true dimensions and sniffed type from struct
     offsets, no pixel stats.
  3. Deterministic fake features (``_fake_decode``) for anything
     else — the declared stub that keeps the plumbing working on
     arbitrary blobs; swap in PIL/ffmpeg on a cluster that has them.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcp_data_engineering_workshop_spark.operators import imagecodec as IC

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, n_channels int, mean_luma double, "
    "checksum bigint, decoded boolean"
)


def _luma(img: np.ndarray) -> float:
    """Mean luminance of a decoded frame: Rec.601 weights for RGB(A),
    plain channel-0 mean for gray(+alpha)."""
    px = img.astype(np.float64)
    if img.shape[2] >= 3:
        y = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
             + 0.114 * px[:, :, 2])
    else:
        y = px[:, :, 0]
    return round(float(y.mean()), 4)


def _try_decode_pixels(payload: bytes):
    """(media_type, (h, w, c) array) via the real codecs, or None."""
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return "image/png", IC.decode_png(payload)
        if payload[:2] == b"BM":
            return "image/bmp", IC.decode_bmp(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return "image/gif", IC.gif_frames(payload, max_frames=1)[0][1]
        if payload[:2] == b"\xff\xd8":
            return "image/jpeg", IC.decode_jpeg(payload)
    except (ValueError, zlib.error, struct.error, IndexError):
        return None
    return None


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


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (doc_id, media) rows.
    Tiered per payload — real pixel decode (PNG/BMP/GIF: true
    dimensions, channel count, mean luminance, pixel CRC), else real
    header parse (true dimensions, no pixels), else the deterministic
    fake. ``decoded`` records which rows carry real pixel stats."""

    def one(m):
        payload = bytes(m["payload"])
        px = _try_decode_pixels(payload)
        if px is not None:
            mt, img = px
            h, w, c = img.shape
            return (mt, w, h, c, _luma(img),
                    zlib.crc32(img.tobytes()), True)
        fw, fh, checksum = _fake_decode(payload)
        hdr = parse_image_header(payload)
        if hdr is not None:
            mt, w, h = hdr
            return mt, w, h, None, None, checksum, False
        return m["media_type"], fw, fh, None, None, checksum, False

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
                "n_channels": decoded.map(lambda d: d[3]).astype("Int32"),
                "mean_luma": decoded.map(lambda d: d[4]).astype("float64"),
                "checksum": decoded.map(lambda d: d[5]).astype("int64"),
                "decoded": decoded.map(lambda d: d[6]).astype("bool"),
            })

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


# kept name: the tiered fallback for unknown payloads is still the
# declared stub; PNG/BMP/GIF rows are fully decoded
decode_stub = decode_media


FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_offset_bytes bigint, "
    "frame_checksum bigint, frame_width int, frame_height int, "
    "mean_intensity double, real_frame boolean"
)


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video-style frame sampling: each payload yields up to
    n_frames evenly-spaced frames inside the same Arrow batch — the
    shape a real frame sampler has: no shuffle, output co-partitioned
    with the input.

    GIF payloads (incl. animated) and MJPEG elementary streams
    (concatenated baseline JPEGs — the DVR/webcam format) are REAL:
    frames come from the LZW / T.81 decoders, evenly sampled, with
    true per-frame dimensions, mean intensity, pixel CRC, and the
    frame's actual byte offset in the container. Other payloads keep
    the declared byte-slice stub (real codecs for interframe-coded
    containers need ffmpeg-class libraries)."""

    def emit(out, doc_id, i, off, cks, w, h, mi, real):
        out["doc_id"].append(doc_id)
        out["frame_idx"].append(i)
        out["frame_offset_bytes"].append(off)
        out["frame_checksum"].append(cks)
        out["frame_width"].append(w)
        out["frame_height"].append(h)
        out["mean_intensity"].append(mi)
        out["real_frame"].append(real)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("doc_id", "frame_idx", "frame_offset_bytes",
                    "frame_checksum", "frame_width", "frame_height",
                    "mean_intensity", "real_frame")}
            for doc_id, m in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(m["payload"])
                frames = None
                if payload[:6] in (b"GIF87a", b"GIF89a"):
                    try:
                        frames = IC.gif_frames(payload)
                    except (ValueError, IndexError, struct.error):
                        frames = None
                elif payload[:2] == b"\xff\xd8":
                    # MJPEG elementary stream: concatenated baseline
                    # JPEGs — real frames via the T.81 decoder
                    try:
                        frames = IC.mjpeg_frames(payload)
                    except (ValueError, IndexError, struct.error):
                        frames = None
                if frames is not None:
                    # evenly sample n_frames across the animation
                    # (all frames when the animation is shorter)
                    take = (range(len(frames)) if len(frames) <= n_frames
                            else [0] if n_frames == 1
                            else [round(i * (len(frames) - 1)
                                        / (n_frames - 1))
                                  for i in range(n_frames)])
                    for i, fi in enumerate(take):
                        off, img = frames[fi]
                        emit(out, doc_id, i, off,
                             zlib.crc32(img.tobytes()),
                             img.shape[1], img.shape[0], _luma(img), True)
                    continue
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    off = min(i * step, max(len(payload) - 1, 0))
                    chunk = payload[off:off + step]
                    cks = 0
                    for b in chunk[:64]:
                        cks = (cks * 31 + b) % ((1 << 31) - 1)
                    emit(out, doc_id, i, off, cks, None, None, None, False)
            pdf_out = pd.DataFrame(out)
            for c, t in (("frame_width", "Int32"), ("frame_height", "Int32"),
                         ("mean_intensity", "float64"),
                         ("real_frame", "bool")):
                pdf_out[c] = pdf_out[c].astype(t)
            yield pdf_out

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


# kept name: non-GIF payloads still take the declared byte-slice stub
frame_sample_stub = frame_sample


AUDIO_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "sample_rate int, n_channels int, n_samples bigint, "
    "duration_s double, rms double, peak int, checksum bigint, "
    "decoded boolean"
)


def audio_features(media: DataFrame) -> DataFrame:
    """Audio-modality twin of decode_media: WAV/PCM payloads decode
    for REAL (RIFF chunk walk, 8/16-bit PCM — imagecodec.decode_wav)
    and emit true sample rate / channels / duration plus RMS & peak
    amplitude and a raw-sample CRC; anything else keeps the
    deterministic byte-level fallback with decoded=false. Same
    scale shape as the image path: one Arrow-batched map stage, no
    shuffle, feature extraction is a numpy pass per payload."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "media_type", "n_bytes", "sample_rate",
                "n_channels", "n_samples", "duration_s", "rms", "peak",
                "checksum", "decoded")}
            for doc_id, m in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(m["payload"])
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(payload))
                try:
                    rate, samples = IC.decode_wav(payload)
                    mono = samples.astype(np.float64)
                    out["media_type"].append("audio/wav")
                    out["sample_rate"].append(rate)
                    out["n_channels"].append(samples.shape[1])
                    out["n_samples"].append(samples.shape[0])
                    out["duration_s"].append(
                        round(samples.shape[0] / rate, 6))
                    out["rms"].append(
                        round(float(np.sqrt((mono ** 2).mean())), 4)
                        if samples.size else 0.0)
                    # widen before abs: np.abs(int16 -32768) overflows
                    # back to -32768, understating a full-scale peak
                    out["peak"].append(
                        int(np.abs(samples.astype(np.int32)).max())
                        if samples.size else 0)
                    out["checksum"].append(
                        zlib.crc32(samples.tobytes()))
                    out["decoded"].append(True)
                except (ValueError, struct.error, IndexError):
                    cks = 0
                    for b in payload[:256]:
                        cks = (cks * 31 + b) % ((1 << 31) - 1)
                    out["media_type"].append("application/octet-stream")
                    out["sample_rate"].append(None)
                    out["n_channels"].append(None)
                    out["n_samples"].append(None)
                    out["duration_s"].append(None)
                    out["rms"].append(None)
                    out["peak"].append(None)
                    out["checksum"].append(cks)
                    out["decoded"].append(False)
            pdf_out = pd.DataFrame(out)
            for c, t in (("sample_rate", "Int32"), ("n_channels", "Int32"),
                         ("n_samples", "Int64"), ("duration_s", "float64"),
                         ("rms", "float64"), ("peak", "Int32")):
                pdf_out[c] = pdf_out[c].astype(t)
            yield pdf_out

    return media.mapInPandas(batches, schema=AUDIO_SCHEMA)


def as_audio_media(docs: DataFrame) -> DataFrame:
    """Deterministic WAV payloads derived from doc metadata (the
    audio analog of as_media's text-bytes wrapping): each doc gets a
    short PCM tone whose frequency/length derive from doc_id, built
    in the same Arrow batch — so the full audio path is testable
    with zero external fixtures."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                n = 400 + int(doc_id) % 7 * 100
                freq = 100.0 + (int(doc_id) * 2654435761 % 1000)
                t = np.arange(n, dtype=np.float64)
                wave = (np.sin(2 * np.pi * freq * t / 16000.0)
                        * 12000).astype(np.int16)
                payloads.append(IC.encode_wav(wave, 16000))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media": [{"media_type": "audio/wav", "payload": p,
                           "n_chars": len(p)} for p in payloads]})

    par = docs.sparkSession.sparkContext.defaultParallelism
    # one tiny exchange of bare doc_ids: without it the generator
    # inherits the source file's single partition and the whole
    # encode pipeline runs on ONE task
    return docs.select("doc_id").repartition(par).mapInPandas(
        batches,
        "doc_id bigint, media struct<media_type string, payload binary, "
        "n_chars bigint>")


# ----------------------------------------------- image perceptual hash
# Public pHash construction (pHash.org / the python imagehash recipe):
# grayscale -> 32x32 area resize -> 2D DCT-II -> 8x8 low-frequency
# block -> median threshold -> 64-bit sign hash. Near-dup images land
# within a few bits; the banded join below reuses the C3 SimHash
# pigeonhole (4 x 16-bit chunks: hamming <= 3 guarantees one equal
# chunk, so the candidate join is EXACT for max_hamming <= 3).

_DCT32 = None


def _dct_mat(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None or _DCT32.shape[0] != n:
        k = np.arange(n)
        _DCT32 = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    return _DCT32


def _area_resize(y: np.ndarray, n: int = 32) -> np.ndarray:
    """Deterministic box resize: each target cell is the mean of its
    source index bucket (floor(i * n / dim) mapping) — the arithmetic
    is plain bucket means, reproducible everywhere."""
    h, w = y.shape
    rb = np.floor(np.arange(h) * n / h).astype(np.int64)
    cb = np.floor(np.arange(w) * n / w).astype(np.int64)
    s = np.zeros((n, n))
    cnt = np.zeros((n, n))
    np.add.at(s, (rb[:, None], cb[None, :]), y)
    np.add.at(cnt, (rb[:, None], cb[None, :]), 1.0)
    return s / cnt


def phash64(img: np.ndarray) -> int:
    """64-bit perceptual hash of a decoded (h, w, c) frame. Bit i is
    1 when DCT low-freq coefficient i (row-major over the 8x8 block)
    exceeds the block median."""
    px = img.astype(np.float64)
    if img.shape[2] >= 3:
        y = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
             + 0.114 * px[:, :, 2])
    else:
        y = px[:, :, 0]
    g = _area_resize(y, 32)
    D = _dct_mat(32)
    block = (D @ g @ D.T)[:8, :8].ravel()
    med = np.median(block)
    bits = block > med
    h = int((bits.astype(np.uint64)
             << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
    return h - (1 << 64) if h >= (1 << 63) else h


PHASH_SCHEMA = ("doc_id bigint, phash bigint, width int, height int, "
                "decoded boolean")


def image_phash(media: DataFrame) -> DataFrame:
    """Per-payload pHash over binary media columns — one Arrow-batched
    map stage (zero shuffle), real pixels via the PNG/BMP/GIF/JPEG
    codecs; undecodable payloads emit phash NULL with decoded=false."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in
                   ("doc_id", "phash", "width", "height", "decoded")}
            for doc_id, m in zip(pdf["doc_id"], pdf["media"]):
                px = _try_decode_pixels(bytes(m["payload"]))
                out["doc_id"].append(doc_id)
                if px is None:
                    out["phash"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["decoded"].append(False)
                else:
                    _, img = px
                    out["phash"].append(phash64(img))
                    out["width"].append(img.shape[1])
                    out["height"].append(img.shape[0])
                    out["decoded"].append(True)
            pdf_out = pd.DataFrame(out)
            pdf_out["phash"] = pdf_out["phash"].astype("Int64")
            for c in ("width", "height"):
                pdf_out[c] = pdf_out[c].astype("Int32")
            yield pdf_out

    return media.mapInPandas(batches, schema=PHASH_SCHEMA)


def phash_neardup_pairs(hashes: DataFrame,
                        max_hamming: int = 3,
                        hash_col: str = "phash") -> DataFrame:
    """Image near-dup pairs by banded pHash join — the C3 SimHash
    machinery on the perceptual hash: candidates must share one of 4
    16-bit hash chunks (pigeonhole-EXACT for max_hamming <= 3), then
    bit_count(xor) filters exactly. All JVM-side integer codegen; the
    only Python stage is the upstream hash itself.

    ``hashes``: (doc_id, phash) — the image_phash output (undecoded
    NULL rows are dropped). The hash frame is persisted before the
    self-join: both join sides (and the banding explode) would
    otherwise re-run the whole decode+DCT upstream per side."""
    from gcp_data_engineering_workshop_spark.operators.cachepool import (
        register)
    assert max_hamming <= 3, "4x16 banding is only exact to hamming 3"
    sig = register(hashes.where(F.col(hash_col).isNotNull())
                   .select("doc_id", F.col(hash_col).alias("phash")))
    chunked = sig.select(
        "doc_id", "phash",
        F.explode(F.expr(
            "transform(sequence(0, 3), i -> struct(i as ci, "
            "(shiftrightunsigned(phash, 16 * i) & 65535) as cv))"
        )).alias("c")).select("doc_id", "phash", "c.ci", "c.cv")
    hamming = F.bit_count(
        F.col("x.phash").bitwiseXOR(F.col("y.phash"))).cast("bigint")
    return (chunked.alias("x")
            .join(chunked.alias("y"), ["ci", "cv"])
            .where(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("doc_a"),
                    F.col("y.doc_id").alias("doc_b"),
                    hamming.alias("hamming"))
            .distinct()
            .where(F.col("hamming") <= max_hamming))


def as_image_media(docs: DataFrame, group_size: int = 5,
                   size: int = 64) -> DataFrame:
    """Deterministic PNG payloads with PLANTED near-dup structure:
    docs in the same doc_id // group_size group share a smooth
    group-seeded base pattern (an 8x8 low-frequency field upsampled
    to size x size) plus tiny per-doc noise — so within-group pHashes
    sit a few bits apart and cross-group hashes far apart, giving the
    near-dup join real positives with zero external fixtures."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                g = int(doc_id) // group_size
                base_rng = np.random.default_rng(g * 2654435761 % (1 << 32))
                coarse = base_rng.uniform(0, 255, (8, 8))
                base = np.kron(coarse, np.ones((size // 8, size // 8)))
                doc_rng = np.random.default_rng(int(doc_id) % (1 << 32))
                noisy = np.clip(
                    base + doc_rng.uniform(-2, 2, base.shape), 0, 255)
                img = np.repeat(noisy[:, :, None], 3, axis=2).astype(np.uint8)
                payloads.append(IC.encode_png(img))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media": [{"media_type": "image/png", "payload": p,
                           "n_chars": len(p)} for p in payloads]})

    par = docs.sparkSession.sparkContext.defaultParallelism
    # one tiny exchange of bare doc_ids: without it the generator
    # inherits the source file's single partition and the whole
    # encode pipeline runs on ONE task
    return docs.select("doc_id").repartition(par).mapInPandas(
        batches,
        "doc_id bigint, media struct<media_type string, payload binary, "
        "n_chars bigint>")


# ------------------------------------------------ audio fingerprint
# Shazam-style landmark idea reduced to its deterministic core: STFT
# the PCM stream, take the dominant frequency bin per window, pack
# the first 16 windows' 4-bit quantized bins into a 64-bit
# fingerprint. Same-recording variants (different gain/phase/length,
# mild noise) keep their per-window argmax bins, so near-dups sit a
# few hamming bits apart and the C54 banded join applies unchanged.

FPRINT_SCHEMA = ("doc_id bigint, fprint bigint, n_windows int, "
                 "sample_rate int, decoded boolean")


def audio_fingerprint64(samples: np.ndarray, n_fft: int = 256,
                        hop: int = 128, n_windows: int = 16) -> int:
    """64-bit spectral fingerprint of a mono int PCM array: dominant
    rFFT bin per window, quantized to 4 bits (bin // 8, capped at
    15), first n_windows windows packed little-endian."""
    mono = samples.astype(np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    h = 0
    for w in range(n_windows):
        seg = mono[w * hop:w * hop + n_fft]
        if len(seg) < n_fft:
            seg = np.pad(seg, (0, n_fft - len(seg)))
        mag = np.abs(np.fft.rfft(seg))
        mag[0] = 0.0  # ignore DC: gain offsets must not vote
        bin4 = min(int(mag.argmax()) // 8, 15)
        h |= bin4 << (4 * w)
    return h - (1 << 64) if h >= (1 << 63) else h


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """Per-payload spectral fingerprint over binary WAV columns — one
    Arrow-batched map stage, real RIFF/PCM decode; undecodable
    payloads emit NULL with decoded=false."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "fprint", "n_windows",
                                   "sample_rate", "decoded")}
            for doc_id, m in zip(pdf["doc_id"], pdf["media"]):
                out["doc_id"].append(doc_id)
                try:
                    rate, samples = IC.decode_wav(bytes(m["payload"]))
                    out["fprint"].append(audio_fingerprint64(samples))
                    out["n_windows"].append(
                        max(0, (samples.shape[0] - 256) // 128 + 1))
                    out["sample_rate"].append(rate)
                    out["decoded"].append(True)
                except (ValueError, struct.error, IndexError):
                    out["fprint"].append(None)
                    out["n_windows"].append(None)
                    out["sample_rate"].append(None)
                    out["decoded"].append(False)
            pdf_out = pd.DataFrame(out)
            pdf_out["fprint"] = pdf_out["fprint"].astype("Int64")
            for c in ("n_windows", "sample_rate"):
                pdf_out[c] = pdf_out[c].astype("Int32")
            yield pdf_out

    return media.mapInPandas(batches, schema=FPRINT_SCHEMA)


def as_audio_media_grouped(docs: DataFrame, group_size: int = 5
                           ) -> DataFrame:
    """Deterministic WAV payloads with PLANTED near-dup structure
    (audio analog of as_image_media): docs in the same doc_id //
    group_size group share a 16-step TONE SCHEDULE — per 128-sample
    slice, even slices carry a group-random bin-centered tone at
    full amplitude, odd slices a quiet tone — so every STFT window
    has one clearly dominant, group-specific bin and the fingerprint
    carries ~8 informative nibbles (16^8 classes; a constant tone
    would collapse all windows to ONE nibble and the whole corpus to
    16 fingerprint classes, making 'near-dup' pairs Theta(n^2) —
    the flaw the r5 10x probe caught). Per-doc gain, tail length and
    low-level noise vary within a group; the 3x amplitude dominance
    keeps every window's argmax bin stable under that noise."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_slices = 20
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                g = int(doc_id) // group_size
                grng = np.random.default_rng(g * 2654435761 % (1 << 32))
                # bin-centered frequencies (bin * fs / n_fft) so the
                # dominant rFFT bin is exact, one per slice
                bins = grng.integers(8, 120, n_slices)
                drng = np.random.default_rng(int(doc_id) % (1 << 32))
                gain = 8000 + int(doc_id) % 7 * 500
                slices = []
                for si in range(n_slices + int(doc_id) % 3):
                    b = int(bins[si % n_slices])
                    amp = gain if si % 2 == 0 else gain * 0.3
                    t = np.arange(si * 128, (si + 1) * 128,
                                  dtype=np.float64)
                    slices.append(
                        np.sin(2 * np.pi * b * 62.5 * t / 16000.0) * amp)
                wave = np.concatenate(slices)
                wave = (wave + drng.uniform(-40, 40, len(wave))) \
                    .astype(np.int16)
                payloads.append(IC.encode_wav(wave, 16000))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media": [{"media_type": "audio/wav", "payload": p,
                           "n_chars": len(p)} for p in payloads]})

    par = docs.sparkSession.sparkContext.defaultParallelism
    return docs.select("doc_id").repartition(par).mapInPandas(
        batches,
        "doc_id bigint, media struct<media_type string, payload binary, "
        "n_chars bigint>")


def as_video_media(docs: DataFrame, n_frames: int = 3,
                   size: int = 16) -> DataFrame:
    """Deterministic MJPEG payloads derived per doc_id (video analog
    of as_audio_media): each doc gets n_frames tiny baseline-JPEG
    frames whose gradient phase derives from (doc_id, frame index),
    concatenated into a real MJPEG elementary stream — so the full
    REAL video-decode path is exercisable as a first-class query
    with zero fixtures."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        y, x = np.mgrid[0:size, 0:size]
        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                frames = []
                for fi in range(n_frames):
                    phase = (int(doc_id) * 31 + fi * 40) % 256
                    img = np.stack(
                        [np.clip((x * 8 + phase) % 256, 0, 255)] * 3,
                        axis=2).astype(np.uint8)
                    frames.append(IC.encode_jpeg(img, quality=90))
                payloads.append(b"".join(frames))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media": [{"media_type": "video/mjpeg", "payload": p,
                           "n_chars": len(p)} for p in payloads]})

    par = docs.sparkSession.sparkContext.defaultParallelism
    # one tiny exchange of bare doc_ids: without it the generator
    # inherits the source file's single partition and the whole
    # encode pipeline runs on ONE task
    return docs.select("doc_id").repartition(par).mapInPandas(
        batches,
        "doc_id bigint, media struct<media_type string, payload binary, "
        "n_chars bigint>")
