"""Golden-pixel tests for the pure-numpy image codecs (C12/C13) and
their wiring into the multimodal decode/frame-sample operators.

Every fixture is generated in-test with the module's own encoders
(filter-aware PNG writer, clear-code LZW GIF writer), so the
decoders are checked against ground-truth numpy arrays, not against
themselves: encode applies the spec's forward transform, decode must
invert it exactly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from gcp_data_engineering_workshop_spark.operators import imagecodec as IC
from gcp_data_engineering_workshop_spark.operators import multimodal as MM


def _img(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(channels):
    img = _img(13, 9, channels, seed=channels)
    out = IC.decode_png(IC.encode_png(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_unfilters_every_filter_type(filt):
    """Each PNG scanline filter is applied by the encoder and must be
    exactly inverted by the decoder."""
    img = _img(8, 11, 3, seed=10 + filt)
    out = IC.decode_png(IC.encode_png(img, filters=[filt] * 8))
    assert np.array_equal(out, img)


def test_png_mixed_filters_and_known_pixels():
    """Hand-built 2x2 RGB image with per-row filters and hand-checked
    values."""
    img = np.array([[[255, 0, 0], [0, 255, 0]],
                    [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8)
    for filters in ([0, 4], [1, 2], [3, 1], [4, 3]):
        assert np.array_equal(IC.decode_png(IC.encode_png(img, filters)), img)


def test_png_palette_color_type():
    """Color type 3: indices resolve through PLTE."""
    palette = np.array([[250, 10, 20], [0, 128, 255], [7, 7, 7]],
                       dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    # build a palette PNG by hand: IHDR(color=3) + PLTE + IDAT
    h, w = idx.shape
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", palette.tobytes())
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    assert np.array_equal(IC.decode_png(png), palette[idx])


def test_png_rejects_unsupported_variants():
    img = _img(4, 4, 3)
    good = bytearray(IC.encode_png(img))
    with pytest.raises(ValueError):
        IC.decode_png(b"nope")
    bad_depth = bytearray(good)
    bad_depth[24] = 16  # IHDR bit-depth byte
    with pytest.raises(ValueError):
        IC.decode_png(bytes(bad_depth))


def test_bmp_decode_known_pixels():
    """24-bit bottom-up BMP built by hand: BGR on disk, padded rows."""
    img = np.array([[[255, 0, 0], [0, 255, 0]],
                    [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8)
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    rows = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y][:, ::-1].tobytes()  # RGB -> BGR
        rows += row + b"\x00" * (row_bytes - len(row))
    header = (b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(rows), 0, 0, 0, 0))
    assert np.array_equal(IC.decode_bmp(header + rows), img)


def test_gif_roundtrip_still_and_animated():
    palette = np.array([[0, 0, 0], [255, 255, 255], [255, 0, 0],
                        [0, 0, 255]], dtype=np.uint8)
    rng = np.random.default_rng(3)
    idx_frames = [rng.integers(0, 4, size=(7, 5)).astype(np.uint8)
                  for _ in range(3)]
    gif = IC.encode_gif(idx_frames, palette)
    frames = IC.gif_frames(gif)
    assert len(frames) == 3
    offsets = [off for off, _ in frames]
    assert offsets == sorted(offsets) and offsets[0] > 0
    for (off, got), idx in zip(frames, idx_frames):
        assert np.array_equal(got, palette[idx])


def test_gif_max_frames_bounds_decode():
    palette = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = [np.full((4, 4), i % 2, dtype=np.uint8) for i in range(5)]
    assert len(IC.gif_frames(IC.encode_gif(idx, palette), max_frames=2)) == 2


def test_decode_media_real_pixel_stats(spark):
    """C12 end-to-end: PNG/BMP/GIF payloads produce REAL stats
    (dimensions from decoded pixels, Rec.601 mean luma, pixel CRC);
    unknown payloads keep the declared fake fallback."""
    png_img = _img(6, 10, 3, seed=42)
    gif_pal = np.array([[0, 0, 0], [200, 100, 50]], dtype=np.uint8)
    gif_idx = np.array([[0, 1], [1, 0], [1, 1]], dtype=np.uint8)
    payloads = {
        1: ("image/png?", IC.encode_png(png_img), png_img),
        2: ("image/gif?", IC.encode_gif([gif_idx], gif_pal),
            gif_pal[gif_idx]),
        3: ("application/octet-stream", b"just some opaque bytes", None),
    }
    rows = [(k, {"media_type": mt, "payload": bytearray(p),
                 "n_chars": 0, "origin": "t"})
            for k, (mt, p, _) in payloads.items()]
    media = spark.createDataFrame(
        rows,
        "doc_id bigint, media struct<media_type string, payload binary, "
        "n_chars bigint, origin string>")
    out = {r.doc_id: r for r in MM.decode_media(media).collect()}

    for doc_id, mt in ((1, "image/png"), (2, "image/gif")):
        img = payloads[doc_id][2]
        r = out[doc_id]
        assert r.decoded and r.media_type == mt
        assert (r.width, r.height, r.n_channels) \
            == (img.shape[1], img.shape[0], img.shape[2])
        px = img.astype(np.float64)
        want_luma = round(float((0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
                                 + 0.114 * px[:, :, 2]).mean()), 4)
        assert r.mean_luma == pytest.approx(want_luma)
        assert r.checksum == zlib.crc32(img.tobytes())
    r3 = out[3]
    assert not r3.decoded and r3.n_channels is None
    fw, fh, cks = MM._fake_decode(b"just some opaque bytes")
    assert (r3.width, r3.height, r3.checksum) == (fw, fh, cks)


def test_frame_sample_real_gif_frames(spark):
    """C13: an animated GIF yields REAL sampled frames — true
    dimensions, per-frame pixel CRCs matching the decoded frames,
    actual descriptor byte offsets — while non-GIF payloads keep the
    byte-slice stub fan-out shape."""
    palette = np.array([[0, 0, 0], [255, 255, 255], [123, 45, 67]],
                       dtype=np.uint8)
    rng = np.random.default_rng(11)
    idx = [rng.integers(0, 3, size=(5, 4)).astype(np.uint8)
           for _ in range(6)]
    gif = IC.encode_gif(idx, palette)
    rows = [(1, {"media_type": "image/gif", "payload": bytearray(gif),
                 "n_chars": 0, "origin": "t"}),
            (2, {"media_type": "text/plain",
                 "payload": bytearray(b"x" * 100), "n_chars": 0,
                 "origin": "t"})]
    media = spark.createDataFrame(
        rows,
        "doc_id bigint, media struct<media_type string, payload binary, "
        "n_chars bigint, origin string>")
    out = MM.frame_sample(media, n_frames=4).collect()
    gif_rows = sorted([r for r in out if r.doc_id == 1],
                      key=lambda r: r.frame_idx)
    stub_rows = [r for r in out if r.doc_id == 2]
    assert len(gif_rows) == 4 and len(stub_rows) == 4
    decoded = IC.gif_frames(gif)
    # 6 frames sampled to 4: indices 0, 2, 3, 5
    want = [decoded[i] for i in (0, 2, 3, 5)]
    for r, (off, img) in zip(gif_rows, want):
        assert r.real_frame
        assert (r.frame_width, r.frame_height) == (img.shape[1],
                                                   img.shape[0])
        assert r.frame_offset_bytes == off
        assert r.frame_checksum == zlib.crc32(img.tobytes())
    assert all(not r.real_frame and r.frame_width is None
               for r in stub_rows)


def test_jpeg_roundtrip_444():
    """Baseline JPEG: encode 4:4:4 with the minimal encoder, decode
    with the full T.81 path (canonical Huffman, dequant, IDCT,
    YCbCr). A smooth gradient at q95 must round-trip near-exactly."""
    y, x = np.mgrid[0:32, 0:48]
    img = np.stack([np.clip(x * 5, 0, 255), np.clip(y * 7, 0, 255),
                    np.clip((x + y) * 3, 0, 255)], axis=2).astype(np.uint8)
    dec = IC.decode_jpeg(IC.encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    assert np.max(np.abs(dec.astype(int) - img.astype(int))) <= 4


def test_jpeg_roundtrip_grayscale_exact_gradient():
    y, _ = np.mgrid[0:24, 0:40]
    g = (y * 8 % 256).astype(np.uint8)
    dec = IC.decode_jpeg(IC.encode_jpeg(g, quality=90))
    assert dec.shape == (24, 40, 1)
    assert np.mean(np.abs(dec[:, :, 0].astype(float) - g)) < 2.0


def test_jpeg_roundtrip_420_subsampled_odd_dims():
    """4:2:0 exercises the MCU interleave + chroma upsampling path;
    odd dimensions exercise edge padding/cropping."""
    y, x = np.mgrid[0:37, 0:53]
    img = np.stack([np.clip(x * 4, 0, 255), np.clip(y * 5, 0, 255),
                    np.clip(255 - (x + y) * 2, 0, 255)],
                   axis=2).astype(np.uint8)
    dec = IC.decode_jpeg(IC.encode_jpeg(img, quality=92, subsample=True))
    assert dec.shape == img.shape
    assert np.mean(np.abs(dec.astype(float) - img)) < 4.0


def test_jpeg_rejects_non_baseline():
    import pytest
    with pytest.raises(ValueError):
        IC.decode_jpeg(b"\x00\x01not a jpeg")
    # progressive SOF2 must raise, not mis-decode
    blob = bytearray(IC.encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2
    with pytest.raises(ValueError):
        IC.decode_jpeg(bytes(blob))


def test_multimodal_decodes_jpeg_payload():
    from gcp_data_engineering_workshop_spark.operators import multimodal as MM
    y, x = np.mgrid[0:16, 0:16]
    img = np.stack([np.clip(x * 16, 0, 255)] * 3, axis=2).astype(np.uint8)
    blob = IC.encode_jpeg(img, quality=95)
    got = MM._try_decode_pixels(blob)
    assert got is not None
    mt, px = got
    assert mt == "image/jpeg" and px.shape == (16, 16, 3)


def test_wav_roundtrip_and_features():
    t = np.arange(3200)
    stereo = np.stack([(np.sin(t / 9) * 9000).astype(np.int16),
                       (np.sin(t / 17) * 5000).astype(np.int16)], axis=1)
    rate, got = IC.decode_wav(IC.encode_wav(stereo, 22050))
    assert rate == 22050 and got.shape == (3200, 2)
    assert (got == stereo).all()


def test_wav_8bit_and_rejects():
    import pytest
    # hand-build an 8-bit PCM wav
    data = bytes(range(64))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, got = IC.decode_wav(blob)
    assert rate == 8000 and got.shape == (64, 1)
    assert got[0, 0] == -128 and got[63, 0] == -65  # unsigned8 -> centered
    with pytest.raises(ValueError):
        IC.decode_wav(b"RIFFxxxxNOPE")


def test_mjpeg_frame_extraction():
    y, x = np.mgrid[0:16, 0:16]
    imgs = [np.stack([np.clip(x * (8 * (i + 1)), 0, 255)] * 3,
                     axis=2).astype(np.uint8) for i in range(3)]
    stream = b"".join(IC.encode_jpeg(im, quality=95) for im in imgs)
    frames = IC.mjpeg_frames(stream)
    assert len(frames) == 3
    assert frames[0][0] == 0 and frames[1][0] > 0
    for (off, dec), im in zip(frames, imgs):
        assert dec.shape == im.shape
        assert np.mean(np.abs(dec.astype(float) - im)) < 3.0


def test_frame_sample_mjpeg_real_frames(spark):
    from gcp_data_engineering_workshop_spark.operators import multimodal as MM
    y, x = np.mgrid[0:8, 0:8]
    imgs = [np.stack([np.full((8, 8), 32 * i, dtype=np.uint8)] * 3, axis=2)
            for i in range(6)]
    stream = b"".join(IC.encode_jpeg(im, quality=95) for im in imgs)
    media = spark.createDataFrame(
        [(1, ("video/mjpeg", stream, len(stream), "t"))],
        "doc_id bigint, media struct<media_type string, payload binary, "
        "n_chars bigint, origin string>")
    rows = MM.frame_sample(media, n_frames=4).collect()
    assert len(rows) == 4
    assert all(r.real_frame for r in rows)
    assert [r.frame_idx for r in rows] == [0, 1, 2, 3]
    # evenly sampled across the 6 frames: intensities are increasing
    vals = [r.mean_intensity for r in rows]
    assert vals == sorted(vals) and vals[0] < vals[-1]


def test_audio_features_spark_path(spark):
    from gcp_data_engineering_workshop_spark.operators import multimodal as MM
    t = np.arange(1600)
    wav = IC.encode_wav((np.sin(t / 5) * 10000).astype(np.int16), 16000)
    media = spark.createDataFrame(
        [(1, ("audio/wav", wav, len(wav))),
         (2, ("application/octet-stream", b"not audio", 9))],
        "doc_id bigint, media struct<media_type string, payload binary, "
        "n_chars bigint>")
    got = {r.doc_id: r for r in MM.audio_features(media).collect()}
    assert got[1].decoded and got[1].sample_rate == 16000
    assert got[1].n_samples == 1600 and abs(got[1].duration_s - 0.1) < 1e-9
    assert got[1].rms > 5000 and got[1].peak <= 10000
    assert not got[2].decoded and got[2].sample_rate is None


def test_multimodal_video_query_real_frames(spark):
    from gcp_data_engineering_workshop_spark.plans.textpipeline import (
        multimodal_video)
    rows = multimodal_video(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500 * 3
    assert all(r.real_frame for r in rows)
    assert all(r.frame_width == 16 and r.frame_height == 16 for r in rows)
    # frames within a doc are distinct (phase moves) and offsets ascend
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rs in by_doc.values():
        rs.sort(key=lambda r: r.frame_idx)
        offs = [r.frame_offset_bytes for r in rs]
        assert offs == sorted(offs) and offs[0] == 0
        assert len({r.frame_checksum for r in rs}) > 1


def test_phash_golden_vs_independent_dct():
    """phash64 must equal an independently-coded reference: direct
    nested-sum DCT-II, median threshold, row-major bit order."""
    import numpy as np
    from gcp_data_engineering_workshop_spark.operators.multimodal import (
        _area_resize, phash64)

    rng = np.random.default_rng(7)
    img = np.repeat(rng.uniform(0, 255, (48, 40))[:, :, None], 3,
                    axis=2).astype(np.uint8)
    # independent reference: same public construction, different code
    px = img.astype(np.float64)
    y = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    g = _area_resize(y, 32)
    dct = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            acc = 0.0
            for i in range(32):
                for j in range(32):
                    acc += (g[i, j]
                            * np.cos(np.pi * (2 * i + 1) * u / 64)
                            * np.cos(np.pi * (2 * j + 1) * v / 64))
            dct[u, v] = acc
    flat = dct.ravel()
    med = np.median(flat)
    want = 0
    for i, b in enumerate(flat > med):
        if b:
            want |= 1 << i
    if want >= 1 << 63:
        want -= 1 << 64
    assert phash64(img) == want


def test_phash_neardup_banded_equals_bruteforce(spark):
    """The 4x16 banded join must return EXACTLY the brute-force
    hamming<=3 pair set (pigeonhole), and the planted groups must
    actually produce pairs."""
    from pyspark.sql import functions as F

    from gcp_data_engineering_workshop_spark.catalog import load_table
    from gcp_data_engineering_workshop_spark.operators import multimodal as M

    docs = load_table(spark, "documents", "/root/testdata/sf0.001") \
        .where(F.col("doc_id") < 60)
    hashes = M.image_phash(M.as_image_media(docs)).collect()
    assert all(r.decoded for r in hashes)
    hs = {r.doc_id: r.phash & ((1 << 64) - 1) for r in hashes}
    want = set()
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(hs[a] ^ hs[b]).count("1") <= 3:
                want.add((a, b))
    assert len(want) >= 10  # planted within-group near-dups exist
    hdf = spark.createDataFrame(
        [(r.doc_id, r.phash) for r in hashes], "doc_id bigint, phash bigint")
    got = {(r.doc_a, r.doc_b)
           for r in M.phash_neardup_pairs(hdf, max_hamming=3).collect()}
    assert got == want


def test_image_phash_query_is_map_only(spark):
    """The decode+DCT pipeline is map-only: the single Exchange in
    the plan is the round-robin spread of BARE doc_ids before payload
    generation (parallelizing the single-file source) — no payload
    or hash ever shuffles."""
    from gcp_data_engineering_workshop_spark.plans.textpipeline import (
        image_phash)
    plan = image_phash(spark, "/root/testdata/sf0.001")._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "RoundRobinPartitioning" in plan


def test_image_dedup_corpus_keeps_canonicals(spark):
    """C56 end-to-end: survivors = all docs minus non-canonical
    members of phash-hamming components (independent union-find
    over brute-force pairs)."""
    from gcp_data_engineering_workshop_spark.catalog import load_table
    from gcp_data_engineering_workshop_spark.operators import multimodal as M
    from gcp_data_engineering_workshop_spark.plans import textpipeline as tp
    import os
    import pyspark.sql.functions as F

    src = load_table(spark, "documents", "/root/testdata/sf0.001") \
        .where(F.col("doc_id") < 60)
    hashes = M.image_phash(M.as_image_media(src)).collect()
    hs = {r.doc_id: r.phash & ((1 << 64) - 1) for r in hashes}
    parent = {v: v for v in hs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(hs[a] ^ hs[b]).count("1") <= 3:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for v in ids:
        comps.setdefault(find(v), []).append(v)
    want = {min(m) for m in comps.values()}
    assert len(want) < len(ids)  # planted groups actually collapse

    # run the full plan against a 60-doc slice written as a corpus
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        src.coalesce(1).write.mode("overwrite") \
            .parquet(os.path.join(d, "documents.parquet"))
        got = {r.doc_id for r in tp.image_dedup_corpus(spark, d).collect()}
    assert got == want


def test_audio_fingerprint_golden_vs_independent_dft():
    """audio_fingerprint64 must equal an independently-coded
    reference: direct DFT magnitude per window, argmax bin // 8."""
    from gcp_data_engineering_workshop_spark.operators.multimodal import (
        audio_fingerprint64)

    rng = np.random.default_rng(5)
    t = np.arange(3000, dtype=np.float64)
    wave = (np.sin(2 * np.pi * 1234.0 * t / 16000.0) * 9000
            + rng.uniform(-40, 40, 3000)).astype(np.int16)
    want = 0
    mono = wave.astype(np.float64)
    for w in range(16):
        seg = mono[w * 128:w * 128 + 256]
        if len(seg) < 256:
            seg = np.concatenate([seg, np.zeros(256 - len(seg))])
        n = np.arange(256)
        mags = []
        for k in range(129):
            c = np.exp(-2j * np.pi * k * n / 256)
            mags.append(abs((seg * c).sum()))
        mags[0] = 0.0
        want |= min(int(np.argmax(mags)) // 8, 15) << (4 * w)
    if want >= 1 << 63:
        want -= 1 << 64
    assert audio_fingerprint64(wave[:, None]) == want


def test_audio_dedup_banded_equals_bruteforce(spark):
    """C58: the banded fingerprint join returns exactly the
    brute-force hamming<=3 set, and the planted tone groups yield
    real pairs."""
    from pyspark.sql import functions as F

    from gcp_data_engineering_workshop_spark.catalog import load_table
    from gcp_data_engineering_workshop_spark.operators import multimodal as M

    docs = load_table(spark, "documents", "/root/testdata/sf0.001") \
        .where(F.col("doc_id") < 60)
    fps = M.audio_fingerprint(M.as_audio_media_grouped(docs)).collect()
    assert all(r.decoded for r in fps)
    hs = {r.doc_id: r.fprint & ((1 << 64) - 1) for r in fps}
    ids = sorted(hs)
    want = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
            if bin(hs[a] ^ hs[b]).count("1") <= 3}
    assert len(want) >= 10
    fdf = spark.createDataFrame(
        [(r.doc_id, r.fprint) for r in fps], "doc_id bigint, fprint bigint")
    got = {(r.doc_a, r.doc_b) for r in
           M.phash_neardup_pairs(fdf, max_hamming=3,
                                 hash_col="fprint").collect()}
    assert got == want


def test_codec_fuzz_truncation_and_corruption():
    """Decoders must fail CLEANLY (the exception families the
    operators catch) on truncated or bit-flipped payloads — never
    hang or return garbage silently. Exercises every container."""
    rng = np.random.default_rng(99)
    img = _img(12, 10, 3, seed=1)
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = [rng.integers(0, 2, size=(6, 6)).astype(np.uint8)]
    wave = (np.sin(np.arange(800) * 0.1) * 9000).astype(np.int16)
    payloads = {
        "png": IC.encode_png(img),
        "jpeg": IC.encode_jpeg(img, quality=85),
        "gif": IC.encode_gif(idx, pal),
        "wav": IC.encode_wav(wave),
    }
    decoders = {
        "png": IC.decode_png, "jpeg": IC.decode_jpeg,
        "gif": lambda p: IC.gif_frames(p), "wav": IC.decode_wav,
    }
    ok_errors = (ValueError, struct.error, IndexError, zlib.error,
                 EOFError, KeyError)
    for name, payload in payloads.items():
        dec = decoders[name]
        dec(payload)  # sanity: intact payload decodes
        for cut in (4, len(payload) // 3, len(payload) - 2):
            try:
                dec(payload[:cut])
            except ok_errors:
                pass  # clean failure is the contract
        for _ in range(10):
            b = bytearray(payload)
            for pos in rng.integers(0, len(b), 5):
                b[pos] ^= 0xFF
            try:
                out = dec(bytes(b))
                # surviving a flip is fine as long as the result is
                # still well-formed
                if name == "wav":
                    assert out[1].ndim == 2
                elif name == "gif":
                    assert all(f.ndim == 3 for _, f in out)
                else:
                    assert out.ndim == 3
            except ok_errors:
                pass
