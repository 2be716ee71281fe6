"""Pure-Python/numpy image codecs for the multimodal operators
(SURVEY.md §2 C12/C13).

The container has no image libraries, and the multimodal brief allows
a stub — but PNG/BMP decode and GIF frame extraction are small,
fully-public formats (RFC 2083 / the GIF89a spec), so the decode
stage is REAL for those three containers: zlib inflate + per-scanline
unfilter for PNG, raw pixel rows for BMP, LZW decompression +
palette lookup per frame for GIF (animated GIFs yield every frame).
Payloads that aren't one of these fall back to the deterministic fake
(documented stub) so the plumbing keeps working on arbitrary blobs.

Everything here is per-payload CPU work invoked from Arrow-batched
``mapInPandas`` — no Spark dependency in this module, so it is unit
testable with plain bytes. Encoders (filter-aware PNG, clear-code LZW
GIF) exist so tests can golden-check the decoders against
numpy-generated images without any external fixture.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG filter 4), vectorized over a scanline."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a,
                   np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to a (h, w, channels)
    uint8 array. Supports color types 0/2/3/4/6 and all five scanline
    filters. Raises ValueError on anything else — callers fall back
    to the declared stub path."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 \
            or color not in _PNG_CHANNELS:
        raise ValueError("unsupported PNG variant")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("bad decompressed size")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, line = int(filters[y]), rows[y].copy()
        prior = out[y - 1] if y else zero_row
        if f == 0:
            out[y] = line
        elif f == 2:  # Up — fully vectorized
            out[y] = line + prior
        elif f in (1, 3, 4):  # Sub / Average / Paeth — left-dependent,
            # vectorized across channels, sequential across pixels
            rec = out[y]
            for x in range(0, stride, ch):
                left = rec[x - ch:x] if x else zero_row[:ch]
                if f == 1:
                    rec[x:x + ch] = line[x:x + ch] + left
                elif f == 3:
                    avg = ((left.astype(np.uint16)
                            + prior[x:x + ch]) // 2).astype(np.uint8)
                    rec[x:x + ch] = line[x:x + ch] + avg
                else:
                    up_left = (out[y - 1, x - ch:x] if (y and x)
                               else zero_row[:ch])
                    rec[x:x + ch] = line[x:x + ch] + _paeth(
                        left, prior[x:x + ch], up_left)
        else:
            raise ValueError(f"bad filter {f}")
    img = out.reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        img = plte[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray, filters=None) -> bytes:
    """Minimal PNG encoder for tests: 8-bit, non-interlaced, one
    IDAT. ``filters`` picks the per-row filter type (default all 0)
    so every decoder unfilter path can be exercised — the encoder
    APPLIES the chosen filter, the decoder must invert it."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if filters is None:
        filters = [0] * h
    img = img.astype(np.uint8)
    zero_row = np.zeros(w * ch, dtype=np.uint8)
    flat = img.reshape(h, w * ch)
    lines = []
    for y in range(h):
        f = filters[y]
        cur = flat[y].astype(np.int16)
        prior = flat[y - 1] if y else zero_row
        left = np.concatenate([zero_row[:ch], flat[y][:-ch]]).astype(np.int16)
        up_left = (np.concatenate([zero_row[:ch], prior[:-ch]]) if y
                   else zero_row).astype(np.int16)
        if f == 0:
            filtered = cur
        elif f == 1:
            filtered = cur - left
        elif f == 2:
            filtered = cur - prior
        elif f == 3:
            filtered = cur - (left + prior) // 2
        elif f == 4:
            filtered = cur - _paeth(left.astype(np.uint8),
                                    prior.astype(np.uint8),
                                    up_left.astype(np.uint8))
        else:
            raise ValueError(f"bad filter {f}")
        lines.append(bytes([f]) + (filtered % 256).astype(np.uint8).tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------- BMP

def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BI_RGB BMP to (h, w, 3) uint8
    (RGB order; handles bottom-up and top-down row order)."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", payload[10:14])
    w, h_signed = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError("unsupported BMP variant")
    h, bottom_up = abs(h_signed), h_signed > 0
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    need = data_off + row_bytes * h
    if len(payload) < need:
        raise ValueError("truncated BMP")
    rows = np.frombuffer(payload[data_off:need], dtype=np.uint8)
    rows = rows.reshape(h, row_bytes)[:, :w * 3].reshape(h, w, 3)
    img = rows[::-1] if bottom_up else rows
    return img[:, :, ::-1].copy()  # BGR -> RGB


# ---------------------------------------------------------------- GIF

def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW: variable code width (min+1 .. 12 bits,
    LSB-first bit packing), clear/end control codes, dictionary grows
    by previous+first-of-current on each emit."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev = None
    acc = n_bits = 0
    for byte in data:
        acc |= byte << n_bits
        n_bits += 8
        while n_bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            n_bits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("bad LZW code")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_frames(payload: bytes, max_frames: int | None = None):
    """Walk a GIF87a/89a container and decode its image blocks.
    Yields (byte_offset_of_image_descriptor, (h, w, 3) uint8 RGB
    frame) for each frame — one for a still, many for an animation.
    Local palettes and interlacing are honored; frames are returned
    at their own (possibly sub-logical-screen) size."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    pos = 6
    gw, gh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[pos:pos + 7])
    pos += 7
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    frames = []
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + data sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            desc_off = pos
            _l, _t, fw, fh, fpacked = struct.unpack(
                "<HHHHB", payload[pos + 1:pos + 10])
            pos += 10
            palette = gct
            if fpacked & 0x80:
                n = 2 << (fpacked & 0x07)
                palette = np.frombuffer(payload[pos:pos + 3 * n],
                                        dtype=np.uint8).reshape(-1, 3)
                pos += 3 * n
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            if palette is None:
                raise ValueError("GIF frame without a palette")
            idx = _lzw_decode(bytes(data), min_code, fw * fh)
            if len(idx) < fw * fh:
                raise ValueError("short GIF frame data")
            idx = idx.reshape(fh, fw)
            if fpacked & 0x40:  # interlaced: reorder rows
                deinter = np.zeros_like(idx)
                src = 0
                for start, step in _GIF_INTERLACE:
                    for y in range(start, fh, step):
                        deinter[y] = idx[src]
                        src += 1
                idx = deinter
            frames.append((desc_off, palette[np.minimum(idx, len(palette) - 1)]))
            if max_frames is not None and len(frames) >= max_frames:
                break
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF with no image data")
    return frames


def encode_gif(frames, palette: np.ndarray) -> bytes:
    """Minimal animated-GIF encoder for tests: one global palette,
    clear-code-before-every-literal LZW (keeps the code width fixed —
    valid, just uncompressed), no extensions."""
    palette = palette.astype(np.uint8)
    n = len(palette)
    size_bits = max((n - 1).bit_length(), 1)
    n_padded = 1 << size_bits
    gh, gw = frames[0].shape[:2]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", gw, gh, 0x80 | (size_bits - 1), 0, 0)
    out += palette.tobytes() + b"\x00\x00\x00" * (n_padded - n)
    min_code = max(size_bits, 2)
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    for frame in frames:
        fh, fw = frame.shape[:2]
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, fw, fh, 0)
        out += bytes([min_code])
        acc = n_bits = 0
        stream = bytearray()

        def push(code: int):
            nonlocal acc, n_bits
            acc |= code << n_bits
            n_bits += width
            while n_bits >= 8:
                stream.append(acc & 0xFF)
                acc >>= 8
                n_bits -= 8

        push(clear)
        for v in frame.reshape(-1):
            push(int(v))
            push(clear)  # table never grows -> width never changes
        push(end)
        if n_bits:
            stream.append(acc & 0xFF)
        for i in range(0, len(stream), 255):
            sub = stream[i:i + 255]
            out += bytes([len(sub)]) + sub
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


# --------------------------------------------------------------- JPEG
# Baseline sequential DCT JPEG (ITU-T T.81): SOI/DQT/SOF0/DHT/SOS
# markers, canonical Huffman entropy decode with byte stuffing and
# restart markers, dequantize + zigzag + orthonormal IDCT, chroma
# upsampling, YCbCr->RGB. Grayscale and 1x1/2x1/1x2/2x2 sampling.
# Progressive (SOF2) and arithmetic coding are out of scope and fall
# back to the declared stub in multimodal.py.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

_DCT_C = np.array([[(np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
                    * np.cos((2 * x + 1) * u * np.pi / 16)
                    for x in range(8)] for u in range(8)])


def _idct2(block: np.ndarray) -> np.ndarray:
    return _DCT_C.T @ block @ _DCT_C


class _HuffTable:
    """Canonical JPEG Huffman table: (length, code) -> symbol."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lut = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at
    any other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.bits = (self.bits << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: consumed by caller
                else:
                    break  # EOI / next segment
                self.bits = (self.bits << 8) | b
                self.nbits += 8
                continue
            self.pos += 1
            self.bits = (self.bits << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                return 0
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self):
        """Skip to just after a RSTn marker and byte-align."""
        self.bits = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1

    def decode_huff(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (h, w, channels) uint8 (channels: 1
    grayscale / 3 RGB). Raises ValueError on non-baseline streams."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    comps = []  # (id, h, v, tq)
    w = h = 0
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            pos += 1
            continue
        marker = d[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", d[pos + 2:pos + 4])[0]
        seg = d[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                n = 128 if pq else 64
                raw = seg[i + 1:i + 1 + n]
                tbl = (np.frombuffer(raw, dtype=">u2") if pq
                       else np.frombuffer(raw, dtype=np.uint8))
                qt[tq] = tbl.astype(np.int32)
                i += 1 + n
        elif marker == 0xC0:  # SOF0 baseline
            h = struct.unpack(">H", seg[1:3])[0]
            w = struct.unpack(">H", seg[3:5])[0]
            nf = seg[5]
            comps = [(seg[6 + 3 * i], seg[7 + 3 * i] >> 4,
                      seg[7 + 3 * i] & 15, seg[8 + 3 * i])
                     for i in range(nf)]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (SOF%d)" % (marker - 0xC0))
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1:i + 17])
                n = sum(counts)
                tbl = _HuffTable(counts, seg[i + 17:i + 17 + n])
                (huff_ac if tc else huff_dc)[th] = tbl
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = {seg[1 + 2 * i]: (seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 15)
                    for i in range(ns)}
            data_pos = pos + 2 + seglen
            return _decode_scan(d, data_pos, w, h, comps, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        pos += 2 + seglen
    raise ValueError("no SOS segment")


def _decode_scan(d, pos, w, h, comps, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {cid: np.zeros((mcuy * cv * 8, mcux * ch * 8))
              for cid, ch, cv, _ in comps}
    reader = _BitReader(d, pos)
    preds = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.align_restart()
                preds = {cid: 0 for cid in preds}
            mcu_count += 1
            for cid, ch, cv, tq in comps:
                dct, act = scan[cid]
                for by in range(cv):
                    for bx in range(ch):
                        coefs = np.zeros(64, dtype=np.int64)
                        t = reader.decode_huff(huff_dc[dct])
                        diff = _extend(reader.read_bits(t), t)
                        preds[cid] += diff
                        coefs[0] = preds[cid]
                        kk = 1
                        while kk < 64:
                            sym = reader.decode_huff(huff_ac[act])
                            if sym == 0x00:
                                break
                            run, size = sym >> 4, sym & 15
                            if sym == 0xF0:
                                kk += 16
                                continue
                            kk += run
                            if kk > 63:
                                break
                            coefs[kk] = _extend(reader.read_bits(size), size)
                            kk += 1
                        block = np.zeros(64)
                        block[_ZIGZAG] = coefs * qt[tq]
                        px = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = px
    out_planes = []
    for cid, ch, cv, _ in comps:
        p = planes[cid]
        if ch != hmax or cv != vmax:  # upsample to full grid
            p = np.repeat(np.repeat(p, vmax // cv, axis=0),
                          hmax // ch, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(out_planes[0] + 0.5, 0, 255).astype(
            np.uint8)[:, :, None]
    y, cb, cr = out_planes[0], out_planes[1] - 128, out_planes[2] - 128
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


_STD_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)


def _enc_tables():
    """Encoder Huffman tables: flat canonical codes (12 DC symbols at
    4 bits, 162 standard AC run/size symbols at 8 bits — both leave
    the all-ones code unused as T.81 requires). Any valid table is
    legal since the DHT segment ships with the stream; flat codes
    keep the encoder trivial while the decoder exercises the same
    canonical machinery real streams use."""
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)]
    dc_counts = [0] * 16
    dc_counts[3] = len(dc_syms)       # all length 4
    ac_counts = [0] * 16
    ac_counts[7] = len(ac_syms)       # all length 8
    def codes(counts, syms):
        out = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                out[syms[k]] = (ln, code)
                code += 1
                k += 1
            code <<= 1
        return out
    return (dc_counts, dc_syms, codes(dc_counts, dc_syms),
            ac_counts, ac_syms, codes(ac_counts, ac_syms))


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, length, code):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: bool = False) -> bytes:
    """Minimal baseline JPEG encoder (4:4:4, 4:2:0 with
    ``subsample=True``, or grayscale) so tests can round-trip
    decode_jpeg — including its chroma-upsampling and MCU-interleave
    paths — without any external library."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if subsample and ch == 3:
        return _encode_jpeg_420(img, quality)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = np.clip((_STD_QT_LUMA * s + 50) // 100, 1, 255).astype(np.int32)
    if ch == 3:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128]
    else:
        planes = [img[:, :, 0].astype(np.float64)]
    dc_counts, dc_syms, dc_code, ac_counts, ac_syms, ac_code = _enc_tables()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    # DQT wants the value of natural index ZIGZAG[k] at position k
    zz_qt = qt.reshape(64)[_ZIGZAG]
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in zz_qt))
    comps = bytes()
    for i in range(ch):
        comps += bytes([i + 1, 0x11, 0])
    out += seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
               + bytes([ch]) + comps)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))
    scomp = bytes()
    for i in range(ch):
        scomp += bytes([i + 1, 0x00])
    out += seg(0xDA, bytes([ch]) + scomp + bytes([0, 63, 0]))

    bw = _BitWriter()
    qflat = qt.reshape(8, 8).astype(np.float64)
    preds = [0] * ch
    by_max, bx_max = -(-h // 8), -(-w // 8)
    padded = []
    for p in planes:
        pp = np.zeros((by_max * 8, bx_max * 8))
        pp[:h, :w] = p
        if h < by_max * 8:
            pp[h:, :w] = p[-1:, :]
        if w < bx_max * 8:
            pp[:, w:] = pp[:, w - 1:w]
        padded.append(pp)

    def put_val(v):
        t = 0 if v == 0 else max(int(np.floor(np.log2(abs(v)))) + 1, 1)
        return t, (v if v >= 0 else v + (1 << t) - 1)

    for by in range(by_max):
        for bx in range(bx_max):
            for ci in range(ch):
                block = padded[ci][by * 8:by * 8 + 8,
                                   bx * 8:bx * 8 + 8] - 128.0
                coef = _DCT_C @ block @ _DCT_C.T
                q = np.round(coef / qflat).astype(np.int64)
                zz = q.reshape(64)[_ZIGZAG]
                diff = int(zz[0]) - preds[ci]
                preds[ci] = int(zz[0])
                t, bits = put_val(diff)
                ln, code = dc_code[t]
                bw.put(ln, code)
                if t:
                    bw.put(t, bits)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        ln, code = ac_code[0xF0]
                        bw.put(ln, code)
                        run -= 16
                    t, bits = put_val(v)
                    ln, code = ac_code[(run << 4) | t]
                    bw.put(ln, code)
                    bw.put(t, bits)
                    run = 0
                if last_nz < 63:
                    ln, code = ac_code[0x00]
                    bw.put(ln, code)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _encode_block(bw, block, qflat, pred, dc_code, ac_code):
    """DCT + quantize + entropy-code one 8x8 block; returns new DC
    pred."""
    coef = _DCT_C @ (block - 128.0) @ _DCT_C.T
    q = np.round(coef / qflat).astype(np.int64)
    zz = q.reshape(64)[_ZIGZAG]

    def put_val(v):
        t = 0 if v == 0 else max(int(np.floor(np.log2(abs(v)))) + 1, 1)
        return t, (v if v >= 0 else v + (1 << t) - 1)

    diff = int(zz[0]) - pred
    t, bits = put_val(diff)
    ln, code = dc_code[t]
    bw.put(ln, code)
    if t:
        bw.put(t, bits)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            ln, code = ac_code[0xF0]
            bw.put(ln, code)
            run -= 16
        t, bits = put_val(v)
        ln, code = ac_code[(run << 4) | t]
        bw.put(ln, code)
        bw.put(t, bits)
        run = 0
    if last_nz < 63:
        ln, code = ac_code[0x00]
        bw.put(ln, code)
    return int(zz[0])


def _encode_jpeg_420(img: np.ndarray, quality: int) -> bytes:
    """4:2:0 variant: MCUs interleave 4 Y blocks + 1 Cb + 1 Cr; the
    chroma planes are 2x2-mean downsampled."""
    h, w, _ = img.shape
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = np.clip((_STD_QT_LUMA * s + 50) // 100, 1, 255).astype(np.int32)
    r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
    Y = 0.299 * r + 0.587 * g + 0.114 * b
    Cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    Cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    mcux, mcuy = -(-w // 16), -(-h // 16)

    def pad(p, hh, ww):
        out = np.zeros((hh, ww))
        ph, pw = p.shape
        out[:ph, :pw] = p
        if ph < hh:
            out[ph:, :pw] = p[-1:, :]
        if pw < ww:
            out[:, pw:] = out[:, pw - 1:pw]
        return out

    Yp = pad(Y, mcuy * 16, mcux * 16)
    # 2x2 mean downsample AFTER padding to the full MCU grid
    Cbp = pad(Cb, mcuy * 16, mcux * 16)
    Crp = pad(Cr, mcuy * 16, mcux * 16)
    Cbs = Cbp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
    Crs = Crp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))

    dc_counts, dc_syms, dc_code, ac_counts, ac_syms, ac_code = _enc_tables()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in
                                           qt.reshape(64)[_ZIGZAG]))
    out += seg(0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
               + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00]) + bytes([0, 63, 0]))

    bw = _BitWriter()
    qflat = qt.reshape(8, 8).astype(np.float64)
    py = pcb = pcr = 0
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(2):
                for bx in range(2):
                    y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                    py = _encode_block(
                        bw, Yp[y0:y0 + 8, x0:x0 + 8], qflat, py,
                        dc_code, ac_code)
            y0, x0 = my * 8, mx * 8
            pcb = _encode_block(bw, Cbs[y0:y0 + 8, x0:x0 + 8], qflat,
                                pcb, dc_code, ac_code)
            pcr = _encode_block(bw, Crs[y0:y0 + 8, x0:x0 + 8], qflat,
                                pcr, dc_code, ac_code)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# -------------------------------------------------- MJPEG / WAV (PCM)
# Motion-JPEG elementary streams are literally concatenated baseline
# JPEGs (the format DVRs/webcams emit); with the T.81 decoder above,
# video frame extraction is real for them. Framing walks segment
# lengths: byte stuffing only guarantees no markers inside ENTROPY
# data, so a raw 0xFFD9 scan could truncate a frame at a stray byte
# pair inside a DQT/APPn/COM payload — the length walk cannot.

def _jpeg_frame_end(payload: bytes, soi: int) -> int | None:
    """Index one past this frame's EOI, found by walking marker
    segment lengths from the SOI at ``soi`` (mirrors decode_jpeg's
    marker loop). Returns None for a truncated/malformed frame."""
    pos, n = soi + 2, len(payload)
    while pos + 1 < n:
        if payload[pos] != 0xFF:
            return None
        m = payload[pos + 1]
        if m == 0xFF:       # fill byte
            pos += 1
            continue
        if m == 0xD9:       # EOI
            return pos + 2
        if m == 0xD8 or 0xD0 <= m <= 0xD7 or m == 0x01:
            pos += 2        # standalone markers carry no length
            continue
        if pos + 4 > n:
            return None
        (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        pos += 2 + seglen
        if m == 0xDA:
            # entropy-coded data: only 0xFF00 stuffing and RST
            # markers may appear inside; scan to the next real marker
            while pos + 1 < n:
                if (payload[pos] == 0xFF and payload[pos + 1] != 0x00
                        and not 0xD0 <= payload[pos + 1] <= 0xD7):
                    break
                pos += 1
    return None


def mjpeg_frames(payload: bytes, max_frames: int | None = None):
    """Split an MJPEG stream into [(byte_offset, decoded_frame)].
    Raises ValueError if no complete JPEG frame is found."""
    frames = []
    pos = 0
    while True:
        start = payload.find(b"\xff\xd8", pos)
        if start < 0:
            break
        end = _jpeg_frame_end(payload, start)
        if end is None:
            break
        frames.append((start, decode_jpeg(payload[start:end])))
        pos = end
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("no JPEG frames")
    return frames


def decode_wav(payload: bytes):
    """RIFF/WAVE PCM decode -> (sample_rate, (n_samples, n_channels)
    int array). Supports 8/16-bit integer PCM (format tag 1)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks pad to even
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, nch, rate, _, _, bits = fmt
    if tag != 1 or bits not in (8, 16):
        raise ValueError("unsupported WAV encoding")
    if bits == 16:
        samples = np.frombuffer(
            data[:len(data) // (2 * nch) * 2 * nch], dtype="<i2")
    else:
        samples = np.frombuffer(
            data[:len(data) // nch * nch], dtype=np.uint8
        ).astype(np.int16) - 128
    return rate, samples.reshape(-1, nch)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Minimal 16-bit PCM WAV writer for tests. ``samples``:
    (n, channels) int16."""
    if samples.ndim == 1:
        samples = samples[:, None]
    nch = samples.shape[1]
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * nch * 2, nch * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body
