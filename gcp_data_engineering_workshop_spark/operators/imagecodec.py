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
