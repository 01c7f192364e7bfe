"""Pure-numpy PNG and baseline-JPEG codecs (no PIL in this container).

PNG needs only stdlib ``zlib``: encode writes adaptive per-row filters
(the standard minimum-absolute-sum heuristic over filter types 0-4) and
decode supports bit-depth-8 color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha) and 6 (RGBA), all five row filters, non-interlaced
(Adam7 raises NotImplementedError naming the gap). Lossless: roundtrip
is bit-exact.

JPEG is baseline sequential DCT from the ITU T.81 spec: the encoder
emits 4:4:4 with the Annex-K quantization + Huffman tables (libjpeg
quality scaling); the decoder handles SOF0 baseline streams with
sampling factors in {1,2} (4:4:4 / 4:2:2 / 4:2:0), multiple DQT/DHT
segments, and DRI restart markers. Progressive (SOF2) and arithmetic
coding raise NotImplementedError. DCT/IDCT are one einsum over all
blocks; the entropy coder is the only per-symbol Python loop —
acceptable for the thumbnail-scale payloads the media pipeline carries
(decode is O(compressed bytes), images are batch-decoded inside actor
workers).

Validation: roundtrip tests (PNG exact; JPEG PSNR floor) plus decode of
foreign known-good files (CPython's test-suite python.png — palette —
and python.jpg — baseline 4:2:0 produced by libjpeg), so the decoders
are checked against an independent producer, not just this encoder.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _paeth(a, b, c):
    """Paeth predictor, vectorized over int16+ arrays."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc), a,
                    np.where(pb <= pc, b, c)).astype(np.uint8)


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """uint8 (H, W) gray / (H, W, 3) RGB / (H, W, 4) RGBA -> PNG bytes.
    Adaptive per-row filter (min-sum-of-abs heuristic, the spec's
    recommendation) so every filter type gets exercised in roundtrips."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")
    rows = arr.reshape(h, w * ch)
    prev = np.zeros(w * ch, np.uint8)
    out = []
    for y in range(h):
        cur = rows[y]
        left = np.concatenate([np.zeros(ch, np.uint8), cur[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.uint8), prev[:-ch]])
        cands = [
            cur,
            cur - left,
            cur - prev,
            cur - ((left.astype(np.uint16) + prev.astype(np.uint16)) // 2)
            .astype(np.uint8),
            cur - _paeth(left, prev, upleft),
        ]
        # minimum sum of absolute differences (bytes as signed)
        scores = [int(np.abs(c.astype(np.int8).astype(np.int32)).sum())
                  for c in cands]
        ft = int(np.argmin(scores))
        out.append(bytes([ft]) + cands[ft].tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(out), level))
            + _png_chunk(b"IEND", b""))


def decode_png(b: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H, W) for gray, (H, W, C) otherwise.
    Palette rows are looked up to RGB (tRNS alpha honored -> RGBA)."""
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    idat = []
    plte = None
    trns = None
    while pos + 8 <= len(b):
        (ln,), tag = struct.unpack_from(">I", b, pos), b[pos + 4:pos + 8]
        body = b[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG")
    if comp or filt:
        raise ValueError("bad PNG compression/filter method")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if ch is None:
        raise NotImplementedError(f"PNG color type {color_type}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data size mismatch")
    data = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = data[:, 0]
    rows = data[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    zl = np.zeros(ch, np.uint8)
    for y in range(h):
        f = ftypes[y]
        cur = rows[y]
        if f == 0:
            rec = cur.copy()
        elif f == 1:  # Sub: per-lane prefix sum (mod 256)
            rec = np.cumsum(cur.reshape(-1, ch), axis=0,
                            dtype=np.uint64).astype(np.uint8).reshape(-1)
        elif f == 2:  # Up
            rec = cur + prev
        elif f == 3:  # Average — sequential in x, lanes vectorized
            rec = np.empty(stride, np.uint8)
            left = zl
            c2 = cur.reshape(-1, ch)
            p2 = prev.reshape(-1, ch)
            r2 = rec.reshape(-1, ch)
            for x in range(w):
                left = (c2[x] + ((left.astype(np.uint16)
                                  + p2[x].astype(np.uint16)) // 2)
                        .astype(np.uint8))
                r2[x] = left
        elif f == 4:  # Paeth — sequential in x, lanes vectorized
            rec = np.empty(stride, np.uint8)
            left = zl
            upleft = zl
            c2 = cur.reshape(-1, ch)
            p2 = prev.reshape(-1, ch)
            r2 = rec.reshape(-1, ch)
            for x in range(w):
                left = c2[x] + _paeth(left, p2[x], upleft)
                upleft = p2[x]
                r2[x] = left
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = rec
    img = out.reshape(h, w, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = img[:, :, 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[:len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if ch == 1:
        return img[:, :, 0]
    return img


# ---------------------------------------------------------------------------
# JPEG (baseline sequential, ITU T.81)

# Annex K quantization tables (luminance, chrominance), natural order
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int32)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int32)

# zigzag: _ZIG[k] = natural index of the k-th zigzag coefficient
_ZIG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int32)

# Annex K Huffman specs: (BITS count per code length 1..16, HUFFVAL)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8x8 DCT-II matrix
_x = np.arange(8)
_C = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16) * 0.5
_C[0] *= 1 / np.sqrt(2)


def _blocks_dct(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> (n, 8, 8) DCT coefficients."""
    return np.einsum("ux,nxy,vy->nuv", _C, blocks, _C, optimize=True)


def _blocks_idct(coefs: np.ndarray) -> np.ndarray:
    return np.einsum("xu,nuv,yv->nxy", _C.T, coefs, _C.T, optimize=True)


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int32)


def _huff_encode_table(bits, vals) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical per T.81 C.2."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, vals) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)          # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)    # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + the category-coded value bits."""
    if v == 0:
        return 0, 0
    s = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255) \
        .astype(np.uint8)


def _comp_blocks(plane: np.ndarray) -> np.ndarray:
    """Pad a component plane to 8x8 multiples (edge replicate) and split
    into (n, 8, 8) blocks in raster order."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return (plane.reshape(hh // 8, 8, ww // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8)), hh // 8, ww // 8


def encode_jpeg(arr: np.ndarray, quality: int = 85) -> bytes:
    """uint8 (H, W, 3) RGB (or (H, W) gray) -> baseline JFIF bytes,
    4:4:4 sampling, Annex-K tables at libjpeg ``quality`` scaling."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    ycc = (arr[:, :, None].astype(np.float64) if gray
           else _rgb_to_ycbcr(arr))
    ql = _quality_scale(_QL, quality)
    qc = _quality_scale(_QC, quality)
    ncomp = 1 if gray else 3
    qtabs = [ql] + ([] if gray else [qc, qc])

    dc_tabs = [_huff_encode_table(*_DC_L)] + \
        ([] if gray else [_huff_encode_table(*_DC_C)] * 2)
    ac_tabs = [_huff_encode_table(*_AC_L)] + \
        ([] if gray else [_huff_encode_table(*_AC_C)] * 2)

    bw = _BitWriter()
    # 4:4:4 -> MCU = one block per component; interleave in raster order
    comp_zz = []
    nby = nbx = None
    for ci in range(ncomp):
        blocks, nby, nbx = _comp_blocks(ycc[:, :, ci] - 128.0)
        coefs = _blocks_dct(blocks)
        q = np.round(coefs / qtabs[ci].reshape(8, 8)).astype(np.int32)
        comp_zz.append(q.reshape(-1, 64)[:, _ZIG])
    pred = [0] * ncomp
    for bi in range(nby * nbx):
        for ci in range(ncomp):
            zz = comp_zz[ci][bi]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            s, bits_v = _magnitude(diff)
            code, ln = dc_tabs[ci][s]
            bw.write(code, ln)
            if s:
                bw.write(bits_v, s)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_tabs[ci][0xF0]      # ZRL
                    bw.write(code, ln)
                    run -= 16
                s, bits_v = _magnitude(v)
                code, ln = ac_tabs[ci][(run << 4) | s]
                bw.write(code, ln)
                bw.write(bits_v, s)
                run = 0
            if last_nz < 63:
                code, ln = ac_tabs[ci][0x00]          # EOB
                bw.write(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = [struct.pack(">H", 0xFFD8)]
    out.append(seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    out.append(seg(0xFFDB, b"\x00" + bytes(ql[_ZIG].astype(np.uint8))))
    if not gray:
        out.append(seg(0xFFDB, b"\x01" + bytes(qc[_ZIG].astype(np.uint8))))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out.append(seg(0xFFC0, sof))
    for cls, tid, spec in ([(0, 0, _DC_L), (1, 0, _AC_L)] if gray else
                           [(0, 0, _DC_L), (1, 0, _AC_L),
                            (0, 1, _DC_C), (1, 1, _AC_C)]):
        bits, vals = spec
        out.append(seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits)
                       + bytes(vals)))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out.append(seg(0xFFDA, sos))
    out.append(bytes(bw.buf))
    out.append(struct.pack(">H", 0xFFD9))
    return b"".join(out)


class _BitReader:
    """Reads the entropy-coded segment: destuffs 0xFF00, stops at any
    other marker (leaving pos on it)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy data truncated")
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # EOI or next segment: pad with zero bits (spec allows)
                self.acc = (self.acc << 8)
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self):
        """Skip to just past the next RSTn marker, reset bit state."""
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                self.acc = 0
                self.nbits = 0
                return
            p += 1
        raise ValueError("expected JPEG restart marker")


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _huff_read(br: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 (H, W, 3) RGB (or (H, W) for
    single-component streams). Sampling factors in {1, 2}; DRI honored;
    progressive raises NotImplementedError."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None  # list of (cid, hs, vs, tq)
    h = w = 0
    restart_interval = 0
    scan = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", b, pos + 2)
        body = b[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq:
                    vals = np.frombuffer(body[i:i + 128], ">u2").astype(
                        np.int32)
                    i += 128
                else:
                    vals = np.frombuffer(body[i:i + 64], np.uint8).astype(
                        np.int32)
                    i += 64
                nat = np.empty(64, np.int32)
                nat[_ZIG] = vals
                qt[tq] = nat
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                huff[(cls, tid)] = _huff_decode_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):
            _, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}; only "
                "baseline sequential SOF0/SOF1 supported)")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c:3 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0xF))
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    if comps is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("JPEG sampling factors > 2")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    planes = {}
    for cid, hs, vs, tq in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8), np.float64)
    order = [(cs, by_id[cs][1], by_id[cs][2], by_id[cs][3], td, ta)
             for cs, td, ta in scan]

    br = _BitReader(b, pos)
    pred = {cs: 0 for cs, *_ in order}
    mcu_count = 0
    my = mx = 0
    while my < mcuy:
        if (restart_interval and mcu_count
                and mcu_count % restart_interval == 0):
            try:
                br.sync_restart()
            except ValueError:
                pass                        # tolerate missing final RST
            pred = {cs: 0 for cs in pred}
        try:
            for cs, hs, vs, tq, td, ta in order:
                dct = huff[(0, td)]
                act = huff[(1, ta)]
                q = qt[tq].reshape(8, 8)
                for byy in range(vs):
                    for bxx in range(hs):
                        zz = np.zeros(64, np.int32)
                        s = _huff_read(br, dct)
                        diff = _extend(br.read_bits(s), s) if s else 0
                        pred[cs] += diff
                        zz[0] = pred[cs]
                        k = 1
                        while k < 64:
                            rs = _huff_read(br, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break                    # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        nat = np.zeros(64, np.int32)
                        nat[_ZIG] = zz
                        blk = _blocks_idct(
                            (nat.reshape(8, 8) * q)[None].astype(np.float64)
                        )[0] + 128.0
                        y0 = (my * vs + byy) * 8
                        x0 = (mx * hs + bxx) * 8
                        planes[cs][y0:y0 + 8, x0:x0 + 8] = blk
        except _RestartMarker:
            # encoder emitted RST earlier than our count (shouldn't
            # happen for spec streams) — resync predictors and continue
            br.acc = 0
            br.nbits = 0
            br.pos += 2 if br.data[br.pos] == 0xFF else 0
            pred = {cs: 0 for cs in pred}
            continue
        mcu_count += 1
        mx += 1
        if mx == mcux:
            mx = 0
            my += 1

    out_planes = []
    for cid, hs, vs, tq in comps:
        p = planes[cid]
        if hs < hmax or vs < vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0),
                          hmax // hs, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(out_planes[0].round(), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(*out_planes[:3])


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10 * np.log10(255.0 ** 2 / mse)


# ---------------------------------------------------------------------------
# GIF (87a/89a) — stdlib-only: LZW is the whole codec, so unlike
# JPEG2000/WebP there is no library gap. Decode handles global/local
# palettes, interlace, transparency and frame disposal (none/keep/
# background/previous) and returns EVERY frame — animated GIF is the one
# real multi-frame container this environment can decode, so the video
# frame-sampling stage has a non-stub path (multimodal.SampleFrames).
# Encode writes GIF89a with a global palette (<= 256 distinct colors —
# the caller quantizes; ValueError names the excess), full-frame
# replacement disposal, and the NETSCAPE loop block for animations.
# The LZW symbol loops are per-code Python, same trade-off as the JPEG
# entropy coder above (payloads are thumbnail-scale, decoded inside
# actor workers).


def _gif_lzw_decode(data: bytes, min_code: int, npix: int) -> np.ndarray:
    """GIF-variant LZW: LSB-first codes, growing width, 12-bit cap."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code + 1
    out = bytearray()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = list(base)
                code_size = min_code + 1
                prev = None
                continue
            if code == end:
                return np.frombuffer(bytes(out[:npix]), np.uint8)
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"corrupt GIF LZW stream (code {code})")
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
            if len(out) >= npix:
                return np.frombuffer(bytes(out[:npix]), np.uint8)
    return np.frombuffer(bytes(out[:npix]), np.uint8)


def _gif_lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    """GIF LZW with (prefix_code, symbol) dict keys (no byte-string
    concatenation); emits CLEAR up front and on table overflow."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    code_size = min_code + 1
    emit(clear, code_size)
    prev = -1
    for sym in indices.tolist():
        if prev < 0:
            prev = sym
            continue
        hit = table.get((prev, sym))
        if hit is not None:
            prev = hit
            continue
        emit(prev, code_size)
        table[(prev, sym)] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code == 4096:
            emit(clear, code_size)
            table.clear()
            next_code = end + 1
            code_size = min_code + 1
        prev = sym
    if prev >= 0:
        emit(prev, code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> tuple[np.ndarray, list[int]]:
    """Decode every frame: returns ((F, H, W, 3) uint8, delays_ms).
    Frames are full canvas composites (disposal applied between)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, packed, bg, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    # composite-over-white convention (matches the PNG alpha path in
    # multimodal.decode_image_bytes): canvas starts white, and
    # disposal-to-background restores white — the GCT bg color is a
    # viewer hint, not pixel data
    canvas = np.full((h, w, 3), 255, np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay_ms = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:                         # trailer
            break
        if block == 0x21:                         # extension
            label = data[pos]
            pos += 1
            subs = []
            while data[pos]:
                ln = data[pos]
                subs.append(data[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and subs:            # graphic control
                gpk, dlo, dhi, tidx = subs[0][:4]
                disposal = (gpk >> 2) & 7
                transparent = tidx if gpk & 1 else None
                delay_ms = (dlo | (dhi << 8)) * 10
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        fx, fy, fw, fh, fpk = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        pal = gct
        if fpk & 0x80:
            n = 2 << (fpk & 7)
            pal = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame without any color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            ln = data[pos]
            lzw += data[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _gif_lzw_decode(bytes(lzw), min_code, fw * fh)
        if len(idx) < fw * fh:
            idx = np.pad(idx, (0, fw * fh - len(idx)))
        idx = idx.reshape(fh, fw)
        if fpk & 0x40:                            # interlaced
            de = np.empty_like(idx)
            src = 0
            for start, step in _GIF_INTERLACE:
                rows = range(start, fh, step)
                de[list(rows)] = idx[src:src + len(rows)]
                src += len(rows)
            idx = de
        before = canvas.copy() if disposal == 3 else None
        region = canvas[fy:fy + fh, fx:fx + fw]
        rgb = pal[np.clip(idx, 0, len(pal) - 1)]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay_ms)
        if disposal == 2:
            canvas[fy:fy + fh, fx:fx + fw] = 255
        elif disposal == 3 and before is not None:
            canvas = before
        # a GCE governs only the image that follows it (GIF89a spec
        # 23.c) — reset so a GCE-less later frame doesn't inherit it
        transparent, disposal, delay_ms = None, 0, 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames), delays


def encode_gif(frames: np.ndarray, delays_ms: list[int] | None = None,
               loop: int = 0) -> bytes:
    """Encode (F, H, W, 3) or (H, W, 3) uint8 with one global palette
    built from the distinct colors (> 256 raises — quantize first)."""
    frames = np.asarray(frames, np.uint8)
    if frames.ndim == 3:
        frames = frames[None]
    f, h, w, _ = frames.shape
    flat = frames.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"GIF needs <= 256 distinct colors, got {len(pal)}")
    bits = max(2, int(np.ceil(np.log2(max(len(pal), 2)))))
    ptab = np.zeros((1 << bits, 3), np.uint8)
    ptab[:len(pal)] = pal
    idx_all = inv.astype(np.uint8).reshape(f, h * w)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1),
                       0, 0)
    out += ptab.tobytes()
    if f > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        out += struct.pack("<H", loop) + b"\x00"
    delays_ms = delays_ms or [100] * f
    for fi in range(f):
        d = max(0, min(0xFFFF, delays_ms[fi] // 10))
        out += b"\x21\xf9\x04" + bytes([0x04]) + struct.pack("<H", d)
        out += b"\x00\x00"                        # no transparency
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        min_code = max(2, bits)
        out.append(min_code)
        lzw = _gif_lzw_encode(idx_all[fi], min_code)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off:off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
