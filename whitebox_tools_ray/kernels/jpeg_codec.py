"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT).

De-stubs the multimodal image path (stages/multimodal.py) in a
container that ships no image libraries. Scope:

- ``jpeg_encode``: 8-bit grayscale ``(h, w)`` or RGB ``(h, w, 3)``
  arrays → JFIF baseline bytes. RGB encodes as YCbCr 4:4:4 (no
  subsampling); Annex-K quantization tables scaled by the IJG
  quality curve; Annex-K Huffman tables.
- ``jpeg_decode``: any *baseline* (SOF0) JFIF/EXIF stream, 1 or 3
  components, arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 …,
  nearest-neighbour chroma upsampling), restart markers honoured.
  Progressive (SOF2) and arithmetic coding are rejected with a clear
  error.

Everything except the Huffman symbol loop is vectorized (batched
einsum DCT/IDCT over all blocks at once); the bit-level loop is plain
Python — fine for the engine's 128 px tiles and documented as the
cost for megapixel inputs. The DCT uses the exact orthonormal matrix,
so encode→decode round trips hit the usual baseline-JPEG PSNR
(≈38-50 dB at q85-95 on natural images; see tests).
"""
from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU-T T.81 Annex K) -----------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QTBL_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
QTBL_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: block DCT = D @ f @ D.T
_k = np.arange(8).reshape(-1, 1)
_n = np.arange(8).reshape(1, -1)
_DCT = np.cos((2 * _n + 1) * _k * np.pi / 16) * 0.5
_DCT[0, :] *= 1 / np.sqrt(2)


def _scale_qtbl(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = int(min(100, max(1, quality)))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((tbl * scale + 50) / 100), 1, 255)


def _build_codes(bits, vals):
    """Canonical Huffman: {symbol: (code, length)}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    __slots__ = ("acc", "nbits", "out")

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(h, w) → (n_blocks, 8, 8), h/w already multiples of 8."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _pad8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_plane_symbols(bw, zz_blocks, dc_codes, ac_codes):
    """Huffman-encode one component's zigzagged quantized blocks."""
    pred = 0
    for zz in zz_blocks:
        dc = int(zz[0])
        diff = dc - pred
        pred = dc
        s = abs(diff).bit_length()
        c, ln = dc_codes[s]
        bw.write(c, ln)
        if s:
            bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        nz = np.nonzero(zz[1:])[0] + 1
        prev = 0
        for k in nz:
            run = int(k) - prev - 1
            prev = int(k)
            while run > 15:
                c, ln = ac_codes[0xF0]
                bw.write(c, ln)
                run -= 16
            v = int(zz[k])
            s = abs(v).bit_length()
            c, ln = ac_codes[(run << 4) | s]
            bw.write(c, ln)
            bw.write(v if v > 0 else v + (1 << s) - 1, s)
        if prev != 63:
            c, ln = ac_codes[0x00]  # EOB
            bw.write(c, ln)


def jpeg_encode(img: np.ndarray, quality: int = 85) -> bytes:
    """uint8 grayscale (h, w) or RGB (h, w, 3) → baseline JFIF bytes."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    q_luma = _scale_qtbl(QTBL_LUMA, quality)
    q_chroma = _scale_qtbl(QTBL_CHROMA, quality)
    qtbls = [q_luma] + ([q_chroma] * 2 if not gray else [])

    # vectorized DCT + quantize + zigzag per component
    zz_per_comp = []
    for plane, q in zip(planes, [q_luma, q_chroma, q_chroma][: len(planes)]):
        blocks = _blockify(_pad8(plane) - 128.0)
        coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
        # quantize in NATURAL order then take the zigzag scan
        zz = np.round(coef.reshape(-1, 64) / q.reshape(1, 64))
        zz_per_comp.append(zz[:, ZIGZAG].astype(np.int64))

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT
    for tid, q in enumerate([q_luma] + ([q_chroma] if not gray else [])):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(q[ZIGZAG].astype(np.uint8))
    # SOF0
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    # DHT
    for cls, dest, bits, vals in [
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
    ] + ([] if gray else [
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]):
        out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(vals), (cls << 4) | dest)
        out += bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BB", ci + 1, 0x00 if ci == 0 else 0x11)
    out += b"\x00\x3f\x00"

    # 4:4:4 scan: MCU = one block of each component in turn, but blocks
    # interleave per MCU — with Hi=Vi=1 every MCU carries exactly one
    # block per component in component order
    bw = _BitWriter()
    if gray:
        _encode_plane_symbols(bw, zz_per_comp[0], dc_l, ac_l)
    else:
        n_blocks = zz_per_comp[0].shape[0]
        preds = [0, 0, 0]
        for bi in range(n_blocks):
            for ci in range(3):
                zz = zz_per_comp[ci][bi]
                dc_codes = dc_l if ci == 0 else dc_c
                ac_codes = ac_l if ci == 0 else ac_c
                dc = int(zz[0])
                diff = dc - preds[ci]
                preds[ci] = dc
                s = abs(diff).bit_length()
                c, ln = dc_codes[s]
                bw.write(c, ln)
                if s:
                    bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
                nz = np.nonzero(zz[1:])[0] + 1
                prev = 0
                for k in nz:
                    run = int(k) - prev - 1
                    prev = int(k)
                    while run > 15:
                        c, ln = ac_codes[0xF0]
                        bw.write(c, ln)
                        run -= 16
                    v = int(zz[k])
                    s = abs(v).bit_length()
                    c, ln = ac_codes[(run << 4) | s]
                    bw.write(c, ln)
                    bw.write(v if v > 0 else v + (1 << s) - 1, s)
                if prev != 63:
                    c, ln = ac_codes[0x00]
                    bw.write(c, ln)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -----------------------------------------------------------------


class _HuffLUT:
    """16-bit-peek lookup: sym/length arrays of size 65536."""

    __slots__ = ("sym", "length")

    def __init__(self, bits, vals):
        self.sym = np.zeros(1 << 16, dtype=np.int16)
        self.length = np.zeros(1 << 16, dtype=np.int8)
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                lo = code << (16 - ln)
                hi = lo + (1 << (16 - ln))
                self.sym[lo:hi] = vals[k]
                self.length[lo:hi] = ln
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over unstuffed scan bytes."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.nbits = len(data) * 8

    def peek16(self) -> int:
        byte, off = divmod(self.pos, 8)
        chunk = self.data[byte : byte + 4]
        v = int.from_bytes(chunk.ljust(4, b"\x00"), "big")
        return (v >> (16 - off)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.pos += n

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.peek16() >> (16 - n) if n <= 16 else None
        if v is None:
            v = 0
            left = n
            while left > 0:
                take = min(16, left)
                v = (v << take) | (self.peek16() >> (16 - take))
                self.pos += take
                left -= take
            return v
        self.pos += n
        return v


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def jpeg_decode(buf: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 (h, w) or (h, w, 3)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (SOI missing)")
    qtbls: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], _HuffLUT] = {}
    comps = []  # (id, Hi, Vi, tq)
    h = w = 0
    scan_spec = None
    pos = 2
    n = len(buf)
    scan_data = None
    while pos < n:
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", buf, pos)[0]
        seg = buf[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables)
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                o += 1
                if pq == 0:
                    t = np.frombuffer(seg, np.uint8, 64, o).astype(np.float64)
                    o += 64
                else:
                    t = np.frombuffer(seg, ">u2", 64, o).astype(np.float64)
                    o += 128
                nat = np.empty(64)
                nat[ZIGZAG] = t
                qtbls[tq] = nat
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            o = 6
            for _ in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", seg, o)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
                o += 3
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}); only "
                "sequential baseline (SOF0/SOF1) is supported"
            )
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                cls, dest = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17 : o + 17 + nv])
                huffs[(cls, dest)] = _HuffLUT(bits, vals)
                o += 17 + nv
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = []
            o = 1
            for _ in range(ns):
                cid, tt = seg[o], seg[o + 1]
                sel.append((cid, tt >> 4, tt & 0xF))
                o += 2
            scan_spec = sel
            # entropy-coded data runs until the next non-RST marker
            dstart = pos + seg_len
            d = dstart
            while d < n - 1:
                if buf[d] == 0xFF and buf[d + 1] != 0x00 and not (
                    0xD0 <= buf[d + 1] <= 0xD7
                ):
                    break
                d += 1
            scan_data = buf[dstart:d]
            pos = d
            continue
        pos += seg_len
    if scan_spec is None or scan_data is None:
        raise ValueError("JPEG has no scan")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # split on restart markers; each interval resets DC predictions
    intervals = []
    cur = bytearray()
    i = 0
    m = len(scan_data)
    while i < m:
        b = scan_data[i]
        if b == 0xFF:
            nxt = scan_data[i + 1] if i + 1 < m else 0
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break
        cur.append(b)
        i += 1
    intervals.append(bytes(cur))

    comp_order = []
    for cid, td, ta in scan_spec:
        ci = next(k for k, c in enumerate(comps) if c[0] == cid)
        comp_order.append((ci, td, ta))

    # per-component zigzag coefficient store
    nblk = [
        (mcuy * comps[ci][2], mcux * comps[ci][1]) for ci in range(len(comps))
    ]
    coefs = [np.zeros((by * bx, 64), dtype=np.float64) for by, bx in nblk]

    mcu = 0
    total_mcus = mcux * mcuy
    for chunk in intervals:
        br = _BitReader(chunk)
        preds = [0] * len(comps)
        while mcu < total_mcus and br.pos + 8 <= br.nbits:
            my, mx = divmod(mcu, mcux)
            for ci, td, ta in comp_order:
                _, hi, vi, _tq = comps[ci]
                dlut = huffs[(0, td)]
                alut = huffs[(1, ta)]
                for v in range(vi):
                    for hh in range(hi):
                        zz = np.zeros(64)
                        p = br.peek16()
                        s = int(dlut.sym[p])
                        ln = int(dlut.length[p])
                        if ln == 0:
                            raise ValueError("bad Huffman code (DC)")
                        br.skip(ln)
                        diff = _extend(br.read(s), s) if s else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            p = br.peek16()
                            sym = int(alut.sym[p])
                            ln = int(alut.length[p])
                            if ln == 0:
                                raise ValueError("bad Huffman code (AC)")
                            br.skip(ln)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if sym == 0xF0:
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                break
                            zz[k] = _extend(br.read(size), size)
                            k += 1
                        by, bx = my * vi + v, mx * hi + hh
                        coefs[ci][by * nblk[ci][1] + bx] = zz
            mcu += 1

    # dequantize + batched IDCT + reassemble per component
    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        by, bx = nblk[ci]
        nat = np.empty_like(coefs[ci])
        nat[:, ZIGZAG] = coefs[ci]
        nat *= qtbls[tq].reshape(1, 64)
        blocks = nat.reshape(-1, 8, 8)
        pix = np.einsum("ji,njk,kl->nil", _DCT, blocks, _DCT) + 128.0
        plane = (
            pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        )
        # upsample to full resolution (nearest neighbour)
        ry, rx = vmax // vi, hmax // hi
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
