"""Pure-Python baseline JPEG (JFIF) codec — closes the last compressed
image format behind ``decode_pixels`` without any codec library.

Decoder: baseline sequential DCT (SOF0), 8-bit, 1–3 components, 4:4:4
and 4:2:0 (and any h/v ≤ 2) sampling, multi-table DQT/DHT segments,
byte-stuffed entropy stream, edge-padded partial MCUs cropped on
output. Progressive (SOF2), arithmetic coding, 12-bit precision and
restart intervals raise ``JpegUnsupported`` so the caller can fall back
(Pillow when present — see multimodal.decode_pixels).

Encoder (fixture-grade, used by tests and q112's synthesizer): identity
quantization tables (all ones) and simple canonical Huffman tables the
encoder WRITES INTO the stream (12 four-bit DC codes; the 162 standard
AC symbols — (run 0..15 × size 1..10) + EOB + ZRL — all eight bits), so
no spec-constant tables are needed and any conformant decoder reads the
result. With identity quantization an 8×8-flat block round-trips
EXACTLY (its DCT is DC-only and the DC scale is a power of two), and
gray pixels (R=G=B) are fixed points of the YCbCr round-trip — which is
what lets q112 hash-match decoded JPEG bytes against a closed form.

Like the BMP/PNG/WAV codecs, this is a from-scratch implementation of a
public format (ITU T.81 baseline process), not a port of any library.
"""

from __future__ import annotations

import math
import struct

import numpy as np


class JpegUnsupported(ValueError):
    """Feature outside the baseline subset this decoder implements."""


# orthonormal DCT-II basis: M[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
_M = np.array(
    [
        [
            (math.sqrt(0.5) if u == 0 else 1.0) * 0.5 * math.cos((2 * x + 1) * u * math.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _fdct(block: np.ndarray) -> np.ndarray:
    return _M @ block @ _M.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _M.T @ coef @ _M


# ---------------------------------------------------------------- huffman

def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-padding per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed data byte
            elif 0xD0 <= nxt <= 0xD7:
                raise JpegUnsupported("restart markers not supported")
            else:
                raise ValueError("unexpected marker inside entropy stream")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((code, length))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")


def _extend(v: int, size: int) -> int:
    """JPEG magnitude decode: high bit 0 means negative."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, bits) for huffman coding."""
    size = abs(v).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


# ---------------------------------------------------------------- decoder

def decode_jpeg(blob: bytes) -> tuple[int, int, list[bytes]]:
    """Decode a baseline JFIF blob to (width, height, RGB rows) — same
    contract as decode_bmp/decode_png. Truncated or corrupt input raises
    a clean ValueError (never an IndexError from running off the end)."""
    try:
        return _decode_jpeg(blob)
    except (IndexError, struct.error) as e:
        raise ValueError("truncated or corrupt JPEG stream") from e


def _decode_jpeg(blob: bytes) -> tuple[int, int, list[bytes]]:
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    w = h = 0
    pos = 2
    while True:
        if blob[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("no scan data before EOI")
        seglen = struct.unpack(">H", blob[pos : pos + 2])[0]
        seg = blob[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.array(list(seg[i : i + 64]), dtype=np.float64)
                    i += 64
                else:
                    tbl = np.array(
                        list(struct.unpack(f">{64}H", seg[i : i + 128])), dtype=np.float64
                    )
                    i += 128
                un = np.empty(64)
                un[_ZIGZAG] = tbl  # de-zigzag
                qt[tq] = un.reshape(8, 8)
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nvals])
                huff[(tc, th)] = {
                    (c, ln): sym for sym, (c, ln) in _canonical_codes(bits, vals).items()
                }
                i += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            prec = seg[0]
            if prec != 8:
                raise JpegUnsupported(f"{prec}-bit precision")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegUnsupported(f"SOF{marker - 0xC0} (non-baseline) not supported")
        elif marker == 0xDD:
            raise JpegUnsupported("restart interval (DRI) not supported")
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = seg[0]
            for c in range(ns):
                cid, tda = seg[1 + 2 * c], seg[2 + 2 * c]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["td"], comp["ta"] = tda >> 4, tda & 0xF
            pos += seglen
            break
        pos += seglen
    if not comps:
        raise ValueError("no SOF0 frame header before SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise JpegUnsupported("sampling factors > 2")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcus_x * c["h"]  # blocks per row
        c["bh"] = mcus_y * c["v"]
        c["plane"] = np.zeros((c["bh"] * 8, c["bw"] * 8))
        c["dc"] = 0

    r = _BitReader(blob, pos)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64)
                        s = r.huff(huff[(0, c["td"])])
                        diff = _extend(r.bits(s), s)
                        c["dc"] += diff
                        zz[0] = c["dc"]
                        k = 1
                        while k < 64:
                            rs = r.huff(huff[(1, c["ta"])])
                            run, size = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(r.bits(size), size)
                            k += 1
                        coef = np.empty(64)
                        coef[_ZIGZAG] = zz
                        block = _idct(coef.reshape(8, 8) * qt[c["tq"]]) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = block

    # upsample to full resolution, crop, color-convert
    planes = []
    for c in comps:
        p = c["plane"]
        if c["h"] < hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        planes.append(p[:h, :w])
    if len(comps) == 1:
        yy = np.clip(np.floor(planes[0] + 0.5), 0, 255)
        rgb = np.stack([yy, yy, yy], axis=2)
    elif len(comps) == 3:
        yy, cb, cr = planes
        rr = yy + 1.402 * (cr - 128.0)
        gg = yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bb = yy + 1.772 * (cb - 128.0)
        rgb = np.clip(np.floor(np.stack([rr, gg, bb], axis=2) + 0.5), 0, 255)
    else:
        raise JpegUnsupported(f"{len(comps)}-component frame")
    arr = rgb.astype(np.uint8)
    return w, h, [arr[y].tobytes() for y in range(h)]


# ---------------------------------------------------------------- encoder

_DC_BITS = [0, 0, 0, 12] + [0] * 12  # 12 four-bit DC size codes
_DC_VALS = list(range(12))
_AC_VALS = (
    [0x00, 0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_AC_BITS = [0] * 7 + [len(_AC_VALS)] + [0] * 8  # all eight bits (162 < 256)
_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _encode_plane_block(wr: _BitWriter, block: np.ndarray, pred: int) -> int:
    coef = np.rint(_fdct(block - 128.0)).astype(np.int64)
    zz = coef.reshape(64)[_ZIGZAG]
    dc = int(zz[0])
    size, bits = _magnitude(dc - pred)
    code, ln = _DC_CODES[size]
    wr.write(code, ln)
    if size:
        wr.write(bits, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = _AC_CODES[0xF0]
            wr.write(c, ln)
            run -= 16
        size, bits = _magnitude(v)
        c, ln = _AC_CODES[(run << 4) | size]
        wr.write(c, ln)
        wr.write(bits, size)
        run = 0
    if run:
        c, ln = _AC_CODES[0x00]
        wr.write(c, ln)
    return dc


def encode_jpeg(width: int, height: int, rows: list[bytes], subsample: bool = False) -> bytes:
    """Encode RGB rows as baseline JFIF with identity quantization:
    4:2:0 when ``subsample`` else 4:4:4. Fixture-grade (identity tables
    favor exactness over compression)."""
    rgb = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(height, width, 3).astype(np.float64)
    rr, gg, bb = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    yy = np.floor(0.299 * rr + 0.587 * gg + 0.114 * bb + 0.5)
    cb = np.floor(128.0 - 0.168736 * rr - 0.331264 * gg + 0.5 * bb + 0.5)
    cr = np.floor(128.0 + 0.5 * rr - 0.418688 * gg - 0.081312 * bb + 0.5)

    if subsample:
        samp = [(2, 2), (1, 1), (1, 1)]
        # chroma at half resolution: mean of each 2x2 (pad to even first)
        def down(p):
            p = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge")
            return np.floor((p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0 + 0.5)

        planes = [yy, down(cb), down(cr)]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
        planes = [yy, cb, cr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        padded.append(np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # identity table 0
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([3])
    for cid, (sh, sv) in zip((1, 2, 3), samp):
        sof += bytes([cid, (sh << 4) | sv, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    sos = bytes([3])
    for cid in (1, 2, 3):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    wr = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        preds[ci] = _encode_plane_block(
                            wr, p[y0 : y0 + 8, x0 : x0 + 8], preds[ci]
                        )
    out += wr.flush()
    out += b"\xff\xd9"
    return bytes(out)
