"""Baseline + progressive JPEG codec — stdlib+numpy only, no media libs.

Implements the baseline sequential DCT process (ITU-T T.81): marker
parse (DQT/SOF0/DHT/SOS/DRI, APPn/COM skipped), canonical Huffman
decode with 0xFF00 byte-unstuffing and RSTn restart handling, dequant,
inverse zigzag, separable float IDCT, YCbCr→RGB; AND the progressive
DCT process (SOF2, T.81 Annex G): multi-scan spectral selection +
successive approximation — DC first/refinement scans, AC first scans
with EOB-run state, AC refinement scans with correction bits —
coefficients accumulate across scans, then one batched IDCT
reconstructs the image. Supported frames: 8-bit, 1 or 3 components,
4:4:4 and 4:2:0 sampling. Arithmetic coding and 12-bit precision return
None — the decoder degrades, never raises, matching the
WAV/BMP/PNG/MP4 contract (multimodal.py).

``make_jpeg`` is the matching baseline encoder (Annex K quant + Huffman
tables, 4:4:4) used by tests; ``make_progressive_jpeg`` emits a
multi-scan SOF2 stream (DC first + DC refinement + per-band AC first +
AC refinement scans) whose decode must equal the baseline decode of the
SAME coefficients bit for bit — the cross-check that guards both sides.
Roundtrip checks guard against shared-mistake symmetry with asymmetric
probes: a solid-color image must decode EXACTLY (DC-only path), and the
DCT is cross-checked against a naive O(n^4) transform in the tests.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

# Same decode budget as multimodal.MAX_DECODE_PIXELS (defined locally to
# keep this module dependency-free): reject declared dims above 64 MPel
# before allocating component planes.
MAX_DECODE_PIXELS = 1 << 26

# -- Annex K tables ---------------------------------------------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# zigzag order: ZIGZAG[i] = raster index of the i-th zigzag coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int32)

# standard Huffman tables (T.81 Annex K.3): (bits[1..16], huffval)
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# DCT-II orthonormal basis: C[k, n] = s(k) * cos((2n+1)kπ/16)
_C = np.zeros((8, 8))
for _k in range(8):
    s = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _C[_k, _n] = s * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def dct2(block: np.ndarray) -> np.ndarray:
    """2-D DCT-II of an 8x8 block (orthonormal)."""
    return _C @ block @ _C.T


def idct2(coef: np.ndarray) -> np.ndarray:
    """2-D inverse DCT of an 8x8 coefficient block."""
    return _C.T @ coef @ _C


# -- canonical Huffman ------------------------------------------------------

def _build_codes(bits, vals):
    """(bits, huffval) → {symbol: (code, length)} (canonical, T.81 C.2)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits, vals):
    """(bits, huffval) → {(length, code): symbol} for MSB-first decoding."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    """MSB-first entropy reader with 0xFF00 unstuffing; raises EOFError
    past the end (caller converts to a None decode)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        if self.pos >= len(self.data):
            raise EOFError
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise EOFError
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError  # EOI or another marker: out of data
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self):
        """Skip to just past the next RSTn marker, reset bit state."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise EOFError


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _decode_huff(reader: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise EOFError  # invalid code


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: t-bit magnitude → signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# -- decoder ----------------------------------------------------------------

def decode_jpeg(payload: bytes) -> Optional[dict]:
    """Decode a baseline JPEG into an (h, w, 3) uint8 RGB array plus the
    dims. Returns None for anything that is not a baseline JPEG this
    subset handles (progressive, 12-bit, exotic sampling, truncation)."""
    try:
        return _decode_jpeg_inner(payload)
    except (EOFError, struct.error, IndexError, ValueError,
            ZeroDivisionError):
        return None


def _decode_jpeg_inner(payload: bytes):
    if payload is None or len(payload) < 4 or payload[0:2] != b"\xFF\xD8":
        return None
    pos = 2
    qtables = {}
    huff_dc, huff_ac = {}, {}
    frame = None
    restart_interval = 0
    prog_state = None  # progressive coefficient accumulator across scans
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI/RSTn: no length
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break  # progressive: reconstruct below; baseline here: None
        if pos + 4 > len(payload):
            return None
        (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            return None  # truncated segment
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables: not baseline-8
                tab = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8)
                if tab.size < 64:
                    return None
                q = np.zeros(64, dtype=np.int32)
                q[ZIGZAG] = tab.astype(np.int32)  # de-zigzag
                qtables[tq] = q.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                if len(vals) < n:
                    return None
                table = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack(">BHHB", body[0:6])
            if prec != 8 or nc not in (1, 3) or w == 0 or h == 0:
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append(dict(cid=cid, hs=hv >> 4, vs=hv & 0x0F, tq=tq))
            frame = dict(w=w, h=h, comps=comps,
                         progressive=marker == 0xC2)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # extended/lossless/arithmetic frame types
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[0:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            if not frame["progressive"]:
                return _decode_scan(payload, pos + 2 + seglen, frame, scan,
                                    qtables, huff_dc, huff_ac,
                                    restart_interval)
            # progressive: T.81 G.2 — each scan deposits a spectral band /
            # precision slice of the coefficients; decode it and keep
            # walking markers (Ss, Se, Ah, Al follow the component specs)
            if len(body) < 4 + 2 * ns:
                return None
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if prog_state is None:
                prog_state = _alloc_prog_state(frame)
                if prog_state is None:
                    return None
            pos = _decode_prog_scan(
                payload, pos + 2 + seglen, frame, scan, ss, se, ah, al,
                prog_state, huff_dc, huff_ac, restart_interval)
            if pos is None:
                return None
            continue  # pos is already past this scan's entropy data
        pos += 2 + seglen
    if prog_state is not None:
        return _reconstruct_progressive(frame, prog_state, qtables)
    return None


def _decode_scan(payload, pos, frame, scan, qtables, huff_dc, huff_ac,
                 restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    if not all(c["hs"] in (1, 2) and c["vs"] in (1, 2) for c in comps):
        return None
    # Declared-dimension cap BEFORE allocating planes: a few-hundred-byte
    # payload declaring 65535x65535 would request ~100 GB of float64, and
    # under Linux overcommit the lazy calloc can "succeed" then OOM-kill
    # the executor mid-scan instead of raising here.
    if w * h > MAX_DECODE_PIXELS:
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_cid = {c["cid"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        c = by_cid.get(cs)
        if c is None or td not in huff_dc or ta not in huff_ac \
                or c["tq"] not in qtables:
            return None
        order.append((c, huff_dc[td], huff_ac[ta], qtables[c["tq"]]))
    planes = [
        np.zeros((mcuy * c["vs"] * 8, mcux * c["hs"] * 8)) for c in comps
    ]
    reader = _BitReader(payload, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                try:
                    reader.sync_restart()
                except _RestartMarker:
                    pass
                pred = [0] * len(comps)
            try:
                for ci, (c, dct_, act_, q) in enumerate(order):
                    for v in range(c["vs"]):
                        for hh in range(c["hs"]):
                            blk = _decode_block(reader, dct_, act_)
                            pred[ci] += blk[0]
                            blk[0] = pred[ci]
                            coef = np.zeros(64)
                            coef[ZIGZAG] = blk
                            coef = coef.reshape(8, 8) * q
                            px = idct2(coef) + 128.0
                            y0 = (my * c["vs"] + v) * 8
                            x0 = (mx * c["hs"] + hh) * 8
                            planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            except _RestartMarker:
                return None  # unexpected restart mid-MCU
            mcu_count += 1
    return _planes_to_rgb(planes, comps, w, h, hmax, vmax)


def _planes_to_rgb(planes, comps, w, h, hmax, vmax):
    """Upsample subsampled planes, YCbCr→RGB (or passthrough grayscale),
    crop to declared dims — the shared tail of both decode paths."""
    out = np.zeros((h, w, 3))
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["hs"] != hmax or c["vs"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["vs"], axis=0),
                          hmax // c["hs"], axis=1)
        out[:, :, ci if len(comps) == 3 else slice(None)] = p[:h, :w] \
            if len(comps) == 3 else p[:h, :w, None]
    if len(comps) == 3:
        y, cb, cr = out[:, :, 0], out[:, :, 1] - 128, out[:, :, 2] - 128
        rgb = np.stack([
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ], axis=2)
    else:
        rgb = out
    rgb = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return dict(width=w, height=h, rgb=rgb)


def _decode_block(reader, dc_table, ac_table):
    blk = np.zeros(64)
    t = _decode_huff(reader, dc_table)
    blk[0] = _extend(reader.bits(t), t) if t else 0
    k = 1
    while k < 64:
        rs = _decode_huff(reader, ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise EOFError
        blk[k] = _extend(reader.bits(s), s)
        k += 1
    return blk


# -- progressive decode (T.81 Annex G) --------------------------------------

def _alloc_prog_state(frame):
    """Validate the frame and allocate per-component int32 coefficient
    grids of shape (blocks_y, blocks_x, 64) in ZIGZAG order, sized to the
    interleaved MCU grid (covers non-interleaved traversal too)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if not all(c["hs"] in (1, 2) and c["vs"] in (1, 2) for c in comps):
        return None
    if w * h > MAX_DECODE_PIXELS:
        return None  # dimension-bomb cap, same as baseline
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = [np.zeros((mcuy * c["vs"], mcux * c["hs"], 64), dtype=np.int32)
             for c in comps]
    return dict(coefs=coefs, mcux=mcux, mcuy=mcuy, hmax=hmax, vmax=vmax)


def _nonint_dims(frame, state, c):
    """Non-interleaved block-grid dims for one component (T.81 A.2.2:
    ceil(comp samples / 8) per axis)."""
    cw = -(-frame["w"] * c["hs"] // state["hmax"])
    ch = -(-frame["h"] * c["vs"] // state["vmax"])
    return -(-ch // 8), -(-cw // 8)


def _decode_prog_scan(payload, pos, frame, scan, ss, se, ah, al, state,
                      huff_dc, huff_ac, restart_interval):
    """Decode one progressive scan into the coefficient grids. Returns
    the payload position just past this scan's entropy data, or None on
    malformed/truncated input (the whole decode then fails — no partial
    renders for adversarial bytes)."""
    comps = frame["comps"]
    by_cid = {c["cid"]: (i, c) for i, c in enumerate(comps)}
    sel = []
    for cs, td, ta in scan:
        hit = by_cid.get(cs)
        if hit is None:
            return None
        ci, c = hit
        if ss == 0:
            if ah == 0 and td not in huff_dc:
                return None
            sel.append((ci, c, huff_dc.get(td), None))
        else:
            if ta not in huff_ac:
                return None
            sel.append((ci, c, None, huff_ac[ta]))
    if ss > se or se > 63 or (ss == 0) != (se == 0):
        return None  # G.1.1.1.1: DC and AC bands never mix in one scan
    if ss > 0 and len(sel) != 1:
        return None  # AC scans are single-component (G.1.1.1.1)
    reader = _BitReader(payload, pos)
    try:
        if ss == 0:
            _prog_dc_scan(reader, sel, frame, state, ah, al,
                          restart_interval)
        else:
            _prog_ac_scan(reader, sel[0], frame, state, ss, se, ah, al,
                          restart_interval)
    except (_RestartMarker, EOFError, IndexError):
        return None
    # skip to the next marker (past pad bits / an already-read RST)
    p = reader.pos
    d = payload
    while p + 1 < len(d):
        if d[p] == 0xFF and d[p + 1] != 0x00 \
                and not 0xD0 <= d[p + 1] <= 0xD7:
            return p
        p += 1
    return p


def _prog_dc_scan(reader, sel, frame, state, ah, al, ri):
    """DC scan: first pass (Ah=0) codes DIFF values of DC>>Al exactly
    like baseline; refinement (Ah>0) is one raw bit per block appended
    at position Al. Interleaved when ns>1 (MCU order), else the
    component's own block raster."""
    pred = [0] * len(sel)
    units = 0
    if len(sel) > 1:
        walk = [(my, mx) for my in range(state["mcuy"])
                for mx in range(state["mcux"])]
        for my, mx in walk:
            if ri and units and units % ri == 0:
                reader.sync_restart()
                pred = [0] * len(sel)
            for si, (ci, c, dtab, _) in enumerate(sel):
                for v in range(c["vs"]):
                    for hh in range(c["hs"]):
                        blk = state["coefs"][ci][my * c["vs"] + v,
                                                 mx * c["hs"] + hh]
                        pred[si] = _prog_dc_block(
                            reader, blk, dtab, pred[si], ah, al)
            units += 1
    else:
        ci, c, dtab, _ = sel[0]
        bh, bw = _nonint_dims(frame, state, c)
        for by in range(bh):
            for bx in range(bw):
                if ri and units and units % ri == 0:
                    reader.sync_restart()
                    pred = [0]
                pred[0] = _prog_dc_block(
                    reader, state["coefs"][ci][by, bx], dtab, pred[0],
                    ah, al)
                units += 1


def _prog_dc_block(reader, blk, dtab, pred, ah, al):
    if ah == 0:
        t = _decode_huff(reader, dtab)
        pred += _extend(reader.bits(t), t) if t else 0
        blk[0] = pred << al
    elif reader.bit():
        blk[0] |= 1 << al  # two's-complement append works for negatives
    return pred


def _prog_ac_scan(reader, sel1, frame, state, ss, se, ah, al, ri):
    ci, c, _, atab = sel1
    bh, bw = _nonint_dims(frame, state, c)
    eobrun = 0
    units = 0
    for by in range(bh):
        for bx in range(bw):
            if ri and units and units % ri == 0:
                reader.sync_restart()
                eobrun = 0
            blk = state["coefs"][ci][by, bx]
            if ah == 0:
                eobrun = _first_ac_block(reader, blk, ss, se, al, eobrun,
                                         atab)
            else:
                eobrun = _refine_ac_block(reader, blk, ss, se, al, eobrun,
                                          atab)
            units += 1


def _first_ac_block(reader, blk, ss, se, al, eobrun, atab):
    """AC first scan (G.1.2.2): run-length + size codes place new
    coefficients at precision Al; EOBn codes start an end-of-band run
    covering this and the next (run-1) blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(reader, atab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:  # EOBn: run = (1<<r) + next r bits
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise EOFError
        blk[k] = _extend(reader.bits(s), s) << al
        k += 1
    return eobrun


def _refine_ac_block(reader, blk, ss, se, al, eobrun, atab):
    """AC refinement scan (G.1.2.3): for every already-nonzero
    coefficient visited, one correction bit (1 → add 2^Al away from
    zero); run/size codes with s=1 insert NEW ±2^Al coefficients after a
    run of zero-history positions; EOBn refines the rest of the band."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(reader, atab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:
                    eobrun = (1 << r)
                    if r:
                        eobrun += reader.bits(r)
                    break
                val = 0  # ZRL: 16 zero-history slots, no new coefficient
            elif s == 1:
                val = p1 if reader.bit() else -p1
            else:
                raise EOFError  # s>1 is malformed in a refinement scan
            while k <= se:
                if blk[k] != 0:
                    if reader.bit() and (abs(int(blk[k])) & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else -p1
                    k += 1
                    continue
                if r == 0:
                    if s == 1:
                        blk[k] = val
                    k += 1
                    break
                r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:  # correction bits for the remaining nonzeros
            if blk[k] != 0 and reader.bit() \
                    and (abs(int(blk[k])) & p1) == 0:
                blk[k] += p1 if blk[k] > 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(frame, state, qtables):
    """Dequant + batched IDCT over the accumulated coefficient grids,
    then the shared upsample/color tail."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    planes = []
    for ci, c in enumerate(comps):
        q = qtables.get(c["tq"])
        if q is None:
            return None
        zz = state["coefs"][ci]
        by, bx = zz.shape[:2]
        coef = np.zeros((by, bx, 64))
        coef[:, :, ZIGZAG] = zz  # de-zigzag each block
        coef = coef.reshape(by, bx, 8, 8) * q
        # batched idct2: out = C.T @ coef @ C per block
        px = np.einsum("ki,yxkl,lj->yxij", _C, coef, _C) + 128.0
        planes.append(px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
    return _planes_to_rgb(planes, comps, w, h,
                          state["hmax"], state["vmax"])


# -- encoder (tests + fixture generation) -----------------------------------

def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    out = (q * scale + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def make_jpeg(rgb: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline 4:4:4 JPEG with
    Annex K tables scaled by ``quality``."""
    h, w, _ = rgb.shape
    f = rgb.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] \
        + 0.5 * f[:, :, 2] + 128
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] \
        - 0.081312 * f[:, :, 2] + 128
    ql = _quality_scale(QUANT_LUMA, quality).reshape(8, 8)
    qc = _quality_scale(QUANT_CHROMA, quality).reshape(8, 8)

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    wr = _BitWriter()
    pred = [0, 0, 0]
    bw, bh = -(-w // 8), -(-h // 8)
    planes = [(y, ql, dc_l, ac_l), (cb, qc, dc_c, ac_c),
              (cr, qc, dc_c, ac_c)]
    for by in range(bh):
        for bx in range(bw):
            for ci, (plane, q, dct_, act_) in enumerate(planes):
                block = np.full((8, 8), 128.0)
                ys, xs = by * 8, bx * 8
                seg = plane[ys:min(ys + 8, h), xs:min(xs + 8, w)]
                block[:seg.shape[0], :seg.shape[1]] = seg
                # replicate edges (reduces ringing; any pad is valid)
                if seg.shape[0] < 8:
                    block[seg.shape[0]:, :] = block[seg.shape[0] - 1, :]
                if seg.shape[1] < 8:
                    block[:, seg.shape[1]:] = block[:, seg.shape[1] - 1][:, None]
                coef = dct2(block - 128.0)
                qz = np.rint(coef / q).astype(np.int64)
                zz = qz.reshape(64)[ZIGZAG]
                _encode_block(wr, zz, pred, ci, dct_, act_)
    wr.flush()

    def seg(marker, body):
        return b"\xFF" + bytes([marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tq, q):
        return seg(0xDB, bytes([tq]) + bytes(
            int(q.reshape(64)[ZIGZAG[i]]) for i in range(64)))

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1])
              + bytes([3, 0x11, 1]))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (b"\xFF\xD8" + dqt(0, ql) + dqt(1, qc)
            + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
            + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
            + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
            + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
            + sof + sos + bytes(wr.out) + b"\xFF\xD9")


def _encode_block(wr, zz, pred, ci, dc_codes, ac_codes):
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    t = int(diff).bit_length() if diff != 0 else 0
    code, length = dc_codes[t]
    wr.put(code, length)
    if t:
        wr.put(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k] != 0:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            wr.put(code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | s]
        wr.put(code, length)
        wr.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        wr.put(code, length)


# -- progressive encoder (tests + fixture generation) ------------------------

def _quantized_planes(rgb: np.ndarray, quality: int):
    """Shared front half of both encoders: color transform + DCT +
    quantize. Returns (ql, qc, zz) with zz a list of (bh, bw, 64) int32
    zigzag-order coefficient grids for Y, Cb, Cr (4:4:4)."""
    h, w, _ = rgb.shape
    f = rgb.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] \
        + 0.5 * f[:, :, 2] + 128
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] \
        - 0.081312 * f[:, :, 2] + 128
    ql = _quality_scale(QUANT_LUMA, quality).reshape(8, 8)
    qc = _quality_scale(QUANT_CHROMA, quality).reshape(8, 8)
    bw, bh = -(-w // 8), -(-h // 8)
    zz = []
    for plane, q in ((y, ql), (cb, qc), (cr, qc)):
        grid = np.zeros((bh, bw, 64), dtype=np.int32)
        for by in range(bh):
            for bx in range(bw):
                block = np.full((8, 8), 128.0)
                ys, xs = by * 8, bx * 8
                seg = plane[ys:min(ys + 8, h), xs:min(xs + 8, w)]
                block[:seg.shape[0], :seg.shape[1]] = seg
                if seg.shape[0] < 8:
                    block[seg.shape[0]:, :] = block[seg.shape[0] - 1, :]
                if seg.shape[1] < 8:
                    block[:, seg.shape[1]:] = \
                        block[:, seg.shape[1] - 1][:, None]
                coef = dct2(block - 128.0)
                grid[by, bx] = np.rint(coef / q).astype(
                    np.int64).reshape(64)[ZIGZAG]
        zz.append(grid)
    return ql, qc, zz


def _enc_ac_first(wr, band_vals, ac_codes):
    """One block's AC first scan at precision Al: band_vals are the
    point-transformed (v/2^Al toward zero) band coefficients. Plain EOB
    (run of 1) ends the block — always legal, never accumulates runs."""
    last_nz = -1
    for i, v in enumerate(band_vals):
        if v:
            last_nz = i
    run = 0
    for i in range(last_nz + 1):
        v = int(band_vals[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            wr.put(*ac_codes[0xF0])
            run -= 16
        s = abs(v).bit_length()
        wr.put(*ac_codes[(run << 4) | s])
        wr.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < len(band_vals) - 1:
        wr.put(*ac_codes[0x00])  # EOB (eobrun = 1)


def make_progressive_jpeg(rgb: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a PROGRESSIVE (SOF2)
    4:4:4 JPEG: interleaved DC first scan at Al=1 + DC refinement, then
    per-component AC spectral-selection scans (bands 1-5 / 6-63 for Y,
    1-63 for chroma) at Al=2 with two successive-approximation
    refinement passes (2→1, 1→0). Decoding this stream must reproduce
    the baseline ``make_jpeg`` decode of the same image (same quantized
    coefficients)."""
    h, w, _ = rgb.shape
    ql, qc, zz = _quantized_planes(rgb, quality)
    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    bh, bw = zz[0].shape[:2]

    def seg(marker, body):
        return b"\xFF" + bytes([marker]) \
            + struct.pack(">H", len(body) + 2) + body

    def sos(comps_spec, ss, se, ah, al):
        body = bytes([len(comps_spec)])
        for cs, td, ta in comps_spec:
            body += bytes([cs, (td << 4) | ta])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    out = bytearray(b"\xFF\xD8")
    out += seg(0xDB, bytes([0]) + bytes(
        int(ql.reshape(64)[ZIGZAG[i]]) for i in range(64)))
    out += seg(0xDB, bytes([1]) + bytes(
        int(qc.reshape(64)[ZIGZAG[i]]) for i in range(64)))
    for tc, th, bits, vals in ((0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
                               (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
                               (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
                               (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                   + bytes(vals))
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, 0x11, 0]) + bytes([2, 0x11, 1])
               + bytes([3, 0x11, 1]))

    # scan 1: interleaved DC first, Al=1 (arithmetic-shift point xform)
    wr = _BitWriter()
    pred = [0, 0, 0]
    dc_tabs = (dc_l, dc_c, dc_c)
    for by in range(bh):
        for bx in range(bw):
            for ci in range(3):
                v = int(zz[ci][by, bx, 0]) >> 1
                diff = v - pred[ci]
                pred[ci] = v
                t = abs(diff).bit_length()
                wr.put(*dc_tabs[ci][t])
                if t:
                    wr.put(diff if diff > 0 else diff + (1 << t) - 1, t)
    wr.flush()
    out += sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 0, 1) \
        + bytes(wr.out)

    # scan 2: interleaved DC refinement, one raw bit per block (Al=0)
    wr = _BitWriter()
    for by in range(bh):
        for bx in range(bw):
            for ci in range(3):
                wr.put(int(zz[ci][by, bx, 0]) & 1, 1)
    wr.flush()
    out += sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 1, 0) \
        + bytes(wr.out)

    ac_tabs = (ac_l, ac_c, ac_c)
    bands = [(0, 1, 5), (0, 6, 63), (1, 1, 63), (2, 1, 63)]

    # AC first scans at Al=2
    for ci, ss, se in bands:
        wr = _BitWriter()
        for by in range(bh):
            for bx in range(bw):
                vals = []
                for k in range(ss, se + 1):
                    v = int(zz[ci][by, bx, k])
                    vals.append((abs(v) >> 2) * (1 if v > 0 else -1))
                _enc_ac_first(wr, vals, ac_tabs[ci])
        wr.flush()
        out += sos([(ci + 1, 0, ci and 1)], ss, se, 0, 2) + bytes(wr.out)

    # AC refinement scans: Ah=2→Al=1, then Ah=1→Al=0
    for ah, al in ((2, 1), (1, 0)):
        for ci, ss, se in bands:
            wr = _BitWriter()
            for by in range(bh):
                for bx in range(bw):
                    triples = []
                    for k in range(ss, se + 1):
                        v = int(zz[ci][by, bx, k])
                        triples.append((v, (abs(v) >> ah) != 0,
                                        (abs(v) >> al) & 1))
                    _enc_ac_refine_impl(wr, triples, ac_tabs[ci])
            wr.flush()
            out += sos([(ci + 1, 0, ci and 1)], ss, se, ah, al) \
                + bytes(wr.out)

    out += b"\xFF\xD9"
    return bytes(out)


def _enc_ac_refine_impl(wr, triples, ac_codes):
    """One block's AC refinement: emit run/1 codes for NEW coefficients
    (zero history, refinement bit set), correction bits for history
    coefficients in position order, ZRL for 16 zero-history skips, EOB
    plus trailing correction bits."""
    last_new = -1
    for i, (_, hist, nb) in enumerate(triples):
        if not hist and nb:
            last_new = i
    run, corr = 0, []
    for i in range(last_new + 1):
        v, hist, nb = triples[i]
        if hist:
            corr.append(nb)
            continue
        if not nb:
            run += 1
            continue
        while run > 15:
            wr.put(*ac_codes[0xF0])
            for b in corr:
                wr.put(b, 1)
            corr = []
            run -= 16
        wr.put(*ac_codes[(run << 4) | 1])
        wr.put(1 if v > 0 else 0, 1)
        for b in corr:
            wr.put(b, 1)
        corr = []
        run = 0
    if last_new < len(triples) - 1:
        wr.put(*ac_codes[0x00])  # EOB (eobrun = 1)
        for i in range(last_new + 1, len(triples)):
            _, hist, nb = triples[i]
            if hist:
                wr.put(nb, 1)
