"""Pure-spec baseline JPEG codec (ITU-T T.81 sequential DCT + JFIF).

Same discipline as the PNG/GIF codecs in ``functions/multimodal.py``:
stdlib + numpy only, no codec libraries.  Covers the dominant lossy web
image format natively:

- **decode_jpeg**: baseline (SOF0) and extended-sequential (SOF1) Huffman
  JPEG, 8-bit, grayscale or 3-component YCbCr, sampling factors 1-2 in
  each axis (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0), restart markers (DRI/RSTn).
  Progressive (SOF2), arithmetic coding, 12-bit and hierarchical modes
  raise ``ValueError`` so the decoder-registry fallback (PIL when present)
  takes over — the same outside-the-pure-spec-subset contract as PNG.
- **encode_jpeg**: baseline encoder with the T.81 Annex K quantization and
  Huffman tables (spec constant *data*, like the BLOSUM matrices), IJG
  quality scaling, optional 4:2:0 chroma subsampling and restart
  intervals.

All 8x8 block math (FDCT/IDCT, dequantize, de-zigzag) is batched numpy —
one einsum over every block of a component at once; only the entropy
coder walks bits in Python (inherently serial per T.81's variable-length
stream, and payload-local: each actor task decodes only its own rows).

Reference semantics: the reference engine has no media path at all — this
module is part of the engine-addition multimodal family required by the
build brief (see ``functions/multimodal.py`` module docstring).
"""

from __future__ import annotations

import numpy as np

JPEG_TYPE = "image/jpeg"

# ---------------------------------------------------------- spec constants
# ITU-T T.81 Annex K (example tables, universally used by JFIF encoders)
# and the Figure A.6 zig-zag order.  Constant data from the public spec.

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K Huffman specs: (bits[1..16] code-count list, symbol list)
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# Separable DCT-II basis: _DCT_A[u, x] = c(u)/2 * cos((2x+1) u pi / 16).
# IDCT of an 8x8 coefficient block F is A.T @ F @ A; FDCT is A @ P @ A.T.
_DCT_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _DCT_A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)
del _u, _c, _x


# ---------------------------------------------------------- Huffman tables


def _build_canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical Huffman decoder (mincode/maxcode/valptr per length)."""

    __slots__ = ("mincode", "maxcode", "valptr", "values")

    def __init__(self, bits: list[int], values: list[int]):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.values = values
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos < len(self.data):
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.acc <<= 8  # T.81 F.2.2.5: pad truncated streams with 0
            self.nbits += 8
        self.nbits -= n
        out = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return out

    def decode_symbol(self, table: _HuffDecoder) -> int:
        code = self.read(1)
        for length in range(1, 17):
            if table.maxcode[length] >= code:
                return table.values[table.valptr[length] + code - table.mincode[length]]
            code = (code << 1) | self.read(1)
        raise ValueError("invalid JPEG Huffman code")


def _extend(value: int, size: int) -> int:
    """T.81 F.12: magnitude-category bits -> signed coefficient."""
    if size and value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


# ------------------------------------------------------------------ decode


def _split_entropy_segments(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff FF00 and split the scan at RSTn markers; returns (segments,
    position of the terminating marker)."""
    segments: list[bytes] = []
    cur = bytearray()
    pos = start
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = payload[pos + 1] if pos + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed FF
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            segments.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # real marker ends the scan
            break
    segments.append(bytes(cur))
    return segments, pos


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline/extended-sequential JPEG bytes -> HxWx3 uint8 (gray
    replicated to 3 channels).  Raises ValueError outside the supported
    subset so MediaFeatureActor falls through to a registered decoder."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    n = len(payload)
    quant: dict[int, np.ndarray] = {}  # id -> 64 zigzag-order values
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (h, w, [(comp_id, hsamp, vsamp, quant_id)])

    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        ln = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + ln]
        seg_end = pos + 2 + ln
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq:
                    raise ValueError("16-bit JPEG quant tables not supported")
                quant[tq] = np.frombuffer(body[p : p + 64], np.uint8).astype(np.int64)
                p += 64
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended seq.
            precision = body[0]
            if precision != 8:
                raise ValueError(f"only 8-bit JPEG supported, got {precision}")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {ncomp}")
            comps = []
            for c in range(ncomp):
                cid = body[6 + 3 * c]
                samp = body[7 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0x0F, body[8 + 3 * c]))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline/extended-sequential Huffman JPEG supported "
                f"(SOF marker 0x{marker:02X})"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                nvals = sum(bits)
                values = list(body[p + 17 : p + 17 + nvals])
                (huff_ac if tc else huff_dc)[th] = _HuffDecoder(bits, values)
                p += 17 + nvals
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            return _decode_scan(
                payload, seg_end, body, frame, quant, huff_dc, huff_ac, restart_interval
            )
        elif marker == 0xD9:  # EOI before any scan
            break
        # APPn / COM / others: skip
        pos = seg_end
    raise ValueError("JPEG contains no scan")


def _decode_scan(payload, data_start, sos_body, frame, quant, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame
    ncomp = sos_body[0]
    scan_tables = {}
    for c in range(ncomp):
        cid = sos_body[1 + 2 * c]
        tsel = sos_body[2 + 2 * c]
        scan_tables[cid] = (tsel >> 4, tsel & 0x0F)
    if ncomp != len(comps):
        raise ValueError("progressive/multi-scan JPEG not supported")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2 or any(c[1] < 1 or c[2] < 1 for c in comps):
        raise ValueError("JPEG sampling factors beyond 2 not supported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component coefficient store, MCU-padded
    coefs = []
    for _cid, hs, vs, _tq in comps:
        coefs.append(np.zeros((mcuy * vs, mcux * hs, 64), np.int64))

    segments, _ = _split_entropy_segments(payload, data_start)
    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = [0] * len(comps)
    mcu_in_interval = 0

    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_interval == restart_interval:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("JPEG truncated at restart marker")
                reader = _BitReader(segments[seg_idx])
                preds = [0] * len(comps)
                mcu_in_interval = 0
            for ci, (cid, hs, vs, _tq) in enumerate(comps):
                dc_tab = huff_dc.get(scan_tables[cid][0])
                ac_tab = huff_ac.get(scan_tables[cid][1])
                if dc_tab is None or ac_tab is None:
                    raise ValueError("JPEG scan references undefined Huffman table")
                for by in range(vs):
                    for bx in range(hs):
                        block = coefs[ci][my * vs + by, mx * hs + bx]
                        s = reader.decode_symbol(dc_tab)
                        preds[ci] += _extend(reader.read(s), s) if s else 0
                        block[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflows block")
                            block[k] = _extend(reader.read(s), s)
                            k += 1
            mcu_in_interval += 1

    # batched dequantize + de-zigzag + IDCT per component
    planes = []
    for ci, (_cid, hs, vs, tq) in enumerate(comps):
        if tq not in quant:
            raise ValueError("JPEG scan references undefined quant table")
        blocks = coefs[ci].reshape(-1, 64) * quant[tq][None, :]
        raster = np.zeros_like(blocks)
        raster[:, ZIGZAG] = blocks
        f = raster.reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("ux,nuv,vy->nxy", _DCT_A, f, _DCT_A, optimize=True) + 128.0
        by, bx = coefs[ci].shape[:2]
        plane = (
            pix.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # upsample to full-frame resolution, then crop
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ encode


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per T.81 F.1.2.3


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled Annex K table (zigzag order)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255)[ZIGZAG]  # q_zigzag[i] = q_raster[ZIGZAG[i]]


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(
    writer: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = _size_cat(diff)
    code, ln = dc_codes[s]
    writer.write(code, ln)
    if s:
        writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, ln = ac_codes[0x00]  # EOB
                writer.write(code, ln)
                break
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s = _size_cat(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    return dc


def _component_blocks(plane: np.ndarray, q_zz: np.ndarray) -> np.ndarray:
    """Plane (multiple-of-8 dims) -> (n_blocks_y, n_blocks_x, 64) quantized
    zigzag coefficients, batched FDCT."""
    hh, ww = plane.shape
    p = plane.astype(np.float64) - 128.0
    blocks = p.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
    f = np.einsum("ux,nmxy,vy->nmuv", _DCT_A, blocks, _DCT_A, optimize=True)
    zz = f.reshape(hh // 8, ww // 8, 64)[:, :, ZIGZAG]
    return np.round(zz / q_zz[None, None, :].astype(np.float64)).astype(np.int64)


def _pad_to(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    hh, ww = plane.shape
    py = (-hh) % mult_y
    px = (-ww) % mult_x
    if py or px:
        plane = np.pad(plane, ((0, py), (0, px)), mode="edge")
    return plane


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 uint8 -> baseline JFIF bytes (Annex K tables, IJG quality
    scaling; ``subsample=True`` emits 4:2:0 chroma; ``restart_interval``
    emits DRI + RSTn markers every that many MCUs)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_jpeg expects an HxWx3 uint8 array")
    h, w = img.shape[:2]
    rgb = img.astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    q_luma = _scaled_quant(_QUANT_LUMA, quality)
    q_chroma = _scaled_quant(_QUANT_CHROMA, quality)

    if subsample:
        ph = _pad_to(y, 16, 16)
        y_blocks = _component_blocks(ph, q_luma)
        chroma = []
        for plane in (cb, cr):
            p = _pad_to(plane, 16, 16)
            ds = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
            chroma.append(_component_blocks(ds, q_chroma))
        cb_blocks, cr_blocks = chroma
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        y_blocks = _component_blocks(_pad_to(y, 8, 8), q_luma)
        cb_blocks = _component_blocks(_pad_to(cb, 8, 8), q_chroma)
        cr_blocks = _component_blocks(_pad_to(cr, 8, 8), q_chroma)
        samp = [(1, 1), (1, 1), (1, 1)]

    dc_l = _build_canonical_codes(*_DC_LUMA_SPEC)
    ac_l = _build_canonical_codes(*_AC_LUMA_SPEC)
    dc_c = _build_canonical_codes(*_DC_CHROMA_SPEC)
    ac_c = _build_canonical_codes(*_AC_CHROMA_SPEC)

    comp_blocks = [y_blocks, cb_blocks, cr_blocks]
    comp_codes = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 JFIF
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + (len(app0) + 2).to_bytes(2, "big") + app0
    # DQT x2
    for tq, q in ((0, q_luma), (1, q_chroma)):
        out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tq]) + q.astype(np.uint8).tobytes()
    # SOF0
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    for cid, (hs, vs), tq in zip((1, 2, 3), samp, (0, 1, 1)):
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    # DHT x4
    for tc, th, (bits, values) in (
        (0, 0, _DC_LUMA_SPEC),
        (1, 0, _AC_LUMA_SPEC),
        (0, 1, _DC_CHROMA_SPEC),
        (1, 1, _AC_CHROMA_SPEC),
    ):
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body
    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big") + restart_interval.to_bytes(2, "big")
    # SOS
    sos = bytearray([3])
    for cid, tsel in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += bytes([cid, tsel])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos

    writer = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    mcu_in_interval = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_interval == restart_interval:
                writer.flush()
                out += writer.out
                out += bytes([0xFF, 0xD0 | (rst & 7)])
                rst += 1
                writer = _BitWriter()
                preds = [0, 0, 0]
                mcu_in_interval = 0
            for ci in range(3):
                hs, vs = samp[ci]
                dc_codes, ac_codes = comp_codes[ci]
                for by in range(vs):
                    for bx in range(hs):
                        zz = comp_blocks[ci][my * vs + by, mx * hs + bx]
                        preds[ci] = _encode_block(writer, zz, preds[ci], dc_codes, ac_codes)
            mcu_in_interval += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
