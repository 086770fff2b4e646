"""Pure-numpy baseline JPEG (JFIF) codec — no external codec libraries.

Removes the last ``on_unknown="fake"`` fallback for common corpora
(VERDICT r3 #8): ``decode_jpeg`` handles baseline sequential DCT
(SOF0) with standard Huffman coding, any 1/2 h/v sampling factors
(4:4:4, 4:2:2, 4:2:0), restart markers and grayscale; ``encode_jpeg``
emits deterministic 4:4:4 or 4:2:0 baseline streams for fixtures and
tests.  Tables are the JPEG spec's public Annex K defaults (ITU-T.81:
K.1/K.2 quantization, K.3-K.6 Huffman).  Progressive (SOF2) and
arithmetic coding raise ``NotImplementedError`` explicitly.

Everything heavy is vectorized: the 8x8 (I)DCT is two matrix products
over all blocks at once, dequantization/zigzag are fancy-indexed numpy,
and only the Huffman bit walk is per-symbol Python (inherently serial
per scan; MCU counts in feature pipelines are small because images are
decoded inside an actor-pool ``map_batches`` stage, one image per row).
"""

from __future__ import annotations

import numpy as np

# ---- Annex K tables ------------------------------------------------------

QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
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
    0xF9, 0xFA]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
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
    0xF9, 0xFA]

# orthonormal 8-point DCT-II basis: fwd = A @ B @ A.T, inv = A.T @ C @ A
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _canonical_codes(bits: list[int], vals: list[int]):
    """(bits, values) -> {value: (code, length)} canonical Huffman."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]):
    """(bits, values) -> {(length, code): value} for the bit walk."""
    enc = _canonical_codes(bits, vals)
    return {(length, code): v for v, (code, length) in enc.items()}


# ---- bit IO --------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


class _BitReader:
    """Reads entropy-coded bytes: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RST: consumed by caller
                raise _RestartMarker()
            else:
                raise _ScanEnd()
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
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

    def align_and_skip_rst(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        while self.buf[self.pos] != 0xFF:
            self.pos += 1
        self.pos += 2  # FF Dn


class _RestartMarker(Exception):
    pass


class _ScanEnd(Exception):
    pass


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid huffman code")


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: magnitude bits -> signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---- encoder -------------------------------------------------------------


def _fdct_quant(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """All 8x8 blocks of a (H, W) plane -> quantized zigzag coefficients
    of shape (n_blocks, 64), block raster order."""
    h, w = plane.shape
    bh, bw = h // 8, w // 8
    blocks = (plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8).astype(np.float64) - 128.0)
    coef = np.einsum("ux,nxy,vy->nuv", _A, blocks, _A)
    q = np.round(coef / quant.reshape(8, 8)).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _encode_block(writer: _BitWriter, zz: np.ndarray, pred: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    code, length = dc_tab[size]
    writer.write(code, length)
    if size:
        writer.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_tab[0xF0]  # ZRL
            writer.write(c, ln)
            run -= 16
        size = _category(v)
        c, ln = ac_tab[(run << 4) | size]
        writer.write(c, ln)
        writer.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        c, ln = ac_tab[0x00]  # EOB
        writer.write(c, ln)
    return dc


def _pad_plane(p: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate to a multiple of (mh, mw)."""
    h, w = p.shape
    H = -(-h // mh) * mh
    W = -(-w // mw) * mw
    return np.pad(p, ((0, H - h), (0, W - w)), mode="edge")


def encode_jpeg(img: np.ndarray, subsample: str = "444") -> bytes:
    """Baseline JFIF encoder: (H, W[, 3]) uint8 -> bytes.

    ``subsample``: '444' (one 8x8 luma + chroma block per MCU) or '420'
    (2x2 luma blocks per MCU, chroma averaged 2x2).  Deterministic —
    fixture-safe."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w = img.shape[:2]
    rgb = img.astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    if subsample == "420":
        hs = vs = 2
    elif subsample == "444":
        hs = vs = 1
    else:
        raise ValueError(subsample)

    yp = _pad_plane(np.clip(y, 0, 255), 8 * vs, 8 * hs)
    if hs == 2:
        cbp = _pad_plane(np.clip(cb, 0, 255), 8 * vs, 8 * hs)
        crp = _pad_plane(np.clip(cr, 0, 255), 8 * vs, 8 * hs)
        cbp = cbp.reshape(cbp.shape[0] // 2, 2,
                          cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        crp = crp.reshape(crp.shape[0] // 2, 2,
                          crp.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        cbp = _pad_plane(np.clip(cb, 0, 255), 8, 8)
        crp = _pad_plane(np.clip(cr, 0, 255), 8, 8)

    yz = _fdct_quant(yp, QUANT_LUM)
    cbz = _fdct_quant(cbp, QUANT_CHROM)
    crz = _fdct_quant(crp, QUANT_CHROM)

    dc_l = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)

    writer = _BitWriter()
    mcu_w = yp.shape[1] // (8 * hs)
    mcu_h = yp.shape[0] // (8 * vs)
    yb_w = yp.shape[1] // 8
    pred = [0, 0, 0]
    for my in range(mcu_h):
        for mx in range(mcu_w):
            for by in range(vs):
                for bx in range(hs):
                    i = (my * vs + by) * yb_w + (mx * hs + bx)
                    pred[0] = _encode_block(writer, yz[i], pred[0],
                                            dc_l, ac_l)
            ci = my * (cbp.shape[1] // 8) + mx
            pred[1] = _encode_block(writer, cbz[ci], pred[1], dc_c, ac_c)
            pred[2] = _encode_block(writer, crz[ci], pred[2], dc_c, ac_c)
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") \
            + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(QUANT_LUM[ZIGZAG].tolist()))
    out += seg(0xDB, bytes([1]) + bytes(QUANT_CHROM[ZIGZAG].tolist()))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([3,
                 1, (hs << 4) | vs, 0,
                 2, 0x11, 1,
                 3, 0x11, 1])
    out += seg(0xC0, sof)
    for cls_id, bits, vals in ((0x00, DC_LUM_BITS, DC_LUM_VALS),
                               (0x10, AC_LUM_BITS, AC_LUM_VALS),
                               (0x01, DC_CHROM_BITS, DC_CHROM_VALS),
                               (0x11, AC_CHROM_BITS, AC_CHROM_VALS)):
        out += seg(0xC4, bytes([cls_id]) + bytes(bits) + bytes(vals))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- decoder -------------------------------------------------------------


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JFIF decoder: bytes -> (H, W, 3) uint8 (or (H, W, 1)
    for grayscale streams).  Supports SOF0, 8-bit, standard or in-stream
    Huffman tables, h/v sampling factors in {1, 2}, DRI/RSTn."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        ln = int.from_bytes(buf[pos:pos + 2], "big")
        body = buf[pos + 2: pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(body[o + 1: o + 65],
                                    dtype=np.uint8).astype(np.int32)
                dq = np.empty(64, np.int32)
                dq[ZIGZAG] = tbl  # stored in zigzag order
                quant[tq] = dq
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1: o + 17])
                nv = sum(bits)
                vals = list(body[o + 17: o + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = _decode_table(bits, vals)
                o += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = body[0]
            if prec != 8:
                raise NotImplementedError("precision != 8")
            H = int.from_bytes(body[1:3], "big")
            W = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for c in range(nc):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                tq = body[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"H": H, "W": W, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0})")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cid = body[1 + 2 * c]
                tabs = body[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cid)
                scan.append((comp, tabs >> 4, tabs & 0x0F))
            return _decode_scan(buf, pos + ln, frame, scan, quant,
                                huff_dc, huff_ac, restart_interval)
        pos += ln
    raise ValueError("no SOS marker found")


def _decode_scan(buf, pos, frame, scan, quant, huff_dc, huff_ac,
                 restart_interval):
    H, W = frame["H"], frame["W"]
    comps = [c for c, _, _ in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    # per-component coefficient planes (in 8x8 block units)
    planes = []
    for c in comps:
        bw = mcus_x * c["h"]
        bh = mcus_y * c["v"]
        planes.append(np.zeros((bh * bw, 64), dtype=np.int32))
    reader = _BitReader(buf, pos)
    preds = [0] * len(comps)
    n_mcu = mcus_x * mcus_y
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            reader.align_and_skip_rst()
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        try:
            for ci, (c, tdc, tac) in enumerate(scan):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = _decode_block(reader, huff_dc[tdc],
                                           huff_ac[tac])
                        preds[ci] += int(zz[0])
                        zz[0] = preds[ci]
                        bw = mcus_x * c["h"]
                        bi = (my * c["v"] + by) * bw + (mx * c["h"] + bx)
                        planes[ci][bi] = zz
        except _RestartMarker:
            # tolerated stray restart (encoder/decoder interval mismatch)
            reader.align_and_skip_rst()
            preds = [0] * len(comps)
    # dequantize + IDCT per component, vectorized over all blocks
    out_planes = []
    for ci, c in enumerate(comps):
        dq = quant[c["tq"]]
        coeff = np.zeros_like(planes[ci])
        coeff[:, ZIGZAG] = planes[ci]  # zigzag -> natural order
        coeff = coeff * dq
        blocks = coeff.reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("xu,nuv,yv->nxy", _A.T, blocks, _A.T) + 128.0
        bw = mcus_x * c["h"]
        bh = mcus_y * c["v"]
        plane = (pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8))
        # upsample to full grid then crop
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out_planes.append(plane[:H, :W])
    if len(out_planes) == 1:
        y = np.clip(out_planes[0], 0, 255)
        return y.astype(np.uint8)[:, :, None]
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(reader: _BitReader, dc_tab: dict, ac_tab: dict
                  ) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int32)
    size = _huff_decode(reader, dc_tab)
    zz[0] = _extend(reader.read_bits(size), size) if size else 0
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.read_bits(size), size)
        k += 1
    return zz
