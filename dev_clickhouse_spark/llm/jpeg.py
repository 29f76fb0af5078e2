"""Baseline JPEG codec in pure numpy + stdlib — no PIL/libjpeg.

Decoder: baseline sequential DCT (SOF0) per ITU T.81 — marker walk, DQT/DHT
parsing with canonical Huffman reconstruction, interleaved MCU scan with
per-component sampling factors (4:4:4, 4:2:2, 4:2:0, grayscale), restart
markers (DRI/RSTn), byte-unstuffing, dequantization, float IDCT, and JFIF
YCbCr→RGB.  Progressive (SOF2) and the other non-baseline frame types raise
``ValueError`` — they are different compression modes, not codec gaps.

Encoder: the test/oracle counterpart — grayscale or YCbCr 4:4:4/4:2:0,
single flat quantization table, and self-describing generated Huffman
tables (all 12 DC categories at 4 bits, all 162 run/size AC symbols at
8 bits) written to DHT, so any spec-conforming decoder reads the output.
With ``quant=1`` a flat 8x8 block round-trips EXACTLY (its DCT is a single
integer DC coefficient), which is what lets a lossy codec sit behind a
value-hash driver oracle (see multimodal_jpeg_roundtrip_stats).

Used by :func:`dev_clickhouse_spark.llm.multimodal.real_decode` for
``image`` payloads with the 0xFFD8 magic.
"""

from __future__ import annotations

import math
import struct

import numpy as np

#: zigzag scan order: position k in the scan → natural index row*8+col
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

#: orthonormal 8-point DCT-II matrix; forward F = M @ B @ M.T, inverse M.T @ F @ M
_DCT = np.array([
    [0.5 * (1 / math.sqrt(2) if k == 0 else 1.0)
     * math.cos((2 * n + 1) * k * math.pi / 16) for n in range(8)]
    for k in range(8)
])


# ---------------------------------------------------------------------------
# Huffman plumbing (canonical code construction per T.81 Annex C)
# ---------------------------------------------------------------------------

def _huff_decode_table(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """(code length, code) → symbol, built canonically from the DHT BITS/
    HUFFVAL lists."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    """symbol → (code, length): the encoder-side view of the same canon."""
    return {sym: (code, ln) for (ln, code), sym in
            _huff_decode_table(bits, vals).items()}


#: encoder table geometry: 12 DC categories at 4 bits; EOB + ZRL + every
#: (run 0-15, size 1-10) AC symbol at 8 bits (162 of 256 → no all-ones code)
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = bytes(range(12))
_ENC_AC_BITS = [0] * 7 + [162] + [0] * 8
_ENC_AC_VALS = bytes(
    [0x00, 0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (already
    unstuffed and split at restart markers)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy segment exhausted")
            self.buf = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t raw bits to the signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - ((1 << t) - 1)


def _entropy_segments(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Unstuff 0xFF00 and split the scan at RSTn markers; stops at any other
    marker (EOI / next SOS)."""
    segs, cur = [], bytearray()
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b == 0xFF and pos + 1 < n:
            m = payload[pos + 1]
            if m == 0x00:
                cur.append(0xFF)
                pos += 2
                continue
            if 0xD0 <= m <= 0xD7:  # restart marker
                segs.append(bytes(cur))
                cur = bytearray()
                pos += 2
                continue
            break
        cur.append(b)
        pos += 1
    segs.append(bytes(cur))
    return segs, pos


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W, 3) uint8 RGB.  See module docstring for the
    supported envelope; progressive and 12-bit frames raise ValueError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, tq)
    height = width = 0
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker stream out of sync")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # parameterless
            continue
        ln = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quantization tables not supported")
                qt[tq] = np.frombuffer(seg, np.uint8, 64, i + 1).astype(np.int32)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = bytes(seg[i + 17 : i + 17 + nv])
                (ac_tabs if tc else dc_tabs)[th] = _huff_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision JPEG is supported")
            if nc not in (1, 3):
                # 2-component frames and 4-component Adobe CMYK exist in the
                # wild as VALID baseline JPEG; they're outside this codec's
                # envelope and must take the documented stub fallback
                # (real_decode maps "not supported" → NotImplementedError).
                raise ValueError(
                    f"{nc}-component JPEG frame is not supported"
                )
            comps = [
                (seg[6 + 3 * c], seg[7 + 3 * c] >> 4, seg[7 + 3 * c] & 15,
                 seg[8 + 3 * c])
                for c in range(nc)
            ]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG frame (SOF marker 0xFF{marker:02X}) "
                "is not supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS → entropy data follows
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if ns != len(comps):
                # a baseline scan covering a component subset = multi-scan
                # (non-interleaved) encoding — valid JPEG, outside the
                # envelope; must stub-fallback, not KeyError mid-decode
                raise ValueError(
                    "multi-scan (non-interleaved) baseline JPEG "
                    "is not supported"
                )
            scan_tabs = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tabs[cid] = (dc_tabs[tt >> 4], ac_tabs[tt & 15])
            if set(scan_tabs) != {cid for cid, *_ in comps}:
                raise ValueError(
                    "JPEG scan component ids do not match frame "
                    "components — not supported"
                )
            segs, pos = _entropy_segments(payload, pos + ln)
            return _decode_scan(
                comps, scan_tabs, qt, segs, width, height, restart_interval
            )
        pos += ln
    raise ValueError("JPEG contains no scan")


def _decode_scan(comps, scan_tabs, qt, segs, width, height, ri) -> np.ndarray:
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = {
        cid: np.zeros((mcuy * v * 8, mcux * h * 8), dtype=np.float64)
        for cid, h, v, _ in comps
    }
    preds = {cid: 0 for cid, *_ in comps}
    seg_idx = 0
    br = _BitReader(segs[0])
    coef = np.zeros(64, dtype=np.float64)
    for m in range(mcux * mcuy):
        if ri and m and m % ri == 0:
            seg_idx += 1
            br = _BitReader(segs[seg_idx])
            preds = {cid: 0 for cid in preds}
        my, mx = divmod(m, mcux)
        for cid, h, v, tq in comps:
            dc_tab, ac_tab = scan_tabs[cid]
            q = qt[tq]
            for by in range(v):
                for bx in range(h):
                    coef[:] = 0.0
                    t = br.huff(dc_tab)
                    preds[cid] += _extend(br.bits(t), t)
                    coef[0] = preds[cid] * q[0]
                    k = 1
                    while k < 64:
                        rs = br.huff(ac_tab)
                        run, size = rs >> 4, rs & 15
                        if size == 0:
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            raise ValueError("invalid JPEG AC symbol")
                        k += run
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        coef[ZIGZAG[k]] = _extend(br.bits(size), size) * q[k]
                        k += 1
                    block = _DCT.T @ coef.reshape(8, 8) @ _DCT
                    y0 = (my * v + by) * 8
                    x0 = (mx * h + bx) * 8
                    planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
    out = []
    for cid, h, v, _ in comps:
        p = np.repeat(np.repeat(planes[cid], vmax // v, axis=0), hmax // h, axis=1)
        out.append(p[:height, :width])
    if len(out) == 1:
        gray = np.clip(np.round(out[0] + 128), 0, 255).astype(np.uint8)
        return np.repeat(gray[:, :, None], 3, axis=2)
    y, cb, cr = out[0] + 128, out[1], out[2]  # chroma keeps its 128 offset
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (test/oracle counterpart)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _encode_block(
    bw: _BitWriter, block: np.ndarray, quant: int, pred: int,
    dc_enc: dict, ac_enc: dict,
) -> int:
    """DCT + quantize + Huffman-emit one 8x8 block; returns the new DC
    predictor."""
    coef = _DCT @ (block - 128.0) @ _DCT.T
    zz = np.round(coef.reshape(64)[ZIGZAG] / quant).astype(np.int64)
    diff = int(zz[0]) - pred
    t = int(diff).bit_length() if diff else 0
    code, ln = dc_enc[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]
            bw.write(code, ln)
            run -= 16
        size = abs(v).bit_length()
        code, ln = ac_enc[(run << 4) | size]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        code, ln = ac_enc[0x00]
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(img: np.ndarray, quant: int = 1, subsample: bool = False) -> bytes:
    """Grayscale (H, W) or RGB (H, W, 3) uint8 → baseline JPEG bytes.

    ``quant`` is the single flat quantization step (1 = max fidelity; flat
    blocks then round-trip exactly).  ``subsample=True`` emits 4:2:0 (2x2
    chroma mean) instead of 4:4:4.  Tables are written to DQT/DHT, so the
    stream is self-describing standard baseline JPEG.
    """
    gray = img.ndim == 2
    h0, w0 = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        factors = [(1, 1)]
    else:
        x = img.astype(np.float64)
        r, g, b = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            mcu = 16
            yp = _pad(y, mcu)
            cbp = _half(_pad(cb, mcu))
            crp = _half(_pad(cr, mcu))
            planes = [yp, cbp, crp]
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            factors = [(1, 1), (1, 1), (1, 1)]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = (w0 + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h0 + 8 * vmax - 1) // (8 * vmax)
    # pad every plane to its MCU-aligned size (edge replication)
    planes = [
        _pad_to(p, mcuy * f[1] * 8, mcux * f[0] * 8)
        for p, f in zip(planes, factors)
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0)  # DQT, pq/tq=0
    out += bytes([quant] * 64)
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h0, w0, nc)
    for c in range(nc):
        out += bytes([c + 1, (factors[c][0] << 4) | factors[c][1], 0])
    for tc, bits, vals in (
        (0, _ENC_DC_BITS, _ENC_DC_VALS), (1, _ENC_AC_BITS, _ENC_AC_VALS)
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc << 4)
        out += bytes(bits) + vals
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x00])
    out += b"\x00\x3f\x00"  # Ss/Se/Ah-Al for baseline

    dc_enc = _huff_encode_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_enc = _huff_encode_table(_ENC_AC_BITS, _ENC_AC_VALS)
    bw = _BitWriter()
    preds = [0] * nc
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for c in range(nc):
            fh, fv = factors[c]
            for by in range(fv):
                for bx in range(fh):
                    y0 = (my * fv + by) * 8
                    x0 = (mx * fh + bx) * 8
                    preds[c] = _encode_block(
                        bw, planes[c][y0 : y0 + 8, x0 : x0 + 8], quant,
                        preds[c], dc_enc, ac_enc,
                    )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _half(p: np.ndarray) -> np.ndarray:
    """2x2 mean downsample (4:2:0 chroma)."""
    h, w = p.shape
    return p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def _pad(p: np.ndarray, mult: int) -> np.ndarray:
    """Edge-replicate pad both dims up to a multiple of ``mult``."""
    h, w = p.shape
    ph = (mult - h % mult) % mult
    pw = (mult - w % mult) % mult
    return np.pad(p, ((0, ph), (0, pw)), mode="edge") if (ph or pw) else p


def _pad_to(p: np.ndarray, th: int, tw: int) -> np.ndarray:
    h, w = p.shape
    return np.pad(p, ((0, th - h), (0, tw - w)), mode="edge") if (
        h != th or w != tw
    ) else p
