"""Baseline JPEG codec in pure numpy + stdlib — no PIL/libjpeg.

Decoder: baseline sequential DCT (SOF0) AND progressive DCT (SOF2) per ITU
T.81 — marker walk, DQT/DHT parsing with canonical Huffman reconstruction,
interleaved MCU scan with per-component sampling factors (4:4:4, 4:2:2,
4:2:0, grayscale), restart markers (DRI/RSTn), byte-unstuffing,
dequantization, float IDCT, and JFIF YCbCr→RGB.  Progressive mode (round 8,
VERDICT r7 #5) implements Annex G spectral selection + successive
approximation: DC first/refine scans (interleaved or single-component), AC
first scans with EOB-run coding, AC refinement with correction bits, ZRL in
both, restart handling — coefficients accumulate per scan and reconstruct
once at EOI.  The remaining non-supported frame types (12-bit, lossless,
arithmetic-coded, hierarchical) raise ``ValueError``.

Encoder: the test/oracle counterpart — grayscale or YCbCr 4:4:4/4:2:0,
single flat quantization table, and self-describing generated Huffman
tables (all 12 DC categories at 4 bits, all 162 run/size AC symbols at
8 bits) written to DHT, so any spec-conforming decoder reads the output.
With ``quant=1`` a flat 8x8 block round-trips EXACTLY (its DCT is a single
integer DC coefficient), which is what lets a lossy codec sit behind a
value-hash driver oracle (see multimodal_jpeg_roundtrip_stats).
``encode_jpeg_progressive`` emits a 10-scan SOF2 script that transmits
every coefficient bit, so its decode is bit-identical to the baseline
encoding of the same input.

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
    """Baseline (SOF0) or progressive (SOF2) JPEG → (H, W, 3) uint8 RGB.
    See module docstring for the supported envelope; the remaining
    non-supported frame types (12-bit, lossless, arithmetic-coded,
    hierarchical) raise ValueError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, tq)
    height = width = 0
    restart_interval = 0
    progressive = False
    coef_store: dict[int, np.ndarray] = {}  # cid → (nby, nbx, 64) zigzag ints
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            if len(seg) < 6:
                raise ValueError("truncated JPEG SOF segment")
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
            if len(seg) < 6 + 3 * nc:
                raise ValueError("truncated JPEG SOF segment")
            comps = [
                (seg[6 + 3 * c], seg[7 + 3 * c] >> 4, seg[7 + 3 * c] & 15,
                 seg[8 + 3 * c])
                for c in range(nc)
            ]
            if progressive:
                hmax = max(h for _, h, _, _ in comps)
                vmax = max(v for _, _, v, _ in comps)
                mcux = (width + 8 * hmax - 1) // (8 * hmax)
                mcuy = (height + 8 * vmax - 1) // (8 * vmax)
                coef_store = {
                    cid: np.zeros((mcuy * v, mcux * h, 64), dtype=np.int32)
                    for cid, h, v, _ in comps
                }
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
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
            if progressive:
                scan = [(seg[1 + 2 * c], seg[2 + 2 * c]) for c in range(ns)]
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                segs, pos = _entropy_segments(payload, pos + ln)
                _decode_progressive_scan(
                    comps, scan, dc_tabs, ac_tabs, ss, se,
                    ahal >> 4, ahal & 15, segs, restart_interval,
                    coef_store, width, height,
                )
                continue
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
    if progressive and coef_store:
        return _reconstruct_progressive(comps, qt, coef_store, width, height)
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
    return _assemble_rgb(out)


def _assemble_rgb(out: list[np.ndarray]) -> np.ndarray:
    """Cropped per-component spatial planes (level-shifted by −128, chroma
    centered) → uint8 RGB; shared by the baseline and progressive paths."""
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
# Progressive mode (SOF2) — T.81 Annex G, spectral selection + successive
# approximation.  Scans accumulate RAW (un-dequantized) coefficients in
# zigzag order per component block; reconstruction dequantizes + IDCTs once
# at EOI.
# ---------------------------------------------------------------------------

def _noninterleaved_grid(width, height, h, v, hmax, vmax) -> tuple[int, int]:
    """(block rows, block cols) of one component's OWN sampling grid — the
    geometry of a non-interleaved (single-component) scan, T.81 A.2.2."""
    cw = (width * h + hmax - 1) // hmax
    ch = (height * v + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _decode_progressive_scan(
    comps, scan, dc_tabs, ac_tabs, ss, se, ah, al,
    segs, ri, coef_store, width, height,
) -> None:
    """Apply one progressive scan to the coefficient store.

    Four scan kinds (G.1.1.1): DC first (Ss=0, Ah=0 — may interleave several
    components), DC refinement (Ss=0, Ah>0 — one correction bit per block),
    AC first (Ss>0, Ah=0 — single component, EOB-run coded), AC refinement
    (Ss>0, Ah>0 — correction bits for already-significant coefficients plus
    newly-significant insertions).  Restart markers reset DC predictors and
    the EOB run; ``segs`` is already unstuffed/split."""
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    by_cid = {cid: (h, v) for cid, h, v, _ in comps}

    if ss == 0:  # DC scan (first or refinement); Se must be 0
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        preds = {cid: 0 for cid, _t in scan}
        seg_idx = 0
        br = _BitReader(segs[0])
        if len(scan) > 1:
            units = mcux * mcuy  # interleaved: frame MCU grid
        else:
            cid0, _t = scan[0]
            nbyc, nbxc = _noninterleaved_grid(
                width, height, *by_cid[cid0], hmax, vmax
            )
            units = nbyc * nbxc
        for m in range(units):
            if ri and m and m % ri == 0:
                seg_idx += 1
                br = _BitReader(segs[seg_idx])
                preds = {cid: 0 for cid in preds}
            for cid, tt in scan:
                h, v = by_cid[cid]
                blocks = coef_store[cid]
                if len(scan) > 1:
                    my, mx = divmod(m, mcux)
                    spots = [
                        (my * v + by, mx * h + bx)
                        for by in range(v) for bx in range(h)
                    ]
                else:
                    spots = [divmod(m, nbxc)]
                for (by, bx) in spots:
                    if ah == 0:
                        t = br.huff(dc_tabs[tt >> 4])
                        preds[cid] += _extend(br.bits(t), t)
                        blocks[by, bx, 0] = preds[cid] << al
                    else:
                        if br.bit():
                            blocks[by, bx, 0] |= 1 << al
        return

    # AC scan: exactly one component (G.1.1.1.1)
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    cid, tt = scan[0]
    ac_tab = ac_tabs[tt & 15]
    h, v = by_cid[cid]
    nbyc, nbxc = _noninterleaved_grid(width, height, h, v, hmax, vmax)
    blocks = coef_store[cid]
    seg_idx = 0
    br = _BitReader(segs[0])
    eobrun = 0
    for m in range(nbyc * nbxc):
        if ri and m and m % ri == 0:
            seg_idx += 1
            br = _BitReader(segs[seg_idx])
            eobrun = 0
        by, bx = divmod(m, nbxc)
        blk = blocks[by, bx]
        if ah == 0:  # AC first: shifted values + EOB runs
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = br.huff(ac_tab)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r < 15:  # EOBn: run of (1<<r)+bits(r) all-done blocks
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.bits(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("progressive AC run past band end")
                blk[k] = _extend(br.bits(s), s) << al
                k += 1
        else:  # AC refinement: correction bits + newly-significant inserts
            eobrun = _ac_refine_block(br, blk, ac_tab, ss, se, al, eobrun)


def _ac_refine_block(br, blk, ac_tab, ss, se, al, eobrun) -> int:
    """One block of an AC refinement scan (G.1.2.3).  Returns the updated
    EOB run.  ``r`` counts ZERO-HISTORY positions only; every nonzero
    coefficient crossed reads one correction bit; inside an EOB run all
    remaining nonzero coefficients of the band read correction bits."""
    bit = 1 << al

    def correct(k: int) -> None:
        c = int(blk[k])
        if c and br.bit() and not (abs(c) & bit):
            blk[k] = c + (bit if c > 0 else -bit)

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.huff(ac_tab)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r < 15:  # EOBn — current block finishes in the EOB branch
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # ZRL: r stays 15 → skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("AC refinement size must be 1")
                val = bit if br.bit() else -bit
            while k <= se:
                if blk[k]:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun:
        while k <= se:
            correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(
    comps, qt, coef_store, width, height
) -> np.ndarray:
    """Dequantize + IDCT the accumulated coefficient store and assemble RGB
    (vectorized: one einsum per component over all its blocks)."""
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    out = []
    for cid, h, v, tq in comps:
        zz = coef_store[cid].astype(np.float64) * qt[tq][None, None, :]
        nby, nbx, _ = zz.shape
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG] = zz  # zigzag position k → natural index ZIGZAG[k]
        blocks = nat.reshape(nby, nbx, 8, 8)
        spatial = np.einsum("ij,pqjk,kl->pqil", _DCT.T, blocks, _DCT)
        plane = spatial.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        p = np.repeat(np.repeat(plane, vmax // v, axis=0), hmax // h, axis=1)
        out.append(p[:height, :width])
    return _assemble_rgb(out)


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


# ---------------------------------------------------------------------------
# Progressive encoder (test/oracle counterpart for SOF2)
# ---------------------------------------------------------------------------

#: spectral bands for the AC scans: ≤16 coefficients per band keeps every
#: zero run ≤ 15, so the encoder never needs ZRL (the decoder still
#: supports it for foreign streams)
_PROG_BANDS = [(1, 16), (17, 32), (33, 48), (49, 63)]


def encode_jpeg_progressive(img: np.ndarray, quant: int = 1) -> bytes:
    """Grayscale (H, W) or RGB (H, W, 3) uint8 → PROGRESSIVE (SOF2) JPEG.

    Scan script (exercises all four progressive scan kinds):
      1. DC first, all components interleaved, Al=1
      2. DC refinement, Ah=1 → Al=0
      3. per component × 4 spectral bands: AC first at Al=1
      4. per component × 4 spectral bands: AC refinement Ah=1 → Al=0
    Every coefficient bit is transmitted across the script, so the decoded
    image is BIT-IDENTICAL to the baseline encoding of the same input at
    the same ``quant`` — which is what lets the progressive round-trip sit
    behind the same value-hash oracles as the baseline one.  4:4:4 /
    grayscale only (the decoder side handles any sampling)."""
    gray = img.ndim == 2
    h0, w0 = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        x = img.astype(np.float64)
        r, g, b = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    nc = len(planes)
    nbx = (w0 + 7) // 8
    nby = (h0 + 7) // 8
    planes = [_pad_to(p, nby * 8, nbx * 8) for p in planes]

    # quantized zigzag coefficients per component: (nby, nbx, 64)
    coefs = []
    for p in planes:
        blocks = p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3) - 128.0
        f = np.einsum("ij,pqjk,kl->pqil", _DCT, blocks, _DCT.T)
        zz = np.round(
            f.reshape(nby, nbx, 64)[:, :, ZIGZAG] / quant
        ).astype(np.int64)
        coefs.append(zz)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([quant] * 64)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h0, w0, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x11, 0])  # h=v=1 (4:4:4)
    for tc, bits, vals in (
        (0, _ENC_DC_BITS, _ENC_DC_VALS), (1, _ENC_AC_BITS, _ENC_AC_VALS)
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc << 4)
        out += bytes(bits) + vals
    dc_enc = _huff_encode_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_enc = _huff_encode_table(_ENC_AC_BITS, _ENC_AC_VALS)

    def sos(scan_comps: list[int], ss: int, se: int, ah: int, al: int,
            body: bytes) -> bytes:
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(scan_comps),
                                        len(scan_comps))
        for c in scan_comps:
            hdr += bytes([c + 1, 0x00])
        return hdr + bytes([ss, se, (ah << 4) | al]) + body

    # scan 1: DC first, interleaved, Al=1
    bw = _BitWriter()
    preds = [0] * nc
    for m in range(nby * nbx):
        my, mx = divmod(m, nbx)
        for c in range(nc):
            v = int(coefs[c][my, mx, 0]) >> 1  # DC point transform: shift
            diff = v - preds[c]
            preds[c] = v
            t = abs(diff).bit_length()
            code, ln = dc_enc[t]
            bw.write(code, ln)
            if t:
                bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    out += sos(list(range(nc)), 0, 0, 0, 1, bw.flush())

    # scan 2: DC refinement Ah=1 → Al=0 (one raw bit per block)
    bw = _BitWriter()
    for m in range(nby * nbx):
        my, mx = divmod(m, nbx)
        for c in range(nc):
            bw.write(int(coefs[c][my, mx, 0]) & 1, 1)
    out += sos(list(range(nc)), 0, 0, 1, 0, bw.flush())

    # scans 3..: AC first per component per band, Al=1
    for c in range(nc):
        for ss, se in _PROG_BANDS:
            bw = _BitWriter()
            for m in range(nby * nbx):
                my, mx = divmod(m, nbx)
                blk = coefs[c][my, mx]
                run = 0
                for k in range(ss, se + 1):
                    cv = int(blk[k])
                    v = (abs(cv) >> 1) * (1 if cv > 0 else -1)
                    if v == 0:
                        run += 1
                        continue
                    size = abs(v).bit_length()
                    code, ln = ac_enc[(run << 4) | size]
                    bw.write(code, ln)
                    bw.write(v if v > 0 else v + (1 << size) - 1, size)
                    run = 0
                if run:
                    code, ln = ac_enc[0x00]  # EOB0
                    bw.write(code, ln)
            out += sos([c], ss, se, 0, 1, bw.flush())

    # scans ..N: AC refinement per component per band, Ah=1 → Al=0
    for c in range(nc):
        for ss, se in _PROG_BANDS:
            bw = _BitWriter()
            for m in range(nby * nbx):
                my, mx = divmod(m, nbx)
                blk = coefs[c][my, mx]
                run = 0
                queued: list[int] = []
                for k in range(ss, se + 1):
                    cv = int(blk[k])
                    if abs(cv) >= 2:      # already significant: correction
                        queued.append(abs(cv) & 1)
                    elif abs(cv) == 1:    # newly significant at this Al
                        code, ln = ac_enc[(run << 4) | 1]
                        bw.write(code, ln)
                        bw.write(1 if cv > 0 else 0, 1)
                        for qb in queued:
                            bw.write(qb, 1)
                        run, queued = 0, []
                    else:
                        run += 1
                if run or queued:
                    code, ln = ac_enc[0x00]  # EOB0 + trailing corrections
                    bw.write(code, ln)
                    for qb in queued:
                        bw.write(qb, 1)
            out += sos([c], ss, se, 1, 0, bw.flush())

    out += b"\xff\xd9"
    return bytes(out)
