"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a typed
metadata struct; decode / feature-extraction run as Arrow-batched
``mapInPandas`` stages.

Decode support: five codecs are decoded for real with no external libs —
24-bit BMP images and 8-bit PNG in all four byte-depth color types —
gray, palette, RGB, RGBA — (stdlib zlib inflate + all five scanline
filters reversed in numpy), both with nearest-neighbor resize +
re-encode; baseline JPEG (marker walk, canonical Huffman, dequant, float
IDCT, 4:4:4/4:2:2/4:2:0 sampling, restart markers — see
:mod:`dev_clickhouse_spark.llm.jpeg`); animated GIF (full LZW with
variable code widths, frame composition onto the logical screen, GCE
transparency) backing genuine frame sampling; and 16-bit PCM WAV audio
(header walk + sample statistics).  MP3 and MP4 are covered at the
METADATA level (frame-header walk / ftyp-moov container walk — real
duration, rate, tracks, dimensions); their SAMPLE decode genuinely needs
torchaudio/ffmpeg and raises ``NotImplementedError`` from
:func:`real_decode`, falling to the deterministic byte-level stub.  The
Spark-side plumbing (schema, batch shape, partitioning, 1→N fan-out) is
the same for all paths.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.ch_compat import round_half_up as rnd
from ..io import load_table
from ..queries.registry import register

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),       # image | audio | video
    T.StructField("payload", T.BinaryType()),          # opaque encoded bytes
    T.StructField("meta", T.StructType([               # typed sidecar metadata
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("source", T.StringType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


# ---------------------------------------------------------------------------
# Real decoders for uncompressed codecs (pure numpy — no external libs)
# ---------------------------------------------------------------------------

def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (H, W, 3) uint8 RGB array.  Raises
    ValueError on anything that is not plain BI_RGB 24bpp."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError("unsupported BMP header")
    width, height = struct.unpack_from("<ii", payload, 18)
    bitcount = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bitcount != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed (BI_RGB) BMP is supported")
    bottom_up = height > 0
    height = abs(height)
    stride = ((width * 3 + 3) // 4) * 4
    pixels = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        pixels = pixels[::-1]
    return pixels[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB array → 24-bit bottom-up BI_RGB BMP bytes."""
    h, w, _ = rgb.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # RGB → BGR, flip
    body = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """16-bit PCM RIFF/WAVE → (sample_rate, int16 sample array, channels
    interleaved).  Raises ValueError for non-PCM or non-16-bit audio."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, bits, fmt = 12, None, None, None
    data = None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            fmt, _ch, rate = struct.unpack_from("<HHI", payload, pos + 8)
            bits = struct.unpack_from("<H", payload, pos + 22)[0]
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if fmt != 1 or bits != 16 or data is None or rate is None:
        raise ValueError("only 16-bit PCM WAV is supported")
    return rate, np.frombuffer(data, dtype="<i2")


#: MPEG audio frame-header tables (ISO/IEC 11172-3 / 13818-3 public
#: header format).  Bitrate kbps by (version group, layer III) index;
#: index 0 = "free" and 15 = invalid — both rejected by the walk.
_MP3_BITRATE_V1_L3 = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
    None,
)
_MP3_BITRATE_V2_L3 = (
    None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, None,
)
#: sample rate Hz by (version bits, sr index); version bits: 0=MPEG2.5,
#: 2=MPEG2, 3=MPEG1 (1 is reserved)
_MP3_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}


def parse_mp3(payload: bytes) -> dict:
    """MP3 frame-header walk — METADATA, not PCM (full Layer III synthesis
    needs huffman tables + polyphase filterbank; ffmpeg-class work that is
    the declared decode boundary).  Skips an ID3v2 tag (syncsafe size),
    then walks consecutive MPEG-1/2/2.5 Layer III frame headers computing
    each frame's byte length from the bitrate/sample-rate/padding fields,
    exactly how ``ffprobe`` estimates duration without decoding.  Returns
    {version, layer, bitrate_kbps, sample_rate, n_frames, duration_s}
    (bitrate of the FIRST frame; VBR streams vary per frame but the walk
    still counts frames exactly).  Raises ValueError when no valid frame
    sequence is found."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = 0
        for b in payload[6:10]:
            size = (size << 7) | (b & 0x7F)  # syncsafe int
        pos = 10 + size
    n_frames, samples, first = 0, 0, None
    while pos + 4 <= len(payload):
        b0, b1, b2 = payload[pos], payload[pos + 1], payload[pos + 2]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            break
        ver_bits = (b1 >> 3) & 0x3
        layer_bits = (b1 >> 1) & 0x3
        if ver_bits == 1 or layer_bits != 1:  # reserved version / not L-III
            break
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        table = _MP3_BITRATE_V1_L3 if ver_bits == 3 else _MP3_BITRATE_V2_L3
        bitrate = table[br_idx]
        if bitrate is None or sr_idx == 3:
            break
        rate = _MP3_RATES[ver_bits][sr_idx]
        # Layer III frame bytes: floor(coef * bitrate / rate) + padding,
        # coef = 144 for MPEG1, 72 for MPEG2/2.5 (576-sample granule)
        coef = 144 if ver_bits == 3 else 72
        flen = (coef * bitrate * 1000) // rate + padding
        if flen < 4 or pos + flen > len(payload):
            break
        if first is None:
            first = (ver_bits, bitrate, rate)
        n_frames += 1
        samples += 1152 if ver_bits == 3 else 576
        pos += flen
    if n_frames == 0 or first is None:
        raise ValueError("no valid MPEG audio frames")
    ver_bits, bitrate, rate = first
    version = {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}[ver_bits]
    return {
        "version": version,
        "layer": 3,
        "bitrate_kbps": bitrate,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_s": samples / rate,
    }


def encode_mp3(
    n_frames: int, fill: int = 0, bitrate_kbps: int = 128,
    sample_rate: int = 44100, with_id3: bool = True,
) -> bytes:
    """Deterministic synthetic MP3 for the census/tests: a well-formed
    ID3v2 tag plus ``n_frames`` MPEG-1 Layer III frame headers with
    spec-correct lengths and ``fill`` bytes as the (undecodable) payload —
    valid to every header walk, decodable by none."""
    br_idx = _MP3_BITRATE_V1_L3.index(bitrate_kbps)
    sr_idx = _MP3_RATES[3].index(sample_rate)
    out = bytearray()
    if with_id3:
        body = b"TAG0" * 4  # 16 bytes of tag payload
        out += b"ID3\x03\x00\x00" + bytes(
            [(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
             (len(body) >> 7) & 0x7F, len(body) & 0x7F]
        ) + body
    flen = (144 * bitrate_kbps * 1000) // sample_rate
    for _ in range(n_frames):
        hdr = bytes(
            [0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0x00]
        )  # MPEG1 (11), Layer III (01), no CRC; no padding
        out += hdr + bytes([fill & 0xFF]) * (flen - 4)
    return bytes(out)


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk_mp4_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each ISO-BMFF box in
    buf[start:end].  Handles 64-bit largesize (size==1) and to-end boxes
    (size==0); stops on a malformed size rather than raising — a census
    over a 100 TB corpus must tolerate truncated tails."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos:pos + 4], "big")
        typ = buf[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(buf[pos + 8:pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield typ, body, pos + size
        pos += size


def parse_mp4(payload: bytes) -> dict:
    """MP4/ISO-BMFF container walk — METADATA, not samples (AVC/AAC sample
    decode needs ffmpeg-class work; that is the declared decode boundary).
    Walks ``ftyp`` (major brand) and the ``moov`` tree the way ``ffprobe``
    reads a file's headline: ``mvhd`` for timescale/duration (version 0
    and 1 layouts), one ``trak`` per track with its ``hdlr`` handler type,
    ``tkhd`` width/height (16.16 fixed point) for video tracks, and the
    ``stsd`` sample-entry fourcc as the codec id.  Returns {major_brand,
    timescale, duration_s, n_tracks, codecs, width, height}.  Raises
    ValueError when the payload is not an MP4 container or has no moov."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF container (no ftyp)")
    out = {
        "major_brand": payload[8:12].decode("latin-1"),
        "timescale": None, "duration_s": None, "n_tracks": 0,
        "codecs": [], "width": None, "height": None,
    }

    def walk(start: int, end: int) -> None:
        for typ, b, e in _walk_mp4_boxes(payload, start, end):
            if typ == b"mvhd" and e - b >= 20:
                ver = payload[b]
                if ver == 1 and e - b >= 32:
                    ts = int.from_bytes(payload[b + 20:b + 24], "big")
                    dur = int.from_bytes(payload[b + 24:b + 32], "big")
                else:
                    ts = int.from_bytes(payload[b + 12:b + 16], "big")
                    dur = int.from_bytes(payload[b + 16:b + 20], "big")
                out["timescale"] = ts
                out["duration_s"] = (dur / ts) if ts else None
            elif typ == b"trak":
                out["n_tracks"] += 1
                walk(b, e)
            elif typ == b"tkhd" and e - b >= 84:
                # width/height are the LAST two 16.16 fixed-point fields
                # of both tkhd layouts; audio tracks carry zeros, so the
                # first nonzero pair is the presentation video size
                w_off = e - 8
                w = int.from_bytes(payload[w_off:w_off + 4], "big") >> 16
                h = int.from_bytes(payload[w_off + 4:w_off + 8], "big") >> 16
                if w and h and out["width"] is None:
                    out["width"], out["height"] = w, h
            elif typ == b"stsd" and e - b >= 16:
                n = int.from_bytes(payload[b + 4:b + 8], "big")
                pos = b + 8
                for _i in range(min(n, 16)):
                    if pos + 8 > e:
                        break
                    esize = int.from_bytes(payload[pos:pos + 4], "big")
                    four = payload[pos + 4:pos + 8].decode("latin-1")
                    out["codecs"].append(four)
                    if esize < 8 or pos + esize > e:
                        break
                    pos += esize
            elif typ in _MP4_CONTAINERS:
                walk(b, e)

    saw_moov = False
    for typ, b, e in _walk_mp4_boxes(payload, 0, len(payload)):
        if typ == b"moov":
            saw_moov = True
            walk(b, e)
    if not saw_moov:
        raise ValueError("MP4 container has no moov box")
    return out


def encode_mp4(
    duration_s: float = 2.0, timescale: int = 600,
    width: int = 64, height: int = 48, codec: bytes = b"avc1",
    n_tracks: int = 1, mdat_fill: int = 0, mdat_len: int = 32,
) -> bytes:
    """Deterministic synthetic MP4 for the census/tests: spec-correct
    ftyp + moov(mvhd + n×trak(tkhd + mdia(hdlr + stbl(stsd)))) + mdat
    with undecodable payload bytes — valid to every container walk,
    sample-decodable by none."""
    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    dur = int(duration_s * timescale)
    mvhd = box(b"mvhd", struct.pack(
        ">BxxxIIII", 0, 0, 0, timescale, dur
    ) + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10 + _MP4_UNITY_MATRIX + b"\x00" * 24
        + struct.pack(">I", n_tracks + 1))
    traks = b""
    for i in range(n_tracks):
        tkhd = box(b"tkhd", struct.pack(
            ">BxxxIII4xI8xhhh2x", 0, 0, 0, i + 1, dur, 0, 0, 0
        ) + _MP4_UNITY_MATRIX
            + struct.pack(">II", width << 16, height << 16))
        hdlr = box(b"hdlr", struct.pack(">Bxxx", 0) + b"\x00" * 4
                   + (b"vide" if i == 0 else b"soun") + b"\x00" * 12
                   + b"h\x00")
        entry = struct.pack(">I", 16) + codec + b"\x00" * 6 \
            + struct.pack(">H", 1)
        stsd = box(b"stsd", struct.pack(">BxxxI", 0, 1) + entry)
        stbl = box(b"stbl", stsd)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", hdlr + minf)
        traks += box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + traks)
    ftyp = box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42isom")
    mdat = box(b"mdat", bytes([mdat_fill & 0xFF]) * mdat_len)
    return ftyp + moov + mdat


_MP4_UNITY_MATRIX = struct.pack(
    ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG — grayscale (type 0), truecolor (2),
    palette (3), or RGBA (6) — → (H, W, 3) uint8 RGB array.  Pure
    stdlib-zlib + numpy: chunks are walked, IDAT inflated, and all five
    scanline filters (none/sub/up/average/paeth) reversed per the PNG
    spec §9 recurrences.  16-bit and interlaced images raise ValueError."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        typ = payload[pos + 4:pos + 8]
        if typ == b"IHDR":
            ihdr = payload[pos + 8:pos + 8 + ln]
        elif typ == b"IDAT":
            idat.append(payload[pos + 8:pos + 8 + ln])
        elif typ == b"PLTE":
            plte = np.frombuffer(
                payload, np.uint8, ln - ln % 3, pos + 8).reshape(-1, 3)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or ctype not in (0, 2, 3, 6) or interlace != 0:
        raise ValueError(
            "only 8-bit non-interlaced gray/palette/RGB/RGBA PNG is supported")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    ch = {0: 1, 2: 3, 3: 1, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has the wrong size")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        if ftype == 0:
            cur = row
        elif ftype == 2:  # up
            cur = (row + prev) & 0xFF
        elif ftype in (1, 3, 4):  # sub / average / paeth need the left pixel
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, ch)
    if ctype == 0:  # grayscale → replicate
        return np.repeat(px, 3, axis=2)
    if ctype == 3:  # palette lookup
        idx = px[:, :, 0]
        if int(idx.max()) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idx].copy()
    return px[:, :, :3].copy()


def encode_png(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB array → truecolor PNG bytes (filter-0 rows)."""
    h, w, _ = rgb.shape
    scan = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    scan[:, 1:] = rgb.reshape(h, w * 3)
    body = zlib.compress(scan.tobytes())

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", body)
            + chunk(b"IEND", b""))


GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    """GIF-variant LZW: variable code width (min+1 .. 12 bits, LSB-first),
    clear/end control codes, dictionary rebuilt per the spec."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    literals = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(literals)
    code_size = min_code_size + 1
    out, prev = bytearray(), None
    bitbuf = bitcnt = pos = 0
    while True:
        while bitcnt < code_size and pos < len(data):
            bitbuf |= data[pos] << bitcnt
            bitcnt += 8
            pos += 1
        if bitcnt < code_size:
            break
        code = bitbuf & ((1 << code_size) - 1)
        bitbuf >>= code_size
        bitcnt -= code_size
        if code == clear:
            table = list(literals)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream")
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        out += entry
        prev = entry
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a → (n_frames, H, W, 3) uint8 RGB.  Pure Python/numpy:
    walks the block stream, LZW-decodes each image descriptor, maps
    indices through the local/global color table, and paints frames onto
    the logical screen (frame N starts from frame N-1's canvas — disposal
    method 1 semantics; GCE transparency indices are left unpainted).
    Interlaced images raise ValueError."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    w, h, packed = struct.unpack_from("<HHB", payload, 6)
    pos = 13
    global_table = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_table = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)  # unpainted screen = black
    frames: list[np.ndarray] = []
    transparent = None
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:  # graphic control
                flags = payload[pos + 1]
                transparent = payload[pos + 4] if flags & 1 else None
            while payload[pos] != 0:  # skip sub-blocks
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        table = global_table
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            table = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if fpacked & 0x40:
            raise ValueError("interlaced GIF is not supported")
        if table is None:
            raise ValueError("GIF frame has no color table")
        min_code_size = payload[pos]
        pos += 1
        chunks = []
        while payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(b"".join(chunks), min_code_size), np.uint8,
            count=fw * fh,
        ).reshape(fh, fw)
        rect = canvas[top:top + fh, left:left + fw]
        if transparent is None:
            rect[:] = table[idx]
        else:
            opaque = idx != transparent
            rect[opaque] = table[idx[opaque]]
        transparent = None
        frames.append(canvas.copy())
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames)


def encode_gif(frames: np.ndarray) -> bytes:
    """(n, H, W, 3) uint8 → multi-frame GIF89a.  Builds one global palette
    over all frames (≤256 distinct colors required) and LZW-encodes each
    frame with exact decoder-dictionary simulation, emitting literal codes
    and a clear whenever the table approaches the 12-bit ceiling."""
    n_frames, h, w, _ = frames.shape
    colors, inverse = np.unique(frames.reshape(-1, 3), axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif needs <=256 distinct colors")
    bits = max(2, int(np.ceil(np.log2(max(len(colors), 2)))))
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(colors)] = colors
    indices = inverse.astype(np.uint8).reshape(n_frames, h, w)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    min_code = bits
    clear, end = 1 << min_code, (1 << min_code) + 1
    for f in range(n_frames):
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(min_code)
        bitbuf = bitcnt = 0
        body = bytearray()

        def emit(code: int, size: int) -> None:
            nonlocal bitbuf, bitcnt
            bitbuf |= code << bitcnt
            bitcnt += size
            while bitcnt >= 8:
                body.append(bitbuf & 0xFF)
                bitbuf >>= 8
                bitcnt -= 8

        code_size = min_code + 1
        table_len = end + 1
        emit(clear, code_size)
        prev_emitted = False
        for px in indices[f].ravel():
            emit(int(px), code_size)
            if prev_emitted:  # decoder grows its table per non-first code
                table_len += 1
                if table_len == (1 << code_size):
                    if code_size < 12:
                        code_size += 1
                    else:
                        emit(clear, code_size)
                        code_size = min_code + 1
                        table_len = end + 1
                        prev_emitted = False
                        continue
            prev_emitted = True
        emit(end, code_size)
        if bitcnt:
            body.append(bitbuf & 0xFF)
        for i in range(0, len(body), 255):
            chunk = body[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def real_decode(payload: bytes, media_type: str) -> list[float]:
    """Decode a payload and emit content features.

    - ``image`` + BMP, PNG, baseline-JPEG, or GIF magic → [width, height,
      mean R, mean G, mean B, grayscale std] from the decoded pixels.
    - ``audio`` + RIFF/WAVE magic → [sample_rate, n_samples, RMS, peak]
      from the decoded samples.
    - anything else (MP3 PCM synthesis, MP4 sample decode) needs
      torchaudio / ffmpeg, which are not installed here →
      ``NotImplementedError``.  Callers try :func:`probe_media_metadata`
      (MP3 frame-header walk, MP4 ftyp/moov container walk — real
      rate/bitrate/duration/dimensions, no samples) before falling back
      to the byte-level stub.
    """
    if media_type == "video" and payload[:6] in GIF_MAGICS:
        frames = decode_gif(payload).astype(np.float64)
        gray = frames.mean(axis=3)
        return [
            float(frames.shape[0]), float(frames.shape[2]),
            float(frames.shape[1]), float(gray.mean()), float(gray.std()),
        ]
    if media_type == "image" and (
        payload[:2] == b"BM" or payload[:8] == PNG_MAGIC
        or payload[:6] in GIF_MAGICS or payload[:2] == b"\xff\xd8"
    ):
        if payload[:2] == b"BM":
            px = decode_bmp(payload).astype(np.float64)
        elif payload[:8] == PNG_MAGIC:
            px = decode_png(payload).astype(np.float64)
        elif payload[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg

            try:
                px = decode_jpeg(payload).astype(np.float64)
            except ValueError as e:
                if "not supported" in str(e):  # progressive / 12-bit modes
                    raise NotImplementedError(str(e)) from e
                raise
        else:
            px = decode_gif(payload)[0].astype(np.float64)  # first frame
        gray = px.mean(axis=2)
        return [
            float(px.shape[1]), float(px.shape[0]),
            float(px[:, :, 0].mean()), float(px[:, :, 1].mean()),
            float(px[:, :, 2].mean()), float(gray.std()),
        ]
    if media_type == "audio" and payload[:4] == b"RIFF":
        rate, samples = decode_wav(payload)
        x = samples.astype(np.float64)
        rms = float(np.sqrt((x ** 2).mean())) if len(x) else 0.0
        peak = float(np.abs(x).max()) if len(x) else 0.0
        return [float(rate), float(len(samples)), rms, peak]
    raise NotImplementedError(
        f"decode for this {media_type} codec requires media libs not present "
        "in this environment (BMP/PNG/WAV decode IS supported); "
        "extract_features falls back to the deterministic stub"
    )


def probe_media_metadata(payload: bytes, media_type: str) -> list[float]:
    """Metadata-level probe for codecs whose CONTENT decode is the
    declared boundary (``real_decode`` docstring): real header fields, no
    sample/pixel synthesis.  MP3 → [sample_rate, n_frames, bitrate_kbps,
    duration_s] from the frame-header walk; MP4/ISO-BMFF → [duration_s,
    timescale, n_tracks, width, height] from the ftyp/moov container walk
    (sample decode still needs ffmpeg — that boundary is unchanged).
    Raises NotImplementedError for codecs with no metadata walk,
    ValueError for malformed streams."""
    if media_type == "audio" and (
        payload[:3] == b"ID3" or (
            len(payload) >= 2 and payload[0] == 0xFF
            and (payload[1] & 0xE0) == 0xE0
        )
    ):
        m = parse_mp3(payload)
        return [
            float(m["sample_rate"]), float(m["n_frames"]),
            float(m["bitrate_kbps"]), float(m["duration_s"]),
        ]
    if media_type == "video" and len(payload) >= 12 and (
        payload[4:8] == b"ftyp"
    ):
        m = parse_mp4(payload)
        return [
            float(m["duration_s"] or 0.0), float(m["timescale"] or 0),
            float(m["n_tracks"]), float(m["width"] or 0),
            float(m["height"] or 0),
        ]
    raise NotImplementedError(
        f"no metadata walk for this {media_type} codec"
    )


def _stub_features(payload: bytes) -> list[float]:
    """Deterministic fake features standing in for the decoded-content
    embedding: [byte length, first byte, last byte, byte-sum mod 997]."""
    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    return [
        float(len(payload)),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload) % 997),
    ]


def attach_media(docs: DataFrame) -> DataFrame:
    """Demo adapter: wrap document text bytes as an opaque media payload with
    typed metadata — the shape a parquet table of encoded images would have."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, use_real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.  Partition-local
    and map-only: at 100 TB this is the GPU/CPU-bound stage you scale by
    executor count, not by shuffle tuning."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                raw = bytes(payload) if payload is not None else b""
                if use_real_decode:
                    feats.append(real_decode(raw, mtype))
                else:
                    feats.append(_stub_features(raw))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(bytes(p) if p is not None else b"") for p in pdf["payload"]],
                "features": feats,
            })

    return media.select("media_id", "media_type", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_index", T.IntegerType()),
    T.StructField("frame_payload", T.BinaryType()),
])


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224,
    use_real_decode: bool = False,
) -> DataFrame:
    """Image resize stage — row-preserving map-only.  With
    ``use_real_decode`` BMP/PNG/baseline-JPEG payloads are genuinely decoded,
    nearest-neighbor resized in numpy, and re-encoded in their own codec
    (other formats raise).  The default stub emits a deterministic byte slice
    standing in for the resized encoding, with the target dimensions in
    typed columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                if use_real_decode:
                    if raw[:2] == b"BM":
                        px, enc = decode_bmp(raw), encode_bmp
                    elif raw[:8] == PNG_MAGIC:
                        px, enc = decode_png(raw), encode_png
                    elif raw[:2] == b"\xff\xd8":
                        from .jpeg import decode_jpeg, encode_jpeg

                        px, enc = decode_jpeg(raw), encode_jpeg
                    else:
                        px, enc = real_decode(raw, "image"), encode_bmp
                    ys = (np.arange(height) * px.shape[0] // height).clip(0, px.shape[0] - 1)
                    xs = (np.arange(width) * px.shape[1] // width).clip(0, px.shape[1] - 1)
                    out_payloads.append(enc(px[ys][:, xs]))
                else:
                    # deterministic fake: clamp byte length to width*height/64
                    out_payloads.append(raw[: max(1, (width * height) // 64)])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": out_payloads,
                "width": [width] * len(pdf),
                "height": [height] * len(pdf),
            })

    return media.select("media_id", "payload").mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, n_frames: int = 4, use_real_decode: bool = False,
) -> DataFrame:
    """Video frame sampling: one input row fans out to ``n_frames`` rows —
    the batch-shape change a real ffmpeg sampler produces.  With
    ``use_real_decode`` animated GIF payloads are genuinely decoded and
    ``n_frames`` evenly-spaced frames come back as single-frame PNGs
    (other video containers raise — they need ffmpeg); otherwise the stub
    slices the payload into equal byte chunks as fake frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                if use_real_decode and raw[:6] in GIF_MAGICS:
                    frames = decode_gif(raw)
                    picks = np.linspace(
                        0, len(frames) - 1, min(n_frames, len(frames))
                    ).round().astype(int)
                    for i, fi in enumerate(picks):
                        rows.append((mid, i, encode_png(frames[fi])))
                    continue
                if use_real_decode:
                    real_decode(raw, "video")
                step = max(1, len(raw) // n_frames)
                for i in range(n_frames):
                    rows.append((mid, i, raw[i * step : (i + 1) * step]))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "frame_payload"]
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)


@register(
    "multimodal_feature_extract",
    oracle="""
WITH ck AS (
  SELECT doc_id, source, octet_length(encode(text)) AS n_bytes,
         coalesce((
           SELECT sum(ascii(substr(text, u.i, 1)))
           FROM (SELECT unnest(generate_series(1, length(text))) AS i) u
         ) % 997, 0) AS checksum
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_media,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       floor(avg(checksum) * 10000 + 0.5) / 10000 AS avg_checksum_feature
FROM ck GROUP BY source
""",
    tags=["llm-multimodal"],
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline end-to-end: wrap → mapInPandas feature extract →
    per-source aggregate.  The synthetic payloads are text bytes (no codec),
    so the byte-level stub runs — and because the corpus is ASCII, DuckDB can
    replay the exact byte-sum checksum feature, upgrading this from a
    rows-only check to a value-hash oracle.  Real decode (BMP/WAV, pure
    numpy) is exercised in tests/test_llm.py."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_media(docs)
    feats = extract_features(media)
    meta = media.select("media_id", F.col("meta.source").alias("source"))
    return (
        feats.join(meta, "media_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            rnd(F.avg(F.element_at("features", 4)), 4).alias("avg_checksum_feature"),
        )
    )


@register(
    "multimodal_png_roundtrip_stats",
    oracle="""
SELECT doc_id,
       4 AS width, 4 AS height,
       floor(list_sum(list_transform(range(0, 16),
             j -> ascii(substr(text, 1 + j * 3, 1)))) / 16.0
             * 10000 + 0.5) / 10000 AS mean_r,
       floor(list_sum(list_transform(range(0, 16),
             j -> ascii(substr(text, 2 + j * 3, 1)))) / 16.0
             * 10000 + 0.5) / 10000 AS mean_g,
       floor(list_sum(list_transform(range(0, 16),
             j -> ascii(substr(text, 3 + j * 3, 1)))) / 16.0
             * 10000 + 0.5) / 10000 AS mean_b
FROM documents
WHERE n_chars >= 48
""",
    tags=["llm-multimodal", "png-roundtrip"],
)
def multimodal_png_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate proof that the pure-numpy PNG codec is lossless: each
    document's first 48 bytes become a 4x4 RGB image, travel through
    ``encode_png`` → ``decode_png`` inside an Arrow batch, and the decoded
    channel means are value-hash-compared against DuckDB computing the
    same means directly from the text bytes — any filter/inflate/pixel
    error would shift the means.  Map-only at any scale."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") >= 48
    ).select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                px = np.frombuffer(
                    text.encode("utf-8")[:48], dtype=np.uint8
                ).reshape(4, 4, 3)
                back = decode_png(encode_png(px)).astype(np.float64)
                rows.append((
                    int(doc_id), back.shape[1], back.shape[0],
                    float(back[:, :, 0].mean()), float(back[:, :, 1].mean()),
                    float(back[:, :, 2].mean()),
                ))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height",
                         "mean_r", "mean_g", "mean_b"],
            )

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ])
    res = docs.mapInPandas(run, schema=out_schema)
    return res.select(
        "doc_id", "width", "height",
        rnd("mean_r", 4).alias("mean_r"),
        rnd("mean_g", 4).alias("mean_g"),
        rnd("mean_b", 4).alias("mean_b"),
    )


@register(
    "multimodal_jpeg_roundtrip_stats",
    oracle="""
SELECT doc_id,
       16 AS width, 16 AS height,
       CAST(ascii(substr(text, 1, 1)) AS DOUBLE) AS q00,
       CAST(ascii(substr(text, 2, 1)) AS DOUBLE) AS q01,
       CAST(ascii(substr(text, 3, 1)) AS DOUBLE) AS q10,
       CAST(ascii(substr(text, 4, 1)) AS DOUBLE) AS q11
FROM documents
WHERE n_chars >= 4
""",
    tags=["llm-multimodal", "jpeg-roundtrip"],
)
def multimodal_jpeg_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate proof of the pure-numpy baseline JPEG codec: each
    document's first 4 bytes become the gray levels of four flat 8x8
    blocks in a 16x16 image that travels through ``encode_jpeg(quant=1)``
    → ``decode_jpeg`` — the full marker/Huffman/DC-prediction/IDCT path —
    inside an Arrow batch.  A flat block's DCT is a single integer DC
    coefficient, so at quant=1 the roundtrip is EXACT and the decoded
    quadrant means value-hash-match DuckDB reading the same bytes
    directly; any Huffman/zigzag/IDCT error would shift them.  Map-only
    at any scale (the same plan shape as the PNG gate)."""
    from .jpeg import decode_jpeg, encode_jpeg

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") >= 4
    ).select("doc_id", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")[:4]
                img = np.block([
                    [np.full((8, 8), b[0], np.uint8), np.full((8, 8), b[1], np.uint8)],
                    [np.full((8, 8), b[2], np.uint8), np.full((8, 8), b[3], np.uint8)],
                ])
                back = decode_jpeg(encode_jpeg(img, quant=1)).astype(np.float64)
                gray = back.mean(axis=2)
                rows.append((
                    int(doc_id), back.shape[1], back.shape[0],
                    float(gray[:8, :8].mean()), float(gray[:8, 8:].mean()),
                    float(gray[8:, :8].mean()), float(gray[8:, 8:].mean()),
                ))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "q00", "q01", "q10", "q11"],
            )

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("q00", T.DoubleType()),
        T.StructField("q01", T.DoubleType()),
        T.StructField("q10", T.DoubleType()),
        T.StructField("q11", T.DoubleType()),
    ])
    return docs.mapInPandas(run, schema=out_schema)


#: codec assignment for the coverage census: doc_id % 8 → (codec label,
#: media_type, expected coverage LEVEL): "content" = real pixel/sample
#: decode, "metadata" = real header walk only (MP3 frame headers since
#: round 10, MP4 ftyp/moov container walk since round 11 —
#: duration/timescale/tracks/dimensions without sample decode), "stub" =
#: byte-level fallback (none currently in the census envelope; AVC/AAC
#: SAMPLE decode still needs torchaudio/ffmpeg and stays declared).
#: Progressive JPEG moved stub→content when the SOF2 decoder landed (r8),
#: MP3 moved stub→metadata in r10, MP4 in r11 — exactly the drift this
#: gate surfaces.
CODEC_CENSUS = [
    ("bmp", "image", "content"),
    ("png", "image", "content"),
    ("gif", "image", "content"),
    ("jpeg_baseline", "image", "content"),
    ("jpeg_progressive", "image", "content"),  # real SOF2 decode since r8
    ("wav", "audio", "content"),
    ("mp3", "audio", "metadata"),  # frame-header walk since r10
    ("mp4", "video", "metadata"),  # ftyp/moov container walk since r11
]

_CODEC_ORACLE = " UNION ALL ".join(
    "SELECT {k} AS k, '{c}' AS codec, {content} AS content,"
    " {meta} AS meta, {stub} AS stub".format(
        k=k, c=c, content=int(lvl == "content"),
        meta=int(lvl == "metadata"), stub=int(lvl == "stub"),
    )
    for k, (c, _m, lvl) in enumerate(CODEC_CENSUS)
)


@register(
    "multimodal_codec_coverage",
    oracle=f"""
WITH n AS (
  SELECT CAST(doc_id % 8 AS INTEGER) AS k, count(*) AS n
  FROM documents GROUP BY doc_id % 8
),
m AS ({_CODEC_ORACLE})
SELECT m.codec,
       CAST(n.n AS BIGINT) AS n_blobs,
       CAST(n.n * m.content AS BIGINT) AS n_content_decoded,
       CAST(n.n * m.meta AS BIGINT) AS n_metadata_only,
       CAST(n.n * m.stub AS BIGINT) AS n_stub_fallback,
       CAST(m.stub AS DOUBLE) AS stub_fraction
FROM m JOIN n ON n.k = m.k
""",
    tags=["llm-multimodal", "codec-coverage"],
)
def multimodal_codec_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-coverage census for the multimodal boundary (VERDICT r7 #5):
    per codec, what fraction of blobs falls back to the byte-level stub
    instead of a real decode — the number a curation operator must watch,
    because a corpus skewed toward a stubbed codec silently degrades every
    downstream content feature.

    The census is EMPIRICAL on the Spark side: each document synthesizes a
    genuine payload in its assigned codec (deterministic pixels/samples
    from doc_id; the progressive-JPEG payload is the real 10-scan SOF2
    encoding from ``encode_jpeg_progressive``) and ``real_decode`` is
    actually attempted — a blob counts as covered only if the decoder
    returns features, and as a stub fallback only on the declared
    ``NotImplementedError`` boundary.  The DuckDB oracle replays the
    EXPECTED coverage from the deterministic assignment — so the driver
    gate fails if the decode boundary ever drifts from its documentation
    (e.g. a regression stubs a codec that claims real support, or
    progressive support lands without updating the census).

    Scale shape: map-only mapInPandas, one tiny groupBy(codec); the decode
    attempt is the same partition-local Arrow stage as
    ``extract_features``."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg import encode_jpeg, encode_jpeg_progressive

        def payload_for(doc_id: int, codec: str) -> bytes:
            v = (doc_id * 37) % 251
            px = np.full((8, 8, 3), v, np.uint8)
            if codec == "bmp":
                return encode_bmp(px)
            if codec == "png":
                return encode_png(px)
            if codec == "gif":
                return encode_gif(px[None, :, :, :])
            if codec == "jpeg_baseline":
                return encode_jpeg(px[:, :, 0], quant=1)
            if codec == "jpeg_progressive":
                return encode_jpeg_progressive(px[:, :, 0], quant=1)
            if codec == "wav":
                samples = struct.pack("<4h", v, -v, v, -v)
                return (
                    b"RIFF" + struct.pack("<I", 36 + len(samples)) + b"WAVE"
                    + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000,
                                            16000, 2, 16)
                    + b"data" + struct.pack("<I", len(samples)) + samples
                )
            if codec == "mp3":
                # real frame headers: 1 + doc_id%3 MPEG-1 L3 frames so the
                # walk exercises multi-frame streams, not just the magic
                return encode_mp3(1 + int(doc_id) % 3, fill=v)
            # real container: ftyp + moov with per-doc duration/track
            # count so the walk exercises the mvhd/trak/stsd tree, not
            # just the magic
            return encode_mp4(
                duration_s=1.0 + int(doc_id) % 5,
                n_tracks=1 + int(doc_id) % 2, mdat_fill=v,
            )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                codec, mtype, _lvl = CODEC_CENSUS[int(doc_id) % 8]
                raw = payload_for(int(doc_id), codec)
                try:
                    real_decode(raw, mtype)
                    level = "content"
                except (NotImplementedError, ValueError):
                    # NotImplementedError = the documented codec boundary;
                    # ValueError = malformed/out-of-envelope stream — a
                    # 100 TB census must COUNT undecodable blobs, never let
                    # one bad file kill the job.  Try the metadata walk
                    # before falling to the byte stub.
                    try:
                        probe_media_metadata(raw, mtype)
                        level = "metadata"
                    except (NotImplementedError, ValueError):
                        _stub_features(raw)
                        level = "stub"
                rows.append((codec, level))
            yield pd.DataFrame(rows, columns=["codec", "level"])

    att = docs.mapInPandas(
        run, schema="codec string, level string"
    )
    is_ = lambda lv: (F.col("level") == lv).cast("int")  # noqa: E731
    return att.groupBy("codec").agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum(is_("content")).cast("long").alias("n_content_decoded"),
        F.sum(is_("metadata")).cast("long").alias("n_metadata_only"),
        F.sum(is_("stub")).cast("long").alias("n_stub_fallback"),
        (F.sum(is_("stub")) / F.count(F.lit(1)))
        .cast("double").alias("stub_fraction"),
    )
