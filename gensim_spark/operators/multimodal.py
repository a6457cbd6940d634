"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

Training-data pipelines carry media as ``binary`` columns with a metadata
struct; the Spark-side plumbing (schema, partition sizing, Arrow batch shape,
UDF signatures) is real and tested here. Codecs: PNM (P1-P6), uncompressed
24/32-bit BMP, 8-bit non-interlaced PNG (gray/RGB/palette/alpha, filters
0-4, stdlib zlib), and BASELINE JPEG (T.81 sequential DCT: huffman scan
decode with byte-stuffing + restart intervals, dequant, float IDCT, box
chroma upsampling, JFIF YCbCr→RGB) decode for REAL via the pure-python
parsers below (no image library exists in this container); WAV audio and
Y4M uncompressed video decode for real in the sibling ``audiovideo``
module. Progressive JPEG, arithmetic coding, and compressed audio/video
(MP3/H.264/…) still need an injected decoder (PIL/libvips/ffmpeg at
deploy time) and raise ``NotImplementedError`` until one is provided.
``fake_decode`` remains as the deterministic plumbing-test stand-in.

Scale notes: media rows are large and variable — keep
``spark.sql.files.maxPartitionBytes`` small for media tables, and bound
Arrow batches via ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a
batch of 10 MB blobs doesn't become a 1 GB Arrow allocation. Feature
extraction is ``mapInPandas`` (iterator form) so one task streams batches
instead of materializing its whole partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int,"
    " duration_ms long, payload binary"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"


def fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real decoder: folds the bytes into a
    fixed-size float vector (so tests exercise real plumbing end-to-end)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(dim, dtype=np.float32)
    pad = (-arr.size) % dim
    folded = np.pad(arr, (0, pad)).reshape(-1, dim).astype(np.float32)
    return folded.mean(axis=0) / 255.0


# --- real pure-python codecs (PNM + BMP + PNG + baseline JPEG) ---------------
#
# No image libraries exist in this container, so these formats decode for
# REAL (spec-complete binary/ascii PNM, uncompressed 24/32-bit BMP,
# zlib-inflated PNG with filters 0-4 over gray/RGB/palette/alpha, and
# baseline-sequential JPEG — see decode_jpeg below); progressive JPEG
# still needs an injected decoder (PIL/libvips at deploy time).

def _pnm_tokens(payload: bytes):
    """Whitespace-separated header tokens, skipping '#' comments (PNM spec)."""
    i = 0
    n = len(payload)
    while i < n:
        c = payload[i:i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            while i < n and payload[i:i + 1] != b"\n":
                i += 1
        else:
            j = i
            while j < n and not payload[j:j + 1].isspace():
                j += 1
            yield payload[i:j], j
            i = j


def decode_pnm(payload: bytes) -> np.ndarray:
    """PPM/PGM/PBM (P1-P6) → uint8 array (H, W) or (H, W, 3)."""
    toks = _pnm_tokens(payload)
    magic, _ = next(toks)
    if magic not in (b"P1", b"P2", b"P3", b"P4", b"P5", b"P6"):
        raise ValueError(f"not a PNM payload: {magic!r}")
    (w_tok, _), (h_tok, end) = next(toks), next(toks)
    width, height = int(w_tok), int(h_tok)
    bitmap = magic in (b"P1", b"P4")
    if not bitmap:
        maxval_tok, end = next(toks)
        maxval = int(maxval_tok)
        if maxval > 255:
            raise ValueError("16-bit PNM not supported")
    channels = 3 if magic in (b"P3", b"P6") else 1
    count = width * height * channels
    if magic in (b"P5", b"P6"):
        data = np.frombuffer(payload, dtype=np.uint8,
                             count=count, offset=end + 1)
    elif magic == b"P4":
        row_bytes = (width + 7) // 8
        raw = np.frombuffer(payload, dtype=np.uint8,
                            count=row_bytes * height, offset=end + 1)
        bits = np.unpackbits(raw.reshape(height, row_bytes),
                             axis=1)[:, :width]
        return ((1 - bits) * 255).astype(np.uint8)  # 1 = black in PBM
    else:  # ascii variants
        vals = [int(t) for t, _ in toks]
        data = np.array(vals[:count], dtype=np.int64)
        if magic == b"P1":
            return ((1 - data.reshape(height, width)) * 255).astype(np.uint8)
    arr = data.astype(np.int64)
    if not bitmap and maxval != 255:
        arr = arr * 255 // maxval
    arr = arr.astype(np.uint8)
    if channels == 3:
        return arr.reshape(height, width, 3)
    return arr.reshape(height, width)


def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (H, W[, 3]) → binary PPM/PGM bytes (round-trip for tests)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        header = b"P5 %d %d 255\n" % (arr.shape[1], arr.shape[0])
    else:
        header = b"P6 %d %d 255\n" % (arr.shape[1], arr.shape[0])
    return header + arr.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → uint8 (H, W, 3) RGB."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError("BMP core headers not supported")
    width = struct.unpack_from("<i", payload, 18)[0]
    height = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    bottom_up = height > 0
    height = abs(height)
    bytes_pp = bpp // 8
    row_stride = (width * bytes_pp + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=row_stride * height, offset=data_offset)
    rows = rows.reshape(height, row_stride)[:, :width * bytes_pp]
    px = rows.reshape(height, width, bytes_pp)
    if bottom_up:
        px = px[::-1]
    return px[:, :, 2::-1].copy()  # BGR(A) → RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB → 24-bit bottom-up BMP bytes (for tests)."""
    import struct

    arr = np.asarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    row_stride = (w * 3 + 3) & ~3
    img = np.zeros((h, row_stride), dtype=np.uint8)
    img[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    body = img.tobytes()
    file_header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return file_header + info + body


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-python PNG decode (stdlib zlib): 8-bit depth, color types 0
    (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), filters 0-4,
    non-interlaced. → uint8 (H, W) or (H, W, C)."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, hdr, plte = 8, [], None, None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if hdr is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, color, comp, filt, interlace = hdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth}/interlace={interlace} not supported "
            "(8-bit non-interlaced only)")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color} not supported")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # bytes/pixel at depth 8
    p = 0
    for y in range(h):
        f = raw[p]
        cur = np.frombuffer(raw, dtype=np.uint8, count=stride,
                            offset=p + 1).copy()
        p += stride + 1
        if f == 0:
            pass
        elif f == 2:          # Up — fully vectorized (uint8 wraps mod 256)
            cur += prev
        elif f == 1:          # Sub
            for x in range(bpp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
        elif f == 3:          # Average
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:          # Paeth
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                          else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = cur
        prev = cur
    px = out.reshape(h, w, channels)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        return plte[px[:, :, 0]]
    if channels == 1:
        return px[:, :, 0]
    return px


def encode_png(arr: np.ndarray, filters=None) -> bytes:
    """uint8 (H, W[, C]) → real PNG bytes. ``filters`` optionally gives the
    per-row filter type (0-4, default 0) so tests can exercise every
    reconstruction path of :func:`decode_png`."""
    import struct
    import zlib

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, channels = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    flat = arr.reshape(h, w * channels).astype(np.int64)
    bpp = channels
    lines = []
    prev = np.zeros(w * channels, dtype=np.int64)
    for y in range(h):
        f = int(filters[y]) if filters is not None else 0
        cur = flat[y]
        left = np.concatenate((np.zeros(bpp, dtype=np.int64), cur[:-bpp]))
        upleft = np.concatenate((np.zeros(bpp, dtype=np.int64),
                                 prev[:-bpp]))
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        elif f == 4:
            pp = left + prev - upleft
            pa, pb, pc = (np.abs(pp - left), np.abs(pp - prev),
                          np.abs(pp - upleft))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            enc = cur - pred
        else:
            raise ValueError(f"unknown PNG filter {f}")
        lines.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data \
            + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


# --- baseline JPEG (ITU-T T.81 sequential DCT, huffman) ----------------------

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# A[u, x] = α(u)·cos((2x+1)uπ/16)/2 — the separable 8×8 IDCT basis
_IDCT_A = np.array([[
    (np.sqrt(0.5) if u == 0 else 1.0)
    * np.cos((2 * x + 1) * u * np.pi / 16) / 2
    for x in range(8)] for u in range(8)])


class _HuffTable:
    """Canonical huffman table from a DHT segment (T.81 Annex C)."""

    def __init__(self, counts: list, symbols: bytes):
        self.lookup = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first scan-data reader with 0xFF00 byte-stuffing removal;
    stops (returns None) at any non-stuffing marker (T.81 F.2.2.5)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker = None

    def _fill(self) -> bool:
        if self.marker is not None:
            return False
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) \
                else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8
        return True

    def read(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                # past-the-end reads pad with zeros (final EOB padding)
                self.bits <<= 8
                self.nbits += 8
        self.nbits -= n
        out = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return out

    def decode(self, table: _HuffTable) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read(1)
            length += 1
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in JPEG scan")

    def align_and_expect_rst(self) -> None:
        self.bits = 0
        self.nbits = 0      # discard the pre-marker padding bits
        if self.marker is not None:
            # the reader already stopped AT the marker: pos points at 0xFF
            if 0xD0 <= self.marker <= 0xD7:
                self.pos += 2
                self.marker = None
        elif (self.pos + 1 < len(self.data)
              and self.data[self.pos] == 0xFF
              and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            # marker not yet consumed — the previous MCU ended byte-aligned
            self.pos += 2


def _extend(v: int, t: int) -> int:
    """RECEIVE/EXTEND (T.81 F.2.2.1): map t-bit magnitude to signed."""
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential-DCT JPEG (SOF0/SOF1, huffman) — pure python +
    numpy: marker parse, canonical huffman scan decode with byte-stuffing
    and restart intervals, dequant + zigzag, separable float IDCT, box
    chroma upsampling, JFIF YCbCr→RGB. Progressive (SOF2) and arithmetic
    coding still need an injected decoder. → uint8 (h, w, 3) or (h, w)."""
    import struct as _s

    d = bytes(payload)
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    restart_interval = 0
    sof = None
    i = 2
    while i < len(d) - 1:
        if d[i] != 0xFF:
            raise ValueError(f"bad marker byte at {i}")
        m = d[i + 1]
        if m in (0x01, 0xD8) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        ln = _s.unpack(">H", d[i + 2:i + 4])[0]
        seg = d[i + 4:i + 2 + ln]
        if m == 0xDB:                            # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    tab = np.frombuffer(seg[p:p + 128], dtype=">u2")
                    p += 128
                else:
                    tab = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                    p += 64
                qt[tq] = tab.astype(np.int32)
            i += 2 + ln
        elif m in (0xC0, 0xC1):                  # SOF0/1 baseline
            h, w = _s.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append(dict(cid=cid, h=hv >> 4, v=hv & 15,
                                  tq=seg[8 + 3 * c]))
            sof = (h, w, comps)
            i += 2 + ln
        elif m == 0xC2:
            raise NotImplementedError(
                "progressive JPEG (SOF2) needs an injected decoder; "
                "baseline sequential decodes natively")
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                   0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{m:02x} (non-baseline) needs an "
                "injected decoder")
        elif m == 0xC4:                          # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1:p + 17])
                n = sum(counts)
                tab = _HuffTable(counts, seg[p + 17:p + 17 + n])
                (huff_ac if tc else huff_dc)[th] = tab
                p += 17 + n
            i += 2 + ln
        elif m == 0xDD:                          # DRI
            restart_interval = _s.unpack(">H", seg[:2])[0]
            i += 2 + ln
        elif m == 0xDA:                          # SOS — scan follows
            if sof is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cs = seg[1 + 2 * c]
                td_ta = seg[2 + 2 * c]
                scan[cs] = (td_ta >> 4, td_ta & 15)
            return _decode_scan(d, i + 2 + ln, sof, scan, qt, huff_dc,
                                huff_ac, restart_interval)
        else:                                    # APPn/COM/etc — skip
            i += 2 + ln
    raise ValueError("no SOS marker found")


def _decode_scan(d, pos, sof, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    h, w, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)))
    preds = [0] * len(comps)
    br = _BitReader(d, pos)
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and \
                    n_mcu % restart_interval == 0:
                br.align_and_expect_rst()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan[c["cid"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = br.decode(huff_dc[td])
                        diff = _extend(br.read(t), t) if t else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = br.decode(huff_ac[ta])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16          # ZRL
                                    continue
                                break                # EOB
                            k += r
                            zz[k] = _extend(br.read(s), s)
                            k += 1
                        block = np.zeros(64)
                        block[_ZIGZAG] = zz * q
                        px = _IDCT_A.T @ block.reshape(8, 8) @ _IDCT_A
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px + 128.0
            n_mcu += 1
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)   # box upsampling
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(out[0], 0, 255).astype(np.uint8).round() \
            .astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch to a REAL decoder (PNM/BMP/PNG/baseline JPEG).
    Other formats raise NotImplementedError — inject a codec (PIL/libvips)
    at deploy time."""
    head = bytes(payload[:2])
    if head in (b"P1", b"P2", b"P3", b"P4", b"P5", b"P6"):
        return decode_pnm(bytes(payload))
    if head == b"BM":
        return decode_bmp(bytes(payload))
    if bytes(payload[:8]) == _PNG_MAGIC:
        return decode_png(bytes(payload))
    if head == b"\xff\xd8":
        return decode_jpeg(bytes(payload))
    raise NotImplementedError(
        f"no codec for magic {head!r} in this environment; PNM/BMP/PNG/"
        "baseline-JPEG decode natively, others need an injected decoder"
    )


def image_feature_vector(pixels: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic per-image features from REAL pixels: [h, w, c,
    mean/255, std/255, 2×2 grayscale block means, 7-bin histogram] → dim."""
    px = pixels.astype(np.float64)
    gray = px.mean(axis=2) if px.ndim == 3 else px
    h, w = gray.shape
    halves_r = max(h // 2, 1)
    halves_c = max(w // 2, 1)
    blocks = [
        gray[i * halves_r:(i + 1) * halves_r or None,
             j * halves_c:(j + 1) * halves_c or None].mean() / 255.0
        for i in range(2) for j in range(2)
    ]
    hist, _ = np.histogram(gray, bins=7, range=(0, 255))
    hist = hist / max(gray.size, 1)
    feats = np.array(
        [h, w, (px.shape[2] if px.ndim == 3 else 1),
         gray.mean() / 255.0, gray.std() / 255.0, *blocks, *hist],
        dtype=np.float32,
    )
    if feats.size < dim:
        feats = np.pad(feats, (0, dim - feats.size))
    return feats[:dim]


def decode_image_batch(payloads: pd.Series, decoder=None) -> pd.Series:
    """payload bytes → decoded pixel arrays. Default decoder is the REAL
    magic-dispatch codec (PNM/BMP); formats it can't handle raise
    NotImplementedError — inject PIL/libvips etc. at deploy time, or
    ``fake_decode`` for plumbing tests."""
    if decoder is None:
        decoder = decode_image
    return payloads.map(lambda p: decoder(bytes(p)) if p is not None else None)


def extract_features(media: DataFrame, decoder=fake_decode,
                     dim: int = 16) -> DataFrame:
    """media table → (media_id, kind, n_bytes, feature float[dim]) via one
    iterator-form mapInPandas stage (streams Arrow batches)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_image_batch(pd.Series([p]), decoder=decoder)[0].tolist()
                if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda p: len(p) if p is not None else 0),
                "feature": feats,
            })

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def extract_image_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """REAL image path: decode PNM/BMP payloads to pixels and compute
    per-image statistics features, one iterator-form mapInPandas stage.
    (media_id, kind, n_bytes, feature float[dim])."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p in pdf["payload"]:
                if p is None:
                    feats.append(None)
                    continue
                feats.append(
                    image_feature_vector(decode_image(bytes(p)), dim).tolist()
                )
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda p: len(p) if p is not None else 0),
                "feature": feats,
            })

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_image(pixels: np.ndarray, width: int, height: int,
                 method: str = "bilinear") -> np.ndarray:
    """Resize decoded pixels to (height, width) with pure-numpy nearest or
    bilinear sampling (align-corners=False / pixel-center convention, the
    PIL/OpenCV default). Works for gray (h, w) and color (h, w, c)."""
    px = np.asarray(pixels)
    gray = px.ndim == 2
    if gray:
        px = px[:, :, None]
    h, w = px.shape[:2]
    if method == "nearest":
        ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
        xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
        out = px[ys[:, None], xs[None, :]]
    elif method == "bilinear":
        fy = np.clip((np.arange(height) + 0.5) * h / height - 0.5, 0, h - 1)
        fx = np.clip((np.arange(width) + 0.5) * w / width - 0.5, 0, w - 1)
        y0 = np.floor(fy).astype(np.int64)
        x0 = np.floor(fx).astype(np.int64)
        y1 = np.minimum(y0 + 1, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        wy = (fy - y0)[:, None, None]
        wx = (fx - x0)[None, :, None]
        p = px.astype(np.float64)
        out = ((1 - wy) * (1 - wx) * p[y0[:, None], x0[None, :]]
               + (1 - wy) * wx * p[y0[:, None], x1[None, :]]
               + wy * (1 - wx) * p[y1[:, None], x0[None, :]]
               + wy * wx * p[y1[:, None], x1[None, :]])
        if np.issubdtype(px.dtype, np.integer):
            out = np.clip(np.round(out), 0, 255).astype(px.dtype)
    else:
        raise ValueError("method must be 'nearest' or 'bilinear'")
    return out[:, :, 0] if gray else out


def resize_images(media: DataFrame, width: int, height: int,
                  method: str = "bilinear") -> DataFrame:
    """REAL image resize over a media table: decode → resize → re-encode
    (PNG) in one iterator-form mapInPandas stage; output matches
    MEDIA_SCHEMA with updated width/height/mime/payload. Non-image rows
    pass through unchanged."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, mimes, payloads = [], [], [], []
            for kind, mime, w0, h0, p in zip(pdf["kind"], pdf["mime"],
                                             pdf["width"], pdf["height"],
                                             pdf["payload"]):
                if kind != "image" or p is None:
                    ws.append(w0); hs.append(h0)
                    mimes.append(mime); payloads.append(p)
                    continue
                rs = resize_image(decode_image(bytes(p)), width, height, method)
                ws.append(width); hs.append(height)
                mimes.append("image/png")
                payloads.append(bytearray(encode_png(rs)))
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "mime": mimes, "width": ws, "height": hs,
                "duration_ms": pdf["duration_ms"],
                "payload": pd.Series(payloads, dtype=object),
            })

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    as a pure relational explode (the decode stage is separate).
    Demonstrates the shape: a 10-minute video at 1 fps → 600 rows, each a
    decode work item. For REAL sampling over Y4M payloads (decoding only
    the sampled frames) use ``audiovideo.sample_video_frames``."""
    n_frames = F.greatest(
        (F.col("duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
            "payload",
        )
        .withColumn("ts_ms", F.col("frame_idx") * F.lit(every_ms))
    )


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (tests/bench)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(((i * 37 + j * 11) % 251) for j in range(64 + i))
        rows.append((i, kind, f"application/x-fake-{kind}", 8, 8,
                     1000 * (i % 7 + 1), bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
