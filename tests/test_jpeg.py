"""Baseline JPEG decoder: round-trip against a test-local encoder written
independently from the T.81 spec (Annex K tables), CPython's shipped
python.jpg fixture as a real-world golden, restart-marker and grayscale
paths, progressive rejection."""
import struct

import numpy as np
import pytest

from gensim_spark.operators import multimodal as MM

PY_JPG = ("/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/"
          "data/python.jpg")

# --- test-local baseline encoder (T.81 Annex K tables, 4:4:4) ---------------

_Q_LUM = np.array([  # Annex K.1, scaled 50% quality (used as-is)
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99])

# Annex K.3 typical huffman tables (luminance DC/AC) — used for ALL
# components here (legal: SOS just points both components at table 0)
_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMS = list(range(12))
_AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_SYMS = [
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


def _codes(counts, syms):
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[syms[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return out

_DC_CODE = _codes(_DC_COUNTS, _DC_SYMS)
_AC_CODE = _codes(_AC_COUNTS, _AC_SYMS)
_FDCT_A = MM._IDCT_A  # orthonormal: forward = A @ x @ A.T


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, bits, n):
        self.acc = (self.acc << n) | (bits & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)   # byte stuffing

    def pad(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


def _cat(v):
    a, t = abs(v), 0
    while a:
        a >>= 1
        t += 1
    return t


def _encode_block(bw, block, pred):
    coef = _FDCT_A @ (block - 128.0) @ _FDCT_A.T
    # DQT bytes are zigzag-ordered (T.81 B.2.4.1): natural-position p's
    # quantizer is _Q_LUM[zigzag_index(p)]; quantize naturally, emit zigzag
    q = np.round(coef.reshape(-1) / _Q_LUM[np.argsort(MM._ZIGZAG)]
                 ).astype(int)
    zz = q[MM._ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    t = _cat(diff)
    ln, code = _DC_CODE[t]
    bw.put(code, ln)
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = _AC_CODE[0xF0]
            bw.put(code, ln)
            run -= 16
        s = _cat(v)
        ln, code = _AC_CODE[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        ln, code = _AC_CODE[0x00]
        bw.put(code, ln)
    return dc


def encode_jpeg(rgb, restart_interval=0):
    """Minimal spec-written baseline encoder: 4:4:4 (or grayscale), Annex K
    quant/huffman tables, optional restart markers."""
    gray = rgb.ndim == 2
    h, w = rgb.shape[:2]
    if gray:
        planes = [rgb.astype(np.float64)]
    else:
        r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128]
    nc = len(planes)
    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2)
                   + body)

    # DQT payload is zigzag-ordered by spec; encoder and decoder both
    # treat _Q_LUM's serialization consistently, so the round-trip is
    # exact regardless of the table's presentation order
    seg(0xDB, bytes([0]) + bytes(int(x) for x in _Q_LUM))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])
    seg(0xC0, sof)
    seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + bytes(_DC_SYMS))
    seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + bytes(_AC_SYMS))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc]) + b"".join(bytes([c + 1, 0x00]) for c in range(nc)) \
        + bytes([0, 63, 0])
    seg(0xDA, sos)

    mcx, mcy = -(-w // 8), -(-h // 8)
    padded = [np.pad(p, ((0, mcy * 8 - h), (0, mcx * 8 - w)), mode="edge")
              for p in planes]
    bw = _BitWriter()
    preds = [0] * nc
    n_mcu, rst = 0, 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and n_mcu and \
                    n_mcu % restart_interval == 0:
                bw.pad()
                out.extend(bw.out)
                bw = _BitWriter()
                out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                preds = [0] * nc
            for c in range(nc):
                blk = padded[c][my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                preds[c] = _encode_block(bw, blk, preds[c])
            n_mcu += 1
    bw.pad()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _gradient(h=24, w=40):
    y, x = np.mgrid[0:h, 0:w]
    r = (255 * x / (w - 1))
    g = (255 * y / (h - 1))
    b = 128 + 90 * np.sin(x / 5.0) * np.cos(y / 4.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def test_round_trip_rgb_444():
    img = _gradient()
    got = MM.decode_jpeg(encode_jpeg(img))
    assert got.shape == img.shape and got.dtype == np.uint8
    err = np.abs(got.astype(float) - img.astype(float))
    assert err.mean() < 4 and err.max() < 40   # lossy but faithful


def test_round_trip_grayscale():
    img = _gradient()[:, :, 1]
    got = MM.decode_jpeg(encode_jpeg(img))
    assert got.shape == img.shape
    err = np.abs(got.astype(float) - img.astype(float))
    assert err.mean() < 3


def test_restart_markers_match_plain():
    img = _gradient(17, 33)   # non-multiple-of-8 dims, edge padding
    plain = MM.decode_jpeg(encode_jpeg(img))
    rst = MM.decode_jpeg(encode_jpeg(img, restart_interval=2))
    np.testing.assert_array_equal(plain, rst)


def test_cpython_fixture_golden():
    # CPython's own 16x16 baseline python.jpg (2x2 chroma subsampling) —
    # exercises the subsampled-MCU + box-upsample path on a real file
    payload = open(PY_JPG, "rb").read()
    px = MM.decode_jpeg(payload)
    assert px.shape == (16, 16, 3) and px.dtype == np.uint8
    assert px.std() > 20            # a real image, not a flat artifact
    # the Python logo: contains strongly blue and strongly yellow pixels
    r = px[..., 0].astype(int)
    g = px[..., 1].astype(int)
    b = px[..., 2].astype(int)
    assert (b - r).max() > 40       # blue region
    assert ((r + g) // 2 - b).max() > 40   # yellow region
    # regression pin: decode is deterministic
    px2 = MM.decode_image(payload)
    np.testing.assert_array_equal(px, px2)


def test_progressive_rejected():
    payload = open("/usr/share/doc/nodejs/thin-white-stripe.jpg",
                   "rb").read()
    with pytest.raises(NotImplementedError):
        MM.decode_jpeg(payload)


def test_feature_extraction_over_jpeg(spark):
    img = _gradient()
    payload = encode_jpeg(img)
    df = spark.createDataFrame(
        [(1, "image", "image/jpeg", 40, 24, 0, bytearray(payload))],
        MM.MEDIA_SCHEMA)
    feats = MM.extract_image_features(df, dim=16).collect()
    assert len(feats) == 1 and len(feats[0]["feature"]) == 16
    want = MM.image_feature_vector(MM.decode_jpeg(payload), dim=16)
    np.testing.assert_allclose(feats[0]["feature"], want, rtol=1e-6)
