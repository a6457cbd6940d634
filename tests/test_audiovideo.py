"""WAV + Y4M codecs, audio/video feature extraction, image resize.

The WAV decoder is cross-checked against CPython's stdlib ``wave`` module
(an independent RIFF implementation) in both directions; Y4M against exact
Cmono roundtrips and BT.601 color tolerance; the Spark extraction stages
against driver-side numpy on the same payload bytes.
"""
import io
import struct
import wave

import numpy as np
import pytest

from gensim_spark.operators import audiovideo as AV
from gensim_spark.operators import multimodal as MM


# --- WAV codec ----------------------------------------------------------------

def test_wav_pcm16_roundtrip_exact():
    rng = np.random.default_rng(7)
    v = rng.integers(-32768, 32767, size=(500, 2), dtype=np.int64).astype(np.int16)
    payload = AV.encode_wav(v, 22050, sampwidth=2)
    samples, rate = AV.decode_wav(payload)
    assert rate == 22050 and samples.shape == (500, 2)
    assert np.array_equal(np.round(samples * 32768).astype(np.int16), v)


def test_wav_float32_roundtrip_exact():
    rng = np.random.default_rng(8)
    v = rng.uniform(-1, 1, size=(301, 1)).astype(np.float32)
    samples, rate = AV.decode_wav(AV.encode_wav(v, 48000, sampwidth=4))
    assert rate == 48000
    assert np.array_equal(samples.astype(np.float32), v)


def test_wav_u8_roundtrip_tolerance():
    t = np.linspace(0, 1, 400)
    v = 0.8 * np.sin(2 * np.pi * 5 * t)
    samples, rate = AV.decode_wav(AV.encode_wav(v, 8000, sampwidth=1))
    assert rate == 8000
    assert np.abs(samples[:, 0] - v).max() < 1 / 64


def test_wav_24bit_decode():
    # hand-build a 24-bit data chunk: values near the signed-24 extremes
    vals = [0, 1, -1, (1 << 23) - 1, -(1 << 23), 123456, -654321]
    data = b"".join(struct.pack("<i", v)[:3] for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 16000 * 3, 3, 24)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    samples, rate = AV.decode_wav(payload)
    assert rate == 16000
    got = np.round(samples[:, 0] * (1 << 23)).astype(np.int64)
    assert got.tolist() == vals


def test_wav_32bit_and_extensible_and_extra_chunks():
    vals = np.array([0, 1 << 30, -(1 << 30), (1 << 31) - 1], dtype="<i4")
    # WAVE_FORMAT_EXTENSIBLE: cbSize=22, wValidBits + dwChannelMask, then the
    # SubFormat GUID whose first 2 bytes carry the real format code (PCM=1)
    guid = struct.pack("<H", 1) + b"\x00\x00" + b"\x00\x00\x10\x00\x80\x00\x00\xAA\x00\x38\x9B\x71"
    fmt = (struct.pack("<HHIIHHH", 0xFFFE, 1, 44100, 44100 * 4, 4, 32, 22)
           + struct.pack("<HI", 32, 0x1) + guid)
    # odd-sized LIST chunk before fmt → exercises word-alignment padding
    body = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(vals.tobytes())) + vals.tobytes()
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    samples, rate = AV.decode_wav(payload)
    assert rate == 44100
    got = np.round(samples[:, 0] * (1 << 31)).astype(np.int64)
    assert got.tolist() == vals.astype(np.int64).tolist()


def test_wav_stdlib_cross_check_both_directions():
    # stdlib wave writes → our decoder reads (independent implementations)
    rng = np.random.default_rng(11)
    v = rng.integers(-30000, 30000, size=(257, 2), dtype=np.int64).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(11025)
        wf.writeframes(v.tobytes())
    samples, rate = AV.decode_wav(buf.getvalue())
    assert rate == 11025
    assert np.array_equal(np.round(samples * 32768).astype(np.int16), v)
    # our encoder writes → stdlib wave reads
    payload = AV.encode_wav(v, 11025, sampwidth=2)
    with wave.open(io.BytesIO(payload), "rb") as wf:
        assert wf.getnchannels() == 2
        assert wf.getframerate() == 11025
        back = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
    assert np.array_equal(back.reshape(-1, 2), v)


def test_wav_rejections():
    with pytest.raises(ValueError):
        AV.decode_wav(b"OggS" + b"\x00" * 40)
    fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 8000, 1, 16)  # MP3-in-WAV
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 2) + b"\x00\x00"
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(NotImplementedError):
        AV.decode_wav(payload)


# --- audio features -----------------------------------------------------------

def test_audio_features_sine_physics():
    rate, f = 8000, 400.0
    t = np.arange(8000) / rate
    v = 0.5 * np.sin(2 * np.pi * f * t)
    feats = AV.audio_feature_vector(v[:, None], rate, dim=16)
    dur, chans, khz, rms, zcr, peak, centroid, rolloff, bandwidth = feats[:9]
    assert dur == pytest.approx(1.0)
    assert chans == 1 and khz == pytest.approx(8.0)
    assert rms == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
    assert peak == pytest.approx(0.5, rel=1e-3)
    # a 400 Hz sine crosses zero 2*400 times/sec
    assert zcr == pytest.approx(2 * f / rate, rel=0.01)
    # spectral centroid sits at f (as a fraction of nyquist = 4000)
    assert centroid == pytest.approx(f / 4000.0, rel=0.01)
    assert bandwidth < 0.01
    # band energies sum to ~1 and concentrate in the band containing 400 Hz
    band = feats[9:15]
    assert float(band.sum()) == pytest.approx(1.0, abs=1e-3)
    # bands span [62.5,125,250,500,1000,2000,4000): 400 Hz falls in index 2
    assert band.argmax() == 2


def test_audio_features_edge_cases():
    assert np.array_equal(AV.audio_feature_vector(np.zeros((0, 1)), 8000),
                          np.zeros(16, dtype=np.float32))
    flat = AV.audio_feature_vector(np.full((100, 1), 0.25), 8000)
    assert flat[4] == 0.0  # no zero crossings
    assert flat[3] == pytest.approx(0.25)


# --- spectrograms -----------------------------------------------------------

def test_mel_scale_goldens():
    # the textbook anchor: 1000 Hz ≈ 1000 mel on the HTK scale
    assert AV.hz_to_mel(1000.0) == pytest.approx(1000.0, abs=0.1)
    assert AV.hz_to_mel(0.0) == 0.0
    for f in (55.0, 440.0, 3999.5):
        assert AV.mel_to_hz(AV.hz_to_mel(f)) == pytest.approx(f, rel=1e-12)


def test_stft_tone_concentrates_in_its_bin():
    rate, n_fft = 8000, 256
    k = 16  # tone exactly on bin 16 → 16 * 8000 / 256 = 500 Hz
    i = np.arange(4096)
    x = np.sin(2 * np.pi * k * i / n_fft)
    pw = AV.stft_power(x, n_fft=n_fft, hop=128)
    assert pw.shape == (1 + (4096 - 256) // 128, 129)
    assert np.all(pw.argmax(axis=1) == k)
    # windowed tone: nearly all energy within ±1 bin
    frac = pw[:, k - 1:k + 2].sum(axis=1) / pw.sum(axis=1)
    assert np.all(frac > 0.999)


def test_stft_edges():
    assert AV.stft_power(np.zeros(50), n_fft=64).shape == (0, 33)
    assert np.all(AV.stft_power(np.zeros(500), n_fft=64, hop=32) == 0.0)


def test_mel_filterbank_structure():
    fb = AV.mel_filterbank(10, 256, 8000)
    assert fb.shape == (10, 129)
    assert np.all(fb >= 0)
    # triangle centers strictly ascend in frequency
    centers = fb.argmax(axis=1)
    assert np.all(np.diff(centers) > 0)
    # interior coverage: every frequency between the first and last center
    # is seen by at least one filter
    mid = fb[:, centers[0]:centers[-1] + 1].max(axis=0)
    assert np.all(mid > 0)


def test_log_mel_tone_lands_in_expected_band():
    rate, n_fft, n_mels = 8000, 256, 12
    i = np.arange(8000)
    x = 0.4 * np.sin(2 * np.pi * 500.0 * i / rate)
    lm = AV.log_mel_spectrogram(x, rate, n_fft=n_fft, hop=128, n_mels=n_mels)
    fb = AV.mel_filterbank(n_mels, n_fft, rate)
    expected_band = int(fb[:, int(500.0 * n_fft / rate)].argmax())
    assert np.all(lm.argmax(axis=1) == expected_band)
    # silence floors at log10(1e-10)
    sil = AV.log_mel_spectrogram(np.zeros(2000), rate, n_fft=n_fft, hop=128)
    assert np.all(sil == -10.0)


def test_extract_log_mel_spark_matches_driver(spark):
    media = AV.make_audio_media(spark, n=4)
    rows = {r["media_id"]: r for r in extract_sorted(
        AV.extract_log_mel(media, n_fft=128, hop=64, n_mels=8))}
    for m in range(4):
        v, rate = AV.synth_audio_int16(m)
        want = AV.log_mel_spectrogram(
            v.astype(np.float64)[:, None] / 32768.0, rate,
            n_fft=128, hop=64, n_mels=8)
        assert rows[m]["n_frames"] == want.shape[0]
        got = np.array(rows[m]["mel_mean"], dtype=np.float32)
        assert np.allclose(got, want.mean(axis=0), rtol=1e-5), m


def test_audio_spectrogram_frames_matches_numpy(spark):
    media = AV.make_audio_media(spark, n=3)
    out = AV.audio_spectrogram_frames(media, n_fft=64, hop=256).collect()
    by = {}
    for r in out:
        by.setdefault(r["media_id"], {})[(r["frame"], r["bin"])] = r["power"]
    for m in range(3):
        v, _ = AV.synth_audio_int16(m)
        pw = AV.stft_power(v.astype(np.float64) / 32768.0, n_fft=64, hop=256)
        assert len(by[m]) == pw.size
        for (f, b), p in by[m].items():
            assert p == pytest.approx(pw[f, b], rel=1e-9, abs=1e-12)


# --- Y4M codec ------------------------------------------------------------

def test_y4m_cmono_roundtrip_exact():
    frames = [AV.synth_video_luma(3, f) for f in range(7)]
    payload = AV.encode_y4m(frames, fps=(10, 1), colorspace="Cmono")
    inf = AV.y4m_info(payload)
    assert (inf.width, inf.height) == (frames[0].shape[1], frames[0].shape[0])
    assert inf.n_frames == 7 and (inf.fps_num, inf.fps_den) == (10, 1)
    assert inf.duration_ms == 700
    for f in range(7):
        y, cb, cr = AV.y4m_frame(payload, f, inf)
        assert cb is None and cr is None
        assert np.array_equal(y, frames[f])
        rgb = AV.y4m_frame_rgb(payload, f, inf)
        assert rgb.shape == (*frames[f].shape, 3)


def test_y4m_c444_color_roundtrip_tolerance():
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8).astype(np.uint8)
              for _ in range(3)]
    payload = AV.encode_y4m(frames, fps=(25, 1), colorspace="C444")
    for f in range(3):
        rgb = AV.y4m_frame_rgb(payload, f)
        assert np.abs(rgb.astype(int) - frames[f].astype(int)).max() <= 3


def test_y4m_c420_shapes_and_flat_color():
    flat = np.full((8, 10, 3), [200, 40, 90], dtype=np.uint8)
    payload = AV.encode_y4m([flat], colorspace="C420")
    y, cb, cr = AV.y4m_frame(payload, 0)
    assert y.shape == (8, 10) and cb.shape == (4, 5) and cr.shape == (4, 5)
    rgb = AV.y4m_frame_rgb(payload, 0)
    assert np.abs(rgb.astype(int) - flat.astype(int)).max() <= 3


def test_y4m_c420_odd_dimensions():
    # odd luma dims: chroma planes are floor-halved; RGB conversion must
    # upsample back to the full (h, w) without falling a row/col short
    flat = np.full((7, 9, 3), [60, 180, 30], dtype=np.uint8)
    payload = AV.encode_y4m([flat], colorspace="C420")
    y, cb, cr = AV.y4m_frame(payload, 0)
    assert y.shape == (7, 9) and cb.shape == (3, 4)
    rgb = AV.y4m_frame_rgb(payload, 0)
    assert rgb.shape == (7, 9, 3)
    assert np.abs(rgb.astype(int) - flat.astype(int)).max() <= 3


def test_y4m_rejections_and_bounds():
    with pytest.raises(ValueError):
        AV.y4m_info(b"RIFFxxxxWAVE")
    payload = AV.encode_y4m([np.zeros((4, 4), np.uint8)], colorspace="Cmono")
    with pytest.raises(IndexError):
        AV.y4m_frame(payload, 1)
    bad = payload.replace(b"Cmono", b"C410 ")
    with pytest.raises(NotImplementedError):
        AV.y4m_info(bad)
    with pytest.raises(NotImplementedError):
        AV.encode_y4m([np.zeros((4, 4), np.uint8)], colorspace="C410")


# --- Spark-side extraction ------------------------------------------------

def test_extract_audio_features_spark_matches_driver(spark):
    media = AV.make_audio_media(spark, n=6)
    rows = {r["media_id"]: r for r in extract_sorted(AV.extract_audio_features(media))}
    assert len(rows) == 6
    for m in range(6):
        v, rate = AV.synth_audio_int16(m)
        expect = AV.audio_feature_vector(
            AV.decode_wav(AV.encode_wav(v, rate))[0], rate)
        got = np.array(rows[m]["feature"], dtype=np.float32)
        assert np.allclose(got, expect, rtol=1e-5), m


def extract_sorted(df):
    return sorted((r.asDict() for r in df.collect()), key=lambda r: r["media_id"])


def test_sample_video_frames_spark(spark):
    media = AV.make_video_media(spark, n=4)
    out = AV.sample_video_frames(media, every_ms=300).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    for m in range(4):
        w, h, nf = AV.synth_video_params(m)
        dur = nf * 100
        expect_ts = list(range(0, dur, 300))
        rows = sorted(by_media[m], key=lambda r: r["ts_ms"])
        assert [r["ts_ms"] for r in rows] == expect_ts
        for r in rows:
            assert r["frame_idx"] == r["ts_ms"] // 100
            assert (r["width"], r["height"]) == (w, h)
            assert r["brightness"] == pytest.approx(
                float(AV.synth_video_luma(m, r["frame_idx"]).mean()))
            assert len(r["feature"]) == 16


def test_extract_media_features_mixed_real(spark):
    img = MM.encode_png(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    aud = AV.encode_wav(AV.synth_audio_int16(2)[0], 8500)
    vid = AV.encode_y4m([AV.synth_video_luma(1, f) for f in range(3)],
                        colorspace="Cmono")
    media = spark.createDataFrame(
        [(0, "image", "image/png", 4, 4, 0, bytearray(img)),
         (1, "audio", "audio/wav", 0, 0, 0, bytearray(aud)),
         (2, "video", "video/x-yuv4mpeg", 25, 17, 300, bytearray(vid)),
         (3, "other", "application/x-unknown", 0, 0, 0, bytearray(b"xx"))],
        MM.MEDIA_SCHEMA)
    rows = {r["media_id"]: r for r in extract_sorted(AV.extract_media_features(media))}
    assert rows[0]["feature"] is not None and rows[0]["n_bytes"] == len(img)
    assert rows[1]["feature"] is not None
    # video feature == image features of frame 0's RGB conversion
    expect = MM.image_feature_vector(AV.y4m_frame_rgb(vid, 0), 16)
    assert np.allclose(np.array(rows[2]["feature"], dtype=np.float32), expect)
    assert rows[3]["feature"] is None


def test_make_mixed_media_dist_matches_driver_synth(spark):
    # executor-side generation must be a pure function of media_id that
    # reproduces the driver-side synths byte-for-byte
    df = AV.make_mixed_media_dist(spark, n_images=3, n_audio=4, n_video=2,
                                  partitions=3)
    rows = {r["media_id"]: r for r in df.collect()}
    assert len(rows) == 9
    assert [rows[i]["kind"] for i in range(9)] == (
        ["image"] * 3 + ["audio"] * 4 + ["video"] * 2)
    # audio payload identity vs the driver encoder
    for i in range(4):
        v, rate = AV.synth_audio_int16(i % 32)
        assert bytes(rows[3 + i]["payload"]) == AV.encode_wav(v, rate)
    # video payload identity
    w, h, nf = AV.synth_video_params(1)
    want = AV.encode_y4m([AV.synth_video_luma(1, f) for f in range(nf)],
                         fps=(10, 1), colorspace="Cmono")
    assert bytes(rows[8]["payload"]) == want
    assert (rows[8]["width"], rows[8]["height"]) == (w, h)
    # every image payload decodes to its declared dims
    import gensim_spark.operators.multimodal as mm
    for i in range(3):
        px = mm.decode_png(bytes(rows[i]["payload"]))
        assert px.shape == (rows[i]["height"], rows[i]["width"], 3)


# --- image resize ----------------------------------------------------------

def test_resize_nearest_exact_block_upscale():
    checker = np.array([[0, 255], [255, 0]], dtype=np.uint8)
    up = MM.resize_image(checker, 4, 4, method="nearest")
    expect = np.kron(checker, np.ones((2, 2), dtype=np.uint8))
    assert np.array_equal(up, expect)


def test_resize_bilinear_constant_and_identity():
    const = np.full((5, 7, 3), 123, dtype=np.uint8)
    out = MM.resize_image(const, 13, 3, method="bilinear")
    assert out.shape == (3, 13, 3) and np.all(out == 123)
    img = np.arange(36, dtype=np.uint8).reshape(6, 6)
    assert np.array_equal(MM.resize_image(img, 6, 6, method="bilinear"), img)


def test_resize_bilinear_hand_computed():
    # 1-D ramp [0, 100] widened 2×: pixel centers at src 0.0, 0.5, 1.0 …
    img = np.array([[0, 100]], dtype=np.uint8)
    out = MM.resize_image(img, 4, 1, method="bilinear").astype(int).ravel()
    # centers map to src x = -0.25, 0.25, 0.75, 1.25 → clip → 0, 25, 75, 100
    assert out.tolist() == [0, 25, 75, 100]


def test_resize_images_spark_roundtrip(spark):
    px = (np.arange(300, dtype=np.uint8).reshape(10, 10, 3) % 251)
    media = spark.createDataFrame(
        [(0, "image", "image/png", 10, 10, 0, bytearray(MM.encode_png(px))),
         (1, "audio", "audio/wav", 0, 0, 0,
          bytearray(AV.encode_wav(np.zeros(10, dtype=np.int16), 8000)))],
        MM.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in MM.resize_images(media, 5, 4).collect()}
    decoded = MM.decode_png(bytes(out[0]["payload"]))
    assert decoded.shape == (4, 5, 3)
    assert (out[0]["width"], out[0]["height"]) == (5, 4)
    expect = MM.resize_image(px, 5, 4, method="bilinear")
    assert np.array_equal(decoded, expect)
    # non-image rows pass through untouched
    assert bytes(out[1]["payload"]) == bytes(
        AV.encode_wav(np.zeros(10, dtype=np.int16), 8000))
