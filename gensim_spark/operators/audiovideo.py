"""Audio/video columns: REAL pure-python codecs + Arrow-batched extraction.

Complements ``multimodal.py`` (images): this module makes the audio and
video legs of the media contract real for the formats that are decodable
without native libraries —

- **WAV / RIFF**: PCM 8-bit unsigned, 16/24/32-bit signed little-endian,
  and IEEE float32/float64, mono or multi-channel, including
  WAVE_FORMAT_EXTENSIBLE headers. Decode AND encode (tests round-trip).
- **Y4M / YUV4MPEG2**: the standard uncompressed video interchange format
  (ffmpeg's ``-f yuv4mpeg``). C420/C420jpeg/C420paldv, C422, C444 and
  Cmono colorspaces. Frames are fixed-size, so sampling frame *i* is a
  header parse + one ``seek`` — decode touches only the sampled frames.

Compressed formats (MP3/AAC/Opus, H.264/VP9/AV1) still require an injected
decoder (ffmpeg at deploy time) and raise ``NotImplementedError``.

Features are deterministic numpy (RMS energy, zero-crossing rate, peak,
spectral centroid/rolloff/bandwidth via rFFT, octave-band energies), so
the same media always yields the same vector on any executor.

Scale notes: same as images — media rows are large; keep
``spark.sql.files.maxPartitionBytes`` small for media tables and bound
``spark.sql.execution.arrow.maxRecordsPerBatch``. All extraction is
iterator-form ``mapInPandas`` (one task streams Arrow batches). Frame
sampling emits one row per sampled frame (explode shape) but decodes ONLY
those frames thanks to Y4M's fixed frame stride.

Reference parity: gensim has no media surface; this implements the
training-data-pipeline multimodal contract (decode / feature-extract /
frame-sample) over opaque binary columns.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .multimodal import FEATURE_SCHEMA, image_feature_vector

# --- WAV / RIFF ---------------------------------------------------------------

_WAVE_PCM = 1
_WAVE_FLOAT = 3
_WAVE_EXTENSIBLE = 0xFFFE


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE → (samples, sample_rate). ``samples`` is float64 in
    [-1, 1), shape (n_frames, n_channels). Supports PCM u8 / s16 / s24 /
    s32 and IEEE float32/float64, plus WAVE_FORMAT_EXTENSIBLE wrappers."""
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(b)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = b[pos:pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_format == _WAVE_EXTENSIBLE:
        # the real format is the first 2 bytes of the SubFormat GUID
        if len(fmt) < 26:
            raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        (audio_format,) = struct.unpack_from("<H", fmt, 24)
    if channels < 1 or rate < 1:
        raise ValueError("invalid WAV channel count / sample rate")
    if audio_format == _WAVE_PCM:
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data[: len(data) - len(data) % 3], dtype=np.uint8)
            raw = raw.reshape(-1, 3)
            v = (raw[:, 0].astype(np.int64)
                 | raw[:, 1].astype(np.int64) << 8
                 | raw[:, 2].astype(np.int64) << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(1 << 31)
        else:
            raise NotImplementedError(f"PCM bit depth {bits} needs an injected decoder")
    elif audio_format == _WAVE_FLOAT:
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"IEEE-float WAV with {bits} bits")
    else:
        raise NotImplementedError(
            f"WAV audio format 0x{audio_format:04x} (compressed?) needs an "
            "injected decoder"
        )
    n = (x.size // channels) * channels
    return x[:n].reshape(-1, channels), int(rate)


def encode_wav(samples: np.ndarray, rate: int, sampwidth: int = 2) -> bytes:
    """(n_frames, n_channels) float in [-1, 1] (or int16 for sampwidth=2)
    → RIFF/WAVE bytes. sampwidth 1 (u8), 2 (s16), 4 (f32). Quantization is
    floor(x*full_scale + 0.5) — symmetric, engine-independent."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    if sampwidth == 2:
        if np.issubdtype(arr.dtype, np.integer):
            q = arr.astype("<i2")
        else:
            q = np.clip(np.floor(arr * 32767.0 + 0.5), -32768, 32767).astype("<i2")
        data, fmt_code, bits = q.tobytes(), _WAVE_PCM, 16
    elif sampwidth == 1:
        q = np.clip(np.floor(arr * 127.0 + 0.5) + 128, 0, 255).astype(np.uint8)
        data, fmt_code, bits = q.tobytes(), _WAVE_PCM, 8
    elif sampwidth == 4:
        data, fmt_code, bits = arr.astype("<f4").tobytes(), _WAVE_FLOAT, 32
    else:
        raise ValueError("sampwidth must be 1, 2 or 4")
    block = channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", fmt_code, channels, rate, rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def audio_feature_vector(samples: np.ndarray, rate: int, dim: int = 16) -> np.ndarray:
    """Deterministic per-clip features from REAL samples: [duration_s,
    n_channels, rate_khz, rms, zero-crossing rate, peak, spectral
    centroid/rolloff85/bandwidth (fractions of Nyquist), 6 octave-band
    energy fractions (rFFT)] → dim (pad/truncate)."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else np.asarray(samples, float)
    n = mono.size
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    rms = float(np.sqrt(np.mean(mono * mono)))
    zcr = float(np.count_nonzero(mono[1:] * mono[:-1] < 0)) / max(n - 1, 1)
    peak = float(np.abs(mono).max())
    spec = np.abs(np.fft.rfft(mono))
    power = spec * spec
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    ptot = float(power.sum())
    nyq = rate / 2.0
    if ptot > 0:
        centroid = float((freqs * power).sum()) / ptot / nyq
        cum = np.cumsum(power)
        rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * ptot))]) / nyq
        mu = centroid * nyq
        bandwidth = float(np.sqrt(((freqs - mu) ** 2 * power).sum() / ptot)) / nyq
        # 6 octave bands below Nyquist: [nyq/64..nyq/32), ... [nyq/2..nyq]
        edges = nyq / (2.0 ** np.arange(6, -1, -1))
        band = np.histogram(freqs, bins=np.concatenate(([0.0], edges)),
                            weights=power)[0][1:] / ptot
    else:
        centroid = rolloff = bandwidth = 0.0
        band = np.zeros(6)
    chans = samples.shape[1] if samples.ndim == 2 else 1
    feats = np.array([n / rate, chans, rate / 1000.0, rms, zcr, peak,
                      centroid, rolloff, bandwidth, *band], dtype=np.float32)
    if feats.size < dim:
        feats = np.pad(feats, (0, dim - feats.size))
    return feats[:dim]


# --- Y4M / YUV4MPEG2 ----------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"
# colorspace → (x chroma divisor, y chroma divisor); None = no chroma planes
_Y4M_CHROMA = {
    "C420": (2, 2), "C420jpeg": (2, 2), "C420paldv": (2, 2), "C420mpeg2": (2, 2),
    "C422": (2, 1), "C444": (1, 1), "Cmono": None,
}


class Y4MInfo:
    """Parsed YUV4MPEG2 stream header + frame geometry (fixed stride)."""

    __slots__ = ("width", "height", "fps_num", "fps_den", "colorspace",
                 "header_end", "frame_bytes", "n_frames", "_payload_len")

    def __init__(self, payload: bytes):
        b = bytes(payload)
        nl = b.find(b"\n")
        if not b.startswith(_Y4M_MAGIC) or nl < 0:
            raise ValueError("not a YUV4MPEG2 payload")
        self.width = self.height = 0
        self.fps_num, self.fps_den = 30, 1
        self.colorspace = "C420"
        for tok in b[len(_Y4M_MAGIC):nl].split():
            t = tok.decode("ascii")
            if t[0] == "W":
                self.width = int(t[1:])
            elif t[0] == "H":
                self.height = int(t[1:])
            elif t[0] == "F":
                num, den = t[1:].split(":")
                self.fps_num, self.fps_den = int(num), int(den)
            elif t[0] == "C":
                self.colorspace = t
        if self.width < 1 or self.height < 1:
            raise ValueError("Y4M header missing W/H")
        if self.colorspace not in _Y4M_CHROMA:
            raise NotImplementedError(
                f"Y4M colorspace {self.colorspace} needs an injected decoder")
        sub = _Y4M_CHROMA[self.colorspace]
        ysz = self.width * self.height
        csz = 0 if sub is None else 2 * ((self.width // sub[0]) * (self.height // sub[1]))
        self.header_end = nl + 1
        # every frame: b"FRAME" [params] b"\n" + planes; we require the
        # fixed-parameter form (no per-frame params), which is what ffmpeg
        # and mjpegtools emit — that makes frame i a pure seek.
        self.frame_bytes = 6 + ysz + csz
        self._payload_len = len(b)
        self.n_frames = (len(b) - self.header_end) // self.frame_bytes

    @property
    def duration_ms(self) -> int:
        return int(self.n_frames * 1000 * self.fps_den // self.fps_num)


def y4m_info(payload: bytes) -> Y4MInfo:
    return Y4MInfo(payload)


def y4m_frame(payload: bytes, idx: int, info: Y4MInfo | None = None):
    """Return frame ``idx`` as raw planes ``(y, cb, cr)`` — uint8 arrays,
    Y shape (h, w); cb/cr ``None`` for Cmono. Decodes ONLY this frame:
    header parse + one offset computation (fixed frame stride)."""
    b = bytes(payload)
    inf = info or Y4MInfo(b)
    if not 0 <= idx < inf.n_frames:
        raise IndexError(f"frame {idx} out of range (n_frames={inf.n_frames})")
    off = inf.header_end + idx * inf.frame_bytes
    if b[off:off + 5] != b"FRAME":
        raise ValueError("Y4M frame marker not at expected stride "
                         "(per-frame params are not supported)")
    off += 6
    w, h = inf.width, inf.height
    y = np.frombuffer(b, dtype=np.uint8, count=w * h, offset=off).reshape(h, w)
    sub = _Y4M_CHROMA[inf.colorspace]
    if sub is None:
        return y, None, None
    cw, ch = w // sub[0], h // sub[1]
    off += w * h
    cb = np.frombuffer(b, dtype=np.uint8, count=cw * ch, offset=off).reshape(ch, cw)
    off += cw * ch
    cr = np.frombuffer(b, dtype=np.uint8, count=cw * ch, offset=off).reshape(ch, cw)
    return y, cb, cr


def y4m_frame_rgb(payload: bytes, idx: int, info: Y4MInfo | None = None) -> np.ndarray:
    """Frame ``idx`` as RGB uint8 (h, w, 3) via BT.601 limited-range
    conversion (nearest-neighbor chroma upsampling). Cmono → gray replicated."""
    y, cb, cr = y4m_frame(payload, idx, info)
    yf = (y.astype(np.float64) - 16.0) * (255.0 / 219.0)
    if cb is None:
        g = np.clip(np.round(yf), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    h, w = y.shape
    # index-mapped nearest upsampling (np.kron would come up one row/col
    # short for odd luma dimensions: C420 chroma is (h//2, w//2))
    ys = np.minimum(np.arange(h) * cb.shape[0] // h, cb.shape[0] - 1)
    xs = np.minimum(np.arange(w) * cb.shape[1] // w, cb.shape[1] - 1)
    cbf = (cb.astype(np.float64)[ys][:, xs] - 128.0) * (255.0 / 224.0)
    crf = (cr.astype(np.float64)[ys][:, xs] - 128.0) * (255.0 / 224.0)
    rgb = np.stack([yf + 1.402 * crf,
                    yf - 0.344136 * cbf - 0.714136 * crf,
                    yf + 1.772 * cbf], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def encode_y4m(frames, fps=(30, 1), colorspace: str = "C444") -> bytes:
    """Frames → YUV4MPEG2 bytes. For C444/C422/C420* each frame is RGB
    uint8 (h, w, 3), converted with BT.601 limited range (chroma box-
    averaged for subsampled modes); for Cmono each frame is a raw luma
    plane (h, w) written verbatim — the exact-roundtrip path."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    if colorspace not in _Y4M_CHROMA:
        raise NotImplementedError(f"Y4M colorspace {colorspace}")
    h, w = frames[0].shape[:2]
    head = (f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 "
            f"{colorspace}\n").encode("ascii")
    out = [head]
    sub = _Y4M_CHROMA[colorspace]
    for f in frames:
        out.append(b"FRAME\n")
        if sub is None:
            if f.ndim != 2:
                raise ValueError("Cmono frames must be 2-D luma planes")
            out.append(f.astype(np.uint8).tobytes())
            continue
        r, g, b = (f[:, :, i].astype(np.float64) for i in range(3))
        y = 16.0 + (65.738 * r + 129.057 * g + 25.064 * b) / 256.0
        cb = 128.0 + (-37.945 * r - 74.494 * g + 112.439 * b) / 256.0
        cr = 128.0 + (112.439 * r - 94.154 * g - 18.285 * b) / 256.0
        sx, sy = sub
        if sx > 1 or sy > 1:
            cb = cb[:h - h % sy, :w - w % sx].reshape(h // sy, sy, w // sx, sx).mean(axis=(1, 3))
            cr = cr[:h - h % sy, :w - w % sx].reshape(h // sy, sy, w // sx, sx).mean(axis=(1, 3))
        for plane in (y, cb, cr):
            out.append(np.clip(np.round(plane), 0, 255).astype(np.uint8).tobytes())
    return b"".join(out)


# --- Spark-side extraction (Arrow-batched) ------------------------------------


def extract_audio_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """REAL audio path: decode WAV payloads and compute per-clip features;
    one iterator-form mapInPandas stage. Output: FEATURE_SCHEMA."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p in pdf["payload"]:
                if p is None:
                    feats.append(None)
                    continue
                samples, rate = decode_wav(bytes(p))
                feats.append(audio_feature_vector(samples, rate, dim).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                "feature": feats,
            })

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


# --- spectrograms (STFT + log-mel) --------------------------------------------


def stft_power(mono: np.ndarray, n_fft: int = 400, hop: int = 160) -> np.ndarray:
    """Power spectrogram of a mono signal: frame with a periodic Hann
    window (w[i] = 0.5 − 0.5·cos(2πi/N)), rFFT per frame, |X|².
    Shape (n_frames, n_fft//2 + 1); n_frames = 1 + (n − n_fft)//hop
    (no padding — trailing partial frame dropped). Vectorized numpy."""
    x = np.asarray(mono, dtype=np.float64)
    if x.size < n_fft:
        return np.zeros((0, n_fft // 2 + 1))
    n_frames = 1 + (x.size - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    spec = np.fft.rfft(frames, axis=1)
    return (spec.real ** 2 + spec.imag ** 2)


def hz_to_mel(f):
    """HTK mel scale: 2595·log10(1 + f/700)."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(n_mels: int, n_fft: int, rate: int,
                   fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """Triangular mel filterbank (HTK scale), shape (n_mels, n_fft//2+1):
    n_mels+2 mel-equally-spaced edge frequencies, each filter a triangle
    rising from edge k to k+1 and falling to k+2 over the rFFT bin grid."""
    fmax = fmax if fmax is not None else rate / 2.0
    edges = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / rate)
    lo, ctr, hi = edges[:-2, None], edges[1:-1, None], edges[2:, None]
    up = (freqs[None, :] - lo) / np.maximum(ctr - lo, 1e-12)
    down = (hi - freqs[None, :]) / np.maximum(hi - ctr, 1e-12)
    return np.clip(np.minimum(up, down), 0.0, None)


def log_mel_spectrogram(samples: np.ndarray, rate: int, n_fft: int = 400,
                        hop: int = 160, n_mels: int = 26,
                        floor: float = 1e-10) -> np.ndarray:
    """(n_frames, n_mels) log10 mel-band energies of the channel-mean
    signal — the standard training-pipeline audio representation."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else np.asarray(samples)
    power = stft_power(mono, n_fft=n_fft, hop=hop)
    fb = mel_filterbank(n_mels, n_fft, rate)
    return np.log10(np.maximum(power @ fb.T, floor))


MEL_SCHEMA = "media_id long, n_frames int, n_mels int, mel_mean array<float>"


def extract_log_mel(media: DataFrame, n_fft: int = 400, hop: int = 160,
                    n_mels: int = 26) -> DataFrame:
    """Per-clip time-mean log-mel vector from REAL WAV decode (one
    Arrow-batched mapInPandas stage): (media_id, n_frames, n_mels,
    mel_mean float[n_mels])."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("media_id", "n_frames", "n_mels",
                                    "mel_mean")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                samples, rate = decode_wav(bytes(p))
                lm = log_mel_spectrogram(samples, rate, n_fft, hop, n_mels)
                rows["media_id"].append(mid)
                rows["n_frames"].append(lm.shape[0])
                rows["n_mels"].append(n_mels)
                rows["mel_mean"].append(
                    lm.mean(axis=0).astype(np.float32).tolist()
                    if lm.size else [0.0] * n_mels)
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=MEL_SCHEMA)


SPECTROGRAM_SCHEMA = ("media_id long, frame int, bin int, power double")


def audio_spectrogram_frames(media: DataFrame, n_fft: int = 64,
                             hop: int = 256) -> DataFrame:
    """Long-form STFT power rows (media_id, frame, bin, power) from REAL
    WAV decode — the relational face of the spectrogram (and the
    oracle-checkable one: Hann windowing + DFT are trig sums a SQL engine
    can recompute exactly)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("media_id", "frame", "bin", "power")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                samples, _rate = decode_wav(bytes(p))
                mono = samples.mean(axis=1)
                pw = stft_power(mono, n_fft=n_fft, hop=hop)
                nf, nb = pw.shape
                rows["media_id"].extend([mid] * (nf * nb))
                rows["frame"].extend(np.repeat(np.arange(nf), nb).tolist())
                rows["bin"].extend(np.tile(np.arange(nb), nf).tolist())
                rows["power"].extend(pw.ravel().tolist())
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=SPECTROGRAM_SCHEMA)


AUDIO_STATS_SCHEMA = ("media_id long, rate int, n_samples long, duration_s"
                      " double, rms double, zcr double, peak double")


def audio_stats(media: DataFrame) -> DataFrame:
    """Exact float64 per-clip statistics from REAL WAV decode (rms /
    zero-crossing rate / peak over the channel-mean signal) — the
    oracle-comparable companion to :func:`extract_audio_features`'s
    float32 feature vector. One iterator-form mapInPandas stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("media_id", "rate", "n_samples",
                                    "duration_s", "rms", "zcr", "peak")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                samples, rate = decode_wav(bytes(p))
                mono = samples.mean(axis=1)
                n = mono.size
                rows["media_id"].append(mid)
                rows["rate"].append(rate)
                rows["n_samples"].append(n)
                rows["duration_s"].append(n / rate)
                rows["rms"].append(float(np.sqrt(np.mean(mono * mono))) if n else 0.0)
                rows["zcr"].append(
                    float(np.count_nonzero(mono[1:] * mono[:-1] < 0)) / max(n - 1, 1))
                rows["peak"].append(float(np.abs(mono).max()) if n else 0.0)
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=AUDIO_STATS_SCHEMA)


FRAME_SCHEMA = ("media_id long, frame_idx int, ts_ms long, width int,"
                " height int, brightness double, feature array<float>")


def sample_video_frames(media: DataFrame, every_ms: int = 1000,
                        dim: int = 16) -> DataFrame:
    """REAL video frame sampling: one output row per sampled timestamp
    (ts = 0, every_ms, … < duration), decoding ONLY the sampled frames
    (Y4M fixed stride → header parse + seek per frame, not a full-stream
    decode). ``brightness`` is the mean raw luma of the frame;
    ``feature`` the image feature vector of the BT.601 RGB conversion.
    frame_idx = floor(ts_ms * fps / 1000), the frame on screen at ts."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("media_id", "frame_idx", "ts_ms", "width",
                                    "height", "brightness", "feature")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                b = bytes(p)
                inf = Y4MInfo(b)
                dur = inf.duration_ms
                ts = 0
                while ts < dur or (ts == 0 and inf.n_frames > 0):
                    fi = min(ts * inf.fps_num // (1000 * inf.fps_den),
                             inf.n_frames - 1)
                    y, _, _ = y4m_frame(b, int(fi), inf)
                    rgb = y4m_frame_rgb(b, int(fi), inf)
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(int(fi))
                    rows["ts_ms"].append(ts)
                    rows["width"].append(inf.width)
                    rows["height"].append(inf.height)
                    rows["brightness"].append(float(y.mean()))
                    rows["feature"].append(
                        image_feature_vector(rgb, dim).tolist())
                    ts += every_ms
            yield pd.DataFrame(rows)

    return (media.filter(F.col("kind") == "video")
            .mapInPandas(batches, schema=FRAME_SCHEMA))


def extract_media_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Unified REAL path over a mixed media table: images through the
    PNM/BMP/PNG/JPEG codecs, audio through the WAV codec, video through
    the Y4M codec (feature = first-frame image features). One
    iterator-form mapInPandas stage; unknown kinds yield a null feature."""
    from .multimodal import decode_image, image_feature_vector as _ifv

    def one(kind: str, p: bytes, dim: int):
        if kind == "image":
            return _ifv(decode_image(p), dim).tolist()
        if kind == "audio":
            samples, rate = decode_wav(p)
            return audio_feature_vector(samples, rate, dim).tolist()
        if kind == "video":
            return _ifv(y4m_frame_rgb(p, 0), dim).tolist()
        return None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [one(k, bytes(p), dim) if p is not None else None
                     for k, p in zip(pdf["kind"], pdf["payload"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                "feature": feats,
            })

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


# --- deterministic synthesis (tests / oracle entries) --------------------------
#
# Integer waveforms and integer pixel formulas: exactly reproducible in
# ANSI SQL, so a DuckDB oracle can recompute analytically what Spark
# obtains by DECODING REAL RIFF/Y4M BYTES — the oracle then verifies the
# whole encode→decode roundtrip, not just the aggregation tail.


def synth_audio_params(m: int) -> tuple[int, int, int, int]:
    """(rate, n_samples, period, amplitude) for synthetic clip m."""
    return 8000 + 250 * m, 1500 + 37 * m, 40 + 3 * m, 15000 + 500 * m


def synth_audio_int16(m: int) -> tuple[np.ndarray, int]:
    """Sawtooth clip m as int16: v[i] = ((i % p) * 2a) // p - a.
    Pure integer arithmetic — bit-reproducible in SQL."""
    rate, n, p, a = synth_audio_params(m)
    i = np.arange(n, dtype=np.int64)
    v = ((i % p) * 2 * a) // p - a
    return v.astype(np.int16), rate


def make_audio_media(spark, n: int = 24) -> DataFrame:
    """Media table of n REAL WAV payloads (PCM16) from the integer
    sawtooth synth, matching multimodal.MEDIA_SCHEMA."""
    from .multimodal import MEDIA_SCHEMA

    rows = []
    for m in range(n):
        v, rate = synth_audio_int16(m)
        payload = encode_wav(v, rate, sampwidth=2)
        rows.append((m, "audio", "audio/wav", 0, 0,
                     int(v.size * 1000 // rate), bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_video_params(m: int) -> tuple[int, int, int]:
    """(width, height, n_frames) for synthetic video m (Cmono, 10 fps)."""
    return 24 + m, 16 + (m % 5), 12 + m


def synth_video_luma(m: int, f: int) -> np.ndarray:
    """Frame f of video m: pixel(y, x) = (17f + 5y + 3x + m) % 240 + 8 —
    pure integer, bit-reproducible in SQL."""
    w, h, _ = synth_video_params(m)
    yy, xx = np.mgrid[0:h, 0:w]
    return ((17 * f + 5 * yy + 3 * xx + m) % 240 + 8).astype(np.uint8)


def make_video_media(spark, n: int = 12) -> DataFrame:
    """Media table of n REAL Y4M payloads (Cmono, 10 fps) from the integer
    pixel synth, matching multimodal.MEDIA_SCHEMA."""
    from .multimodal import MEDIA_SCHEMA

    rows = []
    for m in range(n):
        w, h, nf = synth_video_params(m)
        payload = encode_y4m([synth_video_luma(m, f) for f in range(nf)],
                             fps=(10, 1), colorspace="Cmono")
        rows.append((m, "video", "video/x-yuv4mpeg", w, h,
                     int(nf * 100), bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def make_mixed_media(spark, n_images: int = 64, n_audio: int = 64,
                     n_video: int = 16, image_hw=(32, 32)) -> DataFrame:
    """Mixed media table of REAL payloads (PNG images + WAV audio + Y4M
    video) from the deterministic synths — bench/test input for
    :func:`extract_media_features`."""
    from .multimodal import MEDIA_SCHEMA, encode_png

    rows, mid = [], 0
    h, w = image_hw
    for i in range(n_images):
        px = ((np.arange(h * w * 3).reshape(h, w, 3) * (i + 1)) % 251
              ).astype(np.uint8)
        rows.append((mid, "image", "image/png", w, h, 0,
                     bytearray(encode_png(px))))
        mid += 1
    for i in range(n_audio):
        v, rate = synth_audio_int16(i % 32)
        rows.append((mid, "audio", "audio/wav", 0, 0,
                     int(v.size * 1000 // rate),
                     bytearray(encode_wav(v, rate))))
        mid += 1
    for i in range(n_video):
        m = i % 12
        vw, vh, nf = synth_video_params(m)
        payload = encode_y4m([synth_video_luma(m, f) for f in range(nf)],
                             fps=(10, 1), colorspace="Cmono")
        rows.append((mid, "video", "video/x-yuv4mpeg", vw, vh,
                     int(nf * 100), bytearray(payload)))
        mid += 1
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def make_mixed_media_dist(spark, n_images: int = 0, n_audio: int = 0,
                          n_video: int = 0, partitions: int = 64) -> DataFrame:
    """Distributed REAL-media synthesis at size: payload bytes are encoded
    EXECUTOR-side (mapInPandas over a range), so the table never passes
    through the driver — the generator for scale evidence. media_id layout:
    [0, n_images) images, then audio, then video; each row's content is a
    pure function of media_id (same synths as the small makers, audio
    params cycled mod 32, video mod 12)."""
    from .multimodal import MEDIA_SCHEMA, encode_png

    total = n_images + n_audio + n_video
    # hash-repartition the id range BEFORE encoding (an 8-byte-row shuffle)
    # so every task — and hence every output file — carries a uniform mix
    # of kinds; with a contiguous layout all videos land in the tail files
    # and any kind-filtered stage (e.g. frame sampling) degenerates to 1-2
    # busy scan tasks regardless of cluster width (measured: flat 12 s at
    # 2 AND 8 cores)
    base = spark.range(0, total, 1, partitions).repartition(partitions, "id")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in ("media_id", "kind", "mime", "width",
                                    "height", "duration_ms", "payload")}
            for mid in pdf["id"]:
                mid = int(mid)
                if mid < n_images:
                    i = mid
                    h = 16 + (i % 17)
                    w = 16 + ((i * 3) % 23)
                    px = ((np.arange(h * w * 3).reshape(h, w, 3)
                           * (i % 97 + 1)) % 251).astype(np.uint8)
                    row = ("image", "image/png", w, h, 0, encode_png(px))
                elif mid < n_images + n_audio:
                    v, rate = synth_audio_int16((mid - n_images) % 32)
                    row = ("audio", "audio/wav", 0, 0,
                           int(v.size * 1000 // rate), encode_wav(v, rate))
                else:
                    m = (mid - n_images - n_audio) % 12
                    w, h, nf = synth_video_params(m)
                    payload = encode_y4m(
                        [synth_video_luma(m, f) for f in range(nf)],
                        fps=(10, 1), colorspace="Cmono")
                    row = ("video", "video/x-yuv4mpeg", w, h,
                           int(nf * 100), payload)
                rows["media_id"].append(mid)
                for k, val in zip(("kind", "mime", "width", "height",
                                   "duration_ms", "payload"), row):
                    rows[k].append(bytearray(val) if k == "payload" else val)
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)
