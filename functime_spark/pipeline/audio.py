"""Audio feature extraction over binary payload columns — numpy-only
spectral analysis (framed Hann/rFFT) + MFCCs, run as an Arrow-batched
``mapInPandas`` operator over the multimodal decoder seam.

The per-clip features are the standard content-analysis set a training
-data pipeline filters/clusters on: duration, RMS level, zero-crossing
rate, spectral centroid / bandwidth / rolloff / flatness, and `n_mfcc`
mel-frequency cepstral coefficients (mel filterbank -> log -> DCT-II),
all deterministic numpy so tests pin them against closed-form signals
(a pure tone's centroid is its frequency; white noise's flatness ~ 1).

At scale this is one narrow mapInPandas pass: payloads decode inside
the Arrow batch, nothing shuffles, and the output is one row per clip
— the same shape as extract_features_media (multimodal.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StructField,
    StructType,
)


def _to_mono_float(arr: np.ndarray, channels: int) -> np.ndarray:
    """Interleaved PCM -> mono float64 in [-1, 1]."""
    x = np.asarray(arr)
    if x.dtype == np.uint8:  # 8-bit WAV is unsigned
        x = (x.astype(np.float64) - 128.0) / 128.0
    elif x.dtype.kind == "i":
        x = x.astype(np.float64) / float(1 << (8 * x.dtype.itemsize - 1))
    else:
        x = x.astype(np.float64)
    if channels > 1:
        n = len(x) // channels * channels
        x = x[:n].reshape(-1, channels).mean(axis=1)
    return x


def _mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_inv(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def _mel_filterbank(n_mels: int, n_fft: int, rate: int) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular filters, 0 .. rate/2."""
    pts = _mel_inv(np.linspace(_mel(0.0), _mel(rate / 2.0), n_mels + 2))
    bins = np.floor((n_fft + 1) * pts / rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        lo, mid, hi = bins[i], bins[i + 1], bins[i + 2]
        for k in range(lo, mid):
            if mid > lo:
                fb[i, k] = (k - lo) / (mid - lo)
        for k in range(mid, hi):
            if hi > mid:
                fb[i, k] = (hi - k) / (hi - mid)
    return fb


def audio_features_from_signal(
    arr: np.ndarray,
    rate: int,
    channels: int = 1,
    n_mfcc: int = 13,
    n_mels: int = 26,
    n_fft: int = 512,
    hop: int = 256,
) -> dict:
    """The per-clip feature dict from a raw PCM array — the numpy
    ground-truth kernel the Spark operator batches over."""
    x = _to_mono_float(arr, channels)
    n = len(x)
    if n == 0:
        raise ValueError("empty audio signal")
    duration = n / float(rate)
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) \
        if n > 1 else 0.0

    if n < n_fft:  # zero-pad one frame
        x = np.pad(x, (0, n_fft - n))
        n = n_fft
    win = np.hanning(n_fft)
    starts = range(0, n - n_fft + 1, hop)
    spec = np.stack([
        np.abs(np.fft.rfft(x[s:s + n_fft] * win)) for s in starts
    ])  # (frames, n_fft//2+1)
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / rate)
    power = spec**2
    tot = power.sum(axis=1) + 1e-12

    centroid = float(np.mean((power * freqs).sum(axis=1) / tot))
    bw = float(np.mean(np.sqrt(
        (power * (freqs - ((power * freqs).sum(axis=1) / tot)[:, None]) ** 2)
        .sum(axis=1) / tot
    )))
    cum = np.cumsum(power, axis=1)
    roll_idx = (cum >= 0.85 * cum[:, -1:]).argmax(axis=1)
    rolloff = float(np.mean(freqs[roll_idx]))
    flat = float(np.mean(
        np.exp(np.mean(np.log(power + 1e-12), axis=1))
        / (np.mean(power, axis=1) + 1e-12)
    ))

    fb = _mel_filterbank(n_mels, n_fft, rate)
    mel_e = np.log(power @ fb.T + 1e-10)  # (frames, n_mels)
    # orthonormal DCT-II over the mel axis
    k = np.arange(n_mels)
    dct = np.cos(np.pi * np.outer(np.arange(n_mfcc), 2 * k + 1) / (2 * n_mels))
    dct *= np.sqrt(2.0 / n_mels)
    dct[0] /= np.sqrt(2.0)
    mfcc = (mel_e @ dct.T).mean(axis=0)

    return {
        "duration_s": duration,
        "rms": rms,
        "zero_crossing_rate": zcr,
        "spectral_centroid_hz": centroid,
        "spectral_bandwidth_hz": bw,
        "spectral_rolloff_hz": rolloff,
        "spectral_flatness": flat,
        "mfcc": [float(v) for v in mfcc],
    }


def extract_audio_features(
    media: DataFrame,
    decoder="wav",
    n_mfcc: int = 13,
    n_mels: int = 26,
    n_fft: int = 512,
    hop: int = 256,
) -> DataFrame:
    """One row of spectral features + MFCCs per clip, decoded through
    the multimodal decoder seam (default: the stdlib WAV codec; any
    registered/callable decoder returning {"array", "rate",
    "channels"} rides the same path)."""
    from functime_spark.pipeline.multimodal import _resolve_decoder

    fn = _resolve_decoder(decoder)
    if fn is None:
        raise ValueError("extract_audio_features needs a real decoder")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:  # keep the schema contract on empty batches
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = fn(bytes(payload))
                f = audio_features_from_signal(
                    d["array"], int(d["rate"]),
                    channels=int(d.get("channels", 1)),
                    n_mfcc=n_mfcc, n_mels=n_mels, n_fft=n_fft, hop=hop,
                )
                f["media_id"] = mid
                rows.append(f)
            yield pd.DataFrame(rows)

    schema = StructType([
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossing_rate", DoubleType()),
        StructField("spectral_centroid_hz", DoubleType()),
        StructField("spectral_bandwidth_hz", DoubleType()),
        StructField("spectral_rolloff_hz", DoubleType()),
        StructField("spectral_flatness", DoubleType()),
        StructField("mfcc", ArrayType(FloatType())),
        StructField("media_id", LongType()),
    ])
    out = media.mapInPandas(run, schema=schema)
    return out.select(
        "media_id", "duration_s", "rms", "zero_crossing_rate",
        "spectral_centroid_hz", "spectral_bandwidth_hz",
        "spectral_rolloff_hz", "spectral_flatness", "mfcc",
    )
