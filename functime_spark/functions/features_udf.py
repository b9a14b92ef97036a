"""UDF-tier feature extractors: sequential / numerical kernels.

The Spark analogue of the reference's Rust-plugin + eager-NumPy escape
hatches (SURVEY §2.9). Each kernel is a per-series numpy function; the
distribution strategy is `groupBy(entity).applyInPandas` — Arrow
batches, embarrassingly parallel across entities, one shuffle total
when fused via `extract_features_udf`.

All kernels are scipy-free (the container ships numpy only): Chebyshev
ball counts are brute-force O(n^2) per series (fine at per-entity
lengths; the cross-entity axis is what scales), Welch PSD and the
Ricker wavelet are re-derived from their definitions.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from functime_spark.panel import panel_cols

__all__ = [
    "UDF_FEATURES",
    "extract_features_udf",
    "cusum",
]


# ---------------------------------------------------------------------------
# numpy kernels (x: 1-D float64 array, time-ordered)
# ---------------------------------------------------------------------------


def _embed(x: np.ndarray, m: int) -> np.ndarray:
    """Sliding windows of length m: shape (n-m+1, m)."""
    n = len(x) - m + 1
    return np.lib.stride_tricks.sliding_window_view(x, m)[:n]


def _chebyshev_counts(mat: np.ndarray, r: float) -> np.ndarray:
    """#points within Chebyshev distance r of each row (incl. self)."""
    d = np.abs(mat[:, None, :] - mat[None, :, :]).max(axis=2)
    return (d <= r).sum(axis=1)


def approximate_entropy(
    x: np.ndarray, run_length: int = 2, filtering_level: float = 0.2, scale_by_std: bool = True
) -> float:
    """|phi_m - phi_{m+1}| with Chebyshev radius r. Ref
    feature_extractors.py:111-177."""
    if filtering_level <= 0:
        raise ValueError("filtering_level must be positive")
    r = filtering_level * x.std(ddof=1) if scale_by_std else filtering_level
    m = run_length
    if len(x) < m + 1:
        return 0.0
    data_m = _embed(x, m)[: len(x) - m + 1]
    phi_m = np.log(_chebyshev_counts(data_m, r) / len(data_m)).sum() / len(data_m)
    data_m1 = _embed(x, m + 1)
    phi_m1 = np.log(_chebyshev_counts(data_m1, r) / len(data_m1)).sum() / len(data_m1)
    return float(abs(phi_m - phi_m1))


def sample_entropy(x: np.ndarray, ratio: float = 0.2, m: int = 2) -> float:
    """ln(B/A) with Chebyshev radius ratio*std_pop. Ref :1478-1528."""
    if len(x) < m + 1:
        return float("nan")
    r = ratio * x.std(ddof=0)
    mat = _embed(x, m)
    b = _chebyshev_counts(mat, r).sum() - mat.shape[0]
    mat1 = _embed(x, m + 1)
    a = _chebyshev_counts(mat1, r).sum() - mat1.shape[0]
    if a == 0 or b == 0:
        return float("nan")
    return float(np.log(b / a))


def lempel_ziv_complexity(
    x: np.ndarray, threshold: float, as_ratio: bool = True
) -> float:
    """Distinct-substring count of the binarized series.

    Ref feature_extractors.py:918-953 + rust kernel
    src/feature_extraction/feature_extractor.rs:9-35 (same two-pointer
    hash-set scan)."""
    bits = (x > threshold).astype(np.uint8).tobytes()
    ind, inc = 0, 1
    subs = set()
    n = len(bits)
    while ind + inc <= n:
        sub = bits[ind : ind + inc]
        if sub in subs:
            inc += 1
        else:
            subs.add(sub)
            ind += inc
            inc = 1
    c = len(subs)
    return float(c / len(x)) if as_ratio else float(c)


def augmented_dickey_fuller(x: np.ndarray, n_lags: int = 1) -> float:
    """ADF t-statistic (no constant-model selection). Ref :184-228."""
    y = np.nan_to_num(x, nan=0.0)
    length = len(y) - n_lags - 1
    if length <= n_lags + 3:
        return float("nan")
    dy = np.diff(y)
    cols = [y[n_lags : n_lags + length]]
    for i in range(0, n_lags + 1):
        cols.append(dy[n_lags - i : n_lags - i + length])
    X = np.column_stack(cols[:1] + cols[2:] + [np.ones(length)])
    target = cols[1]
    coeffs, resids, *_ = np.linalg.lstsq(X, target, rcond=None)
    resid = target - X @ coeffs
    mse = (resid @ resid) / (length - X.shape[1])
    ys = X[:, 0] - X[:, 0].mean()
    stderr = math.sqrt(mse / (ys @ ys))
    return float(coeffs[0] / stderr)


def autoregressive_coefficients(x: np.ndarray, n_lags: int = 4) -> list:
    """AR(n) least-squares coefficients (+ intercept last). Ref :262-300."""
    y = np.nan_to_num(x, nan=0.0)
    length = len(y) - n_lags
    if length <= n_lags + 1:
        return [float("nan")] * (n_lags + 1)
    X = np.column_stack(
        [y[n_lags - i : n_lags - i + length] for i in range(1, n_lags + 1)]
        + [np.ones(length)]
    )
    target = y[n_lags:]
    coeffs, *_ = np.linalg.lstsq(X, target, rcond=None)
    return [float(c) for c in coeffs]


def friedrich_coefficients(
    x: np.ndarray, polynomial_order: int = 3, n_quantiles: int = 30
) -> list:
    """Polyfit of mean(delta) vs mean(signal) over quantile bins.
    Ref :725-772 (np.polyfit on the raw Vandermonde there). The fit
    here solves the SAME least-squares problem on the z-scored bin
    means (z = (x-mean)/std_pop) via pivotless Gaussian elimination on
    the SPD normal equations, then expands the coefficients back to the
    raw-x basis binomially — numerically better conditioned than the
    raw Vandermonde at large |x|, agrees with np.polyfit to ~1e-9 at
    panel scale (pinned by a property test), and deterministic enough
    to replay in the SQL correctness oracle. Highest-degree first,
    matching np.polyfit's output order."""
    deg = polynomial_order
    if len(x) <= n_quantiles:
        return [float("nan")] * (deg + 1)
    delta = np.diff(x)
    sig = x[:-1]
    edges = np.quantile(x, np.linspace(0, 1, n_quantiles + 1))
    which = np.clip(np.searchsorted(edges[1:-1], sig, side="left"), 0, n_quantiles - 1)
    xs, ys = [], []
    for q in range(n_quantiles):
        mask = which == q
        if mask.any():
            xs.append(sig[mask].mean())
            ys.append(delta[mask].mean())
    xs_a, ys_a = np.asarray(xs), np.asarray(ys)
    m, s = xs_a.mean(), xs_a.std()
    if len(xs) < deg + 1 or s == 0.0:
        return [float("nan")] * (deg + 1)
    z = (xs_a - m) / s
    n = deg + 1
    A = np.array([[(z ** (i + j)).sum() for j in range(n)] for i in range(n)])
    b = np.array([(ys_a * z**i).sum() for i in range(n)])
    # forward sweep + back-substitution (same schedule as the oracle)
    A = A.copy()
    for k in range(n - 1):
        for i in range(k + 1, n):
            f = A[i, k] / A[k, k]
            A[i, k:] -= f * A[k, k:]
            b[i] -= f * b[k]
    d = np.zeros(n)
    for i in range(n - 1, -1, -1):
        d[i] = (b[i] - A[i, i + 1 :] @ d[i + 1 :]) / A[i, i]
    # back-transform: c_k = sum_{j>=k} d_j * C(j,k) * (-m)^(j-k) / s^j
    c = [
        float(
            sum(
                d[j] * math.comb(j, k) * ((-m) ** (j - k)) / (s**j)
                for j in range(k, n)
            )
        )
        for k in range(n)
    ]
    return c[::-1]


def fft_coefficients(x: np.ndarray, n_coefficients: int = 8) -> dict:
    """First n rFFT coefficients. Ref :1911-1935 (full list there; we
    truncate to a fixed width for a stable distributed schema)."""
    f = np.fft.rfft(x)[:n_coefficients]
    pad = n_coefficients - len(f)
    real = np.pad(f.real, (0, pad), constant_values=np.nan)
    imag = np.pad(f.imag, (0, pad), constant_values=np.nan)
    angle = np.arctan2(real, imag) * 180 / np.pi
    return {
        "real": [float(v) for v in real],
        "imag": [float(v) for v in imag],
        "angle": [float(v) for v in angle],
    }


def _ricker(points: int, a: float) -> np.ndarray:
    A = 2 / (math.sqrt(3 * a) * (math.pi**0.25))
    vec = np.arange(0, points) - (points - 1.0) / 2
    wsq = a**2
    return A * (1 - vec**2 / wsq) * np.exp(-(vec**2) / (2 * wsq))


def cwt_coefficients(
    x: np.ndarray, widths: tuple = (2, 5, 10, 20), n_coefficients: int = 14
) -> list:
    """Ricker-wavelet CWT coefficients, flattened over widths. Ref :589-625."""
    out = []
    for w in widths:
        points = min(10 * w, len(x))
        conv = np.convolve(x, _ricker(points, w), mode="same")
        out.extend(float(v) for v in conv[:n_coefficients])
    return out


def number_cwt_peaks(x: np.ndarray, max_width: int = 5) -> float:
    """Count of ricker-CWT ridge-line peaks. Ref :1187-1221
    (scipy.signal.find_peaks_cwt there); numpy re-derivation of the
    same ridge algorithm: local maxima per scale, ridge lines tracked
    coarse-to-fine with gap tolerance 2 and per-scale matching
    distance width/4, kept if length >= n_scales/4 and SNR >= 1
    against the 10th percentile of |CWT| at the finest scale.
    """
    n = len(x)
    if n < 3:
        return 0.0
    widths = list(range(1, max_width + 1))
    mat = np.vstack(
        [np.convolve(x, _ricker(min(10 * w, n), w), mode="same") for w in widths]
    )
    # strict local maxima per scale (order=1, clipped edges)
    maxima = []
    for r in range(len(widths)):
        row = mat[r]
        left = np.empty(n)
        left[0], left[1:] = -np.inf, row[:-1]
        right = np.empty(n)
        right[-1], right[:-1] = -np.inf, row[1:]
        maxima.append(np.flatnonzero((row > left) & (row > right)))
    gap_thresh = 2
    ridges: list = []  # [last_row, last_col, length, gap, best_row0_col]
    for r in range(len(widths) - 1, -1, -1):
        max_dist = widths[r] / 4.0
        cols = list(maxima[r])
        for ridge in ridges:
            if ridge[3] > gap_thresh:
                continue
            best, best_d = None, max_dist + 1
            for c in cols:
                d = abs(c - ridge[1])
                if d < best_d:
                    best, best_d = c, d
            if best is not None and best_d <= max_dist:
                ridge[0], ridge[1] = r, best
                ridge[2] += 1
                ridge[3] = 0
                if r == 0:
                    ridge[4] = best
                cols.remove(best)
            else:
                ridge[3] += 1
        for c in cols:
            ridges.append([r, c, 1, 0, c if r == 0 else None])
    noise = np.percentile(np.abs(mat[0]), 10)
    count = 0
    for _, _, length, _, col0 in ridges:
        if length < max(len(widths) / 4.0, 1):
            continue
        if col0 is None:
            continue
        if noise > 0 and mat[0, col0] / noise < 1.0:
            continue
        count += 1
    return float(count)


def _welch_psd(x: np.ndarray, nperseg: int = 256) -> np.ndarray:
    """Welch power spectral density, hann window, 50% overlap,
    constant detrend, one-sided — numpy re-derivation of the standard
    method (scipy.signal.welch defaults)."""
    n = len(x)
    nperseg = min(n, nperseg)
    noverlap = nperseg // 2
    step = nperseg - noverlap
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(nperseg) / nperseg)
    scale = 1.0 / (win * win).sum()
    n_freqs = nperseg // 2 + 1
    psd = np.zeros(n_freqs)
    n_seg = 0
    for start in range(0, n - nperseg + 1, step):
        seg = x[start : start + nperseg]
        seg = (seg - seg.mean()) * win
        spec = np.fft.rfft(seg)
        p = (spec.real**2 + spec.imag**2) * scale
        if nperseg % 2 == 0:
            p[1:-1] *= 2
        else:
            p[1:] *= 2
        psd += p
        n_seg += 1
    return psd / max(n_seg, 1)


def fourier_entropy(x: np.ndarray, n_bins: int = 10) -> float:
    """Binned entropy of the normalized Welch PSD. Ref :695-722."""
    if len(x) < 2:
        return float("nan")
    pxx = _welch_psd(x)
    pxx = pxx / pxx.max()
    b = np.floor((pxx - pxx.min()) / (1e-12 + (pxx.max() - pxx.min()) / n_bins))
    _, counts = np.unique(b, return_counts=True)
    p = counts / len(pxx)
    return float(-(p * np.log(p)).sum())


def spkt_welch_density(x: np.ndarray, coeff: int = 5) -> float:
    """Welch PSD value at a frequency index. Ref :1532-1561."""
    pxx = _welch_psd(x)
    if coeff >= len(pxx):
        return float("nan")
    return float(pxx[coeff])


#: name -> (kernel, default params, spark output type)
UDF_FEATURES: dict = {
    "approximate_entropy": (approximate_entropy, {"run_length": 2, "filtering_level": 0.2}, "double"),
    "sample_entropy": (sample_entropy, {"ratio": 0.2, "m": 2}, "double"),
    "lempel_ziv_complexity": (lempel_ziv_complexity, {"threshold": 0.0, "as_ratio": True}, "double"),
    "augmented_dickey_fuller": (augmented_dickey_fuller, {"n_lags": 1}, "double"),
    "autoregressive_coefficients": (autoregressive_coefficients, {"n_lags": 4}, "array<double>"),
    "friedrich_coefficients": (friedrich_coefficients, {"polynomial_order": 3, "n_quantiles": 30}, "array<double>"),
    "cwt_coefficients": (cwt_coefficients, {"widths": (2, 5, 10, 20), "n_coefficients": 14}, "array<double>"),
    "number_cwt_peaks": (number_cwt_peaks, {"max_width": 5}, "double"),
    "fourier_entropy": (fourier_entropy, {"n_bins": 10}, "double"),
    "spkt_welch_density": (spkt_welch_density, {"coeff": 5}, "double"),
    "fft_coefficients": (
        fft_coefficients,
        {"n_coefficients": 8},
        "struct<real:array<double>,imag:array<double>,angle:array<double>>",
    ),
}


def extract_features_udf(
    df: DataFrame,
    feats: dict | list | None = None,
    entity: str | None = None,
    time: str | None = None,
    value: str | None = None,
) -> DataFrame:
    """Fused per-entity UDF extraction: ONE grouped-map pass computes
    every requested kernel over each (sorted) series."""
    import pandas as pd

    p = panel_cols(df)
    entity = entity or p.entity
    time = time or p.time
    value = value or p.target

    if feats is None:
        feats = list(UDF_FEATURES.keys())
    if isinstance(feats, list):
        feats = {name: UDF_FEATURES[name][1] for name in feats}

    specs = [
        (name, UDF_FEATURES[name][0], params, UDF_FEATURES[name][2])
        for name, params in feats.items()
    ]
    entity_dtype = dict(df.dtypes)[entity]
    schema = f"{entity} {entity_dtype}, " + ", ".join(
        f"`{name}` {dtype}" for name, _, _, dtype in specs
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time)
        x = pdf[value].to_numpy(dtype="float64")
        row: dict = {entity: [pdf[entity].iloc[0]]}
        for name, fn, params, _ in specs:
            row[name] = [fn(x, **params)]
        return pd.DataFrame(row)

    from functime_spark.pipeline._util import spread_groups

    # explicit-count repartition: AQE byte-coalescing otherwise
    # serializes this Python-kernel stage onto one task
    return spread_groups(
        df.select(entity, time, value), entity
    ).groupBy(entity).applyInPandas(run, schema=schema)


def cusum(
    df: DataFrame,
    threshold: float = 5.0,
    drift: float = 0.0,
    warmup_period: int = 30,
    entity: str | None = None,
    time: str | None = None,
    value: str | None = None,
) -> DataFrame:
    """CUSUM changepoint filter with state resets — per-row events.

    Ref feature_extractors.py:2761-2804 + rust kernel
    src/changepoint_detection/cusum.rs:32-93 (same warm-up/reset state
    machine, incl. recomputing mu/sigma after each trigger)."""
    import pandas as pd

    p = panel_cols(df)
    entity = entity or p.entity
    time = time or p.time
    value = value or p.target
    entity_dtype = dict(df.dtypes)[entity]
    time_dtype = dict(df.dtypes)[time]
    schema = f"{entity} {entity_dtype}, {time} {time_dtype}, event int"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time)
        vals = pdf[value].to_numpy(dtype="float64")
        events = np.zeros(len(vals), dtype="int32")
        s_pos = s_neg = 0.0
        t = 0
        mu = sigma = 0.0
        obs: list = []
        for i, v in enumerate(vals):
            if t < warmup_period:
                if not np.isnan(v):
                    obs.append(v)
                events[i] = 0
                t += 1
                continue
            if t == warmup_period:
                arr = np.asarray(obs)
                mu = arr.mean()
                sigma = arr.std()
                t += 1
            if np.isnan(v) or sigma == 0:
                events[i] = 0
                continue
            z = (v - mu) / sigma
            s_pos = max(s_pos + z - drift, 0.0)
            s_neg = min(s_neg + z + drift, 0.0)
            if s_pos > threshold or s_neg < -threshold:
                events[i] = 1
                s_pos = s_neg = 0.0
                t = 0
                obs = []
            else:
                events[i] = 0
        return pd.DataFrame(
            {entity: pdf[entity], time: pdf[time], "event": events}
        )

    from functime_spark.pipeline._util import spread_groups

    # explicit-count repartition: AQE byte-coalescing otherwise
    # serializes this Python-kernel stage onto one task
    return spread_groups(
        df.select(entity, time, value), entity
    ).groupBy(entity).applyInPandas(run, schema=schema)
