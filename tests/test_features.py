"""Native feature extractors vs numpy ground truth (reference
semantics pinned in tests mirroring tests/test_tsfresh.py's
golden-value strategy, SURVEY §5)."""

import math

import numpy as np
import pytest

from functime_spark.functions.features import FEATURES, extract_features


@pytest.fixture(scope="module")
def feats(events):
    return {
        r["user_id"]: r.asDict()
        for r in extract_features(events).collect()
    }


@pytest.fixture(scope="module")
def series(events_pdf):
    return {
        uid: g["value"].to_numpy()
        for uid, g in events_pdf.groupby("user_id")
    }


def _num(feats, series, name, fn, tol=1e-8):
    for uid, x in series.items():
        got = feats[uid][name]
        want = fn(x)
        assert got == pytest.approx(want, abs=tol, rel=1e-9), (
            f"{name} mismatch for entity {uid}: got {got}, want {want}"
        )


def test_registry_complete(feats):
    row = next(iter(feats.values()))
    for name in FEATURES:
        assert name in row


def test_absolute_energy(feats, series):
    _num(feats, series, "absolute_energy", lambda x: float(np.sum(x * x)), tol=1e-6)


def test_absolute_maximum(feats, series):
    _num(feats, series, "absolute_maximum", lambda x: float(np.abs(x).max()))


def test_absolute_sum_of_changes(feats, series):
    _num(feats, series, "absolute_sum_of_changes", lambda x: float(np.abs(np.diff(x)).sum()))


def test_autocorrelation(feats, series):
    def ac(x, l=1):
        mu, v = x.mean(), x.var()
        return float(np.sum((x[:-l] - mu) * (x[l:] - mu)) / (v * (len(x) - l)))

    _num(feats, series, "autocorrelation", ac)


def test_binned_entropy(feats, series):
    def be(x, bins=10):
        b = np.floor((x - x.min()) / (1e-12 + (x.max() - x.min()) / bins))
        _, counts = np.unique(b, return_counts=True)
        p = counts / len(x)
        return float(-(p * np.log(p)).sum())

    _num(feats, series, "binned_entropy", be)


def test_c3(feats, series):
    def c3(x, l=1):
        return float(np.sum(x[: len(x) - 2 * l] * x[l : len(x) - l] * x[2 * l :]) / (len(x) - 2 * l))

    _num(feats, series, "c3", c3, tol=1e-5)


def test_cid_ce(feats, series):
    _num(feats, series, "cid_ce", lambda x: float(np.sqrt(np.sum(np.diff(x) ** 2))), tol=1e-6)


def test_count_above_below_mean(feats, series):
    _num(feats, series, "count_above_mean", lambda x: int((x > x.mean()).sum()))
    _num(feats, series, "count_below_mean", lambda x: int((x < x.mean()).sum()))


def test_energy_ratios(feats, series):
    for uid, x in series.items():
        n, k = len(x), 10
        L = math.ceil(n / k)
        x2 = x * x
        chunks = np.array([x2[i * L : (i + 1) * L].sum() for i in range(k)])
        want = chunks / x2.sum()
        got = np.array(feats[uid]["energy_ratios"])
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_locations(feats, series):
    _num(feats, series, "first_location_of_maximum", lambda x: float(np.argmax(x) / len(x)))
    _num(feats, series, "first_location_of_minimum", lambda x: float(np.argmin(x) / len(x)))
    _num(
        feats, series, "last_location_of_maximum",
        lambda x: float((len(x) - np.argmax(x[::-1])) / len(x)),
    )
    _num(
        feats, series, "last_location_of_minimum",
        lambda x: float((len(x) - np.argmin(x[::-1])) / len(x)),
    )


def test_index_mass_quantile(feats, series):
    def imq(x, q=0.5):
        cum = np.cumsum(np.abs(x))
        idx = int(np.searchsorted(cum, q * cum[-1], side="left"))
        return float((idx + 1) / len(x))

    _num(feats, series, "index_mass_quantile", imq)


def test_linear_trend(feats, series):
    for uid, x in series.items():
        n = len(x)
        i = np.arange(n)
        beta = np.polyfit(i, x, 1)[0]
        alpha = x.mean() - beta * (n - 1) / 2
        resid = x - beta * i - alpha
        lt = feats[uid]["linear_trend"]
        assert lt["slope"] == pytest.approx(beta, rel=1e-6)
        assert lt["intercept"] == pytest.approx(alpha, rel=1e-6)
        assert lt["rss"] == pytest.approx(float(resid @ resid), rel=1e-6)


def test_streaks(feats, series):
    def longest_run(mask):
        best = cur = 0
        for m in mask:
            cur = cur + 1 if m else 0
            best = max(best, cur)
        return best

    _num(feats, series, "longest_streak_above_mean", lambda x: longest_run(x > x.mean()))
    _num(feats, series, "longest_streak_below_mean", lambda x: longest_run(x < x.mean()))
    _num(feats, series, "longest_winning_streak", lambda x: longest_run(np.diff(x) >= 0))
    _num(feats, series, "longest_losing_streak", lambda x: longest_run(np.diff(x) <= 0))


def test_mean_n_absolute_max(feats, series):
    _num(
        feats, series, "mean_n_absolute_max",
        lambda x: float(np.sort(np.abs(x))[-3:].mean()),
    )


def test_number_crossings(feats, series):
    def nc(x, m=0.0):
        y = x > m
        return int((y[1:] != y[:-1]).sum())

    _num(feats, series, "number_crossings", nc)


def test_number_peaks(feats, series):
    def npk(x, support=1):
        c = 0
        for i in range(len(x)):
            ok = True
            for j in range(1, support + 1):
                left = x[i] > x[i - j] if i - j >= 0 else False
                right = x[i] > x[i + j] if i + j < len(x) else False
                if not (left and right):
                    ok = False
                    break
            c += ok
        return c

    _num(feats, series, "number_peaks", npk)


def test_permutation_entropy(feats, series):
    def pe(x, d=3):
        pats = {}
        for t in range(len(x) - d + 1):
            w = x[t : t + d]
            pat = tuple(np.argsort(np.argsort(w, kind="stable"), kind="stable"))
            pats[pat] = pats.get(pat, 0) + 1
        counts = np.array(list(pats.values()), dtype=float)
        p = counts / counts.sum()
        return float(-(p * np.log(p)).sum())

    _num(feats, series, "permutation_entropy", pe, tol=1e-6)


def test_scalar_stats(feats, series):
    _num(feats, series, "root_mean_square", lambda x: float(np.sqrt((x * x).mean())), tol=1e-6)
    _num(feats, series, "variation_coefficient", lambda x: float(x.std() / x.mean()))
    _num(feats, series, "harmonic_mean", lambda x: float(len(x) / (1.0 / x).sum()))
    _num(feats, series, "range_over_mean", lambda x: float((x.max() - x.min()) / x.mean()))
    _num(feats, series, "range_change", lambda x: float(x.max() / x.min() - 1.0))
    _num(feats, series, "mean_change", lambda x: float((x[-1] - x[0]) / (len(x) - 1)))
    _num(
        feats, series, "mean_second_derivative_central",
        lambda x: float((x[-1] - x[-2] - x[1] + x[0]) / (2 * (len(x) - 2))),
    )


def test_ratio_beyond_r_sigma(feats, series):
    def rb(x, r=0.25):
        mu, sd = x.mean(), x.std()
        return float(((x < mu - r * sd) | (x > mu + r * sd)).sum() / len(x))

    _num(feats, series, "ratio_beyond_r_sigma", rb)


def test_time_reversal(feats, series):
    def trs(x, l=1):
        a = x[l:-l] * 0  # placeholder length
        one, two = x[l:], x[2 * l :]
        base = x[: len(two)]
        vals = x[l : l + len(two)] * (two + base) * (two - base)
        return float(vals.mean())

    _num(feats, series, "time_reversal_asymmetry_statistic", trs, tol=1e-5)


def test_skewness_kurtosis(feats, series):
    def g1(x):
        xc = x - x.mean()
        return float((xc**3).mean() / (xc**2).mean() ** 1.5)

    def g2(x):
        xc = x - x.mean()
        return float((xc**4).mean() / (xc**2).mean() ** 2 - 3.0)

    _num(feats, series, "skewness", g1, tol=1e-6)
    _num(feats, series, "kurtosis", g2, tol=1e-6)


def test_feature_count_claim():
    """README/COVERAGE claim '56 native-tier feature extractors' —
    keep the registry and the docs in sync (r7 verdict nit)."""
    assert len(FEATURES) == 56
