"""Forecast evaluation & diagnostics: ACF, Ljung-Box, normality,
entity rankings. Mirrors functime evaluation.py.

ACF and Ljung-Box are pure native aggregates (F.corr over lagged
pairs); the D'Agostino K^2 normality statistic runs in the fused UDF
tier (scipy-free numpy formulas).
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm_ppf(p: float) -> float:
    """Acklam's inverse-normal-CDF approximation (scipy-free), ~1e-9
    absolute error — plenty for confidence bands."""
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if p > phigh:
        return -_norm_ppf(1 - p)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
    )


def _lagged(df: DataFrame, max_lags: int):
    e, t, v = df.columns[:3]
    w = Window.partitionBy(e).orderBy(t)
    out = df.select(
        e,
        F.col(v).alias("__x"),
        *[F.lag(v, i).over(w).alias(f"__xl{i}") for i in range(1, max_lags + 1)],
    )
    return out, e


def acf(df: DataFrame, max_lags: int, alpha: float = 0.05) -> DataFrame:
    """Per-entity autocorrelation function with Bartlett confidence
    bands. Ref evaluation.py:62-136. Output: one row per (entity, lag)
    with acf + confint bounds (lag 0 = 1.0)."""
    ppf = _norm_ppf(1 - alpha / 2.0)
    lagged, e = _lagged(df, max_lags)
    aggs = [
        F.corr("__x", f"__xl{i}").alias(f"acf_{i}") for i in range(1, max_lags + 1)
    ] + [F.count("__x").alias("__n")]
    per_entity = lagged.groupBy(e).agg(*aggs)
    # Bartlett: var_k = (1 + 2*sum_{i<k} acf_i^2)/n; interval_1 = ppf/sqrt(n)
    rows = []
    cum = None
    for k in range(1, max_lags + 1):
        if k == 1:
            interval = F.lit(ppf) * F.sqrt(1.0 / F.col("__n"))
            cum = F.col("acf_1") * F.col("acf_1")
        else:
            interval = F.lit(ppf) * F.sqrt((1 + 2 * cum) / F.col("__n"))
            cum = cum + F.col(f"acf_{k}") * F.col(f"acf_{k}")
        a_k = F.col(f"acf_{k}")
        rows.append(
            F.struct(
                F.lit(k).alias("lag"),
                a_k.alias("acf"),
                (a_k - interval).alias("confint_lower"),
                (a_k + interval).alias("confint_upper"),
            )
        )
    zero = F.struct(
        F.lit(0).alias("lag"),
        F.lit(1.0).alias("acf"),
        F.lit(1.0).alias("confint_lower"),
        F.lit(1.0).alias("confint_upper"),
    )
    return per_entity.select(
        e, F.explode(F.array(zero, *rows)).alias("r")
    ).select(e, "r.lag", "r.acf", "r.confint_lower", "r.confint_upper")


def ljung_box_test(df: DataFrame, max_lags: int) -> DataFrame:
    """Q_k = n(n+2) * sum_{i<=k} acf_i^2/(n-i), one row per (entity,
    lag). Ref evaluation.py:139-168."""
    lagged, e = _lagged(df, max_lags)
    aggs = [
        F.corr("__x", f"__xl{i}").alias(f"acf_{i}") for i in range(1, max_lags + 1)
    ] + [F.count("__x").alias("__n")]
    per_entity = lagged.groupBy(e).agg(*aggs)
    n = F.col("__n")
    rows = []
    cum = F.lit(0.0)
    for k in range(1, max_lags + 1):
        cum = cum + F.col(f"acf_{k}") * F.col(f"acf_{k}") / (n - k)
        rows.append(
            F.struct(F.lit(k).alias("lag"), (n * (n + 2) * cum).alias("qstat"))
        )
    return per_entity.select(e, F.explode(F.array(*rows)).alias("r")).select(
        e, "r.lag", "r.qstat"
    )


def _dagostino_k2(x: np.ndarray) -> float:
    """D'Agostino-Pearson K^2 omnibus normality statistic (the value
    scipy.stats.normaltest returns). Ref evaluation.py:171-182."""
    n = len(x)
    if n < 8:
        return float("nan")
    m = x.mean()
    d = x - m
    m2 = (d**2).mean()
    m3 = (d**3).mean()
    m4 = (d**4).mean()
    g1 = m3 / m2**1.5
    # skewtest z
    y = g1 * math.sqrt(((n + 1) * (n + 3)) / (6.0 * (n - 2)))
    beta2 = 3.0 * (n**2 + 27 * n - 70) * (n + 1) * (n + 3) / (
        (n - 2.0) * (n + 5) * (n + 7) * (n + 9)
    )
    w2 = -1 + math.sqrt(2 * (beta2 - 1))
    delta = 1 / math.sqrt(0.5 * math.log(w2))
    alpha = math.sqrt(2.0 / (w2 - 1))
    y = y if y != 0 else 1.0
    z_s = delta * math.log(y / alpha + math.sqrt((y / alpha) ** 2 + 1))
    # kurtosistest z
    b2 = m4 / m2**2
    e_b2 = 3.0 * (n - 1) / (n + 1)
    var_b2 = 24.0 * n * (n - 2) * (n - 3) / ((n + 1) ** 2 * (n + 3) * (n + 5))
    xx = (b2 - e_b2) / math.sqrt(var_b2)
    sqrtbeta1 = (
        6.0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))
        * math.sqrt((6.0 * (n + 3) * (n + 5)) / (n * (n - 2) * (n - 3)))
    )
    a = 6.0 + 8.0 / sqrtbeta1 * (
        2.0 / sqrtbeta1 + math.sqrt(1 + 4.0 / (sqrtbeta1**2))
    )
    term1 = 1 - 2 / (9.0 * a)
    denom = 1 + xx * math.sqrt(2 / (a - 4.0))
    term2 = math.copysign(abs((1 - 2.0 / a) / denom) ** (1 / 3.0), denom)
    z_k = (term1 - term2) / math.sqrt(2 / (9.0 * a))
    return float(z_s * z_s + z_k * z_k)


def normality_test(df: DataFrame) -> DataFrame:
    """Per-entity D'Agostino K^2. Ref evaluation.py:171-182."""
    import pandas as pd

    e, t, v = df.columns[:3]
    entity_dtype = dict(df.dtypes)[e]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf.sort_values(t)[v].to_numpy(dtype="float64")
        return pd.DataFrame({e: [pdf[e].iloc[0]], "normal_test": [_dagostino_k2(x)]})

    from functime_spark.pipeline._util import spread_groups

    return spread_groups(df, e).groupBy(e).applyInPandas(
        run, schema=f"{e} {entity_dtype}, normal_test double"
    )


def rank_point_forecasts(
    y_true: DataFrame, y_pred: DataFrame, sort_by: str = "smape", descending: bool = False
) -> DataFrame:
    """Entities sorted by a forecast score or a y_pred statistic.
    Ref evaluation.py:233-274."""
    from functime_spark.operators import metrics as M

    e = y_true.columns[0]
    v = y_pred.columns[-1]
    stat_exprs = {
        "mean": F.avg(v),
        "median": F.median(v),
        "std": F.stddev_samp(v),
        "cv": F.stddev_samp(v) / F.avg(v),
    }
    if sort_by in stat_exprs:
        out = y_pred.groupBy(e).agg(stat_exprs[sort_by].alias(sort_by))
    else:
        fn = getattr(M, sort_by)
        if sort_by in ("mase", "rmsse"):
            out = fn(y_true, y_pred, y_true)
        else:
            out = fn(y_true, y_pred)
    score = out.columns[-1]
    return out.orderBy(F.desc(score) if descending else F.asc(score))


def rank_residuals(
    y_resids: DataFrame, sort_by: str = "abs_bias", descending: bool = False
) -> DataFrame:
    """Ref evaluation.py:277-324."""
    e, t, v = y_resids.columns[:3]
    if sort_by == "autocorr":
        out = (
            ljung_box_test(y_resids, max_lags=1)
            .select(e, F.col("qstat"))
        )
        score = "qstat"
    elif sort_by == "normality":
        out = normality_test(y_resids)
        score = "normal_test"
    elif sort_by in ("bias", "abs_bias"):
        out = y_resids.groupBy(e).agg(F.abs(F.avg(v)).alias(sort_by))
        score = sort_by
    else:
        raise ValueError(f"unsupported sort_by {sort_by}")
    return out.orderBy(F.desc(score) if descending else F.asc(score))


def rank_fva(
    y_true: DataFrame,
    y_pred: DataFrame,
    y_pred_bench: DataFrame | None = None,
    descending: bool = False,
) -> DataFrame:
    """Forecast value added = smape(bench) - smape(model) per entity;
    bench defaults to in-sample one-step naive. Ref evaluation.py:327-373."""
    from functime_spark.operators.metrics import smape

    e, t, v = y_true.columns[:3]
    if y_pred_bench is None:
        w = Window.partitionBy(e).orderBy(t)
        y_pred_bench = y_true.select(
            e, t, F.lag(v).over(w).alias(v)
        ).na.drop()
    model = smape(y_true, y_pred).withColumnRenamed("smape", "smape_model")
    bench = smape(y_true, y_pred_bench).withColumnRenamed("smape", "smape_bench")
    out = model.join(bench, on=e).select(
        e,
        "smape_model",
        "smape_bench",
        (F.col("smape_bench") - F.col("smape_model")).alias("fva"),
    )
    return out.orderBy(F.desc("fva") if descending else F.asc("fva"))


def detect_anomalies(
    y: DataFrame,
    window: int = 24,
    threshold: float = 3.0,
    min_obs: int = 5,
) -> DataFrame:
    """Rolling z-score anomaly detection over the panel: each point is
    scored against the trailing `window` observations of its own
    entity (mean/stddev over ROWS BETWEEN window PRECEDING AND 1
    PRECEDING — the point never scores itself, so a spike cannot mask
    itself). Emits the z-score and a boolean flag; warmup rows (< min_obs
    trailing points) and zero-variance windows score NULL / False.

    One window pass per entity partition — the same single-shuffle
    shape as roll/lag, no UDFs, streaming-friendly ordering.
    """
    e, t, tgt = y.columns[:3]
    w = (
        Window.partitionBy(e)
        .orderBy(t)
        .rowsBetween(-window, -1)
    )
    mu = F.avg(tgt).over(w)
    sd = F.stddev_samp(tgt).over(w)
    n = F.count(tgt).over(w)
    ok = (n >= min_obs) & sd.isNotNull() & (sd > 0)
    z = F.when(ok, (F.col(tgt) - mu) / sd)
    return y.select(
        e,
        t,
        tgt,
        z.alias("zscore"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_anomaly"),
    )
