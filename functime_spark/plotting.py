"""Panel plotting — driver-side rendering over bounded collects.

Port of the reference's plotly module (plotting.py:17-404:
plot_entities / plot_panel / plot_forecasts / plot_backtests /
plot_residuals / plot_comet / plot_fva). Split in two layers so the
engine work is testable without a plotting dependency:

- `prepare_*` functions run the DISTRIBUTED part (entity sampling,
  rank-and-limit, joins) and collect only the bounded slice a figure
  needs — the reference collects the whole frame (plotting.py:60-78);
  at 100 TB only the sampled slice ever reaches the driver.
- `plot_*` wrappers feed that slice to plotly when it is installed
  (this container ships without it) and raise ImportError otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from functime_spark.panel import panel_cols

DEFAULT_N_SERIES = 10


def _sample_entities(df: DataFrame, n_series: int, seed: int = 42) -> DataFrame:
    p = panel_cols(df)
    ents = (
        df.select(p.entity).distinct()
        .withColumn("__r", F.hash(F.col(p.entity), F.lit(seed)))
        .orderBy("__r")
        .limit(n_series)
        .drop("__r")
    )
    return df.join(F.broadcast(ents), on=p.entity, how="inner")


def prepare_entities(df: DataFrame, n_series: int = DEFAULT_N_SERIES, seed: int = 42):
    """Sampled per-entity traces (ref plot_entities plotting.py:17-58)."""
    p = panel_cols(df)
    return (
        _sample_entities(df, n_series, seed)
        .orderBy(p.entity, p.time)
        .toPandas()
    )


def prepare_forecasts(
    y: DataFrame, y_pred: DataFrame, n_series: int = DEFAULT_N_SERIES, seed: int = 42
):
    """History + forecast traces, sampled consistently (ref
    plot_forecasts plotting.py:120-189)."""
    p = panel_cols(y)
    hist = _sample_entities(y, n_series, seed).withColumn("__kind", F.lit("actual"))
    pred = (
        _sample_entities(y_pred, n_series, seed)
        .withColumn("__kind", F.lit("forecast"))
    )
    return (
        hist.unionByName(pred)
        .orderBy(p.entity, "__kind", p.time)
        .toPandas()
    )


def prepare_panel(
    df: DataFrame,
    n_series: int = DEFAULT_N_SERIES,
    n_points: int | None = None,
    seed: int = 42,
):
    """Sampled entities, optionally trimmed to the last `n_points`
    observations each (ref plot_panel plotting.py:65-118). The tail
    trim runs distributed (rank-from-the-end window) so only the
    plotted slice is collected."""
    p = panel_cols(df)
    out = _sample_entities(df, n_series, seed)
    if n_points is not None:
        w = Window.partitionBy(p.entity).orderBy(F.col(p.time).desc())
        out = (
            out.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= n_points)
            .drop("__rk")
        )
    return out.orderBy(p.entity, p.time).toPandas()


def prepare_backtests(
    y_true: DataFrame,
    y_preds: DataFrame,
    n_series: int = DEFAULT_N_SERIES,
    seed: int = 42,
):
    """Actuals + per-split backtest predictions, sampled consistently
    (ref plot_backtests plotting.py:197-227). `y_preds` is the
    Forecaster.backtest output (entity, time, value, split)."""
    p = panel_cols(y_true)
    hist = (
        _sample_entities(y_true, n_series, seed)
        .select(p.entity, p.time, p.target)
        .withColumn("__split", F.lit(-1))
    )
    split_col = y_preds.columns[-1]
    pred = _sample_entities(
        y_preds.withColumnRenamed(split_col, "__split"), n_series, seed
    ).select(p.entity, p.time, y_preds.columns[2], "__split")
    return (
        hist.unionByName(pred).orderBy(p.entity, "__split", p.time).toPandas()
    )


def prepare_residuals(y_resids: DataFrame, n_series: int = DEFAULT_N_SERIES, seed: int = 42):
    """Residual traces + per-entity mean bar (ref plot_residuals
    plotting.py:230-280)."""
    e = y_resids.columns[0]
    v = y_resids.columns[-1]
    sampled = _sample_entities(y_resids, n_series, seed)
    means = sampled.groupBy(e).agg(F.avg(v).alias("mean_resid"))
    return sampled.toPandas(), means.toPandas()


def prepare_comet(
    y_train: DataFrame, y_test: DataFrame, y_pred: DataFrame
):
    """Per-entity (in-sample CV, out-of-sample score) scatter (ref
    plot_comet plotting.py:283-341)."""
    from functime_spark.operators.metrics import smape

    p = panel_cols(y_train)
    cv = y_train.groupBy(p.entity).agg(
        (F.stddev_samp(p.target) / F.avg(p.target)).alias("cv")
    )
    score = smape(y_test, y_pred)
    return cv.join(score, on=p.entity).toPandas()


def prepare_fva(
    y_test: DataFrame, y_pred: DataFrame, y_pred_bench: DataFrame
):
    """(bench smape, model smape) per entity for the FVA quadrant
    scatter (ref plot_fva plotting.py:344-404)."""
    from functime_spark.operators.evaluation import rank_fva

    return rank_fva(y_test, y_pred, y_pred_bench).toPandas()


def _require_plotly():
    try:
        import plotly.graph_objects as go  # noqa: F401

        return go
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "plotly is required for plot_* functions (prepare_* returns "
            "the plot-ready data without it)"
        ) from exc


def plot_entities(df: DataFrame, n_series: int = DEFAULT_N_SERIES, **kwargs):
    go = _require_plotly()
    pdf = prepare_entities(df, n_series)
    e, t, v = pdf.columns[:3]
    fig = go.Figure()
    for ent, grp in pdf.groupby(e):
        fig.add_trace(go.Scatter(x=grp[t], y=grp[v], name=str(ent), **kwargs))
    return fig


def plot_forecasts(y: DataFrame, y_pred: DataFrame, n_series: int = DEFAULT_N_SERIES, **kwargs):
    go = _require_plotly()
    pdf = prepare_forecasts(y, y_pred, n_series)
    e, t, v = pdf.columns[:3]
    fig = go.Figure()
    for (ent, kind), grp in pdf.groupby([e, "__kind"]):
        fig.add_trace(
            go.Scatter(
                x=grp[t],
                y=grp[v],
                name=f"{ent} ({kind})",
                line={"dash": "dot"} if kind == "forecast" else {},
                **kwargs,
            )
        )
    return fig


def plot_panel(
    df: DataFrame,
    n_series: int = DEFAULT_N_SERIES,
    n_points: int | None = None,
    **kwargs,
):
    go = _require_plotly()
    pdf = prepare_panel(df, n_series, n_points)
    e, t, v = pdf.columns[:3]
    fig = go.Figure()
    for ent, grp in pdf.groupby(e):
        fig.add_trace(go.Scatter(x=grp[t], y=grp[v], name=str(ent), **kwargs))
    return fig


def plot_backtests(
    y_true: DataFrame, y_preds: DataFrame, n_series: int = DEFAULT_N_SERIES, **kwargs
):
    go = _require_plotly()
    pdf = prepare_backtests(y_true, y_preds, n_series)
    e, t = pdf.columns[:2]
    v = pdf.columns[2]
    fig = go.Figure()
    for (ent, split), grp in pdf.groupby([e, "__split"]):
        name = f"{ent} (actual)" if split == -1 else f"{ent} (split {split})"
        fig.add_trace(
            go.Scatter(
                x=grp[t],
                y=grp[v],
                name=name,
                line={} if split == -1 else {"dash": "dot"},
                **kwargs,
            )
        )
    return fig


def plot_residuals(y_resids: DataFrame, n_series: int = DEFAULT_N_SERIES, **kwargs):
    go = _require_plotly()
    pdf, _means = prepare_residuals(y_resids, n_series)
    e = pdf.columns[0]
    v = pdf.columns[-1]
    fig = go.Figure()
    for ent, grp in pdf.groupby(e):
        fig.add_trace(go.Histogram(x=grp[v], name=str(ent), **kwargs))
    return fig


def plot_comet(y_train, y_test, y_pred, **kwargs):
    go = _require_plotly()
    pdf = prepare_comet(y_train, y_test, y_pred)
    return go.Figure(
        go.Scatter(x=pdf["cv"], y=pdf["smape"], mode="markers", **kwargs)
    )


def plot_fva(y_test, y_pred, y_pred_bench, **kwargs):
    go = _require_plotly()
    pdf = prepare_fva(y_test, y_pred, y_pred_bench)
    fig = go.Figure(
        go.Scatter(
            x=pdf["smape_bench"], y=pdf["smape_model"], mode="markers", **kwargs
        )
    )
    m = max(pdf["smape_bench"].max(), pdf["smape_model"].max())
    fig.add_shape(type="line", x0=0, y0=0, x1=m, y1=m)
    return fig
