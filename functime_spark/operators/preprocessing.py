"""Preprocessing transformers over panel DataFrames.

Each transformer mirrors the semantics of the same-named reference
transformer (functime preprocessing.py — cited per class) with a
Spark-first physical design:

- per-entity parameters (means, stds, box-cox lambdas, detrend
  betas...) are small n_entities-row DataFrames joined back with an
  explicit `F.broadcast` — a broadcast hash join, no shuffle of the
  big panel (reference does the same logical join at
  preprocessing.py:368-376).
- stateless row-wise transforms are pure Column expressions.
- the only Python-side work is the per-entity scalar optimization in
  boxcox/yeojohnson (scipy-free Brent search inside applyInPandas,
  mirroring the reference's map_batches escape at 604-611).

All transformers share the protocol: ``transform(df)`` fits state and
returns the transformed panel; ``invert(df)`` undoes it where defined;
``transform_new(df)`` applies fitted state to unseen rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from functime_spark.panel import (
    entity_window,
    numeric_cols,
    ordered_window,
    panel_cols,
)


from functime_spark.serialize import SparkStatePickleMixin


class Transformer(SparkStatePickleMixin):
    """Base: fit-on-transform with stored per-entity state.

    Fitted instances pickle (per-entity param DataFrames materialize
    to rows — ref contract test_forecasting.py:71-86)."""

    def transform(self, df: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    def invert(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError(f"{type(self).__name__} is not invertible")

    def transform_new(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError


class reindex(Transformer):
    """Complete the (entity x time) grid, left-joining values.

    Ref preprocessing.py:24-47. Distinct entities cross-join distinct
    timestamps; the value left-join shuffles on (entity, time). The
    entity side is broadcast when small.
    """

    def __init__(self, drop_duplicates: bool = False):
        self.drop_duplicates = drop_duplicates

    def transform(self, df: DataFrame) -> DataFrame:
        p = panel_cols(df)
        entities = df.select(p.entity).distinct()
        timestamps = df.select(p.time).distinct()
        grid = entities.crossJoin(timestamps)
        base = df.dropDuplicates([p.entity, p.time]) if self.drop_duplicates else df
        return grid.join(base, on=[p.entity, p.time], how="left")


class coerce_dtypes(Transformer):
    """Cast columns to a target schema. Ref preprocessing.py:50-67."""

    def __init__(self, schema: dict):
        self.schema = schema

    def transform(self, df: DataFrame) -> DataFrame:
        return df.withColumns(
            {c: F.col(c).cast(t) for c, t in self.schema.items()}
        )


class time_to_arange(Transformer):
    """Replace time with per-entity 0..n-1. Ref preprocessing.py:70-91."""

    def transform(self, df: DataFrame) -> DataFrame:
        p = panel_cols(df)
        idx = (F.row_number().over(ordered_window(p.entity, p.time)) - 1).cast("long")
        return df.withColumn(p.time, idx)


def _freq_to_interval(freq: str) -> str:
    """Map reference offset aliases ('1d', '1w', '1mo', '1h', '1m', '1s',
    '1q', '1y', '15m'...) to a Spark interval string for F.window."""
    import re

    m = re.fullmatch(r"(\d+)(mo|[a-z]+)", freq)
    if not m:
        raise ValueError(f"unsupported frequency alias: {freq}")
    n, unit = int(m.group(1)), m.group(2)
    unit_map = {
        "s": "seconds",
        "m": "minutes",
        "h": "hours",
        "d": "days",
        "w": "weeks",
        "mo": "days",  # calendar months not supported by F.window; see resample
        "q": "days",
        "y": "days",
    }
    if unit in ("mo", "q", "y"):
        raise ValueError(
            f"calendar frequency {freq} needs date_trunc bucketing, not F.window"
        )
    return f"{n} {unit_map[unit]}"


_CAL_TRUNC = {"mo": "month", "q": "quarter", "y": "year"}


class resample(Transformer):
    """Bucket each series to `freq`, aggregate, impute gaps, fill 0.

    Ref preprocessing.py:94-133. Fixed-width frequencies use
    `F.window(time, interval)` (streaming-compatible); calendar
    frequencies (1mo/1q/1y) use `date_trunc`, which is the
    calendar-aware equivalent of Polars group_by_dynamic.
    """

    def __init__(self, freq: str, agg_method: str = "sum", impute_method="ffill"):
        if agg_method not in ("sum", "mean", "median"):
            raise ValueError(f"agg_method must be sum|mean|median, got {agg_method}")
        self.freq = freq
        self.agg_method = agg_method
        self.impute_method = impute_method

    def transform(self, df: DataFrame) -> DataFrame:
        p = panel_cols(df)
        target = p.target
        agg = {
            "sum": F.sum(target),
            "mean": F.avg(target),
            "median": F.median(target),
        }[self.agg_method]

        import re

        m = re.fullmatch(r"(\d+)(mo|[a-z]+)", self.freq)
        unit = m.group(2) if m else ""
        if unit in _CAL_TRUNC:
            bucket = F.date_trunc(_CAL_TRUNC[unit], F.col(p.time))
            agged = (
                df.groupBy(p.entity, bucket.alias(p.time))
                .agg(agg.alias(target))
            )
        else:
            interval = _freq_to_interval(self.freq)
            agged = (
                df.groupBy(p.entity, F.window(p.time, interval).alias("__w"))
                .agg(agg.alias(target))
                .select(p.entity, F.col("__w.start").alias(p.time), target)
            )
        # complete the per-entity time grid so gaps become explicit rows
        filled = reindex().transform(agged.select(p.entity, p.time, target))
        imputed = impute(self.impute_method).transform(filled)
        return imputed.na.fill(0.0, [target])


class trim(Transformer):
    """Clip all series to the common [max-of-starts, min-of-ends] window.

    Ref preprocessing.py:136-164: two nested scalar aggregates, then a
    filter — the two scalars are computed in one tiny aggregate and
    joined as a broadcast literal (cross-join of a 1-row frame).
    """

    def __init__(self, direction: str = "both"):
        self.direction = direction

    def transform(self, df: DataFrame) -> DataFrame:
        p = panel_cols(df)
        bounds = (
            df.groupBy(p.entity)
            .agg(F.min(p.time).alias("__start"), F.max(p.time).alias("__end"))
            .agg(
                F.max("__start").alias("__start"), F.min("__end").alias("__end")
            )
        )
        out = df.crossJoin(F.broadcast(bounds))
        if self.direction == "both":
            cond = (F.col(p.time) >= F.col("__start")) & (
                F.col(p.time) <= F.col("__end")
            )
        elif self.direction == "left":
            cond = F.col(p.time) >= F.col("__start")
        else:  # "right" — ref compares to start here too (preprocessing.py:159)
            cond = F.col(p.time) <= F.col("__end")
        return out.filter(cond).drop("__start", "__end")


class lag(Transformer):
    """Shifted copies `col__lag_k` per entity; drops the first max_lag
    rows of each series. Ref preprocessing.py:167-209."""

    def __init__(self, lags: list):
        self.lags = sorted(lags)

    def transform(self, df: DataFrame) -> DataFrame:
        p = panel_cols(df)
        w = ordered_window(p.entity, p.time)
        max_lag = max(self.lags)
        cols = [F.col(p.entity), F.col(p.time)]
        for k in self.lags:
            for v in p.values:
                cols.append(F.lag(v, k).over(w).alias(f"{v}__lag_{k}"))
        idx = F.row_number().over(w) - 1
        return df.select(*cols, idx.alias("__idx")).filter(
            F.col("__idx") >= max_lag
        ).drop("__idx")


class one_hot_encode(Transformer):
    """Dummy-encode string columns. Ref preprocessing.py:212-253.

    Distinct category values are collected to the driver (same
    eagerness as the reference's to_dummies) and become `when`
    columns — no shuffle of the panel.
    """

    def __init__(self, drop_first: bool = False):
        self.drop_first = drop_first
        self.categories: dict = {}

    def _cat_cols(self, df: DataFrame, entity: str) -> list:
        return [
            f.name
            for f in df.schema.fields
            if f.dataType.simpleString() == "string" and f.name != entity
        ]

    def transform(self, df: DataFrame) -> DataFrame:
        p = panel_cols(df)
        cat_cols = self._cat_cols(df, p.entity)
        for c in cat_cols:
            vals = [r[0] for r in df.select(c).distinct().orderBy(c).collect()]
            self.categories[c] = vals
        return self._encode(df, strict=False)

    def _encode(self, df: DataFrame, strict: bool) -> DataFrame:
        out = df
        for c, vals in self.categories.items():
            if strict:
                unknown = out.select(c).distinct().filter(~F.col(c).isin(vals))
                if unknown.limit(1).count() > 0:
                    raise ValueError(f"unknown categories in column {c}")
            use = vals[1:] if self.drop_first else vals
            for v in use:
                out = out.withColumn(
                    f"{c}__{v}", (F.col(c) == F.lit(v)).cast("tinyint")
                )
            out = out.drop(c)
        return out

    def transform_new(self, df: DataFrame) -> DataFrame:
        return self._encode(df, strict=True)


class roll(Transformer):
    """Trailing rolling stats per window size, shifted to avoid leakage.

    Ref preprocessing.py:256-336: for each window size w computes
    stats over a trailing window, then shifts by w (the reference's
    leakage guard at :317-319).

    Window frames:
    - ``freq=None`` → ROW frames (trailing w rows shifted by w rows).
    - ``freq`` given (e.g. ``"1h"``, ``"2i"``) → TIME-based RANGE
      frames: the stat covers values with timestamps in
      ``[t - (w-1+shift)·u, t - shift·u]`` (u = one freq step), which
      equals the reference's ``group_by_dynamic(period=w*freq)`` +
      ``shift(w)`` on a freq-regular panel and stays time-correct on
      irregular/gappy panels (the reference's row-shift drifts there).

    Both variants are window frames over ONE (entity, time) sort — no
    per-window-size self-joins (the reference joins once per w).

    ``fill_strategy`` ∈ {forward, backward, mean, zero} fills null
    rolling outputs; divergence from the reference documented: fills
    are per-entity (Polars' global fill_null would leak values across
    entity boundaries at a partition edge).
    """

    STATS = ("mean", "min", "max", "mlm", "sum", "std", "cv")
    _UNIT_US = {
        "s": 1_000_000,
        "m": 60 * 1_000_000,
        "h": 3600 * 1_000_000,
        "d": 86400 * 1_000_000,
        "w": 7 * 86400 * 1_000_000,
    }

    def __init__(
        self,
        window_sizes: list,
        stats: list,
        freq: str | None = None,
        shift: int | None = None,
        fill_strategy: str | None = None,
    ):
        bad = set(stats) - set(self.STATS)
        if bad:
            raise ValueError(f"unsupported roll stats: {bad}")
        if fill_strategy not in (None, "forward", "backward", "mean", "zero"):
            raise ValueError(f"unsupported fill_strategy: {fill_strategy}")
        self.window_sizes = window_sizes
        self.stats = stats
        self.freq = freq
        self.shift = shift  # None → shift by w, mirroring the reference
        self.fill_strategy = fill_strategy

    def _step(self, df: DataFrame, p) -> tuple:
        """(ordering column, units-per-step) for RANGE frames, or
        (None, None) for row frames."""
        if self.freq is None:
            return None, None
        from functime_spark.forecasting.ranges import strip_freq_alias

        n, unit = strip_freq_alias(self.freq)
        dtype = dict(df.dtypes)[p.time]
        if unit == "i":
            if not dtype.startswith(("int", "bigint", "long", "smallint")):
                raise ValueError("integer freq requires an integer time column")
            return F.col(p.time).cast("long"), n
        if unit not in self._UNIT_US:
            raise ValueError(f"unsupported roll freq: {self.freq}")
        if dtype == "date":
            return F.unix_date(F.col(p.time)).cast("long"), (
                n * self._UNIT_US[unit]
            ) // self._UNIT_US["d"]
        col = F.col(p.time)
        if dtype == "timestamp_ntz":
            # unix_micros rejects TIMESTAMP_NTZ (AnalysisException);
            # reinterpret in the session zone (UTC for this engine) so
            # RANGE frames get plain epoch-micros arithmetic
            col = col.cast("timestamp_ltz")
        return F.unix_micros(col), n * self._UNIT_US[unit]

    def transform(self, df: DataFrame) -> DataFrame:
        p = panel_cols(df)
        order_col, step = self._step(df, p)
        if order_col is None:
            ow = ordered_window(p.entity, p.time)
        else:
            ow = Window.partitionBy(p.entity).orderBy(order_col)
        cols = [F.col(p.entity), F.col(p.time)]
        out_names = []
        for w_size in self.window_sizes:
            shift = self.shift if self.shift is not None else w_size
            if order_col is None:
                frame = ow.rowsBetween(-(w_size - 1) - shift, -shift)
            else:
                frame = ow.rangeBetween(-(w_size - 1 + shift) * step, -shift * step)
            for v in p.values:
                x = F.col(v)
                exprs = {
                    "mean": F.avg(x).over(frame),
                    "min": F.min(x).over(frame),
                    "max": F.max(x).over(frame),
                    "mlm": F.max(x).over(frame) - F.min(x).over(frame),
                    "sum": F.sum(x).over(frame),
                    "std": F.stddev_samp(x).over(frame),
                    "cv": F.stddev_samp(x).over(frame) / F.avg(x).over(frame),
                }
                for s in self.stats:
                    name = f"{v}__rolling_{s}_{w_size}"
                    cols.append(exprs[s].alias(name))
                    out_names.append(name)
        out = df.select(*cols)
        if self.fill_strategy:
            ow_full = ordered_window(p.entity, p.time)
            upd = {}
            for c in out_names:
                if self.fill_strategy == "forward":
                    upd[c] = F.coalesce(
                        F.col(c),
                        F.last(c, ignorenulls=True).over(
                            ow_full.rowsBetween(Window.unboundedPreceding, 0)
                        ),
                    )
                elif self.fill_strategy == "backward":
                    upd[c] = F.coalesce(
                        F.col(c),
                        F.first(c, ignorenulls=True).over(
                            ow_full.rowsBetween(0, Window.unboundedFollowing)
                        ),
                    )
                elif self.fill_strategy == "mean":
                    upd[c] = F.coalesce(
                        F.col(c), F.avg(c).over(entity_window(p.entity))
                    )
                else:  # zero
                    upd[c] = F.coalesce(F.col(c), F.lit(0.0))
            out = out.withColumns(upd)
        return out


class scale(Transformer):
    """Per-entity standardization; invertible; reusable on new rows.

    Ref preprocessing.py:339-427. State = one small params DataFrame
    (entity, col_mean, col_std) broadcast-joined to the panel.
    """

    def __init__(self, use_mean: bool = True, use_std: bool = True):
        if not (use_mean or use_std):
            raise ValueError("at least one of use_mean/use_std must be True")
        self.use_mean = use_mean
        self.use_std = use_std
        self.params: DataFrame | None = None
        self._num_cols: list = []

    def transform(self, df: DataFrame) -> DataFrame:
        p = panel_cols(df)
        self._num_cols = numeric_cols(df, exclude=(p.entity, p.time))
        aggs = []
        for c in self._num_cols:
            aggs.append(F.avg(c).alias(f"{c}__mean"))
            aggs.append(F.stddev_samp(c).alias(f"{c}__std"))
        self.params = df.groupBy(p.entity).agg(*aggs)
        return self._apply(df)

    def _apply(self, df: DataFrame) -> DataFrame:
        p = panel_cols(df)
        out = df.join(F.broadcast(self.params), on=p.entity, how="left")
        upd = {}
        for c in self._num_cols:
            e = F.col(c)
            if self.use_mean:
                e = e - F.col(f"{c}__mean")
            if self.use_std:
                e = e / F.col(f"{c}__std")
            upd[c] = e
        return out.withColumns(upd).select(*df.columns)

    def transform_new(self, df: DataFrame) -> DataFrame:
        if self.params is None:
            raise RuntimeError("call transform() first")
        return self._apply(df)

    def invert(self, df: DataFrame) -> DataFrame:
        if self.params is None:
            raise RuntimeError("call transform() first")
        p = panel_cols(df)
        out = df.join(F.broadcast(self.params), on=p.entity, how="left")
        upd = {}
        for c in self._num_cols:
            if c not in df.columns:
                continue
            e = F.col(c)
            if self.use_std:
                e = e * F.col(f"{c}__std")
            if self.use_mean:
                e = e + F.col(f"{c}__mean")
            upd[c] = e
        return out.withColumns(upd).select(*df.columns)


class impute(Transformer):
    """Per-entity null imputation. Ref preprocessing.py:430-487.

    mean/median → per-entity window aggregates; ffill/bfill →
    last/first ignorenulls over ordered frames; interpolate → linear
    between the previous and next non-null (two-sided window trick);
    numeric constant → fill.
    """

    METHODS = ("mean", "median", "fill", "ffill", "bfill", "interpolate")

    def __init__(self, method):
        if isinstance(method, str) and method not in self.METHODS:
            raise ValueError(f"unsupported impute method {method}")
        self.method = method

    def transform(self, df: DataFrame) -> DataFrame:
        p = panel_cols(df)
        cols = numeric_cols(df, exclude=(p.entity, p.time))
        ew = Window.partitionBy(p.entity)
        ow = ordered_window(p.entity, p.time)
        fwd = ow.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        bwd = ow.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        m = self.method
        upd = {}
        for c in cols:
            x = F.col(c)
            if isinstance(m, (int, float)) and not isinstance(m, bool):
                upd[c] = F.coalesce(x, F.lit(float(m)))
            elif m == "mean":
                upd[c] = F.coalesce(x, F.avg(x).over(ew))
            elif m == "median":
                upd[c] = F.coalesce(x, F.median(x).over(ew))
            elif m == "fill":
                # float → mean, integer → median (ref :454-460)
                dt = dict(df.dtypes)[c]
                filler = F.avg(x).over(ew) if dt in ("double", "float") else F.median(x).over(ew)
                upd[c] = F.coalesce(x, filler)
            elif m == "ffill":
                upd[c] = F.coalesce(x, F.last(x, ignorenulls=True).over(fwd))
            elif m == "bfill":
                upd[c] = F.coalesce(x, F.first(x, ignorenulls=True).over(bwd))
            elif m == "interpolate":
                prev_v = F.last(x, ignorenulls=True).over(fwd)
                next_v = F.first(x, ignorenulls=True).over(bwd)
                rn = F.row_number().over(ow)
                prev_rn = F.last(F.when(x.isNotNull(), rn), ignorenulls=True).over(fwd)
                next_rn = F.first(F.when(x.isNotNull(), rn), ignorenulls=True).over(bwd)
                frac = (rn - prev_rn) / (next_rn - prev_rn)
                interp = prev_v + (next_v - prev_v) * frac
                upd[c] = F.coalesce(x, interp)
        return df.withColumns(upd)


class diff(Transformer):
    """Seasonal differencing of given order; invert reconstructs via
    cumulative sums seeded with the stored head rows.

    Ref preprocessing.py:490-573. State = first sp*order rows per
    entity (the reference stores head(1)/tail(1); we store what the
    inversion actually needs for sp>1).
    """

    def __init__(self, order: int = 1, sp: int = 1, fill_strategy: str | None = None):
        self.order = order
        self.sp = sp
        self.fill_strategy = fill_strategy
        self.seeds: list = []  # seed rows captured before each diff level

    def transform(self, df: DataFrame) -> DataFrame:
        p = panel_cols(df)
        cols = numeric_cols(df, exclude=(p.entity, p.time))
        ow = ordered_window(p.entity, p.time)
        rn = F.row_number().over(ow)
        self.seeds = []
        out = df
        for level in range(self.order):
            # level k's first non-null rows per phase sit at positions
            # [k*sp, (k+1)*sp) — those seed the inversion of level k
            lo, hi = level * self.sp, (level + 1) * self.sp
            self.seeds.append(
                out.withColumn("__rn", rn - 1)
                .filter((F.col("__rn") >= lo) & (F.col("__rn") < hi))
                .drop("__rn")
            )
            out = out.withColumns(
                {c: F.col(c) - F.lag(c, self.sp).over(ow) for c in cols}
            )
        if self.fill_strategy == "zero":
            out = out.na.fill(0.0, cols)
        return out

    def invert(self, df: DataFrame) -> DataFrame:
        """Undo each diff level in reverse: restore that level's seed
        values at the (null) seed positions, then cumulative-sum per
        seasonal phase. Deterministic — no duplicate-arbitration."""
        if not self.seeds:
            raise RuntimeError("call transform() first")
        p = panel_cols(df)
        cols = [c for c in numeric_cols(df, exclude=(p.entity, p.time))]
        ow = ordered_window(p.entity, p.time)
        out = df
        for seeds in reversed(self.seeds):
            seed_renamed = seeds.select(
                p.entity,
                p.time,
                *[F.col(c).alias(f"__seed_{c}") for c in cols],
            )
            out = out.join(seed_renamed, on=[p.entity, p.time], how="left")
            out = out.withColumns(
                {c: F.coalesce(f"__seed_{c}", c) for c in cols}
            ).drop(*[f"__seed_{c}" for c in cols])
            out = out.withColumn("__phase", (F.row_number().over(ow) - 1) % self.sp)
            pw = (
                Window.partitionBy(p.entity, "__phase")
                .orderBy(p.time)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            out = out.withColumns({c: F.sum(c).over(pw) for c in cols}).drop("__phase")
        return out


class log1p(Transformer):
    """log(1+x) with expm1 inverse. Ref preprocessing.py:738-768."""

    def transform(self, df: DataFrame) -> DataFrame:
        p = panel_cols(df)
        cols = numeric_cols(df, exclude=(p.entity, p.time))
        return df.withColumns({c: F.log1p(F.col(c)) for c in cols})

    def invert(self, df: DataFrame) -> DataFrame:
        p = panel_cols(df)
        cols = numeric_cols(df, exclude=(p.entity, p.time))
        return df.withColumns({c: F.expm1(F.col(c)) for c in cols})


class detrend(Transformer):
    """Remove per-entity linear (OLS-on-arange) or mean trend; invertible.

    Ref preprocessing.py:771-937. beta = cov(x, idx)/var(idx) and
    alpha = mean - beta*(n-1)/2 are plain aggregates — fully native,
    no UDF (the reference computes the identical formula with Polars
    window expressions at :791-806).
    """

    def __init__(self, method: str = "linear"):
        if method not in ("linear", "mean"):
            raise ValueError(f"method must be linear|mean, got {method}")
        self.method = method
        self.params: DataFrame | None = None
        self._num_cols: list = []

    def transform(self, df: DataFrame) -> DataFrame:
        p = panel_cols(df)
        self._num_cols = numeric_cols(df, exclude=(p.entity, p.time))
        ow = ordered_window(p.entity, p.time)
        idx = (F.row_number().over(ow) - 1).cast("double")
        with_idx = df.withColumn("__x", idx)
        if self.method == "linear":
            aggs = []
            for c in self._num_cols:
                beta = F.covar_samp(F.col(c), F.col("__x")) / F.var_samp("__x")
                aggs.append(beta.alias(f"{c}__beta"))
                aggs.append(
                    (F.avg(c) - beta * (F.count(c) - 1) / 2).alias(f"{c}__alpha")
                )
            self.params = with_idx.groupBy(p.entity).agg(*aggs)
            out = with_idx.join(F.broadcast(self.params), on=p.entity, how="left")
            upd = {
                c: F.col(c)
                - F.col(f"{c}__beta") * F.col("__x")
                - F.col(f"{c}__alpha")
                for c in self._num_cols
            }
        else:
            self.params = df.groupBy(p.entity).agg(
                *[F.avg(c).alias(f"{c}__mean") for c in self._num_cols]
            )
            out = with_idx.join(F.broadcast(self.params), on=p.entity, how="left")
            upd = {c: F.col(c) - F.col(f"{c}__mean") for c in self._num_cols}
        return out.withColumns(upd).select(*df.columns)

    def invert(self, df: DataFrame, offset: DataFrame | None = None) -> DataFrame:
        """Re-add the trend. For new (future) timestamps pass `offset`
        = (entity, offset) giving each entity's arange offset vs the
        fitted range (ref handles this with interval arithmetic at
        :861-910); defaults to offset 0 = inverting in-sample rows."""
        if self.params is None:
            raise RuntimeError("call transform() first")
        p = panel_cols(df)
        ow = ordered_window(p.entity, p.time)
        out = df.withColumn("__x", (F.row_number().over(ow) - 1).cast("double"))
        if offset is not None:
            out = out.join(F.broadcast(offset), on=p.entity, how="left")
            out = out.withColumn("__x", F.col("__x") + F.col("offset"))
        out = out.join(F.broadcast(self.params), on=p.entity, how="left")
        if self.method == "linear":
            upd = {
                c: F.col(c)
                + F.col(f"{c}__beta") * F.col("__x")
                + F.col(f"{c}__alpha")
                for c in self._num_cols
                if c in df.columns
            }
        else:
            upd = {
                c: F.col(c) + F.col(f"{c}__mean")
                for c in self._num_cols
                if c in df.columns
            }
        return out.withColumns(upd).select(*df.columns)


def _brent_bounded(fun, lo: float, hi: float, tol: float = 1e-12, maxiter: int = 500) -> float:
    """Golden-section bounded scalar minimizer (scipy-free).

    Stand-in for the reference's `optimize.minimize_scalar(...,
    bounds=(-2, 2), method='bounded')` (preprocessing.py:591-597);
    golden-section converges to the same optimum for these unimodal
    log-likelihoods.
    """
    gr = (5**0.5 - 1) / 2
    a, b = lo, hi
    c = b - gr * (b - a)
    d = a + gr * (b - a)
    fc, fd = fun(c), fun(d)
    for _ in range(maxiter):
        if abs(b - a) < tol:
            break
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = fun(c)
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = fun(d)
    return (a + b) / 2


def _boxcox_lmbd(x) -> float:
    """MLE lambda for Box-Cox: coarse-grid seed + Newton on the
    profile-likelihood gradient.

    Deliberately NOT a bracketing search: golden-section/Brent take
    branch decisions on near-equal likelihood values near convergence,
    which amplifies float-summation noise into ~1e-8 lambda wobble
    between engines. Newton iterates to a fixed point (the gradient
    root), which is engine-independent to ~1e-12 — that is what lets
    the DuckDB oracle replay this exact computation (grid argmax +
    15 Newton steps in a recursive CTE) and value-match at 6 decimals.
    The optimum is the same MLE a bounded Brent search finds.
    """
    import numpy as np

    x = np.asarray(x, dtype="float64")
    x = x[~np.isnan(x)]
    n = len(x)
    # grid probes at extreme lambdas transiently overflow/0-divide
    # before the guard rails reject them — expected; keep them out of
    # the executor logs (one warning per entity per task otherwise)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        m = np.log(x)
        s_log = m.sum()

        def neg_llf(lmb: float) -> float:
            y = m if abs(lmb) < 1e-19 else (np.power(x, lmb) - 1) / lmb
            var = y.var()
            if var <= 0:
                return np.inf
            return -((lmb - 1) * s_log - n / 2 * np.log(var))

        lam = min(
            (-2.0 + 0.05 * i for i in range(81)), key=lambda l: (neg_llf(l), l)
        )
        if lam == 0.0:  # Newton form divides by lambda; start just off 0
            lam = 0.025
        for _ in range(15):
            xl = np.power(x, lam)
            y = (xl - 1) / lam
            yp = (m * xl) / lam - y / lam
            ypp = (m * m * xl) / lam - 2 * (m * xl) / lam**2 + 2 * y / lam**2
            my, myp, mypp = y.mean(), yp.mean(), ypp.mean()
            v = (y * y).mean() - my * my
            vp = 2 * ((y * yp).mean() - my * myp)
            vpp = 2 * ((yp * yp).mean() + (y * ypp).mean() - myp * myp - my * mypp)
            g = -s_log + n / 2 * vp / v
            gp = n / 2 * (vpp * v - vp * vp) / (v * v)
            lam = min(2.0, max(-2.0, lam - g / gp))
    return lam


def _yeojohnson_lmbd(x) -> float:
    """MLE lambda for Yeo-Johnson: coarse-grid seed + Newton on the
    profile-likelihood gradient — the same fixed-point design as
    `_boxcox_lmbd` (see its docstring for why Newton, not bracketing:
    engine-exact replayability). The negative branch is the Box-Cox
    form in mu = 2 - lambda of (1 - x): y = -g(mu), so
    dy/dlambda = +g'(mu) and d2y/dlambda2 = -g''(mu)."""
    import numpy as np

    x = np.asarray(x, dtype="float64")
    x = x[~np.isnan(x)]
    n = len(x)
    pos = x >= 0
    m = np.log1p(np.abs(x))  # log(1+x) for pos, log(1-x) for neg
    sign_sum = (np.where(pos, m, -m)).sum()

    def _yj(lmb: float):
        y = np.empty_like(x)
        if abs(lmb) < 1e-19:
            y[pos] = m[pos]
        else:
            y[pos] = (np.power(x[pos] + 1, lmb) - 1) / lmb
        if abs(lmb - 2) < 1e-19:
            y[~pos] = -m[~pos]
        else:
            y[~pos] = -(np.power(-x[~pos] + 1, 2 - lmb) - 1) / (2 - lmb)
        return y

    def neg_llf(lmb: float) -> float:
        var = _yj(lmb).var()
        if var <= 0:
            return np.inf
        return -(-n / 2 * np.log(var) + (lmb - 1) * sign_sum)

    lam = min((-2.0 + 0.05 * i for i in range(81)), key=lambda l: (neg_llf(l), l))
    if lam == 0.0:  # pos-branch Newton form divides by lambda
        lam = 0.025
    if lam == 2.0:  # neg-branch divides by mu = 2 - lambda
        lam = 1.975
    for _ in range(15):
        y = np.empty_like(x)
        yp = np.empty_like(x)
        ypp = np.empty_like(x)
        # pos: boxcox derivatives in lambda on (1 + x)
        xl = np.power(x[pos] + 1, lam)
        y[pos] = (xl - 1) / lam
        yp[pos] = (m[pos] * xl) / lam - y[pos] / lam
        ypp[pos] = (
            (m[pos] * m[pos] * xl) / lam
            - 2 * (m[pos] * xl) / lam**2
            + 2 * y[pos] / lam**2
        )
        # neg: boxcox derivatives in mu on (1 - x), chain-ruled
        mu = 2.0 - lam
        z = np.power(-x[~pos] + 1, mu)
        gg = (z - 1) / mu
        gp = (m[~pos] * z) / mu - gg / mu
        gpp = (
            (m[~pos] * m[~pos] * z) / mu
            - 2 * (m[~pos] * z) / mu**2
            + 2 * gg / mu**2
        )
        y[~pos] = -gg
        yp[~pos] = gp
        ypp[~pos] = -gpp
        my, myp, mypp = y.mean(), yp.mean(), ypp.mean()
        v = (y * y).mean() - my * my
        vp = 2 * ((y * yp).mean() - my * myp)
        vpp = 2 * ((yp * yp).mean() + (y * ypp).mean() - myp * myp - my * mypp)
        g = -sign_sum + n / 2 * vp / v
        gp_ = n / 2 * (vpp * v - vp * vp) / (v * v)
        lam = min(1.975, max(-2.0, lam - g / gp_))
    return lam


class _power_transform(Transformer):
    """Shared machinery: per-entity lambda search (applyInPandas, the
    Spark analogue of the reference's map_batches at
    preprocessing.py:604-611) + native transform/invert expressions."""

    _lmbd_fn = None  # set by subclass

    def __init__(self):
        self.lmbds: DataFrame | None = None
        self._num_cols: list = []

    def _fit_lambdas(self, df: DataFrame) -> DataFrame:
        import pandas as pd

        p = panel_cols(df)
        cols = numeric_cols(df, exclude=(p.entity, p.time))
        self._num_cols = cols
        fn = type(self)._lmbd_fn
        entity_dtype = dict(df.dtypes)[p.entity]
        schema = f"{p.entity} {entity_dtype}, " + ", ".join(
            f"`{c}__lmbd` double" for c in cols
        )

        def fit(pdf: pd.DataFrame) -> pd.DataFrame:
            row = {p.entity: [pdf[p.entity].iloc[0]]}
            for c in cols:
                row[f"{c}__lmbd"] = [fn(pdf[c].to_numpy())]
            return pd.DataFrame(row)

        from functime_spark.pipeline._util import spread_groups

        return spread_groups(df, p.entity).groupBy(p.entity).applyInPandas(
            fit, schema=schema
        )

    def transform(self, df: DataFrame) -> DataFrame:
        p = panel_cols(df)
        self.lmbds = self._fit_lambdas(df)
        out = df.join(F.broadcast(self.lmbds), on=p.entity, how="left")
        upd = {c: self._fwd(F.col(c), F.col(f"{c}__lmbd")) for c in self._num_cols}
        return out.withColumns(upd).select(*df.columns)

    def invert(self, df: DataFrame) -> DataFrame:
        if self.lmbds is None:
            raise RuntimeError("call transform() first")
        p = panel_cols(df)
        out = df.join(F.broadcast(self.lmbds), on=p.entity, how="left")
        upd = {
            c: self._bwd(F.col(c), F.col(f"{c}__lmbd"))
            for c in self._num_cols
            if c in df.columns
        }
        return out.withColumns(upd).select(*df.columns)


class boxcox(_power_transform):
    """Per-entity Box-Cox: lambda = 0 → log(x), else (x^l - 1)/l.

    Ref preprocessing.py:576-651 (method='mle'); transform/invert are
    native `when` expressions, only the lambda search runs in Python.
    """

    _lmbd_fn = staticmethod(_boxcox_lmbd)

    def _fwd(self, x, l):
        return F.when(l == 0, F.log(x)).otherwise((F.pow(x, l) - 1) / l)

    def _bwd(self, y, l):
        return F.when(l == 0, F.exp(y)).otherwise(F.pow(y * l + 1, 1 / l))


class yeojohnson(_power_transform):
    """Per-entity Yeo-Johnson (four-branch formula).

    Ref preprocessing.py:654-735."""

    _lmbd_fn = staticmethod(_yeojohnson_lmbd)

    def _fwd(self, x, l):
        return (
            F.when((x >= 0) & (l == 0), F.log1p(x))
            .when(x >= 0, (F.pow(x + 1, l) - 1) / l)
            .when((x < 0) & (l == 2), -F.log1p(-x))
            .otherwise(-(F.pow(-x + 1, 2 - l) - 1) / (2 - l))
        )

    def _bwd(self, y, l):
        return (
            F.when((y >= 0) & (l == 0), F.exp(y) - 1)
            .when(y >= 0, F.pow(y * l + 1, 1 / l) - 1)
            .when((y < 0) & (l == 2), 1 - F.exp(-y))
            .otherwise(1 - F.pow(-(2 - l) * y + 1, 1 / (2 - l)))
        )


def _ffd_weights(d: float, min_weight: float | None, window_size: int | None) -> list:
    """Fractional-differencing weight sequence w_k = -w_{k-1}(d-k+1)/k.

    Driver-side recurrence mirroring the reference Rust kernel
    (src/preprocessing/fractional_differencing.rs:7-22); the weighted
    window dot-product itself stays a native Spark expression.
    """
    weights = [1.0]
    k = 1
    while True:
        w = -weights[k - 1] * (d - k + 1) / k
        if abs(w) < (min_weight or 0.0) or k > (window_size or 1000):
            break
        weights.append(w)
        k += 1
    return weights


class fractional_diff(Transformer):
    """Fractional differencing: fixed weighted sum over trailing lags.

    Ref preprocessing.py:1082-1126 + rust kernel. Weights are computed
    on the driver; the transform is sum_j w_j * lag(x, j) — pure
    window expressions, whole-stage codegen, no UDF (unlike the
    reference, which needed a Rust plugin)."""

    def __init__(self, d: float, min_weight: float | None = None, window_size: int | None = None):
        if (min_weight is None) == (window_size is None):
            raise ValueError("specify exactly one of min_weight/window_size")
        self.weights = _ffd_weights(d, min_weight, window_size)

    def transform(self, df: DataFrame) -> DataFrame:
        p = panel_cols(df)
        cols = numeric_cols(df, exclude=(p.entity, p.time))
        ow = ordered_window(p.entity, p.time)
        width = len(self.weights) - 1
        # reference reverses weights so weights[-1] multiplies the
        # current row: x_t contribution = w[0], lag j gets w[j]
        upd = {}
        for c in cols:
            x = F.col(c)
            acc = F.lit(self.weights[0]) * x
            for j in range(1, width + 1):
                acc = acc + F.lit(self.weights[j]) * F.lag(x, j).over(ow)
            upd[c] = acc
        return df.withColumns(upd)


class deseasonalize_fourier(Transformer):
    """Per-entity OLS on Fourier terms; residual = deseasonalized.

    Ref preprocessing.py:940-1079. The reference fits a sklearn
    regressor per entity and stores it pickled in a column; here the
    fit is a per-entity numpy lstsq inside ``applyInPandas`` that
    returns only the (2K+1) coefficients, and every transform /
    invert / transform_new is a native broadcast-join + sin/cos dot
    product (whole-stage codegen, no Python on the hot path).

    ``robust=True`` uses Huber IRLS instead of plain OLS (the
    reference's ``robust`` maps to Theil-Sen but its default-arg bug
    at preprocessing.py:960-963 routes it to LinearRegression anyway;
    we pick a sane robust estimator and document the divergence).

    State: ``self.betas`` — an n_entities-row DataFrame
    (entity, __n, __b0, __bs1.., __bc1..); ``self._seasonal`` — the
    lazy per-row seasonal component for exact inversion of fit rows.
    Future rows (beyond each entity's cutoff) get rank = n + offset,
    matching the reference's continued Fourier index.
    """

    def __init__(self, sp: int, K: int, robust: bool = False):
        self.sp = sp
        self.K = K
        self.robust = robust
        self.betas: DataFrame | None = None
        self._seasonal: DataFrame | None = None
        self._target: str | None = None

    def _design(self, rank):
        import math

        coef = (rank % self.sp) / float(self.sp)
        terms = []
        for k in range(1, self.K + 1):
            terms.append(F.sin(2 * math.pi * k * coef))
        for k in range(1, self.K + 1):
            terms.append(F.cos(2 * math.pi * k * coef))
        return terms

    def _seasonal_expr(self, rank):
        terms = self._design(rank)
        acc = F.col("__b0")
        for k in range(1, self.K + 1):
            acc = acc + F.col(f"__bs{k}") * terms[k - 1]
            acc = acc + F.col(f"__bc{k}") * terms[self.K + k - 1]
        return acc

    def _fit(self, df: DataFrame) -> DataFrame:
        import numpy as np
        import pandas as pd

        p = panel_cols(df)
        v = self._target
        sp, K, robust = self.sp, self.K, self.robust
        entity_dtype = dict(df.dtypes)[p.entity]
        beta_cols = (
            ["__b0"]
            + [f"__bs{k}" for k in range(1, K + 1)]
            + [f"__bc{k}" for k in range(1, K + 1)]
        )
        schema = (
            f"{p.entity} {entity_dtype}, __n long, "
            + ", ".join(f"{c} double" for c in beta_cols)
        )

        def fit(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(p.time)
            y = pdf[v].to_numpy(dtype="float64")
            n = len(y)
            rank = np.arange(n)
            coef = (rank % sp) / float(sp)
            X = np.column_stack(
                [np.ones(n)]
                + [np.sin(2 * np.pi * k * coef) for k in range(1, K + 1)]
                + [np.cos(2 * np.pi * k * coef) for k in range(1, K + 1)]
            )
            beta = np.linalg.lstsq(X, y, rcond=None)[0]
            if robust:
                for _ in range(20):  # Huber IRLS, delta = 1.345*sigma
                    r = y - X @ beta
                    s = np.median(np.abs(r)) / 0.6745 or 1.0
                    w = np.clip(1.345 * s / np.maximum(np.abs(r), 1e-12), None, 1.0)
                    beta_new = np.linalg.lstsq(X * w[:, None], y * w, rcond=None)[0]
                    if np.allclose(beta_new, beta, atol=1e-10):
                        beta = beta_new
                        break
                    beta = beta_new
            row = {p.entity: [pdf[p.entity].iloc[0]], "__n": [n]}
            for c, b in zip(beta_cols, beta):
                row[c] = [float(b)]
            return pd.DataFrame(row)

        from functime_spark.pipeline._util import spread_groups

        return spread_groups(df, p.entity).groupBy(p.entity).applyInPandas(
            fit, schema=schema
        )

    def transform(self, df: DataFrame) -> DataFrame:
        p = panel_cols(df)
        if len(df.columns) != 3:
            raise ValueError("deseasonalize_fourier expects a 3-column (entity, time, target) panel")
        self._target = p.target
        self.betas = self._fit(df)
        rank = F.row_number().over(ordered_window(p.entity, p.time)) - 1
        joined = df.join(F.broadcast(self.betas), on=p.entity, how="left")
        seasonal = self._seasonal_expr(rank)
        out = joined.withColumn("__seasonal", seasonal)
        self._seasonal = out.select(p.entity, p.time, "__seasonal")
        return out.withColumn(p.target, F.col(p.target) - F.col("__seasonal")).select(
            *df.columns
        )

    def _seasonal_for(self, df: DataFrame) -> DataFrame:
        """(entity, time, __seasonal) for arbitrary rows: exact join for
        fit rows, continued rank n + offset for future rows."""
        p = panel_cols(df)
        base = df.select(p.entity, p.time).join(
            self._seasonal, on=[p.entity, p.time], how="left"
        )
        future = base.filter(F.col("__seasonal").isNull()).drop("__seasonal")
        if future.isEmpty():
            return base
        rank = (
            F.row_number().over(ordered_window(p.entity, p.time))
            - 1
            + F.col("__n")
        )
        fut = (
            future.join(F.broadcast(self.betas), on=p.entity, how="left")
            .withColumn("__seasonal", self._seasonal_expr(rank))
            .select(p.entity, p.time, "__seasonal")
        )
        return base.filter(F.col("__seasonal").isNotNull()).unionByName(fut)

    def invert(self, df: DataFrame) -> DataFrame:
        if self.betas is None:
            raise RuntimeError("call transform() first")
        p = panel_cols(df)
        out = df.join(self._seasonal_for(df), on=[p.entity, p.time], how="left")
        return out.withColumn(
            p.target, F.col(p.target) + F.col("__seasonal")
        ).select(*df.columns)

    def transform_new(self, df: DataFrame) -> DataFrame:
        if self.betas is None:
            raise RuntimeError("call transform() first")
        p = panel_cols(df)
        out = df.join(self._seasonal_for(df), on=[p.entity, p.time], how="left")
        return out.withColumn(
            p.target, F.col(p.target) - F.col("__seasonal")
        ).select(*df.columns)


class clip_outliers(Transformer):
    """Per-entity quantile winsorization (beyond-reference: the
    standard outlier guard before scaling/fitting).

    Values outside [q_lower, q_upper] of their own series clamp to
    the bound. State = one small (entity, per-col lo/hi) params
    DataFrame broadcast-joined back — the same shape as `scale`, so
    transform_new clips fresh rows with the FITTED bounds. Exact
    `F.percentile` (one shuffle-free aggregate pass + broadcast join);
    not invertible (clipping is lossy)."""

    def __init__(self, lower: float = 0.01, upper: float = 0.99):
        if not (0.0 <= lower < upper <= 1.0):
            raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
        self.lower = lower
        self.upper = upper
        self.params: DataFrame | None = None
        self._num_cols: list = []

    def transform(self, df: DataFrame) -> DataFrame:
        p = panel_cols(df)
        self._num_cols = numeric_cols(df, exclude=(p.entity, p.time))
        aggs = []
        for c in self._num_cols:
            aggs.append(F.percentile(c, F.lit(self.lower)).alias(f"{c}__lo"))
            aggs.append(F.percentile(c, F.lit(self.upper)).alias(f"{c}__hi"))
        self.params = df.groupBy(p.entity).agg(*aggs)
        return self.transform_new(df)

    def transform_new(self, df: DataFrame) -> DataFrame:
        if self.params is None:
            raise RuntimeError("call transform() first")
        p = panel_cols(df)
        out = df.join(F.broadcast(self.params), on=p.entity, how="left")
        upd = {
            c: F.least(
                F.greatest(F.col(c), F.col(f"{c}__lo")), F.col(f"{c}__hi")
            )
            for c in self._num_cols
        }
        return out.withColumns(upd).select(*df.columns)
