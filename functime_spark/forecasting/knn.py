"""k-nearest-neighbour and approximate-NN autoregressive forecasters.

Mirrors functime forecasting/knn.py (sklearn KNeighborsRegressor over
the global lag matrix) and forecasting/lance.py:16-113 (`ann`: Lance
IVF_PQ index over lag vectors, nearest-centroid probing).

Spark-first design
------------------
The training lag matrix is built distributed (one window pass,
`make_reduction`), then sampled to a broadcast-able reference set
(`max_train_rows`, uniform per-partition sampling — at 100 TB the
training matrix cannot live on one node, and kNN quality degrades
gracefully under uniform sampling). Queries stay fully distributed:
each Arrow batch of entities scans the broadcast matrix vectorized in
numpy — embarrassingly parallel across entities, no shuffle at predict
time.

`ann` replaces the exact scan with an IVF coarse quantizer (k-means
centroids trained driver-side on the broadcast sample, ref
lance.py:60-67's IVF_PQ): queries probe the `n_probe` nearest
centroid buckets only, cutting the scan factor to ~n_probe/n_cells.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from functime_spark.forecasting._ar import make_reduction, make_y_lag, stack_buffers
from functime_spark.forecasting.base import Forecaster
from functime_spark.compat import broadcast_value


def _kmeans(X: np.ndarray, k: int, iters: int = 10, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    cents = X[rng.choice(len(X), size=min(k, len(X)), replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = X[m].mean(0)
    return cents


def _brute_knn_step(ref_payload):
    """fn(feats[E,k]) -> yhat[E] over the broadcast reference matrix.

    Queries are processed in row chunks that cap the E x n_ref
    distance matrix at ~8M doubles (64 MB): an unchunked step on a
    full Arrow batch against a 100k-row reference allocates
    multi-GB temporaries per recursion step and thrashes instead of
    computing. r.r is hoisted out of the per-chunk loop."""
    feats_ref, targs_ref, k = ref_payload
    rr = (feats_ref * feats_ref).sum(1)[None, :]
    kk = min(k, feats_ref.shape[0])
    chunk = max(1, (1 << 23) // max(1, feats_ref.shape[0]))

    def step(q: np.ndarray) -> np.ndarray:
        out = np.empty(len(q), dtype="float64")
        for s in range(0, len(q), chunk):
            qq = q[s : s + chunk]
            # ||q - r||^2 = q.q - 2 q.r + r.r ; argpartition for top-k
            d = (qq * qq).sum(1)[:, None] - 2.0 * (qq @ feats_ref.T) + rr
            idx = np.argpartition(d, kk - 1, axis=1)[:, :kk]
            out[s : s + chunk] = targs_ref[idx].mean(1)
        return out

    return step


class knn(Forecaster):
    """kNN regression on lag vectors. Ref knn.py:10-34. Strategies:
    recursive (default), direct (per-horizon reference-column slices
    of one shared broadcast matrix — no extra collects), ensemble.
    """

    def __init__(
        self,
        freq: str,
        lags: int = 12,
        n_neighbors: int = 5,
        max_train_rows: int = 100_000,
        strategy: str = "recursive",
        max_horizons: int | None = None,
        target_transform=None,
    ):
        super().__init__(freq=freq, lags=lags, target_transform=target_transform)
        self.n_neighbors = n_neighbors
        self.max_train_rows = max_train_rows
        self.strategy = strategy
        self.max_horizons = max_horizons
        if strategy in ("direct", "ensemble") and max_horizons is None:
            raise ValueError("direct/ensemble strategy requires max_horizons")

    def _init_kwargs(self) -> dict:
        return {
            "freq": self.freq,
            "lags": self.lags,
            "n_neighbors": self.n_neighbors,
            "max_train_rows": self.max_train_rows,
            "strategy": self.strategy,
            "max_horizons": self.max_horizons,
        }

    def _design_width(self) -> int:
        if self.strategy in ("direct", "ensemble"):
            return self.lags + self.max_horizons - 1
        return self.lags

    def _collect_train(self, y: DataFrame, X: DataFrame | None):
        p = self.state["panel"]
        width = self._design_width()
        # exogenous columns join the reference matrix after the lag
        # block (the reference's sklearn KNeighborsRegressor fits the
        # full design, ref knn.py:25-34 + fit_autoreg)
        x_cols = list(X.columns[2:]) if X is not None else []
        self.state["x_cols"] = x_cols
        feature_cols = [f"{p.target}__lag_{k}" for k in range(1, width + 1)]
        cached = (
            make_reduction(y, width, X)
            .select(*feature_cols, *x_cols, p.target)
            .persist()
        )
        n = cached.count()  # materializes the cache; the collect below re-reads it
        self.state["sampled"] = n > self.max_train_rows
        design = cached
        if self.state["sampled"]:
            design = cached.sample(
                fraction=min(1.0, self.max_train_rows / n * 1.05), seed=7
            ).limit(self.max_train_rows)
        pdf = design.toPandas()
        cached.unpersist()
        feats = pdf[feature_cols + x_cols].to_numpy(dtype="float64")
        targs = pdf[p.target].to_numpy(dtype="float64")
        return feats, targs

    def _fit(self, y: DataFrame, X: DataFrame | None = None):
        self.state["train"] = self._collect_train(y, X)
        self.state["y_lag"] = make_y_lag(y, self.lags).persist()
        self._cutoffs_from_y_lag()

    def _predict_values(self, fh: int, X: DataFrame | None = None) -> DataFrame:
        from functime_spark.forecasting._ar import mean_ensemble

        state = self._future_state(fh, X)
        if self.strategy == "recursive":
            return self._predict_recursive(fh, state)
        if self.strategy == "direct":
            return self._predict_direct(fh, state)
        return mean_ensemble(
            self._predict_recursive(fh, state), self._predict_direct(fh, state)
        )

    def _future_state(self, fh: int, X: DataFrame | None) -> DataFrame:
        from functime_spark.forecasting._ar import attach_future_x

        state = self.state["y_lag"]
        x_cols = self.state.get("x_cols") or []
        if x_cols:
            if X is None:
                raise ValueError(
                    "forecaster was fit with exogenous X; predict needs X_future"
                )
            state = attach_future_x(state, X, x_cols, fh, on_short=self._x_on_short)
        return state

    def _predict_direct(self, fh: int, y_lag: DataFrame) -> DataFrame:
        """Horizon h scans reference columns h-1 .. h-1+lags (the
        direct design slice); query features are the last observed
        lags for every horizon. Ref predict_direct _ar.py:277-330."""
        entity = y_lag.columns[0]
        entity_dtype = dict(y_lag.dtypes)[entity]
        lags, mh = self.lags, self.max_horizons
        spark = y_lag.sparkSession
        feats_ref, targs_ref = self.state["train"]
        x_cols = self.state.get("x_cols") or []
        width = self._design_width()
        b = broadcast_value(spark, 
            (feats_ref, targs_ref, self.n_neighbors, x_cols, width)
        )

        def run(batches: Iterator) -> Iterator:
            import pandas as pd

            from functime_spark.forecasting._ar import _x_matrix

            wide, targs, k, x_names, w = b.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ents = pdf[entity].to_numpy()
                buf = stack_buffers(pdf["__buf"], lags)
                base_q = buf[:, ::-1][:, :lags]
                xs = _x_matrix(pdf, x_names, fh, len(ents)) if x_names else None
                preds = np.empty((len(ents), fh), dtype="float64")
                for h in range(fh):
                    lo = min(h, mh - 1)
                    ref = np.ascontiguousarray(
                        np.hstack([wide[:, lo : lo + lags], wide[:, w:]])
                        if x_names
                        else wide[:, lo : lo + lags]
                    )
                    step_fn = _brute_knn_step((ref, targs, k))
                    q = (
                        np.hstack([base_q, xs[:, h, :]]) if x_names else base_q
                    )
                    preds[:, h] = step_fn(q)
                yield pd.DataFrame(
                    {
                        entity: np.repeat(ents, fh),
                        "step": np.tile(np.arange(fh), len(ents)),
                        "__yhat": preds.ravel(),
                    }
                )

        schema = f"{entity} {entity_dtype}, step int, __yhat double"
        # the per-entity state frame is tiny after its aggregate, so AQE
        # coalesces it to ONE partition and the whole Arrow scan would run
        # in a single task; spread it across the cluster first (no-op when
        # the frame is already parallel)
        from functime_spark.pipeline._util import spread_for_cpu

        return spread_for_cpu(y_lag).mapInPandas(run, schema=schema)

    def _predict_recursive(self, fh: int, y_lag: DataFrame) -> DataFrame:
        entity = y_lag.columns[0]
        entity_dtype = dict(y_lag.dtypes)[entity]
        lags = self.lags
        spark = y_lag.sparkSession
        feats_ref, targs_ref = self.state["train"]
        x_cols = self.state.get("x_cols") or []
        # recursive scan uses the first `lags` reference columns plus
        # the exogenous block, which sits AFTER all width lag columns —
        # width > lags under the ensemble strategy, so slice both
        # blocks explicitly rather than assuming they are adjacent
        width = self._design_width()
        ref = (
            np.ascontiguousarray(
                np.hstack([feats_ref[:, :lags], feats_ref[:, width:]])
            )
            if x_cols
            else np.ascontiguousarray(feats_ref[:, :lags])
        )
        b = broadcast_value(spark, 
            (ref, targs_ref, self.n_neighbors, x_cols)
        )

        def run(batches: Iterator) -> Iterator:
            import pandas as pd

            from functime_spark.forecasting._ar import _x_matrix

            ref_feats, targs, k, x_names = b.value
            step_fn = _brute_knn_step((ref_feats, targs, k))
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ents = pdf[entity].to_numpy()
                buf = stack_buffers(pdf["__buf"], lags)
                xs = _x_matrix(pdf, x_names, fh, len(ents)) if x_names else None
                preds = np.empty((len(ents), fh), dtype="float64")
                for h in range(fh):
                    q = buf[:, ::-1][:, :lags]
                    if x_names:
                        q = np.hstack([q, xs[:, h, :]])
                    yhat = step_fn(q)
                    preds[:, h] = yhat
                    buf = np.concatenate([buf[:, 1:], yhat[:, None]], axis=1)
                yield pd.DataFrame(
                    {
                        entity: np.repeat(ents, fh),
                        "step": np.tile(np.arange(fh), len(ents)),
                        "__yhat": preds.ravel(),
                    }
                )

        schema = f"{entity} {entity_dtype}, step int, __yhat double"
        # the per-entity state frame is tiny after its aggregate, so AQE
        # coalesces it to ONE partition and the whole Arrow scan would run
        # in a single task; spread it across the cluster first (no-op when
        # the frame is already parallel)
        from functime_spark.pipeline._util import spread_for_cpu

        return spread_for_cpu(y_lag).mapInPandas(run, schema=schema)


class ann(knn):
    """IVF-probed approximate kNN. Ref lance.py:16-113 (IVF_PQ)."""

    def __init__(
        self,
        freq: str,
        lags: int = 12,
        n_neighbors: int = 5,
        n_cells: int = 64,
        n_probe: int = 4,
        max_train_rows: int = 100_000,
        target_transform=None,
    ):
        super().__init__(
            freq=freq,
            lags=lags,
            n_neighbors=n_neighbors,
            max_train_rows=max_train_rows,
            target_transform=target_transform,
        )
        self.n_cells = n_cells
        self.n_probe = n_probe

    def _init_kwargs(self) -> dict:
        kw = super()._init_kwargs()
        kw.update({"n_cells": self.n_cells, "n_probe": self.n_probe})
        return kw

    def _fit(self, y: DataFrame, X: DataFrame | None = None):
        feats, targs = self._collect_train(y, X)
        cents = _kmeans(feats, self.n_cells)
        assign = (
            ((feats[:, None, :] - cents[None, :, :]) ** 2).sum(-1).argmin(1)
        )
        order = np.argsort(assign, kind="stable")
        bounds = np.searchsorted(assign[order], np.arange(len(cents) + 1))
        self.state["train"] = (feats[order], targs[order], cents, bounds)
        self.state["y_lag"] = make_y_lag(y, self.lags).persist()
        self._cutoffs_from_y_lag()

    def _predict_values(self, fh: int, X: DataFrame | None = None) -> DataFrame:
        # re-pack broadcast payload for the IVF step function; the
        # centroid space spans lag + exogenous dims when fit with X
        y_lag = self._future_state(fh, X)
        entity = y_lag.columns[0]
        entity_dtype = dict(y_lag.dtypes)[entity]
        lags = self.lags
        spark = y_lag.sparkSession
        feats_s, targs_s, cents, bounds = self.state["train"]
        x_cols = self.state.get("x_cols") or []
        b = broadcast_value(spark, 
            (feats_s, targs_s, cents, bounds, self.n_neighbors, self.n_probe, x_cols)
        )

        def run(batches: Iterator) -> Iterator:
            import pandas as pd

            from functime_spark.forecasting._ar import _x_matrix

            feats_ref, targs_ref, C, bd, k, n_probe, x_names = b.value

            def step_fn(q: np.ndarray) -> np.ndarray:
                dc = (
                    (q * q).sum(1)[:, None]
                    - 2.0 * (q @ C.T)
                    + (C * C).sum(1)[None, :]
                )
                probes = np.argsort(dc, axis=1)[:, :n_probe]
                out = np.empty(len(q))
                for i in range(len(q)):
                    idxs = np.concatenate(
                        [np.arange(bd[c], bd[c + 1]) for c in probes[i]]
                    )
                    if len(idxs) == 0:
                        idxs = np.arange(len(feats_ref))
                    d = ((feats_ref[idxs] - q[i]) ** 2).sum(1)
                    kk = min(k, len(idxs))
                    near = np.argpartition(d, kk - 1)[:kk]
                    out[i] = targs_ref[idxs[near]].mean()
                return out

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ents = pdf[entity].to_numpy()
                buf = stack_buffers(pdf["__buf"], lags)
                xs = _x_matrix(pdf, x_names, fh, len(ents)) if x_names else None
                preds = np.empty((len(ents), fh), dtype="float64")
                for h in range(fh):
                    q = buf[:, ::-1][:, :lags]
                    if x_names:
                        q = np.hstack([q, xs[:, h, :]])
                    yhat = step_fn(q)
                    preds[:, h] = yhat
                    buf = np.concatenate([buf[:, 1:], yhat[:, None]], axis=1)
                yield pd.DataFrame(
                    {
                        entity: np.repeat(ents, fh),
                        "step": np.tile(np.arange(fh), len(ents)),
                        "__yhat": preds.ravel(),
                    }
                )

        schema = f"{entity} {entity_dtype}, step int, __yhat double"
        # the per-entity state frame is tiny after its aggregate, so AQE
        # coalesces it to ONE partition and the whole Arrow scan would run
        # in a single task; spread it across the cluster first (no-op when
        # the frame is already parallel)
        from functime_spark.pipeline._util import spread_for_cpu

        return spread_for_cpu(y_lag).mapInPandas(run, schema=schema)
