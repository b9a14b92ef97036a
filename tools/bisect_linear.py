"""A/B bisect harness for the linear_forecast bench query (VERDICT r6 #1).

Times fit and predict separately (median of reps) for the bench's q4
shape — linear_model(freq="1h", lags=12).fit(events_sf0.1);
predict(14).count() — with each round-6 change on the path
individually REVERTED in-process:

  variant=head       : code as-is
  variant=nadrop     : _suff_stats na.drop reverted to features-only
                       (the r5 form, no target column in the subset)
  variant=broadcast  : broadcast_value bypassed -> raw sc.broadcast
  variant=both       : both reverts

Run each variant as its own process on an otherwise idle machine:
  for v in head nadrop broadcast both; do
      python3 tools/bisect_linear.py $v; done
The third r6 change on the file (attach_future_x's on_short rework) is
not on this path: the bench query has no exogenous X, and without X
linear_model never calls attach_future_x.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.1"
REPS = 9


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "head"
    import numpy as np

    import functime_spark.forecasting._ar as _ar

    if variant in ("nadrop", "both"):
        # the r5 form: count(*) over feature-complete rows only
        def _suff_stats_r5(self, df, feature_cols, target_col):
            k = len(feature_cols)
            names = [f"`{c}`" for c in feature_cols] + (
                ["1.0"] if self.fit_intercept else []
            )
            m = len(names)
            exprs = []
            for i in range(m):
                for j in range(i, m):
                    exprs.append(f"sum({names[i]} * {names[j]}) AS xx_{i}_{j}")
                exprs.append(f"sum({names[i]} * `{target_col}`) AS xy_{i}")
            exprs.append("count(*) AS nn")
            row = df.na.drop(subset=feature_cols).selectExpr(*exprs).first()
            xtx = np.zeros((m, m))
            xty = np.zeros(m)
            for i in range(m):
                for j in range(i, m):
                    xtx[i, j] = xtx[j, i] = row[f"xx_{i}_{j}"]
                xty[i] = row[f"xy_{i}"]
            return xtx, xty, float(row["nn"]), k

        _ar.LinearBackend._suff_stats = _suff_stats_r5

    if variant in ("broadcast", "both"):
        _ar.broadcast_value = lambda spark, obj: spark.sparkContext.broadcast(obj)

    from functime_spark.forecasting.linear import linear_model
    from functime_spark.session import get_session
    from functime_spark.sources.tables import events_panel

    spark = get_session("bisect")
    spark.sparkContext.setLogLevel("ERROR")

    def _noop(it):
        import pandas as pd  # noqa: F401

        yield from it

    spark.range(1).mapInPandas(_noop, schema="id long").count()

    y = events_panel(spark, SF_DIR)
    y.count()  # warm the scan

    fits, preds = [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fc = linear_model(freq="1h", lags=12).fit(y)
        t1 = time.perf_counter()
        fc.predict(14).count()
        t2 = time.perf_counter()
        fits.append(t1 - t0)
        preds.append(t2 - t1)
    print(
        json.dumps(
            {
                "variant": variant,
                "fit_median": round(statistics.median(fits), 4),
                "predict_median": round(statistics.median(preds), 4),
                "total_median": round(
                    statistics.median([a + b for a, b in zip(fits, preds)]), 4
                ),
                "reps": REPS,
            }
        )
    )


if __name__ == "__main__":
    main()
