"""functime_spark — a PySpark-native time-series analytics engine.

A from-scratch re-expression of the capabilities of functime
(functime-org/functime) on Apache Spark: panel (entity, time, value)
feature extraction, preprocessing transformers, cross-validation
splitters, forecast metrics, global forecasters, plus large-scale
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing).

Architecture is Spark-first: every operator is declared with the
DataFrame API so Catalyst/Tungsten pick the physical plan; Python only
crosses the Arrow boundary (pandas UDFs) for genuinely sequential
per-series kernels.

Panel convention (mirrors reference base/forecaster.py:20,
preprocessing.py:35): column 0 = entity id, column 1 = time, remaining
columns = target/features.
"""

__version__ = "0.1.0"

from functime_spark.backtesting import backtest  # noqa: F401
from functime_spark.panel import Panel  # noqa: F401
from functime_spark.session import get_session  # noqa: F401
