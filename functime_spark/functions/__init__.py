"""Feature extraction functions over panel DataFrames.

Two tiers, mirroring the reference's expression/plugin split
(reference feature_extractors.py):

- `features` (native tier): ~40 extractors expressed purely with
  built-in pyspark.sql.functions aggregates + window functions, so the
  whole extraction stays inside whole-stage codegen. Many features
  fuse into ONE groupBy pass via `extract_features`.
- `features_udf` (UDF tier): genuinely sequential / numerical kernels
  (entropy family, FFT, Lempel-Ziv, CUSUM...) as Arrow-batched
  grouped-map pandas UDFs — the Spark analogue of the reference's Rust
  plugin escape hatch (reference src/feature_extraction/*.rs).
"""

from functime_spark.functions import features  # noqa: F401
from functime_spark.functions.features import extract_features, FEATURES  # noqa: F401
