"""Structured Streaming operators (beyond-reference capability).

The reference's "streaming" is Polars' out-of-core batch engine
(SURVEY §1.4) — it has no event-time semantics. These operators give
the same panel API a real streaming story: watermarked resampling,
sliding-window feature aggregation, and stateful changepoint
detection, all batch/stream symmetric (the same call works on a
static DataFrame and on a readStream DataFrame).
"""

from functime_spark.streaming.ops import (  # noqa: F401
    sessionize,
    stream_audio_dedup,
    stream_cusum,
    stream_dhash_dedup,
    stream_exact_dedup,
    stream_minhash_dedup,
    stream_resample,
    stream_rolling_stats,
)
