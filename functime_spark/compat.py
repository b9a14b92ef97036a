"""Spark-Connect compatibility seams (driver-side API differences).

``sparkContext.broadcast`` does not exist on a Spark Connect client —
the SparkContext lives server-side only. Every model-state handoff
into an Arrow kernel therefore goes through ``broadcast_value``:
a real torrent broadcast on a classic session, plain closure capture
(the value rides the pickled function payload) under Connect. The
states shipped this way are all small by construction — fitted
coefficients, stump/tree lists, vocab-bounded LM count tables,
max_train_rows-bounded kNN lag matrices, benchmark probes — so
payload shipping is correct, just without block-level dedup across
tasks on the same executor.

Set ``FUNCTIME_SPARK_NO_SC_BROADCAST=1`` to force the closure-capture
path (used by the test suite to prove Connect-compatibility of every
call site without a Connect server in the container).

See also functime_spark.materialize for the localCheckpoint seam.
"""

from __future__ import annotations

import os

FORCE_PLAIN = os.environ.get("FUNCTIME_SPARK_NO_SC_BROADCAST", "") == "1"


class _PlainValue:
    """Duck-typed Broadcast stand-in: exposes `.value`, pickles with
    the capturing closure."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value


def broadcast_value(spark, obj):
    """Broadcast `obj` to Arrow kernels: `sc.broadcast` when the
    session has a SparkContext, else (Connect, or the fallback forced)
    a plain `.value` holder captured by the UDF closure."""
    if not FORCE_PLAIN:
        try:
            return spark.sparkContext.broadcast(obj)
        except Exception:  # Spark Connect client: no sparkContext
            pass
    return _PlainValue(obj)
