"""Spark-Connect-safe materialization.

``DataFrame.localCheckpoint`` is the cheapest lineage cut on a classic
session (block-manager persisted, no cluster-wide checkpoint dir), and
the repo leans on it everywhere a small derived frame feeds several
plan branches (count tables, signature stores, backtest stacks,
connected-components rounds). Spark Connect, however, only grew a
localCheckpoint RPC recently and older Connect servers reject it — so
the 100 TB story must survive a Connect-only cluster.

``materialize`` is the single seam: localCheckpoint when the session
supports it, else persist (+ an eager count to force computation).
The persist fallback does not CUT lineage, but re-executions read the
cached blocks, which bounds scan amplification the same way — the
property every call site actually needs.

Set ``FUNCTIME_SPARK_NO_LOCAL_CHECKPOINT=1`` to force the fallback
path (used by the test suite to prove Connect-compatibility of every
call site without a Connect server in the container).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

FORCE_FALLBACK = os.environ.get("FUNCTIME_SPARK_NO_LOCAL_CHECKPOINT", "") == "1"


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Pin `df`'s values and bound downstream scan amplification.

    Classic session: localCheckpoint (lineage cut). Spark Connect
    without the localCheckpoint RPC (or with the fallback forced):
    persist, plus an eager count when ``eager`` so the blocks exist
    before the caller unpersists/overwrites upstream state."""
    if not FORCE_FALLBACK:
        try:
            return df.localCheckpoint(eager=eager)
        except Exception:  # Connect server without the RPC
            pass
    out = df.persist()
    if eager:
        out.count()
    return out
