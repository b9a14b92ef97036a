"""Spark-Connect-safe materialization.

``DataFrame.localCheckpoint`` is the cheapest lineage cut on a classic
session (block-manager persisted, no cluster-wide checkpoint dir), and
the repo leans on it everywhere a small derived frame feeds several
plan branches (count tables, signature stores, backtest stacks,
connected-components rounds). Spark Connect, however, only grew a
localCheckpoint RPC recently and older Connect servers reject it — so
the 100 TB story must survive a Connect-only cluster.

``materialize`` is the single seam: localCheckpoint when the session
supports it, else CHECKPOINT-TO-TABLE — write the frame to a parquet
directory and read it back. That is a true lineage cut (the persist
alternative keeps the full logical plan alive, which lets planning
cost and the cache-manager's strong references grow without bound
across iterative fits — measured as a session death 40 minutes into
the forced-fallback suite), works over pure SQL/DataFrame RPCs, and
keeps every scan-amplification plan pin intact (each materialized
frame re-enters the plan as ONE parquet scan).

The fallback directory defaults to ``<spark.sql.warehouse.dir>/
_functime_materialize/<session-uuid>`` — shared storage on a real
cluster, ``spark-warehouse/`` locally — and is overridable with
``FUNCTIME_SPARK_MATERIALIZE_DIR``. Files live until the directory is
cleaned like any checkpoint dir.

Set ``FUNCTIME_SPARK_NO_LOCAL_CHECKPOINT=1`` to force the fallback
path (used by the test suite to prove Connect-compatibility of every
call site without a Connect server in the container).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame

FORCE_FALLBACK = os.environ.get("FUNCTIME_SPARK_NO_LOCAL_CHECKPOINT", "") == "1"

_FALLBACK_BASE: str | None = None


def _fallback_path(spark) -> str:
    """One session-scoped base dir, one fresh subdir per materialize."""
    global _FALLBACK_BASE
    if _FALLBACK_BASE is None:
        base = os.environ.get("FUNCTIME_SPARK_MATERIALIZE_DIR")
        if not base:
            wh = spark.conf.get("spark.sql.warehouse.dir", "") or "/tmp"
            for prefix in ("file://", "file:"):
                if wh.startswith(prefix):
                    wh = wh[len(prefix):]
                    break
            base = f"{wh.rstrip('/')}/_functime_materialize"
        _FALLBACK_BASE = f"{base}/{uuid.uuid4().hex}"
    return f"{_FALLBACK_BASE}/{uuid.uuid4().hex}"


def _is_connect(spark) -> bool:
    """True for a Spark Connect client session (pyspark.sql.connect.*)."""
    return "connect" in type(spark).__module__


def _is_unsupported_rpc(exc: Exception) -> bool:
    """Connect-server capability errors only — NOT data-dependent job
    failures, which must propagate: an older server answers the
    localCheckpoint RPC with UNIMPLEMENTED / 'not supported', an older
    client lacks the method entirely."""
    if isinstance(exc, (AttributeError, NotImplementedError)):
        return True
    msg = str(exc).lower()
    return any(
        s in msg
        for s in ("unimplemented", "not supported", "unsupported", "not implemented")
    )


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Pin `df`'s values and cut its lineage.

    Classic session: localCheckpoint (``eager`` passed through) with
    NO fallback — a genuine job failure during the eager checkpoint
    (ANSI error, executor loss) propagates instead of being masked by
    a silent parquet re-execution (ADVICE r6). Spark Connect: try the
    localCheckpoint RPC; only a capability rejection (UNIMPLEMENTED /
    missing method on older servers or clients) falls back to the
    parquet round-trip — always eager, a true lineage cut, one scan in
    every downstream plan."""
    if not FORCE_FALLBACK:
        if not _is_connect(df.sparkSession):
            return df.localCheckpoint(eager=eager)
        try:
            return df.localCheckpoint(eager=eager)
        except Exception as exc:  # Connect server/client without the RPC
            if not _is_unsupported_rpc(exc):
                raise
    spark = df.sparkSession
    path = _fallback_path(spark)
    df.write.parquet(path)
    return spark.read.parquet(path)
