"""Link-graph operators for corpus curation.

PageRank gives a training-data pipeline its authority prior: rank
crawl domains/documents by link structure, then weight sampling or
quality tiers by it (the "curation by reference popularity" recipe).
The reference has no graph surface — beyond-reference, like the dedup
connected-components tier (dedup.py) this composes with.

Scale shape: each iteration is ONE join (edges x ranks on src) + ONE
aggregate (contributions by dst) — the Pregel/GraphX message pattern
expressed relationally, so Catalyst/AQE handle skew and the edge
table's partitioning is reused across iterations. Ranks are
materialized per iteration (bounded: one row per node), severing the
would-be n_iter-deep lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from functime_spark.materialize import materialize


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Standard damped PageRank over a directed edge list, fixed
    `n_iter` power iterations (deterministic — no convergence test, so
    the run is replayable in SQL term for term).

    r_0(v) = 1/N;  r_k(v) = (1-d)/N + d * (sum over in-edges (u,v) of
    r_{k-1}(u)/outdeg(u)  +  dangling_mass_{k-1}/N)

    where dangling mass is the total rank sitting on nodes with no
    out-edges (redistributed uniformly, the textbook treatment that
    keeps sum(rank) == 1 every iteration). Parallel edges contribute
    once each (a page linking twice votes twice); self-loops are
    ordinary edges. Returns (node, rank).

    At 100 TB: the edge table is the big side and never moves between
    iterations beyond its join shuffle; ranks are |V| rows. The one
    driver-side scalar per iteration is the dangling mass (a SUM —
    same class as BM25's avgdl pull)."""
    if n_iter < 1:
        raise ValueError("pagerank needs n_iter >= 1")
    if not (0.0 < damping < 1.0):
        raise ValueError("damping must be in (0, 1)")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = materialize(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    deg = materialize(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    )
    ranks = materialize(
        nodes.select("node", (F.lit(1.0) / n).alias("rank"))
    )
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        # rank mass on nodes with no out-edges, redistributed uniformly
        dangling = (
            ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
            .agg(F.sum("rank"))
            .first()[0]
            or 0.0
        )
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("__deg")).alias("__c"))
        )
        ranks = materialize(
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__c"), F.lit(0.0))
                        + F.lit(float(dangling) / n)
                    )
                ).alias("rank"),
            )
        )
    return ranks


def domain_authority(
    docs: DataFrame,
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    id_col: str = "doc_id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Documents joined with their PageRank over a link graph — the
    curation-weighting composite (docs with no graph presence get the
    teleport floor (1-d)/N so a downstream `w * rank` never zeroes a
    document out entirely). Returns the doc frame + a `rank` column."""
    pr = pagerank(
        edges, n_iter=n_iter, damping=damping,
        src_col=src_col, dst_col=dst_col,
    )
    n = pr.count()
    floor = (1.0 - damping) / n if n else 0.0
    return docs.join(
        pr, docs[id_col] == pr["node"], "left"
    ).select(
        *[docs[c] for c in docs.columns],
        F.coalesce(pr["rank"], F.lit(floor)).alias("rank"),
    )
