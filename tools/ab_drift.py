"""Interleaved A/B harness for unexplained bench drift (VERDICT r8 #1).

Times the three queries that drifted r7->r8 WITHOUT any r8 change on
their code paths — ann_topk (+30%), resample_naive_smape (+26%),
minhash_dedup (+18%) — against an arbitrary repo tree:

  python3 tools/ab_drift.py <repo_root> [reps] [query ...]

With explicit query names (r10), only those legs run — currently
`ann_topk`, `resample_naive_smape`, `minhash_dedup`, and
`trees_d2_fit_forecast` (added to adjudicate the r10 trees wobble the
same way). One PROCESS per invocation (own JVM + Spark session, the
bisect_linear discipline); the caller interleaves invocations across
trees so machine-state drift hits both sides equally:

  git worktree add .bench_ab/r7 <r7-commit>
  for i in 1 2 3; do
      python3 tools/ab_drift.py /root/repo
      python3 tools/ab_drift.py /root/repo/.bench_ab/r7
  done

Query bodies are copied verbatim from bench.py q3/q7/q8 (identical in
both trees — the point is the trees' LIBRARY code, which the bodies
exercise through the same public calls both rounds had).
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

ROOT = sys.argv[1] if len(sys.argv) > 1 else str(Path(__file__).resolve().parents[1])
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
ONLY = set(sys.argv[3:])
SF_DIR = "/root/testdata/sf0.1"

sys.path.insert(0, ROOT)


def main() -> None:
    from pyspark.sql import functions as F

    from functime_spark.forecasting.naive import naive
    from functime_spark.operators.cross_validation import train_test_split
    from functime_spark.operators.metrics import smape
    from functime_spark.operators.preprocessing import resample
    from functime_spark.pipeline.dedup import minhash_dedup
    from functime_spark.session import get_session
    from functime_spark.sources.tables import events_panel, load_table

    spark = get_session("ab_drift")
    spark.sparkContext.setLogLevel("ERROR")

    def _noop(it):
        import pandas as pd  # noqa: F401

        yield from it

    spark.range(1).mapInPandas(_noop, schema="id long").count()
    y = events_panel(spark, SF_DIR)
    y.count()  # warm the scan

    def _resample():
        daily = resample("1d", "sum", "ffill").transform(y).persist()
        try:
            train, test = train_test_split(daily, test_size=7)
            y_pred = naive(freq="1d").fit(train).predict(7)
            smape(test, y_pred).count()
        finally:
            daily.unpersist()

    def _ann_topk():
        emb = load_table(spark, SF_DIR, "embeddings")
        qvec = emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv")
        )
        a = F.col("embedding").cast("array<double>")
        b = F.col("qv").cast("array<double>")
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, v: x * v), F.lit(0.0), lambda acc, v: acc + v
        )
        nrm = lambda v: F.sqrt(  # noqa: E731
            F.aggregate(
                F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
            )
        )
        (
            emb.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(qvec))
            .select("vec_id", (dot / (nrm(a) * nrm(b))).alias("cos"))
            .orderBy(F.desc("cos"))
            .limit(10)
            .collect()
        )

    def _minhash():
        docs = load_table(spark, SF_DIR, "documents")
        minhash_dedup(docs, threshold=0.5).count()

    def _trees_d2():
        from functime_spark.forecasting.tree import boosted_trees_d2

        fc = boosted_trees_d2(freq="1h", lags=2, n_iter=3).fit(y)
        fc.predict(4).count()

    def _media_curate():
        # verbatim bench.py q16 (r11: adjudicate the +56% judge-vs-judge
        # move on the only touched comparable leg); the call shape
        # predates the r10 exif params so it runs in both trees
        from functime_spark.pipeline.multimodal import curate_media

        docs = load_table(spark, SF_DIR, "documents")
        h = F.unhex(F.md5((F.col("doc_id") / 5).cast("long").cast("string")))
        payload = (
            F.when(F.col("doc_id") % 7 == 0, F.lit(b"corrupt bytes"))
            .when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(b"P5\n2 2\n255\n"), F.substring(h, 1, 4)),
            )
            .otherwise(F.concat(F.lit(b"P5\n4 4\n255\n"), h))
        )
        media = docs.select(
            F.col("doc_id").alias("media_id"),
            F.lit("image").alias("kind"),
            payload.alias("payload"),
            F.lit("{}").alias("meta"),
        )
        curated, _ = curate_media(
            media, decoder="ppm", min_width=3, min_height=3, dim=4
        )
        curated.count()

    out = {"root": ROOT, "reps": REPS}
    legs = (
        ("ann_topk", _ann_topk),
        ("resample_naive_smape", _resample),
        ("minhash_dedup", _minhash),
        ("trees_d2_fit_forecast", _trees_d2),
        ("media_curate", _media_curate),
    )
    default = {"ann_topk", "resample_naive_smape", "minhash_dedup"}
    for name, fn in legs:
        if (ONLY and name not in ONLY) or (not ONLY and name not in default):
            continue
        samples = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(samples), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
