"""Capture .explain('formatted') for every bench leg's principal frame.

Usage:
    python3 tools/capture_plans.py <suffix> [leg ...]

Writes plans/r11/<leg>_<suffix>.txt for each leg (suffix = "before" /
"after"). Each builder mirrors the corresponding bench.py leg and
returns the final DataFrame(s) whose execution the leg times; fits
that must run to produce state (trees, IVF, BM25) run exactly as in
the bench so the captured plan is the one the timed action executes.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = Path(__file__).resolve().parent.parent / "plans" / "r11"


def main() -> None:
    from pyspark.sql import functions as F

    from functime_spark.session import get_session
    from functime_spark.functions.features import extract_features
    from functime_spark.forecasting.linear import linear_model
    from functime_spark.forecasting.naive import naive
    from functime_spark.operators.cross_validation import train_test_split
    from functime_spark.operators.metrics import score_forecast, smape
    from functime_spark.operators.preprocessing import resample, scale, lag
    from functime_spark.sources.tables import events_panel, load_table

    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    spark = get_session("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    OUT_DIR.mkdir(parents=True, exist_ok=True)

    y = events_panel(spark, SF_DIR)

    def build_features_all():
        return extract_features(y)

    def build_preproc_scale_lag():
        return lag([1, 2, 3, 7, 14]).transform(scale().transform(y))

    def build_resample_naive_smape():
        daily = resample("1d", "sum", "ffill").transform(y).persist()
        train, test = train_test_split(daily, test_size=7)
        y_pred = naive(freq="1d").fit(train).predict(7)
        return smape(test, y_pred)

    def build_linear_forecast():
        fc = linear_model(freq="1h", lags=12).fit(y)
        return fc.predict(14)

    def build_metrics_fused():
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("ts")
        y_pred = y.select(
            "user_id", "ts", F.lag("value").over(w).alias("value")
        ).na.drop()
        return score_forecast(y, y_pred, y)

    def build_doc_pipeline():
        from functime_spark.pipeline.dedup import exact_dedup

        docs = load_table(spark, SF_DIR, "documents")
        return exact_dedup(docs)

    def build_ann_topk():
        emb = load_table(spark, SF_DIR, "embeddings")
        qvec = emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv")
        )
        a = F.col("embedding").cast("array<double>")
        b = F.col("qv").cast("array<double>")
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, v: x * v), F.lit(0.0), lambda acc, v: acc + v
        )
        nrm = lambda v: F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
            )
        )
        return (
            emb.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(qvec))
            .select("vec_id", (dot / (nrm(a) * nrm(b))).alias("cos"))
            .orderBy(F.desc("cos"))
            .limit(10)
        )

    def build_minhash_dedup():
        from functime_spark.pipeline.dedup import minhash_dedup

        docs = load_table(spark, SF_DIR, "documents")
        return minhash_dedup(docs, threshold=0.5)

    def build_lm_quality_tiers():
        from functime_spark.pipeline.lm import ngram_lm_score, quality_tiers

        docs = load_table(spark, SF_DIR, "documents")
        return quality_tiers(ngram_lm_score(docs), exact=True)

    def build_tpch_q5_star_join():
        li = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders")
        c = load_table(spark, SF_DIR, "customer")
        s = load_table(spark, SF_DIR, "supplier")
        n = load_table(spark, SF_DIR, "nation")
        r = load_table(spark, SF_DIR, "region")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(s, li.l_suppkey == s.s_suppkey)
            .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .filter(F.col("r_name") == "ASIA")
            .groupBy("n_name")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        )

    def build_trees_d2_fit_forecast():
        from functime_spark.forecasting.tree import boosted_trees_d2

        fc = boosted_trees_d2(freq="1h", lags=2, n_iter=3).fit(y)
        return fc.predict(4)

    def build_ann_ivf_topk():
        from functime_spark.pipeline.similarity import IVFIndex

        emb = load_table(spark, SF_DIR, "embeddings")
        qvec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
        ivf = IVFIndex(n_cells=16, init="spread").fit(emb)
        assigned = ivf.assign(emb.filter(F.col("vec_id") != 0))
        return ivf.search(assigned, list(qvec), k=10, n_probe=4)

    def build_ann_ivf_pq():
        from functime_spark.pipeline.similarity import (
            IVFIndex,
            PQCodebook,
            ivf_pq_search,
        )

        emb = load_table(spark, SF_DIR, "embeddings")
        qvec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
        corpus = emb.filter(F.col("vec_id") != 0)
        ivf = IVFIndex(n_cells=16, init="spread").fit(emb)
        pq = PQCodebook(n_subspaces=8, ksub=16, n_iter=5, init="spread").fit(emb)
        enc = pq.encode(ivf.assign(corpus))
        return ivf_pq_search(ivf, pq, enc, list(qvec), k=10, n_probe=4, refine=4)

    def build_bm25_topk():
        from functime_spark.pipeline.similarity import bm25_topk

        docs = load_table(spark, SF_DIR, "documents")
        return bm25_topk(docs, "hash join scan", k=10)

    def build_bm25_indexed_search():
        import tempfile

        from functime_spark.pipeline.similarity import BM25Index

        d = tempfile.mkdtemp(prefix="plans_bm25_")
        docs = load_table(spark, SF_DIR, "documents")
        BM25Index().fit(docs).save(d)
        idx = BM25Index.load(spark, d)
        return idx.search("hash join scan", k=10)

    def build_media_curate():
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
        return curated

    def build_span_dedup_keepfirst():
        from functime_spark.pipeline.dedup import scrub_duplicated_spans

        docs = load_table(spark, SF_DIR, "documents")
        return scrub_duplicated_spans(docs, k=8, keep_first=True).agg(
            F.sum("n_kept")
        )

    def build_lm3_quality_tiers():
        from functime_spark.pipeline.lm import ngram_lm3_score, quality_tiers

        docs = load_table(spark, SF_DIR, "documents")
        return quality_tiers(ngram_lm3_score(docs), exact=True)

    def build_unigram_fit_tokenize():
        from functime_spark.pipeline.unigram import fit_unigram, unigram_tokenize

        docs = load_table(spark, SF_DIR, "documents")
        pieces = fit_unigram(
            docs, vocab_size=64, max_piece_len=3, em_rounds=2,
            seed_size=200, max_words=5000, max_word_len=16,
        )
        return unigram_tokenize(docs, pieces).agg(F.sum("n_unigram_tokens"))

    def build_audio_fingerprint_dups():
        import struct

        import numpy as np

        from functime_spark.pipeline.audio import audio_near_dups

        n, rate = 1000, 8000
        header = (
            b"RIFF" + struct.pack("<I", 36 + 2 * n) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            + b"data" + struct.pack("<I", 2 * n)
        )

        def build(batches):
            import pandas as pd

            i = np.arange(n, dtype=np.int64)
            for pdf in batches:
                payloads = []
                for g in pdf["g"]:
                    u = (i * (104729 + 2741 * int(g))) % 65536
                    v = np.where(u < 32768, u, u - 65536).astype("<i2")
                    payloads.append(header + v.tobytes())
                yield pd.DataFrame(
                    {
                        "media_id": pdf["doc_id"],
                        "kind": "audio",
                        "payload": payloads,
                    }
                )

        media = (
            load_table(spark, SF_DIR, "documents")
            .select("doc_id", (F.col("doc_id") % 199).alias("g"))
            .mapInPandas(
                build, schema="media_id long, kind string, payload binary"
            )
        )
        return audio_near_dups(media, decoder="wav", min_matches=5)

    builders = {
        "features_all": build_features_all,
        "preproc_scale_lag": build_preproc_scale_lag,
        "resample_naive_smape": build_resample_naive_smape,
        "linear_forecast": build_linear_forecast,
        "metrics_fused": build_metrics_fused,
        "doc_pipeline": build_doc_pipeline,
        "ann_topk": build_ann_topk,
        "minhash_dedup": build_minhash_dedup,
        "lm_quality_tiers": build_lm_quality_tiers,
        "tpch_q5_star_join": build_tpch_q5_star_join,
        "trees_d2_fit_forecast": build_trees_d2_fit_forecast,
        "ann_ivf_topk": build_ann_ivf_topk,
        "ann_ivf_pq": build_ann_ivf_pq,
        "bm25_topk": build_bm25_topk,
        "bm25_indexed_search": build_bm25_indexed_search,
        "media_curate": build_media_curate,
        "span_dedup_keepfirst": build_span_dedup_keepfirst,
        "lm3_quality_tiers": build_lm3_quality_tiers,
        "unigram_fit_tokenize": build_unigram_fit_tokenize,
        "audio_fingerprint_dups": build_audio_fingerprint_dups,
    }
    for name, build in builders.items():
        if only and name not in only:
            continue
        try:
            df = build()
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # keep going; record the failure
            txt = f"CAPTURE FAILED: {exc!r}"
        out = OUT_DIR / f"{name}_{suffix}.txt"
        out.write_text(txt)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
