"""sf1 stress harness: the flagship composites at 10x the bench scale.

Round-4's sf0.1 stress surfaced three real bugs (stopword wipeout, AQE
byte-coalescing serialization, NTZ rejection); this runs the next order
of magnitude — ~50k documents / 1M events / 20k embeddings — through
the PUBLIC API end-to-end:

  1. clean_corpus            (gopher + minhash dedup + tiers)
  2. minhash_dedup -> connected_components -> canonical keep
  3. linear_model fit+predict (10x the entity count)
  4. elite fit+predict        (backtest x bank x blend)
  5. curate_media (real Netpbm decode) + WebDataset write/read with
     byte-content invariants (r8)
  6. BM25 retrieval three ways (direct / persisted index /
     fit-half+update-half incremental) with an exact score-identity
     invariant, plus hybrid RRF range checks (r9)
  7. pack_shards(shuffle=True) on the cleaned corpus

Data is generated ONCE under .stress/sf1 (gitignored) by replicating
the read-only /root/testdata/sf0.1 tables 10x with deterministic key
offsets; document copies alternate exact duplicates / near duplicates /
perturbed uniques so the dedup graph has real >=10-member clusters.
Events keep their values on copy 0 and jitter 1% per extra copy so the
forecasters see 10x distinct series, micro-timestamps (load_events'
timestamp branch). Usage:

    python3 tools/stress_sf1.py [--regen]

Prints one JSON line of per-stage wall seconds + row counts. Findings
belong in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SRC = "/root/testdata/sf0.1"
COPIES = int(os.environ.get("SPARK_STRESS_COPIES", "10"))
STRESS_DIR = REPO / ".stress" / f"x{COPIES}"


TABLES = ("documents", "events", "embeddings")


def _complete(d: Path) -> bool:
    return all((d / f"{t}.parquet").is_file() and (d / f"{t}.parquet").stat().st_size > 0 for t in TABLES)


def generate(regen: bool = False) -> None:
    import duckdb

    if STRESS_DIR.exists():
        # a killed earlier run can leave zero-byte files behind —
        # treat anything incomplete as regen-needed, never as a cache
        if not regen and _complete(STRESS_DIR):
            return
        shutil.rmtree(STRESS_DIR)
    # write into a temp dir and rename so the cache dir is atomic
    tmp = STRESS_DIR.parent / (STRESS_DIR.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    con = duckdb.connect()
    ks = ", ".join(str(k) for k in range(COPIES))
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + CAST(k.k AS BIGINT) * 100000000 AS doc_id,
                 CASE WHEN k.k = 0 THEN d.text
                      WHEN d.doc_id % 3 = 0 THEN d.text
                      WHEN d.doc_id % 3 = 1 THEN d.text || ' rev' || k.k
                      ELSE 'copy ' || k.k || ': ' || d.text || ' tail' || k.k
                 END AS text,
                 d.lang, d.source, d.n_chars
          FROM read_parquet('{SRC}/documents.parquet') d,
               (SELECT unnest([{ks}]) AS k) k
        ) TO '{tmp}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.event_id + CAST(k.k AS BIGINT) * 100000000 AS event_id,
                 e.ts,
                 e.user_id + CAST(k.k AS BIGINT) * 1000000 AS user_id,
                 e.event_type,
                 e.value * (1.0 + k.k * 0.01) AS value,
                 e.props
          FROM read_parquet('{SRC}/events.parquet') e,
               (SELECT unnest([{ks}]) AS k) k
        ) TO '{tmp}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT v.vec_id + CAST(k.k AS BIGINT) * 1000000 AS vec_id,
                 list_transform(v.embedding,
                   x -> CAST(x * (1.0 + k.k * 0.003) AS FLOAT)) AS embedding,
                 v.label
          FROM read_parquet('{SRC}/embeddings.parquet') v,
               (SELECT unnest([{ks}]) AS k) k
        ) TO '{tmp}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    assert _complete(tmp), "stress data generation produced incomplete files"
    tmp.rename(STRESS_DIR)


def main() -> None:
    generate(regen="--regen" in sys.argv)

    # size the single-JVM heap for the replica scale: at 100x the
    # 25M-pair banding shuffle + checkpoint blocks sit at the edge of
    # the 8g test default (one 100x run passed, the rerun OOMed an
    # executor task — heap-edge flakiness). On a real cluster this is
    # ordinary executor sizing; here the driver IS the executor.
    os.environ.setdefault(
        "SPARK_DRIVER_MEMORY", "32g" if COPIES >= 50 else "12g"
    )

    from pyspark.sql import functions as F

    import functime_spark as fts
    from functime_spark.sources.tables import events_panel, load_table

    spark = fts.get_session("stress-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    sf = str(STRESS_DIR)
    out: dict = {"sf": f"{COPIES}x sf0.1 replica", "stages": {}}

    def stage(name, fn):
        t0 = time.monotonic()
        res = fn()
        out["stages"][name] = {"sec": round(time.monotonic() - t0, 2), **res}
        print(f"  {name}: {out['stages'][name]}", file=sys.stderr)

    docs = load_table(spark, sf, "documents")

    def run_clean():
        from functime_spark.pipeline.clean import clean_corpus

        # same corpus-tuned gopher knobs as the gate query: the
        # synthetic docs average ~54 words with few English stopwords,
        # so Rae defaults drop the whole corpus (r4 finding; documented
        # at q_corpus_clean_attrition)
        clean, report = clean_corpus(
            docs,
            gopher_params={"min_words": 10, "min_stopword_hits": 0},
            max_tier=2,
            # pinned: the stress invariants (attrition chain) were
            # recorded under exact-percentile tier cuts; the library
            # default is now the bounded-state sketch
            exact_tiers=True,
        )
        rows = clean.count()
        rep = {r["stage"]: (r["docs_in"], r["docs_out"]) for r in report.collect()}
        return {"docs_out": rows, "attrition": rep}

    def run_span_dedup():
        # r10: cross-doc span dedup at replica scale. Invariants:
        # token conservation (both modes see every token exactly once),
        # keep-first dominance (exempting each gram's canonical first
        # copy can only ever KEEP more tokens), and the recorded totals
        # must reproduce byte-identically run-over-run — the span count
        # tracks the replicated-boilerplate volume (~linear in copies),
        # never corpus^2.
        from pyspark.sql import functions as SF

        from functime_spark.pipeline.dedup import scrub_duplicated_spans

        scrub = scrub_duplicated_spans(docs, k=8).agg(
            SF.sum("n_tokens"), SF.sum("n_kept"), SF.sum("n_dup_spans")
        ).first()
        keep = scrub_duplicated_spans(docs, k=8, keep_first=True).agg(
            SF.sum("n_tokens"), SF.sum("n_kept"), SF.sum("n_dup_spans")
        ).first()
        assert scrub[0] == keep[0], "token conservation broken across modes"
        assert keep[1] >= scrub[1], "keep-first must keep at least as much"
        return {
            "tokens": int(scrub[0]),
            "kept_scrub": int(scrub[1]),
            "spans_scrub": int(scrub[2]),
            "kept_keepfirst": int(keep[1]),
            "spans_keepfirst": int(keep[2]),
        }

    def run_dedup_cluster():
        from functime_spark.pipeline.dedup import (
            connected_components,
            dedup_keep_canonical,
            minhash_dedup,
        )

        pairs = minhash_dedup(docs, threshold=0.8)
        pairs = pairs.localCheckpoint()
        comps = connected_components(pairs)
        kept = dedup_keep_canonical(docs, pairs)
        sizes = (
            comps.groupBy("component").count().groupBy("count").count().collect()
        )
        return {
            "pairs": pairs.count(),
            "clustered_docs": comps.count(),
            "kept": kept.count(),
            "cluster_size_hist": {int(r["count"]): int(r[1]) for r in sizes},
        }

    panel = events_panel(spark, sf)

    def run_linear():
        from functime_spark.forecasting.linear import linear_model

        fc = linear_model(freq="1h", lags=8).fit(panel)
        return {"forecast_rows": fc.predict(12).count()}

    def run_elite():
        from functime_spark.forecasting.elite import elite

        fc = elite(freq="1h", lags=8, sp=24).fit(panel)
        return {"forecast_rows": fc.predict(4).count()}

    def run_knn():
        # exercises the max_train_rows driver-side bound: at 100x the
        # panel is ~10M design rows, far past the collected reference
        # matrix cap, so the bounded-sample path must engage. Brute
        # kNN is memory-bandwidth-bound (n_entities x n_ref distance
        # stream per step) — the IVF stage below is the scale path.
        from functime_spark.forecasting.knn import knn

        fc = knn(freq="1h", lags=8, n_neighbors=5).fit(panel)
        return {"forecast_rows": fc.predict(4).count()}

    def run_ann():
        # the designed scale path past brute kNN: IVF coarse quantizer
        # probes n_probe of n_cells centroid buckets, cutting the
        # per-step distance stream by ~n_cells/n_probe
        from functime_spark.forecasting.knn import ann

        fc = ann(
            freq="1h", lags=8, n_neighbors=5, n_cells=64, n_probe=4
        ).fit(panel)
        return {"forecast_rows": fc.predict(4).count()}

    def run_media():
        # r7 verdict item 5: the codec tier under stress with pinned
        # CONTENT invariants (attrition chain, distinct-payload count,
        # byte-identical WebDataset round-trip) — the dedup-histogram
        # discipline. Payloads are the gate's deterministic P5 graymap
        # construction (corrupt %7 / thumbnail %3 / five-id dedup
        # groups) over the replicated documents table, decoded by the
        # REAL Netpbm codec in curate_media's one mapInPandas pass.
        import shutil as _shutil

        from functime_spark.pipeline.multimodal import curate_media
        from functime_spark.pipeline.webdataset import (
            read_webdataset,
            write_webdataset,
        )

        h = F.unhex(F.md5(F.expr("CAST(doc_id DIV 5 AS STRING)")))
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
        curated, report = curate_media(
            media, decoder="ppm", min_width=3, min_height=3, dim=4
        )
        rep = {r["stage"]: (r["rows_in"], r["rows_out"]) for r in report.collect()}
        wds_dir = STRESS_DIR / "wds_media"
        if wds_dir.exists():
            _shutil.rmtree(wds_dir)
        samples = curated.select(
            F.col("media_id").cast("string").alias("key"),
            F.lit("ppm").alias("ext"),
            F.col("payload"),
        )
        manifest = write_webdataset(samples, str(wds_dir), n_shards=8)
        written = manifest.agg(
            F.sum("n_members").alias("m"), F.sum("n_bytes").alias("b")
        ).first()
        back = read_webdataset(spark, str(wds_dir))
        rt = back.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.md5("payload")).alias("dp"),
        ).first()
        curated_stats = curated.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.md5("payload")).alias("dp"),
        ).first()
        # byte-content invariants: every curated payload survives the
        # tar round-trip, and post-dedup every payload is unique
        assert int(rt["n"]) == int(written["m"]) == int(curated_stats["n"])
        assert int(rt["dp"]) == int(curated_stats["dp"]) == int(curated_stats["n"])
        _shutil.rmtree(wds_dir)
        return {
            "attrition": rep,
            "curated": int(curated_stats["n"]),
            "distinct_payloads": int(curated_stats["dp"]),
            "wds_members": int(written["m"]),
            "wds_bytes": int(written["b"]),
            "roundtrip_rows": int(rt["n"]),
        }

    def run_retrieval():
        # r9: the retrieval tier under stress with an EXACT three-way
        # identity invariant — direct bm25_topk == BM25Index.search ==
        # fit-half+update-half incremental search, on the rounded
        # (score, id) ranking — i.e. the associative-merge claim held
        # at replica scale, where partial-aggregation order differs
        # from the sf0.01 gate. Hybrid RRF must return a full top-10
        # with every fused score in (0, 2/61].
        from functime_spark.pipeline.similarity import (
            BM25Index,
            bm25_topk,
            hybrid_rrf_topk,
        )

        q = "hash join scan"
        key = lambda rows: [(r["doc_id"], r["bm25"]) for r in rows]  # noqa: E731
        direct = bm25_topk(docs, q, k=10, rank_decimals=6).collect()
        indexed = BM25Index().fit(docs).search(
            q, k=10, rank_decimals=6
        ).collect()
        half = BM25Index().fit(docs.filter(F.col("doc_id") % 2 == 0))
        half.update(docs.filter(F.col("doc_id") % 2 == 1))
        inc = half.search(q, k=10, rank_decimals=6).collect()
        assert key(direct) == key(indexed) == key(inc)
        emb = load_table(spark, sf, "embeddings")
        qvec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
        fused = hybrid_rrf_topk(
            docs, emb.filter(F.col("vec_id") != 0), q, list(qvec),
            k=10, n_candidates=50, rank_decimals=6,
        ).collect()
        assert len(fused) == 10
        assert all(0.0 < r["rrf"] <= 2.0 / 61.0 + 1e-12 for r in fused)
        return {
            "top1_bm25": float(direct[0]["bm25"]),
            "top10_bm25": float(direct[-1]["bm25"]),
            "hybrid_rows": len(fused),
        }

    def run_pack():
        from functime_spark.pipeline.packing import pack_shards

        packed = pack_shards(docs, tokens_per_shard=4096, shuffle=True)
        agg = packed.agg(
            F.countDistinct("shard").alias("shards"),
            F.count(F.lit(1)).alias("rows"),
        ).first()
        return {"rows": int(agg["rows"]), "shards": int(agg["shards"])}

    stage("clean_corpus", run_clean)
    stage("span_dedup_keepfirst", run_span_dedup)
    stage("minhash_cluster", run_dedup_cluster)
    stage("linear_forecast", run_linear)
    stage("elite_forecast", run_elite)
    stage("knn_forecast", run_knn)
    stage("ann_forecast", run_ann)
    stage("media_curate_wds", run_media)
    stage("retrieval_bm25_hybrid", run_retrieval)
    stage("pack_shards_shuffled", run_pack)
    out["total_sec"] = round(sum(s["sec"] for s in out["stages"].values()), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
