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

    def run_audio_fp():
        # r11: audio constellation dedup at replica scale. Every copy
        # of a base doc carries the SAME slope-varied sawtooth WAV
        # (slope keyed by base = doc_id % 1e8, which the replica
        # offsets preserve), so the EXACT invariants are:
        #   (1) fingerprint rows scale LINEARLY: rows(Nx) == N * rows(1x)
        #       (fingerprinting is row-local and deterministic);
        #   (2) same-base pairs are the duplication structure: for
        #       every base whose clip has >= 5 landmark hashes, all
        #       C(N, 2) copy pairs surface with n_matches == that
        #       base's hash count — pairs track duplication**2, never
        #       corpus**2 (cross-base collision pairs are recorded,
        #       not asserted: two sawtooths may legitimately share
        #       spectral furniture).
        import struct

        import numpy as np

        from functime_spark.pipeline.audio import (
            audio_fingerprints,
            audio_near_dups,
        )

        n, rate = 1000, 8000
        header = (
            b"RIFF" + struct.pack("<I", 36 + 2 * n) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            + b"data" + struct.pack("<I", 2 * n)
        )
        # each base gets <=4 decorrelated tone bins (sawtooth slopes
        # are too spectrally homogeneous: one landmark was shared by
        # 248 bases, turning the pair join into collision noise); the
        # base % 11 subsample keeps duplication**2 pair volume viable
        # at 100x (~455 bases -> ~3.5k same-base pair rows per copy**2)
        PRIMES = (6151, 12289, 24593, 49157)

        def build(batches):
            import pandas as pd

            i = np.arange(n, dtype=np.float64)
            for pdf in batches:
                payloads = []
                for b in pdf["base"]:
                    b = int(b)
                    ks = {
                        1 + ((b * b % 65521) * 131 + b * p + j * 29) % 255
                        for j, p in enumerate(PRIMES)
                    }
                    x = np.zeros(n)
                    for k in sorted(ks):
                        x += 0.2 * np.sin(2 * np.pi * k * i / 512.0)
                    v = np.floor(x * 32767 + 0.5).astype("<i2")
                    payloads.append(header + v.tobytes())
                yield pd.DataFrame(
                    {
                        "media_id": pdf["doc_id"],
                        "kind": "audio",
                        "payload": payloads,
                    }
                )

        def media_for(table):
            return (
                table.select(
                    "doc_id", (F.col("doc_id") % 100000000).alias("base")
                )
                .filter(F.col("base") % 11 == 0)
                .mapInPandas(
                    build,
                    schema="media_id long, kind string, payload binary",
                )
            )

        base_docs = load_table(spark, SRC, "documents")
        # 1x reference: per-base landmark counts + the hash-share
        # profile (sizes the bucket cap so nothing legitimate drops)
        fp1 = audio_fingerprints(media_for(base_docs), decoder="wav")
        ref = {
            int(r["media_id"]): int(r["c"])
            for r in fp1.groupBy("media_id")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        mx_share = int(
            fp1.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("s"))
            .agg(F.max("s").alias("m"))
            .first()["m"]
        )
        n_fp_1x = sum(ref.values())
        b5 = {b for b, c in ref.items() if c >= 5}

        fpn = audio_fingerprints(media_for(docs), decoder="wav")
        n_fp_nx = fpn.count()
        assert n_fp_nx == COPIES * n_fp_1x, (n_fp_nx, COPIES, n_fp_1x)

        pairs = audio_near_dups(
            media_for(docs), decoder="wav", min_matches=5,
            max_bucket_size=(mx_share + 1) * COPIES,
        )
        same = (
            pairs.filter(
                F.col("id_a") % 100000000 == F.col("id_b") % 100000000
            )
            .groupBy((F.col("id_a") % 100000000).alias("base"))
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.min("n_matches").alias("mn"),
                F.max("n_matches").alias("mx"),
            )
            .collect()
        )
        got = {int(r["base"]): r for r in same}
        want_pairs = COPIES * (COPIES - 1) // 2
        for b in b5:
            r = got.get(b)
            assert r is not None and int(r["n_pairs"]) == want_pairs, (b, r)
            assert int(r["mn"]) == int(r["mx"]) == ref[b], (b, dict(r.asDict()))
        cross = pairs.filter(
            F.col("id_a") % 100000000 != F.col("id_b") % 100000000
        ).count()
        return {
            "fp_rows_1x": n_fp_1x,
            "fp_rows_nx": n_fp_nx,
            "bases_ge5": len(b5),
            "max_hash_share_1x": mx_share,
            "same_base_pairs": sum(int(r["n_pairs"]) for r in same),
            "cross_base_pairs": int(cross),
        }

    def run_video_fp():
        # r11: the video dedup triad member at replica scale. Every
        # copy of a base doc carries the same 4-frame MJPEG clip
        # (md5-mixed level-walk frames keyed by (base, j) — classes
        # sit far apart in hamming, so only same-base frames match).
        # Exact invariants: frame-hash rows scale LINEARLY
        # (rows(Nx) == N * rows(1x)); every base yields ALL C(N, 2)
        # copy pairs with n_matches == 4 aligned at offset 0 —
        # duplication**2 structure, never corpus**2; cross-base pairs
        # are counted and expected 0 (recorded, not load-bearing).
        import hashlib

        import numpy as np

        from functime_spark.pipeline.mjpeg import encode_mjpeg_avi
        from functime_spark.pipeline.multimodal import (
            video_dhash,
            video_near_dups,
        )

        def frame(G, J):
            p = np.zeros((8, 9), dtype=np.uint8)
            for y in range(8):
                s = 0
                for x in range(9):
                    p[y, x] = 30 + 98 * ((x + s) % 3)
                    h = hashlib.md5(
                        f"{G}-{J}-{y}-{x}".encode()
                    ).hexdigest()
                    s += int(h[0], 16) % 2
            return np.kron(p, np.ones((4, 4), dtype=np.uint8))

        def build(batches):
            import pandas as pd

            memo: dict = {}
            for pdf in batches:
                ids, kinds, payloads = [], [], []
                for did, b in zip(pdf["doc_id"], pdf["base"]):
                    b = int(b)
                    pay = memo.get(b)
                    if pay is None:
                        pay = encode_mjpeg_avi(
                            [frame(b, j) for j in range(4)], quality=85
                        )
                        memo[b] = pay
                    ids.append(did)
                    kinds.append("video")
                    payloads.append(pay)
                yield pd.DataFrame(
                    {"media_id": ids, "kind": kinds, "payload": payloads}
                )

        def media_for(table):
            return (
                table.select(
                    "doc_id", (F.col("doc_id") % 100000000).alias("base")
                )
                .filter(F.col("base") % 31 == 0)
                .mapInPandas(
                    build,
                    schema="media_id long, kind string, payload binary",
                )
            )

        base_docs = load_table(spark, SRC, "documents")
        sig1 = video_dhash(media_for(base_docs))
        n_sig_1x = sig1.count()
        n_sig_nx = video_dhash(media_for(docs)).count()
        assert n_sig_nx == COPIES * n_sig_1x, (n_sig_nx, COPIES, n_sig_1x)

        # size the bucket cap from the 1x band-share profile so NO
        # band bucket drops at replica scale (a bucket holds
        # share x COPIES rows; the default 512 cap legitimately
        # dropped 5 hot buckets whole at 100x — the boilerplate guard
        # doing its job — which would break the exact invariant)
        bands = sig1.select(
            F.posexplode(
                F.array(
                    *[
                        F.shiftrightunsigned("phash", i * 16).bitwiseAND(
                            F.lit(65535)
                        )
                        for i in range(4)
                    ]
                )
            ).alias("band", "band_val")
        )
        mx_share = int(
            bands.groupBy("band", "band_val")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )

        pairs = video_near_dups(
            media_for(docs),
            min_matches=4,
            max_bucket_size=(mx_share + 1) * COPIES,
        )
        same = (
            pairs.filter(
                F.col("id_a") % 100000000 == F.col("id_b") % 100000000
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("n_matches").alias("mn"),
                F.max("n_matches").alias("mx"),
                F.min("offset").alias("omn"),
                F.max("offset").alias("omx"),
                F.countDistinct(
                    (F.col("id_a") % 100000000).alias("b")
                ).alias("bases"),
            )
            .first()
        )
        n_bases = n_sig_1x // 4
        want = n_bases * COPIES * (COPIES - 1) // 2
        assert int(same["n"]) == want, (dict(same.asDict()), want)
        assert int(same["mn"]) == int(same["mx"]) == 4
        assert int(same["omn"]) == int(same["omx"]) == 0
        cross = pairs.filter(
            F.col("id_a") % 100000000 != F.col("id_b") % 100000000
        ).count()
        return {
            "frame_sigs_1x": n_sig_1x,
            "frame_sigs_nx": n_sig_nx,
            "bases": n_bases,
            "max_band_share_1x": mx_share,
            "same_base_pairs": int(same["n"]),
            "cross_base_pairs": int(cross),
        }

    def run_unigram():
        # r11: the unigram tokenizer at replica scale. Training rides
        # the BOUNDED word table (max_words cap) regardless of corpus
        # size; the replica adds revK/tailK/copy mutation tokens so
        # vocab identity vs 1x is NOT claimable — the exact invariant
        # is tokenizer determinism under distribution instead: with
        # ONE vocab fitted on the 1x corpus, the k=0-identical docs
        # (doc_id % 3 == 0 copies keep their text verbatim) must
        # tokenize to exactly COPIES * (1x subtotal over those docs).
        from functime_spark.pipeline.unigram import (
            fit_unigram,
            unigram_tokenize,
        )

        base_docs = load_table(spark, SRC, "documents")
        pieces = fit_unigram(
            base_docs, vocab_size=64, max_piece_len=3, em_rounds=2,
            seed_size=200, max_words=5000, max_word_len=16,
        )
        tok1 = (
            unigram_tokenize(
                base_docs.filter(F.col("doc_id") % 3 == 0), pieces
            )
            .agg(F.sum("n_unigram_tokens").alias("s"))
            .first()["s"]
        )
        tokn = (
            unigram_tokenize(
                docs.filter(F.col("doc_id") % 100000000 % 3 == 0), pieces
            )
            .agg(F.sum("n_unigram_tokens").alias("s"))
            .first()["s"]
        )
        assert int(tokn) == COPIES * int(tok1), (tokn, COPIES, tok1)
        # fit at replica scale completes on the same bounded table
        pieces_n = fit_unigram(
            docs, vocab_size=64, max_piece_len=3, em_rounds=2,
            seed_size=200, max_words=5000, max_word_len=16,
        )
        assert len(pieces_n) == 64
        return {
            "tokens_1x_k0": int(tok1),
            "tokens_nx_k0": int(tokn),
            "nx_top_pieces": [t for t, _ in pieces_n[:8]],
        }

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
    stage("audio_fingerprint_dups", run_audio_fp)
    stage("video_fingerprint_dups", run_video_fp)
    stage("unigram_tokenizer", run_unigram)
    out["total_sec"] = round(sum(s["sec"] for s in out["stages"].values()), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
