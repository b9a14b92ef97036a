"""Similarity search over an embedding column (array<float>).

Baseline: exact brute-force cosine top-k (one broadcast of the query,
one narrow pass — the scan parallelizes across executors). Scale path:
IVF-style coarse quantization — k-means-ish centroids assign each
vector to a cell; queries probe only the nearest cells, cutting the
scanned fraction to n_probe/n_cells.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)
from functime_spark.materialize import materialize


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine_topk(
    emb: DataFrame,
    query_vec: list,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector.

    r11: the per-row cosine runs as an Arrow-vectorized numpy kernel
    (the IVFIndex.assign rationale — the fold-expression form is
    interpreted per element, and brute cosine is the per-row
    bandwidth wall of the whole ANN tier). Bit-identical arithmetic:
    dot and squared-norm accumulate dim-by-dim in the same left-fold
    order as the expression form, cosine is the same
    dot / (sqrt(norm_v) * norm_q) operation sequence, so the
    TakeOrdered cut is unchanged. Top-k stays in Spark (TakeOrdered —
    never a global sort)."""
    from typing import Iterator

    import pandas as pd

    q = np.asarray(query_vec, dtype="float64")
    nq = 0.0
    for x in q:  # same scalar fold the literal expression evaluated
        nq += x * x
    nq = math.sqrt(nq)
    id_field = emb.select(id_col).schema.fields[0]
    out_schema = StructType(
        [id_field, StructField("cosine", DoubleType())]
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = pdf[vec_col]
            mask = vecs.notna().to_numpy()
            cos = np.full(len(pdf), np.nan)
            if mask.any():
                X = np.stack(
                    [np.asarray(v, dtype="float64") for v in vecs[mask]]
                )
                dot = np.zeros(len(X))
                nv = np.zeros(len(X))
                for j in range(X.shape[1]):
                    dot += X[:, j] * q[j]
                    nv += X[:, j] * X[:, j]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos[mask] = dot / (np.sqrt(nv) * nq)
            res = pd.DataFrame(
                {id_field.name: pdf[id_col], "cosine": cos}
            )
            if not mask.all():
                res.loc[~mask, "cosine"] = None
            yield res

    return (
        emb.select(id_col, vec_col)
        .mapInPandas(run, schema=out_schema)
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def _staged_centroid_dists(
    emb: DataFrame, centroids, vec_col: str
) -> DataFrame:
    """All input columns + a `__dd` array of squared distances to each
    centroid — the single staging both IVFIndex.assign and
    assign_clusters build on (the embedding_kmeans oracle replays this
    exact arithmetic; one definition keeps them in sync).

    The centroid matrix rides in a broadcast single-row frame, not in
    the expression tree: a literal when-chain (one branch per
    centroid) is fine at 8 cells but blows up plan construction and
    codegen at the 256-1024 cells a 100 TB index needs. The broadcast
    join adds one row-free hash relation (n_cells x dim doubles);
    distances are array expressions evaluated per input row, so plan
    size is O(1) in n_cells and the big side never shuffles. `__dd`
    lands as an attribute so downstream argmin/min references don't
    re-evaluate the transform (HOF subtrees get no CSE)."""
    spark = emb.sparkSession
    cens = spark.createDataFrame(
        [([[float(x) for x in cen] for cen in centroids],)],
        "__cens array<array<double>>",
    )
    v = F.col(vec_col).cast("array<double>")
    dists = F.transform(
        F.col("__cens"),
        lambda cen: F.aggregate(
            F.zip_with(v, cen, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (
        emb.crossJoin(F.broadcast(cens))
        .withColumn("__dd", dists)
        .drop("__cens")
    )


class IVFIndex:
    """Inverted-file ANN index: driver-side k-means centroids, cell
    assignment as a native expression, probe-limited search.

    At 100 TB the cell assignment is a one-pass projection persisted
    next to the vectors (or a partition column), and a query scans
    only n_probe/n_cells of the data.
    """

    def __init__(
        self,
        n_cells: int = 16,
        n_iter: int = 5,
        seed: int = 42,
        init: str = "random",
    ):
        self.n_cells = n_cells
        self.n_iter = n_iter
        self.seed = seed
        if init not in ("random", "spread"):
            raise ValueError(f"init must be random|spread, got {init}")
        self.init = init
        self.centroids: np.ndarray | None = None

    def fit(
        self,
        emb: DataFrame,
        vec_col: str = "embedding",
        sample: int = 10000,
        id_col: str = "vec_id",
    ):
        """Lloyd iterations on a driver-side sample (centroid count is
        small; the assignment pass stays distributed).

        init='spread' seeds centroids at evenly-spaced positions of the
        id-ordered sample instead of seeded-rng picks — fully
        deterministic and SQL-expressible, which is what lets the
        correctness oracle replay the whole k-means + probe + top-k
        pipeline (TakeOrdered keeps the ordered sample cheap)."""
        if self.init == "spread":
            rows = emb.orderBy(id_col).select(vec_col).limit(sample).collect()
        else:
            rows = emb.select(vec_col).limit(sample).collect()
        X = np.asarray([r[0] for r in rows], dtype="float64")
        if len(X) == 0:
            raise ValueError(
                "cannot fit k-means/IVF on an empty embedding frame"
            )
        k = min(self.n_cells, len(X))
        if self.init == "spread":
            idx = np.array(
                [int(np.floor(i * len(X) / k)) for i in range(k)], dtype=int
            )
        else:
            rng = np.random.default_rng(self.seed)
            idx = rng.choice(len(X), size=k, replace=False)
        C = X[idx].copy()
        for _ in range(self.n_iter):
            d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(len(C)):
                mask = assign == c
                if mask.any():
                    C[c] = X[mask].mean(axis=0)
        self.centroids = C
        return self

    def assign(self, emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """Nearest-centroid cell id, appended as ``__cell``.

        r11: an Arrow-vectorized numpy kernel instead of the previous
        higher-order-function expression — HOFs are CodegenFallback
        (interpreted per element), and the n_cells x dim x n_rows
        lambda walk measured 0.70 s for 2000x64 rows at 16 cells where
        the batched kernel is milliseconds; the gap widens with cell
        count, so this is the production path at 256-1024 cells too.
        Arithmetic is BIT-IDENTICAL to the expression form (and the
        oracle's SQL replay): per (row, cell) the squared distance
        accumulates dim-by-dim in the same left-fold order
        (((0+d0)+d1)+...), and ties take the lowest cell index
        (np.argmin first-min == array_position-of-array_min). The
        diagnostic `assign_clusters` keeps the JVM expression
        (_staged_centroid_dists) — its plan is pinned Python-free."""
        from typing import Iterator

        import pandas as pd

        C = np.asarray(self.centroids, dtype="float64")
        in_fields = emb.schema.fields
        out_schema = StructType(list(in_fields) + [StructField("__cell", IntegerType())])

        def run(batches: Iterator) -> Iterator:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack(
                    [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
                )
                acc = np.zeros((len(X), len(C)))
                for j in range(C.shape[1]):
                    d = X[:, j, None] - C[None, :, j]
                    acc += d * d
                out = pdf.copy()
                out["__cell"] = np.argmin(acc, axis=1).astype("int32")
                yield out

        return emb.mapInPandas(run, schema=out_schema)

    def search(
        self,
        assigned: DataFrame,
        query_vec: list,
        k: int = 10,
        n_probe: int = 4,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> DataFrame:
        """Probe the n_probe nearest cells, exact cosine within them.

        On an index loaded from `write_index` storage the cell filter
        is a PARTITION filter: only n_probe/n_cells of the files are
        even opened (the 100 TB read-amplification win)."""
        q = np.asarray(query_vec, dtype="float64")
        d = ((self.centroids - q) ** 2).sum(axis=1)
        cells = [int(c) for c in np.argsort(d, kind="stable")[:n_probe]]
        return cosine_topk(
            assigned.filter(F.col("__cell").isin(cells)),
            query_vec,
            k=k,
            vec_col=vec_col,
            id_col=id_col,
        )

    def write_index(self, assigned: DataFrame, path: str, mode: str = "overwrite") -> None:
        """Persist the assigned table hive-partitioned by cell id.

        At scale this is the IVF inverted file: one directory per cell,
        so `search` on the loaded index reads only the probed cells'
        files (partition pruning — pinned by tests/test_pipeline.py)."""
        from functime_spark.sources.tables import write_partitioned

        write_partitioned(assigned, path, ["__cell"], mode=mode)

    @staticmethod
    def load_index(spark, path: str) -> DataFrame:
        """Read a `write_index` directory; partition discovery restores
        the __cell column for pruned probes."""
        return spark.read.parquet(path)


class PQCodebook:
    """Product quantization — the PQ half of the reference's Lance
    IVF_PQ index (forecasting/lance.py:40-95): split each D-dim vector
    into M subvectors, k-means a small codebook per subspace, store
    each vector as M small codes (D floats → M bytes: 32-256x
    compression), and answer queries with asymmetric distance
    computation (ADC) — a per-query (M x ksub) lookup table summed
    over each row's codes.

    Scale design: fit is a driver-side k-means per subspace over a
    bounded sample (the codebook is tiny: M*ksub*D/M doubles). Encode
    and ADC are narrow per-row projections with the codebook / distance
    table riding in ONE broadcast single-row frame — plan size is O(1)
    in M and ksub, the corpus never shuffles, and the encoded table is
    what you persist (optionally hive-partitioned by an IVF cell
    column for combined IVF_PQ). init='spread' + fixed Lloyd schedule
    keeps the whole build deterministic, which is what lets the
    correctness oracle replay fit+encode+ADC in SQL.
    """

    def __init__(
        self,
        n_subspaces: int = 8,
        ksub: int = 16,
        n_iter: int = 5,
        init: str = "spread",
        seed: int = 42,
    ):
        self.m = n_subspaces
        self.ksub = ksub
        self.n_iter = n_iter
        self.init = init
        self.seed = seed
        self.codebooks: np.ndarray | None = None  # (m, ksub, dsub)

    def fit(
        self,
        emb: DataFrame,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        sample: int = 10000,
    ):
        if self.init == "spread":
            rows = emb.orderBy(id_col).select(vec_col).limit(sample).collect()
        else:
            rows = emb.select(vec_col).limit(sample).collect()
        X = np.asarray([r[0] for r in rows], dtype="float64")
        n, dim = X.shape
        if dim % self.m:
            raise ValueError(f"dim {dim} not divisible by n_subspaces {self.m}")
        dsub = dim // self.m
        k = min(self.ksub, n)
        if self.init == "spread":
            idx = np.array([int(np.floor(i * n / k)) for i in range(k)], dtype=int)
        else:
            idx = np.random.default_rng(self.seed).choice(n, size=k, replace=False)
        books = np.empty((self.m, k, dsub))
        for m in range(self.m):
            S = X[:, m * dsub : (m + 1) * dsub]
            C = S[idx].copy()
            for _ in range(self.n_iter):
                d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                assign = d.argmin(axis=1)
                for c in range(k):
                    mask = assign == c
                    if mask.any():
                        C[c] = S[mask].mean(axis=0)
            books[m] = C
        self.codebooks = books
        return self

    def encode(self, emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """Append `__codes` (array<int>, one code per subspace): nearest
        sub-centroid per subspace, first-min tie like numpy argmin.

        r11: Arrow-vectorized numpy kernel (the IVFIndex.assign
        rationale — the previous m x ksub x dsub higher-order-function
        chain ran interpreted per element). Bit-identical arithmetic:
        per (row, subspace, sub-centroid) the squared distance
        accumulates dim-by-dim in the same left-fold order as the
        expression form the oracle replays, and argmin keeps the
        first-min tie."""
        from typing import Iterator

        import pandas as pd

        CB = np.asarray(self.codebooks, dtype="float64")  # (m, ksub, dsub)
        mm, ksub, dsub = CB.shape
        in_fields = emb.schema.fields
        out_schema = StructType(
            list(in_fields) + [StructField("__codes", ArrayType(IntegerType()))]
        )

        def run(batches: Iterator) -> Iterator:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack(
                    [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
                )
                codes = np.empty((len(X), mm), dtype="int32")
                for m in range(mm):
                    sub = X[:, m * dsub : (m + 1) * dsub]
                    acc = np.zeros((len(X), ksub))
                    for j in range(dsub):
                        d = sub[:, j, None] - CB[m, None, :, j]
                        acc += d * d
                    codes[:, m] = np.argmin(acc, axis=1)
                out = pdf.copy()
                out["__codes"] = [row for row in codes]
                yield out

        return emb.mapInPandas(run, schema=out_schema)

    def adc_search(
        self,
        encoded: DataFrame,
        query_vec: list,
        k: int = 10,
        id_col: str = "vec_id",
    ) -> DataFrame:
        """Approximate L2 top-k by ADC: per-query distance table
        T[m][j] = ||q_m - C[m][j]||^2, row distance = sum of the looked-
        up entries. One broadcast, one narrow scan of the codes."""
        q = np.asarray(query_vec, dtype="float64")
        mm, ksub, dsub = self.codebooks.shape
        T = [
            [
                float(((q[m * dsub : (m + 1) * dsub] - self.codebooks[m][j]) ** 2).sum())
                for j in range(ksub)
            ]
            for m in range(mm)
        ]
        spark = encoded.sparkSession
        tb = spark.createDataFrame([(T,)], "__tbl array<array<double>>")
        approx = F.aggregate(
            F.zip_with(
                F.col("__codes"),
                F.col("__tbl"),
                lambda c, row: F.element_at(row, (c + 1).cast("int")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (
            encoded.crossJoin(F.broadcast(tb))
            .select(F.col(id_col), approx.alias("adc_d2"))
            .orderBy("adc_d2", id_col)
            .limit(k)
        )


def ivf_pq_search(
    ivf: IVFIndex,
    pq: PQCodebook,
    encoded: DataFrame,
    query_vec: list,
    k: int = 10,
    n_probe: int = 4,
    refine: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Full IVF_PQ query (the reference's Lance index shape,
    forecasting/lance.py:54-95): probe the n_probe nearest IVF cells,
    rank inside them by PQ ADC distance, then exactly re-rank the top
    refine*k candidates by true cosine.

    At scale: the cell filter prunes partitions (only n_probe/n_cells
    of the inverted files are read), ADC scans codes (M small ints per
    row, not D floats), and the exact pass touches only refine*k rows.
    `encoded` must carry both `__cell` (IVFIndex.assign) and `__codes`
    (PQCodebook.encode) plus the raw vector column for the refine step.
    """
    q = np.asarray(query_vec, dtype="float64")
    d = ((ivf.centroids - q) ** 2).sum(axis=1)
    cells = [int(c) for c in np.argsort(d, kind="stable")[:n_probe]]
    # the probed slice feeds THREE consumers (the ADC scan, the
    # semi-join's right-side anchor, and the exact refine scan); when
    # `encoded` is a live assign+encode lineage rather than a persisted
    # table, an un-cut plan recomputes the cell assignment + PQ encode
    # for each — measured 3x the query latency at bench scale. The
    # slice is n_probe/n_cells of the corpus (the same bound that makes
    # the probe cheap), so pinning it is O(probed), never O(corpus).
    # r11: lazy — the ADC/semi-join/refine consumers all execute
    # inside the caller's single action; the first computation pins
    # the slice without a separate checkpoint job
    probed = materialize(
        encoded.filter(F.col("__cell").isin(cells)), eager=False
    )
    cand = pq.adc_search(probed, query_vec, k=refine * k, id_col=id_col)
    short = probed.join(cand.select(id_col), on=id_col, how="left_semi")
    return cosine_topk(short, query_vec, k=k, vec_col=vec_col, id_col=id_col)


class SQ8Index:
    """Scalar quantization (SQ8): per-dimension affine map of each
    float dim onto a uint8 code — the SQ flavor of the reference's
    Lance vector index (forecasting/lance.py:40-95; Lance exposes
    IVF_PQ and scalar quantizers over the same store). 4x compression
    vs float32 with near-exact recall, and unlike PQ the decode is a
    2-multiply affine — no codebook lookups in the scan.

    Scale design: `fit` is ONE aggregate pass computing 2*dim
    partial-aggregatable min/max columns (no shuffle beyond the final
    reduce; the stats are a dim-sized driver vector). `encode` and
    `search` are narrow projections with the (min, scale) vectors
    riding in one broadcast single-row frame — plan size O(1) in dim,
    the corpus never shuffles. Every step is deterministic double
    arithmetic, so the DuckDB oracle replays fit+encode+search
    bit-compatibly.
    """

    def __init__(self, n_levels: int = 256):
        self.levels = n_levels - 1  # max code value
        self.mins: list | None = None
        self.scales: list | None = None

    def fit(self, emb: DataFrame, vec_col: str = "embedding"):
        dim = emb.select(F.size(vec_col)).first()[0]
        v = F.col(vec_col).cast("array<double>")
        aggs = []
        for i in range(dim):
            aggs.append(F.min(F.element_at(v, i + 1)).alias(f"n{i}"))
            aggs.append(F.max(F.element_at(v, i + 1)).alias(f"x{i}"))
        row = emb.agg(*aggs).first()
        self.mins = [float(row[f"n{i}"]) for i in range(dim)]
        self.scales = [
            (float(row[f"x{i}"]) - float(row[f"n{i}"])) / self.levels
            for i in range(dim)
        ]
        return self

    def _stats_frame(self, spark):
        return spark.createDataFrame(
            [(self.mins, self.scales)], "__mn array<double>, __sc array<double>"
        )

    def encode(self, emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """Append `__codes` (array<int> in [0, levels]): per-dim
        code = floor((x - mn)/scale + 0.5), clamped; constant dims
        (scale 0) code to 0."""
        dim = len(self.mins)
        v = F.col(vec_col).cast("array<double>")
        codes = F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: F.when(
                F.element_at("__sc", i) == 0.0, F.lit(0)
            ).otherwise(
                F.least(
                    F.lit(self.levels),
                    F.greatest(
                        F.lit(0),
                        F.floor(
                            (F.element_at(v, i) - F.element_at("__mn", i))
                            / F.element_at("__sc", i)
                            + F.lit(0.5)
                        ).cast("int"),
                    ),
                )
            ).cast("int"),
        )
        return (
            emb.crossJoin(F.broadcast(self._stats_frame(emb.sparkSession)))
            .withColumn("__codes", codes)
            .drop("__mn", "__sc")
        )

    def search(
        self,
        encoded: DataFrame,
        query_vec: list,
        k: int = 10,
        refine: int = 4,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> DataFrame:
        """Approximate-cosine shortlist on dequantized codes (narrow
        scan), then exact cosine re-rank of the refine*k candidates.
        Returns (id, cosine) like `cosine_topk`."""
        dim = len(self.mins)
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        deq = F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: F.element_at("__mn", i)
            + F.element_at("__codes", i) * F.element_at("__sc", i),
        )
        shortlist = (
            encoded.crossJoin(F.broadcast(self._stats_frame(encoded.sparkSession)))
            .withColumn("__deq", deq)
            .select(
                F.col(id_col),
                F.col(vec_col),
                (_dot(F.col("__deq"), q) / (_norm(F.col("__deq")) * _norm(q))).alias(
                    "__approx"
                ),
            )
            .orderBy(F.desc("__approx"), id_col)
            .limit(refine * k)
        )
        v = F.col(vec_col).cast("array<double>")
        exact = _dot(v, q) / (_norm(v) * _norm(q))
        return (
            shortlist.select(F.col(id_col), exact.alias("cosine"))
            .orderBy(F.desc("cosine"), id_col)
            .limit(k)
        )


def ivf_sq8_search(
    ivf: IVFIndex,
    sq: "SQ8Index",
    encoded: DataFrame,
    query_vec: list,
    k: int = 10,
    n_probe: int = 4,
    refine: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF_SQ query (the scalar-quantized sibling of `ivf_pq_search`;
    Lance exposes both over the same store): probe the n_probe nearest
    IVF cells, shortlist by SQ8 approximate cosine, exact-refine the
    top refine*k. `encoded` must carry `__cell` (IVFIndex.assign),
    `__codes` (SQ8Index.encode) and the raw vector column.

    At scale the cell filter prunes the inverted-file partitions and
    the SQ8 pass reads uint8 codes, so the only float-vector reads are
    the refine*k refine rows."""
    q = np.asarray(query_vec, dtype="float64")
    d = ((ivf.centroids - q) ** 2).sum(axis=1)
    cells = [int(c) for c in np.argsort(d, kind="stable")[:n_probe]]
    probed = encoded.filter(F.col("__cell").isin(cells))
    return sq.search(
        probed, query_vec, k=k, refine=refine, vec_col=vec_col, id_col=id_col
    )


def tfidf_vectors(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_frac: float = 0.5,
):
    """Sparse TF-IDF term weights as a long (id, token, w) table plus
    per-doc L2 norms: tf from one (id, token) aggregate, smoothed idf
    ln((N+1)/(df+1))+1 from the token-level rollup of the same table.

    Tokens appearing in more than ``max_df_frac`` of documents are
    dropped — they carry near-zero idf anyway and are exactly the hot
    keys that would dominate the inverted-index self-join at corpus
    scale (same guard as ngram_jaccard_pairs' high-DF cutoff).

    Returns (weights, norms): weights = (id, token, w),
    norms = (id, norm)."""
    n_docs = docs.count()
    toks = docs.select(
        F.col(id_col),
        F.explode(F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")).alias(
            "token"
        ),
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("__tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("__df"))
    df = df.filter(F.col("__df") <= int(max_df_frac * n_docs))
    idf = F.log((F.lit(float(n_docs) + 1.0)) / (F.col("__df") + 1.0)) + 1.0
    weights = tf.join(df.select("token", idf.alias("__idf")), on="token").select(
        id_col, "token", (F.col("__tf") * F.col("__idf")).alias("w")
    )
    norms = weights.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    return weights, norms


def tfidf_topk_similar(
    docs,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_frac: float = 0.5,
    min_sim: float = 0.0,
    rank_decimals: int | None = None,
):
    """Top-k most similar documents per document by TF-IDF cosine.

    ``rank_decimals``: when set, ranking compares the cosine rounded
    to that many decimals (ties broken by sim_id) so the top-k cut is
    stable under summation-order float noise — the correctness gate
    ranks at 6 decimals.

    Inverted-index join: the sparse weight table self-joins on the
    token (only docs SHARING a token ever meet — the classic sparse
    all-pairs shape), partial products sum per pair, norms divide,
    then one per-doc window keeps the k best. The max_df cutoff in
    tfidf_vectors bounds the hot-token join fan-out, so the shuffle
    is proportional to sum_t df(t)^2 over surviving tokens, not
    n_docs^2. Returns (id, sim_id, cosine, rank), both directions of
    each pair."""
    from pyspark.sql import Window

    weights, norms = tfidf_vectors(docs, text_col, id_col, max_df_frac)
    # materialize: `weights` feeds the self-join twice and `norms`
    # twice more — without a cut the whole tf→df→idf pipeline (and the
    # source scan under it) re-executes ~4x. At 100 TB that is a 16x
    # read amplification; the sparse weight table is the thing to pay
    # for ONCE. (Measured here: 16 file scans → 2.)
    weights = materialize(weights)
    norms = materialize(norms)
    a, b = weights.alias("a"), weights.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("__dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("norm").alias("__na"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("norm").alias("__nb"))
    sims = dots.join(na, "id_a").join(nb, "id_b").select(
        "id_a", "id_b", (F.col("__dot") / (F.col("__na") * F.col("__nb"))).alias("cosine")
    )
    if min_sim > 0.0:
        sims = sims.filter(F.col("cosine") >= min_sim)
    both = sims.select(
        F.col("id_a").alias(id_col), F.col("id_b").alias("sim_id"), "cosine"
    ).unionByName(
        sims.select(
            F.col("id_b").alias(id_col), F.col("id_a").alias("sim_id"), "cosine"
        )
    )
    key = F.col("cosine")
    if rank_decimals is not None:
        key = F.round(key + F.lit(1e-9), rank_decimals)
    w = Window.partitionBy(id_col).orderBy(F.desc(key), F.asc("sim_id"))
    return (
        both.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "sim_id", "cosine", "rank")
    )


def _bm25_tokens(text_col: str):
    """The one tokenizer both BM25 paths share (whitespace split,
    empty tokens dropped) — the gate requires the direct and indexed
    paths to be score-identical, which holds by construction only if
    they share these expression builders."""
    return F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda x: x != "",
    )


def _bm25_idf(n_docs: int):
    """Lucene/Robertson non-negative idf over a `__df` column."""
    return F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )


def _bm25_score(k1: float, b: float, avg_dl: float):
    """Okapi per-(doc, term) score over `__idf`/`__tf`/`__dl` columns."""
    return (
        F.col("__idf") * F.col("__tf") * (k1 + 1.0)
        / (F.col("__tf")
           + k1 * (1.0 - b + b * F.col("__dl") / F.lit(avg_dl)))
    )


def _bm25_rank(scored: DataFrame, id_col: str, k: int,
               rank_decimals: int | None) -> DataFrame:
    """Rounded-score ranking (ties -> id) shared by both BM25 paths."""
    key = F.col("bm25")
    if rank_decimals is not None:
        key = F.round(key + F.lit(1e-9), rank_decimals)
        scored = scored.select(id_col, key.alias("bm25"))
    return scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    rank_decimals: int | None = None,
) -> DataFrame:
    """Okapi BM25 retrieval: the top-k documents for a whitespace
    query (the lexical-retrieval baseline every RAG/decontamination
    pipeline needs next to the embedding tier; the reference has no
    retrieval surface — beyond-reference like tfidf_topk_similar).

    score(d, q) = sum over query terms t of
      idf(t) * tf(t,d) * (k1+1) / (tf(t,d) + k1*(1 - b + b*dl/avgdl))
    with the Lucene/Robertson non-negative idf
      ln(1 + (N - df + 0.5)/(df + 0.5)).

    Scale shape: doc length is a ROW-LOCAL projection (size of the
    token split — no aggregate over the corpus), n_docs and avgdl
    come from ONE fused stats aggregate (two driver scalars), and the
    per-(doc, term) tf aggregate runs on tokens PRE-FILTERED to the
    query's terms — the
    shuffle carries only matching postings (sum of df over query
    terms), never the full corpus vocabulary. df per term is a rollup
    of the same filtered table; the final candidate scoring is one
    small groupBy + a TakeOrdered(k). Every step is deterministic
    double arithmetic — the gate replays it in SQL."""
    qterms = sorted({t for t in query.split() if t})
    if not qterms:
        raise ValueError("bm25_topk needs a non-empty query")
    toks_all = _bm25_tokens(text_col)
    # ONE stats pass yields both driver scalars (n_docs for idf,
    # avgdl for the length norm); the only other corpus read is the
    # postings build below — two scans total, both unavoidable
    # (the estimator needs corpus-wide stats AND per-doc postings)
    stats = docs.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg(F.size(toks_all)).alias("__avgdl"),
    ).first()
    n_docs, avg_dl = int(stats["__n"]), float(stats["__avgdl"] or 0.0)
    base = docs.select(
        F.col(id_col), F.size(toks_all).alias("__dl"), toks_all.alias("__tk")
    ).filter(F.arrays_overlap("__tk", F.array(*[F.lit(t) for t in qterms])))
    tf = (
        base.select(id_col, "__dl", F.explode("__tk").alias("token"))
        .filter(F.col("token").isin(qterms))
        .groupBy(id_col, "__dl", "token")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    # tf feeds BOTH the df rollup and the scoring join; pin the
    # AGGREGATED postings (<= n_matching_docs x n_query_terms rows,
    # no payloads) so the postings pass over the corpus runs exactly
    # once across its two consumers — pinning the doc-level slice
    # instead would checkpoint full token arrays
    # r11: lazy — both consumers run inside the final TakeOrdered
    # action; the first computation pins it, no separate job
    tf = materialize(tf, eager=False)
    df = tf.groupBy("token").agg(F.count(F.lit(1)).cast("double").alias("__df"))
    term = (
        tf.join(
            F.broadcast(df.select("token", _bm25_idf(n_docs).alias("__idf"))),
            on="token",
        )
        .select(F.col(id_col), _bm25_score(k1, b, avg_dl).alias("__s"))
    )
    scored = term.groupBy(id_col).agg(F.sum("__s").alias("bm25"))
    # rank on the rounded score (ties -> id) so the top-k cut is
    # stable under cross-engine float noise (avgdl summation order)
    # — the tfidf_topk_similar gate discipline
    return _bm25_rank(scored, id_col, k, rank_decimals)


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_text: str,
    query_vec: list,
    k: int = 10,
    n_candidates: int = 50,
    k_rrf: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    rank_decimals: int | None = None,
) -> DataFrame:
    """Hybrid retrieval (r9): Reciprocal Rank Fusion of the BM25
    lexical top-n and the exact-cosine dense top-n — the standard
    two-tower RAG retrieval shape (RRF per Cormack/Clarke/Buettcher,
    SIGIR'09: score(d) = sum over systems of 1/(k_rrf + rank_d);
    k_rrf=60 is the published default). A document missing from one
    list contributes only the other term, so the fusion rewards
    agreement without requiring it.

    Returns (id, rrf, r_bm25, r_dense) — ranks are 1-based within
    each candidate list, NULL when the document is absent from it.

    Scale shape: both candidate lists arrive ALREADY CUT to
    n_candidates rows (bm25_topk's filtered-postings TakeOrdered and
    cosine_topk's TakeOrdered — the corpus is never globally sorted),
    so the row_number windows and the full-outer fusion join below run
    over <= 2*n_candidates rows of bounded driver-free state; the
    expensive work stays inside the two retrievers, which keep their
    own 100 TB shapes. `rank_decimals` rounds both ranking keys before
    the row_number cut (the tfidf gate discipline) so cross-engine
    float noise cannot flip a rank.

    Beyond-reference like bm25_topk; composes two already-gated
    surfaces, and the gate replays the whole fusion in SQL."""
    from pyspark.sql import Window

    bm = bm25_topk(
        docs, query_text, k=n_candidates, k1=k1, b=b,
        text_col=text_col, id_col=id_col, rank_decimals=rank_decimals,
    )
    dn = cosine_topk(
        emb, query_vec, k=n_candidates, vec_col=vec_col,
        id_col=vec_id_col,
    )
    cos_key = F.col("cosine")
    if rank_decimals is not None:
        cos_key = F.round(cos_key + F.lit(1e-9), rank_decimals)
        dn = dn.select(vec_id_col, cos_key.alias("cosine"))
    # single-task windows over the LIMITED frames (bounded by
    # n_candidates, not the corpus)
    wb = Window.orderBy(F.desc("bm25"), F.asc(id_col))
    wd = Window.orderBy(F.desc("cosine"), F.asc(vec_id_col))
    bmr = bm.select(
        F.col(id_col).alias("id"), F.row_number().over(wb).alias("r_bm25")
    )
    dnr = dn.select(
        F.col(vec_id_col).alias("id"),
        F.row_number().over(wd).alias("r_dense"),
    )
    fused = bmr.join(dnr, "id", "full_outer").select(
        "id",
        (
            F.coalesce(1.0 / (F.lit(k_rrf) + F.col("r_bm25")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k_rrf) + F.col("r_dense")), F.lit(0.0))
        ).alias("rrf"),
        "r_bm25",
        "r_dense",
    )
    return fused.orderBy(F.desc("rrf"), F.asc("id")).limit(k)


def mmr_rerank(
    candidates: DataFrame,
    emb: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "id",
    score_col: str = "score",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-rank (r9, Carbonell/Goldstein
    SIGIR'98): greedily pick k candidates maximizing
    lam * rel(d) - (1 - lam) * max over selected s of cos(d, s)
    (first pick: lam * rel — the empty-set penalty is 0). The standard
    diversification pass over a retrieval shortlist — redundant
    near-identical hits stop crowding the top-k.

    Scale shape: `candidates` is an ALREADY-CUT shortlist (a
    bm25/cosine/hybrid top-n — bounded by construction), so each of
    the k greedy steps is one TakeOrdered(1) over <= n rows with the
    selected vectors riding as LITERAL expressions (no join, no
    shuffle); the k picked rows come back as driver scalars the same
    way pagerank pulls its dangling mass. Ties break by id. Returns
    (mmr_rank, id, score, mmr) — k rows.

    PRACTICAL BOUND: step j embeds all j already-picked vectors as
    per-element F.lit literals, so the final plan carries
    O(k^2 * dim / 2) literal nodes (k=10, dim=128 → ~6.4e3 — fine;
    k=100, dim=1024 → ~5e6 — Catalyst analysis time blows up long
    before executors feel it). Keep k*dim under ~1e4, which is the
    shortlist-diversification regime MMR is for; past that, switch
    the penalty to a broadcast join against a `selected` frame
    (one extra small shuffle per step) instead of literals."""
    if not (0.0 <= lam <= 1.0):
        raise ValueError("lam must be in [0, 1]")
    rows = materialize(
        candidates.select(
            F.col(id_col).alias("id"), F.col(score_col).alias("score")
        ).join(
            emb.select(
                F.col(vec_id_col).alias("id"),
                F.col(vec_col).cast("array<double>").alias("__v"),
            ),
            on="id",
        )
    )
    spark = rows.sparkSession
    picked = []  # (rank, id, score, mmr, vec)
    for step in range(k):
        rem = rows
        if picked:
            rem = rem.filter(~F.col("id").isin([p[1] for p in picked]))
        v = F.col("__v")
        if picked:
            sims = []
            for _, _, _, _, pv in picked:
                q = F.array(*[F.lit(float(x)) for x in pv])
                sims.append(_dot(v, q) / (_norm(v) * _norm(q)))
            penalty = F.greatest(*sims) if len(sims) > 1 else sims[0]
            mmr = F.lit(lam) * F.col("score") - F.lit(1.0 - lam) * penalty
        else:
            mmr = F.lit(lam) * F.col("score")
        top = (
            rem.select("id", "score", "__v", mmr.alias("mmr"))
            .orderBy(F.desc("mmr"), F.asc("id"))
            .first()
        )
        if top is None:
            break
        picked.append(
            (step + 1, top["id"], float(top["score"]), float(top["mmr"]),
             list(top["__v"]))
        )
    # result schema keeps the CALLER's id type (string keys are as
    # legitimate as longs — bm25/cosine shortlists support both)
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("mmr_rank", IntegerType()),
            StructField("id", rows.schema["id"].dataType),
            StructField("score", DoubleType()),
            StructField("mmr", DoubleType()),
        ]
    )
    return spark.createDataFrame(
        [(r, i, s, m) for r, i, s, m, _ in picked], schema
    )


class BM25Index:
    """The repeated-query shape of `bm25_topk`: ONE corpus pass builds
    the persisted artifacts — the full postings table (id, token, tf,
    dl), the per-token df table, and the n_docs/avgdl scalars — and
    every `search` is then a broadcast-joined lookup that never scans
    the corpus again (mirror of the IVF/PQ persisted-index pattern).

    At 100 TB: `postings` is what you write to parquet (optionally
    bucketed by token so query joins prune); `fit` is one tokenize +
    one (id, token) aggregate; `search` touches only the query terms'
    posting rows."""

    # update() leaves an unmaterialized union over the previous
    # postings; compact (materialize the union) once the stack reaches
    # this depth so N daily updates cost O(N/depth) compactions, not an
    # N-deep plan every search must traverse
    COMPACT_EVERY = 4

    def __init__(self, k1: float = 1.2, b: float = 0.75):
        self.k1 = k1
        self.b = b
        self.postings: DataFrame | None = None
        self.doc_freq: DataFrame | None = None
        self.n_docs: int = 0
        self.avgdl: float = 0.0
        self._sum_dl: int = 0
        self._id_col = "doc_id"
        self._union_depth = 0

    def _batch_postings(self, docs: DataFrame, text_col: str):
        """(stats_row, postings_df) for one batch of documents — the
        shared half of fit() and update(). The length sum is kept as
        an exact INTEGER so incremental avgdl = sum/count is the SAME
        single division a full refit performs (no averaged averages)."""
        toks_all = _bm25_tokens(text_col)
        stats = docs.agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.size(toks_all)).alias("__sumdl"),
        ).first()
        tf = (
            docs.select(
                F.col(self._id_col), F.size(toks_all).alias("__dl"),
                F.explode(toks_all).alias("token"),
            )
            .groupBy(self._id_col, "__dl", "token")
            .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
        )
        return stats, tf

    def fit(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self._id_col = id_col
        stats, tf = self._batch_postings(docs, text_col)
        self.n_docs = int(stats["__n"])
        self._sum_dl = int(stats["__sumdl"] or 0)
        self.avgdl = self._sum_dl / self.n_docs if self.n_docs else 0.0
        self.postings = materialize(tf)
        self.doc_freq = materialize(
            self.postings.groupBy("token").agg(
                F.count(F.lit(1)).cast("double").alias("__df")
            )
        )
        return self

    def update(self, new_docs: DataFrame, text_col: str = "text"):
        """Incremental fit (r9): fold a batch of NEW documents into
        the index without touching the already-indexed corpus — the
        postings append, the per-token df merge, and the n/length-sum
        fold are all associative count/sum algebra, so the result is
        SCORE-IDENTICAL to refitting on the union (avgdl re-derives
        from the exact merged integer length sum; the
        `text_bm25_incremental` gate pins this against the full-fit
        SQL oracle). Caller contract: ids in `new_docs` must not
        already be indexed (the incremental-dedup convention) —
        re-sent ids would double-count df and duplicate postings.

        At 100 TB this is the daily-crawl shape: each update costs one
        tokenize + one (id, token) aggregate over the NEW batch only,
        plus a df merge proportional to the batch vocabulary. The
        postings union stays lazy per update and is COMPACTED
        (materialized) every COMPACT_EVERY updates, so a long run of
        daily batches never leaves an unboundedly deep union plan for
        every search to traverse (doc_freq re-materializes each update
        because the df merge must aggregate anyway)."""
        if self.postings is None:
            raise RuntimeError("fit the index before updating")
        stats, tf_new = self._batch_postings(new_docs, text_col)
        self.n_docs += int(stats["__n"])
        self._sum_dl += int(stats["__sumdl"] or 0)
        self.avgdl = self._sum_dl / self.n_docs if self.n_docs else 0.0
        tf_new = materialize(tf_new)
        self.postings = self.postings.unionByName(tf_new)
        # lazy init: an instance deserialized from a pre-compaction
        # artifact (or a subclass bypassing __init__) has no
        # _union_depth attribute yet
        self._union_depth = getattr(self, "_union_depth", 0) + 1
        if self._union_depth >= self.COMPACT_EVERY:
            self.postings = materialize(self.postings)
            self._union_depth = 0
        df_new = tf_new.groupBy("token").agg(
            F.count(F.lit(1)).cast("double").alias("__df")
        )
        self.doc_freq = materialize(
            self.doc_freq.unionByName(df_new)
            .groupBy("token")
            .agg(F.sum("__df").alias("__df"))
        )
        return self

    def search(
        self, query: str, k: int = 10, rank_decimals: int | None = None
    ) -> DataFrame:
        if self.postings is None:
            raise RuntimeError("call fit() first")
        qterms = sorted({t for t in query.split() if t})
        if not qterms:
            raise ValueError("BM25Index.search needs a non-empty query")
        id_col = self._id_col
        qdf = self.doc_freq.filter(F.col("token").isin(qterms))
        term = (
            self.postings.filter(F.col("token").isin(qterms))
            .join(
                F.broadcast(
                    qdf.select("token", _bm25_idf(self.n_docs).alias("__idf"))
                ),
                on="token",
            )
            .select(
                F.col(id_col),
                _bm25_score(self.k1, self.b, self.avgdl).alias("__s"),
            )
        )
        scored = term.groupBy(id_col).agg(F.sum("__s").alias("bm25"))
        return _bm25_rank(scored, id_col, k, rank_decimals)

    def save(self, path: str, mode: str = "overwrite") -> None:
        """Persist the index: postings range-partitioned by token and
        sorted within files, so each parquet file AND row group covers
        a tight token range — a loaded search's token filter prunes at
        both levels via min/max stats; the doc-frequency table as plain
        parquet, and the scalars as a one-row parquet (the
        save_ann_model convention — everything re-loadable over plain
        SQL/DataFrame RPCs, Connect-safe)."""
        if self.postings is None:
            raise RuntimeError("fit the index before saving")
        (
            self.postings.repartitionByRange(8, "token")
            .sortWithinPartitions("token")
            .write.mode(mode).parquet(f"{path}/postings")
        )
        self.doc_freq.write.mode(mode).parquet(f"{path}/df")
        spark = self.postings.sparkSession
        spark.createDataFrame(
            [(self.n_docs, self.avgdl, self._sum_dl, self.k1, self.b,
              self._id_col)],
            "n_docs long, avgdl double, sum_dl long, k1 double, "
            "b double, id_col string",
        ).write.mode(mode).parquet(f"{path}/stats")

    @classmethod
    def load(cls, spark, path: str):
        row = spark.read.parquet(f"{path}/stats").first()
        idx = cls(k1=float(row["k1"]), b=float(row["b"]))
        idx.n_docs = int(row["n_docs"])
        idx.avgdl = float(row["avgdl"])
        # sum_dl keeps update-after-load exact (older saves lack it)
        idx._sum_dl = int(
            row["sum_dl"] if "sum_dl" in row.asDict()
            else round(row["avgdl"] * row["n_docs"])
        )
        idx._id_col = row["id_col"]
        idx.postings = spark.read.parquet(f"{path}/postings")
        idx.doc_freq = spark.read.parquet(f"{path}/df")
        return idx


def hashed_features(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
    normalize: bool = False,
) -> DataFrame:
    """Feature-hashing (hashing-trick) document vectors: each token
    adds sign(t) to dimension bucket(t) — signed hashing keeps the
    estimator unbiased (Weinberger et al. 2009). Produces a dense
    ``array<double>`` embedding from raw text with no external model,
    so the whole embedding tier (cosine_topk, fit_kmeans, fit_pca,
    embedding_near_dups) composes onto text-only corpora.

    Row-local and ZERO-shuffle: a per-token (bucket, sign) projection
    (one hash pair per token, staged as an attribute — HOF lambdas get
    no CSE) then a fold into the dim-length accumulator. ``md5`` hash
    variant is byte-exactly replayable in SQL like the dedup family."""
    from functime_spark.pipeline.dedup import _hash64

    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda x: x != "",
    )
    base = docs.select(F.col(id_col), toks.alias("__tk"))
    pair = F.transform(
        F.col("__tk"),
        lambda t: F.struct(
            F.pmod(_hash64(t, seed=1, hash_fn=hash_fn), F.lit(dim))
            .cast("int")
            .alias("b"),
            F.when(
                F.pmod(_hash64(t, seed=2, hash_fn=hash_fn), F.lit(2)) == 0,
                F.lit(1.0),
            )
            .otherwise(F.lit(-1.0))
            .alias("s"),
        ),
    )
    staged = base.select(F.col(id_col), pair.alias("__bs"))
    vec = F.aggregate(
        F.col("__bs"),
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, p: F.transform(
            acc, lambda a, i: a + F.when(p["b"] == i, p["s"]).otherwise(F.lit(0.0))
        ),
    )
    out = staged.select(F.col(id_col), vec.alias("hashed_vec"))
    if normalize:
        nrm = F.sqrt(
            F.aggregate(
                F.transform("__v", lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )
        # stage the norm as an attribute: inlining the aggregate into
        # the per-element division lambda re-evaluates it per element
        withn = out.select(
            F.col(id_col), F.col("hashed_vec").alias("__v")
        ).select(F.col(id_col), F.col("__v"), nrm.alias("__n"))
        out = withn.select(
            F.col(id_col),
            F.when(
                F.col("__n") > 0,
                F.transform("__v", lambda x: x / F.col("__n")),
            )
            .otherwise(F.col("__v"))
            .alias("hashed_vec"),
        )
    return out


def fit_kmeans(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 10_000,
):
    """First-class k-means over an embedding column — the SemDeDup /
    IVF building block exposed as its own operator (ref uses Lance's
    IVF trainer, forecasting/lance.py:40-95). Deterministic spread
    init + Lloyd iterations on a bounded id-ordered sample
    (driver-side, O(sample*k*dim) — independent of corpus size);
    assignment stays distributed. Returns the fitted IVFIndex whose
    ``.centroids`` is the (k, dim) matrix."""
    return IVFIndex(n_cells=k, n_iter=n_iter, init="spread").fit(
        emb, vec_col=vec_col, sample=sample, id_col=id_col
    )


def assign_clusters(
    emb: DataFrame,
    model: "IVFIndex",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster, dist2): nearest-centroid assignment plus squared
    distance to the assigned centroid (inertia/elbow diagnostics).
    Shares _staged_centroid_dists with IVFIndex.assign — plan size
    O(1) in k, zero shuffle on the big side."""
    staged = _staged_centroid_dists(emb, model.centroids, vec_col).select(
        F.col(id_col), F.col("__dd")
    )
    return staged.select(
        id_col,
        (F.array_position("__dd", F.array_min("__dd")) - 1)
        .cast("int")
        .alias("cluster"),
        F.array_min("__dd").alias("dist2"),
    )


def embedding_group_stats(
    emb,
    by: str = "label",
    vec_col: str = "embedding",
) -> "DataFrame":
    """Per-group embedding diagnostics for corpus curation: count,
    mean vector norm, centroid norm, mean cosine-to-centroid (group
    coherence) and inertia (mean squared distance to centroid).

    Two aggregate passes: (1) per-dim centroid means — dim aggregate
    expressions in ONE hash aggregate (no dim explode: the shuffle
    carries one pre-aggregated row per group per partition); (2) the
    centroid table (n_groups x dim) broadcasts back and the per-row
    cosine/distance reduce in a second single-shuffle aggregate."""
    dim = emb.select(F.size(vec_col).alias("d")).first()["d"]
    v = F.col(vec_col).cast("array<double>")
    aggs = [F.avg(F.element_at(v, i + 1)).alias(f"__c{i}") for i in range(dim)]
    cents = emb.groupBy(by).agg(F.count(F.lit(1)).alias("n"), *aggs)
    cents = cents.select(
        by, "n", F.array(*[F.col(f"__c{i}") for i in range(dim)]).alias("__cen")
    )
    cen = F.col("__cen")
    dot = F.aggregate(
        F.zip_with(v, cen, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    nrm = F.sqrt(
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    cnrm = F.sqrt(
        F.aggregate(
            F.transform(cen, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    d2 = F.aggregate(
        F.zip_with(v, cen, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = emb.join(F.broadcast(cents), on=by).select(
        F.col(by),
        F.col("n"),
        nrm.alias("__nrm"),
        cnrm.alias("__cnrm"),
        (dot / (nrm * cnrm)).alias("__cos"),
        d2.alias("__d2"),
    )
    return scored.groupBy(by).agg(
        F.first("n").cast("long").alias("n"),
        F.avg("__nrm").alias("mean_norm"),
        F.first("__cnrm").alias("centroid_norm"),
        F.avg("__cos").alias("mean_cos_centroid"),
        F.avg("__d2").alias("inertia"),
    )


def fit_pca(
    emb: DataFrame,
    n_components: int = 4,
    n_iter: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 10000,
):
    """Deterministic PCA of an embedding column: power iteration with
    deflation on the covariance of an id-ordered driver-side sample.

    The covariance is d x d (embedding dim, tiny) regardless of corpus
    size; like IVFIndex.fit, the statistics come from a bounded sample
    and every distributed pass stays in project_pca. The fixed init
    (v0 = 1/sqrt(d)) and fixed iteration count make the whole fit
    SQL-replayable — no eigensolver black box.

    Returns (mean, components, eigenvalues): mean (d,), components
    (n_components, d) rows = principal axes in order, eigenvalues
    (n_components,) of the sample covariance.
    """
    rows = emb.orderBy(id_col).select(vec_col).limit(sample).collect()
    if not rows:
        # empty corpus: a filter chain upstream can legitimately drain
        # the input — return a well-typed degenerate model (dim from
        # the schema is unknowable, so dim 0) instead of crashing;
        # project_pca refuses dim-0 models loudly
        return np.zeros(0), np.zeros((n_components, 0)), np.zeros(n_components)
    X = np.asarray([r[0] for r in rows], dtype="float64")
    n, d = X.shape
    mu = X.mean(axis=0)
    Xc = X - mu
    C = Xc.T @ Xc / n
    comps, lams = [], []
    v0 = np.full(d, 1.0 / math.sqrt(d))
    for _ in range(n_components):
        v = v0.copy()
        for _ in range(n_iter):
            w = C @ v
            nw = float(np.sqrt(w @ w))
            if nw == 0.0:  # exhausted spectrum: stay at init direction
                break
            v = w / nw
        lam = float(v @ (C @ v))
        comps.append(v)
        lams.append(lam)
        C = C - lam * np.outer(v, v)
    return mu, np.asarray(comps), np.asarray(lams)


def project_pca(
    emb: DataFrame,
    mean,
    components,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    prefix: str = "pc",
) -> DataFrame:
    """Distributed projection onto fitted principal axes: one narrow
    codegen pass producing (id, pc1..pck). The mean and component
    matrix ride in a broadcast single-row frame (plan size O(1) in
    both d and k — same design as IVFIndex.assign), and the big side
    never shuffles."""
    if len(list(mean)) == 0:
        # a dim-0 model comes from fit_pca on a drained corpus —
        # projecting real vectors with it would silently emit zeros
        # via zip_with null-padding; fail loudly instead
        raise ValueError("degenerate PCA model (dim 0) — was fit_pca "
                         "called on an empty corpus?")
    spark = emb.sparkSession
    params = spark.createDataFrame(
        [(
            [float(x) for x in mean],
            [[float(x) for x in c] for c in components],
        )],
        "__mu array<double>, __comps array<array<double>>",
    )
    v = F.col(vec_col).cast("array<double>")
    centered = F.zip_with(v, F.col("__mu"), lambda a, b: a - b)
    cols = [
        F.aggregate(
            F.zip_with(centered, F.col("__comps")[c], lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"{prefix}{c + 1}")
        for c in range(len(components))
    ]
    return emb.crossJoin(F.broadcast(params)).select(F.col(id_col), *cols)


# ---------------------------------------------------------------------------
# model persistence: the driver-side index parameters (centroids,
# codebooks, quantizer stats) as single-row parquet — the small half of
# a persisted vector index (write_index/load_index hold the big half,
# hive-partitioned by cell). Parquet, not pickle: engine-portable,
# schema-checked, and safe to read from any future session.
# ---------------------------------------------------------------------------


def ann_recall(
    approx: DataFrame,
    exact: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall of an approximate top-k result frame against the exact
    top-k — THE index-quality metric for tuning n_probe / n_cells /
    codebook size (every ANN benchmark reports recall@k). Returns one
    row (n_exact, n_overlap, recall).

    Declarative: a semi-join + two tiny aggregates; both inputs are
    k-row frames, so this costs nothing even when the searches that
    produced them scanned a 100 TB index."""
    e = exact.select(F.col(id_col)).distinct()
    a = approx.select(F.col(id_col)).distinct()
    hit = e.join(a, on=id_col, how="left_semi").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    tot = e.agg(F.count(F.lit(1)).alias("n_exact"))
    return tot.crossJoin(hit).select(
        "n_exact",
        "n_overlap",
        (F.col("n_overlap") / F.col("n_exact")).cast("double").alias("recall"),
    )


def save_ann_model(model, spark, path: str, mode: str = "overwrite") -> None:
    """Persist an IVFIndex / PQCodebook / SQ8Index's fitted parameters."""
    if isinstance(model, IVFIndex):
        if model.centroids is None:
            raise ValueError("fit the index before saving")
        df = spark.createDataFrame(
            [
                (
                    "ivf",
                    [[float(x) for x in c] for c in model.centroids],
                    {
                        "n_cells": str(model.n_cells),
                        "n_iter": str(model.n_iter),
                        "seed": str(model.seed),
                        "init": model.init,
                    },
                )
            ],
            "kind string, mat array<array<double>>, params map<string,string>",
        )
    elif isinstance(model, PQCodebook):
        if model.codebooks is None:
            raise ValueError("fit the codebook before saving")
        m, ksub, dsub = model.codebooks.shape
        flat = [
            [float(x) for x in model.codebooks[i][j]]
            for i in range(m)
            for j in range(ksub)
        ]
        df = spark.createDataFrame(
            [
                (
                    "pq",
                    flat,
                    {
                        "m": str(m),
                        "ksub": str(ksub),
                        "dsub": str(dsub),
                        "n_iter": str(model.n_iter),
                        "init": model.init,
                        "seed": str(model.seed),
                    },
                )
            ],
            "kind string, mat array<array<double>>, params map<string,string>",
        )
    elif isinstance(model, SQ8Index):
        if model.mins is None:
            raise ValueError("fit the index before saving")
        df = spark.createDataFrame(
            [
                (
                    "sq8",
                    [list(map(float, model.mins)), list(map(float, model.scales))],
                    {"levels": str(model.levels)},
                )
            ],
            "kind string, mat array<array<double>>, params map<string,string>",
        )
    else:
        raise TypeError(f"unsupported model {type(model).__name__}")
    df.coalesce(1).write.mode(mode).parquet(path)


def load_ann_model(spark, path: str):
    """Restore a model written by save_ann_model."""
    rows = spark.read.parquet(path).collect()
    if not rows:
        raise ValueError(f"no ANN model rows at {path!r}")
    if len(rows) > 1:
        raise ValueError(
            f"{len(rows)} model rows at {path!r} — was save_ann_model "
            "called with mode='append'? A model dir must hold exactly one."
        )
    row = rows[0]
    kind, mat, params = row["kind"], row["mat"], dict(row["params"])
    if kind == "ivf":
        ix = IVFIndex(
            n_cells=int(params["n_cells"]),
            n_iter=int(params["n_iter"]),
            seed=int(params["seed"]),
            init=params["init"],
        )
        ix.centroids = np.asarray(mat, dtype="float64")
        return ix
    if kind == "pq":
        pq = PQCodebook(
            n_subspaces=int(params["m"]),
            ksub=int(params["ksub"]),
            n_iter=int(params["n_iter"]),
            init=params["init"],
            seed=int(params["seed"]),
        )
        m, ksub, dsub = int(params["m"]), int(params["ksub"]), int(params["dsub"])
        pq.codebooks = np.asarray(mat, dtype="float64").reshape(m, ksub, dsub)
        return pq
    if kind == "sq8":
        sq = SQ8Index(n_levels=int(params["levels"]) + 1)
        sq.mins = list(mat[0])
        sq.scales = list(mat[1])
        return sq
    raise ValueError(f"unknown model kind {kind!r}")
