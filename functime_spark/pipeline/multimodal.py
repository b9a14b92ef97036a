"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` operators. The decode step itself is STUBBED (the
container has no image/audio codecs): `decoder="fake"` produces a
deterministic hash-seeded feature vector so the Spark-side plumbing —
schema, batching, partitioning — is real and testable; `decoder="pil"`
etc. raise NotImplementedError until the codec is installed.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta", StringType()),  # JSON: {width,height,codec,...}
    ]
)


def attach_payload(
    df: DataFrame, id_col: str, source_col: str, kind: str = "image"
) -> DataFrame:
    """Wrap an existing column's bytes as a media payload (testing path:
    any blob exercises the plumbing)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(source_col).cast("binary").alias("payload"),
        F.to_json(F.struct(F.length(source_col).alias("n_bytes"))).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a codec: sha256-chained feature vector.

    Component j = int(sha256(hex(sha256(payload)) + "-" + j)[:6], 16)
    / 2**23 - 1, uniform over [-1, 1). The 24-bit numerator makes every
    value exactly representable in float32, so the whole vector can be
    replayed byte-exactly by any engine with a sha256 function (the
    correctness gate re-derives it in DuckDB SQL)."""
    base = hashlib.sha256(payload or b"").hexdigest()
    out = np.empty(dim, dtype="float32")
    for j in range(dim):
        hj = hashlib.sha256(f"{base}-{j}".encode()).hexdigest()
        out[j] = int(hj[:6], 16) / 8388608.0 - 1.0
    return out


def extract_features_media(
    media: DataFrame, dim: int = 64, decoder: str = "fake"
) -> DataFrame:
    """(media_id, kind, feature array<float>) via mapInPandas.

    decoder='fake' → deterministic hash features (real plumbing, stub
    math); any other decoder name raises until its codec library is
    available in the image."""
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder '{decoder}' needs its codec library (not in this image); "
            "use decoder='fake' for plumbing tests"
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [
                _fake_decode(p, dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("feature", ArrayType(FloatType())),
        ]
    )
    return media.mapInPandas(run, schema=schema)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling stub: emits (media_id, frame_idx) rows for
    frames 0, n, 2n... based on metadata frame counts (payload decode
    stubbed — frame count read from the meta JSON, default 1)."""
    meta = F.from_json("meta", "n_frames int, n_bytes long")
    n_frames = F.coalesce(meta["n_frames"], F.lit(1))
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return media.select(
        "media_id", F.explode(idx).alias("frame_idx")
    )


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    decoder: str = "fake",
) -> DataFrame:
    """Resize plumbing: (media_id, kind, payload, meta) -> same schema
    with the payload re-encoded at width x height and the meta JSON
    updated. Arrow-batched mapInPandas like a real codec pass (batch
    sizing follows spark.sql.execution.arrow.maxRecordsPerBatch).

    decoder='fake': the resized payload is the deterministic 32-byte
    sha256(hex(sha256(payload)) + "-{w}x{h}") digest — byte-exactly
    replayable in any engine with sha256, so the gate value-checks the
    full batch path; any other decoder raises until its codec library
    is present in the image."""
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder '{decoder}' needs its codec library (not in this image); "
            "use decoder='fake' for plumbing tests"
        )
    tag = f"-{width}x{height}"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = [
                hashlib.sha256(
                    (
                        hashlib.sha256(p or b"").hexdigest() + tag
                    ).encode()
                ).digest()
                for p in pdf["payload"]
            ]
            meta = [
                f'{{"width":{width},"height":{height}}}' for _ in range(len(pdf))
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out,
                    "meta": meta,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)
