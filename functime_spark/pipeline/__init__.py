"""Large-scale training-data pipeline operators.

Beyond the reference's surface (BASELINE.json north star): dedup
(exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding near-dup),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(lang-ID, quality, tokens, fingerprints), and multimodal column
plumbing. Every operator is partition-parallel — the 100 TB story is
"add executors".
"""

from functime_spark.pipeline import (  # noqa: F401
    audio,
    bpe,
    classifier,
    clean,
    decontaminate,
    dedup,
    graph,
    jpeg,
    lm,
    mjpeg,
    multimodal,
    packing,
    sampling,
    scaletools,
    similarity,
    text,
    unigram,
    webdataset,
)
from functime_spark.pipeline.clean import clean_corpus  # noqa: F401
