"""Multimodal-column operators (north_star LLM-data surface).

Treats non-text modalities as opaque ``binary`` payloads with typed
metadata riding alongside (the documents⋈embeddings join is the
text+vector multimodal row). The decode/feature-extract stage is the
Spark-side plumbing that a real pipeline would run through
``mapInPandas`` — schema, batch iteration, and partitioning are real;
the actual image/audio decoding is STUBBED (the codec libraries are not
in this container) behind a deterministic byte-level feature extractor,
clearly marked below.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "multimodal_join_stats",
    oracle="""
SELECT lang, label,
       COUNT(*) AS n,
       CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens,
       ROUND(SUM(sqrt(list_sum(list_transform(range(1, 65),
                 i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))))
             / COUNT(*), 6) AS avg_norm
FROM documents JOIN embeddings ON doc_id = vec_id
GROUP BY lang, label
""",
    tags=("multimodal", "llm"),
)
def multimodal_join_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal row assembly: text document ⋈ its embedding (doc_id =
    vec_id), aggregated per (lang, label). At 100 TB both tables are
    bucketed on the id so this join is shuffle-free."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    norm = F.expr(
        "sqrt(aggregate(zip_with(embedding, embedding, (x, y) -> double(x) * double(y)),"
        " 0D, (acc, t) -> acc + t))"
    )
    return (
        d.join(e, d.doc_id == e.vec_id)
        .select("lang", "label", F.size(F.split("text", " ")).alias("ntok"), norm.alias("norm"))
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("ntok").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
            F.round(F.sum("norm") / F.count(F.lit(1)), 6).alias("avg_norm"),
        )
    )


_DECODE_SCHEMA = "doc_id long, n_bytes int, first_byte int, fake_width int, fake_height int"


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder: real byte-level features + deterministic fake decode.

    A production pipeline would decode image/audio payloads here (PIL /
    torchaudio / ffmpeg per Arrow batch). Those libs are absent, so the
    "decode" emits a deterministic fake frame size derived from payload
    bytes — the Arrow batch shape, schema contract, and partition-parallel
    execution are exactly what the real decoder would use.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.str.len().astype("int32")
        first = payloads.map(lambda b: b[0] if len(b) else 0).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "first_byte": first,
                # deterministic fake "decode" (see docstring)
                "fake_width": (n_bytes % 64 + 1).astype("int32"),
                "fake_height": (first % 64 + 1).astype("int32"),
            }
        )


@register(
    "multimodal_decode_features",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
       CAST(octet_length(encode(text)) % 64 + 1 AS INT) AS fake_width,
       CAST(ascii(substr(text, 1, 1)) % 64 + 1 AS INT) AS fake_height
FROM documents
""",
    tags=("multimodal", "llm", "pandas-udf"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload decode pipeline via ``mapInPandas``.

    text → binary payload (stand-in for an image/audio blob) → Arrow-batched
    Python feature extraction. The oracle recomputes the byte-level
    features relationally; the fake decode is deterministic so it is
    oracle-checkable too.
    """
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(_decode_batches, _DECODE_SCHEMA)
