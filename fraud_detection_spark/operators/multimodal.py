"""Multimodal-column operators: image/audio/video payloads travel as
opaque ``binary`` columns with a typed metadata struct; decode /
feature-extract run as Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the decode step is STUBBED
(``decode_media`` raises NotImplementedError; ``fake_decode`` is a
deterministic byte-level stand-in) — the Spark-side plumbing (schema,
batch iteration, partitioning) is real and tested.

Scale posture: binary payloads stay columnar (parquet binary), the
metadata struct supports predicate pushdown on typed fields (e.g.
``media.format``), and feature extraction streams Arrow batches —
payloads are never collected to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fraud_detection_spark.registry import query
from fraud_detection_spark.sources import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "media",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType(), False)]
    + [T.StructField(f"f{i}", T.DoubleType(), True) for i in range(8)]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media table: documents.text encoded as a binary payload
    plus a typed metadata struct (the real pipeline would read e.g.
    image bytes from parquet/object storage the same way)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit(16000).alias("sample_rate"),
        ).alias("media"),
    )


def decode_media(payload: bytes, fmt: str):
    """Real decoder entry point — requires image/audio codecs that are
    not in this container."""
    raise NotImplementedError(
        "media decoding requires codec libraries (PIL/librosa/ffmpeg); "
        "use fake_decode for deterministic tests"
    )


def fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for decode+feature-extract: an 8-bucket
    byte histogram normalized by payload length."""
    if payload is None or len(payload) == 0:
        return [0.0] * 8
    counts = [0] * 8
    for b in payload:
        counts[b & 7] += 1
    n = float(len(payload))
    return [c / n for c in counts]


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: Arrow-batched feature extraction over binary
    payloads. Shape mirrors a real image/audio featurizer: per-batch
    vectorizable work, bounded memory, no driver involvement."""
    for pdf in batches:
        feats = pdf["payload"].map(fake_decode)
        out = pd.DataFrame({"doc_id": pdf["doc_id"]})
        for i in range(8):
            out[f"f{i}"] = feats.map(lambda v, i=i: v[i])
        yield out


@query(
    "q_multimodal",
    oracle=(
        "SELECT doc_id, md5(text) AS content_hash, "
        "CAST(strlen(text) AS BIGINT) AS n_bytes, "
        "CASE WHEN strlen(text) >= 256 THEN 1 ELSE 0 END AS is_large "
        "FROM documents"
    ),
    tags=("multimodal",),
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass: content hash (md5 over payload
    bytes), payload size from the metadata struct, size gate — the
    dedup/routing fields a multimodal ingest computes without ever
    decoding the payload."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        F.md5("payload").alias("content_hash"),
        F.col("media.n_bytes").alias("n_bytes"),
        F.when(F.col("media.n_bytes") >= 256, 1).otherwise(0).alias("is_large"),
    )


@query(
    "q_media_features",
    oracle=None,  # Python featurizer — rows-only + pytest determinism check
    tags=("multimodal", "udf"),
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched media feature extraction: binary payload ->
    8-dim feature vector via mapInPandas (deterministic fake decoder;
    the real decoder is a drop-in replacement behind the same
    signature)."""
    m = media_table(spark, sf_dir).select("doc_id", "payload")
    feats = m.mapInPandas(extract_features, schema=FEATURE_SCHEMA)
    return feats.select(
        "doc_id", *[F.round(F.col(f"f{i}"), 6).alias(f"f{i}") for i in range(8)]
    )
