"""Multimodal binary-column queries (north-star extension).

mm_binary_meta is fully oracle-checked (binary length/digest are
deterministic); mm_feature_extract exercises the Arrow mapInPandas decode
path — its per-row features come from a Python stub, which SQL cannot
express, so the driver records the weaker rows-only check (oracle=None)
and tests/test_multimodal.py pins the values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import documents_as_media, extract_features
from ..sources import fan_out, load_table
from .registry import query


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest,
           'text/plain' AS media_type
    FROM read_parquet('{sf}/documents.parquet')
    """,
    tags=("multimodal",),
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads: byte length + digest —
    the schema/partitioning plumbing for image/audio columns, exercised on
    utf-8 payloads (no codecs in this container)."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        F.length("payload").alias("n_bytes"),
        F.md5(F.col("payload")).alias("digest"),
        "media_type",
    )


@query("mm_feature_extract", oracle=None, tags=("multimodal", "pandas-udf"))
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode→feature-extract over binary payloads
    (operators/multimodal.py). Stubbed decode (deterministic digest
    features); plan shape identical to a real codec integration."""
    media = documents_as_media(fan_out(load_table(spark, sf_dir, "documents")))
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        "checksum",
        F.round(F.element_at("features", 1), 9).alias("f0"),
    )
