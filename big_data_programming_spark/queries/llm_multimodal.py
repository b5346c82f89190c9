"""Multimodal-column queries (SURVEY.md §2.11 L6) — thin wrappers over
operators/multimodal.py. Payloads are synthesized from documents.text
(no media fixtures exist); byte-level operators treat them as opaque."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_programming_spark.operators.multimodal import (
    fake_decode_features,
    sample_chunks,
    synthesize_blobs,
)
from big_data_programming_spark.registry import register
from big_data_programming_spark.sources.loaders import load

#: DuckDB spelling of the synthesized format column.
_FMT_SQL = "CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END"


@register(
    "l6_multimodal_ingest",
    oracle=f"""
SELECT doc_id,
       {_FMT_SQL} AS format,
       OCTET_LENGTH(encode(text)) AS n_bytes,
       MD5(text) AS payload_md5,  -- corpus is pure ASCII: char ops == byte ops
       (n_chars % 640 + 1) * (n_chars % 480 + 1) AS n_pixels
FROM documents
""",
    tags=("L6", "F7"),
)
def l6_multimodal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload ingest: synthesize the multimodal corpus, verify
    payload integrity (length + md5) and metadata propagation — the
    checksum-on-ingest step every media pipeline runs first."""
    blobs = synthesize_blobs(load(spark, sf_dir, "documents"))
    return blobs.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        (F.col("meta.width").cast("long") * F.col("meta.height")).alias("n_pixels"),
    )


@register(
    "l6b_decode_profile",
    oracle=None,  # byte-sum feature has no reasonable SQL twin; the
    # fake decode itself is asserted deterministic in tests/test_operators.py
    tags=("L6", "UD6", "A1"),
)
def l6b_decode_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + profile: fake-decode features per payload (mapInPandas,
    Arrow-batched), then aggregate per format — the shape of an
    image-stats or audio-loudness profiling job. Decode is the stubbed
    step (operators/multimodal.py); the plan around it is production."""
    blobs = synthesize_blobs(load(spark, sf_dir, "documents"))
    feats = fake_decode_features(blobs)
    return feats.groupBy("format").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("first_byte").alias("min_first_byte"),
        F.sum("n_pixels").alias("total_pixels"),
    )


@register(
    "l6c_chunk_sampling",
    oracle=f"""
SELECT doc_id,
       {_FMT_SQL} AS format,
       OCTET_LENGTH(encode(text)) AS n_bytes,
       [MD5(substring(text, 1, 64)),
        MD5(substring(text, 65, 64)),
        MD5(substring(text, 129, 64)),
        MD5(substring(text, 193, 64))] AS chunk_hashes
FROM documents
""",
    tags=("L6", "F1", "F4"),
)
def l6c_chunk_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-offset chunk sampling over opaque payload bytes (the
    frame-sample analogue) — built-in binary slicing + per-chunk
    hashes, fully JVM-side."""
    return sample_chunks(synthesize_blobs(load(spark, sf_dir, "documents")))
