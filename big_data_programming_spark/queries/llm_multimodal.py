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
    oracle=f"""
SELECT {_FMT_SQL} AS format,
       COUNT(*) AS n_items,
       CAST(SUM(OCTET_LENGTH(encode(text))) AS BIGINT) AS total_bytes,
       MIN(unicode(substring(text, 1, 1))) AS min_first_byte,
       CAST(SUM(list_sum(list_transform(string_split(text, ''),
            x -> unicode(x))) % 2147483647) AS BIGINT) AS sum_byte_mod,
       CAST(SUM((n_chars % 640 + 1) * (n_chars % 480 + 1)) AS BIGINT)
         AS total_pixels
FROM documents
GROUP BY 1
""",
    tags=("L6", "UD6", "A1"),
)
def l6b_decode_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + profile: fake-decode features per payload (mapInPandas,
    Arrow-batched), then aggregate per format — the shape of an
    image-stats or audio-loudness profiling job. Decode is the stubbed
    step (operators/multimodal.py); the plan around it is production.
    Every fake-decode feature is a pure function of the payload bytes,
    and the corpus is pure ASCII (char == byte), so the oracle re-derives
    them in SQL — per-char code-point sums included — giving the
    mapInPandas path a full value-hash check."""
    blobs = synthesize_blobs(load(spark, sf_dir, "documents"))
    feats = fake_decode_features(blobs)
    return feats.groupBy("format").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("first_byte").alias("min_first_byte"),
        F.sum("byte_sum_mod").alias("sum_byte_mod"),
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
