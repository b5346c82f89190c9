"""Multimodal-column queries (SURVEY.md §2.11 L6) — thin wrappers over
operators/multimodal.py. Payloads are synthesized from documents.text
(no media fixtures exist); byte-level operators treat them as opaque."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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
       array_to_string([MD5(substring(text, 1, 64)),
        MD5(substring(text, 65, 64)),
        MD5(substring(text, 129, 64)),
        MD5(substring(text, 193, 64))], '|') AS chunk_hashes
FROM documents
""",
    tags=("L6", "F1", "F4"),
)
def l6c_chunk_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-offset chunk sampling over opaque payload bytes (the
    frame-sample analogue) — built-in binary slicing + per-chunk
    hashes, fully JVM-side."""
    return sample_chunks(synthesize_blobs(load(spark, sf_dir, "documents")))


@register(
    "l6d_frame_sample",
    oracle="""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS payload_hex,
         octet_length(encode(text)) AS n_bytes
  FROM documents
  WHERE doc_id % 3 = 2
), frames AS (
  SELECT doc_id, n_bytes, t.i AS frame_idx,
         (t.i * (n_bytes - 48)) // 3 AS byte_offset
  FROM b, (SELECT UNNEST(generate_series(0, 3)) AS i) t
  WHERE n_bytes >= 48
)
SELECT doc_id, frame_idx, byte_offset,
       substr(b.payload_hex, CAST(2 * byte_offset + 1 AS BIGINT), 96) AS frame_hex
FROM frames JOIN b USING (doc_id, n_bytes)
""",
    tags=("L6", "F4", "F1"),
)
def l6d_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evenly-spaced frame sampling over temporal media payloads: for
    each 'video/audio' blob (the synthesized wav cohort), take 4
    48-byte frames at offsets proportional to payload length — one
    ROW per frame (posexplode), which is the shape a downstream
    frame-embedding or ASR stage consumes, vs l6c's in-row array.
    Offsets are exact integer arithmetic; the frame bytes surface as
    hex so both engines compare them byte-for-byte. All built-in
    expressions (sequence → posexplode → hex slice), shuffle-free; a
    real decoder would replace the hex slice with a mapInPandas
    decode at the seam documented in operators/multimodal.py."""
    blobs = synthesize_blobs(
        load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)
    )
    sized = blobs.select(
        "doc_id", "payload", F.length(F.col("payload")).alias("n_bytes")
    ).filter(F.col("n_bytes") >= 48)
    frames = sized.select(
        "doc_id",
        "n_bytes",
        F.hex(F.col("payload")).alias("payload_hex"),
        F.posexplode(F.sequence(F.lit(0), F.lit(3))).alias("frame_idx", "_i"),
    ).select(
        "doc_id",
        "frame_idx",
        F.expr("(frame_idx * (n_bytes - 48)) div 3").alias("byte_offset"),
        "payload_hex",
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        "byte_offset",
        F.substring(
            F.col("payload_hex"), (F.lit(2) * F.col("byte_offset") + 1).cast("int"), 96
        ).alias("frame_hex"),
    )


@register(
    "l6e_resize_stride",
    oracle="""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS payload_hex,
         octet_length(encode(text)) AS n_bytes
  FROM documents
  WHERE doc_id % 3 = 0
), strided AS (
  SELECT doc_id, n_bytes,
         (SELECT STRING_AGG(substr(payload_hex, 2 * (i - 1) + 1, 2), '' ORDER BY i)
          FROM UNNEST(generate_series(1, n_bytes, 4)) AS t(i)) AS resized_hex
  FROM b
)
SELECT doc_id, n_bytes,
       CAST((n_bytes + 3) // 4 AS BIGINT) AS resized_bytes,
       md5(resized_hex) AS resized_md5
FROM strided
""",
    tags=("L6", "F4", "F7"),
)
def l6e_resize_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample analogue on opaque payloads: keep every 4th
    byte (the stride-sampling shape of an image downscale or audio
    decimation), verified by md5 of the downsampled bytes. Like
    l6c/l6d this is the real Spark plumbing with the decode step
    deferred: a production resize swaps the in-row stride gather for
    a Pillow/ffmpeg call inside mapInPandas at the seam documented in
    operators/multimodal.py — partitioning, schema, and the
    downstream integrity check stay identical. The gather is
    `sequence` + `transform` + `substring` over the hex encoding,
    whole-stage codegen, shuffle-free."""
    blobs = synthesize_blobs(
        load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    )
    sized = blobs.select(
        "doc_id",
        F.hex(F.col("payload")).alias("payload_hex"),
        F.length(F.col("payload")).alias("n_bytes"),
    )
    strided = sized.select(
        "doc_id",
        "n_bytes",
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.col("n_bytes"), F.lit(4)),
                lambda i: F.substring(F.col("payload_hex"), (i - 1) * 2 + 1, F.lit(2)),
            ),
            "",
        ).alias("resized_hex"),
    )
    return strided.select(
        "doc_id",
        "n_bytes",
        F.expr("(n_bytes + 3) div 4").cast("bigint").alias("resized_bytes"),
        F.md5(F.col("resized_hex").cast("binary")).alias("resized_md5"),
    )


@register(
    "l6f_shard_manifest",
    oracle="""
WITH p AS (
  SELECT doc_id, source,
         OCTET_LENGTH(encode(text)) AS n_bytes,
         MD5(text) AS pmd5
  FROM documents
), c AS (
  SELECT *, SUM(n_bytes) OVER (
    PARTITION BY source ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM p
)
SELECT source,
       CAST((cum - n_bytes) // 4096 AS BIGINT) AS shard_id,
       COUNT(*) AS n_payloads,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc,
       MD5(STRING_AGG(pmd5, '' ORDER BY doc_id)) AS manifest_md5
FROM c
GROUP BY 1, 2
""",
    tags=("L6", "L4", "W4", "F7"),
)
def l6f_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifests (the WebDataset/tar-shard shape):
    payloads are packed per source, in deterministic doc_id order,
    into ~4 KB byte-budget shards by running-size cumsum (l4m's
    packing algebra applied to BYTES instead of tokens — multimodal
    payloads vary 100× in size, so packing by count would produce
    wildly uneven shards). Each manifest row carries the shard's
    payload count, byte total, doc range, and an order-sensitive
    content fingerprint (md5 over the ordered payload md5s) — what a
    trainer verifies before mounting a shard. One per-source window
    + one aggregate; manifests build per source/date partition in
    production, so no global order is ever required."""
    d = load(spark, sf_dir, "documents")
    b = synthesize_blobs(d).join(d.select("doc_id", "source"), "doc_id")
    p = b.select(
        "doc_id",
        "source",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("pmd5"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = p.withColumn("cum", F.sum("n_bytes").over(w))
    shard = ((F.col("cum") - F.col("n_bytes")) / 4096).cast("long")
    ordered_md5s = F.transform(
        F.array_sort(F.collect_list(F.struct("doc_id", "pmd5"))),
        lambda s: s["pmd5"],
    )
    return (
        c.withColumn("shard_id", shard)
        .groupBy("source", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.md5(F.concat_ws("", ordered_md5s).cast("binary")).alias("manifest_md5"),
        )
    )
