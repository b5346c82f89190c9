"""Multimodal-column operators (SURVEY.md §2.11 L6): binary payloads
with typed metadata flowing through DataFrame ETL.

Spark has no tensor/image type; the 100 TB-scale representation is a
``BinaryType`` payload column plus a metadata struct (format, dims),
processed by Arrow-batched ``mapInPandas`` so payload bytes never
leave the executor as Python objects row-by-row.

The container has no image/audio codecs, so the *decode* step is
stubbed two ways (both clearly marked):

* :func:`decode_stub` — raises NotImplementedError: the seam where a
  real decoder (Pillow / torchaudio / ffmpeg) plugs in.
* :func:`fake_decode_features` — a deterministic stand-in that derives
  "decoded" features purely from the payload bytes, so the Spark-side
  plumbing (schema, batching, partitioning, UDF signature) is real and
  testable end-to-end.

No fixture table carries real media, so payloads are synthesized
deterministically from ``documents.text`` (:func:`synthesize_blobs`) —
the bytes are opaque to every operator downstream, exactly as real
image bytes would be.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: format assignment is keyed on doc_id so it is stable across engines.
_FORMATS = ("png", "jpeg", "wav")


def synthesize_blobs(docs: DataFrame) -> DataFrame:
    """Turn the documents table into a multimodal corpus: UTF-8 payload
    bytes + a typed metadata struct. Deterministic, engine-portable."""
    fmt = F.element_at(F.array(*[F.lit(f) for f in _FORMATS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            fmt.alias("format"),
            (F.col("n_chars") % 640 + 1).alias("width"),
            (F.col("n_chars") % 480 + 1).alias("height"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, fmt: str):  # pragma: no cover - seam only
    """The real-decoder seam. Wire Pillow/ffmpeg here in an environment
    that has them; every caller goes through fake_decode_features in
    this container."""
    raise NotImplementedError(
        "media decoding requires an image/audio codec not present in "
        "this environment; use fake_decode_features for plumbing tests"
    )


def fake_decode_features(blobs: DataFrame) -> DataFrame:
    """'Decode' each payload into per-item features via mapInPandas.

    Deterministic fake: features are pure functions of the payload
    bytes (length, first/last byte, byte-sum mod 2^31) and the metadata
    dims — the real version computes them from decoded pixels/samples
    instead, with the identical Spark plumbing: one Arrow batch in, one
    feature frame out, no shuffle, schema declared up front."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": [m["format"] for m in pdf["meta"]],
                    "n_bytes": payloads.map(len),
                    "first_byte": payloads.map(lambda b: b[0] if b else None),
                    "byte_sum_mod": payloads.map(lambda b: sum(b) % 2147483647),
                    "n_pixels": [m["width"] * m["height"] for m in pdf["meta"]],
                }
            )

    return blobs.mapInPandas(
        feats,
        schema=(
            "doc_id long, format string, n_bytes long, first_byte long, "
            "byte_sum_mod long, n_pixels long"
        ),
    )


def sample_chunks(blobs: DataFrame, chunk_bytes: int = 64, n_chunks: int = 4) -> DataFrame:
    """Frame-sampling analogue on opaque bytes: take n fixed-offset
    slices of each payload (as a video pipeline samples frames) —
    pure built-in binary ops, no Python boundary."""
    chunks = F.array(
        *[
            F.substring(F.col("payload"), i * chunk_bytes + 1, chunk_bytes)
            for i in range(n_chunks)
        ]
    )
    return blobs.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.length(F.col("payload")).alias("n_bytes"),
        F.array_join(F.transform(chunks, lambda c: F.md5(c)), "|").alias(
            "chunk_hashes"
        ),
    )
