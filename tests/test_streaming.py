"""Streaming twin tests (SURVEY.md §5.2.3): each §2.9 streaming op,
drained deterministically with availableNow, must agree with its batch
formulation — same logical semantics, boundedness aside. These are
Spark-vs-Spark (no oracle), complementing the DuckDB parity checks in
test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_programming_spark.functions.canonical import DEC
from big_data_programming_spark.sources.loaders import load
from big_data_programming_spark.streaming.harness import drain, events_stream
from tests.conftest import SMOKE_SF_DIR, spark_result


def test_stream_replays_batch_rows(spark):
    """S8 smoke: the stream sees exactly the batch table (ids, µs
    timestamps, values) after ns→µs truncation."""
    got = drain(events_stream(spark, SMOKE_SF_DIR), "append")
    want = load(spark, SMOKE_SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    assert spark_result(got) == spark_result(want)


def test_tumbling_complete_equals_batch_twin(spark):
    """ST2 (complete mode) ≡ batch groupBy(window): bit-identical."""

    def plan(df):
        return (
            df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
            )
            .select(
                F.col("w.start").cast("timestamp_ntz").alias("window_start"),
                "event_type",
                "n_events",
                "total_value",
            )
        )

    got = drain(plan(events_stream(spark, SMOKE_SF_DIR)), "complete")
    want = plan(
        load(spark, SMOKE_SF_DIR, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    )
    assert spark_result(got) == spark_result(want)


def test_watermark_append_is_prefix_of_batch(spark):
    """ST1/ST8: append-mode emission is exactly the batch result
    restricted to windows the final watermark passed — no extras, no
    altered aggregates."""

    def plan(df):
        return (
            df.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.col("w.start").cast("timestamp_ntz").alias("ws"),
                F.col("w.end").cast("timestamp_ntz").alias("we"),
                "n_events",
            )
        )

    streamed = drain(
        plan(events_stream(spark, SMOKE_SF_DIR).withWatermark("ts", "2 hours")), "append"
    )
    batch_df = load(spark, SMOKE_SF_DIR, "events")
    batch = plan(batch_df.withColumn("ts", F.col("ts").cast("timestamp")))
    max_ts = batch_df.agg(F.max("ts")).collect()[0][0]
    import datetime

    wm = max_ts.replace(microsecond=max_ts.microsecond // 1000 * 1000) - datetime.timedelta(
        hours=2
    )
    want = batch.filter(F.col("we") <= F.lit(wm))
    got_rows = spark_result(streamed)
    want_rows = spark_result(want)
    assert got_rows == want_rows
    # and it IS a strict prefix: batch has windows past the watermark
    assert batch.count() > len(got_rows[1])


def test_stream_dedup_restores_exactly_once(spark):
    """ST5: union-doubled input deduped on event_id == original rows."""
    a = events_stream(spark, SMOKE_SF_DIR)
    b = events_stream(spark, SMOKE_SF_DIR)
    got = drain(
        a.unionAll(b).dropDuplicates(["event_id"]).select("event_id", "user_id"), "append"
    )
    want = load(spark, SMOKE_SF_DIR, "events").select("event_id", "user_id")
    assert spark_result(got) == spark_result(want)
