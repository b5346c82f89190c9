"""Event-stream analytics, batch side (SURVEY.md §7 M4).

These are the batch twins of the §2.9 streaming operators — identical
logical plans over the bounded events table. The streaming variants in
queries/streaming_queries.py replay the same data through readStream
and must produce these exact results (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_programming_spark.functions.canonical import DEC, oracle_dsum
from big_data_programming_spark.operators.sessions import SESSIONIZE_ORACLE_SQL, sessionize
from big_data_programming_spark.registry import register
from big_data_programming_spark.sources.loaders import load


@register(
    "e1_hourly_event_stats",
    oracle=f"""
SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hour,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {oracle_dsum('value', 'total_value')}
FROM events
GROUP BY 1, 2
""",
    tags=("ST2", "F2", "A1"),
)
def e1_hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour aggregation (batch twin of the streaming window
    agg). date_trunc keys the hash aggregate; low-cardinality output."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
    )


#: DuckDB twin of F.window("ts", "1 hour", "15 minutes") — each event
#: lands in exactly 4 overlapping windows; the offsets CTE reconstructs
#: Spark's window-start arithmetic. Shared with the streaming variant
#: (queries/streaming_queries.py st3).
E2_SLIDING_ORACLE = """
WITH offsets(j) AS (VALUES (0), (1), (2), (3)),
win AS (
  SELECT make_timestamp(((CAST(FLOOR(EPOCH(ts)) AS BIGINT) - j * 900) // 3600 * 3600 + j * 900) * 1000000)
           AS window_start,
         value
  FROM events CROSS JOIN offsets
)
SELECT window_start,
       make_timestamp((CAST(EPOCH(window_start) AS BIGINT) + 3600) * 1000000) AS window_end,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS total_value
FROM win
GROUP BY 1
"""


@register(
    "e2_sliding_windows",
    oracle=E2_SLIDING_ORACLE,
    tags=("ST3",),
)
def e2_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/15m window counts via F.window — each event lands in
    exactly 4 overlapping windows (the oracle reconstructs them with the
    offset arithmetic Spark uses internally)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "e3_sessionization",
    oracle=SESSIONIZE_ORACLE_SQL.format(gap_us=30 * 60 * 1_000_000),
    tags=("ST4", "W2", "W4"),
)
def e3_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity gap) — batch twin
    of session_window; see operators/sessions.py for the algorithm."""
    return sessionize(load(spark, sf_dir, "events"), gap_minutes=30)


@register(
    "e4_transition_counts",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY 1, 2
""",
    tags=("W2", "A1"),
)
def e4_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-style event-type transition matrix from per-user lag."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@register(
    "e5_daily_users",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(CAST(DATE_TRUNC('day', ts) AS TIMESTAMP)) AS first_day
  FROM events GROUP BY user_id
), daily AS (
  SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day, user_id
  FROM events GROUP BY 1, 2
)
SELECT d.day,
       COUNT(*) AS active_users,
       COUNT(*) FILTER (f.first_day = d.day) AS new_users
FROM daily d JOIN firsts f USING (user_id)
GROUP BY d.day
""",
    tags=("A1", "A3", "J1"),
)
def e5_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU with new-vs-returning split (first-touch attribution)."""
    e = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("timestamp_ntz")
    daily = e.select(day.alias("day"), "user_id").distinct()
    firsts = daily.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        daily.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.sum(F.when(F.col("first_day") == F.col("day"), 1).otherwise(0)).alias("new_users"),
        )
    )
