"""Sessionization — the batch twin of Structured Streaming's
session_window (SURVEY.md §2.9 ST4, §7 M4).

Gap-based algorithm, pure window algebra (no Python boundary):
1. per user, lag(ts) over event order → gap to previous event;
2. new-session flag where gap exceeds the threshold (or first event);
3. running sum of flags = session ordinal → (user_id, session_id);
4. aggregate per session.

One shuffle (partitionBy user), one window pass, one hash aggregate —
holds at any scale because state per key is a single counter, and
skewed users are split by AQE at the final aggregate (the window itself
is inherently per-user sequential, as sessionization must be).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_programming_spark.functions.canonical import DEC


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Assign session ids and aggregate one row per session."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    gap_us: Column = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        F.lag(ts_col).over(w).cast("timestamp")
    )
    flagged = events.withColumn(
        "is_new_session",
        F.when(gap_us.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1).otherwise(0),
    )
    with_ids = flagged.withColumn(
        "session_id",
        F.sum("is_new_session").over(
            Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    return with_ids.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("session_value"),
    )


#: DuckDB twin of :func:`sessionize` — kept adjacent so the two
#: formulations evolve together.
SESSIONIZE_ORACLE_SQL = """
WITH gaps AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > {gap_us}
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), ids AS (
  -- CAST: DuckDB window-SUM(int) yields HUGEINT -> pandas float64,
  -- which hash-mismatches Spark's int64 under the driver's canon.
  SELECT *, CAST(SUM(is_new_session) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM gaps
)
SELECT user_id, session_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS session_value
FROM ids
GROUP BY user_id, session_id
"""


def peak_concurrency(sessions: DataFrame) -> DataFrame:
    """Daily peak live-session count by sweep line over session
    intervals (e18's engine, factored for synthetic-scenario tests).

    Boundary rows (+1 at session_start, −1 at session_end) plus one
    zero-delta midnight tick per day in the observed span; the global
    running sum over (ts, delta DESC, sid) is the live-session count,
    and its per-day max is the peak. The ticks carry the inherited
    concurrency into days whose first real boundary is an end (or that
    have no boundaries at all) — without them those days under-report
    or vanish. Returns (day, peak_concurrent, n_sessions_started)."""
    sid = (F.col("user_id") * 1_000_000 + F.col("session_id")).alias("sid")
    bounds = sessions.select(
        F.col("session_start").alias("ts"), F.lit(1).alias("delta"), sid
    ).unionAll(
        sessions.select(
            F.col("session_end").alias("ts"), F.lit(-1).alias("delta"), sid
        )
    )
    ticks = (
        bounds.agg(
            F.min(F.col("ts").cast("date")).alias("d0"),
            F.max(F.col("ts").cast("date")).alias("d1"),
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
        .select(
            F.col("day").cast("timestamp_ntz").alias("ts"),
            F.lit(0).alias("delta"),
            F.lit(-1).cast("long").alias("sid"),
        )
    )
    bounds = bounds.unionAll(ticks)
    w = (
        Window.orderBy("ts", F.col("delta").desc(), "sid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = bounds.select(
        "ts", "delta", F.sum("delta").over(w).alias("concurrent")
    )
    return running.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.max("concurrent").alias("peak_concurrent"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias(
            "n_sessions_started"
        ),
    )
