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
    zero-delta midnight tick per day in the observed span; the running
    sum over (ts, delta DESC, sid) is the live-session count, and its
    per-day max is the peak. The ticks carry the inherited concurrency
    into days whose first real boundary is an end (or that have no
    boundaries at all) — without them those days under-report or
    vanish. Returns (day, peak_concurrent, n_sessions_started).

    Scale shape (the r4 verdict's one perf-weak item, now fixed): the
    sweep is NOT one global ordered window — that would sort every
    boundary row on a single partition (`WindowExec: No Partition
    Defined` over 2·|sessions| rows). Instead: (1) the running sum
    runs PARTITIONED BY day, so each partition sorts only its own
    day's boundaries; (2) one hash aggregate reduces to |days| rows
    carrying both the in-day peak and the day's total delta (the
    `running` rows still carry `delta`, so no second pass over the
    boundaries); (3) each day's carry-in concurrency = prefix sum of
    PRIOR days' totals — the only unpartitioned window, over the
    |days|-sized table (w8 discipline); carry_in + max(in-day running
    sum) = the global sweep's daily max, exactly (carry_in is
    constant within a day). The midnight-tick span comes from a
    min/max aggregate on `sessions` directly (parquet/row-group
    statistics territory), not from re-deriving the boundary union.
    At 100 TB the biggest sort is the busiest single day, not the
    corpus."""
    sid = (F.col("user_id") * 1_000_000 + F.col("session_id")).alias("sid")
    bounds = sessions.select(
        F.col("session_start").alias("ts"), F.lit(1).alias("delta"), sid
    ).unionAll(
        sessions.select(
            F.col("session_end").alias("ts"), F.lit(-1).alias("delta"), sid
        )
    )
    ticks = (
        sessions.agg(
            F.min(F.col("session_start").cast("date")).alias("d0"),
            F.max(F.col("session_end").cast("date")).alias("d1"),
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
        .select(
            F.col("day").cast("timestamp_ntz").alias("ts"),
            F.lit(0).alias("delta"),
            F.lit(-1).cast("long").alias("sid"),
        )
    )
    bounds = bounds.unionAll(ticks).withColumn("day", F.col("ts").cast("date"))
    # (1): per-day running sum — sorts within each day's partition only.
    w_day = (
        Window.partitionBy("day")
        .orderBy("ts", F.col("delta").desc(), "sid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = bounds.select(
        "day", "delta", F.sum("delta").over(w_day).alias("concurrent_in_day")
    )
    # (2): one aggregate to |days| rows — in-day peak AND day total.
    perday = running.groupBy("day").agg(
        F.max("concurrent_in_day").alias("peak_in_day"),
        F.sum("delta").alias("day_delta"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias(
            "n_sessions_started"
        ),
    )
    # (3): carry-in prefix sum over the |days|-row table.
    w_prefix = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    carry_in = F.coalesce(
        F.sum("day_delta").over(w_prefix), F.lit(0).cast("long")
    )
    return perday.select(
        "day",
        (carry_in + F.col("peak_in_day")).alias("peak_concurrent"),
        "n_sessions_started",
    )
