"""Time-series operators over event streams: EWMA smoothing, robust
(median/MAD) outlier detection, first-seen cumulative distinct users,
and sweep-line peak concurrency.

The reference engine has no time dimension at all (put/get/k-NN —
src/datanode/handler.py); these extend SURVEY §2.3's monitoring tier
(data_quality_report / volume_anomalies, operators/evaluation.py) with
the smoothing and robust-statistics shapes a production pipeline
dashboard runs over its event firehose.

Plan-shape notes (100 TB discipline):
- ewma_smooth never range-joins raw events: it aggregates to hourly
  buckets FIRST (|hours|×|types| rows regardless of event volume),
  then turns the trailing window into an EQUI join by exploding the
  bounded lag sequence 0..span-1 — no inequality join, no
  BroadcastNestedLoop, one hash shuffle on (type, hour).
- mad_outliers is two grouped exact-percentile aggregations (median,
  then median of absolute deviations) plus one final count pass —
  |types|-sized intermediates only. Exact percentile matches the
  repo's grouped_percentiles contract; percentile_approx is the
  documented drop-in at extreme group cardinality.
- cumulative_new_users reduces each user to ONE row (their first-seen
  day) before any window — the running total is a |days|-sized
  cumulative sum, never a distinct-count over a growing window.
- peak_concurrency is the classic sweep line: ±1 boundary events,
  cumulative sum, max — windowed PER DAY so no single-partition
  global window exists; days parallelize freely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ewma_smooth(
    events: DataFrame,
    alpha: float = 0.3,
    span: int = 24,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Trailing exponentially-weighted moving average of hourly event
    counts per type: for each (type, hour) present in the data,
    ewma = Σ_{d=0..span-1} (1-α)^d · cnt[hour-d] / Σ (1-α)^d over the
    hours that EXIST in the window (absent hours contribute neither
    count nor weight — gaps are "no data", not zero; run events
    through events_gapfill first for calendar semantics).

    Output: (event_type, hour, cnt, ewma) — ewma rounded to 6.
    """
    if not 0 < alpha < 1:
        raise ValueError("alpha must be in (0, 1)")
    hourly = (
        events.select(
            F.col(type_col).alias("event_type"),
            # floor, not cast: cast-to-long truncates toward zero, so a
            # pre-epoch timestamp (-0.5h) would merge into bucket 0
            # while the oracle's integer floor-division yields -1
            F.floor(
                F.unix_seconds(F.date_trunc("hour", F.col(ts_col))) / 3600
            )
            .cast("long")
            .alias("hour_id"),
        )
        .groupBy("event_type", "hour_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # trailing window as an EQUI join: source hour h contributes to
    # target hours h..h+span-1 with weight (1-alpha)^delta
    contrib = hourly.select(
        "event_type",
        "cnt",
        F.col("hour_id").alias("src_hour"),
        F.explode(F.sequence(F.lit(0), F.lit(span - 1))).alias("delta"),
    ).select(
        "event_type",
        (F.col("src_hour") + F.col("delta")).alias("hour_id"),
        (F.col("cnt") * F.pow(F.lit(1.0 - alpha), F.col("delta"))).alias("wx"),
        F.pow(F.lit(1.0 - alpha), F.col("delta")).alias("w"),
    )
    smoothed = contrib.groupBy("event_type", "hour_id").agg(
        F.sum("wx").alias("swx"), F.sum("w").alias("sw")
    )
    return (
        hourly.join(smoothed, ["event_type", "hour_id"])
        .select(
            "event_type",
            F.timestamp_seconds(F.col("hour_id") * 3600).alias("hour"),
            "cnt",
            F.round(F.col("swx") / F.col("sw"), 6).alias("ewma"),
        )
        .orderBy("event_type", "hour")
    )


def mad_outliers(
    events: DataFrame,
    k: float = 3.5,
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Robust per-group outlier summary via median absolute deviation:
    med = median(value), mad = median(|value - med|), outlier iff
    |value - med| > k · mad (the Iglewicz-Hoaglin rule's shape; mean/
    stddev-based z-scores break down when the outliers themselves
    inflate the spread). Returns one row per group: (event_type, med,
    mad, n, n_outliers, outlier_rate, max_abs_dev), rounded to 6.
    """
    med = events.groupBy(type_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("med")
    )
    dev = events.join(med, type_col).withColumn(
        "absdev", F.abs(F.col(value_col) - F.col("med"))
    )
    madf = dev.groupBy(type_col).agg(
        F.percentile("absdev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(madf, type_col)
        .groupBy(type_col, "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("absdev") > F.lit(k) * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
            F.max("absdev").alias("max_abs_dev"),
        )
        .select(
            type_col,
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n",
            F.col("n_outliers").cast("long").alias("n_outliers"),
            F.round(F.col("n_outliers") / F.col("n"), 6).alias("outlier_rate"),
            F.round("max_abs_dev", 6).alias("max_abs_dev"),
        )
        .orderBy(type_col)
    )


def cumulative_new_users(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily new-user and cumulative-user counts: a user is "new" on
    the day of their first event. Each user collapses to one first-seen
    row before any window touches the data, so the cumulative sum runs
    over |days| rows — never a distinct-count across a growing frame.
    Every day with ANY activity gets a row (new_users = 0 once the
    population saturates — the interesting part of the curve).
    Output: (day, new_users, cum_users)."""
    day = F.date_trunc("day", F.col(ts_col)).alias("day")
    first_seen = events.groupBy(user_col).agg(
        F.min(F.date_trunc("day", F.col(ts_col))).alias("day")
    )
    new_daily = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    active_days = events.select(day).distinct()
    daily = active_days.join(new_daily, "day", "left").select(
        "day", F.coalesce("new_users", F.lit(0)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    # |days|-sized input: the single-partition window is over ~10^3 rows
    # at any event volume, not over the fact table
    return daily.select(
        F.col("day").cast("date").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    ).orderBy("day")


def peak_concurrency(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Peak simultaneous active users per day, by sweep line over
    user-day activity intervals: each user's span on a day is
    [min(ts), max(ts)]; emit (+1 at start, -1 at end), order by
    (instant, delta) — the -1 sorts first, so an interval ending at
    the exact instant another starts does NOT overlap it — and the
    running sum's max is the day's peak. Output: (day, peak, n_users).

    The sweep is windowed PER DAY (intervals are day-clipped by
    construction), so the cumulative sum parallelizes across days —
    no single-partition global ordering ever exists.
    """
    spans = events.groupBy(
        F.date_trunc("day", F.col(ts_col)).alias("day"), F.col(user_col)
    ).agg(F.min(ts_col).alias("s"), F.max(ts_col).alias("e"))
    points = spans.select(
        "day", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        spans.select("day", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = Window.partitionBy("day").orderBy("t", "delta")
    running = points.withColumn("conc", F.sum("delta").over(w))
    return (
        running.groupBy("day")
        .agg(F.max("conc").alias("peak"))
        .join(
            spans.groupBy("day").agg(F.count(F.lit(1)).alias("n_users")),
            "day",
        )
        .select(F.col("day").cast("date").alias("day"), "peak", "n_users")
        .orderBy("day")
    )
