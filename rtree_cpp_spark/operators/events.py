"""Event-stream analytics (batch form; streaming twins live in
rtree_cpp_spark/streaming/).  Sums go through DECIMAL so aggregation
order can't perturb the doubles the DuckDB oracle compares against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_S = 1800.0


def hourly_rollup(events: DataFrame) -> DataFrame:
    """(hour, event_type, n_events, sum_value): tumbling 1h windows."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


def asof_join(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "view",
) -> DataFrame:
    """As-of join: each ``left_type`` event matched to the most recent
    ``right_type`` event of the same user at-or-before its timestamp
    (ties at equal ts and equal right-ts broken by larger event_id).

    Implemented as union + single ordered window pass — ONE shuffle on
    user_id, O(n log n) — instead of the naive range join whose
    candidate set is quadratic per user.  Inner semantics: left events
    with no prior right event are dropped.

    Output: (click_id, user_id, click_ts, view_id, view_ts).
    """
    both = events.where(F.col("event_type").isin(left_type, right_type)).select(
        "event_id", "user_id", "ts",
        F.when(F.col("event_type") == right_type, 0).otherwise(1).alias("tag"),
        F.when(F.col("event_type") == right_type, F.col("event_id")).alias("r_id"),
        F.when(F.col("event_type") == right_type, F.col("ts")).alias("r_ts"),
    )
    # rights sort before lefts at equal ts (tag 0 < 1); among equal-ts
    # rights the largest event_id comes last, so `last(ignorenulls)` picks
    # exactly the as-of candidate for every left row.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        both.withColumn("view_id", F.last("r_id", ignorenulls=True).over(w))
        .withColumn("view_ts", F.last("r_ts", ignorenulls=True).over(w))
        .where((F.col("tag") == 1) & F.col("view_id").isNotNull())
    )
    return matched.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
        "view_id",
        "view_ts",
    )


def sessionize(events: DataFrame, gap_s: float = SESSION_GAP_S) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap to
    the previous event exceeds ``gap_s`` seconds.

    Output: (user_id, session_id, n_events, start_ts, end_ts) with
    session_id = 1-based index per user.  Ordering ties broken by
    event_id for determinism.
    """
    # parquet timestamps load as TIMESTAMP_NTZ; epoch seconds (with micro
    # fraction) via unix_micros — matches DuckDB's epoch(ts) double exactly
    # (micros < 2^53 so the /1e6 division is exact-then-rounded identically)
    epoch = F.unix_micros(F.col("ts").cast("timestamp_ltz")).cast("double") / F.lit(1000000.0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "new_session",
        F.when(
            (epoch - F.lag(epoch).over(w)).isNull() | ((epoch - F.lag(epoch).over(w)) > gap_s), 1
        ).otherwise(0),
    )
    sessed = flagged.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sessed.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel(events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS) -> DataFrame:
    """Ordered-funnel analysis: how many users completed each step IN
    ORDER — step i counts users with an event of type steps[i] at or
    after their earliest qualifying steps[i-1] event.

    (step int 1-based, step_name, n_users)

    Semantics: t_1(u) = min ts of step-1 events; t_i(u) = min ts of
    step-i events with ts >= t_{i-1}(u) (non-strict: same-timestamp
    progression counts — micros-exact in both engines, no FP).  Pure
    integer counts, order-independent.

    Plan shape: one filtered scan + ONE groupBy(user_id) building a
    sorted per-step timestamp array, then the stage chain resolves
    left-to-right inside the same row (array filter + element_at) —
    never one join per step; final counts are a tiny global agg."""
    typed = events.where(F.col("event_type").isin(*steps)).select("user_id", "event_type", "ts")
    arrs = [
        F.array_sort(F.collect_list(F.when(F.col("event_type") == s, F.col("ts")))).alias(f"_a{i}")
        for i, s in enumerate(steps)
    ]
    staged = typed.groupBy("user_id").agg(*arrs)
    staged = staged.withColumn("_t0", F.try_element_at(F.col("_a0"), F.lit(1)))
    for i in range(1, len(steps)):
        nxt = F.filter(F.col(f"_a{i}"), lambda x: x >= F.col(f"_t{i - 1}"))
        staged = staged.withColumn(f"_t{i}", F.try_element_at(nxt, F.lit(1)))
    counts = staged.agg(
        *[F.count(F.col(f"_t{i}")).alias(f"n{i}") for i in range(len(steps))]
    )
    # one execution of the aggregate: explode the per-step rows out of
    # the single count row (a union of N selects would give the agg N
    # parent branches and re-run it per step)
    per_step = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("step_name"),
                F.col(f"n{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.explode(per_step).alias("r")).select(
        "r.step", "r.step_name", "r.n_users"
    )


def transitions(events: DataFrame) -> DataFrame:
    """(prev_type, next_type, n_transitions): the user-journey Markov
    transition matrix — for each user's time-ordered event stream,
    count every consecutive (previous event type → next event type)
    pair across all users.  The row-normalized counts are the empirical
    transition probabilities behavior-analytics funnels start from.

    Determinism: ordering is (ts, event_id) — event_id breaks
    identical-timestamp ties, so the lag pairs are engine-identical.

    Scale shape: ONE shuffle (the per-user window; same partitioning
    sessionize/funnel use, so a shared user_id repartition serves all
    three in a combined pipeline), then a groupBy over the tiny
    (types x types) key space — partial aggregation makes the second
    shuffle carry O(types^2) rows per task, not O(events)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = events.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    )
    return (
        t.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n_transitions"))
    )
