"""Input-split-independent parallelism for compute-heavy operators.

A parquet scan parallelizes at ROW-GROUP granularity: a small table
written as one row group is ONE task no matter what
``spark.sql.files.*`` says.  Operators whose expensive work (explode
fan-out, Arrow-kernel refine, per-row geometry) sits BEFORE the first
shuffle — e.g. a broadcast-join pipeline — inherit that single split
and run on one core while the rest of the cluster idles.

``fan_out`` is the guard: round-robin repartition IFF the plan's
current parallelism is below the session default.  At real scale the
scan already carries >= defaultParallelism splits and this is a
plan-time no-op (no shuffle added); it only fires for the
small-file pathology.  Only use it on operators whose output is
order-independent per row (filters, per-row maps, exact-arithmetic
aggregations) — a repartition reorders rows, which changes the bit
pattern of float fold-order-sensitive aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` round-robin to the session's default
    parallelism iff its current plan parallelism is lower.  ``min_parts``
    overrides the target.  Plan-time decision — cheap (one plan->RDD
    conversion, nothing executed)."""
    sc = df.sparkSession.sparkContext
    target = min_parts if min_parts is not None else sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
