"""Scale-safe window patterns.

``partitioned_running_sum`` is the TWO-PASS RANGE-PARTITIONED cumulative
sum — the repo's standard replacement for ``Window.orderBy(...)`` global
running sums, which funnel every row through one WindowExec partition
(the round-3 verdict's scale flag on e_peak_concurrency/e_user_pareto):

1. bucket rows by a key that is MONOTONE NON-DECREASING in the window
   order (a calendar day over event time, an id-range over ordered ids)
   — so concatenating per-bucket prefixes in bucket order reconstructs
   the global order;
2. pass 1: the running sum runs per (group, bucket) — partitioned, so
   every WindowExec input is one bucket's rows;
3. pass 2: per-bucket totals roll into each bucket's carried-in offset
   via a window over the per-bucket AGGREGATE (rows = bucket count,
   bounded by time-span/id-range, not data size), joined back on the
   bucket key;
4. global_cumsum = local_cumsum + prior-bucket offset, exactly the
   single-window result.

Used by plans/events_q.py:e_peak_concurrency (day buckets over session
boundary markers) and plans/textstats.py:t_sequence_pack (doc-id-range
buckets per source).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def partitioned_running_sum(
    df: DataFrame,
    bucket: Column,
    order_cols: Sequence[str | Column],
    value_col: str,
    out_col: str,
    group_cols: Sequence[str] = (),
    broadcast_offsets: bool = False,
) -> DataFrame:
    """Running sum of ``value_col`` over rows ordered by ``order_cols``
    (within each ``group_cols`` group when given), computed without any
    unpartitioned window over the data rows.

    ``bucket`` MUST be monotone non-decreasing in the order — the caller
    owns that invariant (a bucket that interleaves order keys silently
    mis-sums; cheap choices that always satisfy it: a date-trunc of the
    leading time order key, or ``id DIV k`` of a leading integer key).

    Set ``broadcast_offsets=True`` only when the bucket count is known
    to be driver-small (e.g. calendar days); with per-group buckets let
    AQE decide."""
    groups = list(group_cols)
    marked = df.withColumn("__psum_bucket", bucket)
    local_w = (
        Window.partitionBy(*groups, "__psum_bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = marked.withColumn("__psum_local", F.sum(value_col).over(local_w))
    bucket_tot = marked.groupBy(*groups, "__psum_bucket").agg(
        F.sum(value_col).alias("__psum_tot")
    )
    # window over the per-bucket aggregate: partitioned by group; rows
    # per partition = that group's bucket count (bounded by key range)
    off_w = (
        Window.partitionBy(*groups)
        .orderBy("__psum_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_tot.select(
        *groups,
        "__psum_bucket",
        F.coalesce(F.sum("__psum_tot").over(off_w), F.lit(0)).alias("__psum_off"),
    )
    if broadcast_offsets:
        offsets = F.broadcast(offsets)
    # NULL-SAFE join keys: a plain equi-join would silently DROP any row
    # whose bucket (or group) value is NULL (null keys never match in
    # SQL), where the single-window form this operator replaces keeps
    # them (nulls-first in the order). eqNullSafe preserves exact
    # equivalence; the pass-2 window's default asc_nulls_first likewise
    # matches the single-window null placement.
    l, o = local.alias("__psum_l"), offsets.alias("__psum_o")
    cond = F.col("__psum_l.__psum_bucket").eqNullSafe(
        F.col("__psum_o.__psum_bucket")
    )
    for g in groups:
        cond = cond & F.col(f"__psum_l.{g}").eqNullSafe(F.col(f"__psum_o.{g}"))
    return (
        l.join(o, cond)
        .select("__psum_l.*", F.col("__psum_o.__psum_off").alias("__psum_off"))
        .withColumn(out_col, F.col("__psum_local") + F.col("__psum_off"))
        .drop("__psum_bucket", "__psum_local", "__psum_off")
    )
