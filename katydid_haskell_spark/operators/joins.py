"""Temporal joins Spark lacks natively, built scale-first.

- :func:`asof_join` — for each left row, the single right row with the
  greatest ``right_ts <= left_ts`` for the same key.  The naive
  formulation (inequality join + row_number) explodes into a range join
  (O(|L|x|R|) per key, BroadcastNestedLoop at worst); this one is the
  union-and-window composition: tag both sides, union on (key, ts),
  carry the latest right values forward with ``last(ignorenulls)`` over
  an ordered window, keep the left rows.  ONE shuffle on the key, state
  per partition is a single running value — the shape every
  streams-and-snapshots pipeline (quotes x trades, crawl state x fetch)
  needs at 100 TB.

- :func:`range_join_count` — events aggregated into [start, end)
  windows via a time-BUCKET equi-join: windows explode into the few
  buckets they span, events map to exactly one bucket, the join is a
  plain hash join on (key, bucket), and the exact containment predicate
  filters after.  Catalyst would otherwise plan an inequality-only join
  as BroadcastNestedLoop — the plan test pins that it does not happen.

DuckDB mirrors: ASOF JOIN is native (the oracle uses it verbatim);
range containment is a plain BETWEEN join — the oracle never needs the
bucket decomposition, which is exactly what makes it a trustworthy
cross-check of the bucketing.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: Optional[Sequence[str]] = None,
              tiebreak: Optional[str] = None) -> DataFrame:
    """Left rows + the latest right row at-or-before each left row's
    timestamp, per ``on`` key.  Right rows with no later match and left
    rows before the first right row yield nulls in the carried columns
    (coalesce downstream).  ``tiebreak`` (a right column, e.g. a unique
    id) makes the winner among equal-(key, ts) right rows
    deterministic: the greatest tiebreak value wins."""
    right_cols = list(right_cols or [])
    carried = [f"__r_{c}" for c in right_cols]
    lhs = left.withColumn("__side", F.lit(0)).withColumn(
        "__ts", F.col(left_ts))
    for c, a in zip(right_cols, carried):
        lhs = lhs.withColumn(a, F.lit(None).cast(right.schema[c].dataType))
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(a) for c, a in zip(right_cols, carried)],
    )
    for f in lhs.columns:
        if f not in rhs.columns:
            rhs = rhs.withColumn(f, F.lit(None).cast(
                dict(zip(lhs.columns,
                         [x.dataType for x in lhs.schema]))[f]))
    rhs = rhs.select(*lhs.columns)
    unioned = lhs.unionByName(rhs)
    order = [F.col("__ts").asc(), F.col("__side").desc()]
    if tiebreak is not None:
        # right rows carry the tiebreak in its carried alias; left rows
        # hold null there, which sorts first under asc — harmless since
        # __side already separates the sides at equal ts
        order.append(F.col(f"__r_{tiebreak}").asc_nulls_first())
    w = (Window.partitionBy(on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = unioned
    for a in carried:
        out = out.withColumn(a, F.last(a, ignorenulls=True).over(w))
    return (out.filter(F.col("__side") == 0)
            .drop("__side", "__ts")
            .withColumnsRenamed({a: f"asof_{c}"
                                 for c, a in zip(right_cols, carried)}))


def range_join_count(events: DataFrame, windows: DataFrame, on: str,
                     event_ts: str, window_id: str, start_ts: str,
                     duration_expr: str = "INTERVAL 30 MINUTES",
                     bucket_seconds: int = 1800) -> DataFrame:
    """(window_id, key, n_events): count of events with
    ``start <= event_ts < start + duration`` per window, via the
    bucketed equi-join.  ``bucket_seconds`` must be >= the duration so
    a window spans at most two buckets."""
    ev = events.select(
        F.col(on),
        F.col(event_ts).alias("__ets"),
        F.floor(F.unix_timestamp(F.col(event_ts))
                / F.lit(bucket_seconds)).alias("__bucket"),
    )
    win = windows.select(
        F.col(window_id).alias("__wid"),
        F.col(on),
        F.col(start_ts).alias("__wstart"),
        (F.col(start_ts) + F.expr(duration_expr)).alias("__wend"),
    )
    b0 = F.floor(F.unix_timestamp(F.col("__wstart")) / F.lit(bucket_seconds))
    b1 = F.floor(F.unix_timestamp(F.col("__wend")) / F.lit(bucket_seconds))
    win = win.withColumn("__bucket", F.explode(F.sequence(b0, b1)))
    joined = win.join(ev, [on, "__bucket"]).where(
        (F.col("__ets") >= F.col("__wstart"))
        & (F.col("__ets") < F.col("__wend")))
    return (joined.groupBy("__wid", on)
            .agg(F.count(F.lit(1)).alias("n_events"))
            .withColumnRenamed("__wid", window_id))
