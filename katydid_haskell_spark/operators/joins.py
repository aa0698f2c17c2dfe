"""Temporal joins Spark lacks natively, built scale-first.

- :func:`asof_join` — for each left row, the single right row with the
  greatest ``right_ts <= left_ts`` for the same key.  The naive
  formulation (inequality join + row_number) explodes into a range join
  (O(|L|x|R|) per key, BroadcastNestedLoop at worst); a plain per-key
  union-and-window fixes that but funnels every row of a hot key
  through ONE task's sort (the r7 review's skew hazard — one user/host
  with 10^9 events at 100 TB).  This one is the time-BUCKETED
  union-and-window: both sides union on (key, time bucket), the window
  carries the latest right-row STRUCT forward *within each bucket*
  (partition size bounded by bucket width, never by key volume), and a
  second pass over the tiny (key x bucket) closing-state table — one
  row per bucket per key, bounded by time-span / bucket_seconds,
  independent of event count — derives each bucket's opening state.
  Carried value = coalesce(in-bucket carry, bucket opening state).
  The struct carry also gives per-row ASOF semantics: a matched right
  row's NULLs come through, and all carried columns come from the SAME
  right row (a per-column last(ignorenulls) would mix rows).

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
              tiebreak: Optional[str] = None,
              bucket_seconds: int = 3600) -> DataFrame:
    """Left rows + the latest right row at-or-before each left row's
    timestamp, per ``on`` key.  Right rows with no later match and left
    rows before the first right row yield nulls in the carried columns
    (coalesce downstream).  ``tiebreak`` (a right column, e.g. a unique
    id) makes the winner among equal-(key, ts) right rows
    deterministic: the greatest tiebreak value wins.

    Skew-safe composition (see module docstring): the union-and-window
    runs per (key, floor(unix_ts / bucket_seconds)) bucket, so no window
    partition ever spans a whole key; cross-bucket state arrives via the
    (key x bucket) closing-state table.  ``bucket_seconds`` trades the
    state-table size (time-span / bucket_seconds rows per key) against
    the per-window partition bound — hot keys want smaller buckets.

    NULL semantics: carried columns come from ONE right row (struct
    carry), so a matched right row's own NULLs are returned, matching a
    native ASOF join.  NULL keys and NULL timestamps never match."""
    from pyspark.sql.types import StructField, StructType

    right_cols = list(right_cols or [])
    if not right_cols:
        return left
    st_type = StructType([StructField(c, right.schema[c].dataType)
                          for c in right_cols])
    tb = (F.col(tiebreak) if tiebreak is not None
          else F.lit(None).cast("long"))
    lhs = left.select(
        "*", F.lit(0).alias("__side"), F.col(left_ts).alias("__ts"))
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        tb.alias("__tb"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__st"),
    ).filter(F.col(on).isNotNull() & F.col("__ts").isNotNull())
    unioned = (lhs.unionByName(rhs, allowMissingColumns=True)
               .withColumn("__bkt",
                           F.floor(F.unix_timestamp(F.col("__ts"))
                                   / F.lit(bucket_seconds))))
    order = [F.col("__ts").asc(), F.col("__side").desc()]
    if tiebreak is not None:
        # left rows hold null __tb, which sorts first under asc —
        # harmless since __side already separates the sides at equal ts
        order.append(F.col("__tb").asc_nulls_first())
    w = (Window.partitionBy(on, "__bkt").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    in_bucket = unioned.withColumn(
        "__in", F.last("__st", ignorenulls=True).over(w))

    # closing state per (key, right bucket): the carried struct of the
    # bucket's last right row — one row per bucket per key
    rb = unioned.filter(F.col("__side") == 1).groupBy(on, "__bkt")
    close_ord = (F.struct(F.col("__ts"), F.col("__tb"))
                 if tiebreak is not None else F.col("__ts"))
    closing = rb.agg(F.max_by("__st", close_ord).alias("__close"))
    # opening state per left bucket = last closing among EARLIER buckets:
    # a window over the tiny state table (query rows sort before the
    # same bucket's closing so in-bucket rights stay in-bucket-only)
    queries = (unioned.filter(F.col("__side") == 0)
               .select(on, "__bkt").distinct()
               .select(on, "__bkt", F.lit(1).alias("__q"),
                       F.lit(None).cast(st_type).alias("__close")))
    states = closing.select(
        on, "__bkt", F.lit(0).alias("__q"), "__close"
    ).unionByName(queries)
    wo = (Window.partitionBy(on)
          .orderBy(F.col("__bkt").asc(), F.col("__q").desc())
          .rowsBetween(Window.unboundedPreceding, -1))
    openings = (states
                .withColumn("__open",
                            F.last("__close", ignorenulls=True).over(wo))
                .filter(F.col("__q") == 1)
                .select(on, "__bkt", "__open"))

    out = (in_bucket.filter(F.col("__side") == 0)
           .join(openings, [on, "__bkt"], "left")
           .withColumn("__fin", F.coalesce(F.col("__in"), F.col("__open"))))
    for c in right_cols:
        out = out.withColumn(f"asof_{c}", F.col("__fin").getField(c))
    return out.drop("__side", "__ts", "__tb", "__st", "__bkt",
                    "__in", "__open", "__fin")


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
