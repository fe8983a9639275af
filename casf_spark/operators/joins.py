"""Join operators beyond Catalyst's built-ins.

The reference has equi/cross joins only (SURVEY.md §2.3; no as-of/range
joins anywhere — §2.9). These are pipeline extensions, built shuffle-first:

* as-of join — the time-series staple (pandas ``merge_asof`` / Flink
  temporal-join semantics): for each left row, the single right row with
  the greatest right_ts <= left_ts (backward) or smallest >= (forward)
  within the same key group.
* interval join — points matched into [start, end] ranges (Flink interval
  join / Spark range-join semantics) via bucketized equi-join instead of
  an inequality join.

A naive implementation is an inequality join (``l.key = r.key AND r.ts <=
l.ts``) + argmax — Catalyst executes that as a broadcast-nested-loop or a
sort-merge with per-row scans, and the intermediate explodes as |matches|
per left row. The union-tag + window pattern here instead does ONE shuffle
on the key, sorts each partition once, and sweeps linearly: tag right rows
0 and left rows 1, union, and take ``last(right_payload, ignorenulls)``
over a (key)-partitioned (ts, tag)-ordered running window. O(n log n) per
key group, no pair explosion — the plan that survives 100 TB.

Skew: a hot key serializes into one window partition; mitigate by
splitting the key range by coarse time bucket first (trades a second
window pass for parallelism) — at test scale AQE handles it.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIONS = ("backward", "forward")


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str = "ts", right_ts: str = "ts",
              direction: str = "backward",
              right_prefix: str = "r_") -> DataFrame:
    """For each left row, attach the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) its timestamp, per key.

    Left-join semantics: left rows with no qualifying right row keep nulls
    in the right columns. Right payload columns are prefixed with
    ``right_prefix`` (keys and the right timestamp included, so callers can
    compute the time gap). Ties on right_ts resolve to the row latest in
    (right_ts, *payload) order — deterministic for distinct right rows.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}")
    on = list(on)
    payload_cols = [c for c in right.columns if c not in on]
    payload_t = F.struct(*[F.col(c) for c in payload_cols])
    r = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        payload_t.alias("__payload"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__lrow"),
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(
            right.select(payload_t.alias("s")).schema["s"].dataType
        ).alias("__payload"),
        F.struct(*left.columns).alias("__lrow"),
    )
    u = r.unionByName(l)
    if direction == "backward":
        # right rows sort before left at equal ts -> "<=" inclusive;
        # trailing __payload orders equal-ts right rows deterministically
        w = (Window.partitionBy(*on)
             .orderBy(F.col("__t").asc(), F.col("__is_left").asc(),
                      F.col("__payload").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        match = F.last("__payload", ignorenulls=True).over(w)
    else:
        w = (Window.partitionBy(*on)
             .orderBy(F.col("__t").asc(), F.col("__is_left").desc(),
                      F.col("__payload").desc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        match = F.first("__payload", ignorenulls=True).over(w)
    out_cols: list[Column] = [F.col(f"__lrow.{c}").alias(c)
                              for c in left.columns]
    out_cols += [F.col(f"__m.{c}").alias(f"{right_prefix}{c}")
                 for c in payload_cols]
    return (u.withColumn("__m", match)
             .where(F.col("__is_left") == 1)
             .select(*out_cols))


def interval_join(points: DataFrame, intervals: DataFrame,
                  on: Sequence[str], point_ts: str = "ts",
                  start_col: str = "start", end_col: str = "end",
                  bucket_seconds: int = 3600) -> DataFrame:
    """Inner-join point rows into every interval row whose inclusive
    [start_col, end_col] range contains the point's timestamp, matching
    equality keys ``on`` first.

    Catalyst plans a raw ``p.ts BETWEEN i.start AND i.end`` predicate as a
    broadcast-nested-loop (or worse, per-key cartesian) — O(|points| x
    |intervals|) comparisons. This instead discretizes time into
    ``bucket_seconds`` buckets: each interval explodes into the buckets it
    covers, each point maps to one bucket, and the match becomes a plain
    equi-join on (keys..., bucket) + an exact containment filter — one
    hash shuffle, comparisons only within (key, bucket) cells.

    Pick ``bucket_seconds`` near the typical interval length: the explode
    factor is ~len/bucket + 1 per interval, while over-wide buckets put
    unrelated rows in one cell. Column names must not collide between the
    two inputs (rename before calling); both timestamp columns are kept in
    the output.
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    on = list(on)
    w = F.lit(int(bucket_seconds))
    p = points.withColumn(
        "__b", F.floor(F.unix_timestamp(F.col(point_ts)) / w))
    iv = intervals.withColumn(
        "__b",
        F.explode(F.sequence(
            F.floor(F.unix_timestamp(F.col(start_col)) / w),
            F.floor(F.unix_timestamp(F.col(end_col)) / w))))
    return (p.join(iv, on + ["__b"])
            .where(F.col(point_ts).between(F.col(start_col),
                                           F.col(end_col)))
            .drop("__b"))
