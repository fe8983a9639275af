"""Change-data-capture compaction: changelog -> current snapshot.

The lakehouse MERGE shape without a table format: given a stream/log of
keyed changes (upserts and deletes, each carrying a version), produce
the current state — the newest change per key wins, and keys whose
newest change is a delete disappear. This is how a parquet-only pipeline
materializes a mutable source (database CDC feed, dedup index, feature
snapshots); swap the final write for MERGE INTO on Delta/Iceberg and the
plan body is identical.

Scale shape: one hash shuffle on the key (struct-argmax aggregation —
map-side combined, no window sort), then a filter. Shuffle width is
distinct keys, not changelog length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_snapshot(changelog: DataFrame, key_cols: Sequence[str],
                 version_cols: Sequence[str], op_col: str,
                 delete_op: str = "d") -> DataFrame:
    """Latest-change-wins snapshot.

    ``version_cols`` is the total-order tiebreak (e.g. commit ts +
    sequence); ``op_col`` holds the operation, ``delete_op`` marking
    deletes. Returns the surviving rows (all changelog columns, minus
    nothing — callers project).
    """
    key_cols = list(key_cols)
    ver = F.struct(*[F.col(c) for c in version_cols])
    payload = F.struct(ver.alias("_v"),
                       F.struct(*[F.col(c) for c in changelog.columns])
                       .alias("_row"))
    latest = (changelog.groupBy(*key_cols)
              .agg(F.max(payload).alias("_w"))
              .select(F.col("_w._row.*")))
    return latest.where(F.col(op_col) != delete_op)
