"""Declarative data-quality checks — the dbt-test / expectations shape.

A pipeline gate declares WHAT must hold (not-null, set membership, value
ranges, key uniqueness, referential integrity) and gets back one row per
check with its violation count. No equivalent exists in the reference;
this is pipeline-operations surface for the 100 TB ingest gate.

Scale design: every ROW-LEVEL check (not_null / in_set / in_range /
expression) compiles to a conditional SUM in a SINGLE aggregation pass —
one scan, one 1-row exchange, regardless of how many checks are
declared. ``unique`` adds one groupBy on its key (map-side combined,
shuffle carries distinct keys); ``foreign_key`` adds one join against
the dimension's distinct keys (broadcast when small — dimension tables
are). Violation counts, not violating rows: the gate decides pass/fail
cheaply, and a follow-up filtered scan fetches examples only when needed.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    kind: str                      # not_null | in_set | in_range | expr |
                                   # unique | foreign_key
    col: str | None = None
    values: tuple = ()
    lo: float | None = None
    hi: float | None = None
    expr: Column | None = field(default=None, compare=False)
    ref: DataFrame | None = field(default=None, compare=False)
    ref_col: str | None = None


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", "not_null", col=col)


def in_set(col: str, values: Sequence) -> Check:
    return Check(f"in_set({col})", "in_set", col=col, values=tuple(values))


def in_range(col: str, lo: float, hi: float) -> Check:
    return Check(f"in_range({col})", "in_range", col=col, lo=lo, hi=hi)


def expression(name: str, violated_when: Column) -> Check:
    """Custom row-level predicate; counts rows where it holds."""
    return Check(name, "expr", expr=violated_when)


def unique(col: str) -> Check:
    return Check(f"unique({col})", "unique", col=col)


def foreign_key(col: str, ref: DataFrame, ref_col: str) -> Check:
    return Check(f"foreign_key({col})", "foreign_key", col=col, ref=ref,
                 ref_col=ref_col)


def _violation(c: Check) -> Column:
    if c.kind == "not_null":
        v = F.col(c.col).isNull()
    elif c.kind == "in_set":
        v = ~F.col(c.col).isin(*c.values) | F.col(c.col).isNull()
    elif c.kind == "in_range":
        v = (F.col(c.col) < c.lo) | (F.col(c.col) > c.hi) \
            | F.col(c.col).isNull()
    elif c.kind == "expr":
        v = c.expr
    else:  # pragma: no cover
        raise ValueError(f"not a row-level check: {c.kind}")
    return F.sum(v.cast("long")).alias(c.name)


def run_checks(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Evaluate all checks -> (check_name, n_violations), fused as
    described in the module docstring. Raises on an empty check list —
    silently returning nothing would read as 'all checks passed'."""
    if not checks:
        raise ValueError("run_checks: no checks declared")
    row_level = [c for c in checks if c.kind in
                 ("not_null", "in_set", "in_range", "expr")]
    parts: list[DataFrame] = []
    if row_level:
        wide = df.agg(*[_violation(c) for c in row_level])
        stacked = ", ".join(f"'{c.name}', `{c.name}`" for c in row_level)
        parts.append(wide.select(
            F.expr(f"stack({len(row_level)}, {stacked}) "
                   "AS (check_name, n_violations)")))
    for c in checks:
        if c.kind == "unique":
            dup = (df.groupBy(c.col)
                   .agg(F.count(F.lit(1)).alias("_n"))
                   .where(F.col("_n") > 1)
                   .agg(F.coalesce(F.sum("_n"), F.lit(0))
                        .alias("n_violations"))
                   .select(F.lit(c.name).alias("check_name"),
                           "n_violations"))
            parts.append(dup)
        elif c.kind == "foreign_key":
            keys = c.ref.select(F.col(c.ref_col).alias(c.col)).distinct()
            orphans = (df.select(c.col).where(F.col(c.col).isNotNull())
                       .join(keys, c.col, "left_anti")
                       .agg(F.count(F.lit(1)).alias("n_violations"))
                       .select(F.lit(c.name).alias("check_name"),
                               "n_violations"))
            parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("check_name",
                      F.col("n_violations").cast("long").alias("n_violations"))
