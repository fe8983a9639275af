"""Column profiling — ANALYZE-style statistics as a long-form DataFrame.

Pipelines audit inputs before burning cluster-days on them: null rates,
cardinalities, and ranges catch schema drift, key collisions, and
truncated loads early. ``profile`` computes every column's stats in ONE
aggregation pass (all columns' aggregates evaluate in the same partial/
final hash-agg — a single scan, a single one-row exchange), then unpivots
to long form driver-side (stack over a one-row frame — no data shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column stats: (col_name, n_rows, n_null, n_distinct, min_value,
    max_value) — min/max rendered as strings so heterogeneous column types
    share one output schema. Exact distinct counts (use approx_count_
    distinct at 100 TB where +-2% is acceptable and the exact count's
    per-column shuffle is not).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(F.when(col.isNull(), 1)).alias(f"__null_{c}"),
            F.count_distinct(col).alias(f"__nd_{c}"),
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null_{c}").alias("n_null"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return (one.select(F.explode(F.array(*per_col)).alias("s"))
            .select("s.col_name", "s.n_rows", "s.n_null", "s.n_distinct",
                    "s.min_value", "s.max_value"))


def materialize_with_metrics(df: DataFrame, metrics: dict[str, "F.Column"],
                             path: str | None = None,
                             fmt: str = "parquet") -> dict:
    """Write (or noop-materialize) ``df`` while collecting aggregate
    data-quality metrics IN THE SAME JOB via the Observation API — the
    audit counters ride along as accumulator-style observed aggregates,
    so a 100 TB write does not pay a second full scan just to know its
    row count / null rate / value bounds.

    ``metrics`` maps names to aggregate Columns (e.g. ``F.count(F.lit(1))``,
    ``F.sum(F.col("x").isNull().cast("long"))``). Returns the observed
    values as a dict.

    ``fmt`` applies only when ``path`` is given; a ``path=None`` noop
    materialization has no output format by definition. Raises on an
    empty metrics dict (the Observation API needs at least one aggregate,
    and a metric-less call is almost certainly a bug at the call site).
    """
    from pyspark.sql import Observation

    if not metrics:
        raise ValueError("materialize_with_metrics: no metrics declared")
    obs = Observation()
    named = [m.alias(k) for k, m in metrics.items()]
    observed = df.observe(obs, named[0], *named[1:])
    w = observed.write.mode("overwrite")
    if path is None:
        w.format("noop").save()
    else:
        w.format(fmt).save(path)
    return obs.get
