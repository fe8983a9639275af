"""Skew mitigation operators.

AQE's skew-join splitting handles moderate skew on shuffle joins
automatically (enabled in casf_spark.session). These helpers cover the
cases AQE does NOT fix:

* ``salted_join`` — a broadcast-infeasible join where one key carries a
  disproportionate share of BOTH sides' rows. AQE splits oversized
  *partitions* of the stream side, but every row of a hot key still meets
  the same build rows; salting splits the hot key itself into ``n_salt``
  sub-keys at the cost of replicating the small side n_salt times.
* ``salted_count_distinct`` — exact COUNT(DISTINCT v) per key. The naive
  plan shuffles every (key, v) occurrence to one reducer per key; hash
  aggregation's map-side combine doesn't help when v cardinality is high
  per key. Two-phase salting dedups (key, salt, v) partials first, so the
  final per-key exchange carries only distinct values.

Salts are derived deterministically (hash of row content / the value),
never from randomness — results are reproducible and retry-safe (a task
retry re-derives the same salt, where ``rand()`` would re-deal rows and
double-count).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, on: Sequence[str],
                n_salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with the big side's keys split into ``n_salt`` sub-keys.

    The big side gets ``salt = hash(all columns) % n_salt`` (deterministic,
    spreads a hot key's rows across n_salt reducers); the small side is
    replicated once per salt value via an explode — so ``small`` must be
    small enough to multiply by n_salt, which is exactly the regime where
    a hot key would otherwise pin one reducer. Output columns match
    ``big.join(small, on, how)``.
    """
    if n_salt < 1:
        raise ValueError("n_salt must be >= 1")
    on = list(on)
    salt_b = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                    F.lit(n_salt))
    b = big.withColumn("__salt", salt_b)
    s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("long"),
                             F.lit(n_salt - 1).cast("long"))))
    out = b.join(s, on + ["__salt"], how).drop("__salt")
    return out


def salted_count_distinct(df: DataFrame, keys: Sequence[str],
                          value: Column | str, n_salt: int = 32,
                          out_col: str = "n_distinct") -> DataFrame:
    """Exact per-key COUNT(DISTINCT value) that survives hot keys.

    Phase 1 groups on (keys..., salt(value)) and collapses duplicates of
    each value inside its salt bucket; phase 2 sums bucket counts per key.
    The phase-2 exchange carries n_salt rows per key instead of one row
    per (key, value occurrence). Salt is derived from the VALUE, so equal
    values always land in the same bucket and are never double-counted.
    """
    if n_salt < 1:
        raise ValueError("n_salt must be >= 1")
    keys = list(keys)
    v = F.col(value) if isinstance(value, str) else value
    bucketed = df.select(
        *keys, v.alias("__v"),
        F.pmod(F.xxhash64(v), F.lit(n_salt)).alias("__salt"))
    partial = (bucketed.groupBy(*keys, "__salt")
               .agg(F.count_distinct("__v").alias("__n")))
    return (partial.groupBy(*keys)
            .agg(F.sum("__n").alias(out_col)))
