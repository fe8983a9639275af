"""Distributed linear-algebra primitives over array<float> columns.

The reference has no linear algebra beyond cosine (MatrixCosineAnalyse.
scala); these are extension operators for the embedding-pipeline surface:
the dominant principal direction of an embedding corpus (power iteration)
is the standard first look at embedding-space anisotropy before whitening
or outlier pruning.

Scale design: one iteration = one distributed matvec — dot(x_i, v) is a
per-row array fold (JVM-side higher-order functions, no Python), the
coordinate sums are one (pos)-keyed aggregation of N*D exploded rows with
map-side combine, and the driver holds only the D-dim vector between
iterations (same coordinator pattern as Spark-ML KMeans; D is the
embedding width, never the corpus size).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dot_with_const(vec_col: str, v: list[float]):
    lit_v = F.array(*[F.lit(float(x)) for x in v])
    prods = F.zip_with(F.col(vec_col), lit_v, lambda a, b: a * b)
    return F.aggregate(prods, F.lit(0.0),
                       lambda acc, x: acc + x.cast("double"))


def power_iteration(df: DataFrame, vec_col: str = "embedding",
                    n_iter: int = 8, dim: int | None = None) -> DataFrame:
    """Dominant eigenvector of the (uncentered) Gram matrix X'X via power
    iteration: v <- normalize(X'(Xv)), `n_iter` rounds from the all-ones
    start. Deterministic: fixed start, fixed iteration count, sign fixed
    so the largest-magnitude loading is positive.

    Returns a D-row DataFrame (pos INT, loading DOUBLE rounded 6dp).
    """
    spark: SparkSession = df.sparkSession
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            raise ValueError("power_iteration: empty input")
        dim = first["d"]
    v = [1.0 / math.sqrt(dim)] * dim
    for _ in range(n_iter):
        step = df.select(_dot_with_const(vec_col, v).alias("dp"),
                         F.posexplode(F.col(vec_col)))
        sums = (step.groupBy("pos")
                .agg(F.sum(F.col("col").cast("double") * F.col("dp"))
                     .alias("w"))
                .collect())
        w = [0.0] * dim
        for r in sums:
            w[r["pos"]] = r["w"]
        nrm = math.sqrt(sum(x * x for x in w)) or 1.0
        v = [x / nrm for x in w]
    # deterministic sign: largest-|loading| coordinate positive
    peak = max(range(dim), key=lambda i: (abs(v[i]), -i))
    if v[peak] < 0:
        v = [-x for x in v]
    return spark.createDataFrame(
        [(i, round(x, 6)) for i, x in enumerate(v)],
        "pos INT, loading DOUBLE")
