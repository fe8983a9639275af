"""Distributed linear-algebra primitives over array<float> columns.

The reference has no linear algebra beyond cosine (MatrixCosineAnalyse.
scala); these are extension operators for the embedding-pipeline surface:
the dominant principal direction of an embedding corpus (power iteration)
is the standard first look at embedding-space anisotropy before whitening
or outlier pruning.

Scale design: the corpus is touched EXACTLY ONCE — each partition reduces
to a D x D partial Gram matrix via an Arrow-batched numpy gemm
(X_batch' @ X_batch), the partials (one D^2 row per partition, KBs) are
collected, and the power iteration runs on the driver against the summed
D x D Gram. Iterations therefore cost zero cluster work; D is the
embedding width (64-4096), never the corpus size. A per-round distributed
matvec was measured 6.7 s at sf0.1 — not from data volume but from
Catalyst re-planning each round's fresh literal vector; the one-pass Gram
form is ~1 job total and scales linearly in rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix(df: DataFrame, vec_col: str = "embedding",
                dim: int | None = None):
    """Sum of outer products X'X as a dim x dim numpy array, computed as
    per-partition Arrow-batched gemm partials (mapInPandas) + driver sum.
    One pass over the corpus; shuffle-free."""
    import numpy as np

    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            raise ValueError("gram_matrix: empty input")
        dim = first["d"]

    d = dim

    def part(batches):
        import pandas as pd

        acc = np.zeros((d, d), dtype=np.float64)
        seen = False
        for pdf in batches:
            if len(pdf):
                m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                acc += m.T @ m
                seen = True
        if seen:
            yield pd.DataFrame({"g": [acc.ravel().tolist()]})

    parts = df.select(vec_col).mapInPandas(part, "g array<double>").collect()
    g = np.zeros((d, d), dtype=np.float64)
    for r in parts:
        g += np.array(r["g"], dtype=np.float64).reshape(d, d)
    return g


def power_iteration(df: DataFrame, vec_col: str = "embedding",
                    n_iter: int = 8, dim: int | None = None) -> DataFrame:
    """Dominant eigenvector of the (uncentered) Gram matrix X'X via power
    iteration: v <- normalize(G v), `n_iter` rounds from the all-ones
    start, against the one-pass distributed Gram. Deterministic: fixed
    start, fixed iteration count, sign fixed so the largest-magnitude
    loading is positive.

    Returns a D-row DataFrame (pos INT, loading DOUBLE rounded 6dp).
    """
    spark = df.sparkSession
    g = gram_matrix(df, vec_col, dim)
    d = g.shape[0]
    import numpy as np

    v = np.full(d, 1.0 / math.sqrt(d))
    for _ in range(n_iter):
        w = g @ v
        nrm = float(np.linalg.norm(w)) or 1.0
        v = w / nrm
    peak = int(np.argmax(np.abs(v)))
    if v[peak] < 0:
        v = -v
    return spark.createDataFrame(
        [(i, round(float(x), 6)) for i, x in enumerate(v)],
        "pos INT, loading DOUBLE")
