"""Dense-vector Column expressions over array<float|double> embedding columns.

All JVM-side (``zip_with`` / ``aggregate`` higher-order functions) — no
Python UDFs, so ANN scans stay inside whole-stage codegen. Doubles
throughout: the test embeddings are array<float>; promoting before
arithmetic keeps parity with the DuckDB oracle (which computes in double).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    c = as_double(a)
    return F.sqrt(F.aggregate(
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize so cosine becomes a plain dot product downstream —
    normalize once, reuse across many candidate comparisons."""
    c = as_double(a)
    n = norm(c)
    return F.when(n > 0, F.transform(c, lambda x: x / n)).otherwise(c)
