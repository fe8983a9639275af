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


def _bind(expr: Column, fn) -> Column:
    """Let-binding for Column expressions: evaluate ``expr`` ONCE and pass
    it to ``fn`` as a lambda variable (array→transform→element_at).

    Catalyst has no common-subexpression elimination across references
    inside higher-order lambdas — an O(d) subexpression referenced in a
    per-element lambda is re-evaluated per element (O(d²) per row). Binding
    it as a lambda variable restores single evaluation.
    """
    return F.element_at(F.transform(F.array(expr), fn), 1)


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    c = as_double(a)
    return F.sqrt(F.aggregate(
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm.

    dot and both norms are let-bound so each O(d) reduction runs once per
    row, not once per reference in the guard/division expression.
    """
    parts = F.struct(dot(a, b).alias("d"),
                     norm(a).alias("na"), norm(b).alias("nb"))
    return _bind(parts, lambda t: F.when(
        (t["na"] > 0) & (t["nb"] > 0),
        t["d"] / (t["na"] * t["nb"])).otherwise(F.lit(0.0)))


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize so cosine becomes a plain dot product downstream —
    normalize once, reuse across many candidate comparisons.

    The norm is let-bound: referencing it directly inside the per-element
    division lambda would re-reduce the whole array per element (O(d²))."""
    c = as_double(a)
    return _bind(norm(c), lambda n: F.when(
        n > 0, F.transform(c, lambda x: x / n)).otherwise(c))
