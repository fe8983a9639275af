"""Property-based differential tests: the Spark engine vs an independent
in-memory numpy implementation of the same semantics, over hypothesis-
generated sparse matrices."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from casf_spark import CosineAnalyser

# small sparse matrices: up to 5 vectors x 6 coords, values 1..9
matrix_strategy = st.dictionaries(
    keys=st.tuples(st.integers(0, 4), st.integers(0, 5)),
    values=st.integers(1, 9),
    min_size=1, max_size=18,
)


def _ref_similarities(cells: dict, is_sparse: bool):
    """Independent reimplementation of the engine semantics (max-normalize,
    canonical ordering, sparse vs dense norms)."""
    vectors = {}
    for (y, x), v in cells.items():
        vectors.setdefault(f"v{y}", {})[f"c{x}"] = float(v)
    for vec, elems in vectors.items():
        mx = max(elems.values())
        vectors[vec] = {c: v / mx for c, v in elems.items()}
    out = {}
    names = sorted(vectors)
    for i, a in enumerate(names):
        for b in names[:i]:
            v0, v1 = (a, b) if a > b else (b, a)
            ea, eb = vectors[v0], vectors[v1]
            shared = set(ea) & set(eb)
            if is_sparse:
                if not shared:
                    continue
                num = sum(ea[c] * eb[c] for c in shared)
                m0 = math.sqrt(sum(ea[c] ** 2 for c in shared))
                m1 = math.sqrt(sum(eb[c] ** 2 for c in shared))
                out[(v0, v1)] = num / (m0 * m1)
            else:
                num = sum(ea[c] * eb[c] for c in shared)
                m0 = math.sqrt(sum(v * v for v in ea.values()))
                m1 = math.sqrt(sum(v * v for v in eb.values()))
                out[(v0, v1)] = num / (m0 * m1) if shared else 0.0
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cells=matrix_strategy, t=st.sampled_from([0.2, 0.5, 0.8, 0.95]))
def test_threshold_similarity_exact(spark, cells, t):
    """Prefix-filtered threshold search == filtered brute force, over
    generated matrices and thresholds."""
    data = [(f"v{y}", f"c{x}", float(v)) for (y, x), v in cells.items()]
    df = spark.createDataFrame(data, "y string, x string, value double")
    model = CosineAnalyser(axis="y").fit(df, is_sparse=False, persist=False)
    want = {k: v for k, v in _ref_similarities(cells, False).items() if v >= t}
    got = {(r.vector0, r.vector1): r.similarity_value
           for r in model.threshold_similarity(t).collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


@pytest.mark.parametrize("is_sparse", [True, False])
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cells=matrix_strategy)
def test_engine_matches_reference_implementation(spark, is_sparse, cells):
    data = [(f"v{y}", f"c{x}", float(v)) for (y, x), v in cells.items()]
    df = spark.createDataFrame(data, "y string, x string, value double")
    model = CosineAnalyser(axis="y").fit(df, is_sparse=is_sparse, persist=False)
    got = {(r.vector0, r.vector1): r.similarity_value
           for r in model.all_similarity().collect()}
    want = _ref_similarities(cells, is_sparse)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k
        assert -1e-9 <= got[k] <= 1 + 1e-9
