"""power_iteration vs a numpy eigendecomposition reference."""

from __future__ import annotations

import numpy as np
import pytest

from casf_spark.operators.linalg import power_iteration


@pytest.fixture(scope="module")
def mat():
    rng = np.random.RandomState(7)
    # anisotropic cloud: dominant direction along a fixed unit vector
    d = 12
    u = rng.randn(d)
    u /= np.linalg.norm(u)
    x = rng.randn(300, d) * 0.3 + np.outer(rng.randn(300) * 3.0, u)
    return x


def test_power_iteration_matches_numpy_eigvec(spark, mat):
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(mat)],
        "id INT, embedding ARRAY<DOUBLE>")
    got = power_iteration(df, "embedding", n_iter=30)
    rows = sorted(got.collect(), key=lambda r: r["pos"])
    v = np.array([r["loading"] for r in rows])

    g = mat.T @ mat
    w, vec = np.linalg.eigh(g)
    ref = vec[:, -1]
    ref /= np.linalg.norm(ref)
    # same sign convention as the operator
    peak = int(np.argmax(np.abs(ref)))
    if ref[peak] < 0:
        ref = -ref
    assert np.allclose(v, ref, atol=1e-4)


def test_power_iteration_row_shape(spark, mat):
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(mat[:20])],
        "id INT, embedding ARRAY<DOUBLE>")
    got = power_iteration(df, "embedding", n_iter=3)
    assert got.columns == ["pos", "loading"]
    assert got.count() == mat.shape[1]


def test_gram_matrix_tree_reduce_bounded_and_exact(spark, mat):
    """The tree reduce must (a) bound what reaches the driver — the
    combine stage emits at most one row per reducer, and gram_matrix
    raises if more than fan_in partials arrive — and (b) change nothing
    numerically: a 40-partition input reduced through fan_in=4 equals
    the numpy Gram exactly (float64 sums commute across the tree within
    1e-9 here)."""
    from casf_spark.operators.linalg import gram_matrix

    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(mat)],
        "id INT, embedding ARRAY<DOUBLE>").repartition(40)
    g = gram_matrix(df, "embedding", fan_in=4)
    assert np.allclose(g, mat.T @ mat, atol=1e-9)


def test_power_iteration_report_contract(spark, mat):
    """The oracle-facing contract row: n_rows from the data, every
    invariant true on a healthy corpus."""
    from casf_spark.operators.linalg import power_iteration_report

    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(mat)],
        "id INT, embedding ARRAY<DOUBLE>")
    row = power_iteration_report(df, "embedding", n_iter=8, dim=12).first()
    assert row.metric == "power_iter_top1"
    assert row.dim == 12 and row.n_rows == mat.shape[0]
    assert row.unit_norm and row.lambda_ge_mean and row.resid_bounded


@pytest.fixture(scope="module")
def mat2():
    rng = np.random.RandomState(11)
    # TWO strong planted directions with a clear spectral gap so 30
    # deflated iterations converge tight against eigh
    d = 12
    q, _ = np.linalg.qr(rng.randn(d, 2))
    u1, u2 = q[:, 0], q[:, 1]
    x = (rng.randn(400, d) * 0.2
         + np.outer(rng.randn(400) * 4.0, u1)
         + np.outer(rng.randn(400) * 2.0, u2))
    return x


def test_pca_top2_contract_and_eigh(spark, mat2):
    """Contract rows all-true on a healthy corpus, and the deflated
    second direction matches numpy eigh's second eigenvector."""
    import math

    from casf_spark.operators.linalg import gram_matrix, pca_top2_report

    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(mat2)],
        "id INT, embedding ARRAY<DOUBLE>")
    rows = sorted(pca_top2_report(df, "embedding", n_iter=30, dim=12,
                                  resid_tol=0.05).collect(),
                  key=lambda r: r.component)
    assert [r.component for r in rows] == [1, 2]
    for r in rows:
        assert r.metric == "pca_top2"
        assert r.dim == 12 and r.n_rows == mat2.shape[0]
        assert (r.unit_norm and r.orthogonal_to_v1
                and r.lambda_ordered and r.resid_bounded)

    # replicate the deflated iteration to extract v2 and compare to eigh
    g = gram_matrix(df, "embedding", dim=12)
    d = 12

    def dom(m, ortho=None):
        v = np.full(d, 1.0 / math.sqrt(d))
        if ortho is not None:
            v = v - (ortho @ v) * ortho
            v /= np.linalg.norm(v)
        for _ in range(30):
            w = m @ v
            if ortho is not None:
                w = w - (ortho @ w) * ortho
            v = w / np.linalg.norm(w)
        peak = int(np.argmax(np.abs(v)))
        return -v if v[peak] < 0 else v

    v1 = dom(g)
    lam1 = float(v1 @ g @ v1)
    v2 = dom(g - lam1 * np.outer(v1, v1), ortho=v1)

    w, vec = np.linalg.eigh(g)
    ref = vec[:, -2] / np.linalg.norm(vec[:, -2])
    peak = int(np.argmax(np.abs(ref)))
    if ref[peak] < 0:
        ref = -ref
    assert np.allclose(v2, ref, atol=1e-3)
    assert abs(float(v1 @ v2)) < 1e-9


def test_jl_sign_matrix_deterministic_and_balanced():
    from casf_spark.operators.linalg import jl_sign_matrix

    m1 = jl_sign_matrix(64, 8, seed=7)
    m2 = jl_sign_matrix(64, 8, seed=7)
    assert m1 == m2
    assert all(v in (-1, 1) for row in m1 for v in row)
    # roughly balanced signs (md5 bytes are uniform): no column all-same
    cols = list(zip(*m1))
    assert all(8 <= sum(1 for v in c if v == 1) <= 56 for c in cols)
    assert jl_sign_matrix(64, 8, seed=8) != m1


def test_random_projection_preserves_distances(spark):
    """JL lemma property: pairwise squared distances of the projected
    vectors are within a loose (1 ± 0.8) band of the originals for a
    deterministic 64-dim sample — sign projections concentrate, and a
    violated band would mean the projection arithmetic is wrong (wrong
    normalization, dropped dims), not bad luck."""
    import itertools
    import math
    import random

    from casf_spark.operators.linalg import random_projection

    rng = random.Random(3)
    vecs = {i: [rng.gauss(0, 1) for _ in range(64)] for i in range(12)}
    df = spark.createDataFrame([(i, v) for i, v in vecs.items()],
                               "vec_id long, embedding array<double>")
    got = {r.vec_id: list(r.proj)
           for r in random_projection(df, in_dim=64, out_dim=16,
                                      seed=7).collect()}
    assert all(len(p) == 16 for p in got.values())
    ratios = []
    for a, b in itertools.combinations(vecs, 2):
        d_orig = sum((x - y) ** 2 for x, y in zip(vecs[a], vecs[b]))
        d_proj = sum((x - y) ** 2 for x, y in zip(got[a], got[b]))
        ratios.append(d_proj / d_orig)
    assert all(0.2 <= r <= 1.8 for r in ratios), \
        (min(ratios), max(ratios))
    # mean ratio near 1 (unbiasedness of the Rademacher projection)
    mean = sum(ratios) / len(ratios)
    assert 0.7 <= mean <= 1.3, mean
