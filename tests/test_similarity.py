from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from casf_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def emb(spark):
    data = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.98, 0.02, 0.0]),
        (4, [0.5, 0.5, 0.5, 0.5]),
    ]
    return spark.createDataFrame(data, "vec_id long, embedding array<float>")


def test_brute_force_topk_nearest_first(spark, emb):
    q = emb.where("vec_id = 0")
    res = SIM.brute_force_topk(emb, q, k=2).orderBy("rank").collect()
    assert [r.neighbor_id for r in res] == [1, 4]
    assert res[0].cos_sim > 0.99
    assert all(r.query_id == 0 for r in res)


def test_brute_force_topk_excludes_self(spark, emb):
    res = SIM.brute_force_topk(emb, emb, k=4).collect()
    assert all(r.query_id != r.neighbor_id for r in res)


def test_lsh_buckets_identical_vectors(spark):
    data = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(3)] + \
           [(10, [-1.0, -2.0, -3.0, -4.0])]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    cand = {(r.id0, r.id1): r.cos_sim
            for r in SIM.lsh_candidates(df, num_planes=4).collect()}
    assert cand[(1, 0)] == 1.0 and cand[(2, 0)] == 1.0 and cand[(2, 1)] == 1.0
    # the negated vector lands in the opposite bucket for every plane
    assert not any(10 in p for p in cand)


def test_lsh_topk_rank_contract(spark, emb):
    res = SIM.lsh_topk(emb, k=3, num_planes=2).collect()
    for r in res:
        assert 1 <= r.rank <= 3


def test_lsh_multiprobe_supersets_single_table(spark, emb):
    from casf_spark.operators.similarity import (lsh_candidates,
                                                 lsh_candidates_multiprobe)

    single = {(r.id0, r.id1) for r in lsh_candidates(emb, seed=42).collect()}
    multi = {(r.id0, r.id1) for r in
             lsh_candidates_multiprobe(emb, seeds=(42, 43, 44)).collect()}
    assert single <= multi  # each extra table only adds candidates
    # dedup across tables: pair keys are unique
    rows = lsh_candidates_multiprobe(emb, seeds=(42, 43)).collect()
    assert len(rows) == len({(r.id0, r.id1) for r in rows})
