"""Property-based differential tests for dedup operators vs naive Python
implementations of the same definitions."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from casf_spark.functions.hashing import MIX_PRIME, _lcg_params
from casf_spark.operators import dedup as DD

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
    min_size=2, max_size=6,
)


def _naive_shingles(tokens: list[str], n: int) -> set[str]:
    return {" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)}


def _naive_jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 0.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _naive_minhash(shingles: set[str], num_hashes: int, seed: int = 42):
    params = _lcg_params(num_hashes, seed)
    hs = [_h60(s) % MIX_PRIME for s in shingles]
    return [min((a * h + b) % MIX_PRIME for h in hs) for a, b in params]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=docs_strategy)
def test_jaccard_matches_naive(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc0, r.doc1): r.jaccard
           for r in DD.ngram_jaccard_pairs(df, "doc_id", "text",
                                           n=2, threshold=0.0).collect()}
    sh = {i: _naive_shingles(toks, 2) for i, toks in enumerate(docs)}
    for i in range(len(docs)):
        for j in range(i):
            inter = sh[i] & sh[j]
            if not inter:
                assert (i, j) not in got
                continue
            want = _naive_jaccard(sh[i], sh[j])
            assert got[(i, j)] == pytest.approx(round(want, 6), abs=2e-6), (i, j)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=docs_strategy)
def test_minhash_signatures_match_naive(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r.doc: [r[f"mh_{k}"] for k in range(12)]
           for r in DD.minhash_signatures(df, "doc_id", "text",
                                          n=2, num_hashes=12).collect()}
    for i, toks in enumerate(docs):
        sh = _naive_shingles(toks, 2)
        if not sh:
            assert i not in sig
            continue
        assert sig[i] == _naive_minhash(sh, 12), i


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=docs_strategy)
def test_simhash_identical_docs_equal_signatures(spark, docs):
    # duplicate every doc; identical token multisets must hash identically
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    rows += [(100 + i, t) for i, (_, t) in enumerate(rows)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r.doc: r.simhash
           for r in DD.simhash_signatures(df, "doc_id", "text").collect()}
    for i, toks in enumerate(docs):
        if toks:
            assert sig[i] == sig[100 + i]


edges_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30),
              st.integers(min_value=0, max_value=30)).filter(
                  lambda p: p[0] != p[1]),
    min_size=1, max_size=40,
)


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edges_strategy)
def test_connected_components_matches_union_find(spark, raw_edges):
    """Distributed pointer-jumping label propagation == classic union-find
    on arbitrary random graphs (cycles, self-merging chains, duplicates)."""
    pairs = spark.createDataFrame(
        [(max(a, b), min(a, b)) for a, b in raw_edges],
        "doc0 long, doc1 long")
    want = _union_find_components(raw_edges)
    # both strategies: single-task union-find (default for small graphs)
    # and the distributed label-propagation loop (forced via threshold 0)
    got_uf = {r.doc_id: r.cluster_id
              for r in DD.connected_components(pairs).collect()}
    got_lp = {r.doc_id: r.cluster_id
              for r in DD.connected_components(
                  pairs, small_graph_edges=0).collect()}
    assert got_uf == want
    assert got_lp == want
