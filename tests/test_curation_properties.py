"""Property-based differential tests for the round-3 curation/relevance
operators vs naive Python implementations of the same definitions."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from casf_spark.operators import curation as CU
from casf_spark.operators import relevance as RV

tok_counts = st.lists(st.integers(min_value=1, max_value=200),
                      min_size=1, max_size=40)
strata = st.lists(st.sampled_from(["a", "b", "c"]),
                  min_size=1, max_size=40)


def _frac(key: int) -> float:
    h = int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)
    return (h >> 30) / float(1 << 30)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(toks=tok_counts, ss=strata, budget=st.integers(50, 500))
def test_budget_select_never_exceeds_budget_and_is_prefix(spark, toks, ss,
                                                          budget):
    n = min(len(toks), len(ss))
    rows = [(i, ss[i], toks[i]) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")
    got = CU.budget_select(df, "doc_id", "n_tok", "lang", budget,
                           n_chunks=4).collect()
    by_stratum: dict[str, list] = {}
    for r in got:
        by_stratum.setdefault(r["stratum"], []).append(r)
    for s, kept in by_stratum.items():
        # budget respected (inclusive-cumsum truncation semantics)
        assert sum(r["n_tok"] for r in kept) <= budget
        # kept set is exactly the maximal priority-ordered prefix
        all_s = sorted(((_frac(doc), doc, t) for doc, st_, t in rows
                        if st_ == s))
        acc, want = 0, set()
        for p, doc, t in all_s:
            acc += t
            if acc > budget:
                break
            want.add(doc)
        assert {r["doc"] for r in kept} == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(toks=tok_counts, budget=st.integers(20, 400),
       chunk=st.sampled_from([3, 7, 16]))
def test_pack_sequences_bins_are_contiguous_and_ordered(spark, toks, budget,
                                                        chunk):
    rows = [(i, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {r["doc"]: r["bin"] for r in CU.pack_sequences(
        df, "doc_id", "n_tokens", budget=budget, chunk=chunk).collect()}
    # equals the serial prefix-sum definition regardless of chunking
    cum = 0
    for i, t in rows:
        assert got[i] == cum // budget
        cum += t
    # bins are monotone in doc order (never decrease)
    bins = [got[i] for i, _ in rows]
    assert bins == sorted(bins)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ss=strata, total=st.integers(1, 60))
def test_mixture_resample_subset_and_rate_cap(spark, ss, total):
    rows = [(i, ss[i]) for i in range(len(ss))]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    shares = {"a": 0.7, "b": 0.3}
    got = {r["doc_id"] for r in CU.mixture_resample(
        df, F.col("doc_id").cast("string"), "source", shares,
        total_rows=total).collect()}
    counts: dict[str, int] = {}
    for _, s in rows:
        counts[s] = counts.get(s, 0) + 1
    for doc, s in rows:
        rate = min(1.0, shares.get(s, 0.0) * total / counts[s])
        assert (doc in got) == (_frac(doc) < rate)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(st.lists(st.sampled_from(["u", "v", "w", "xx", "yy"]),
                              min_size=1, max_size=10),
                     min_size=2, max_size=5))
def test_tfidf_matches_naive(spark, docs):
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc"], r["term"]): r["tfidf"]
           for r in RV.tfidf_terms(df, "doc_id", "text", top_k=100).collect()}
    n = len(docs)
    dfreq: dict[str, int] = {}
    for ws in docs:
        for w in set(ws):
            dfreq[w] = dfreq.get(w, 0) + 1
    for i, ws in enumerate(docs):
        for w in set(ws):
            tf = ws.count(w)
            want = round(tf * (math.log((n + 1) / (dfreq[w] + 1)) + 1), 6)
            assert got[(i, w)] == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg"]),
             min_size=0, max_size=30),
    min_size=1, max_size=10),
    divisor=st.sampled_from([2, 4, 8]))
def test_content_defined_chunks_matches_naive(spark, docs, divisor):
    """content_defined_chunks == a naive Python CDC over the same md5
    boundary rule, cell-exact (ids, chunk order, counts, text)."""
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in CU.content_defined_chunks(
            df, "doc_id", "text", divisor=divisor).collect())

    def boundary(tok: str) -> bool:
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) \
            % divisor == 0

    want = []
    for i, ws in enumerate(docs):
        if not ws:
            continue
        chunk, cid = [], 0
        for j, w in enumerate(ws):
            chunk.append(w)
            if boundary(w) or j == len(ws) - 1:
                want.append((i, cid, len(chunk), " ".join(chunk)))
                chunk, cid = [], cid + 1
    assert got == sorted(want)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
             min_size=0, max_size=25),
    min_size=1, max_size=8),
    window=st.sampled_from([2, 3]))
def test_content_defined_chunks_windowed_matches_naive(spark, docs, window):
    """window>1 hashes the k-gram ending at each token; same contract."""
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in CU.content_defined_chunks(
            df, "doc_id", "text", divisor=4, window=window).collect())

    def boundary(ws, j):
        gram = " ".join(ws[max(0, j - window + 1):j + 1])
        return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % 4 == 0

    want = []
    for i, ws in enumerate(docs):
        if not ws:
            continue
        chunk, cid = [], 0
        for j, w in enumerate(ws):
            chunk.append(w)
            if boundary(ws, j) or j == len(ws) - 1:
                want.append((i, cid, len(chunk), " ".join(chunk)))
                chunk, cid = [], cid + 1
    assert got == sorted(want)
