"""Property-based tests for the round-9 operators (URL normalization,
maximal spans, batched k-center, hard negatives) vs naive Python
implementations of the same definitions."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

slow_ok = settings(max_examples=12, deadline=None,
                   suppress_health_check=[HealthCheck.function_scoped_fixture,
                                          HealthCheck.data_too_large])

# ---------------------------------------------------------------- urls

url_strategy = st.builds(
    lambda scheme, up_s, www, host, up_h, port, segs, slash, params, frag:
    (scheme.upper() if up_s else scheme) + "://"
    + ("www." if www else "")
    + (host.upper() if up_h else host)
    + port
    + "".join("/" + s for s in segs) + ("/" if slash and segs else "")
    + ("?" + "&".join(params) if params else "")
    + ("#f" if frag else ""),
    scheme=st.sampled_from(["http", "https"]),
    up_s=st.booleans(),
    www=st.booleans(),
    host=st.sampled_from(["ex.com", "a.b.co.uk", "x.org", "d.e.net"]),
    up_h=st.booleans(),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    segs=st.lists(st.sampled_from(["a", "b2", "c"]), max_size=3),
    slash=st.booleans(),
    params=st.lists(st.sampled_from(
        ["id=1", "z=9", "utm_source=x", "gclid=g", "a=2"]),
        max_size=4, unique=True),
    frag=st.booleans())


@slow_ok
@given(st.lists(url_strategy, min_size=1, max_size=20))
def test_normalize_url_idempotent_and_naive(spark, urls):
    """normalize(normalize(u)) == normalize(u), and the result matches a
    naive Python replay of the documented rules."""
    from casf_spark.operators.urls import normalize_url
    import re

    def naive(u):
        u = re.sub(r"#.*$", "", u)
        m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(/[^?#]*)?"
                     r"(?:\?([^#]*))?", u)
        scheme, auth, path, q = (m.group(1).lower(), m.group(2).lower(),
                                 m.group(3) or "", m.group(4) or "")
        if scheme == "http" and auth.endswith(":80"):
            auth = auth[:-3]
        if scheme == "https" and auth.endswith(":443"):
            auth = auth[:-4]
        host = re.sub(r"^www\.", "", auth)
        path = re.sub(r"/+$", "", path) or "/"
        keep = sorted(p for p in q.split("&")
                      if p and not re.match(
                          r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)=",
                          p))
        return (scheme + "://" + host + path
                + ("?" + "&".join(keep) if keep else ""))

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = [r.n for r in
            df.select(normalize_url(F.col("url")).alias("n")).collect()]
    assert once == [naive(u) for u in urls]
    df2 = spark.createDataFrame([(u,) for u in once], "url string")
    twice = [r.n for r in
             df2.select(normalize_url(F.col("url")).alias("n")).collect()]
    assert twice == once


@slow_ok
@given(st.lists(st.sampled_from(["ex.com", "a.b.ex.com", "ex.co.uk",
                                 "w.ex.com.au", "solo", "a.b.c.d.org"]),
                min_size=1, max_size=10))
def test_registered_domain_is_host_suffix(spark, hosts):
    from casf_spark.operators.urls import (MULTI_PART_SUFFIXES,
                                           registered_domain)

    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = [r.d for r in
           df.select(F.col("host"),
                     registered_domain(F.col("host")).alias("d")).collect()]
    for h, d in zip(hosts, got):
        assert h == d or h.endswith("." + d)
        labs = d.split(".")
        assert len(labs) <= 3
        if len(labs) == 3:
            assert ".".join(labs[1:]) in MULTI_PART_SUFFIXES

# ------------------------------------------------------- maximal spans

docs_strategy = st.lists(
    st.lists(st.sampled_from(list("abcdefg")), min_size=0, max_size=14)
    .map(lambda ws: " ".join(ws)),
    min_size=2, max_size=8)


@slow_ok
@given(docs_strategy)
def test_maximal_spans_match_naive_interval_merge(spark, texts):
    """Spans == naive union-of-intervals over cross-duplicated n-gram
    starts, per doc."""
    from casf_spark.operators.dedup import maximal_duplicated_spans

    n = 3
    toks = {i: t.split() if t else [] for i, t in enumerate(texts)}
    grams = {i: [" ".join(ts[j:j + n]) for j in range(len(ts) - n + 1)]
             for i, ts in toks.items()}
    docs_of = {}
    for i, gs in grams.items():
        for g in set(gs):
            docs_of.setdefault(g, set()).add(i)
    expect = {}
    for i, gs in grams.items():
        starts = sorted(j for j, g in enumerate(gs)
                        if len(docs_of[g]) >= 2)
        spans = []
        prev = None
        for p in starts:
            if prev is not None and p - prev <= n:
                spans[-1][1] = p + n - 1
            else:
                spans.append([p, p + n - 1])
            prev = p
        if spans:
            expect[i] = [(s, e) for s, e in spans]

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {}
    for r in maximal_duplicated_spans(df, "doc_id", "text", n=n).collect():
        got.setdefault(r.doc, []).append((r.span_start, r.span_end))
        assert r.span_text == " ".join(
            toks[r.doc][r.span_start:r.span_end + 1])
    got = {k: sorted(v) for k, v in got.items()}
    assert got == expect

# ------------------------------------------------ batched k-center

vecs_strategy = st.lists(
    st.tuples(st.integers(0, 60),
              st.tuples(st.integers(-3, 3), st.integers(-3, 3),
                        st.integers(-3, 3))),
    min_size=2, max_size=16, unique_by=lambda t: t[0])


@slow_ok
@given(vecs_strategy, st.integers(2, 6))
def test_kcenter_batched_equals_sequential_random(spark, rows, buf):
    from casf_spark.operators.similarity import (kcenter_select,
                                                 kcenter_select_batched)

    data = [(i, [float(a), float(b), float(c)]) for i, (a, b, c) in rows]
    df = spark.createDataFrame(data,
                               "vec_id long, embedding array<double>")
    k = min(6, len(data))
    want = [(r.sel_rank, r.vec_id, r.sel_dist)
            for r in kcenter_select(df, k=k).orderBy("sel_rank").collect()]
    got = [(r.sel_rank, r.vec_id, r.sel_dist)
           for r in kcenter_select_batched(df, k=k, buffer=buf)
           .orderBy("sel_rank").collect()]
    assert got == want

# ------------------------------------------------ hard negatives

labvec_strategy = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 2),
              st.tuples(st.integers(-3, 3), st.integers(-3, 3))),
    min_size=3, max_size=12, unique_by=lambda t: t[0])


@slow_ok
@given(labvec_strategy)
def test_hard_negatives_invariants(spark, rows):
    """Every mined negative has a different label than its anchor; ranks
    are contiguous from 1; cos_sim is non-increasing in rank; semi_hard
    implies the (pos - margin, pos) band."""
    from casf_spark.operators.relevance import hard_negative_mine

    data = [(i, [float(a), float(b)], l) for i, l, (a, b) in rows]
    df = spark.createDataFrame(
        data, "vec_id long, embedding array<double>, label int")
    got = hard_negative_mine(df, df, k_pool=6, k_neg=4,
                             margin=0.1).collect()
    by_anchor = {}
    for r in got:
        assert r.anchor_label != r.negative_label
        if r.semi_hard:
            assert r.best_pos_sim is not None
            assert (round(r.best_pos_sim - 0.1, 6)
                    < r.cos_sim < r.best_pos_sim)
        by_anchor.setdefault(r.anchor_id, []).append(
            (r.neg_rank, r.cos_sim))
    for a, lst in by_anchor.items():
        lst.sort()
        assert [t[0] for t in lst] == list(range(1, len(lst) + 1))
        sims = [t[1] for t in lst]
        assert sims == sorted(sims, reverse=True)
