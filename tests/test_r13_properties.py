"""Round-13 operator property tests: the semantic invariants the
oracle twins can't state — sketch merge algebra and error bounds,
quantile-matching monotonicity/balance, JSD range endpoints,
Good-Turing conservation, facility-location redundancy behavior, and
CV partition conservation. Cross-engine value equality is pinned by
the six round-13 oracle twins; these pin the MATH."""

import math

from pyspark.sql import functions as F

from casf_spark.operators.curation import quantile_match
from casf_spark.operators.profile import vocab_jsd, vocab_richness
from casf_spark.operators.similarity import facility_location_select
from casf_spark.operators.sketches import (hist_sketch_build,
                                           hist_sketch_merge,
                                           hist_sketch_quantiles)


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "v double")


def test_hist_sketch_merge_is_associative_and_commutative(spark):
    """Counter-sum algebra: any 3-way split, merged in any grouping,
    equals the whole-corpus build cell-for-cell."""
    xs = [((i * 37) % 100) + 0.25 for i in range(300)]
    whole = {(r.bin, r.cnt) for r in
             hist_sketch_build(_vals(spark, xs), "v",
                               0.0, 100.0, 20).collect()}
    parts = [hist_sketch_build(_vals(spark, xs[i::3]), "v",
                               0.0, 100.0, 20) for i in range(3)]
    left = hist_sketch_merge(
        hist_sketch_merge(parts[0].unionByName(parts[1]))
        .unionByName(parts[2]))
    right = hist_sketch_merge(
        parts[2].unionByName(
            hist_sketch_merge(parts[1].unionByName(parts[0]))))
    assert {(r.bin, r.cnt) for r in left.collect()} == whole
    assert {(r.bin, r.cnt) for r in right.collect()} == whole


def test_hist_sketch_estimate_error_bounded_by_bin_width(spark):
    """Nearest-rank estimates off the binned CDF sit in
    (true_quantile, true_quantile + bin_width] for a skewed
    (non-uniform) distribution — the documented one-bin bias."""
    xs = sorted((i ** 2) % 997 for i in range(500))  # skewed values
    lo, hi, bins = 0.0, 1000.0, 100
    width = (hi - lo) / bins
    sk = hist_sketch_build(_vals(spark, xs), "v", lo, hi, bins)
    qs = [0.1, 0.5, 0.9, 0.99]
    est = {r.q: r.est for r in
           hist_sketch_quantiles(sk, qs, lo, hi, bins).collect()}
    for q in qs:
        true = xs[math.ceil(q * len(xs)) - 1]  # nearest-rank
        assert true < est[q] <= true + width, (q, true, est[q])
    # monotone in q
    got = [est[q] for q in qs]
    assert got == sorted(got)


def test_quantile_match_monotone_and_balanced(spark):
    """Within a group, score_matched is monotone in score; tiles are
    exact NTILE partitions (sizes differ by at most 1); every matched
    value is one of the k rounded reference midpoints."""
    df = spark.createDataFrame(
        [(i, "g" + str(i % 2), float((i * 13) % 40)) for i in range(37)],
        "doc long, src string, score double")
    ref = spark.createDataFrame([(i, float(i) / 3.0) for i in range(90)],
                                "doc long, score double")
    out = quantile_match(df, ref, "src", "doc", "score", k=4).collect()
    ref_vals = {r.score_matched for r in out}
    assert len(ref_vals) <= 4
    for g in ("g0", "g1"):
        rows = sorted([r for r in out if r.src == g],
                      key=lambda r: (r.score, r.doc))
        matched = [r.score_matched for r in rows]
        assert matched == sorted(matched)  # monotone
        sizes = {}
        for r in rows:
            sizes[r.tile] = sizes.get(r.tile, 0) + 1
        assert max(sizes.values()) - min(sizes.values()) <= 1


def test_vocab_jsd_range_endpoints(spark):
    """Disjoint vocabularies hit the JSD maximum EXACTLY (ln 2, both
    sides); identical distributions hit 0 (pinned in test_profile);
    a partial overlap lands strictly inside (0, ln 2)."""
    df = spark.createDataFrame(
        [(1, "a", "aa bb cc"), (2, "b", "xx yy zz")],
        "doc_id long, source string, text string")
    got = {r.grp: r.jsd for r in
           vocab_jsd(df, "source", "doc_id", "text").collect()}
    ln2 = round(math.log(2.0), 6)
    assert got == {"a": ln2, "b": ln2}
    mix = spark.createDataFrame(
        [(1, "a", "aa bb shared"), (2, "b", "xx yy shared")],
        "doc_id long, source string, text string")
    got2 = {r.grp: r.jsd for r in
            vocab_jsd(mix, "source", "doc_id", "text").collect()}
    assert all(0.0 < v < ln2 for v in got2.values()), got2


def test_vocab_richness_conserves_tokens_and_hapax_extremes(spark):
    """Per-group token counts partition the corpus total; an all-hapax
    group has gt_unseen exactly 1 and chao1 = V + V(V-1)/2 (no
    doubletons); a saturated group (every word repeated) has
    gt_unseen 0 and chao1 = V."""
    df = spark.createDataFrame(
        [(1, "a", "q w e r t y"),              # 6 hapaxes
         (2, "b", "m m n n o o")],             # all counts = 2
        "doc_id long, source string, text string")
    got = {r.grp: r for r in
           vocab_richness(df, "source", "doc_id", "text").collect()}
    assert got["a"].n_tokens + got["b"].n_tokens == 12
    a, b = got["a"], got["b"]
    assert (a.gt_unseen, a.n1, a.chao1) == (1.0, 6, 6 + 6 * 5 / 2)
    assert (b.gt_unseen, b.n1, b.n2, b.chao1) == (0.0, 0, 3, 3.0)


def test_facility_location_duplicate_candidate_adds_zero_gain(spark):
    """Submodular redundancy: when every corpus vector is identical,
    the first pick covers everything and every later pick's marginal
    gain is exactly 0 — coverage stays flat."""
    emb = spark.createDataFrame(
        [(i, [1.0, 2.0, 2.0]) for i in range(9)],
        "vec_id long, embedding array<double>")
    got = facility_location_select(emb, k=3, n_candidates=4) \
        .orderBy("sel_rank").collect()
    assert got[0].gain == 9.0            # 9 docs x cos 1.0
    assert [r.gain for r in got[1:]] == [0.0, 0.0]
    assert [r.coverage for r in got] == [9.0, 9.0, 9.0]


def test_nb_cv_folds_partitions_the_corpus(spark):
    """Fold held-out counts partition the corpus exactly: every doc is
    scored once, NULL-label docs included (they count as negatives in
    truth but never in training)."""
    from casf_spark.operators.classify import nb_cv_folds

    rows = [(i, None if i % 5 == 2 else ("en" if i % 2 else "fr"),
             "w%d the cat" % (i % 3)) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = nb_cv_folds(docs, "doc_id", "text", "lang", "en",
                      n_folds=3, vocab_size=4).collect()
    assert sum(r.n_heldout for r in out) == 50
    assert sorted(r.fold for r in out) == [0, 1, 2]
    assert all(0 <= r.n_correct <= r.n_heldout for r in out)
