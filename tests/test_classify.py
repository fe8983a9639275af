"""Model-based filtering (operators/classify.py): binary multinomial
Naive Bayes — hand-computed log-likelihood ratios, scoring identities,
vocabulary-cap / OOV behavior, and NULL handling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from casf_spark.operators import classify as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _rhu(x):
    """round-half-up micro-units, the operator's folding rule."""
    return math.floor(x * 1e6 + 0.5)


FIX = [(0, "cat cat dog", "en"), (1, "cat fish", "en"),
       (2, "dog dog bird", "de"), (3, "fish bird bird", "de")]


def test_nb_train_hand_computed(spark):
    """Laplace(+1) log-likelihood ratios over the capped vocabulary:
    pos tokens cat:3 dog:1 fish:1 (T=5), neg dog:2 bird:3 fish:1 (T=6),
    V=4; prior row is ln(2)-ln(2)=0 at term ''."""
    model = C.nb_train(_docs(spark, FIX), "doc_id", "text", "lang", "en",
                       vocab_size=10)
    got = {r.term: r.lr_u for r in model.collect()}

    def lr(cp, cn):
        return _rhu(math.log((cp + 1) / (5 + 4)) - math.log((cn + 1) / (6 + 4)))

    assert got == {"cat": lr(3, 0), "dog": lr(1, 2), "fish": lr(1, 1),
                   "bird": lr(0, 3), C.PRIOR_TERM: 0}
    assert got["cat"] > 0 > got["bird"]


def test_nb_score_integer_sum_and_prediction(spark):
    """score_u = prior_u + sum of per-occurrence lr_u (exact integers);
    pred_pos = score_u >= 0; log_odds = score_u / 1e6 rounded 6dp."""
    docs = _docs(spark, FIX)
    model = C.nb_train(docs, "doc_id", "text", "lang", "en", vocab_size=10)
    m = {r.term: r.lr_u for r in model.collect()}
    got = {r.doc: r for r in C.nb_score(docs, model, "doc_id", "text").collect()}
    assert got["0"].score_u == 2 * m["cat"] + m["dog"]
    assert got["0"].pred_pos and not got["2"].pred_pos
    assert got["3"].score_u == m["fish"] + 2 * m["bird"]
    for r in got.values():
        assert r.log_odds == round(r.score_u / 1e6, 6)
        assert r.pred_pos == (r.score_u >= 0)


def test_nb_vocab_cap_and_oov(spark):
    """vocab_size cuts by (count desc, term asc); tokens outside the
    capped vocabulary are ignored at score time (don't count toward
    n_vocab_tokens or the score)."""
    docs = _docs(spark, [(0, "aa aa aa bb bb zz", "en"),
                         (1, "aa bb cc", "de")])
    model = C.nb_train(docs, "doc_id", "text", "lang", "en", vocab_size=2)
    terms = {r.term for r in model.collect()} - {C.PRIOR_TERM}
    assert terms == {"aa", "bb"}  # counts 4 and 3; cc/zz (1 each) cut
    got = {r.doc: r for r in C.nb_score(docs, model, "doc_id", "text").collect()}
    assert got["0"].n_vocab_tokens == 5  # zz ignored
    assert got["1"].n_vocab_tokens == 2  # cc ignored


def test_nb_null_text_and_unlabeled_rows(spark):
    """NULL-text docs train nothing but count toward the prior and score
    the bare prior; NULL-label rows are excluded from training entirely
    but still scored."""
    docs = _docs(spark, [(0, "cat cat", "en"), (1, None, "en"),
                         (2, "cat dog", "de"), (3, "dog dog", None)])
    train = docs.where(F.col("lang").isNotNull())
    model = C.nb_train(train, "doc_id", "text", "lang", "en", vocab_size=10)
    m = {r.term: r.lr_u for r in model.collect()}
    # training counts: pos cat:2 (doc1 has no tokens), neg cat:1 dog:1;
    # doc3 excluded (NULL label). V=2, T_pos=2, T_neg=2.
    def lr(cp, cn):
        return _rhu(math.log((cp + 1) / (2 + 2)) - math.log((cn + 1) / (2 + 2)))
    assert m["cat"] == lr(2, 1) and m["dog"] == lr(0, 1)
    # prior: 2 pos docs (incl. the NULL-text one) vs 1 neg
    assert m[C.PRIOR_TERM] == _rhu(math.log(2) - math.log(1))
    got = {r.doc: r for r in C.nb_score(docs, model, "doc_id", "text").collect()}
    assert set(got) == {"0", "1", "2", "3"}  # NULL-label doc still scored
    assert got["1"].n_vocab_tokens == 0
    assert got["1"].score_u == m[C.PRIOR_TERM]  # bare prior


def test_nb_split_scoring_is_deterministic(spark):
    """Scoring is repartition-invariant: the integer micro-unit fold
    makes per-doc sums exact, so shuffling the input never changes a
    score (the rrf/pagerank order-independence discipline)."""
    docs = _docs(spark, FIX)
    model = C.nb_train(docs, "doc_id", "text", "lang", "en", vocab_size=10)
    a = {(r.doc, r.score_u)
         for r in C.nb_score(docs, model, "doc_id", "text").collect()}
    b = {(r.doc, r.score_u)
         for r in C.nb_score(docs.repartition(7), model, "doc_id",
                             "text").collect()}
    assert a == b


def test_calibration_report_hand_computed(spark):
    """Bucketing is on the INTEGER score (250k-u bands, top open), acc
    and gap come from rounded values, and ece is the integer-weighted
    mean of the bucket gaps — all checked against a hand computation."""
    import math

    rows = [  # (doc, score_u, pred, y)
        ("a", 100_000, True, 1),    # bucket 0, correct
        ("b", -200_000, False, 1),  # bucket 0, wrong
        ("c", 300_000, True, 1),    # bucket 1, correct
        ("d", 2_000_000, True, 0),  # bucket 4 (open top), wrong
    ]
    df = spark.createDataFrame(
        [(d, s, p, y) for d, s, p, y in rows],
        "doc string, score_u long, pred_pos boolean, y int")
    got = {r.bucket: r for r in C.calibration_report(df).collect()}
    assert set(got) == {0, 1, 4}
    b0, b1, b4 = got[0], got[1], got[4]
    assert (b0.n, b0.acc) == (2, 0.5)
    assert b0.mean_abs_logodds == 0.15
    assert b0.conf == round(1 / (1 + math.exp(-0.15)), 6)
    assert b0.gap == round(abs(b0.acc - b0.conf), 6)
    assert (b1.n, b1.acc) == (1, 1.0)
    assert (b4.n, b4.acc) == (1, 0.0)
    assert b4.mean_abs_logodds == 2.0
    # ece = sum(n_b * floor(gap_b * 1e6 + .5)) / N / 1e6, HALF-UP like
    # both engines' ROUND (python round() is banker's — not comparable
    # at an exact .5 boundary, which this hand case happens to hit)
    su = (2 * math.floor(b0.gap * 1e6 + 0.5)
          + math.floor(b1.gap * 1e6 + 0.5)
          + math.floor(b4.gap * 1e6 + 0.5))
    want_ece = math.floor(su / 4 + 0.5) / 1e6
    assert all(abs(r.ece - want_ece) < 1e-9 for r in got.values())


def test_platt_grid_fit_surface_and_argmin(spark):
    """Exactly one is_best row; it carries the minimum loss; on
    perfectly separated scores the steepest available sigmoid (max a,
    b = 0 by the tie rule's loss ordering) wins because confidence can
    only help when every prediction is right."""
    rows = ([("p%d" % i, 2.0, 1) for i in range(8)]
            + [("n%d" % i, -2.0, 0) for i in range(8)])
    df = spark.createDataFrame(rows, "doc string, log_odds double, y int")
    out = C.platt_grid_fit(df).collect()
    assert len(out) == len(C.PLATT_A_GRID) * len(C.PLATT_B_GRID)
    best = [r for r in out if r.is_best]
    assert len(best) == 1
    assert best[0].loss == min(r.loss for r in out)
    assert best[0].a == max(C.PLATT_A_GRID)
    assert best[0].b == 0.0


def test_platt_grid_fit_prefers_shrinkage_when_overconfident(spark):
    """Scores that are confidently WRONG half the time push the fit
    toward the flattest a in the grid — shrinking toward p = 0.5 beats
    trusting the score."""
    rows = ([("p%d" % i, 2.0, 1) for i in range(4)]
            + [("w%d" % i, 2.0, 0) for i in range(4)])
    df = spark.createDataFrame(rows, "doc string, log_odds double, y int")
    best = [r for r in C.platt_grid_fit(df).collect() if r.is_best][0]
    assert best.a == min(C.PLATT_A_GRID)


def test_nb_multi_hand_case_and_binary_consistency(spark):
    """Multi-class NB: an unambiguous vocabulary classifies perfectly;
    margins positive; every (label, vocab-term) pair materialized
    (zero counts get the label-specific smoothed floor)."""
    from casf_spark.operators.classify import (PRIOR_TERM,
                                               nb_score_multi,
                                               nb_train_multi)

    train = spark.createDataFrame(
        [(1, "aa aa bb", "x"), (2, "aa cc", "x"),
         (3, "dd dd ee", "y"), (4, "dd ff", "y"),
         (5, "gg hh gg", "z"), (6, "gg ii", "z")],
        "doc_id long, text string, lab string")
    model = nb_train_multi(train, "doc_id", "text", "lab",
                           vocab_size=10)
    rows = model.collect()
    terms = [(r.label, r.term) for r in rows if r.term != PRIOR_TERM]
    labels = {r.label for r in rows}
    assert labels == {"x", "y", "z"}
    # full grid: 3 labels x 9 distinct terms
    assert len(terms) == 27 and len(set(terms)) == 27
    priors = {r.label for r in rows if r.term == PRIOR_TERM}
    assert priors == {"x", "y", "z"}

    test = spark.createDataFrame(
        [(10, "aa aa"), (11, "dd"), (12, "gg gg"), (13, "zz zz")],
        "doc_id long, text string")
    got = {r.doc: (r.pred_label, r.margin_u)
           for r in nb_score_multi(test, model, "doc_id",
                                   "text").collect()}
    assert got["10"][0] == "x" and got["11"][0] == "y"
    assert got["12"][0] == "z"
    assert all(m >= 0 for _, m in got.values())
    # OOV-only doc falls back to priors (all equal here) -> label asc
    assert got["13"][0] == "x" and got["13"][1] == 0


def test_nb_cv_folds_equals_per_fold_loop(spark):
    """The fused leave-one-out CV (round-13: two corpus passes) is
    output-IDENTICAL to independently training/scoring each fold with
    nb_train/nb_score — same folds, same vocab cuts, same integer
    micro-unit ratios, same truth coalescing. Also pins n_folds
    validation."""
    import pytest
    from pyspark.sql import functions as F
    from casf_spark.operators.classify import (nb_cv_folds, nb_score,
                                               nb_train)

    rows = []
    texts = {1: "the cat sat on the mat", 0: "le chat dort sur le tapis"}
    for i in range(40):
        y = i % 3 != 0
        rows.append((i, "en" if y else ("fr" if i % 6 else None),
                     texts[int(y)] + f" tok{i % 7}"))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    naive = []
    for fold in range(4):
        train = docs.where(F.col("doc_id") % 4 != fold)
        held = docs.where(F.col("doc_id") % 4 == fold)
        model = nb_train(train, "doc_id", "text", "lang", "en",
                         vocab_size=6)
        scored = nb_score(held, model, "doc_id", "text")
        truth = held.select(
            F.col("doc_id").cast("string").alias("doc"),
            F.coalesce((F.col("lang") == "en").cast("int"),
                       F.lit(0)).alias("y"))
        a = (scored.join(truth, "doc")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum((F.col("pred_pos").cast("int") == F.col("y"))
                        .cast("int")).alias("c"))).collect()[0]
        naive.append((fold, a.n, a.c, round(a.c / a.n, 6)))
    fused = [(r.fold, r.n_heldout, r.n_correct, r.accuracy)
             for r in nb_cv_folds(docs, "doc_id", "text", "lang", "en",
                                  n_folds=4, vocab_size=6).collect()]
    assert fused == naive
    with pytest.raises(ValueError, match="n_folds"):
        nb_cv_folds(docs, "doc_id", "text", "lang", "en", n_folds=1)


def test_nb_cv_folds_covers_unlabeled_and_negative_folds(spark):
    """Two edges the fused spelling must not silently drop: a fold
    whose documents are ALL unlabeled still appears in the output
    (its model trains on every labeled doc — the naive-loop behavior;
    an inner join on a labeled-only prior table would delete the
    fold), and a negative doc id lands in a VALID pmod fold rather
    than minting a spurious fold=-N row."""
    from pyspark.sql import functions as F
    from casf_spark.operators.classify import nb_cv_folds

    rows = []
    for i in range(12):
        # fold 2 (i % 3 == 2) gets NULL labels only
        lab = None if i % 3 == 2 else ("en" if i % 2 else "fr")
        rows.append((i, lab, "the cat sat" if i % 2 else "le chat dort"))
    docs = spark.createDataFrame(rows,
                                 "doc_id long, lang string, text string")
    out = nb_cv_folds(docs, "doc_id", "text", "lang", "en",
                      n_folds=3, vocab_size=8).collect()
    assert [r.fold for r in out] == [0, 1, 2]
    assert sum(r.n_heldout for r in out) == 12  # partition invariant

    neg = docs.withColumn("doc_id", F.col("doc_id") - F.lit(6))
    out2 = nb_cv_folds(neg, "doc_id", "text", "lang", "en",
                       n_folds=3, vocab_size=8).collect()
    assert [r.fold for r in out2] == [0, 1, 2]
    assert sum(r.n_heldout for r in out2) == 12


def test_nb_single_class_training_raises(spark):
    """A training set with only one class has no defined prior: F.log(0)
    used to NULL every downstream score/pred silently — both the naive
    trainer and the fused CV now raise at materialization."""
    import pytest
    from casf_spark.operators.classify import nb_cv_folds, nb_train

    docs = spark.createDataFrame(
        [(i, "en", "the cat sat") for i in range(8)],
        "doc_id long, lang string, text string")
    with pytest.raises(Exception, match="BOTH classes"):
        nb_train(docs, "doc_id", "text", "lang", "en").collect()
    # CV edge: folds 0/1 split an 'all-en' corpus — every fold's
    # training set lacks the negative class
    with pytest.raises(Exception, match="lacks a class"):
        nb_cv_folds(docs, "doc_id", "text", "lang", "en",
                    n_folds=2, vocab_size=4).collect()


def test_platt_saturated_scores_keep_all_docs(spark):
    """log_odds large enough to saturate the sigmoid used to make
    log(0) -> NULL terms that F.sum silently dropped, understating a
    combo's loss; the clamp keeps every doc in every combo's loss."""
    from casf_spark.operators.classify import platt_grid_fit

    scored = spark.createDataFrame(
        [(1, 50.0, 1), (2, -50.0, 0), (3, 50.0, 0), (4, 0.5, 1)],
        "doc long, log_odds double, y int")
    out = platt_grid_fit(scored, "y", a_grid=(0.25, 2.0), b_grid=(0.0,))
    rows = out.collect()
    assert len(rows) == 2
    assert all(r.loss is not None and r.loss > 0 for r in rows)
    # at a=2.0 doc 3's sigmoid saturates to exactly 1.0 in float64
    # (z = 100): pre-fix its log(0) term was NULL and silently dropped
    # from the sum; clamped, it contributes -ln(1e-12) ~ 27.6
    steep = [r for r in rows if r.a == 2.0][0]
    assert steep.loss > 27.0


def test_nb_score_multi_duplicate_ids_margin(spark):
    """Duplicate doc ids used to duplicate every (doc, label) row, so
    the runner-up was a copy of the winner and margin_u was 0."""
    from casf_spark.operators.classify import (nb_score_multi,
                                               nb_train_multi)

    train = spark.createDataFrame(
        [(1, "en", "the cat sat on the mat"),
         (2, "fr", "le chat dort sur le tapis")],
        "doc_id long, lang string, text string")
    model = nb_train_multi(train, "doc_id", "text", "lang", vocab_size=12)
    dup = spark.createDataFrame(
        [(9, "the cat sat"), (9, "the cat sat")],
        "doc_id long, text string")
    out = nb_score_multi(dup, model, "doc_id", "text").collect()
    assert len(out) == 1
    assert out[0].margin_u > 0
