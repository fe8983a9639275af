from __future__ import annotations

import datetime as dt

from casf_spark.operators.joins import asof_join


def _t(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


def _fixtures(spark):
    left = spark.createDataFrame(
        [(1, 1, _t(10)), (2, 1, _t(20)), (3, 2, _t(5)), (4, 3, _t(9))],
        "pid long, user long, ts timestamp")
    right = spark.createDataFrame(
        [(100, 1, _t(8)), (101, 1, _t(10)), (102, 1, _t(15)), (103, 2, _t(7))],
        "cid long, user long, ts timestamp")
    return left, right


def test_asof_backward(spark):
    left, right = _fixtures(spark)
    got = {r.pid: r.r_cid
           for r in asof_join(left, right, ["user"]).collect()}
    # pid=1: cid 101 shares ts (<= is inclusive); pid=2: most recent is 102;
    # pid=3: only click for user 2 is later -> null; pid=4: no user-3 rows
    assert got == {1: 101, 2: 102, 3: None, 4: None}


def test_asof_forward(spark):
    left, right = _fixtures(spark)
    got = {r.pid: r.r_cid
           for r in asof_join(left, right, ["user"],
                              direction="forward").collect()}
    assert got == {1: 101, 2: None, 3: 103, 4: None}


def test_asof_tie_breaks_to_max_payload(spark):
    left = spark.createDataFrame([(1, 1, _t(10))],
                                 "pid long, user long, ts timestamp")
    right = spark.createDataFrame(
        [(7, 1, _t(4)), (9, 1, _t(4)), (8, 1, _t(4))],
        "cid long, user long, ts timestamp")
    row = asof_join(left, right, ["user"]).collect()[0]
    assert row.r_cid == 9  # equal ts -> deterministic max-payload winner


def test_asof_preserves_all_left_columns(spark):
    left, right = _fixtures(spark)
    out = asof_join(left, right, ["user"], right_prefix="click_")
    assert out.columns == ["pid", "user", "ts", "click_cid", "click_ts"]
    assert out.count() == left.count()  # left-join semantics


def test_interval_join_containment_and_overlap(spark):
    points = spark.createDataFrame(
        [(1, 1, _t(100)), (2, 1, _t(500)), (3, 2, _t(100)), (4, 1, _t(7300))],
        "eid long, user long, ts timestamp")
    iv = spark.createDataFrame(
        [(10, 1, _t(50), _t(150)),     # contains eid 1
         (11, 1, _t(90), _t(600)),     # contains eids 1 and 2 (overlapping)
         (12, 2, _t(200), _t(300)),    # user 2, contains nothing
         (13, 1, _t(7000), _t(8000))], # crosses a 3600s bucket boundary
        "iid long, user long, s timestamp, e timestamp")
    from casf_spark.operators.joins import interval_join
    got = {(r.eid, r.iid)
           for r in interval_join(points, iv, ["user"], "ts", "s", "e",
                                  bucket_seconds=3600).collect()}
    assert got == {(1, 10), (1, 11), (2, 11), (4, 13)}


def test_asof_matches_naive_reference(spark):
    """Randomized check: asof_join output equals the brute-force
    'max right_ts <= left_ts per key' reference on ~200 rows with
    clustered keys/timestamps (forces ties and empty groups)."""
    import random

    rng = random.Random(42)
    left_rows = [(i, rng.randint(1, 8), _t(rng.randint(0, 50)))
                 for i in range(120)]
    right_rows = [(1000 + i, rng.randint(1, 10), _t(rng.randint(0, 50)))
                  for i in range(80)]
    left = spark.createDataFrame(left_rows, "lid long, k long, ts timestamp")
    right = spark.createDataFrame(right_rows, "rid long, k long, ts timestamp")
    got = {r.lid: r.r_rid
           for r in asof_join(left, right, ["k"]).collect()}

    def naive(lid, k, ts):
        cand = [(r_ts, rid) for rid, rk, r_ts in right_rows
                if rk == k and r_ts <= ts]
        if not cand:
            return None
        # engine tie-break: max (ts, payload) -> payload = (rid, ts)
        best_ts = max(c[0] for c in cand)
        return max(rid for r_ts, rid in cand if r_ts == best_ts)

    want = {lid: naive(lid, k, ts) for lid, k, ts in left_rows}
    assert got == want


def test_interval_join_matches_naive_reference(spark):
    """Randomized check vs brute-force containment, with intervals both
    shorter and longer than the bucket width (explode-factor edge cases),
    empty intervals filtered by start<=end, and cross-key isolation."""
    import random

    rng = random.Random(7)
    pts = [(i, rng.randint(1, 5), _t(rng.randint(0, 20000)))
           for i in range(150)]
    ivs = []
    for i in range(60):
        s = rng.randint(0, 20000)
        ivs.append((500 + i, rng.randint(1, 6), _t(s),
                    _t(s + rng.randint(0, 9000))))
    points = spark.createDataFrame(pts, "pid long, k long, ts timestamp")
    intervals = spark.createDataFrame(
        ivs, "iid long, k long, s timestamp, e timestamp")
    from casf_spark.operators.joins import interval_join
    got = {(r.pid, r.iid)
           for r in interval_join(points, intervals, ["k"], "ts", "s", "e",
                                  bucket_seconds=3600).collect()}
    want = {(pid, iid)
            for pid, pk, ts in pts
            for iid, ik, s, e in ivs
            if pk == ik and s <= ts <= e}
    assert got == want and len(want) > 0


def test_cdc_snapshot_latest_wins_and_deletes(spark):
    """Hand-built changelog: upsert then newer upsert wins; key whose
    newest change is a delete disappears; delete resurrected by a newer
    upsert survives."""
    from casf_spark.operators.cdc import cdc_snapshot

    log = spark.createDataFrame(
        [(1, 1, "u", 10.0),   # overwritten by v2
         (1, 2, "u", 11.0),   # current for key 1
         (2, 1, "u", 20.0),
         (2, 2, "d", 0.0),    # key 2 deleted
         (3, 1, "d", 0.0),
         (3, 2, "u", 30.0)],  # key 3 re-created after delete
        "k long, v long, op string, val double")
    snap = {r.k: (r.v, r.val) for r in
            cdc_snapshot(log, ["k"], ["v"], "op").collect()}
    assert snap == {1: (2, 11.0), 3: (2, 30.0)}


def test_scd2_history_intervals(spark):
    """Validity chain: consecutive versions link, last row open-ended."""
    from casf_spark.operators.cdc import scd2_history

    log = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "x")],
        "k long, ver long, val string")
    rows = {(r.k, r.ver): (r.valid_from, r.valid_to, r.is_current)
            for r in scd2_history(log, ["k"], "ver").collect()}
    assert rows[(1, 10)] == (10, 20, False)
    assert rows[(1, 20)] == (20, None, True)
    assert rows[(2, 5)] == (5, None, True)


def test_cdc_snapshot_null_op_is_upsert(spark):
    """Debezium-style NULL ops (snapshot reads) must survive as upserts,
    not be NULL-filtered away by op != delete_op."""
    from casf_spark.operators.cdc import cdc_snapshot

    log = spark.createDataFrame(
        [(1, 1, "x", None), (2, 1, "y", "u"), (2, 2, "z", "d")],
        "k INT, v INT, payload STRING, op STRING")
    got = {r.k: r.payload
           for r in cdc_snapshot(log, ["k"], ["v"], "op").collect()}
    assert got == {1: "x"}  # k=2's latest change is a delete


def test_merge_upsert_semantics_and_single_shuffle(spark):
    """MERGE via union + struct-argmax: source wins on matched keys,
    unmatched keys from both sides pass through — and the plan carries
    exactly ONE exchange (the textbook full-outer-join MERGE needs two)
    and no join operator."""
    from casf_spark.operators.cdc import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k INT, name STRING, v DOUBLE")
    source = spark.createDataFrame(
        [(2, "B2", 99.0), (4, "d", 40.0)],
        "k INT, name STRING, v DOUBLE")
    merged = merge_upsert(target, source, ["k"])
    got = {r.k: (r.name, r.v) for r in merged.collect()}
    assert got == {1: ("a", 10.0), 2: ("B2", 99.0),
                   3: ("c", 30.0), 4: ("d", 40.0)}
    plan = merged._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]  # AQE prints both; count the final
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_merge_upsert_column_mismatch_raises(spark):
    import pytest

    from casf_spark.operators.cdc import merge_upsert

    t = spark.createDataFrame([(1, 2)], "k INT, v INT")
    s = spark.createDataFrame([(1, 2)], "k INT, other INT")
    with pytest.raises(ValueError, match="column sets differ"):
        merge_upsert(t, s, ["k"])
