"""Temporal operators (operators/temporal.py): gap sessionization and
the tagged-union as-of join."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from pathik_spark.operators.temporal import asof_join, sessionize


def _ts(minute: int, second: int = 0):
    return datetime(2024, 1, 1, minute // 60, minute % 60, second)


def test_sessionize_gap_semantics(spark):
    ev = spark.createDataFrame(
        [
            (1, 10, _ts(0)),
            (2, 10, _ts(5)),     # within gap -> same session
            (3, 10, _ts(40)),    # 35 min gap > 30 -> new session
            (4, 10, _ts(41)),
            (5, 20, _ts(0)),     # other key: independent sessions
        ],
        "event_id long, user_id long, ts timestamp",
    )
    got = {
        r["event_id"]: (r["session_idx"], r["session_seq"])
        for r in sessionize(ev, gap_minutes=30).collect()
    }
    assert got == {1: (1, 1), 2: (1, 2), 3: (2, 1), 4: (2, 2), 5: (1, 1)}


def test_sessionize_gap_boundary_is_exclusive(spark):
    # exactly gap minutes apart stays in the SAME session (> not >=)
    ev = spark.createDataFrame(
        [(1, 1, _ts(0)), (2, 1, _ts(30)), (3, 1, _ts(60, 1))],
        "event_id long, user_id long, ts timestamp",
    )
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(ev, gap_minutes=30).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2}


def test_asof_join_le_semantics_and_nulls(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(10)), (2, 7, _ts(20)), (3, 7, _ts(5)), (4, 9, _ts(10))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 7, _ts(10), 1.0), (101, 7, _ts(15), 2.0), (102, 8, _ts(0), 9.0)],
        "rid long, user_id long, ts timestamp, v double",
    )
    out = {
        r["event_id"]: (r["rid_asof"], r["v_asof"])
        for r in asof_join(
            left, right, by="user_id", ts_col="ts", value_cols=["rid", "v"]
        ).collect()
    }
    assert out[1] == (100, 1.0)   # equal ts matches (<=)
    assert out[2] == (101, 2.0)   # latest prior wins
    assert out[3] == (None, None) # nothing at or before
    assert out[4] == (None, None) # key with no right rows at all
    # left row count preserved
    assert len(out) == 4


def test_asof_join_null_in_matched_row_stays_null(spark):
    """The matched right row travels atomically: a NULL value inside
    the LATEST matching row must come through as NULL, never back-
    filled from an older row (which would fabricate a tuple that never
    existed)."""
    left = spark.createDataFrame(
        [(1, 7, _ts(20))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, 7, _ts(10), 1.0), (101, 7, _ts(15), None)],
        "rid long, user_id long, ts timestamp, v double",
    )
    out = asof_join(
        left, right, by="user_id", ts_col="ts", value_cols=["rid", "v"]
    ).collect()[0]
    assert out["rid_asof"] == 101
    assert out["v_asof"] is None  # NOT 1.0 from row 100


def test_asof_join_seq_col_need_not_be_a_value_col(spark):
    """right_seq_col works even when it is not in value_cols."""
    left = spark.createDataFrame(
        [(1, 7, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(5, 7, _ts(10), 1.0), (6, 7, _ts(10), 2.0)],
        "rid long, user_id long, ts timestamp, v double",
    )
    out = asof_join(
        left, right, by="user_id", ts_col="ts",
        value_cols=["v"], right_seq_col="rid",
    ).collect()[0]
    assert out["v_asof"] == 2.0  # the rid=6 row wins the tie
    assert "rid_asof" not in out.asDict()


def test_asof_join_right_tie_breaks_by_seq(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(5, 7, _ts(10), 1.0), (6, 7, _ts(10), 2.0)],
        "rid long, user_id long, ts timestamp, v double",
    )
    out = asof_join(
        left, right, by="user_id", ts_col="ts",
        value_cols=["rid", "v"], right_seq_col="rid",
    ).collect()[0]
    assert out["rid_asof"] == 6  # largest seq among equal-ts right rows


def test_asof_randomized_equality_with_python_reference(spark):
    """Random keys/timestamps with deliberate collisions: the
    distributed as-of must equal the brute-force per-row argmax."""
    import random

    rng = random.Random(99)
    lefts = [
        (i, rng.randint(0, 6), _ts(rng.randint(0, 50))) for i in range(200)
    ]
    rights = [
        (1000 + j, rng.randint(0, 6), _ts(rng.randint(0, 50)), float(j))
        for j in range(80)
    ]
    want = {}
    for eid, k, ts in lefts:
        cands = [(rts, rid, v) for rid, rk, rts, v in rights if rk == k and rts <= ts]
        if cands:
            rts, rid, v = max(cands)  # latest ts, then largest rid
            want[eid] = (rid, v)
        else:
            want[eid] = (None, None)
    left = spark.createDataFrame(lefts, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        rights, "rid long, user_id long, ts timestamp, v double"
    )
    got = {
        r["event_id"]: (r["rid_asof"], r["v_asof"])
        for r in asof_join(
            left, right, by="user_id", ts_col="ts",
            value_cols=["rid", "v"], right_seq_col="rid",
        ).collect()
    }
    assert got == want


def test_asof_join_single_shuffle_plan(spark):
    """The scale contract: one hash exchange on the key for the whole
    join (the union + window), never a range join / cartesian."""
    left = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 5).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
    )
    right = spark.range(20).select(
        (F.col("id") + 1000).alias("rid"),
        (F.col("id") % 5).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 97).alias("ts"),
        F.rand(1).alias("v"),
    )
    out = asof_join(left, right, by="user_id", ts_col="ts", value_cols=["rid", "v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning(user_id") == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert out.count() == 100
