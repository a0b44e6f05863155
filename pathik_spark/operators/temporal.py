"""Temporal operators: gap sessionization and as-of join.

Two operators a crawl-analytics engine needs that Spark's DataFrame
API lacks as primitives, each built as a composition of existing ops
(no UDF, no range join, no driver loop):

- ``sessionize``: gap-based session assignment over an event stream
  (per-host fetch sessions for politeness accounting, per-user
  sessions over the events table). Classic lag -> new-session flag ->
  running sum; everything happens inside ONE hash-partitioned window
  per key, so the corpus shuffles exactly once.

- ``asof_join``: for every left row, the most recent right row with
  ts <= left.ts for the same key (the "what config/snapshot/price was
  in effect at this moment" join — e.g. the robots snapshot in effect
  at each fetch). A naive implementation is a range join (quadratic
  blow-up per key); the scalable shape is the tagged-union trick:
  union both streams, ONE shuffle on (key, ts), and a per-key ordered
  window carries the last non-null right value forward onto left
  rows. O(n log n) in each partition, no join explosion, and AQE-
  friendly because it is just a window over a union.

The entry oracles check ``asof_join`` against DuckDB's native
ASOF JOIN — an independently implemented algorithm, not a restatement
of this one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 360,
    seq_col: str = "event_id",
) -> DataFrame:
    """Assign gap-based sessions: a new session starts when the time
    since the key's previous event exceeds ``gap_minutes``.

    Returns the input columns plus ``session_idx`` (1-based per key,
    in first-event order) and ``session_seq`` (1-based position within
    the session). Ordering ties on ``ts_col`` break by ``seq_col`` —
    deterministic on any cluster. One shuffle (the per-key window)."""
    gap_us = int(gap_minutes) * 60_000_000
    # cast handles TIMESTAMP_NTZ inputs (parquet default); the engine
    # pins spark.sql.session.timeZone=UTC so the epoch is deterministic
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(ts_col, seq_col)
    flagged = events.withColumn(
        "_new",
        F.when(
            us - F.lag(us).over(w) > F.lit(gap_us), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_new", F.when(F.lag(ts_col).over(w).isNull(), F.lit(1)).otherwise(F.col("_new"))
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    with_idx = flagged.withColumn(
        "session_idx", F.sum("_new").over(w_run).cast("int")
    )
    w_sess = Window.partitionBy(key_col, "session_idx").orderBy(ts_col, seq_col)
    return with_idx.withColumn(
        "session_seq", F.row_number().over(w_sess)
    ).drop("_new")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    right_seq_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row gains the ``value_cols`` (and
    ``ts_col``) of the latest right row with right.ts <= left.ts for
    the same ``by`` key; nulls when no right row precedes it.

    Tagged-union implementation: right rows sort BEFORE left rows at
    equal ts (<= semantics); ``right_seq_col`` (any right column, not
    necessarily in ``value_cols``) breaks ties between right rows
    sharing a (key, ts) — the largest wins, deterministic. The matched
    row's columns travel as one struct, so a NULL inside the latest
    matching right row stays a NULL (never back-filled from an older
    row). The only wide operation is one hash shuffle of the union on
    the key; no range join, no per-key materialization."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (by, ts_col)]
    # the matched right row travels as ONE struct: carrying each value
    # column independently with last(ignorenulls) would resurrect a
    # stale older value whenever the latest matching row holds a NULL,
    # stitching together a (id, value) tuple that never existed
    r = right.select(
        F.col(by),
        F.col(ts_col),
        F.struct(
            F.col(ts_col).alias(f"{ts_col}{suffix}"),
            *[F.col(c).alias(c + suffix) for c in value_cols],
        ).alias("_rrow"),
        *(
            [F.col(right_seq_col).alias("_rseq")]
            if right_seq_col is not None
            else []
        ),
    ).withColumn("_side", F.lit(0))
    seq_order = [F.col("_rseq").asc_nulls_first()] if right_seq_col else []
    l_tagged = left.withColumn("_side", F.lit(1))
    unioned = l_tagged.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts_col), F.col("_side"), *seq_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "_rrow", F.last("_rrow", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1)
    for c in [f"{ts_col}{suffix}", *[c + suffix for c in value_cols]]:
        out = out.withColumn(c, F.col(f"_rrow.{c}"))
    drops = ["_side", "_rrow"] + (["_rseq"] if right_seq_col else [])
    return out.drop(*drops)
