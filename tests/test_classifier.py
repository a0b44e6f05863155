"""Trained LR quality classifier (operators/classifier.py): bounded
deterministic training, raw-space weight fold-in, JVM-only scoring."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pathik_spark.operators.classifier import (
    PRETRAINED_QUALITY_MODEL,
    QUALITY_LR_FEATURES,
    quality_feature_cols,
    score_quality_lr,
    train_quality_classifier,
)

GOOD = [
    "The committee published its annual report on the state of the national economy this week.",
    "She walked along the river in the early morning while the city was still quiet and cool.",
    "Researchers at the university have found that the new method improves accuracy in most cases.",
    "The library will be open on Saturday and the reading room can be reserved by any member.",
    "After the storm passed over the coast the fishermen returned to the harbor with their boats.",
]
JUNK = [
    "$$$ WIN NOW!!! 1000000 %%% @@@ ###",
    "0123456789 0123456789 0123456789 !!!",
    "BUY!! CHEAP!! NOW!! >>> $$$ <<< 99% OFF 4U",
    "###$$$%%%^^^&&&*** 111222333444555",
    "ZZZZ AAAA QQQQ 9999 !!!! #### $$$$",
]


def _labeled(spark, n_rep=40):
    rows = []
    i = 0
    for rep in range(n_rep):
        for t in GOOD:
            rows.append((i, f"{t} (rev {rep})", 1))
            i += 1
        for t in JUNK:
            rows.append((i, f"{t} {rep}", 0))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_training_separates_and_is_deterministic(spark):
    labeled = _labeled(spark)
    m1 = train_quality_classifier(labeled)
    m2 = train_quality_classifier(labeled)
    assert m1 == m2  # bit-identical weights, no RNG anywhere
    scored = score_quality_lr(labeled, m1).join(
        labeled.select("doc_id", "label"), "doc_id"
    )
    acc = (
        scored.select(
            F.avg((F.col("keep").cast("int") == F.col("label")).cast("double"))
        ).collect()[0][0]
    )
    assert acc >= 0.98, acc


def test_sample_bound_and_empty(spark):
    labeled = _labeled(spark, n_rep=20)
    m = train_quality_classifier(labeled, max_sample=50)
    assert m["n_train"] == 50
    with pytest.raises(ValueError, match="empty"):
        train_quality_classifier(labeled.filter("doc_id < 0"))


def test_fold_in_matches_standardized_numpy(spark):
    """Raw-space folded weights score identically to standardizing in
    numpy and applying the pre-fold model — per doc, to 1e-9."""
    labeled = _labeled(spark, n_rep=4)
    m = train_quality_classifier(labeled)
    pdf = labeled.select(
        "doc_id", *quality_feature_cols(F.col("text"))
    ).toPandas()
    X = pdf[list(QUALITY_LR_FEATURES)].to_numpy(dtype=np.float64)
    z_np = X @ np.array(m["weights"]) + m["bias"]
    got = {
        r["doc_id"]: r["logit"]
        for r in score_quality_lr(labeled, m).collect()
    }
    for did, z in zip(pdf["doc_id"], z_np):
        assert abs(got[did] - round(z, 6)) < 1e-9


def test_pretrained_model_orders_good_above_junk(spark):
    docs = spark.createDataFrame(
        [(0, GOOD[0]), (1, JUNK[0])], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in score_quality_lr(docs, PRETRAINED_QUALITY_MODEL).collect()}
    assert rows[0]["logit"] > rows[1]["logit"]
    assert rows[0]["prob"] > rows[1]["prob"]


def test_scoring_plan_is_jvm_only_and_scan_local(spark):
    docs = spark.createDataFrame([(0, "hello world")], "doc_id long, text string")
    plan = score_quality_lr(docs, PRETRAINED_QUALITY_MODEL)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # scan-local: no shuffle


def test_entry_oracle_parity_quality_lr(spark):
    """Local replica of the driver gate for quality_lr_score at
    sf0.001: Spark operator vs DuckDB literal twin, value-exact."""
    import duckdb

    import __spark_entry__ as E
    from pathik_spark.entry_queries import ENGINE_ORACLE_SQL

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: (r["logit"], r["keep"])
        for r in E.queries()["quality_lr_score"](spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = {
        did: (logit, keep)
        for did, logit, keep in con.execute(
            ENGINE_ORACLE_SQL["quality_lr_score"]()
        ).fetchall()
    }
    assert set(got) == set(want) and len(got) > 0
    for did in got:
        assert got[did][1] == want[did][1], did
        assert abs(got[did][0] - want[did][0]) < 1e-9, did
