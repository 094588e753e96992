"""logreg_train: the distributed full-batch GD loop must equal a numpy
mirror of the same recipe (same fixed-point grids, same fold order — the
q94 Lloyd-parity pattern), be bit-reproducible under repartitioning
(the scaled-int gradient-sum property), and actually learn the gate it
distills."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from pyspark_streaming_base_spark.operators.logreg import (
    _GRAD_SCALE,
    _STAT_SCALE,
    logreg_predict,
    logreg_train,
)

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
FEATS = ["f_dr", "f_ls", "f_nt"]


def _features_df(spark, sf_dir=SF_DIR):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    n_tok = F.size(toks)
    dr = F.size(F.array_distinct(toks)).cast("double") / n_tok
    ls = F.least(F.col("n_chars").cast("double") / 500.0, F.lit(1.0))
    quality = (
        0.45 * dr + 0.35 * ls + 0.2 * F.when(n_tok >= 10, 1.0).otherwise(0.0)
    )
    return docs.select(
        "doc_id",
        dr.alias("f_dr"),
        ls.alias("f_ls"),
        (n_tok.cast("double") / 100.0).alias("f_nt"),
        (quality >= 0.63).cast("double").alias("y"),
    ).filter(n_tok > 0)


def _features_np(sf_dir=SF_DIR):
    tb = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    rows = []
    for text, n_chars in zip(tb.text, tb.n_chars):
        tk = [x for x in text.split(" ") if x]
        if not tk:
            continue
        dr = len(set(tk)) / len(tk)
        ls = min(n_chars / 500.0, 1.0)
        q = 0.45 * dr + 0.35 * ls + 0.2 * (1.0 if len(tk) >= 10 else 0.0)
        rows.append((1.0, dr, ls, len(tk) / 100.0, 1.0 if q >= 0.63 else 0.0))
    arr = np.array(rows, dtype=np.float64)
    return arr[:, :4], arr[:, 4]


def _half_up(v, scale):
    """Spark F.round(x*scale, 0) — HALF_UP, away from zero."""
    s = v * scale
    return np.where(s >= 0, np.floor(s + 0.5), -np.floor(-s + 0.5)).astype(
        np.int64
    )


def _mirror_train(X, y, iters=30, lr=8.0, beta=0.9):
    """The exact recipe of logreg_train(standardize=True), in numpy:
    exact-sum standardization stats, sequential-fold dot products,
    10⁻⁹-grid gradient sums, momentum, affine unwind."""
    n, d = X.shape
    m = np.zeros(d)
    s = np.ones(d)
    for j in range(1, d):
        m[j] = float(_half_up(X[:, j], _STAT_SCALE).sum()) / n / _STAT_SCALE
        ex2 = (
            float(_half_up(X[:, j] * X[:, j], _STAT_SCALE).sum())
            / n
            / _STAT_SCALE
        )
        s[j] = max(math.sqrt(max(ex2 - m[j] * m[j], 0.0)), 1e-6)
    Xs = (X - m) / s
    w = np.zeros(d)
    v = np.zeros(d)
    for _ in range(iters):
        # sequential left fold, same order as the zip_with/aggregate tree
        z = np.zeros(n)
        for j in range(d):
            z = z + w[j] * Xs[:, j]
        p = 1.0 / (1.0 + np.exp(-z))
        g = np.empty(d)
        for j in range(d):
            gs = _half_up((p - y) * Xs[:, j], _GRAD_SCALE).sum()
            g[j] = float(gs) / _GRAD_SCALE / n
        v = beta * v + g
        w = w - lr * v
    raw = np.empty(d)
    acc = 0.0
    for k in range(1, d):
        acc = acc + w[k] * m[k] / s[k]
    raw[0] = w[0] - acc
    for j in range(1, d):
        raw[j] = w[j] / s[j]
    return raw


def test_matches_numpy_mirror_on_fixture(spark):
    feats = _features_df(spark)
    got = np.array(logreg_train(feats, FEATS, "y").collect()[0].w)
    X, y = _features_np()
    want = _mirror_train(X, y)
    # identical grids + fold order; residual slack only for <=1-ulp
    # exp() differences between the JVM and numpy landing on a 1e-9
    # grid boundary (odds ~1e-7/row-dim-iter, magnitude ~1e-9/n each)
    assert np.allclose(got, want, rtol=0, atol=1e-8), (got, want)


def test_bit_reproducible_under_repartitioning(spark):
    feats = _features_df(spark)
    w1 = logreg_train(feats.repartition(13), FEATS, "y", iters=5).collect()
    w2 = logreg_train(feats.repartition(2), FEATS, "y", iters=5).collect()
    w3 = logreg_train(feats.coalesce(1), FEATS, "y", iters=5).collect()
    assert w1[0].w == w2[0].w == w3[0].w


def test_learns_the_gate(spark):
    feats = _features_df(spark)
    w = logreg_train(feats, FEATS, "y")
    pred = logreg_predict(feats, FEATS, w)
    acc = pred.select(
        F.avg(((F.col("p") >= 0.5) == (F.col("y") == 1.0)).cast("double"))
    ).collect()[0][0]
    assert acc >= 0.9, acc  # measured 0.978; loose floor for fixture drift


def test_null_and_nan_rows_excluded(spark):
    rows = [
        (1.0, 1.0, 1.0),
        (0.0, 0.0, 0.0),
        (None, 1.0, 1.0),          # null feature
        (float("nan"), 1.0, 1.0),  # NaN feature
        (1.0, 1.0, None),          # null label
    ]
    df = spark.createDataFrame(rows, "f1 double, f2 double, y double")
    clean = spark.createDataFrame(rows[:2], "f1 double, f2 double, y double")
    w_all = logreg_train(df, ["f1", "f2"], "y", iters=3).collect()[0].w
    w_clean = logreg_train(clean, ["f1", "f2"], "y", iters=3).collect()[0].w
    assert w_all == w_clean


def test_param_validation(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "f double, y double")
    with pytest.raises(ValueError):
        logreg_train(df, ["f"], "y", iters=0)
    with pytest.raises(ValueError):
        logreg_train(df, ["f"], "y", momentum=1.0)
    with pytest.raises(ValueError):
        logreg_train(df, ["f"], "y", momentum=-0.1)


def test_predict_is_zero_shuffle(spark):
    from pyspark_streaming_base_spark.plans import formatted_plan

    df = spark.createDataFrame(
        [(float(i), float(i % 2)) for i in range(100)], "f double, y double"
    )
    w = logreg_train(df, ["f"], "y", iters=2)
    plan = formatted_plan(logreg_predict(df, ["f"], w))
    # the only allowed exchange is the 1-row broadcast of the weights
    import re

    non_broadcast = [
        ln
        for ln in plan.splitlines()
        if re.search(r"\bExchange\b", ln) and "Broadcast" not in ln
    ]
    assert non_broadcast == [], plan


def test_registered_query_shape(spark):
    from pyspark_streaming_base_spark.queries.pipeline import (
        q133_logreg_quality_gate,
    )

    out = q133_logreg_quality_gate(spark, SF_DIR)
    rows = out.collect()
    assert len(rows) == 500  # every non-empty doc scored
    assert set(out.columns) == {"doc_id", "label", "p", "pred"}
    accuracy = sum(1 for r in rows if (r.p >= 0.5) == (r.label == 1)) / len(
        rows
    )
    assert accuracy >= 0.9
