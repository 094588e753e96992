"""Mergeable quantile lifecycle (`operators/quantiles.py`):

* value-domain tier — merge == rebuild EXACTLY (same rows), merge-then-
  remove == never-merged, and `sla_report` reproduces the batch q186
  report bit-for-bit from persisted state built in two halves;
* streaming twin — q186 as a foreachBatch fold over a stream-static
  join, exactly-once under replay (segment id = batch id);
* equi-depth tier — frozen edges, additive counts, and the rank-error
  bound of every percentile read verified against the true ranks of the
  merged raw data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.operators.quantiles import (
    build_equidepth_sketch,
    build_value_histogram,
    equidepth_percentiles,
    equidepth_segments,
    merge_equidepth_sketch,
    merge_value_histogram,
    quantile_fold_sink,
    read_value_histogram,
    remove_equidepth_sketch,
    remove_value_histogram,
    sla_report,
    value_histogram_segments,
)
from pyspark_streaming_base_spark.queries._tables import t

from tests.conftest import SF_SMALL


def _lags(spark):
    """q186's (priority, lag) rows at SF_SMALL."""
    li = t(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd")
    )
    o = t(spark, SF_SMALL, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("od"),
    )
    return li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "priority", F.datediff("sd", "od").cast("bigint").alias("lag")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# value-domain tier
# ---------------------------------------------------------------------------


def test_value_merge_equals_rebuild(spark, tmp_path):
    j = _lags(spark)
    # complementary split (lags can be negative; Spark % keeps the sign)
    a = j.filter(F.col("lag") % 2 == 0)
    b = j.filter(F.col("lag") % 2 != 0)

    inc = str(tmp_path / "inc")
    build_value_histogram(spark, inc, a, "priority", "lag")
    seg = merge_value_histogram(spark, inc, b, "priority", "lag")
    assert seg == "seg-1"

    full = str(tmp_path / "full")
    build_value_histogram(spark, full, j, "priority", "lag")

    assert _rows(read_value_histogram(spark, inc)) == _rows(
        read_value_histogram(spark, full)
    )
    # duplicate segment ids refuse (the idempotence ledger's integrity)
    with pytest.raises(ValueError):
        merge_value_histogram(spark, inc, b, "priority", "lag", segment=seg)


def test_value_merge_then_remove_is_noop(spark, tmp_path):
    j = _lags(spark)
    a = j.filter(F.col("lag") < 60)
    b = j.filter(F.col("lag") >= 60)
    p = str(tmp_path / "h")
    build_value_histogram(spark, p, a, "priority", "lag")
    before = _rows(spark.read.parquet(f"{p}/counts"))
    seg = merge_value_histogram(spark, p, b, "priority", "lag")
    remove_value_histogram(spark, p, seg)
    assert _rows(spark.read.parquet(f"{p}/counts")) == before
    with pytest.raises(ValueError):
        remove_value_histogram(spark, p, "no-such-seg")


def _q186_rows(spark):
    from pyspark_streaming_base_spark.queries import load_all

    q186 = load_all()["q186_ship_latency_by_priority"].fn(spark, SF_SMALL)
    return _rows(q186)


def _report_rows(spark, path):
    rep = sla_report(spark, path, ps=(0.5, 0.9)).select(
        F.col("key").alias("priority"),
        F.col("n").alias("n_items"),
        F.col("mean_value").alias("mean_lag_days"),
        F.col("min_value").alias("min_lag_days"),
        F.col("max_value").alias("max_lag_days"),
        F.col("p50").alias("p50_lag_days"),
        F.col("p90").alias("p90_lag_days"),
    )
    return _rows(rep)


def test_sla_report_equals_batch_q186(spark, tmp_path):
    """Persisted state folded in two halves reproduces the one-shot q186
    report EXACTLY — the merge-equals-rebuild property surfaced at the
    report level (same int64 sums, same single division, same ⌈p·n⌉
    picks)."""
    j = _lags(spark)
    p = str(tmp_path / "sla")
    build_value_histogram(
        spark, p, j.filter(F.col("lag") % 3 != 0), "priority", "lag"
    )
    merge_value_histogram(
        spark, p, j.filter(F.col("lag") % 3 == 0), "priority", "lag"
    )
    assert _report_rows(spark, p) == _q186_rows(spark)


def test_streaming_fold_twin_equals_batch_q186(spark, tmp_path):
    """q186 as a LIVE path: lineitem arrives as a file stream, joins the
    static orders dim (stream-static), and foreachBatch folds each
    micro-batch's (priority, lag) counts into the persisted histogram —
    after availableNow drains, the persisted report equals the batch
    q186. Then a manual REPLAY of a processed batch id proves the
    exactly-once ledger (no double counting)."""
    li = t(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_shipdate")
    staging = str(tmp_path / "stage")
    # two files → at least two micro-batches with maxFilesPerTrigger=1
    li.filter(F.col("l_orderkey") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(staging)
    li.filter(F.col("l_orderkey") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(staging)

    o_static = t(spark, SF_SMALL, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("od"),
    )
    p = str(tmp_path / "state")
    build_value_histogram(
        spark, p, spark.createDataFrame([], "priority string, lag bigint"),
        "priority", "lag",
    )
    fold = quantile_fold_sink(p, "priority", "lag")

    reader = (
        spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    stream = reader.join(
        o_static, reader["l_orderkey"] == o_static["o_orderkey"]
    ).select(
        "priority",
        F.datediff(F.to_date("l_shipdate"), F.col("od"))
        .cast("bigint")
        .alias("lag"),
    )
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    segs = value_histogram_segments(spark, p)
    assert len([s for s in segs if s.startswith("batch-")]) >= 2
    assert _report_rows(spark, p) == _q186_rows(spark)

    # replay: re-deliver batch 0's data under its already-used id — no-op
    replay = _lags(spark).limit(500)
    fold(replay, 0)
    assert value_histogram_segments(spark, p) == segs
    assert _report_rows(spark, p) == _q186_rows(spark)


# ---------------------------------------------------------------------------
# equi-depth tier
# ---------------------------------------------------------------------------


def _prices(spark):
    return t(spark, SF_SMALL, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("v")
    )


def test_equidepth_merge_equals_rebuild(spark, tmp_path):
    v = _prices(spark)
    a = v.filter(F.col("v") < 30_000)
    b = v.filter(F.col("v") >= 30_000)

    inc = str(tmp_path / "inc")
    build_equidepth_sketch(spark, inc, a, "v", n_buckets=32)
    merge_equidepth_sketch(spark, inc, b, "v")

    # rebuild UNDER THE SAME frozen edges (the quantizer contract): fold
    # the union through the merge path of a copy that saw no batches
    merged = _rows(
        spark.read.parquet(f"{inc}/counts")
        .groupBy("bucket")
        .agg(F.sum("n").alias("n"), F.max("vmax").alias("vmax"))
    )
    from pyspark_streaming_base_spark.operators.quantiles import (
        _equidepth_counts,
        _read_cuts,
    )

    cuts = _read_cuts(spark, inc)
    rebuilt = _rows(_equidepth_counts(v, "v", cuts))
    assert merged == rebuilt


def test_equidepth_rank_error_bound(spark, tmp_path):
    """Every percentile read's estimate must have a true rank within the
    reported bracket, and the bracket must be the covering bucket's
    occupancy — checked against the raw merged data (build half + merged
    half, so the bound is exercised POST-merge where the frozen buckets
    are no longer equi-depth)."""
    v = _prices(spark)
    a = v.filter(F.col("v") % 7 < 4)
    b = v.filter(F.col("v") % 7 >= 4)
    p = str(tmp_path / "sk")
    build_equidepth_sketch(spark, p, a, "v", n_buckets=32)
    merge_equidepth_sketch(spark, p, b, "v")

    n = v.count()
    reads = equidepth_percentiles(spark, p, ps=(0.1, 0.5, 0.9, 0.99)).collect()
    assert len(reads) == 4
    import math

    for r in reads:
        target = math.ceil(r["p"] * n)  # the same double product Spark ceils
        # true rank of the estimate = #values <= est (est is a real value)
        true_rank = v.filter(F.col("v") <= float(r["value_est"])).count()
        assert r["rank_lo"] < true_rank <= r["rank_hi"], r
        assert r["rank_lo"] < target <= r["rank_hi"], (r, target)
        assert abs(true_rank - target) <= (r["rank_hi"] - r["rank_lo"]), r
        assert 0.0 < r["err_bound"] <= 1.0


def test_equidepth_remove_and_degenerate(spark, tmp_path):
    v = _prices(spark)
    p = str(tmp_path / "sk")
    build_equidepth_sketch(spark, p, v, "v", n_buckets=16)
    before = _rows(spark.read.parquet(f"{p}/counts"))
    seg = merge_equidepth_sketch(spark, p, v.limit(1000), "v")
    assert seg in equidepth_segments(spark, p)
    remove_equidepth_sketch(spark, p, seg)
    assert _rows(spark.read.parquet(f"{p}/counts")) == before

    # constant column: all cuts collapse → one bucket, reads return it
    const = spark.range(100).select(F.lit(42.0).alias("v"))
    dp = str(tmp_path / "deg")
    build_equidepth_sketch(spark, dp, const, "v", n_buckets=8)
    got = equidepth_percentiles(spark, dp, ps=(0.5,)).collect()[0]
    assert got["value_est"] == 42.0 and got["err_bound"] == 1.0
