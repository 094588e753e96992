"""AQE skew-join evidence: the runtime mechanism our SCALE.md story
leans on for hot keys (band buckets, stopword tokens, boilerplate docs)
actually fires — a skewed sort-merge join gets split at run time."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16384",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8192",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 90% of the left lands on key 7 — one shuffle partition far past
        # the (lowered, so the test stays small) skew threshold
        left = spark.range(0, 100_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id"))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.lit("x").alias("v")
        )
        j = left.join(right, "k")
        rows = j.collect()  # same QueryExecution → final adaptive plan
        assert len(rows) == 90_000 + 100
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
        assert "skewed" in plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_segment_join(spark):
    """The q108/q124 CANDIDATE-join shape (segment equi-self-join) on a
    corpus where 30% of strings share one segment value: both join
    children are bare shuffle stages, so AQE's skew rewrite is eligible
    and must split the hot partitions — the activation evidence the
    fuzzy-join scale story relies on. (Contrast: q107's old
    agg-then-join-back shape was NOT eligible — an aggregate above the
    shuffle disqualifies the rewrite, which is why q107 is now
    join-free; see queries/dedup.py.)"""
    from pyspark_streaming_base_spark.operators.fuzzyjoin import _segments

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16384",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8192",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 30% share the first half (one hot (len, slot, seg) bucket),
        # second halves are distinct
        df = spark.range(30000).select(
            F.col("id"),
            F.concat(
                F.when(F.col("id") % 10 < 3, F.lit("aaaaaaaaaaaaaaaa")).otherwise(
                    F.sha2(F.col("id").cast("string"), 256).substr(1, 16)
                ),
                F.sha2((F.col("id") + 7).cast("string"), 256).substr(17, 16),
            ).alias("s"),
        )
        segs = _segments(df, "id", "s", 2).select("id", "_len", "_seg_idx", "_seg")
        a, b = segs.alias("a"), segs.alias("b")
        cand = a.join(
            b,
            (F.col("a._len") == F.col("b._len"))
            & (F.col("a._seg_idx") == F.col("b._seg_idx"))
            & (F.col("a._seg") == F.col("b._seg"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"))
        agg = cand.groupBy().count()
        n = agg.collect()[0][0]  # same QueryExecution → final adaptive plan
        assert n == 9000 * 8999 // 2  # hot bucket pairs: C(9000, 2)
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
        assert "skewed" in plan  # AQEShuffleRead ... coalesced and skewed
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_span_dedup_boilerplate_corpus_is_join_free_and_correct(spark):
    """q107's join-free shape on a BOILERPLATE-HEAVY corpus (80% of docs
    share one text): correctness of the dup attribution, and the plan
    carries NO join on the window-hash key — hot hashes meet only the
    map-side-combinable aggregate (partial_min/partial_max/partial_count
    in the plan), which is the skew-immunity argument (AQE cannot split
    an agg-fed join, so not having one is the fix)."""
    from pyspark_streaming_base_spark.queries.dedup import q107_dup_span_detection
    import os, tempfile

    boiler = " ".join(f"tok{i % 7}" for i in range(40))
    docs = spark.range(8000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 8, F.lit(boiler))
        .otherwise(
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(40)),
                    lambda i: F.concat(
                        F.col("id").cast("string"), F.lit("w"), i.cast("string")
                    ),
                ),
            )
        )
        .alias("text"),
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        q = q107_dup_span_detection(spark, d)
        rows = {r.doc_id: (r.n_windows, r.n_dup_windows) for r in q.collect()}
        plan = q._jdf.queryExecution().executedPlan().toString()
    assert len(rows) == 8000
    assert all(v == (25, 25) for k, v in rows.items() if k % 10 < 8)
    assert all(v == (25, 0) for k, v in rows.items() if k % 10 >= 8)
    # the only join keys on doc_id (two tiny doc-keyed aggregates); the
    # window-hash column h never appears as a join key
    import re

    join_lines = [l for l in plan.splitlines() if "Join" in l]
    assert join_lines, "expected the doc-keyed left join"
    assert all("doc_id" in l for l in join_lines), join_lines
    assert not any(re.search(r"Join \[h#", l) for l in join_lines), join_lines
    assert "partial_min" in plan and "partial_count" in plan  # map-side combine
