"""Plan linter: each rule fires on a contrived offender and stays quiet
on the tuned registry queries."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from pyspark_streaming_base_spark.plans.lint import errors, lint
from pyspark_streaming_base_spark.queries import load_all

from tests.conftest import SF_SMALL

R = load_all()


def rules_of(findings):
    return {f.rule for f in findings}


def test_cartesian_product_flagged(spark):
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(100).alias("a")
        b = spark.range(100).alias("b")
        j = a.crossJoin(b).filter(F.col("a.id") + F.col("b.id") > 50)
        assert "cartesian-product" in rules_of(lint(j))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_broadcast_nested_loop_warned_not_errored(spark):
    a = spark.range(100).alias("a")
    b = spark.range(100).alias("b")
    j = a.crossJoin(b).filter(F.col("a.id") + F.col("b.id") > 50)
    found = lint(j)
    assert "nested-loop-join" in rules_of(found)
    assert not errors(found)  # warn tier: 1-row broadcasts are idiomatic


def test_python_row_udf_flagged(spark):
    shout = F.udf(lambda s: (s or "").upper(), StringType())
    df = spark.range(10).select(shout(F.col("id").cast("string")).alias("s"))
    found = lint(df)
    assert "python-row-udf" in rules_of(found)
    assert errors(found)


def test_single_partition_exchange_flagged(spark):
    from pyspark.sql import Window as W

    # window with ORDER BY but no PARTITION BY: the one-task serializer
    df = spark.range(10_000).withColumn(
        "rn", F.row_number().over(W.orderBy("id"))
    )
    assert "single-partition-exchange" in rules_of(lint(df))


def test_global_orderby_not_flagged(spark):
    # a global orderBy range-partitions in parallel — must NOT be flagged
    df = (
        spark.range(10_000)
        .groupBy((F.col("id") % 100).alias("k"))
        .count()
        .orderBy("count", "k")
    )
    assert "single-partition-exchange" not in rules_of(lint(df))


def test_catalyst_collapses_adjacent_repartitions(spark):
    from pyspark_streaming_base_spark.plans import shuffle_count

    df = (
        spark.range(10_000)
        .repartition(8, F.col("id"))
        .repartition(16, (F.col("id") % 7))
        .groupBy((F.col("id") % 7).alias("k"))
        .count()
    )
    # the first repartition is dead work and Catalyst removes it — which
    # is why the linter has no chained-exchange rule
    assert shuffle_count(df) == 1


def test_registry_flagships_are_clean(spark):
    for name in ("q01_pricing_summary", "q04_revenue_by_nation", "q30_topk_per_group"):
        findings = errors(lint(R[name].fn(spark, SF_SMALL)))
        assert not findings, f"{name}: {findings}"


def test_no_registry_query_has_lint_errors(spark):
    """Engine-wide invariant: no registered query plans a cartesian
    product or a row-at-a-time Python UDF. Warnings are allowed but
    pinned, so a NEW warning (or a fixed one) surfaces here."""
    known_warns = {
        # 1-row / k-row broadcast folds — documented idiomatic shapes
        "q57_tfidf_topk",
        "q117_cooccurrence_lift",  # 1-row doc-count broadcast fold (q57 shape)
        "q60_knn_bruteforce",
        "q63_ann_ivf",
        "q109_pq_ann",  # ADC table broadcast fold — same shape as q60
        "q111_ivfadc_ann",  # probe/centroid broadcast folds — q63+q109 shape
        "q92_int8_quantize",
        "q94_kmeans_clusters",
        "q104_embedding_qa",
        "q125_semantic_dedup",  # k-row centroid broadcast fold (q94 shape)
        "q126_mix_weights",  # 1-row normalizing-total broadcast fold
        "q131_embedding_drift",  # k-row centroid + 1-row total broadcast folds
        "q133_logreg_quality_gate",  # 1-row weight/stats broadcast folds (q94 shape)
        "q134_bigram_lm_score",  # 1-row vocab-size broadcast fold (q126 shape)
        "q136_bm25_topk",  # 1-row corpus-stats broadcast fold; bounded 1-row global agg
        "q138_rrf_hybrid_fusion",  # inherits q136 + bounded 15-row rank windows
        "q140_mmr_diverse_topk",  # broadcast query-vector fold (q60 shape)
        "q141_distribution_drift",  # 1-row min/max + 16-row histogram broadcast folds
        "q142_referential_integrity",  # three 1-row metric folds (bounded global aggs)
        "q144_ks_drift",  # 1-row min/max + 64-row carry-table folds (q59 two-pass)
        "q146_ann_recall_eval",  # inherits q60/q61's broadcast query-side folds
        "q150_retrieval_pipeline",  # inherits q138 + a 1-row min/max rel fold
        "q151_negative_sampling",  # broadcast anchor fold (q60 shape)
        "q152_hard_negative_mining",  # broadcast anchor fold (q60 shape)
        "q153_epoch_materialization",  # 1-row total + |sources|-row factor folds
        "q154_bm25_batch_retrieval",  # 1-row stats + bench-table broadcast folds
        "q155_prf_query_expansion",  # two q136-shape passes' broadcast folds
        "q158_quality_threshold_sweep",  # 10-row threshold-grid broadcast fold
        "q160_column_profile",  # 1-row all-columns aggregate (bounded global agg)
        "q161_join_skew_report",  # 1-row profile x 1-row top10 broadcast folds
        "q162_rank_correlation",  # value-domain rank windows (bounded by L/L^2)
        "q163_pps_token_sample",  # 256-row carry window + 1-row W broadcast folds
        "q165_cvm_drift",  # 1-row min/max + 64-row carry folds (q144 shape)
        "q166_mann_whitney",  # same _ecdf.py folds as q144/q165
        "q167_source_concentration",  # source-domain rank window (catalog-sized)
        "q169_decile_qq",  # 1-row x 1-row segment-percentile broadcast reshape
        "q177_source_novelty",  # cumulative window over the #sources-row
        # aggregate (bounded catalog frame, post-corpus-fold)
        "q180_filter_waterfall",  # 1-row waterfall fold (bounded global agg,
        # map-side combined to one 20-number row per task)
        "q184_conversion_latency",  # 1-row summary/percentile folds + the
        # 64-row bucket-carry window of the shared _ecdf two-pass (the
        # q144/q165 shape)
        "q187_revenue_pareto",  # same _ecdf carry window + the broadcast
        # 10-row decile-grid probe (q184's shape on the revenue domain)
        "q189_packing_waste",  # 3-row (source,L) grid broadcast fold
        # (q158's pinned bounded-grid shape; PLANS.md audit)
        "q192_packing_boundary_audit",  # same 3-row grid fold as q189,
        # joined to the per-source cum table after the prefix sum
        "q194_packing_policy",  # the q189+q192 composition: both legs'
        # 3-row grid folds over the shared persisted base (r13)
        "q198_dim_truncation_recall",  # broadcast query-panel folds (q60
        # shape, x4 rankings) + the 1-row n_truth broadcast fold and
        # 3-row dim grid (r13; PLANS.md audit)
        "q199_retrieval_metrics",  # broadcast query-panel folds (q60
        # shape) on both the retrieved and the keys-only ideal arm (r13)
    }
    got_warns = set()
    for name, spec in R.items():
        findings = lint(spec.fn(spark, SF_SMALL))
        errs = errors(findings)
        assert not errs, f"{name}: {[f.rule for f in errs]}"
        if any(f.severity == "warn" for f in findings):
            got_warns.add(name)
    assert got_warns == known_warns, got_warns ^ known_warns
