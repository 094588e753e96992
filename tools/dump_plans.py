"""Dump formatted physical plans for the audit set into PLANS.md.

The plan-shape pytest suite PINS the load-bearing properties (pushdown,
pruning, broadcast, WindowGroupLimit, exchange counts); this artifact is
the human-readable companion — the actual `.explain("formatted")` output
for the queries a reviewer most wants to audit, regenerable with
`make plans`.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark_streaming_base_spark.plans import formatted_plan
from pyspark_streaming_base_spark.queries import load_all
from pyspark_streaming_base_spark.session import SessionFactory

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

#: The audit set: the headline perf-relevant queries plus the operators
#: whose scale story lives in their plan shape.
AUDIT = [
    "q01_pricing_summary",      # single-shuffle agg, pushed filter
    "q04_revenue_by_nation",    # star join: dims broadcast, one fact shuffle
    "q30_topk_per_group",       # WindowGroupLimit
    "q41_minhash_lsh_pairs",    # band self-join, SHUFFLE_HASH, reused exchange
    "q61_ann_lsh",              # keys-only LSH probe join
    "q107_dup_span_detection",  # join-free span dedup (two aggs, doc-keyed join)
    "q108_fuzzy_hamming_join",  # distinct-domain segment blocking
    "q116_equidepth_histogram", # size-gated exact/sketch union
    "q124_fuzzy_levenshtein_join",  # PassJoin shifted-substring blocking
    "q125_semantic_dedup",      # size-gated SemDeDup, keys-only pair joins
    "q129_stratified_k_sample", # WindowGroupLimit on the hash panel
    "q103_pagerank_top20",      # TakeOrderedAndProject under the global Window
    "q130_image_neardup",       # 8-byte aHash off the scan, blocked bit-Hamming
    "q131_embedding_drift",     # broadcast argmin + k-row report joins
    "q132_allpairs_cosine_join",  # prefix-filter equi-join, keys-only verify
    "q133_logreg_quality_gate",   # per-step gradient shuffle, 1-row state folds
    "q135_clustering_coefficient",  # degree-ordered wedges, keys-only joins
    "q136_bm25_topk",           # pushed isin, broadcast stats folds, TakeOrdered
    "q137_segment_dedup_rebuild",  # one segment-keyed window, doc-keyed rebuild
    "q139_bloom_decontamination",  # broadcast bloom probes, candidate-only semi
    "q141_distribution_drift",  # two one-scan aggs, 16-row grid broadcast
    "q144_ks_drift",            # two-pass prefix-sum ECDF, bucketed windows
    "q149_interval_coverage",   # gaps-and-islands, ONE user-keyed exchange
    "q156_containment_pairs",   # lang-blocked shingle containment, size gate
    "q159_source_overlap",      # distinct (source, shingle), bounded fan-out
    "q161_join_skew_report",    # key-domain aggs, TakeOrdered top-10 fold
    "q162_rank_correlation",    # value-domain rank tables, equi-join-back
    "q172_cross_source_dup_matrix",  # shingle-keyed source pairs, keys-only
    "q173_dedup_measure_overlap",    # one candidate pass, two measures
    "q174_keeper_policy_report",     # per-component keeper folds
    "q175_line_repetition",     # line-hash agg absorbed map-side
    "q176_topgram_share",       # bigram explode, map-side partial agg
    "q179_interarrival_burstiness",  # lag window + agg share ONE exchange
    "q180_filter_waterfall",    # five signals, one scan, 1-row fold
    "q182_event_transitions",   # user-keyed lag, |types|²-row normalize
    "q183_cluster_density_audit",  # pairs→component join on blocked machinery
    "q184_conversion_latency",  # user-keyed aggs + _ecdf two-pass percentiles
    "q185_dup_span_by_source",  # int64 hash60 spans, two aggs, agg-only join
    "q186_ship_latency_by_priority",  # calendar-bounded cum window, k-row fold
    "q187_revenue_pareto",      # value-domain Lorenz via shared prefix sum
    "q188_jpeg_metadata_audit",  # one mapInPandas stage, scalar-only output
    "q189_packing_waste",       # count-only scan, 3-row grid, (source,L) agg
    "q190_token_yield_ladder",  # two hash60 keeper windows, source folds
    "q191_split_leakage_audit",  # q44 components + split hash, two aggs
    "q192_packing_boundary_audit",  # per-source bucketed prefix sum + grid
    "q193_wav_metadata_audit",  # one mapInPandas stage, scalar-only output
    "q194_packing_policy",      # one persisted base, grid agg + prefix sum
    "q195_audio_profile_by_source",  # mapInPandas → |sources|-row agg
    "q196_mp4_metadata_audit",  # one mapInPandas stage, scalar-only output
    "q197_modality_readiness_by_source",  # 3 parsers, one Arrow stage, |sources|-row agg
    "q198_dim_truncation_recall",  # 4 broadcast rankings, keys-only joins
    "q199_retrieval_metrics",  # q60 arm + keys-only ideal arm, panel-row math
]


def main() -> None:
    spark = SessionFactory.local(app_name="dump-plans")
    registry = load_all()
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=Path(__file__).resolve().parents[1],
        ).stdout.strip()
    except OSError:  # pragma: no cover
        commit = "unknown"
    out = [
        "# PLANS — formatted physical plans for the audit set\n",
        f"Generated by `make plans` at commit `{commit}` against `{SF_DIR}`.",
        "Properties asserted in `tests/test_plan_shape.py` / "
        "`tests/test_plan_lint.py`; this file is the human-readable "
        "companion and is REGENERATED, never hand-edited.\n",
    ]
    for name in AUDIT:
        df = registry[name].fn(spark, SF_DIR)
        out.append(f"## {name}\n")
        out.append("```")
        out.append(formatted_plan(df).rstrip())
        out.append("```\n")
    target = Path(__file__).resolve().parents[1] / "PLANS.md"
    target.write_text("\n".join(out))
    print(f"wrote {target} ({len(AUDIT)} plans)")


if __name__ == "__main__":
    main()
