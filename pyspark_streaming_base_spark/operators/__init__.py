"""Operator library façade.

Reusable expression helpers live in
:mod:`pyspark_streaming_base_spark.functions` (textops / vectorops /
multimodal) and the composite operators in this package; the oracle-checked
query registry (:mod:`pyspark_streaming_base_spark.queries`) builds on the
same definitions, so library users and the registry can never diverge.
"""

from pyspark_streaming_base_spark.functions.textops import tokens, word_shingles
from pyspark_streaming_base_spark.functions.vectorops import cosine, dot, dvec
from pyspark_streaming_base_spark.functions.multimodal import (
    decode_features,
    sample_frames,
)
from pyspark_streaming_base_spark.functions.textops import redact
from pyspark_streaming_base_spark.operators.asof import asof_backward_join
from pyspark_streaming_base_spark.operators.bloom import (
    append_bloom_index,
    bloom_maybe_contains,
    build_bloom,
    build_bloom_index,
    load_bloom_geometry,
    query_bloom_index,
)
from pyspark_streaming_base_spark.operators.bpe import bpe_apply, bpe_train, to_symbols
from pyspark_streaming_base_spark.operators.bm25 import (
    append_bm25_index,
    compact_bm25_index,
    delete_from_bm25_index,
    load_bm25_index,
    query_bm25_index_table,
    bm25_doclens,
    bm25_postings,
    bm25_score_query_table,
    bm25_score_terms,
    build_bm25_index,
    query_bm25_index,
)
from pyspark_streaming_base_spark.operators.allpairs import (
    cosine_set_self_join,
    prefix_elements,
)
from pyspark_streaming_base_spark.operators.components import (
    connected_components,
    merge_components,
)
from pyspark_streaming_base_spark.operators.drift import (
    drift_report,
    merge_drift_baseline,
    write_drift_baseline,
)
from pyspark_streaming_base_spark.operators.histogram import (
    equidepth_histogram,
    gated_percentiles,
)
from pyspark_streaming_base_spark.operators.logreg import (
    logreg_predict,
    logreg_train,
)
from pyspark_streaming_base_spark.operators.semdedup import (
    append_semdedup_index,
    compact_semdedup_index,
    delete_from_semdedup_index,
    assign_to_centroids,
    build_semdedup_index,
    merge_semdedup_removed,
    semdedup_removed,
    semdedup_removed_from_index,
)
from pyspark_streaming_base_spark.operators.mmr import mmr_rerank
from pyspark_streaming_base_spark.operators.scalardrift import (
    merge_scalar_baseline,
    scalar_drift_report,
    write_scalar_baseline,
)
from pyspark_streaming_base_spark.operators.quantiles import (
    build_equidepth_sketch,
    build_value_histogram,
    equidepth_percentiles,
    merge_equidepth_sketch,
    merge_value_histogram,
    quantile_fold_sink,
    read_value_histogram,
    remove_equidepth_sketch,
    remove_value_histogram,
    sla_report,
)
from pyspark_streaming_base_spark.operators.triangles import triangle_counts
from pyspark_streaming_base_spark.operators.ivf import (
    append_ivf_index,
    compact_ivf_index,
    delete_from_ivf_index,
    build_ivf_index,
    ivf_assign,
    ivf_search,
    query_ivf_index,
    tune_nprobe,
)
from pyspark_streaming_base_spark.operators.imagededup import image_near_dup_pairs
from pyspark_streaming_base_spark.operators.minhash import (
    append_minhash_index,
    compact_minhash_index,
    delete_from_minhash_index,
    load_minhash_index,
    build_minhash_index,
    minhash_bands,
    query_minhash_index,
)
from pyspark_streaming_base_spark.operators.fuzzyjoin import (
    hamming_distance,
    hamming_self_join,
)
from pyspark_streaming_base_spark.operators.kcore import kcore
from pyspark_streaming_base_spark.operators.pagerank import pagerank
from pyspark_streaming_base_spark.operators.pq import (
    append_pq_index,
    compact_pq_index,
    delete_from_pq_index,
    build_pq_index,
    pq_codebooks,
    query_pq_index,
    pq_encode,
    pq_search,
    pq_search_rerank,
)
from pyspark_streaming_base_spark.operators.expectations import (
    apply_expectations,
    split,
    violation_counts,
)
from pyspark_streaming_base_spark.operators.rangejoin import banded_range_join
from pyspark_streaming_base_spark.operators.salting import salted_join
from pyspark_streaming_base_spark.operators.zorder import morton_code, zorder_by
from pyspark_streaming_base_spark.operators.schema_align import (
    align_schema,
    diff_schema,
    union_aligned,
)

__all__ = [
    "tokens",
    "word_shingles",
    "dot",
    "dvec",
    "cosine",
    "decode_features",
    "sample_frames",
    "asof_backward_join",
    "salted_join",
    "banded_range_join",
    "hamming_distance",
    "hamming_self_join",
    "append_pq_index",
    "build_pq_index",
    "query_pq_index",
    "pq_codebooks",
    "pq_encode",
    "pq_search",
    "pq_search_rerank",
    "connected_components",
    "redact",
    "apply_expectations",
    "split",
    "violation_counts",
    "align_schema",
    "morton_code",
    "zorder_by",
    "union_aligned",
    "diff_schema",
    "image_near_dup_pairs",
    "append_minhash_index",
    "minhash_bands",
    "build_minhash_index",
    "query_minhash_index",
    "ivf_assign",
    "ivf_search",
    "append_ivf_index",
    "build_ivf_index",
    "query_ivf_index",
    "tune_nprobe",
    "pagerank",
    "build_bloom",
    "bloom_maybe_contains",
    "bm25_postings",
    "bm25_doclens",
    "bm25_score_terms",
    "bm25_score_query_table",
    "build_bm25_index",
    "append_bm25_index",
    "query_bm25_index",
    "cosine_set_self_join",
    "prefix_elements",
    "merge_components",
    "write_drift_baseline",
    "merge_drift_baseline",
    "drift_report",
    "equidepth_histogram",
    "gated_percentiles",
    "logreg_train",
    "logreg_predict",
    "semdedup_removed",
    "assign_to_centroids",
    "build_semdedup_index",
    "append_semdedup_index",
    "semdedup_removed_from_index",
    "merge_semdedup_removed",
    "triangle_counts",
    "bpe_train",
    "bpe_apply",
    "to_symbols",
    "write_scalar_baseline",
    "scalar_drift_report",
    "merge_scalar_baseline",
    "build_value_histogram",
    "merge_value_histogram",
    "remove_value_histogram",
    "read_value_histogram",
    "sla_report",
    "quantile_fold_sink",
    "build_equidepth_sketch",
    "merge_equidepth_sketch",
    "remove_equidepth_sketch",
    "equidepth_percentiles",
    "mmr_rerank",
]
