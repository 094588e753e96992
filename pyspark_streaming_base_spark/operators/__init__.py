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
from pyspark_streaming_base_spark.operators.asof import asof_backward_join
from pyspark_streaming_base_spark.operators.rangejoin import banded_range_join
from pyspark_streaming_base_spark.operators.salting import salted_join

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
]
