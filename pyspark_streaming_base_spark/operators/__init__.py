"""Operator library façade.

The operator implementations live in :mod:`pyspark_streaming_base_spark.queries`
(registered, oracle-checked) and the reusable expression helpers here give
library users direct access without going through the registry.
"""

from pyspark_streaming_base_spark.queries.dedup import _shingles as word_shingles
from pyspark_streaming_base_spark.queries.dedup import _tokens as tokens
from pyspark_streaming_base_spark.queries.similarity import cosine, dot
from pyspark_streaming_base_spark.functions.multimodal import decode_features, sample_frames
from pyspark_streaming_base_spark.operators.asof import asof_backward_join
from pyspark_streaming_base_spark.operators.salting import salted_join

__all__ = [
    "tokens",
    "word_shingles",
    "dot",
    "cosine",
    "decode_features",
    "sample_frames",
    "asof_backward_join",
    "salted_join",
]
