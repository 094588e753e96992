from pyspark_streaming_base_spark.streaming.equivalence import stream_replay
from pyspark_streaming_base_spark.streaming.metrics import ProgressCapture
from pyspark_streaming_base_spark.streaming.stateful import (
    ewma_stream,
    heavy_hitters_stream,
    running_aggregate,
    running_aggregate_tws,
    sessionize,
    transition_stream,
    transition_stream_buffered,
)

__all__ = [
    "stream_replay",
    "ProgressCapture",
    "ewma_stream",
    "heavy_hitters_stream",
    "running_aggregate",
    "running_aggregate_tws",
    "sessionize",
    "transition_stream",
    "transition_stream_buffered",
]
