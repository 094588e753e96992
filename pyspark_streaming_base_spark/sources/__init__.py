from pyspark_streaming_base_spark.sources.base import StreamingSource
from pyspark_streaming_base_spark.sources.delta import DeltaStreamingSource
from pyspark_streaming_base_spark.sources.delta_log import (
    DeltaLogSnapshot,
    read_delta_snapshot,
)
from pyspark_streaming_base_spark.sources.delta_log_stream import (
    DeltaLogStreamDataSource,
)
from pyspark_streaming_base_spark.sources.file import FileStreamingSource
from pyspark_streaming_base_spark.sources.kafka import KafkaStreamingSource
from pyspark_streaming_base_spark.sources.synthetic import SyntheticEventsDataSource

__all__ = [
    "StreamingSource",
    "KafkaStreamingSource",
    "DeltaStreamingSource",
    "DeltaLogSnapshot",
    "read_delta_snapshot",
    "DeltaLogStreamDataSource",
    "FileStreamingSource",
    "SyntheticEventsDataSource",
]
