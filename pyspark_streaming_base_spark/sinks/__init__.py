from pyspark_streaming_base_spark.sinks.base import StreamingSink
from pyspark_streaming_base_spark.sinks.delta import DeltaStreamingSink
from pyspark_streaming_base_spark.sinks.delta_log import DeltaLogTable
from pyspark_streaming_base_spark.sinks.file import FileStreamingSink
from pyspark_streaming_base_spark.sinks.foreach_batch import IdempotentForeachBatchSink
from pyspark_streaming_base_spark.sinks.manifest_parquet import ManifestParquetDataSource

__all__ = [
    "StreamingSink",
    "DeltaStreamingSink",
    "DeltaLogTable",
    "FileStreamingSink",
    "IdempotentForeachBatchSink",
    "ManifestParquetDataSource",
]
