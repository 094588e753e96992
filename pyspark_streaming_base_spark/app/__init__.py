from pyspark_streaming_base_spark.app.app import App
from pyspark_streaming_base_spark.app.streaming_app import StreamingApp

__all__ = ["App", "StreamingApp"]
