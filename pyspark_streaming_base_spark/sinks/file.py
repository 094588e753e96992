"""File streaming sink (parquet/json/csv directories).

The jar-free twin of the Delta sink so the full source→sink lifecycle runs
in this environment; same option machinery, same ``execute()`` contract.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql.streaming import DataStreamWriter, StreamingQuery

from pyspark_streaming_base_spark.sinks.base import StreamingSink


class FileStreamingSink(StreamingSink):
    FORMAT = "parquet"

    DEFAULT_OPTIONS: Dict[str, str] = {
        "maxRecordsPerFile": "100000",
    }

    DEFAULT_SETTINGS: Dict[str, str] = {
        "format": "parquet",
    }

    def from_df(self, df) -> DataStreamWriter:
        fmt = self.setting("format", df.sparkSession) or "parquet"
        writer = super().from_df(df)
        return writer.format(fmt)

    def execute(self, writer: DataStreamWriter) -> StreamingQuery:
        path = self.setting("path", self._session(None))
        if not path:
            raise ValueError(f"{self.config_prefix}.path must be configured")
        return writer.start(path)
