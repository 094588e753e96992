"""Kafka streaming source (reference parity: A1/A14/A15).

Option vocabulary and defaults mirror ``KafkaStreamingSource``
(``src/pyspark_streaming_base/sources/kafka_source.py:14-70``): micro-batch
admission control (``maxOffsetsPerTrigger=5000``, ``minPartitions=36``,
``maxRecordsPerPartition=100``), offset/time travel
(``startingOffsets``/``startingTimestamp``/``endingOffsets``…), loss policy
(``failOnDataLoss``), and consumer-group naming.

Fixed vs reference:

* every option resolves under the instance's own prefix — the reference
  hardcodes the full RuntimeConf key for ``maxOffsetsPerTrigger``
  (``kafka_source.py:204-206``), breaking multi-source apps (quirk 2.5.5);
* ``maxRecordsPerPartition`` participates in RuntimeConf resolution (the
  reference declares but never refreshes it — quirk 2.5.6);
* topic is read from ``{prefix}.kafka.topic`` (the code path the reference's
  tests exercise, ``tests/test_kafka_stream_source.py:17`` — its docs
  disagree with its code; quirk 2.5.4) and validated;
* ``mode`` (FAIL_FAST/PERMISSIVE) is NOT forwarded as a connector option —
  it's a ``from_json`` parse-mode concept the reference leaks through
  unvalidated (quirk 2.5.7); we expose it as a setting for downstream
  parse stages instead.

Scale notes: ``minPartitions`` decouples Spark parallelism from topic
partition count (splits partitions into offset ranges); at 1000 executors
set it ≥ total cores. ``maxOffsetsPerTrigger`` bounds micro-batch size —
backpressure admission control, the knob that keeps state + shuffle per
batch flat as topic volume grows.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import SparkSession
from pyspark.sql.streaming import DataStreamReader

from pyspark_streaming_base_spark.sources.base import StreamingSource


class KafkaStreamingSource(StreamingSource):
    FORMAT = "kafka"

    DEFAULT_OPTIONS: Dict[str, str] = {
        # connection — must be provided by config
        "kafka.bootstrap.servers": "",
        # content
        "includeHeaders": "false",
        # offsets & replay (kafka_source.py:30-56)
        "startingOffsets": "earliest",
        "failOnDataLoss": "true",
        "fetchOffset.retryIntervalMs": "10",
        # admission control (kafka_source.py:55-69)
        "maxOffsetsPerTrigger": "5000",
        "minPartitions": "36",
        "maxRecordsPerPartition": "100",
    }

    #: Non-option settings under ``{prefix}.kafka``.
    DEFAULT_SETTINGS: Dict[str, str] = {
        "topic": "",
        "subscribePattern": "",
        "groupIdPrefix": "",
        "mode": "FAIL_FAST",  # parse-mode hint for downstream from_json, NOT a connector option
    }

    def topic(self, session: Optional[SparkSession] = None) -> str:
        top = self.setting("topic", session)
        if not top and not self.setting("subscribePattern", session):
            raise ValueError(
                f"{self.config_prefix}.topic (or .subscribePattern) must be configured"
            )
        return top or ""

    def group_id_prefix(self, session: Optional[SparkSession] = None) -> str:
        """Consumer-group prefix; defaults to ``{app.name}:{version}`` like
        the reference (``kafka_source.py:144-160``)."""
        explicit = self.setting("groupIdPrefix", session)
        if explicit:
            return explicit
        name = (self.app.name if self.app else None) or "app"
        version = "stable"
        if self.app is not None:
            try:
                version = self.app.checkpoint_version()
            except Exception:
                version = "stable"
        return f"{name}:{version}"

    def generate(self, session: Optional[SparkSession] = None) -> DataStreamReader:
        spark = self._session(session)
        opts = self.resolved_options(spark)
        topic = self.setting("topic", spark)
        pattern = self.setting("subscribePattern", spark)
        if topic:
            opts["subscribe"] = topic
        elif pattern:
            opts["subscribePattern"] = pattern
        else:
            raise ValueError(
                f"{self.config_prefix}.topic (or .subscribePattern) must be configured"
            )
        opts["groupIdPrefix"] = self.group_id_prefix(spark)
        if not opts.get("kafka.bootstrap.servers"):
            raise ValueError(
                f"{self.config_options_prefix}.kafka.bootstrap.servers must be configured"
            )
        return spark.readStream.options(**opts).format(self.FORMAT)
