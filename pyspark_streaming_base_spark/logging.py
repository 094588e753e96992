"""Logging provider (reference parity: A11, redesigned).

The reference bridges into log4j over py4j
(``src/pyspark_streaming_base/logging/__init__.py:5-21``) — fragile and
JVM-coupled. Here: standard Python ``logging`` namespaced under a prefix,
plus an optional JVM log-level passthrough via
``sparkContext.setLogLevel`` — same observable capability (prefixed app
logging), idiomatic stack.
"""

from __future__ import annotations

import logging
from typing import Optional

from pyspark.sql import SparkSession


class LoggingProvider:
    """Creates prefixed loggers; optionally aligns the JVM log level."""

    DEFAULT_PREFIX = "pyspark_streaming_base_spark"

    @staticmethod
    def get_logger(
        prefix: Optional[str] = None,
        name: Optional[str] = None,
        level: int = logging.INFO,
    ) -> logging.Logger:
        full = ".".join(p for p in (prefix or LoggingProvider.DEFAULT_PREFIX, name) if p)
        logger = logging.getLogger(full)
        logger.setLevel(level)
        return logger

    @staticmethod
    def set_jvm_log_level(spark: SparkSession, level: str = "WARN") -> None:
        """Align driver-JVM log4j verbosity (reference achieved this via the
        py4j LogManager bridge)."""
        spark.sparkContext.setLogLevel(level)
