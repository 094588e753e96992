"""Application base: SparkSession lifecycle + config entry points.

Reference parity: ``App`` (``src/pyspark_streaming_base/app/app.py:55-118``,
operator A7/A8) with its three entry points (SURVEY.md §3):

1. fluent builder — ``App().with_config({...}).initialize()``;
2. constructor config — ``App(app_config={...})`` auto-initializes
   (``app/app.py:80-83``);
3. RuntimeConf-first — set ``spark.conf`` directly, then ``initialize()``.

Fixed vs reference: ``initialize()`` always returns ``self`` (the reference
forgets the return at ``app/app.py:103-118`` — quirk 2.5.8), and
configuration state is all per-instance.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

from pyspark.sql import SparkSession

from pyspark_streaming_base_spark.logging import LoggingProvider
from pyspark_streaming_base_spark.session import SessionFactory

#: RuntimeConf keys the app core reads at initialize()
#: (reference: ``app/app.py:106-115``).
KEY_APP_NAME = "spark.app.name"
KEY_APP_VERSION = "spark.app.version"
KEY_LOGGING_PREFIX = "spark.app.logging.prefix"


class App:
    """SparkSession owner + config lifecycle (reference A7).

    Config semantics match the reference: ``with_config`` writes every
    ``spark.*`` key to RuntimeConf (``app/app.py:97-100``), raises
    ``RuntimeError`` once initialized (``app/app.py:95-96``); non-spark
    keys are kept app-side (RuntimeConf only accepts spark-namespaced keys
    cleanly, and the reference filters the same way).
    """

    def __init__(
        self,
        session: Optional[SparkSession] = None,
        app_config: Optional[Dict[str, str]] = None,
    ) -> None:
        self.spark: SparkSession = SessionFactory.get_or_active(session)
        self._initialized = False
        self._local_config: Dict[str, str] = {}
        self.name: Optional[str] = None
        self.version: Optional[str] = None
        self.logger: logging.Logger = LoggingProvider.get_logger()
        if app_config:
            # constructor entry point: configure then auto-initialize
            # (reference ``app/app.py:80-83``)
            self.with_config(app_config)
            self.initialize()

    # -- configuration -----------------------------------------------------

    @staticmethod
    def generate_spark_session() -> SparkSession:
        """Local test session factory (reference A8, ``app/app.py:22-50``)."""
        return SessionFactory.local(delta_enabled=True)

    def with_config(self, config: Dict[str, str]) -> "App":
        """Write ``spark.*`` keys to RuntimeConf; keep the rest app-side.

        Raises ``RuntimeError`` if called after ``initialize()`` — config is
        frozen once the app has derived its identity from it (reference
        ``app/app.py:95-96``; tested ``tests/test_streaming_app.py:23-26``).
        """
        if self._initialized:
            raise RuntimeError("with_config() may not be called after initialize()")
        for key, value in config.items():
            if key.startswith("spark."):
                self.spark.conf.set(key, str(value))
            else:
                self._local_config[key] = str(value)
        return self

    def conf(self, key: str, default: Optional[str] = None) -> Optional[str]:
        """Read one key: RuntimeConf first, then app-side config."""
        try:
            val = self.spark.conf.get(key, None)
        except Exception:
            val = None
        if val is not None and val != "":
            return val
        return self._local_config.get(key, default)

    # -- lifecycle ---------------------------------------------------------

    def initialize(self) -> "App":
        """Resolve app identity from config and build the logger.

        Always returns ``self`` (builder-chainable from every subclass —
        fixes reference quirk 2.5.8).
        """
        self.name = self.conf(KEY_APP_NAME, "app")
        self.version = self.conf(KEY_APP_VERSION)
        prefix = self.conf(KEY_LOGGING_PREFIX, LoggingProvider.DEFAULT_PREFIX)
        self.logger = LoggingProvider.get_logger(prefix=prefix, name=self.name)
        self._initialized = True
        return self

    @property
    def is_initialized(self) -> bool:
        return self._initialized
