"""StreamingSink base: config-materialized ``DataStreamWriter`` factory.

Reference parity: ``StreamingSink``
(``src/pyspark_streaming_base/sinks/streaming_sink.py:6-164``, operators
A3/A17/A18): a sink is configuration that turns a DataFrame into a
``df.writeStream`` writer with resolved options, output mode, layout
(``partitionBy``/``clusterBy``), query name, and trigger policy — plus the
``execute()`` step the reference stubs out (A19), implemented here.

Fixed vs reference: per-instance option state (quirk 2.5.1); dotted option
keys resolve under the options prefix without doubling (quirk 2.5.9).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery

from pyspark_streaming_base_spark.config import ConfigResolver
from pyspark_streaming_base_spark.session import SessionFactory

if TYPE_CHECKING:  # pragma: no cover
    from pyspark_streaming_base_spark.app.streaming_app import StreamingApp


class StreamingSink:
    """Abstract config-driven streaming sink (reference A3/A17/A18/A19)."""

    FORMAT: str = ""
    DEFAULT_OPTIONS: Dict[str, str] = {}

    #: Writer-level (non-option) settings, resolved under ``{prefix}.{fmt}``:
    #: outputMode/queryName/trigger/partitionBy/clusterBy
    #: (reference ``sinks/streaming_sink.py:15-23``).
    DEFAULT_SETTINGS: Dict[str, str] = {
        "outputMode": "append",
        "queryName": "",
        "partitionBy": "",
        "clusterBy": "",
        "path": "",
        # pre-flight output-mode × watermark legality check (SURVEY §7
        # watch list); "false" disables, "strict" also rejects
        # legal-but-unbounded-state shapes (streaming/legality.py)
        "validate": "true",
    }

    def __init__(
        self,
        config_prefix: str = "spark.app.sink",
        config: Optional[Mapping[str, str]] = None,
        app: Optional["StreamingApp"] = None,
    ) -> None:
        if not self.FORMAT:
            raise NotImplementedError("subclass must set FORMAT")
        self.app = app
        self.config_prefix = f"{config_prefix}.{self.FORMAT}"
        self.config_options_prefix = f"{self.config_prefix}.options"
        cfg = dict(config or {})
        opts, settings = {}, {}
        merged_defaults = {**StreamingSink.DEFAULT_SETTINGS, **self.DEFAULT_SETTINGS}
        for k, v in cfg.items():
            if k.startswith(self.config_options_prefix + "."):
                opts[k[len(self.config_options_prefix) + 1 :]] = v
            elif k.startswith(self.config_prefix + "."):
                settings[k[len(self.config_prefix) + 1 :]] = v
            else:
                (settings if k in merged_defaults else opts)[k] = v
        self._options = ConfigResolver(
            prefix=self.config_options_prefix,
            defaults=self.DEFAULT_OPTIONS,
            overrides=opts,
        )
        self._settings = ConfigResolver(
            prefix=self.config_prefix,
            defaults=merged_defaults,
            overrides=settings,
        )

    # -- resolution --------------------------------------------------------

    def resolved_options(self, session: Optional[SparkSession] = None) -> Dict[str, str]:
        return self._options.resolve(session=session)

    def setting(self, key: str, session: Optional[SparkSession] = None) -> Optional[str]:
        return self._settings.get(key, session=session)

    def with_option(self, key: str, value: str) -> "StreamingSink":
        self._options.with_override(key, value)
        return self

    # -- writer factory (A3) ----------------------------------------------

    def from_df(self, df: DataFrame) -> DataStreamWriter:
        """``df.writeStream`` with resolved options + writer settings.

        Reference shape: ``fromDF`` → ``generate(df)`` →
        ``df.writeStream.options(...).format(fmt)``
        (``sinks/delta_sink.py:91-107``, ``sinks/streaming_sink.py:126-146``),
        with outputMode/queryName/partitionBy applied here rather than left
        to the caller.
        """
        spark = df.sparkSession
        writer = df.writeStream.options(**self.resolved_options(spark)).format(self.FORMAT)
        mode = self.setting("outputMode", spark) or "append"
        self._validate(df, mode)
        writer = writer.outputMode(mode)
        qname = self.setting("queryName", spark)
        if qname:
            writer = writer.queryName(qname)
        pby = self.setting("partitionBy", spark)
        if pby:
            writer = writer.partitionBy(*[c.strip() for c in pby.split(",") if c.strip()])
        cby = self.setting("clusterBy", spark)
        if cby:
            writer = writer.clusterBy(*[c.strip() for c in cby.split(",") if c.strip()])
        return writer

    def _validate(self, df: DataFrame, mode: str) -> None:
        """Pre-flight legality check (good errors at wiring time instead of
        Spark's start-time AnalysisException). Gated by the ``validate``
        setting: "true" (default), "false", or "strict"."""
        setting = (self.setting("validate", df.sparkSession) or "true").lower()
        if setting == "false":
            return
        from pyspark_streaming_base_spark.streaming.legality import check_output_mode

        check_output_mode(df, mode, strict=setting == "strict")

    # reference alias (``sinks/delta_sink.py:91``)
    fromDF = from_df

    # -- query start (A19 — the stub the reference never implemented) ------

    def execute(self, writer: DataStreamWriter) -> StreamingQuery:
        """Start the query: ``.start(path)`` when a path is configured,
        else ``.toTable()`` for managed targets, else bare ``.start()``.

        Settings resolve against the active session so RuntimeConf-tier
        config (entry point 3) is honored at start time.
        """
        path = self.setting("path", self._session(None))
        if path:
            return writer.start(path)
        return writer.start()

    def _session(self, session: Optional[SparkSession]) -> SparkSession:
        if session is not None:
            return session
        if self.app is not None:
            return self.app.spark
        return SessionFactory.get_or_active()
