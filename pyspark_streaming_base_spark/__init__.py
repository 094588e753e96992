"""pyspark_streaming_base_spark — a PySpark-native analytics engine.

A clean-room, Spark-first re-implementation of the capability surface of
``datacircus/pyspark-streaming-base`` (reference, read-only at
``/root/reference``): config-driven streaming sources/sinks/checkpoints
(reference ``src/pyspark_streaming_base/``), plus a batch/streaming operator
library (SURVEY.md §2B/§2C) designed for 100 TB scale: declarative
DataFrame/SQL plans so Catalyst handles pushdown/pruning/join selection,
broadcast hints for dimension tables, decimal-exact aggregation, and
LSH/MinHash-based near-dup + similarity operators that avoid O(n^2)
cross-joins.

Nothing here is copied from the reference; citations in docstrings are
``file:line`` pointers into the reference for behavioral parity only.
"""

from pyspark_streaming_base_spark.session import SessionFactory
from pyspark_streaming_base_spark.config import ConfigResolver

__version__ = "0.1.0"

__all__ = ["SessionFactory", "ConfigResolver", "__version__"]
