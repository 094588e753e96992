"""Batch↔stream equivalence harness (SURVEY.md §7 watch list).

Structured Streaming runs the same logical plan incrementally, so a
correctly-written event-time operator must produce identical results when
its input arrives as a stream. ``stream_replay`` drives that check: write a
batch DataFrame to a parquet staging dir, replay it through ``readStream``
(optionally in several files to force multiple micro-batches), apply the
transformation, drain with ``availableNow`` into a memory sink, and return
the result for comparison against the batch run.

This is the streaming analogue of the DuckDB oracle: batch result = truth,
stream result must match.
"""

from __future__ import annotations

import uuid
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


def stream_replay(
    spark: SparkSession,
    batch_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    staging_dir: str,
    checkpoint_dir: str,
    n_chunks: int = 4,
    output_mode: str = "complete",
    max_files_per_trigger: Optional[int] = 1,
) -> DataFrame:
    """Replay ``batch_df`` as a file stream through ``transform``.

    ``n_chunks`` parquet files + ``maxFilesPerTrigger=1`` force the engine
    through multiple micro-batches, exercising state merge across batches
    (a single-batch pass would hide incremental-aggregation bugs).
    """
    batch_df.repartition(n_chunks).write.mode("overwrite").parquet(staging_dir)
    reader = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger or 1))
        .parquet(staging_dir)
    )
    out = transform(reader)
    qname = f"replay_{uuid.uuid4().hex[:8]}"
    query = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(qname)
