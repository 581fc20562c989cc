"""Incremental file ingest via Structured Streaming (stretch goal).

The reference is strictly batch (SURVEY.md §2.10) and the north_rule
asks for resumability, not streaming — which the batch pipeline's
anti-join provides. This wrapper adds the natural cluster deployment on
top: a ``Trigger.AvailableNow`` stream over a landing directory of
web_pages parquet, running the SAME 5-stage pipeline per micro-batch via
``foreachBatch``. Checkpointing makes file-level progress exactly-once;
the in-pipeline url anti-join stays on as a second idempotency layer
(reprocessing after a checkpoint wipe still adds zero duplicate rows).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .pipeline import run_pipeline
from .schemas import WEB_PAGES


def ingest_available_now(spark: SparkSession, landing_dir: str,
                         output_dir: str, run_id_prefix: str = "stream",
                         max_files_per_trigger: int = 64) -> int:
    """Process all files currently in landing_dir, then stop.

    Returns the number of micro-batches executed. Safe to re-run: the
    stream checkpoint (``<output_dir>/_checkpoint``) skips files already
    ingested; the pipeline's anti-join skips urls already committed.
    """
    checkpoint = os.path.join(output_dir, "_checkpoint")
    n_batches = 0

    def process_batch(batch_df, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        run_pipeline(batch_df.sparkSession, batch_df,
                     output_dir=output_dir,
                     run_id=f"{run_id_prefix}_{batch_id}")

    stream = (spark.readStream.schema(WEB_PAGES)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(landing_dir))
    query = (stream.writeStream
             .foreachBatch(process_batch)
             .option("checkpointLocation", checkpoint)
             .trigger(availableNow=True)
             .start())
    query.awaitTermination()
    return n_batches
