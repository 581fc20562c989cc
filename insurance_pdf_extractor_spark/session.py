"""SparkSession factory with the scale-oriented defaults this engine needs.

Tuned for the 100 TB design point (SURVEY.md §4 "explicit engineering"):
- AQE on (runtime coalescing + skew-join splitting);
- small Arrow batches — input rows carry fat ``binary`` payloads, so the
  default 10k-row batches would blow up the Python workers;
- python worker reuse (steady-state throughput for the two-parallelism
  scaling benchmark);
- shuffle partitions sized for the local harness; a real cluster job
  overrides via ``spark-submit --conf``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# 256 rows/batch measured fastest for this corpus's ~5 KB docs (64 adds
# per-batch overhead, 1024 bloats worker memory and tails); override per
# corpus via env — fat multi-MB documents want smaller batches.
ARROW_BATCH_ROWS = int(os.environ.get("SPARK_GRAFT_ARROW_BATCH", "256"))


def get_spark(app_name: str = "insurance_pdf_extractor_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra: dict[str, str] | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # pinned UTC: event-time ops (unix_timestamp, window()) must not
        # depend on the host timezone — oracle parity and cross-cluster
        # reproducibility both require it
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_BATCH_ROWS))
        .config("spark.python.worker.reuse", "true")
        # lz4 shuffle compression stays ON: measured ~4x fewer bytes to
        # local disk for this corpus, which beats the codec CPU cost
        .config("spark.shuffle.compress",
                os.environ.get("SPARK_GRAFT_SHUFFLE_COMPRESS", "true"))
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"))
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
