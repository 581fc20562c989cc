"""Per-partition lineage/metrics emission (north_rule mandate).

Each ``mapInPandas`` stage emits one metrics row per (run_id, stage,
partition): ``(doc_count, bytes, fail_count, wall_ms)``. Executors append
one small JSON file per partition under ``metrics_dir`` (works identically
on local FS and object stores — the same pattern an Iceberg metrics-table
append would use); the driver-side reader loads them back as a DataFrame
with schemas.METRICS.

There is no Spark built-in for intra-UDF lineage (SURVEY.md §4 item 2) —
``TaskContext.get().partitionId()`` inside the iterator is the mechanism.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession

from .schemas import METRICS


def emit_partition_metrics(metrics_dir: str | None, run_id: str, stage: str,
                           doc_count: int, n_bytes: int, fail_count: int,
                           wall_ms: int) -> None:
    """Called from INSIDE a mapInPandas iterator, once per partition."""
    if not metrics_dir:
        return
    tc = TaskContext.get()
    pid = tc.partitionId() if tc is not None else -1
    attempt = tc.attemptNumber() if tc is not None else 0
    row = {"run_id": run_id, "stage": stage, "partition_id": pid,
           "doc_count": doc_count, "bytes": n_bytes,
           "fail_count": fail_count, "wall_ms": wall_ms,
           "attempt": attempt}
    os.makedirs(metrics_dir, exist_ok=True)
    # attempt id + uuid in the name → task retries never corrupt a file;
    # readers dedup on (run_id, stage, partition_id) keeping max attempt
    path = os.path.join(
        metrics_dir,
        f"{run_id}_{stage}_{pid}_{attempt}_{uuid.uuid4().hex[:8]}.json")
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(row, f)
    os.replace(tmp, path)


def read_metrics(spark: SparkSession, metrics_dir: str) -> DataFrame:
    """Load lineage rows, deduping task retries: one row per
    (run_id, stage, partition_id), highest attempt wins."""
    rows = []
    if os.path.isdir(metrics_dir):
        for name in sorted(os.listdir(metrics_dir)):
            if not name.endswith(".json"):
                continue
            try:
                with open(os.path.join(metrics_dir, name), encoding="utf-8") as f:
                    rows.append(json.load(f))
            except (OSError, json.JSONDecodeError):
                continue
    best: dict[tuple, dict] = {}
    for r in rows:
        key = (r["run_id"], r["stage"], r["partition_id"])
        if key not in best or r.get("attempt", 0) > best[key].get("attempt", 0):
            best[key] = r
    rows = [{k: v for k, v in r.items() if k != "attempt"}
            for r in best.values()]
    return spark.createDataFrame(rows, schema=METRICS) if rows else \
        spark.createDataFrame([], schema=METRICS)
