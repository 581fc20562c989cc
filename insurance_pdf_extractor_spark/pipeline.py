"""End-to-end extraction pipeline (SURVEY.md §3.1 Spark rebuild).

    scan (url, warc_ts, html, text, lang)
      → anti-join vs committed output          # resumable re-runs
      → repartitionByRange(N, xxhash64(url))   # skew kill / size balance
      → sniff     (native exprs)               # stage 1
      → tokenize  (mapInPandas)                # stage 2 (+2b html)
      → fields    (mapInPandas)                # stages 3+4
      → finalize  (native explode/window/agg)  # stage 5
      → write docs + claims parquet, lineage rows per (stage, partition)

Exactly one wide dependency (the explicit repartition) before the UDF
stages; finalize's groupBy/window shuffles hash on url, which AQE is free
to coalesce. At cluster scale the parquet writes become Iceberg appends —
the layout (output keyed by url + a metrics side-table) is unchanged.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lineage import read_metrics
from .operators.finalize import finalize
from .operators.fused import tokenize_and_extract
from .operators.sniff import sniff


@dataclass
class PipelineResult:
    run_id: str
    docs: DataFrame
    claims: DataFrame
    metrics: DataFrame | None
    docs_written: int
    wall_sec: float
    cached: DataFrame | None = None  # no-output path pins the intermediate

    def unpersist(self) -> None:
        """Release the pinned intermediate (no-output runs only)."""
        if self.cached is not None:
            self.cached.unpersist()


def _committed_urls(spark: SparkSession, docs_path: str) -> DataFrame | None:
    try:
        if os.path.isdir(docs_path) and any(
                n.endswith(".parquet") for n in os.listdir(docs_path)):
            return spark.read.parquet(docs_path).select("url")
    except Exception:
        pass
    return None


def run_pipeline(spark: SparkSession, web_pages: DataFrame,
                 output_dir: str | None = None,
                 run_id: str | None = None,
                 num_partitions: int | None = None,
                 resume: bool = True,
                 repartition: str = "auto",
                 cache_intermediate: bool = True) -> PipelineResult:
    """Run the 5-stage extraction over a web_pages DataFrame.

    output_dir: if set, writes ``docs/`` + ``claims/`` parquet (append)
    and per-partition lineage JSON under ``metrics/``; re-runs anti-join
    committed urls first (idempotent — north_rule resumability).
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    t0 = time.monotonic()
    metrics_dir = os.path.join(output_dir, "metrics") if output_dir else None
    docs_path = os.path.join(output_dir, "docs") if output_dir else None
    claims_path = os.path.join(output_dir, "claims") if output_dir else None

    df = web_pages
    if resume and docs_path:
        committed = _committed_urls(spark, docs_path)
        if committed is not None:
            # J1 pattern at run granularity: skip already-extracted urls
            df = df.join(committed, "url", "left_anti")

    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism * 2, 8)
    # Skew kill: the UDF stages need size-balanced partitions. Preferred
    # path: the scan itself already yields enough byte-balanced splits
    # (parquet row-group splits / Iceberg split planning) — then a shuffle
    # of the fat binary column would only burn cores the Python workers
    # need. Fallback when the input arrives in few/skewed partitions:
    # explicit repartition on xxhash64(url) (uniform 64-bit key ⇒ same
    # balance as repartitionByRange on url-hash, minus the sampling pass).
    scan_parts = df.rdd.getNumPartitions()
    if repartition == "always" or (repartition == "auto"
                                   and scan_parts < num_partitions):
        df = (df.withColumn("_url_hash", F.xxhash64("url"))
                .repartition(num_partitions, "_url_hash")
                .drop("_url_hash"))

    sniffed = sniff(df)
    # tokenize + fields run FUSED (one Arrow crossing for the fat text /
    # pages columns) while still emitting separate per-stage lineage rows
    fields_df = tokenize_and_extract(sniffed, run_id, metrics_dir)

    docs_written = 0
    if output_dir:
        # Materialize the post-UDF intermediate BEFORE appending outputs:
        # 1. the docs/claims DAGs both branch off fields_df — without a
        #    materialization the UDF stages re-execute per consumer
        #    (3x tokenize) and lineage triple-counts;
        # 2. the resume anti-join READS the docs path the job APPENDS to —
        #    a lazy plan re-evaluated after the first append would see its
        #    own output and silently drop the delta (self-read-write
        #    hazard). Staging snapshots the delta first. On a real cluster
        #    an Iceberg snapshot gives this isolation for free.
        staging = os.path.join(output_dir, "_staging", run_id)
        fields_df.write.mode("overwrite").parquet(staging)
        staged = spark.read.parquet(staging)
        claims, docs = finalize(staged)
        docs.write.mode("append").parquet(docs_path)
        claims.write.mode("append").parquet(claims_path)
        shutil.rmtree(staging, ignore_errors=True)
        docs_out = spark.read.parquet(docs_path)
        docs_written = docs_out.count()
        metrics = read_metrics(spark, metrics_dir)
        return PipelineResult(run_id, docs_out,
                              spark.read.parquet(claims_path), metrics,
                              docs_written, time.monotonic() - t0)
    # no-output path: finalize's docs plan branches twice off fields_df
    # (docs scalars + per-doc claims agg) — persisting lets the UDF stage
    # run once per action instead of twice. For LARGE corpora the pinned
    # intermediate (text + pages + word boxes) can spill and cost more
    # than the re-execution — pass cache_intermediate=False there, or use
    # the output_dir mode whose parquet staging is the scalable
    # materialization. Cached blocks have NO TTL: call result.unpersist()
    # (or spark.catalog.clearCache()) when done.
    cached = None
    if cache_intermediate:
        fields_df = cached = fields_df.persist()
    claims, docs = finalize(fields_df)
    return PipelineResult(run_id, docs, claims, None, 0,
                          time.monotonic() - t0, cached=cached)
