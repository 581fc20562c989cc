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


def windowed_counts_stream(spark: SparkSession, landing_dir: str,
                           output_dir: str, window: str = "1 hour",
                           watermark: str = "2 hours",
                           max_files_per_trigger: int = 1) -> None:
    """Watermarked tumbling-window aggregation over an events stream
    (SURVEY.md §2.10 / task-brief late-data mandate).

    Append mode: a window is emitted exactly once, when the watermark
    (max event time seen so far minus `watermark`) passes its end —
    late rows beyond that are dropped, on-time rows accumulate in state.
    ``maxFilesPerTrigger=1`` makes each landing file a micro-batch, so
    the watermark advances deterministically file-by-file.
    """
    from pyspark.sql import functions as F

    schema = spark.read.parquet(landing_dir).schema
    checkpoint = os.path.join(output_dir, "_checkpoint")
    out_path = os.path.join(output_dir, "windowed")
    ev = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", str(max_files_per_trigger))
          .parquet(landing_dir))
    agg = (ev.withWatermark("ts", watermark)
           .groupBy(F.window("ts", window).alias("w"), "event_type")
           .agg(F.count("*").alias("n"))
           .select(F.unix_timestamp("w.start").alias("win_start"),
                   "event_type", "n"))
    q = (agg.writeStream.outputMode("append").format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def fold_session_events(ts: list[int],
                        state: tuple[int, int, int] | None,
                        gap_s: int) -> tuple[list[tuple[int, int, int]],
                                             tuple[int, int, int] | None]:
    """Pure per-user session fold: (sorted event seconds, carried state)
    → (closed sessions [(start, end, n_events)], new state).

    State = (session_start, last_ts, n_events). Late events
    (t < last_ts) are DROPPED — accepting one would regress last_ts and
    let the next on-time event falsely close the session (ADVICE r2).
    Extracted from the applyInPandasWithState operator so the fold is
    unit-testable without a streaming harness."""
    if not ts:
        # unreachable via applyInPandasWithState (groups always carry
        # rows) but this is a public pure function — an empty batch must
        # not index ts[0] (ADVICE r3)
        return [], state
    if state is None:
        start, last, n = ts[0], ts[0] - 1, 0  # sentinel: first row opens
    else:
        start, last, n = state
    closed: list[tuple[int, int, int]] = []
    for t in ts:
        if n and t < last:
            continue
        if n and t - last > gap_s:
            closed.append((start, last, n))
            start, n = t, 0
        last = t
        n += 1
    return closed, (start, last, n)


def sessionize_stream(spark: SparkSession, landing_dir: str,
                      output_dir: str, gap_s: int = 1800,
                      max_files_per_trigger: int = 1,
                      idle_timeout_ms: int | None = None) -> None:
    """Custom stateful streaming operator: gap-based sessionization via
    ``applyInPandasWithState`` (the task brief's named mechanism for
    operators Spark lacks built-in).

    State per user = (session_start, last_ts, n_events). A session is
    EMITTED when a gap > gap_s closes it; the trailing open session stays
    in state. ``idle_timeout_ms`` (continuous deployments only) flushes
    idle users' open sessions via ProcessingTimeTimeout — it must stay
    None under Trigger.AvailableNow, where a processing-time timeout
    makes the drain loop ("no new data but cleaning up state") run
    forever. Batch twin with a DuckDB oracle:
    __spark_entry__.q_sessionize_events.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = spark.read.parquet(landing_dir).schema
    checkpoint = os.path.join(output_dir, "_checkpoint")
    out_path = os.path.join(output_dir, "sessions")

    out_schema = ("user_id long, session_start long, session_end long, "
                  "n_events long")
    state_schema = "session_start long, last_ts long, n_events long"

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [user_id],
                                "session_start": [start],
                                "session_end": [last], "n_events": [n]})
            return
        ts = []
        for pdf in pdfs:
            ts.extend(int(t.timestamp()) for t in pdf["ts"])
        ts.sort()
        prev = tuple(state.get) if state.exists else None
        closed_sessions, new_state = fold_session_events(ts, prev, gap_s)
        state.update(new_state)
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if closed_sessions:
            yield pd.DataFrame({
                "user_id": [user_id] * len(closed_sessions),
                "session_start": [s[0] for s in closed_sessions],
                "session_end": [s[1] for s in closed_sessions],
                "n_events": [s[2] for s in closed_sessions]})

    ev = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", str(max_files_per_trigger))
          .parquet(landing_dir))
    timeout_conf = (GroupStateTimeout.ProcessingTimeTimeout
                    if idle_timeout_ms is not None
                    else GroupStateTimeout.NoTimeout)
    sessions = (ev.groupBy("user_id").applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf=timeout_conf))
    q = (sessions.writeStream.outputMode("append").format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def dedup_stream(spark: SparkSession, landing_dir: str,
                 output_dir: str, watermark: str = "2 hours",
                 max_files_per_trigger: int = 1) -> None:
    """Streaming EXACT dedup over a web_pages landing directory
    (training-data-pipeline mandate, streaming twin of the batch
    ``dedup_exact`` operator).

    fingerprint = md5 of the whitespace-normalized lowercased text when
    present (the batch dedup_exact contract), else md5 of the raw
    binary payload — computed natively, no UDF. Duplicate fingerprints
    arriving within the ``watermark`` horizon of each other are dropped
    by ``dropDuplicatesWithinWatermark`` (state expires with the
    watermark, so state size is bounded by the horizon's unique-doc
    count — the unbounded-state trap of plain dropDuplicates on an
    infinite stream is the reason this variant exists). First
    occurrence wins; keepers append to ``<output_dir>/keepers``.
    """
    from pyspark.sql import functions as F

    checkpoint = os.path.join(output_dir, "_checkpoint")
    out_path = os.path.join(output_dir, "keepers")
    stream = (spark.readStream.schema(WEB_PAGES)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(landing_dir))
    fingerprint = F.when(
        F.col("text").isNotNull(),
        F.md5(F.encode(F.lower(F.regexp_replace("text", r"\s+", " ")),
                       "UTF-8"))).otherwise(F.md5(F.col("html")))
    deduped = (stream.withColumn("fingerprint", fingerprint)
               .withWatermark("warc_ts", watermark)
               .dropDuplicatesWithinWatermark(["fingerprint"]))
    q = (deduped.writeStream.outputMode("append").format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()
