"""Run the extraction pipeline at a given parallelism and print one JSON
line.

Invoked by tools/scaling_bench.py in a fresh subprocess per parallelism
level (a SparkSession's master can't change in-process).

Usage: python tools/scaling_worker.py <spec> <n_docs>
  spec = "8"    → local[8]            (thread mode: one shared JVM)
  spec = "4x8"  → local-cluster[4,8]  (executor mode: 4 SEPARATE
                  executor JVMs × 8 cores — the shape the north_rule
                  names: N vs 4N *executors*. Thread mode makes all 4N
                  task slots share one JVM's GC/locks, a local-mode
                  artifact no real cluster has.)
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, ROOT)

from bench import ensure_fixture_corpus  # noqa: E402
from insurance_pdf_extractor_spark.pipeline import run_pipeline  # noqa: E402
from insurance_pdf_extractor_spark.session import get_spark  # noqa: E402


def main() -> None:
    spec = sys.argv[1]
    n_docs = int(sys.argv[2])
    path = ensure_fixture_corpus(n_docs)

    if "x" in spec:
        n_exec, per_exec = (int(v) for v in spec.split("x"))
        cores = n_exec * per_exec
        import pyspark
        os.environ.setdefault("SPARK_HOME",
                              os.path.dirname(pyspark.__file__))
        spark = get_spark(
            app_name=f"scaling-{spec}",
            master=f"local-cluster[{n_exec},{per_exec},8192]",
            shuffle_partitions=cores,
            extra={"spark.executor.memory": "8g",
                   # executor python workers must import the engine
                   "spark.executorEnv.PYTHONPATH": os.path.abspath(ROOT)})
    else:
        cores = int(spec)
        spark = get_spark(app_name=f"scaling-{cores}",
                          master=f"local[{cores}]",
                          shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    web = spark.read.parquet(path)

    # Warmup must reach EVERY core's Python worker: a limit() warmup only
    # starts a few workers and the first real run then pays a 32-wide
    # import storm inside the measured window. Full-width dummy pass:
    def _import_engine(batches):
        import insurance_pdf_extractor_spark.textops    # noqa: F401
        import insurance_pdf_extractor_spark.fields     # noqa: F401
        yield from batches

    (spark.range(0, cores * 64, numPartitions=cores * 4)
          .mapInPandas(_import_engine, schema="id long").count())
    # FULL-SIZE uncounted warmup run: executor JVMs JIT the parquet/
    # shuffle/Arrow hot paths only under real load — a limit() warmup
    # left the first executor-mode timed run 2-4x cold (measured
    # 107.9 s vs 20.2 s steady at 4x8)
    run_pipeline(spark, web, output_dir=None, resume=False,
                 num_partitions=cores * 2, repartition="always",
                 cache_intermediate=False).claims.count()

    # three timed runs; report the steady-state (best) one — at the
    # target scale the job runs for hours, so amortized-startup
    # throughput is the honest number. All runs are reported alongside.
    times = []
    n = 0
    for _ in range(3):
        spark.catalog.clearCache()  # identical plans must not reuse cache
        t0 = time.monotonic()
        # cache off + claims action = exactly ONE execution of the UDF
        # stage per timed run (docs.count() would branch the plan twice;
        # persisting the fat intermediate at this size spills)
        res = run_pipeline(spark, web, output_dir=None, resume=False,
                           num_partitions=cores * 2,
                           repartition="always",
                           cache_intermediate=False)
        n = res.claims.count() and web.count()
        times.append(time.monotonic() - t0)
    dt = min(times)
    print(json.dumps({"cores": cores, "docs": n, "sec": round(dt, 3),
                      "docs_per_sec": round(n / dt, 2),
                      "all_runs_sec": [round(t, 3) for t in times]}))
    spark.stop()


if __name__ == "__main__":
    main()
