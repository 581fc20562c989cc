"""User-facing dedup driver: near-duplicate clustering over a documents
parquet (the training-data-pipeline companion to verify_job.py).

    spark-submit --py-files engine.zip tools/dedup_job.py \
        <documents.parquet> <out_dir>

Stages: MinHash signatures (staged to parquet once — the pipeline-reuse
shape) → LSH banding pairs → connected components → keeper election.
Writes <out_dir>/verdict (doc_id, cluster_id, is_keeper) and prints a
one-line JSON summary.

Signature-store maintenance modes (VERDICT r5 item 4) for pipeline
output dirs that use ``run_pipeline(..., dedup="minhash-lsh")``:

    tools/dedup_job.py --backfill-signatures <docs_table> <output_dir>

band an EXISTING committed docs table (url, text) once and append the
pre-banded rows to <output_dir>/signatures — closes the blind spot
where docs committed by non-dedup runs were invisible to later dedup
runs (their near-dups would sail through the cross-run probe). Urls
already present in the signature table are skipped, so the backfill is
idempotent and safe to run on a mixed-history dir. (Docs whose text is
too short to shingle produce no band rows and so are re-offered — and
re-skipped by the banding itself — on every backfill; the
``backfilled_docs`` count includes them.)

    tools/dedup_job.py --compact-signatures <output_dir>

full rewrite of <output_dir>/signatures into one file per band
partition. The pipeline already compacts each APPEND to one file per
band, but a table with thousands of runs still accretes one file per
band per run; periodic compaction restores O(bands) listing cost (at
the Iceberg tier this is `rewrite_data_files`). RECOVERABLE, not
atomic (ADVICE r6): the rewrite goes into `signatures_compact`, the
swap is two renames with the old table parked at
`signatures_precompact` — a crash between the renames leaves
`signatures/` absent, which a later run would read as "no history"
and silently lose all cross-run dedup. Both the next compaction and
the next `--backfill-signatures` therefore auto-restore the parked
copy before proceeding. Do NOT run pipeline appends concurrently
with a compaction: a delta appended between the initial read and the
swap is dropped by the rewrite (at the Iceberg tier both become one
optimistic-concurrency transaction and this caveat disappears).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from pyspark.sql import functions as F  # noqa: E402

from insurance_pdf_extractor_spark.dedup import (  # noqa: E402
    LSH_BANDS, _lsh_banded, dedup_documents, lsh_band_overflow,
    lsh_pairs_from_signatures, minhash_signatures_from_docs)
from insurance_pdf_extractor_spark.session import get_spark  # noqa: E402


def cluster_job(spark, docs_path: str, out_dir: str) -> dict:
    docs = spark.read.parquet(docs_path).select("doc_id", "text")
    sig = minhash_signatures_from_docs(docs)
    sig_path = os.path.join(out_dir, "_signatures")
    sig.write.mode("overwrite").parquet(sig_path)          # staged ONCE
    sig = spark.read.parquet(sig_path)
    pairs = lsh_pairs_from_signatures(sig)
    verdict = dedup_documents(docs.select("doc_id"), pairs)
    verdict.write.mode("overwrite").parquet(os.path.join(out_dir,
                                                         "verdict"))
    v = spark.read.parquet(os.path.join(out_dir, "verdict"))
    n_docs = v.count()
    n_keep = v.where("is_keeper").count()
    # hot band buckets the candidate join capped (silent caps read as
    # "covered everything" — report what was dropped)
    n_hot = lsh_band_overflow(sig).count()
    return {"docs": n_docs, "keepers": n_keep,
            "dupes_removed": n_docs - n_keep,
            "hot_bands_dropped": n_hot}


def _recover_half_swapped(spark, output_dir: str) -> bool:
    """Detect and repair a compaction that crashed mid-swap (ADVICE r6):
    ``signatures/`` absent but ``signatures_precompact/`` present means
    the old table was renamed away and the new one never landed —
    restore the parked copy so downstream reads see history instead of
    silently treating the store as empty. Returns True if it repaired."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    sig = Path(os.path.join(output_dir, "signatures"))
    old = Path(os.path.join(output_dir, "signatures_precompact"))
    fs = sig.getFileSystem(hconf)
    if not fs.exists(sig) and fs.exists(old):
        fs.rename(old, sig)
        return True
    return False


def backfill_signatures(spark, docs_path: str, output_dir: str) -> dict:
    """Band a committed docs table into <output_dir>/signatures once.
    Skips urls already banded (idempotent); same one-file-per-band
    compaction as the pipeline's own append. Auto-restores a
    half-swapped compaction first (see module doc)."""
    from insurance_pdf_extractor_spark.pipeline import (
        _read_table_if_exists)
    _recover_half_swapped(spark, output_dir)
    sig_path = os.path.join(output_dir, "signatures")
    docs = (spark.read.parquet(docs_path)
            .select(F.col("url").alias("doc_id"), "text"))
    existing = _read_table_if_exists(spark, sig_path)
    if existing is not None:               # absent-vs-corrupt aware
        docs = docs.join(existing.select("doc_id").distinct(),
                         "doc_id", "left_anti")
    docs = docs.localCheckpoint()          # count + band off one scan
    n_new = docs.count()
    if n_new:
        (_lsh_banded(minhash_signatures_from_docs(docs))
         .repartition(LSH_BANDS, "band_no")
         .write.mode("append").partitionBy("band_no").parquet(sig_path))
    return {"backfilled_docs": n_new, "signatures": sig_path}


def compact_signatures(spark, output_dir: str) -> dict:
    """Rewrite <output_dir>/signatures to one file per band partition.
    Recoverable, not atomic — see module doc; restores a previous
    half-swap before starting."""
    recovered = _recover_half_swapped(spark, output_dir)
    sig_path = os.path.join(output_dir, "signatures")
    tmp_path = os.path.join(output_dir, "signatures_compact")
    old_path = os.path.join(output_dir, "signatures_precompact")
    sig = spark.read.parquet(sig_path)
    n_rows = sig.count()
    (sig.repartition(LSH_BANDS, "band_no")
     .write.mode("overwrite").partitionBy("band_no").parquet(tmp_path))
    # swap via Hadoop FS renames (works on any storage the job writes)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(sig_path).getFileSystem(hconf)
    fs.delete(Path(old_path), True)
    fs.rename(Path(sig_path), Path(old_path))
    fs.rename(Path(tmp_path), Path(sig_path))
    fs.delete(Path(old_path), True)
    # file-count diagnostic through the same Hadoop FS (VERDICT r6 item
    # 7: os.walk sees nothing on object storage, and -1 here would read
    # as "compaction produced no files")
    n_files = 0
    stack = [Path(sig_path)]
    while stack:
        for st in fs.listStatus(stack.pop()):
            if st.isDirectory():
                stack.append(st.getPath())
            elif st.getPath().getName().endswith(".parquet"):
                n_files += 1
    return {"rows": n_rows, "data_files": n_files,
            "recovered_half_swap": recovered,
            "signatures": sig_path}


def main() -> None:
    spark = get_spark(app_name="dedup-job")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    if sys.argv[1] == "--backfill-signatures":
        out = backfill_signatures(spark, sys.argv[2], sys.argv[3])
    elif sys.argv[1] == "--compact-signatures":
        out = compact_signatures(spark, sys.argv[2])
    else:
        out = cluster_job(spark, sys.argv[1], sys.argv[2])
    out["sec"] = round(time.monotonic() - t0, 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
