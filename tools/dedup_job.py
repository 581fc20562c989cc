"""User-facing dedup driver: near-duplicate clustering over a documents
parquet (the training-data-pipeline companion to verify_job.py).

    spark-submit --py-files engine.zip tools/dedup_job.py \
        <documents.parquet> <out_dir>

Stages: MinHash signatures (staged to parquet once — the pipeline-reuse
shape) → LSH banding pairs → connected components → keeper election.
Writes <out_dir>/verdict (doc_id, cluster_id, is_keeper) and prints a
one-line JSON summary.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from insurance_pdf_extractor_spark.dedup import (  # noqa: E402
    dedup_documents, lsh_band_overflow, lsh_pairs_from_signatures,
    minhash_signatures_from_docs)
from insurance_pdf_extractor_spark.session import get_spark  # noqa: E402

docs_path, out_dir = sys.argv[1], sys.argv[2]
spark = get_spark(app_name="dedup-job")
spark.sparkContext.setLogLevel("ERROR")
t0 = time.monotonic()

docs = spark.read.parquet(docs_path).select("doc_id", "text")
sig = minhash_signatures_from_docs(docs)
sig_path = os.path.join(out_dir, "_signatures")
sig.write.mode("overwrite").parquet(sig_path)          # staged ONCE
sig = spark.read.parquet(sig_path)
pairs = lsh_pairs_from_signatures(sig)
verdict = dedup_documents(docs.select("doc_id"), pairs)
verdict.write.mode("overwrite").parquet(os.path.join(out_dir, "verdict"))

v = spark.read.parquet(os.path.join(out_dir, "verdict"))
n_docs = v.count()
n_keep = v.where("is_keeper").count()
# hot band buckets the candidate join capped (silent caps read as
# "covered everything" — report what was dropped)
n_hot = lsh_band_overflow(sig).count()
print(json.dumps({"docs": n_docs, "keepers": n_keep,
                  "dupes_removed": n_docs - n_keep,
                  "hot_bands_dropped": n_hot,
                  "sec": round(time.monotonic() - t0, 1)}))
spark.stop()
