"""User-facing ANN driver: train IVF coarse centroids and answer a
top-k query over an embeddings parquet (the similarity-search companion
to verify_job.py / dedup_job.py).

    spark-submit --py-files engine.zip tools/ann_job.py \
        <embeddings.parquet> <query_vec_id> [k] [n_probes] [n_clusters]

Stages: k-means training (driver-loop of native DataFrame steps) →
bucket assignment (broadcast argmin) → multi-probe candidate scan →
exact cosine top-k. Prints one JSON line with the trained inertia
history and the top-k neighbours.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from insurance_pdf_extractor_spark.ann import (  # noqa: E402
    ann_multiprobe, assign_buckets, kmeans_train, pq_topk, pq_train)
from insurance_pdf_extractor_spark.session import get_spark  # noqa: E402

emb_path = sys.argv[1]
query_id = int(sys.argv[2])
k = int(sys.argv[3]) if len(sys.argv) > 3 else 5
n_probes = int(sys.argv[4]) if len(sys.argv) > 4 else 2
n_clusters = int(sys.argv[5]) if len(sys.argv) > 5 else 8

spark = get_spark(app_name="ann-job")
spark.sparkContext.setLogLevel("ERROR")
t0 = time.monotonic()

emb = spark.read.parquet(emb_path)
cents, inertia = kmeans_train(emb, k=n_clusters, max_iter=10)
bucketed = assign_buckets(emb, cents)
top = ann_multiprobe(bucketed, query_id, k=k, n_probes=n_probes,
                     bucket_col="bucket").collect()

# PQ companion: 16x16 codebooks (64 bits/vector), asymmetric-distance
# top-k over codes — the bytes-not-floats scan an IVF-PQ index runs
books = pq_train(emb, m=16, k=16, max_iter=4)
pq = pq_topk(emb, books, query_id, k=k, m=16).collect()

print(json.dumps({
    "query_vec_id": query_id, "k": k, "n_probes": n_probes,
    "n_clusters": n_clusters,
    "kmeans_iters": len(inertia),
    "inertia": [round(x, 2) for x in inertia],
    "neighbours": [{"vec_id": r["vec_id"], "cosine": r["cosine"]}
                   for r in top],
    "pq_neighbours": [{"vec_id": r["vec_id"],
                       "approx_dist": r["approx_dist"]} for r in pq],
    "sec": round(time.monotonic() - t0, 1)}))
spark.stop()
