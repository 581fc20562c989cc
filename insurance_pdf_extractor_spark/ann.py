"""Approximate nearest neighbour over an embedding column.

The registry's ``ann_ivf_bucketed`` query probes exactly ONE coarse
bucket (the query's own) — the minimal IVF shape. At corpus scale a
single probe misses neighbours that fall just across a bucket boundary;
the standard fix is MULTI-PROBE: rank buckets by centroid similarity to
the query and search the top ``n_probes``. All steps are native
DataFrame ops — centroids via posexplode + per-dimension avg (one
shuffle keyed (label, pos)), probe selection is a tiny driver-side
decision over #buckets rows (not #vectors), and the candidate scan is a
broadcast-pruned filter on the bucket key, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double")
                                 * y.cast("double")),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x.cast("double")
                                        * x.cast("double")),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x.cast("double")
                                        * x.cast("double")),
                            F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def bucket_centroids(emb: DataFrame, bucket_col: str = "label",
                     vec_col: str = "embedding") -> DataFrame:
    """(bucket, centroid array<double>): per-dimension mean via
    posexplode — one shuffle on (bucket, pos), reassembled in order."""
    ex = emb.select(F.col(bucket_col).alias("bucket"),
                    F.posexplode(vec_col).alias("pos", "v"))
    dims = (ex.groupBy("bucket", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m")))
    return (dims.groupBy("bucket")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m")))
                 .alias("s"))
            .select("bucket",
                    F.transform("s", lambda x: x["m"]).alias("centroid")))


def ann_multiprobe(emb: DataFrame, query_vec_id: int, k: int = 5,
                   n_probes: int = 2, bucket_col: str = "label",
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Top-k by cosine among the ``n_probes`` buckets whose centroids
    are nearest the query. Returns (vec_id, bucket, cosine)."""
    q = (emb.where(F.col(id_col) == query_vec_id)
         .select(F.col(vec_col).alias("q_emb")))
    cents = bucket_centroids(emb, bucket_col, vec_col)
    ranked = (cents.crossJoin(F.broadcast(q))
              .select("bucket",
                      _cosine(F.col("centroid"), F.col("q_emb"))
                      .alias("c_sim")))
    w = Window.orderBy(F.desc("c_sim"), F.asc("bucket"))
    probes = (ranked.withColumn("rn", F.row_number().over(w))
              .where(F.col("rn") <= n_probes).select("bucket"))
    cand = (emb.where(F.col(id_col) != query_vec_id)
            .join(F.broadcast(probes),
                  emb[bucket_col] == probes.bucket, "left_semi"))
    return (cand.crossJoin(F.broadcast(q))
            .select(F.col(id_col).alias("vec_id"),
                    F.col(bucket_col).alias("bucket"),
                    F.round(_cosine(F.col(vec_col), F.col("q_emb")), 4)
                     .alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(k))
