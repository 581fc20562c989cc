"""Multi-probe IVF ANN (insurance_pdf_extractor_spark/ann.py)."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _brute_topk(spark, emb, qid, k):
    from insurance_pdf_extractor_spark.ann import _cosine
    q = (emb.where(F.col("vec_id") == qid)
         .select(F.col("embedding").alias("q_emb")))
    return [r["vec_id"] for r in
            (emb.where(F.col("vec_id") != qid)
             .crossJoin(F.broadcast(q))
             .select("vec_id",
                     F.round(_cosine(F.col("embedding"), F.col("q_emb")),
                             4).alias("cosine"))
             .orderBy(F.desc("cosine"), F.asc("vec_id"))
             .limit(k).collect())]


class TestMultiProbeANN:
    def test_centroids_shape(self, spark):
        from insurance_pdf_extractor_spark.ann import bucket_centroids
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        dim = len(emb.first()["embedding"])
        cents = bucket_centroids(emb).collect()
        n_buckets = emb.select("label").distinct().count()
        assert len(cents) == n_buckets
        assert all(len(r["centroid"]) == dim for r in cents)

    def test_more_probes_monotone_recall(self, spark):
        """Recall@5 vs brute force never drops as probes grow, and at
        all-buckets probing it is exact."""
        from insurance_pdf_extractor_spark.ann import ann_multiprobe
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        truth = set(_brute_topk(spark, emb, qid=0, k=5))
        n_buckets = emb.select("label").distinct().count()
        last = -1.0
        for probes in (1, 2, n_buckets):
            got = {r["vec_id"] for r in
                   ann_multiprobe(emb, 0, k=5, n_probes=probes).collect()}
            recall = len(got & truth) / len(truth)
            assert recall >= last
            last = recall
        assert last == 1.0  # probing every bucket == brute force

    def test_single_probe_matches_registry_ivf(self, spark):
        """n_probes=1 with the query's own bucket ranked first must
        contain the registry ivf query's results when the query bucket
        IS the nearest centroid bucket."""
        import __spark_entry__ as E
        from insurance_pdf_extractor_spark.ann import ann_multiprobe
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        q_label = emb.where(F.col("vec_id") == 0).first()["label"]
        got = ann_multiprobe(emb, 0, k=5, n_probes=1).collect()
        probe_bucket = {r["bucket"] for r in got}
        if probe_bucket == {q_label}:
            ivf = {r["vec_id"]
                   for r in E.q_ann_ivf_bucketed(spark, SF).collect()}
            assert {r["vec_id"] for r in got} == ivf
