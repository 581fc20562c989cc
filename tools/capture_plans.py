"""Capture .explain('formatted') output for a set of declared queries and
bench-path operators into plans/<tag>/<name>_<suffix>.txt (optimization-round
evidence; the judge checks plan claims against these files).

Usage: python tools/capture_plans.py <tag> <suffix> [sf_dir] [only...]
e.g.   python tools/capture_plans.py r08 before /root/testdata/sf1.0
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r08"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf1.0"
    only = set(sys.argv[4:])

    import __spark_entry__ as E
    from pyspark.sql import functions as F
    from insurance_pdf_extractor_spark.session import get_spark
    spark = get_spark(app_name="plan-capture", master="local[4]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()

    # bench-path operator plans (the bench.py entries that call library
    # functions directly; same inputs as bench.py uses)
    def decontaminate_full(spark, sf):
        from insurance_pdf_extractor_spark.scrub import ngram_overlap_stats
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet")) \
            .select("doc_id", "text")
        ref = docs.where(F.col("doc_id") % 50 == 0).select("text")
        return ngram_overlap_stats(docs, ref, n=13)

    def substr_dedup_full(spark, sf):
        from insurance_pdf_extractor_spark.dedup import dedup_substrings
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet")) \
            .select("doc_id", "text")
        return dedup_substrings(docs, k=10).select(
            "doc_id", "words_removed", "spans_removed")

    def lm_ppl_full(spark, sf):
        from insurance_pdf_extractor_spark.lm import (
            ppl_buckets, unigram_doc_scores, unigram_fit)
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet")) \
            .select("doc_id", "text")
        model = unigram_fit(docs, vocab_size=65536)
        return ppl_buckets(unigram_doc_scores(docs, model))

    def gopher_keepers_full(spark, sf):
        from insurance_pdf_extractor_spark.scrub import (
            gopher_repetition_keepers)
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet")) \
            .select("doc_id", "text")
        return gopher_repetition_keepers(docs)

    targets = {
        "scrub_ops": qs["scrub_ops"],
        "decontaminate": qs["decontaminate"],
        "minhash_signatures": qs["minhash_signatures"],
        "lsh_band_pairs": qs["lsh_band_pairs"],
        "simhash64": qs["simhash64"],
        "ngram_jaccard_pairs": qs["ngram_jaccard_pairs"],
        "substring_dedup": qs["substring_dedup"],
        "lm_perplexity": qs["lm_perplexity"],
        "ann_topk": qs["ann_topk"],
        "doc_signals": qs["doc_signals"],
        "decontaminate_full": decontaminate_full,
        "substr_dedup_full": substr_dedup_full,
        "lm_ppl_full": lm_ppl_full,
        "gopher_keepers_full": gopher_keepers_full,
    }
    out_dir = os.path.join(os.path.dirname(__file__), "..", "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name, fn in targets.items():
        if only and name not in only:
            continue
        try:
            plan = _formatted(fn(spark, sf_dir))
        except Exception as exc:   # capture what we can, report the rest
            plan = f"ERROR capturing plan: {exc!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
