"""Extra benchmark entries for optimization work (bench.py is FROZEN for
measurement — guide §1.4 isolation lives here).

Times individual operators at $SPARK_GRAFT_SF_DIR with the same min-of-2
count() methodology bench.py uses (so numbers are comparable with the
driver artifact), and optionally with a noop sink (--noop) so the
computation is timed with every column materialized and no count-prune.

Usage: python bench_extra.py [--noop] [only...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    use_noop = "--noop" in sys.argv
    only = {a for a in sys.argv[1:] if not a.startswith("--")}

    from pyspark.sql import functions as F
    from insurance_pdf_extractor_spark.session import get_spark
    spark = get_spark(app_name="bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    def docs():
        return (spark.read.parquet(os.path.join(sf_dir,
                                                "documents.parquet"))
                .select("doc_id", "text"))

    def emb():
        return spark.read.parquet(os.path.join(sf_dir,
                                               "embeddings.parquet"))

    def decontaminate_full(_):
        from insurance_pdf_extractor_spark.scrub import ngram_overlap_stats
        d = docs()
        ref = d.where(F.col("doc_id") % 50 == 0).select("text")
        return ngram_overlap_stats(d, ref, n=13)

    def gopher_keepers_full(_):
        from insurance_pdf_extractor_spark.scrub import (
            gopher_repetition_keepers)
        return gopher_repetition_keepers(docs())

    def gopher_stats_full(_):
        from insurance_pdf_extractor_spark.scrub import (
            gopher_repetition_stats)
        return gopher_repetition_stats(docs())

    def substr_dedup_full(_):
        from insurance_pdf_extractor_spark.dedup import dedup_substrings
        return dedup_substrings(docs(), k=10).select(
            "doc_id", "words_removed", "spans_removed")

    def lm_ppl_full(_):
        from insurance_pdf_extractor_spark.lm import (
            ppl_buckets, unigram_doc_scores, unigram_fit)
        d = docs()
        model = unigram_fit(d, vocab_size=65536)
        return ppl_buckets(unigram_doc_scores(d, model))

    def paragraph_dedup_full(_):
        from insurance_pdf_extractor_spark.dedup import dedup_paragraphs
        return dedup_paragraphs(docs()).select(
            "doc_id", "paras_total", "paras_dropped")

    def minhash_full(_):
        from insurance_pdf_extractor_spark.dedup import (
            minhash_signatures_from_docs)
        return minhash_signatures_from_docs(docs())

    def ann_trained(_):
        from insurance_pdf_extractor_spark.ann import ann_multiprobe_trained
        return ann_multiprobe_trained(emb(), 0, k=5, n_probes=2,
                                      n_clusters=8, max_iter=3)

    import __spark_entry__ as E
    qs = E.queries()

    entries = {
        "decontaminate_full": decontaminate_full,
        "gopher_keepers_full": gopher_keepers_full,
        "gopher_stats_full": gopher_stats_full,
        "substr_dedup_full": substr_dedup_full,
        "lm_ppl_full": lm_ppl_full,
        "paragraph_dedup_full": paragraph_dedup_full,
        "minhash_full": minhash_full,
        "ann_multiprobe_trained": ann_trained,
        "q_minhash_signatures": lambda _, f=qs["minhash_signatures"]:
            f(spark, sf_dir),
        "q_lsh_band_pairs": lambda _, f=qs["lsh_band_pairs"]:
            f(spark, sf_dir),
        "q_simhash64": lambda _, f=qs["simhash64"]: f(spark, sf_dir),
        "q_ngram_jaccard_pairs": lambda _, f=qs["ngram_jaccard_pairs"]:
            f(spark, sf_dir),
        "q_scrub_ops": lambda _, f=qs["scrub_ops"]: f(spark, sf_dir),
        "q_substring_dedup": lambda _, f=qs["substring_dedup"]:
            f(spark, sf_dir),
        "q_lm_perplexity": lambda _, f=qs["lm_perplexity"]:
            f(spark, sf_dir),
        "q_decontaminate": lambda _, f=qs["decontaminate"]:
            f(spark, sf_dir),
    }
    timings = {}
    for name, fn in entries.items():
        if only and name not in only:
            continue
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            df = fn(sf_dir)
            if use_noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"{name:28s} {best:8.3f}s", file=sys.stderr)
    try:
        with open("/proc/loadavg") as f:
            la = float(f.read().split()[0])
    except OSError:
        la = None
    print(json.dumps({"sf_dir": sf_dir, "noop": use_noop,
                      "loadavg": la, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
