"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

The flagship numbers are the extraction-pipeline queries (docs/sec is the
north-star metric from BASELINE.json); relational/dedup/similarity
queries ride along so regressions anywhere in the operator inventory show
up per-round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FIXTURE_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
CACHE_DIR = "/tmp/spark_graft_bench"

#: quiet-window gate (VERDICT r4 item 2 — the r4 artifact of record was
#: taken at loadavg 17 and unusable): block until the host calms down,
#: and stamp the artifact with the loadavg it actually started at.
QUIET_MAX = float(os.environ.get("SPARK_GRAFT_QUIET_THRESHOLD", "3.0"))
QUIET_WAIT = float(os.environ.get("SPARK_GRAFT_QUIET_WAIT", "900"))


def _loadavg() -> float | None:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:
        return None


def _cpu_busy_ticks() -> int | None:
    """Host-wide non-idle jiffies (all CPUs) — /proc/stat counts every
    process on the box, so (delta busy / delta wall) well above our own
    core count is direct evidence of neighbor activity INSIDE a query's
    timed window (VERDICT r5 item 7: one loadavg per artifact couldn't
    attribute which entries got hit; the r5 run started at 2.78 and
    ended at 13.18)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0)  # idle+iowait
        return sum(vals) - idle
    except (OSError, ValueError, IndexError):
        return None


def wait_quiet() -> tuple[float | None, bool]:
    """Block until 1-min loadavg < QUIET_MAX or QUIET_WAIT elapses.
    Returns (loadavg at release, whether the gate was satisfied)."""
    t0 = time.monotonic()
    la = _loadavg()
    while la is not None and la >= QUIET_MAX:
        if time.monotonic() - t0 > QUIET_WAIT:
            print(f"WARNING: benching at loadavg {la} after waiting "
                  f"{QUIET_WAIT:.0f}s", file=sys.stderr)
            return la, False
        time.sleep(15)
        la = _loadavg()
    return la, la is not None and la < QUIET_MAX


def _gen_fingerprint() -> str:
    """Content hash of the fixture generator: a cached corpus written by
    OLD generator code must not silently feed new-code benchmarks
    (code-review r3 finding — the r2 cache had no amtrust/homestates
    docs)."""
    import hashlib

    from insurance_pdf_extractor_spark import fixtures
    from insurance_pdf_extractor_spark.pdf import writer
    h = hashlib.md5()
    # fixture bytes depend on BOTH the generator and the PDF writer it
    # calls (ADVICE r3: a writer change must also invalidate the cache)
    for mod in (fixtures, writer):
        with open(mod.__file__, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:10]


def ensure_fixture_corpus(n_docs: int) -> str:
    """Deterministic mixed-class web_pages parquet, cached across runs;
    cache key includes the generator-code fingerprint."""
    path = os.path.join(
        CACHE_DIR, f"web_pages_{n_docs}_{_gen_fingerprint()}.parquet")
    if not os.path.exists(path):
        os.makedirs(CACHE_DIR, exist_ok=True)
        from insurance_pdf_extractor_spark.fixtures import (
            write_web_pages_parquet)
        write_web_pages_parquet(path, n_docs, seed=42)
    return path


def ensure_skewed_corpus(n_small: int = 6000, n_giant: int = 4,
                         giant_pages: int = 300) -> str:
    """Heavy-tail corpus: a few ~300-page giants among 1-2-page docs
    (r2 verdict stretch — the size-skew path must show up in the bench
    artifact, not just a pytest). Per-doc granularity is the floor; the
    hash repartition spreads everything else around the giants."""
    path = os.path.join(
        CACHE_DIR,
        f"web_pages_skewed_{n_small}_{n_giant}_{_gen_fingerprint()}"
        ".parquet")
    if not os.path.exists(path):
        os.makedirs(CACHE_DIR, exist_ok=True)
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from insurance_pdf_extractor_spark.fixtures import generate_rows
        from insurance_pdf_extractor_spark.pdf.writer import PDFWriter
        rows = generate_rows(n_small, seed=42)
        for g in range(n_giant):
            w = PDFWriter()
            for p in range(giant_pages):
                pg = w.add_page()
                pg.text(50, 40, f"Giant document {g} page {p + 1} with "
                                "enough readable text to stay on the "
                                "digital extraction path.")
            rows.append({"url": f"https://fixture.test/giant/{g}",
                         "warc_ts": dt.datetime(2024, 1, 1),
                         "html": w.tobytes(), "text": None, "lang": "en"})
        table = pa.table({
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows],
                                pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        })
        pq.write_table(table, path, row_group_size=256)
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) \
        if "sf" in sf_dir else 0.0

    import __spark_entry__ as E
    from pyspark.sql import functions as F
    from insurance_pdf_extractor_spark.pipeline import run_pipeline
    from insurance_pdf_extractor_spark.session import get_spark

    fixture_path = ensure_fixture_corpus(FIXTURE_DOCS)

    loadavg_start, quiet = wait_quiet()

    spark = get_spark(app_name="bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    def extract_fixtures(spark, sf_dir):
        web = spark.read.parquet(fixture_path)
        return run_pipeline(spark, web, output_dir=None, resume=False).docs

    def extract_html_docs(spark, sf_dir):
        web = E._web_pages_from_documents(spark, sf_dir)
        return run_pipeline(spark, web, output_dir=None, resume=False).docs

    skewed_path = ensure_skewed_corpus()

    def extract_skewed(spark, sf_dir):
        web = spark.read.parquet(skewed_path)
        return run_pipeline(spark, web, output_dir=None, resume=False).docs

    # staged-signature LSH: in pipeline use the MinHash signature table
    # is materialized once (the staged-intermediate pattern from
    # pipeline.py) and banding reads it — this entry times the banding
    # join alone; `lsh_band_pairs` still times the self-contained plan
    import hashlib
    import inspect
    sig_code = hashlib.md5(
        (inspect.getsource(E.q_minhash_signatures)
         + inspect.getsource(E.minhash_signatures_from_docs)
         + inspect.getsource(E._hex32)
         + inspect.getsource(E._shingles)
         + f"{E.MINHASH_PERMS}:{E._MH_PRIME}").encode()).hexdigest()[:10]
    sig_staging = os.path.join(
        CACHE_DIR, "minhash_sig_" + sf_dir.strip("/").replace("/", "_")
        + "_" + sig_code)

    def lsh_staged(spark, sf_dir):
        if not os.path.exists(os.path.join(sig_staging, "_SUCCESS")):
            E.q_minhash_signatures(spark, sf_dir).write.mode(
                "overwrite").parquet(sig_staging)
        return E.lsh_pairs_from_signatures(
            spark.read.parquet(sig_staging))

    # r3 operators previously untimed (VERDICT r3 item 7): simhash
    # pairing, clustering + keeper election, trained multiprobe ANN,
    # media derivatives, and the pipeline's opt-in staged dedup pass
    from insurance_pdf_extractor_spark.dedup import (
        dedup_documents, simhash_near_pairs)

    sim_code = hashlib.md5(
        inspect.getsource(E.simhash64_from_docs).encode()).hexdigest()[:10]
    sim_staging = os.path.join(
        CACHE_DIR, "simhash_sig_" + sf_dir.strip("/").replace("/", "_")
        + "_" + sim_code)

    def simhash_sigs(spark):
        """Full-corpus 64-bit signatures, staged once (pipeline shape)."""
        if not os.path.exists(os.path.join(sim_staging, "_SUCCESS")):
            E.simhash64_from_docs(
                spark.read.parquet(os.path.join(sf_dir,
                                                "documents.parquet"))
                .select("doc_id", "text")).write.mode(
                "overwrite").parquet(sim_staging)
        return spark.read.parquet(sim_staging)

    def simhash_pairs(spark, sf_dir):
        return simhash_near_pairs(simhash_sigs(spark))

    def dedup_cluster(spark, sf_dir):
        """Connected components + keeper election over the staged LSH
        candidate pairs (the stage after lsh_band_pairs_staged)."""
        sig = spark.read.parquet(sig_staging)
        pairs = E.lsh_pairs_from_signatures(sig)
        return dedup_documents(sig.select("doc_id"), pairs)

    def ann_trained(spark, sf_dir):
        from insurance_pdf_extractor_spark.ann import (
            ann_multiprobe_trained)
        emb = spark.read.parquet(os.path.join(sf_dir,
                                              "embeddings.parquet"))
        return ann_multiprobe_trained(emb, 0, k=5, n_probes=2,
                                      n_clusters=8, max_iter=3)

    def media_derivatives(spark, sf_dir):
        from insurance_pdf_extractor_spark.multimodal import (
            extract_media_derivatives)
        web = spark.read.parquet(fixture_path)
        return extract_media_derivatives(web)

    def pipeline_dedup_pass(spark, sf_dir):
        """Full extract + the opt-in minhash-lsh keeper filter. NOT an
        extract_ entry: dedup drops rows by design, which would skew the
        headline docs/sec comparability."""
        web = spark.read.parquet(fixture_path)
        res = run_pipeline(spark, web, output_dir=None, resume=False,
                           dedup="minhash-lsh")
        return res.docs.select("url")

    def pipeline_quality_pass(spark, sf_dir):
        """Extraction + the quality_min training-data gate (VERDICT r4
        item 7 — shipped untimed). Same html corpus as
        extract_html_docs so the gate's marginal cost is readable."""
        web = E._web_pages_from_documents(spark, sf_dir)
        res = run_pipeline(spark, web, output_dir=None, resume=False,
                           quality_min=0.7)
        return res.docs.select("url")

    def pipeline_scrub_pass(spark, sf_dir):
        """Extraction + the r7 CCNet text-quality chain (paragraph
        dedup → Gopher repetition gate → PII scrub), minhash dedup OFF
        so the chain's own marginal cost vs extract_html_docs is
        readable (dedup's cost is pipeline_dedup_pass's job). VERDICT
        r6 item 8."""
        web = E._web_pages_from_documents(spark, sf_dir)
        res = run_pipeline(spark, web, output_dir=None, resume=False,
                           paragraph_dedup=True, repetition_filter=True,
                           scrub=True)
        return res.docs.select("url")

    def substr_dedup_full(spark, sf_dir):
        """r7: exact duplicated-substring removal (Lee et al.) over the
        FULL sf documents table — the corpus-wide window hash agg +
        coverage join at bench scale (the registry row grades a slice;
        this times the whole corpus)."""
        from insurance_pdf_extractor_spark.dedup import dedup_substrings
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")) \
            .select("doc_id", "text")
        return dedup_substrings(docs, k=10).select(
            "doc_id", "words_removed", "spans_removed")

    def lm_ppl_full(spark, sf_dir):
        """r7: unigram-LM fit + perplexity scoring + CCNet terciles
        over the FULL sf documents table (fit agg + broadcast-vocab
        scoring at bench scale)."""
        from insurance_pdf_extractor_spark.lm import (
            ppl_buckets, unigram_doc_scores, unigram_fit)
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")) \
            .select("doc_id", "text")
        model = unigram_fit(docs, vocab_size=65536)
        return ppl_buckets(unigram_doc_scores(docs, model))

    def decontaminate_full(spark, sf_dir):
        """r7: eval-set decontamination over the FULL sf documents
        table (ref = every 50th doc's text, broadcast as distinct
        13-gram hashes — the training side's only exchange is the
        per-doc agg)."""
        from insurance_pdf_extractor_spark.scrub import (
            ngram_overlap_stats)
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")) \
            .select("doc_id", "text")
        ref = docs.where(F.col("doc_id") % 50 == 0).select("text")
        return ngram_overlap_stats(docs, ref, n=13)

    # IVF-PQ: build staged once (the index is a persisted artifact by
    # design); the timed entry is the QUERY phase over stored codes
    from insurance_pdf_extractor_spark import ann as _ann_mod
    ann_code = hashlib.md5(
        open(_ann_mod.__file__, "rb").read()).hexdigest()[:10]
    ivf_staging = os.path.join(
        CACHE_DIR, "ivfpq_" + sf_dir.strip("/").replace("/", "_")
        + "_" + ann_code)

    def ivfpq_stage(spark) -> list:
        qv_path = os.path.join(ivf_staging, "qvec.json")
        if not os.path.exists(qv_path):
            from insurance_pdf_extractor_spark.ann import ivfpq_build
            emb = spark.read.parquet(
                os.path.join(sf_dir, "embeddings.parquet"))
            cents, books, index = ivfpq_build(
                emb, n_clusters=8, m=16, k=16, kmeans_iter=3, pq_iter=3)
            index.write.mode("overwrite").partitionBy("bucket").parquet(
                os.path.join(ivf_staging, "codes"))
            cents.write.mode("overwrite").parquet(
                os.path.join(ivf_staging, "centroids"))
            books.write.mode("overwrite").parquet(
                os.path.join(ivf_staging, "codebooks"))
            q_vec = [float(x) for x in emb.where(
                F.col("vec_id") == 0).first()["embedding"]]
            with open(qv_path, "w") as f:
                json.dump(q_vec, f)
        with open(qv_path) as f:
            return json.load(f)

    def ivfpq_query(spark, sf_dir):
        """Multi-probe ADC top-10 served from the STORED index — reads
        codes in the probed buckets only, no vectors, no encoding."""
        from insurance_pdf_extractor_spark.ann import ivfpq_topk
        q_vec = ivfpq_stage(spark)
        stored = spark.read.parquet(os.path.join(ivf_staging, "codes"))
        cents = spark.read.parquet(os.path.join(ivf_staging, "centroids"))
        books = spark.read.parquet(os.path.join(ivf_staging, "codebooks"))
        return ivfpq_topk(stored.where(F.col("vec_id") != 0), cents,
                          books, q_vec, k=10, n_probes=2)

    # cross-run dedup delta probe: committed history at 1x/2x/3x, SAME
    # delta — the three timings must stay flat as history grows
    # (VERDICT r4 item 1's bench criterion). History rows are the
    # pre-banded (doc_id, band_no, bh) table the pipeline commits.
    from insurance_pdf_extractor_spark.dedup import (
        _lsh_banded, minhash_signatures_from_docs)
    from insurance_pdf_extractor_spark.pipeline import (
        _probe_committed_collisions)
    dedup_code = hashlib.md5(open(
        os.path.join(os.path.dirname(_ann_mod.__file__),
                     "dedup.py"), "rb").read()).hexdigest()[:10]
    probe_staging = os.path.join(
        CACHE_DIR, "crossrun_" + sf_dir.strip("/").replace("/", "_")
        + "_" + dedup_code)

    def crossrun_stage(spark) -> None:
        if os.path.exists(os.path.join(probe_staging, "delta",
                                       "_SUCCESS")):
            return
        docs = (spark.read.parquet(
                    os.path.join(sf_dir, "documents.parquet"))
                .select(F.col("doc_id").cast("string").alias("doc_id"),
                        "text"))
        banded = _lsh_banded(minhash_signatures_from_docs(docs))
        banded = banded.localCheckpoint()
        for mult in (1, 2, 3):
            hist = banded
            for i in range(1, mult):
                hist = hist.unionByName(banded.withColumn(
                    "doc_id", F.concat(F.lit(f"r{i}:"),
                                       F.col("doc_id"))))
            hist.write.mode("overwrite").partitionBy("band_no").parquet(
                os.path.join(probe_staging, f"hist{mult}"))
        delta_docs = docs.where(
            F.col("doc_id").cast("long") < 500).withColumn(
            "doc_id", F.concat(F.lit("delta:"), F.col("doc_id")))
        _lsh_banded(minhash_signatures_from_docs(delta_docs)).write.mode(
            "overwrite").parquet(os.path.join(probe_staging, "delta"))

    def _crossrun_probe(mult):
        def fn(spark, sf_dir):
            delta = spark.read.parquet(
                os.path.join(probe_staging, "delta"))
            hist = spark.read.parquet(
                os.path.join(probe_staging, f"hist{mult}"))
            return _probe_committed_collisions(delta, hist)
        return fn

    # streaming exact-dedup drain (AvailableNow): fresh checkpoint per
    # run so each timing covers the full landing-dir drain
    stream_landing = os.path.join(
        CACHE_DIR, f"stream_landing_{_gen_fingerprint()}.parquet")

    def stream_stage(spark) -> None:
        if not os.path.exists(os.path.join(stream_landing, "_SUCCESS")):
            (spark.read.parquet(fixture_path).limit(4000)
             .repartition(16)
             .write.mode("overwrite").parquet(stream_landing))

    def dedup_stream_drain(spark, sf_dir):
        import tempfile

        from insurance_pdf_extractor_spark.streaming import dedup_stream
        out = tempfile.mkdtemp(prefix="bench_stream_")
        dedup_stream(spark, stream_landing, out, watermark="365 days",
                     max_files_per_trigger=8)
        return spark.read.parquet(os.path.join(out, "keepers"))

    qs = E.queries()
    bench_queries = {
        "extract_fixtures": extract_fixtures,
        "extract_html_docs": extract_html_docs,
        # "skew_" prefix on purpose: timed and recorded, but NOT folded
        # into extract_docs_per_sec (a giant-doc corpus has a lower
        # docs/s by construction — folding it in would break the
        # headline metric's round-over-round comparability)
        "skew_extract_giants": extract_skewed,
        "pricing_summary": qs["pricing_summary"],
        "top1_line_per_order": qs["top1_line_per_order"],
        "event_window_ops": qs["event_window_ops"],
        "revenue_by_parttype": qs["revenue_by_parttype"],
        "topk_orders": qs["topk_orders"],
        "doc_stats": qs["doc_stats"],
        "dedup_exact": qs["dedup_exact"],
        "minhash_signatures": qs["minhash_signatures"],
        "ngram_jaccard_pairs": qs["ngram_jaccard_pairs"],
        "simhash64": qs["simhash64"],
        "lsh_band_pairs": qs["lsh_band_pairs"],
        "lsh_band_pairs_staged": lsh_staged,
        "simhash_near_pairs": simhash_pairs,
        "dedup_cluster": dedup_cluster,
        "pipeline_dedup_pass": pipeline_dedup_pass,
        "ann_topk": qs["ann_topk"],
        "ann_multiprobe_trained": ann_trained,
        "media_derivatives": media_derivatives,
        # r5: previously-untimed surfaces (VERDICT r4 items 1/4/7)
        "pipeline_quality_pass": pipeline_quality_pass,
        # r7: the wired CCNet chain (VERDICT r6 items 1/8)
        "pipeline_scrub_pass": pipeline_scrub_pass,
        "substr_dedup_full": substr_dedup_full,
        "lm_ppl_full": lm_ppl_full,
        "decontaminate_full": decontaminate_full,
        "ivfpq_topk": ivfpq_query,
        "crossrun_probe_h1": _crossrun_probe(1),
        "crossrun_probe_h2": _crossrun_probe(2),
        "crossrun_probe_h3": _crossrun_probe(3),
        "dedup_stream_drain": dedup_stream_drain,
    }

    # JVM/python-worker warmup so per-query numbers measure the queries;
    # the signature staging writes also happen here, outside any timing
    extract_fixtures(spark, sf_dir).limit(1).count()
    lsh_staged(spark, sf_dir).limit(1).count()
    simhash_pairs(spark, sf_dir).limit(1).count()
    ivfpq_stage(spark)
    crossrun_stage(spark)
    stream_stage(spark)

    tick_hz = os.sysconf("SC_CLK_TCK")
    timings: dict[str, float] = {}
    query_env: dict[str, dict] = {}
    extract_docs = 0
    extract_sec = 0.0
    for name, fn in bench_queries.items():
        # this shared box's neighbor noise swings single runs ±30% —
        # min-of-2 for EVERY query (ADVICE r2: asymmetric min-of-N
        # flattered the extract queries vs the ride-alongs)
        runs = 2
        best, n = None, 0
        busy_per_run: list[float | None] = []
        for _ in range(runs):
            spark.catalog.clearCache()  # no cross-query cache reuse
            b0 = _cpu_busy_ticks()
            t0 = time.monotonic()
            n = fn(spark, sf_dir).count()
            dt = time.monotonic() - t0
            b1 = _cpu_busy_ticks()
            busy_per_run.append(
                round((b1 - b0) / tick_hz / dt, 1)
                if b0 is not None and b1 is not None and dt > 0 else None)
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        # per-query window quality (VERDICT r5 item 7): host-wide busy
        # cores during each run (> cpus ⇒ neighbors inside the window)
        # and 1-min loadavg right after the query
        query_env[name] = {"busy_cores": busy_per_run,
                           "loadavg": _loadavg()}
        if name.startswith("extract_"):
            extract_docs += n
            extract_sec += best

    # pipeline_dedup_pass decomposition (VERDICT r5 item 3: the 36.7 s
    # aggregate can't attribute regressions). Mirrors the no-output
    # dedup flow with a materialization barrier at each stage boundary:
    # extract+project / minhash+banding / candidate self-join / CC /
    # keeper election+semi-join. Stage sums exceed the fused aggregate
    # (the barriers are extra work); their RATIO attributes deltas.
    def dedup_pass_stages() -> dict[str, float]:
        from insurance_pdf_extractor_spark.dedup import (
            _lsh_banded, dedup_documents, lsh_pairs_from_banded,
            minhash_signatures_from_docs)
        spark.catalog.clearCache()
        sub: dict[str, float] = {}
        web = spark.read.parquet(fixture_path)
        t0 = time.monotonic()
        res = run_pipeline(spark, web, output_dir=None, resume=False)
        # same projection the pipeline's dedup stage uses: (url, text)
        # straight off the post-UDF intermediate, NOT the finalize docs
        # view (whose per-doc claim aggregation would pollute the stage)
        keyed = (res.cached.select(F.col("url").alias("doc_id"), "text")
                 .localCheckpoint())
        sub["extract_checkpoint"] = round(time.monotonic() - t0, 3)
        res.unpersist()
        t0 = time.monotonic()
        banded = _lsh_banded(
            minhash_signatures_from_docs(keyed)).localCheckpoint()
        sub["minhash_banding"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        pairs = lsh_pairs_from_banded(banded).localCheckpoint()
        sub["candidate_pairs"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        verdict = dedup_documents(
            keyed.select("doc_id"), pairs).localCheckpoint()
        sub["connected_components"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        keyed.join(verdict.where(F.col("is_keeper")).select("doc_id"),
                   "doc_id", "left_semi").count()
        sub["keeper_semi_join"] = round(time.monotonic() - t0, 3)
        return sub

    dedup_stages = dedup_pass_stages()

    # pipeline_scrub_pass decomposition (r7): the CCNet chain's cost by
    # stage, same barrier protocol as dedup_pass_stages — plus the
    # substring-dedup stage (not part of the benched fused pass, so the
    # full r7 chain's per-stage cost is still a recorded number).
    def scrub_pass_stages() -> dict[str, float]:
        from insurance_pdf_extractor_spark.dedup import (
            dedup_paragraphs, dedup_substrings)
        from insurance_pdf_extractor_spark.scrub import (
            gopher_repetition_keepers, scrub_pii)
        spark.catalog.clearCache()
        sub: dict[str, float] = {}
        web = spark.read.parquet(fixture_path)
        t0 = time.monotonic()
        res = run_pipeline(spark, web, output_dir=None, resume=False)
        textv = (res.cached.select(F.col("url").alias("doc_id"), "text")
                 .localCheckpoint())
        sub["extract_checkpoint"] = round(time.monotonic() - t0, 3)
        res.unpersist()
        t0 = time.monotonic()
        textv = (dedup_paragraphs(textv)
                 .select("doc_id", F.col("text_kept").alias("text"))
                 .localCheckpoint())
        sub["paragraph_dedup"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        textv = (dedup_substrings(textv)
                 .select("doc_id", F.col("text_kept").alias("text"))
                 .localCheckpoint())
        sub["substring_dedup"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        textv = textv.join(gopher_repetition_keepers(textv),
                           "doc_id", "left_semi").localCheckpoint()
        sub["repetition_gate"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        scrub_pii(textv).select("doc_id", "pii_counts").count()
        sub["pii_scrub"] = round(time.monotonic() - t0, 3)
        return sub

    scrub_stages = scrub_pass_stages()

    total = round(sum(timings.values()), 3)
    try:
        with open("/proc/loadavg") as f:
            loadavg = float(f.read().split()[0])
    except OSError:
        loadavg = None
    out = {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extract_docs": extract_docs,
        "extract_docs_per_sec": round(extract_docs / extract_sec, 2)
        if extract_sec else None,
        "cpus": int(cpus),
        # host 1-min loadavg at completion: this shared box swings
        # shuffle-heavy numbers ±30% with neighbor load — the artifact
        # should carry its own window quality
        "loadavg": loadavg,
        # quiet-window gate (r5): loadavg when measurement actually
        # started (after wait_quiet) and whether the gate was satisfied
        "loadavg_at_start": loadavg_start,
        "quiet_start": quiet,
        # per-query window quality: busy cores per run + loadavg after
        # (VERDICT r5 item 7 — attribute noise to specific entries)
        "query_env": query_env,
        # pipeline_dedup_pass stage decomposition (VERDICT r5 item 3):
        # stage sums exceed the fused pass (barriers); ratios attribute
        "pipeline_dedup_pass_stages": dedup_stages,
        # pipeline_scrub_pass stage decomposition (r7), + the substring
        # stage so the FULL chain's marginal costs are attributed
        "pipeline_scrub_pass_stages": scrub_stages,
    }
    print(json.dumps(out))
    # persist the FULL record next to the stdout line (VERDICT r6: the
    # driver captures only a 2000-char stdout tail, and the r6 artifact
    # of record lost its per-query timings to that window — the repo
    # copy survives regardless of how much diagnostics the JSON grows)
    try:
        os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BENCH"), exist_ok=True)
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH", "bench_latest.json"), "w") as f:
            json.dump(out, f, indent=1)
    except OSError:
        pass  # read-only checkout must not fail the bench itself
    spark.stop()


if __name__ == "__main__":
    main()
