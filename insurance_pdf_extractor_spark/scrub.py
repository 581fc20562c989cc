"""PII scrubbing + repetition screening for training-data corpora.

Two operators the quality/filter family (SURVEY.md §2.2 F5-F7 and the
builder brief's text-analysis mandate) needs before text enters a
training set:

- :func:`scrub_pii` — typed redaction of email / credit-card / SSN /
  IPv4 / phone spans, MOST-SPECIFIC-FIRST so e.g. an SSN is never
  half-eaten by the looser phone pattern, plus a per-doc ``pii_counts``
  audit map. All chained JVM ``regexp_count``/``regexp_replace`` —
  zero Python in the plan (tests/test_scrub.py asserts it), so the
  redaction rides whole-stage codegen at 100 TB.
- :func:`repeated_ngram_stats` — Gopher-style repetition screening
  (Rae et al. 2021 §A1.1: fraction of characters contained in the most
  frequently-occurring word n-gram — the template/spam/SEO-boilerplate
  signal). N-gram construction is native higher-order functions over
  ONE ``split`` (aligned-slice ``zip_with``, the same
  no-CSE-inside-lambda shape as ``dedup.shingles``); the only shuffle
  is one balanced (doc, gram) aggregation.
- :func:`gopher_repetition_stats` — the REST of the Gopher §A1.1
  family (VERDICT r6 item 4): duplicate-line fraction, duplicate-line
  character fraction, and duplicated-n-gram character-coverage
  fractions for n = 5..10 — the signals that catch listicles, lyrics,
  and chorus-style boilerplate the single top-2-gram misses.

Patterns use only constructs with identical semantics in Java regex
(Spark) and RE2 (the DuckDB oracle): character classes, bounded
repetition, ``\\b`` ASCII word boundaries, optional groups. No
backreferences, no lookaround.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: (name, pattern, replacement token), applied IN ORDER. Order is load-
#: bearing: the credit-card pattern must run before the phone pattern
#: (a 16-digit card contains phone-shaped digit runs), the SSN pattern
#: before the phone pattern (both are dash-grouped digits), and IPv4
#: before phone (dot-separated digit runs). Counts are taken on the
#: progressively-scrubbed text, so each span is attributed to exactly
#: one type — the most specific one.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("card", r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b", "[CARD]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b(\+?1[-. ])?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b",
     "[PHONE]"),
]


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str = "text_scrubbed",
              counts_col: str = "pii_counts") -> DataFrame:
    """All input columns + ``out_col`` (text with every PII span
    replaced by its typed token) + ``counts_col``
    (map<string,int> {email, card, ssn, ip, phone} → spans redacted).

    One chained expression per output column — no UDF, no shuffle; the
    whole redaction is a per-row projection inside codegen. Null text
    stays null with an all-zero counts map.
    """
    cur: Column = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(F.coalesce(F.regexp_count(cur, F.lit(pat)),
                                 F.lit(0)).alias(name))
        cur = F.regexp_replace(cur, pat, token)
    return df.withColumns({
        out_col: cur,
        counts_col: F.map_from_arrays(
            F.array(*[F.lit(n) for n, _, _ in PII_PATTERNS]),
            F.array(*counts)),
    })


def _word_ngrams(text_col: Column, n: int) -> Column:
    """Word n-gram array (NON-distinct — repetition screening needs the
    multiset) as one native expression: n aligned ``slice`` views of a
    single ``split``, zipped. ``element_at`` inside a ``transform``
    lambda would re-split the document once per element (Catalyst does
    no CSE inside HOF lambdas — see dedup.shingles)."""
    words = F.split(F.trim(text_col), r"\s+")
    sz = F.size(words)
    arr = F.slice(words, 1, sz - (n - 1))
    for j in range(1, n):
        nxt = F.slice(words, j + 1, sz - (n - 1))
        arr = F.zip_with(arr, nxt, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(sz >= n, arr).otherwise(
        F.array().cast("array<string>"))


def repeated_ngram_stats(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", n: int = 2) -> DataFrame:
    """Per-doc repetition screen: (id, top_ngram, top_count,
    top_char_frac) where top_char_frac = count × len(top gram) / total
    characters, capped at 1.0 (Gopher §A1.1; docs above ~0.18-0.20 for
    2-grams are template/spam candidates). The count × len product is
    the public Gopher-reproduction formula (DataTrove's
    GopherRepetitionFilter uses the same); it counts characters shared
    by OVERLAPPING occurrences twice ('spam spam spam' puts each inner
    word in two bigrams), so it over-flags relative to a strict
    character-coverage reading — the cap keeps it a proper fraction,
    and the exact-coverage variant is
    :func:`gopher_repetition_stats`'s dup_ngram fractions (ADVICE r6).

    Ties break to the lexicographically-smallest gram (deterministic).
    Shape at scale: explode → ONE (id, gram) hash aggregation (partial
    map-side combine applies) → per-id top-1 window over the already-
    aggregated counts. Nothing is quadratic in document length and the
    shuffle rows are (id, gram) — balanced unless one document is
    itself 100 GB, which upstream chunking forbids. Docs with fewer
    than ``n`` words return (null, 0, 0.0).
    """
    grams = df.select(F.col(id_col).alias("_id"),
                      F.length(text_col).alias("_len"),
                      F.explode_outer(_word_ngrams(F.col(text_col), n))
                      .alias("gram"))
    counted = (grams.groupBy("_id", "_len", "gram")
               .agg(F.count("*").alias("cnt")))
    w = Window.partitionBy("_id").orderBy(
        F.desc("cnt"), F.asc("gram"))
    top = (counted.withColumn("_rn", F.row_number().over(w))
           .where(F.col("_rn") == 1))
    has = F.col("gram").isNotNull()
    return top.select(
        F.col("_id").alias(id_col),
        F.when(has, F.col("gram")).alias("top_ngram"),
        F.when(has, F.col("cnt")).otherwise(F.lit(0)).cast("long")
        .alias("top_count"),
        F.when(has & (F.col("_len") > 0),
               F.least(F.lit(1.0),
                       F.round(F.col("cnt") * F.length("gram")
                               / F.col("_len"), 4)))
        .otherwise(F.lit(0.0)).alias("top_char_frac"))


#: the duplicated-n-gram sizes Gopher §A1.1 gates on (char-coverage
#: thresholds 0.15/0.14/0.13/0.12/0.11/0.10 for n = 5..10)
GOPHER_DUP_NGRAM_NS: tuple[int, ...] = (5, 6, 7, 8, 9, 10)


def _tagged_ngram_occurrences(base: DataFrame,
                              ns: tuple[int, ...]) -> DataFrame:
    """(_id, n, pos, gram) occurrence rows for EVERY n in ``ns`` from
    ONE explode over one split: per-n arrays of (n, pos, gram) structs
    are concatenated before the explode, so the document text is
    scanned once however many n-gram sizes ride it. ``base`` must carry
    (_id, _text)."""
    def _tagged(n: int):
        return F.transform(
            _word_ngrams(F.col("_text"), n),
            lambda g, i: F.struct(F.lit(n).alias("n"), i.alias("pos"),
                                  g.alias("gram")))
    return (base.select("_id", F.explode(F.concat(
        *[_tagged(n) for n in ns])).alias("o"))
        .select("_id", "o.n", "o.pos", "o.gram"))


def gopher_repetition_stats(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text",
                            dup_ngram_ns: tuple[int, ...] =
                            GOPHER_DUP_NGRAM_NS) -> DataFrame:
    """The rest of the Gopher §A1.1 repetition screen (Rae et al. 2021),
    one row per input document:

    - ``dup_line_frac`` — occurrences beyond the first of each repeated
      line / total lines. Lines split on ``\\n`` and compare TRIMMED;
      whitespace-only lines are excluded from both numerator and
      denominator (they are formatting, not content — the same rule as
      ``dedup.dedup_paragraphs``; Gopher's appendix doesn't pin this
      down, DataTrove counts empties).
    - ``dup_line_char_frac`` — characters of those duplicate
      occurrences / characters of all counted lines.
    - ``dup_ngram_char_frac_05`` .. ``_10`` — for each n, the fraction
      of word-characters covered by AT LEAST one occurrence of some
      n-gram that occurs ≥ 2 times in the document. This is the
      overlap-exact distributed reading of Gopher's "fraction of
      characters contained within all duplicate n-grams": the public
      greedy reproductions (e.g. DataTrove) scan left-to-right and
      skip n words after a hit, which is order-dependent and
      unexpressible as a distributed aggregation; coverage over the
      set of covered word indices is deterministic, order-free, and
      never exceeds 1.0. The denominator is total word characters
      (separators excluded on both sides of the ratio).

    All fractions are rounded to 4 places; documents with no lines /
    fewer than n words score 0.0. Null text behaves as empty.

    Shape at scale (everything UDF-free, asserted in tests):
    - lines: one (doc, line) hash agg + one per-doc agg — partial
      map-side combine absorbs hot boilerplate lines.
    - n-grams: ONE explode emits (doc, n, pos, gram) for every n in one
      pass over one ``split`` (per-n arrays of structs concatenated
      before the explode — the document text is scanned once, not six
      times). The dup-detect stage never needs the gram TEXT
      downstream (coverage is over word indices), so occurrences
      immediately project ``xxhash64(gram)`` — the up-to-10-word gram
      strings never enter a shuffle (~6× fewer shuffle bytes at
      n=5..10), and a within-doc 64-bit collision (~10³ grams/doc →
      P ≈ 1e-13) is the accepted trade. Duplicated-gram positions come
      from ONE ``collect_list(pos)`` aggregation keyed
      (doc, n, gram_hash) filtered to ``size ≥ 2`` — a single shuffle
      of the occurrence table with no sort (a window count would sort
      it) and no join-back (which would scan the text a second time;
      per-group arrays are bounded by one document's occurrences of
      one gram). Covered word indices explode from ``sequence`` and
      join the (doc, widx, word) table, both sides keyed (doc, widx).
      Shuffle keys are (doc, n, gram_hash) / (doc, widx) — balanced
      unless one document is itself executor-sized, which upstream
      chunking forbids.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(F.col(id_col).alias("_id"), text.alias("_text"))

    # --- duplicate-line fraction + char fraction -----------------------
    ln = (base.select("_id", F.explode(F.split("_text", "\n", -1))
                      .alias("raw"))
          .select("_id", F.trim("raw").alias("k"))
          .where(F.col("k") != ""))
    per_line = ln.groupBy("_id", "k").agg(F.count("*").alias("c"))
    line_stats = per_line.groupBy("_id").agg(
        F.sum("c").alias("_lines_total"),
        F.sum(F.col("c") - 1).alias("_lines_dup"),
        F.sum(F.col("c") * F.length("k")).alias("_lchars_total"),
        F.sum((F.col("c") - 1) * F.length("k")).alias("_lchars_dup"))

    # --- duplicated-n-gram word-character coverage ---------------------
    occ = (_tagged_ngram_occurrences(base, dup_ngram_ns)
           .select("_id", "n", "pos", F.xxhash64("gram").alias("gh")))
    dup_pos = (occ.groupBy("_id", "n", "gh")
               .agg(F.collect_list("pos").alias("ps"))
               .where(F.size("ps") >= 2))
    covered = (dup_pos.select(
        "_id", "n", F.explode("ps").alias("pos"))
        .select(
            "_id", "n",
            F.explode(F.sequence("pos", F.col("pos") + F.col("n") - 1))
            .alias("widx"))
        .distinct())
    words = (base.select("_id", F.posexplode(
        F.split(F.trim("_text"), r"\s+")).alias("widx", "word")))
    total_chars = words.groupBy("_id").agg(
        F.sum(F.length("word")).alias("_wchars"))
    cov_chars = (covered.join(words, ["_id", "widx"])
                 .groupBy("_id", "n")
                 .agg(F.sum(F.length("word")).alias("_cov")))
    ng_fracs = (cov_chars.join(total_chars, "_id")
                .groupBy("_id")
                .agg(*[F.max(F.when(F.col("n") == n,
                                    F.round(F.col("_cov") / F.col("_wchars"),
                                            4)))
                       .alias(f"dup_ngram_char_frac_{n:02d}")
                       for n in dup_ngram_ns]))

    def frac(num: str, den: str) -> Column:
        return (F.when(F.coalesce(F.col(den), F.lit(0)) > 0,
                       F.round(F.col(num) / F.col(den), 4))
                .otherwise(F.lit(0.0)))
    return (base.select("_id")
            .join(line_stats, "_id", "left")
            .join(ng_fracs, "_id", "left")
            .select(
                F.col("_id").alias(id_col),
                frac("_lines_dup", "_lines_total")
                .alias("dup_line_frac"),
                frac("_lchars_dup", "_lchars_total")
                .alias("dup_line_char_frac"),
                *[F.coalesce(f"dup_ngram_char_frac_{n:02d}", F.lit(0.0))
                  .alias(f"dup_ngram_char_frac_{n:02d}")
                  for n in dup_ngram_ns]))


#: Gopher §A1.1 repetition gate thresholds (Rae et al. 2021, Table A1):
#: a document FAILS if any signal exceeds its bound. top_ngram_char_frac
#: uses the capped count×len formula (see repeated_ngram_stats);
#: dup_ngram_char_frac uses overlap-exact coverage (strictly ≤ the
#: greedy reproductions' value, so this gate is marginally more lenient
#: than DataTrove on pathological overlap — documented, not hidden).
GOPHER_REPETITION_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_ngram_char_frac_2": 0.20,
    "top_ngram_char_frac_3": 0.18,
    "top_ngram_char_frac_4": 0.16,
    "dup_ngram_char_frac_05": 0.15,
    "dup_ngram_char_frac_06": 0.14,
    "dup_ngram_char_frac_07": 0.13,
    "dup_ngram_char_frac_08": 0.12,
    "dup_ngram_char_frac_09": 0.11,
    "dup_ngram_char_frac_10": 0.10,
}


def gopher_repetition_keepers(df: DataFrame, id_col: str = "doc_id",
                              text_col: str = "text",
                              thresholds: dict[str, float] | None = None
                              ) -> DataFrame:
    """Ids of documents that PASS every Gopher repetition gate — the
    filter form of the screen, for pipeline use.

    One column per threshold key: ``dup_line*`` / ``dup_ngram*`` come
    from :func:`gopher_repetition_stats`; ``top_ngram_char_frac_{n}``
    from :func:`repeated_ngram_stats` at n = 2, 3, 4. A doc is kept iff
    every signal is ≤ its bound. Returns a one-column DataFrame
    (``id_col``) for a left-semi join against the corpus.

    A top-n-gram gate only applies when the top n-gram occurs ≥ 2
    times: a single occurrence is not repetition, yet its count×len
    value easily exceeds 16% on a short clean document (the same guard
    the public reproductions carry). The dup-line / dup-n-gram signals
    need no guard — they are 0 without a repeat by construction.

    Shape: ALL top-n screens share ONE tagged n-gram explode (the same
    one-scan trick as the dup family — see
    :func:`_tagged_ngram_occurrences`), one (doc, n, gram) agg, and one
    per-(doc, n) top-1 window; the family stats add two line aggs and
    their own tagged explode. The text is scanned 3× total (lines,
    words, n-grams×2) regardless of how many n-gram sizes are gated —
    per-n separate screens would scan it once per n. The final combine
    is per-doc equi-joins on the id — balanced, no skew-prone key."""
    thresholds = dict(GOPHER_REPETITION_THRESHOLDS if thresholds is None
                      else thresholds)
    stats = gopher_repetition_stats(df, id_col=id_col, text_col=text_col)
    joined = stats
    top_ns = tuple(n for n in (2, 3, 4)
                   if f"top_ngram_char_frac_{n}" in thresholds)
    top_cols = {f"top_ngram_char_frac_{n}" for n in top_ns}
    if top_ns:
        base = df.select(F.col(id_col).alias("_id"),
                         F.col(text_col).alias("_text"))
        counted = (_tagged_ngram_occurrences(base, top_ns)
                   .groupBy("_id", "n", "gram")
                   .agg(F.count("*").alias("cnt")))
        w = Window.partitionBy("_id", "n").orderBy(
            F.desc("cnt"), F.asc("gram"))
        top1 = (counted.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .join(base.select("_id", F.length("_text").alias("_len")),
                      "_id"))
        frac = F.when(F.col("_len") > 0,
                      F.least(F.lit(1.0),
                              F.round(F.col("cnt") * F.length("gram")
                                      / F.col("_len"), 4))) \
                .otherwise(F.lit(0.0))
        tops = top1.groupBy("_id").agg(
            *[F.max(F.when(F.col("n") == n, frac))
              .alias(f"top_ngram_char_frac_{n}") for n in top_ns],
            *[F.max(F.when(F.col("n") == n, F.col("cnt")))
              .alias(f"_cnt_{n}") for n in top_ns])
        joined = joined.join(
            tops.withColumnRenamed("_id", id_col), id_col, "left")
    cond = None
    for col, bound in thresholds.items():
        c = F.coalesce(F.col(col), F.lit(0.0)) <= bound
        if col in top_cols:   # single occurrence ≠ repetition
            n = col.rsplit("_", 1)[1]
            c = c | (F.coalesce(F.col(f"_cnt_{n}"), F.lit(0)) < 2)
        cond = c if cond is None else cond & c
    return joined.where(cond).select(id_col)


def ngram_overlap_stats(docs: DataFrame, ref: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        ref_text_col: str = "text", n: int = 13,
                        broadcast_ref: bool = True) -> DataFrame:
    """Eval-set decontamination signal (Brown et al. 2020 Appendix C,
    the GPT-3 13-gram rule; Lee et al. 2022 §6.2): per training
    document, how many of its n-gram windows appear ANYWHERE in the
    reference (benchmark / eval) corpus. Returns one row per input doc:
    ``(id_col, ngrams_total, ngrams_overlapping, overlap_frac,
    contaminated)`` — ``contaminated`` is the GPT-3 any-overlap
    verdict; thresholded consumers use ``overlap_frac``.

    Tokenization is the engine's standard lower + trim + ``\\s+``
    split (the same normalization lm.py scores under), so a benchmark
    answer re-cased or re-wrapped in the training text still matches.
    Documents with fewer than n words have 0 windows and score 0.0 /
    not contaminated; null text behaves as empty.

    Shape at scale: the REFERENCE side collapses to its distinct
    window hashes — eval sets are thousands of documents against a
    corpus of billions, so those hashes broadcast to every executor
    and the training side never shuffles at all: explode → broadcast
    left-join → one per-doc agg (the only exchange, keyed by doc id).
    ``broadcast_ref=False`` degrades to a shuffle equi-join on the
    window hash for reference corpora too big to broadcast — the same
    keys and AQE-skew story as :func:`dedup.dedup_substrings`'s probe.
    Window hashes are ``xxhash64`` (64-bit): a collision FLAGS a clean
    doc (never unflags a contaminated one) — conservative in the
    direction decontamination cares about.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def _norm(c: Column) -> Column:
        return F.lower(F.trim(F.coalesce(c, F.lit(""))))

    ref_h = (ref.select(F.explode(_word_ngrams(_norm(F.col(ref_text_col)),
                                               n)).alias("gram"))
             .select(F.xxhash64("gram").alias("gh"))
             .distinct()
             .withColumn("_hit", F.lit(1)))
    if broadcast_ref:
        ref_h = F.broadcast(ref_h)
    occ = (docs.select(F.col(id_col).alias("_id"),
                       F.explode_outer(_word_ngrams(_norm(F.col(text_col)),
                                                    n)).alias("gram"))
           # xxhash64(NULL) is NOT null (it hashes the seed) — guard so
           # a <n-word doc's placeholder row can never match the ref
           .select("_id", "gram",
                   F.when(F.col("gram").isNotNull(),
                          F.xxhash64("gram")).alias("gh")))
    per = (occ.join(ref_h, "gh", "left")
           .groupBy("_id")
           .agg(F.count("gram").alias("ngrams_total"),
                F.count(F.when(F.col("_hit") == 1, 1))
                .alias("ngrams_overlapping")))
    frac = (F.when(F.col("ngrams_total") > 0,
                   F.round(F.col("ngrams_overlapping")
                           / F.col("ngrams_total"), 4))
            .otherwise(F.lit(0.0)))
    return per.select(F.col("_id").alias(id_col),
                      F.col("ngrams_total").cast("long")
                      .alias("ngrams_total"),
                      F.col("ngrams_overlapping").cast("long")
                      .alias("ngrams_overlapping"),
                      frac.alias("overlap_frac"),
                      (F.col("ngrams_overlapping") > 0)
                      .alias("contaminated"))


def decontaminate_keepers(docs: DataFrame, ref: DataFrame,
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          ref_text_col: str = "text", n: int = 13,
                          max_overlapping: int = 0,
                          broadcast_ref: bool = True) -> DataFrame:
    """Ids of documents that SURVIVE decontamination: at most
    ``max_overlapping`` reference n-gram windows (default 0 — the
    GPT-3 rule: any eval overlap drops the training doc). The filter
    form of :func:`ngram_overlap_stats`, for pipeline use."""
    stats = ngram_overlap_stats(docs, ref, id_col=id_col,
                                text_col=text_col,
                                ref_text_col=ref_text_col, n=n,
                                broadcast_ref=broadcast_ref)
    return (stats.where(F.col("ngrams_overlapping") <= max_overlapping)
            .select(id_col))
