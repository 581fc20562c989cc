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
