"""Unigram language-model quality scoring for training-data corpora.

CCNet (Wenzek et al. 2020 §4.3) gates web text on the perplexity of a
5-gram KenLM trained on Wikipedia, then splits the corpus into
head/middle/tail perplexity buckets; most published pipelines keep head
+ middle. KenLM is a sequential C++ engine with no distributed
equivalent, so this module provides the same *pipeline surface* over a
model Spark can both FIT and SCORE natively: an add-one-smoothed
unigram LM with a bounded vocabulary. Fit is ONE token aggregation +
a distributed top-K; scoring is one broadcast join + one per-doc
aggregation — everything whole-stage-codegen, no Python in the plan,
and byte-checkable against a SQL oracle. A real KenLM would ride
``mapInPandas`` exactly like the other guarded real engines
(multimodal.py's PIL/pyav seams); the fit/score/bucket plumbing here
is what it would plug into.

Reference parity anchor: the reference scores extraction quality
per-document and filters on it (backend/insurance_extractor.py's
confidence fields; SURVEY.md §2.2 A11) — this is the corpus-trained
generalization of that per-doc quality number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .parallel import cluster_by, spread_input

#: tokens = non-empty runs between whitespace of the lowercased text —
#: the same \s+ split every other text operator uses, lowercased so
#: "The"/"the" share a count (CCNet lowercases before KenLM too).
_TOKEN_SPLIT = r"\s+"


def _tokens(df: DataFrame, id_col: str, text_col: str,
            cluster: bool = False) -> DataFrame:
    """(_id, tok) one row per token occurrence; empty/null text yields
    no rows (callers left-join totals back). Guide §2.5: the tokenize
    explode must not serialize onto a single-split scan. ``cluster``:
    hash-partition the TEXT by doc id first so an id-keyed consumer
    (the per-doc scoring agg) plans without shuffling the token rows —
    which are ~2× the text bytes; leave False for corpus-keyed
    consumers (the fit's token agg shuffles by token regardless)."""
    df = cluster_by(df, id_col) if cluster else spread_input(df, key=id_col)
    return (df.select(F.col(id_col).alias("_id"),
                      F.explode(F.split(F.lower(F.trim(F.coalesce(
                          F.col(text_col), F.lit("")))), _TOKEN_SPLIT))
                      .alias("tok"))
            .where(F.col("tok") != ""))


def unigram_fit(docs: DataFrame, text_col: str = "text",
                vocab_size: int = 65536) -> DataFrame:
    """Fit the model: the ``vocab_size`` most frequent tokens with
    their corpus counts, ``(tok, cnt)``.

    Ties break lexicographically (count desc, token asc) so the vocab
    boundary is deterministic. Shape: ONE (token) hash agg with
    map-side partial combine (hot stopwords arrive pre-combined), then
    ``orderBy().limit()`` which Spark executes as TakeOrderedAndProject
    — a distributed top-K, never a single-partition global sort. The
    result is vocab_size rows: small enough to broadcast at scoring
    time, which is the entire point of bounding the vocabulary (an
    unbounded vocab would make scoring a shuffle join skewed on "the").
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    counts = (_tokens(docs, docs.columns[0], text_col)
              .groupBy("tok").agg(F.count("*").alias("cnt")))
    return counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(vocab_size)


def unigram_doc_scores(docs: DataFrame, model: DataFrame,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Score every document under a fitted model: ``(id_col, n_tokens,
    oov_frac, nll, ppl)``.

    Add-one smoothing with a single closed form: every token scores
    ``p = (c + 1) / (N + V + 1)`` where ``c`` is its in-vocab corpus
    count (0 when out-of-vocabulary), ``N = sum of in-vocab counts``,
    ``V = vocab rows`` — OOV tokens get the unseen mass ``1/(N+V+1)``.
    ``nll`` is the mean negative natural log-probability, ``ppl`` its
    exponential (both rounded to 4 places; documents with no tokens
    score null nll/ppl and 0 oov_frac). Low ppl ≈ looks like the
    training corpus — the CCNet keep signal.

    Shape: tokens join the BROADCAST vocab (bounded by
    ``unigram_fit``'s vocab_size, so "the" never shuffles), the 1-row
    (N, V) totals ride a broadcast crossJoin, and the only shuffle is
    the per-doc aggregation keyed by id. Zero Python, zero skew.
    """
    totals = model.agg(F.sum("cnt").alias("_n"),
                       F.count("*").alias("_v"))
    toks = _tokens(docs, id_col, text_col, cluster=True)
    lp = F.log((F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1.0))
               / (F.col("_n") + F.col("_v") + F.lit(1.0)))
    per = (toks.join(F.broadcast(model), "tok", "left")
           .crossJoin(F.broadcast(totals))
           .groupBy("_id")
           .agg(F.count("*").alias("n_tokens"),
                F.round(F.avg(F.when(F.col("cnt").isNull(), 1.0)
                              .otherwise(0.0)), 4).alias("oov_frac"),
                F.round(-F.avg(lp), 4).alias("nll"),
                F.round(F.exp(-F.avg(lp)), 4).alias("ppl")))
    return (docs.select(F.col(id_col).alias("_id")).distinct()
            .join(per, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    F.coalesce("n_tokens", F.lit(0)).cast("long")
                    .alias("n_tokens"),
                    F.coalesce("oov_frac", F.lit(0.0)).alias("oov_frac"),
                    F.col("nll"), F.col("ppl")))


def ppl_buckets(scores: DataFrame, id_col: str = "doc_id",
                exact: bool = True) -> DataFrame:
    """CCNet head/middle/tail split: tag each scored document with its
    perplexity tercile — ``(id_col, ppl, bucket)`` where bucket is
    'head' (lowest-ppl third, most fluent), 'middle', or 'tail';
    documents with null ppl (no tokens) bucket 'tail'. CCNet trains
    per-bucket and most consumers keep head+middle.

    Cutoffs come from ``percentile(ppl, [1/3, 2/3])`` — EXACT linear-
    interpolation percentiles (deterministic, matches DuckDB's
    quantile_cont) computed over the 4-dp-rounded scores so the oracle
    twin sees identical inputs, then broadcast to every row via a 1-row
    crossJoin; no global sort touches the corpus. ``exact=False`` swaps
    in ``approx_percentile`` (accuracy 1e-4) for the 10^12-doc tier
    where an exact percentile's per-group state is unbounded — the
    bucket boundary moves by at most the sketch error; flip it there,
    keep exact for oracle-graded runs.
    """
    pfun = F.percentile if exact else (
        lambda c, ps: F.approx_percentile(c, ps, 10000))
    cuts = scores.agg(
        pfun(F.col("ppl"), F.array(F.lit(1.0 / 3), F.lit(2.0 / 3)))
        .alias("_cuts"))
    return (scores.crossJoin(F.broadcast(cuts))
            .select(id_col, "ppl",
                    F.when(F.col("ppl").isNull(), F.lit("tail"))
                     .when(F.col("ppl") <= F.element_at("_cuts", 1),
                           F.lit("head"))
                     .when(F.col("ppl") <= F.element_at("_cuts", 2),
                           F.lit("middle"))
                     .otherwise(F.lit("tail")).alias("bucket")))
