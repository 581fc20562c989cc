"""Stage 1 — binary format sniff (F1/F2 routing half).

Pure NATIVE column expressions — no Arrow round-trip of the fat binary
column, full whole-stage codegen. Emits ``doc_kind0`` ∈
{pdf, html, text, empty, other}; the digital-vs-scanned refinement (which
requires parsing pages) happens inside the tokenize stage, mirroring the
reference's sample-first detection (backend/pdf_detector.py:34-101).

Also enforces the reference's 50 MB size cap (backend/app.py:35) as a
filterable ``oversize`` flag instead of a hard drop, so rejects can be
routed to the metrics table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_BYTES = 50 * 1024 * 1024


def doc_kind0_col(html: Column, text: Column) -> Column:
    head = F.lower(F.decode(F.substring(html, 1, 1024), "ISO-8859-1"))
    return (
        F.when(html.isNull() & text.isNotNull(), F.lit("text"))
        .when(html.isNull() | (F.length(html) == 0), F.lit("empty"))
        .when(F.decode(F.substring(html, 1, 5), "ISO-8859-1") == "%PDF-",
              F.lit("pdf"))
        .when(head.contains("<html") | head.contains("<!doctype html"),
              F.lit("html"))
        .otherwise(F.lit("other"))
    )


def sniff(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "doc_kind0", doc_kind0_col(F.col("html"), F.col("text"))
    ).withColumn(
        "oversize", F.coalesce(F.length("html"), F.lit(0)) > MAX_BYTES
    )
