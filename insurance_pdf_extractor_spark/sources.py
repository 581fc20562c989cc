"""Ad-hoc sources and sinks around the primary table scan.

- S2 — directory ingest: the reference globs ``*.pdf`` from a directory
  (reference backend/batch_process.py:133, main_chunked.py:46); here that
  is ``spark.read.format("binaryFile")`` mapped into the web_pages shape.
- S4 — text-only entry (reference backend/app.py:246-274): build
  web_pages rows straight from a text column (tokenize fast-path).
- S6 — merged-claims sink (reference backend/app.py:203-235): flat union
  of claims across documents tagged with their source url — that IS the
  pipeline's claims table; here it gains the CSV encoding twin.
- C16 — CSV encode with quoting (reference backend/batch_process.py:190-200).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_pdf_directory(spark: SparkSession, path: str,
                       glob: str = "*.pdf") -> DataFrame:
    """S2: directory of PDF files → web_pages-shaped DataFrame.

    ``binaryFile`` gives (path, modificationTime, length, content); url is
    the file path, warc_ts the mtime. Recursive lookup stays off to match
    the reference's flat glob.
    """
    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", glob)
           .load(path))
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def web_pages_from_text(df: DataFrame, url_col: str = "url",
                        text_col: str = "text",
                        lang_col: str | None = None) -> DataFrame:
    """S4: caller-provided text → web_pages rows (html NULL ⇒ the sniff
    stage routes them down the tokenize fast-path)."""
    lang = F.col(lang_col) if lang_col else F.lit(None).cast("string")
    return df.select(
        F.col(url_col).cast("string").alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col(text_col).cast("string").alias("text"),
        lang.alias("lang"),
    )


def write_claims_csv(claims: DataFrame, path: str) -> None:
    """S6/C16: merged claims → quoted CSV (one header, coalesced files
    sized by the writer; at cluster scale drop the coalesce)."""
    out = claims.withColumn("source_url", F.col("url")).drop("url", "pos")
    # CSV can't carry arrays: flatten array<string> columns ('; '-joined,
    # matching the reference's printed warning format)
    for field in out.schema.fields:
        if field.dataType.simpleString() == "array<string>":
            out = out.withColumn(field.name, F.array_join(field.name, "; "))
    (out.write.mode("overwrite")
     .option("header", True)
     .option("quoteAll", True)
     .csv(path))
