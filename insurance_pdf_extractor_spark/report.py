"""Report views: the reference's per-document JSON artifacts as columns.

The reference writes four files per session dir
(backend/chunked_extractor.py:176-260): extracted_text.txt,
extracted_schema.json, analysis.json, verification_package.json. Here
each becomes a NATIVE column over the finalized docs table (C15
``to_json`` with explicit struct shapes) — one table, not four files
(SURVEY.md §2.1 S5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_report_json(docs: DataFrame) -> DataFrame:
    """docs → + extracted_schema_json, analysis_json, verification_json."""
    schema_struct = F.struct(F.col("claims").alias("claims"))

    analysis_struct = F.struct(
        F.col("report_date"),
        F.col("policy_number"),
        F.col("insured_name"),
        F.col("total_claims"),
        F.transform(
            "claims",
            lambda c: F.struct(
                c["claim_number"].alias("claim_number"),
                c["math_valid"].alias("math_valid"),
                c["math_diff"].alias("math_diff"),
                c["confidence_score"].alias("confidence_score"),
            )).alias("claims_validation_summary"),
    )

    # summary block mirrors verification_package["summary"]
    # (reference chunked_extractor.py:251-256)
    summary_struct = F.struct(
        F.col("total_pages"),
        F.col("scanned_pages"),
        F.col("avg_confidence"),
        F.col("total_claims").alias("claims_count"),
    )
    verification_struct = F.struct(
        F.col("url").alias("source_url"),
        F.col("text").alias("combined_text"),
        schema_struct.alias("extracted_schema"),
        summary_struct.alias("summary"),
        F.col("field_spans"),
    )
    return (docs
            .withColumn("extracted_schema_json", F.to_json(schema_struct))
            .withColumn("analysis_json", F.to_json(analysis_struct))
            .withColumn("verification_json", F.to_json(verification_struct)))
