"""S2 binaryFile ingest, S4 text entry, S6/C16 CSV sink."""

import os
import random

from pyspark.sql import functions as F


def test_read_pdf_directory(spark, tmp_path):
    from insurance_pdf_extractor_spark.fixtures import make_loss_run_pdf
    from insurance_pdf_extractor_spark.pipeline import run_pipeline
    from insurance_pdf_extractor_spark.sources import read_pdf_directory
    d = tmp_path / "pdfs"
    d.mkdir()
    for i in range(4):
        (d / f"doc{i}.pdf").write_bytes(make_loss_run_pdf(random.Random(i)))
    (d / "noise.txt").write_text("not a pdf")

    web = read_pdf_directory(spark, str(d))
    assert web.count() == 4  # glob filter excluded noise.txt
    assert web.columns == ["url", "warc_ts", "html", "text", "lang"]
    res = run_pipeline(spark, web, output_dir=None, resume=False)
    docs = res.docs.cache()
    assert docs.count() == 4
    assert docs.where(F.col("doc_kind") != "pdf_digital").count() == 0
    assert res.claims.count() > 0


def test_text_only_entry(spark):
    from insurance_pdf_extractor_spark.pipeline import run_pipeline
    from insurance_pdf_extractor_spark.sources import web_pages_from_text
    base = spark.createDataFrame(
        [("u1", "Policy Number: TT-1\nClaim# 12345 OPEN 2023-01-01"),
         ("u2", "plain text with no claims")], ["url", "text"])
    web = web_pages_from_text(base)
    res = run_pipeline(spark, web, output_dir=None, resume=False)
    docs = {r["url"]: r for r in res.docs.collect()}
    assert docs["u1"]["doc_kind"] == "text"
    assert docs["u1"]["total_claims"] == 1
    assert docs["u1"]["policy_number"] == "TT-1"
    assert docs["u2"]["total_claims"] == 0


def test_claims_csv_sink(spark, pipeline_result, tmp_path):
    import csv
    from insurance_pdf_extractor_spark.sources import write_claims_csv
    out = str(tmp_path / "claims_csv")
    write_claims_csv(pipeline_result.claims, out)
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert files
    rows = 0
    header = None
    for f in files:
        with open(os.path.join(out, f), newline="") as fh:
            rdr = csv.reader(fh)
            h = next(rdr)
            header = header or h
            rows += sum(1 for _ in rdr)
    assert rows == pipeline_result.claims.count()
    assert "claim_number" in header and "source_url" in header
    assert "url" not in header


def test_report_json_views(spark, pipeline_result):
    import json
    from insurance_pdf_extractor_spark.report import with_report_json
    docs = with_report_json(pipeline_result.docs)
    row = docs.where(F.col("total_claims") > 0).first()
    schema = json.loads(row["extracted_schema_json"])
    assert len(schema["claims"]) == row["total_claims"]
    assert "claim_number" in schema["claims"][0]
    analysis = json.loads(row["analysis_json"])
    assert analysis["total_claims"] == row["total_claims"]
    assert {"claim_number", "math_valid", "math_diff", "confidence_score"} \
        <= set(analysis["claims_validation_summary"][0])
    ver = json.loads(row["verification_json"])
    assert ver["combined_text"] == row["text"]
    assert ver["summary"]["claims_count"] == row["total_claims"]
