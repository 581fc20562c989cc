"""User-facing driver: extract a synthetic web_pages corpus end-to-end."""
import sys
from insurance_pdf_extractor_spark.session import get_spark
from insurance_pdf_extractor_spark.fixtures import write_web_pages_parquet
from insurance_pdf_extractor_spark.pipeline import run_pipeline

out_dir, n_docs = sys.argv[1], int(sys.argv[2])
spark = get_spark(app_name="verify-job")
spark.sparkContext.setLogLevel("ERROR")
write_web_pages_parquet("/tmp/verify_graft/web_pages.parquet", n_docs, seed=42)
web = spark.read.parquet("/tmp/verify_graft/web_pages.parquet")
res = run_pipeline(spark, web, output_dir=out_dir)
print(f"RUN {res.run_id}: wrote {res.docs_written} docs, "
      f"{res.claims.count()} claims in {res.wall_sec:.1f}s")
res.docs.groupBy("doc_kind").count().orderBy("doc_kind").show()
res.metrics.groupBy("stage").sum("doc_count", "fail_count").show()
spark.stop()
