"""Freeze the pipeline_fixture_claims expected output to a golden parquet
the DuckDB oracle SELECTs (tests/golden/oracle/fixture_claims.parquet).

The fixture corpus is synthetic PDFs whose parse cannot be re-expressed
in SQL; freezing locks the full claims pipeline (tokenize → fields →
finalize typing/repairs/dedup) as a regression contract. The text layer
is independently verified (tests/golden byte parity + framing parity vs
the reference's shipped artifacts), and tests/test_frozen_oracle.py
fails whenever this file goes stale vs the live pipeline.

Re-run after ANY intentional extraction/normalization semantics change:
    python tools/freeze_oracle_parquet.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN = os.path.join(os.path.dirname(__file__), "..",
                      "tests", "golden", "oracle",
                      "fixture_claims.parquet")


def main() -> None:
    import __spark_entry__ as E
    from insurance_pdf_extractor_spark.session import get_spark
    spark = get_spark(app_name="freeze-oracle", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    df = E.q_pipeline_fixture_claims(spark, "/root/testdata/sf0.01")
    pdf = df.toPandas().sort_values(
        ["url", "claim_number"]).reset_index(drop=True)
    os.makedirs(os.path.dirname(os.path.abspath(GOLDEN)), exist_ok=True)
    pdf.to_parquet(os.path.abspath(GOLDEN), index=False)
    print(f"froze {len(pdf)} claims rows -> {os.path.abspath(GOLDEN)}")
    spark.stop()


if __name__ == "__main__":
    main()
