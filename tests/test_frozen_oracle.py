"""Staleness gate for the frozen fixture-claims oracle golden: any
extraction/normalization semantics change must re-run
tools/freeze_oracle_parquet.py, and this test fails until it does."""

import os

import pandas as pd
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "oracle",
                      "fixture_claims.parquet")


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="golden not frozen yet")
def test_fixture_claims_golden_fresh(spark):
    import __spark_entry__ as E
    live = (E.q_pipeline_fixture_claims(spark, "/root/testdata/sf0.01")
            .toPandas().sort_values(["url", "claim_number"])
            .reset_index(drop=True))
    frozen = (pd.read_parquet(GOLDEN)
              .sort_values(["url", "claim_number"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(live[frozen.columns], frozen,
                                  check_dtype=False)
