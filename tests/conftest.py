import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="session")
def spark():
    from insurance_pdf_extractor_spark.session import get_spark
    spark = get_spark(app_name="tests", master="local[4]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def fixture_rows():
    from insurance_pdf_extractor_spark.fixtures import generate_rows
    return generate_rows(64, seed=42)


@pytest.fixture(scope="session")
def web_pages(spark, fixture_rows):
    from insurance_pdf_extractor_spark.schemas import WEB_PAGES
    return spark.createDataFrame(fixture_rows, schema=WEB_PAGES).cache()


@pytest.fixture(scope="session")
def pipeline_result(spark, web_pages):
    from insurance_pdf_extractor_spark.pipeline import run_pipeline
    res = run_pipeline(spark, web_pages, output_dir=None, resume=False)
    res.docs = res.docs.cache()
    res.claims = res.claims.cache()
    return res
