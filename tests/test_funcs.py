"""Native column functions (§2.9) vs hand-computed expectations."""

import pytest
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark import funcs as C


def _eval(spark, col, rows, colname="v"):
    df = spark.createDataFrame([(r,) for r in rows], [colname])
    return [r[0] for r in df.select(col.alias("out")).collect()]


def test_currency_clean(spark):
    out = _eval(spark, C.currency_clean(F.col("v")),
                ["$51,068.57", "1,234.00", "12.5", "", None, "N/A", "abc"])
    assert out == [51068.57, 1234.00, 12.5, 0.0, 0.0, 0.0, 0.0]


def test_status_normalize(spark):
    out = _eval(spark, C.status_normalize(F.col("v")),
                ["C", "cl", " CLOSED ", "O", "op", "OPEN", "R", "rc",
                 "REOP", "REOPENED", "weird", None])
    assert out == ["Closed", "Closed", "Closed", "Open", "Open", "Open",
                   "Reopened", "Reopened", "Reopened", "Reopened",
                   "WEIRD", None]


def test_injury_type_normalize(spark):
    out = _eval(spark, C.injury_type_normalize(F.col("v")),
                ["COMP", "ttd", "TPD", "ppd", "Indemnity", "INDEM ONLY",
                 "MED", "Medical Only", "other"])
    assert out == ["COMP"] * 6 + ["MED", "MED", "other"]


def test_claim_year(spark):
    out = _eval(spark, C.claim_year(F.col("v")),
                ["2023-05-18", "05/18/1999", "no year", "", None, "2101-01-01"])
    assert out == [2023, 1999, None, None, None, None]


def test_name_last_first(spark):
    out = _eval(spark, C.name_last_first(F.col("v")),
                ["John Smith", "John M. Smith", "Smith, John", "Cher", "",
                 None, "  Ana  Lima  "])
    assert out == ["Smith, John", "Smith, John M.", "Smith, John", "Cher",
                   None, None, "Lima, Ana"]


def test_phantom_predicate(spark):
    out = _eval(spark, C.is_phantom_name(F.col("v")),
                ["Smith, John", "john smith", "Watson, Glenn", "Real Person",
                 "a placeholder name", "TEST PERSON x", None])
    # "Smith, John" ESCAPES: the reference's list has "john smith" but not
    # "smith john", and names are normalized to "Last, First" before the
    # filter (reference insurance_extractor.py:1191-1235) — kept faithfully.
    assert out == [False, True, True, False, True, True, False]


def test_token_estimate(spark):
    out = _eval(spark, C.token_estimate(F.col("v")), ["abcd" * 10, "", None])
    assert out == [10, 0, 0]


def test_reverse_lines(spark):
    out = _eval(spark, C.reverse_lines(F.col("v")), ["ab\ncd", "x"])
    assert out == ["ba\ndc", "x"]


def test_looks_reversed(spark):
    out = _eval(spark, C.looks_reversed(F.col("v")),
                ["tropeR mialC", "tropeR only", "ssol diap mixed case", None])
    assert out == [True, False, True, False]


def test_med_guardrail(spark):
    df = spark.createDataFrame([("MED", 5.0), ("COMP", 5.0)], ["t", "x"])
    out = [r[0] for r in df.select(
        C.med_guardrail(F.col("t"), F.col("x")).alias("o")).collect()]
    assert out == [0.0, 5.0]


def test_retry_plan_array_variant(spark):
    """Engine-side O5 plan carries claim_ids as array<string>; the
    registered oracle query renders the same plan as CSV."""
    import __spark_entry__ as E
    arr = E.retry_plan(spark, None)
    assert dict(arr.dtypes)["claim_ids"] == "array<string>"
    rows = {(r["url"], r["batch_no"]): r["claim_ids"]
            for r in arr.collect()}
    assert rows[("u1", 0)] == ["11", "13", "14", "15", "16"]
    assert rows[("u3", 0)] == ["41", "42", "43", "44", "45"]
    assert rows[("u3", 1)] == ["46"]
    csv = {(r["url"], r["batch_no"]): r["claim_ids"]
           for r in E.q_retry_batches(spark, None).collect()}
    assert csv[("u1", 0)] == "11,13,14,15,16"


def test_bpe_ish_token_count(spark):
    out = _eval(spark, C.bpe_ish_token_count(F.col("v")),
                ["it's a test, 123 dogs!", "", None, "hello world"])
    # 'it's'→[it]['s], ' a', ' test', ',', ' 123', ' dogs', '!' = 8
    assert out == [8, 0, 0, 2]
