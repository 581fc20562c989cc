"""Winnowing fingerprints (funcs.winnow_fingerprints): native expression
vs a pure-python reference, plus the winnowing guarantee."""

import hashlib

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark import funcs as C

K, W = 8, 4


def _ref(text: str, k: int = K, w: int = W) -> list[str]:
    if len(text) < w + k - 1:
        return []
    hashes = [hashlib.md5(text[i:i + k].encode()).hexdigest()
              for i in range(len(text) - k + 1)]
    out = []
    for j in range(len(hashes) - w + 1):
        out.append(min(hashes[j:j + w]))
    seen: list[str] = []
    for h in out:
        if h not in seen:
            seen.append(h)
    return seen


def _spark_fp(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    return [r["fp"] for r in
            df.select(C.winnow_fingerprints("text").alias("fp")).collect()]


class TestWinnowing:
    def test_matches_python_reference(self, spark):
        texts = ["the quick brown fox jumps over the lazy dog",
                 "claim number 12345678 paid in full",
                 "aaaaaaaaaaaaaaaaaaaa", "short", ""]
        got = _spark_fp(spark, texts)
        assert got == [_ref(t) for t in texts]

    def test_property_matches_reference(self, spark):
        from hypothesis import given, settings, strategies as st

        texts_batch = []

        @given(st.text(alphabet=st.characters(min_codepoint=32,
                                              max_codepoint=126),
                       max_size=80))
        @settings(max_examples=60, deadline=None)
        def collect(t):
            texts_batch.append(t)

        collect()
        got = _spark_fp(spark, texts_batch)
        assert got == [_ref(t) for t in texts_batch]

    def test_winnowing_guarantee(self, spark):
        """Docs sharing a substring of length >= w+k-1 share >= 1
        fingerprint."""
        shared = "INSURANCE LOSS RUN REPORT SECTION"  # len 33 >= 11
        a = "prefix one " + shared + " suffix alpha"
        b = "different start " + shared + " other end"
        fa, fb = _spark_fp(spark, [a, b])
        assert set(fa) & set(fb)

    def test_disjoint_docs_rarely_collide(self, spark):
        fa, fb = _spark_fp(spark, ["x" * 40, "y" * 40])
        assert not (set(fa) & set(fb))
