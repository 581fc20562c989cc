"""Entry smoke, skew resilience, oversize cap, parser fuzzing."""

import random

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark.fixtures import make_loss_run_pdf
from insurance_pdf_extractor_spark.textops import extract_pdf_document


def test_entry_smoke(spark):
    """The driver's smoke contract: entry(spark) runs and yields rows."""
    import __spark_entry__ as E
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["url", "doc_kind", "total_pages", "total_claims",
                          "text_chars", "validation_complete"]
    kinds = {r["doc_kind"] for r in rows}
    assert kinds == {"html"}  # documents wrapped as HTML pages


def test_heavy_tail_giant_doc(spark):
    """One 120-page doc among 1-pagers: the pipeline finishes and the
    giant doc extracts fully (per-doc granularity is the floor — hash
    partitioning spreads the rest)."""
    from insurance_pdf_extractor_spark.pdf.writer import PDFWriter
    from insurance_pdf_extractor_spark.pipeline import run_pipeline
    from insurance_pdf_extractor_spark.schemas import WEB_PAGES
    w = PDFWriter()
    for p in range(120):
        pg = w.add_page()
        pg.text(50, 40, f"Giant document page {p + 1} with enough readable "
                        "text to stay on the digital extraction path.")
    giant = w.tobytes()
    rng = random.Random(0)
    import datetime as dt
    rows = [{"url": f"https://t/small/{i}", "warc_ts": dt.datetime(2024, 1, 1),
             "html": make_loss_run_pdf(rng), "text": None, "lang": "en"}
            for i in range(30)]
    rows.append({"url": "https://t/giant/0", "warc_ts": dt.datetime(2024, 1, 1),
                 "html": giant, "text": None, "lang": "en"})
    web = spark.createDataFrame(rows, schema=WEB_PAGES)
    res = run_pipeline(spark, web, output_dir=None, resume=False,
                       num_partitions=8, repartition="always")
    docs = {r["url"]: r for r in res.docs.collect()}
    assert len(docs) == 31
    assert docs["https://t/giant/0"]["total_pages"] == 120
    assert len(docs["https://t/giant/0"]["text"]) > 120 * 80


def test_oversize_cap(spark):
    from insurance_pdf_extractor_spark.pipeline import run_pipeline
    from insurance_pdf_extractor_spark.schemas import WEB_PAGES
    import datetime as dt
    big = b"%PDF-" + b"\x00" * (51 * 1024 * 1024)
    rows = [{"url": "https://t/big", "warc_ts": dt.datetime(2024, 1, 1),
             "html": big, "text": None, "lang": "en"}]
    web = spark.createDataFrame(rows, schema=WEB_PAGES)
    res = run_pipeline(spark, web, output_dir=None, resume=False)
    row = res.docs.collect()[0]
    assert row["doc_kind"] == "oversize"
    assert row["error"] and "50 MB" in row["error"]
    assert row["total_claims"] == 0


class TestParserFuzz:
    """extract_pdf_document must NEVER raise — at 100 TB the wild web
    sends every possible corruption; failures are lineage rows, not
    job aborts."""

    @settings(max_examples=60, deadline=None)
    @given(st.integers(0, 2**31 - 1), st.integers(1, 40))
    def test_mutated_pdfs_never_raise(self, seed, n_mut):
        rng = random.Random(seed)
        data = bytearray(make_loss_run_pdf(rng))
        for _ in range(n_mut):
            pos = rng.randrange(5, len(data))  # keep %PDF- magic
            data[pos] = rng.randrange(256)
        res = extract_pdf_document(bytes(data))
        assert isinstance(res["text"], str)
        assert isinstance(res["pages"], list)

    @settings(max_examples=40, deadline=None)
    @given(st.binary(min_size=0, max_size=4096))
    def test_random_bytes_never_raise(self, blob):
        res = extract_pdf_document(b"%PDF-1.4\n" + blob)
        assert isinstance(res["text"], str)

    @settings(max_examples=30, deadline=None)
    @given(st.integers(0, 2**31 - 1))
    def test_truncated_pdfs_never_raise(self, seed):
        rng = random.Random(seed)
        data = make_loss_run_pdf(rng)
        cut = rng.randrange(5, len(data))
        res = extract_pdf_document(data[:cut])
        assert isinstance(res["text"], str)


class TestPurePropertyRound2:
    @given(st.text(max_size=2000))
    @settings(max_examples=150, deadline=None)
    def test_html_extractor_never_raises(self, text):
        # incl. unclosed tags / random angle brackets (EOF-flush path)
        from insurance_pdf_extractor_spark.html_extract import (
            extract_html_document)
        res = extract_html_document(text.encode("utf-8", "replace"))
        assert res["doc_kind"] == "html"
        assert isinstance(res["text"], str)

    @given(st.lists(
        st.lists(st.one_of(st.none(),
                           st.text(alphabet=st.characters(
                               blacklist_characters="|\n",
                               blacklist_categories=("Cs",)),
                               max_size=12)),
                 min_size=1, max_size=5),
        min_size=1, max_size=6))
    @settings(max_examples=150, deadline=None)
    def test_format_table_roundtrip_property(self, table):
        """Any rectangular cell grid must survive format -> de-format
        (the inverse used against the reference's shipped tables)."""
        from insurance_pdf_extractor_spark import textops
        ncols = len(table[0])
        table = [list(r[:ncols]) + [None] * (ncols - len(r))
                 for r in table]
        out = textops.format_table(table)
        if not out:
            return
        lines = out.split("\n")
        # ambiguous recovery when a stripped cell still contains ' | '
        grid = [[c.strip() for c in ln.split(" | ")]
                for i, ln in enumerate(lines) if i != 1]
        if any(len(r) != ncols for r in grid):
            return
        expect = [[(str(c).strip() if c else "") for c in row]
                  for row in table]
        assert grid == expect


class TestParserStructuredCorruption:
    """Targeted structural corruptions (r2 verdict item 8): wrong stream
    lengths, corrupted xref offsets, missing trailer/startxref — the
    parser must degrade to partial/empty text, never raise."""

    @settings(max_examples=40, deadline=None)
    @given(st.integers(0, 2**31 - 1))
    def test_bad_stream_lengths_never_raise(self, seed):
        import re as _re
        rng = random.Random(seed)
        data = make_loss_run_pdf(rng)
        wrong = str(rng.randrange(0, 99999)).encode()
        mutated = _re.sub(rb"/Length \d+", b"/Length " + wrong, data)
        res = extract_pdf_document(mutated)
        assert isinstance(res["text"], str)
        assert isinstance(res["pages"], list)

    @settings(max_examples=40, deadline=None)
    @given(st.integers(0, 2**31 - 1))
    def test_corrupt_xref_offsets_never_raise(self, seed):
        rng = random.Random(seed)
        data = bytearray(make_loss_run_pdf(rng))
        i = bytes(data).find(b"xref")
        if i != -1:
            for k in range(i, min(i + 300, len(data))):
                if 48 <= data[k] <= 57 and rng.random() < 0.4:
                    data[k] = 48 + rng.randrange(10)
        res = extract_pdf_document(bytes(data))
        assert isinstance(res["text"], str)

    def test_missing_trailer_and_startxref(self):
        rng = random.Random(7)
        data = make_loss_run_pdf(rng)
        for marker in (b"trailer", b"startxref", b"xref"):
            i = data.find(marker)
            assert i > 0
            res = extract_pdf_document(data[:i])
            assert isinstance(res["text"], str)


class TestDiscoveryProperties:
    """The round-3 discovery rules and multirow parser are per-doc Python
    inside mapInPandas — total functions over arbitrary text."""

    @given(st.text(max_size=300))
    @settings(max_examples=200, deadline=None)
    def test_discover_line_claim_total_and_blacklist_safe(self, line):
        from insurance_pdf_extractor_spark import fields
        got = fields.discover_line_claim(line)
        if got is not None:
            token, rule = got
            assert token
            assert not token.upper().startswith(("CRWC", "SWC", "TWC"))
            assert rule in ("converted", "claim_label",
                            "homestates_8digit")

    @given(st.text(max_size=2000))
    @settings(max_examples=100, deadline=None)
    def test_extract_document_fields_total(self, text):
        from insurance_pdf_extractor_spark import fields
        res = fields.extract_document_fields(text)
        for c in res["claims"]:
            assert c["claim_number"]
            assert not str(c["claim_number"]).upper().startswith(
                ("CRWC", "SWC", "TWC"))

    @given(st.text(max_size=1500))
    @settings(max_examples=100, deadline=None)
    def test_multirow_parser_never_raises(self, text):
        from insurance_pdf_extractor_spark import fields
        assert isinstance(fields.claims_from_multirow(text), list)
        assert fields.analyze_format(text) in (
            "simple_columns", "complex_multi_row", "unknown")
