"""Unit tests for the pure-Python PDF core (T-unit in SURVEY.md §5)."""

import random

from insurance_pdf_extractor_spark import textops
from insurance_pdf_extractor_spark.pdf import layout as L
from insurance_pdf_extractor_spark.pdf import parser as P
from insurance_pdf_extractor_spark.pdf.writer import PDFWriter


def _one_page_pdf(lines, **kw):
    w = PDFWriter()
    pg = w.add_page(**kw)
    y = 40.0
    for line in lines:
        pg.text(50, y, line)
        y += 16
    return w.tobytes()


class TestParser:
    def test_roundtrip_text(self):
        data = _one_page_pdf(["Hello world", "Second line"])
        doc = P.open_pdf(data)
        assert len(doc.pages) == 1
        texts = [r.text for r in doc.pages[0].runs]
        assert texts == ["Hello world", "Second line"]

    def test_escapes(self):
        data = _one_page_pdf([r"paren (x) and \ backslash"])
        doc = P.open_pdf(data)
        assert doc.pages[0].runs[0].text == r"paren (x) and \ backslash"

    def test_multipage_order(self):
        w = PDFWriter()
        for i in range(3):
            w.add_page().text(50, 40, f"page {i+1}")
        doc = P.open_pdf(w.tobytes())
        assert [p.number for p in doc.pages] == [1, 2, 3]
        assert doc.pages[2].runs[0].text == "page 3"

    def test_bad_pdf(self):
        res = textops.extract_pdf_document(b"%PDF-1.4 garbage no objects")
        # no pages → scanned branch with zero pages, not a crash
        assert res["doc_kind"] in ("pdf_scanned", "pdf_error")

    def test_ruling_lines(self):
        w = PDFWriter()
        pg = w.add_page()
        pg.table(50, 100, [["A", "B"], ["1", "2"]], [60, 60])
        doc = P.open_pdf(w.tobytes())
        page = doc.pages[0]
        assert len(page.hlines) == 3 and len(page.vlines) == 3


class TestLayout:
    def test_table_detection(self):
        w = PDFWriter()
        pg = w.add_page()
        pg.table(50, 100, [["Name", "Qty"], ["ant", "3"], ["bee", "7"]],
                 [80, 50])
        doc = P.open_pdf(w.tobytes())
        tables = L.detect_tables(doc.pages[0])
        assert len(tables) == 1
        assert tables[0].rows == [["Name", "Qty"], ["ant", "3"], ["bee", "7"]]

    def test_two_disjoint_tables(self):
        w = PDFWriter()
        pg = w.add_page()
        pg.table(50, 100, [["A"], ["1"]], [60])
        pg.table(50, 300, [["B"], ["2"]], [60])
        doc = P.open_pdf(w.tobytes())
        tables = L.detect_tables(doc.pages[0])
        assert len(tables) == 2
        assert tables[0].rows[0] == ["A"] and tables[1].rows[0] == ["B"]

    def test_layout_columns_preserved(self):
        w = PDFWriter()
        pg = w.add_page()
        pg.text(300, 40, "indented")
        doc = P.open_pdf(w.tobytes())
        text = L.render_layout_text(doc.pages[0].runs, 612)
        line = text.split("\n")[0]
        assert line.startswith(" " * 20)
        assert "indented" in line

    def test_rotation_vote_and_fix(self):
        w = PDFWriter()
        pg = w.add_page()
        pg.text(100, 500, "vertical text line", vertical=True)
        doc = P.open_pdf(w.tobytes())
        page = doc.pages[0]
        assert L.rotation_vote(page) == 90
        rotated, did = L.auto_rotate(page)
        assert did
        assert L.rotation_vote(rotated) == 0
        assert "vertical text line" in L.render_plain_text(rotated.runs)

    def test_word_boxes(self):
        w = PDFWriter()
        pg = w.add_page()
        pg.text(50, 40, "two words")
        doc = P.open_pdf(w.tobytes())
        boxes = L.word_boxes(doc.pages[0])
        assert [b["text"] for b in boxes] == ["two", "words"]
        assert boxes[1]["x0"] > boxes[0]["x1"] - 1e-6


class TestTextops:
    def test_format_table_framing(self):
        out = textops.format_table([["Name", "Qty"], ["ant hill", "3"]])
        lines = out.split("\n")
        assert lines[0] == "Name     | Qty"
        assert lines[1] == "---------+----"
        assert lines[2] == "ant hill | 3  "

    def test_format_table_empty(self):
        assert textops.format_table([]) == ""
        assert textops.format_table([[]]) == ""

    def test_reversal_detection(self):
        assert textops.check_if_reversed("tropeR mialC x") is True
        assert textops.check_if_reversed("tropeR only") is False
        assert textops.check_if_reversed(None) is False

    def test_reverse_text_block(self):
        assert textops.reverse_text_block("ab\ncd") == "ba\ndc"

    def test_sniff_thresholds(self):
        # <50 chars readable → scanned
        data = _one_page_pdf(["short"])
        assert textops.is_scanned(P.open_pdf(data)) is True
        data = _one_page_pdf(["This page contains a good amount of readable "
                             "text content for detection purposes."])
        assert textops.is_scanned(P.open_pdf(data)) is False

    def test_sniff_garbage_slash_codes(self):
        junk = " ".join(f"/{i%10}{(i+3)%10}" for i in range(30))
        data = _one_page_pdf([junk, junk])
        assert textops.is_scanned(P.open_pdf(data)) is True

    def test_sniff_low_alnum(self):
        junk = "!@#$ %^&* ()!! ??? ;;; ::: ~~~ |||" * 4
        data = _one_page_pdf([junk])
        assert textops.is_scanned(P.open_pdf(data)) is True

    def test_page_framing_bytes(self):
        # framing constants are the byte-parity contract
        data = _one_page_pdf(["Sufficiently long readable line of content "
                              "for the digital branch here."])
        res = textops.extract_pdf_document(data)
        t = res["text"]
        assert t.startswith("=" * 80 + "\nPDF DOCUMENT EXTRACTION (pdfplumber)\n"
                            + "=" * 80 + "\n\n")
        assert "\n" + "=" * 80 + "\nPAGE 1\n" + "=" * 80 + "\n\n" in t

    def test_blank_page_marker(self):
        w = PDFWriter()
        pg = w.add_page()
        pg.text(50, 40, "A real first page with plenty of readable text "
                        "to make the document digital.")
        w.add_page()  # empty
        res = textops.extract_pdf_document(w.tobytes())
        assert res["doc_kind"] == "pdf_digital"
        assert "[BLANK PAGE - No extractable content]" in res["text"]
        assert res["pages"][1]["confidence"] == 0.0

    def test_ocr_placeholder_and_confidence(self):
        w = PDFWriter()
        w.add_page(ocr_text="")
        w.add_page(ocr_text="OCR recovered words")
        res = textops.extract_pdf_document(w.tobytes())
        assert res["doc_kind"] == "pdf_scanned"
        assert "[No text detected on this page]" in res["pages"][0]["text"]
        assert "OCR recovered words" in res["pages"][1]["text"]
        assert all(p["confidence"] == 0.85 for p in res["pages"])

    def test_hybrid_recovery(self):
        from insurance_pdf_extractor_spark.fixtures import make_recovery_pdf
        res = textops.extract_pdf_document(make_recovery_pdf(random.Random(5)))
        assert res["fallback_used"] is True
        assert len(res["recovered_claims"]) == 1
        rid = res["recovered_claims"][0]
        assert "RECOVERY DATA (Secondary Extraction)" in res["text"]
        assert "--- RECOVERED CONTENT (Page 1) ---" in res["text"]
        assert rid in res["text"]

    def test_classify_bytes(self):
        assert textops.classify_bytes(b"%PDF-1.4") == "pdf"
        assert textops.classify_bytes(b"<!DOCTYPE html><html>") == "html"
        assert textops.classify_bytes(b"") == "empty"
        assert textops.classify_bytes(None) == "empty"
        assert textops.classify_bytes(b"\x00\x01junk") == "other"
