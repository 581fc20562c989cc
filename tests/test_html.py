"""T10 — HTML boilerplate strip."""

from insurance_pdf_extractor_spark.html_extract import (
    extract_html_document, extract_main_content)

PAGE = b"""<!DOCTYPE html>
<html><head><title>t</title><script>var x=1;</script></head><body>
<nav><ul><li><a href="/a">Home</a></li><li><a href="/b">About</a></li></ul></nav>
<article>
<h1>A heading</h1>
<p>This paragraph carries the real content of the page and is long enough.</p>
<p>short</p>
<p><a href="/x">link</a> <a href="/y">another link</a> <a href="/z">third</a></p>
</article>
<footer><a href="/p">Privacy</a> and <a href="/t">Terms</a></footer>
</body></html>"""


def test_keeps_content_drops_chrome():
    text = extract_main_content(PAGE.decode())
    assert "real content of the page" in text
    assert "Home" not in text            # nav dropped wholesale
    assert "Privacy" not in text         # footer dropped
    assert "var x=1" not in text         # script dropped
    assert "short" not in text           # below MIN_CHARS
    assert "another link" not in text    # link-dense block


def test_heading_attaches_to_content():
    text = extract_main_content(PAGE.decode())
    assert text.startswith("A heading")


def test_document_shape():
    res = extract_html_document(PAGE)
    assert res["doc_kind"] == "html"
    assert res["text"].startswith("=" * 80 + "\nHTML DOCUMENT EXTRACTION")
    assert len(res["pages"]) == 1
    assert res["pages"][0]["extraction_method"] == "html"


def test_malformed_html_no_crash():
    res = extract_html_document(b"<html><p>unclosed <div><<<>>")
    assert res["doc_kind"] == "html"


def test_whitespace_normalized():
    text = extract_main_content(
        "<html><body><p>many   spaces\n and\t\ttabs make one normalized "
        "sentence of sufficient length</p></body></html>")
    assert "  " not in text


def test_unclosed_trailing_block_is_flushed():
    # EOF flush: content in a block never closed (malformed HTML) must
    # still be extracted when it passes the density rules
    body = ("main article content that dominates the page and was never "
            "closed because the generator died mid-write")
    text = extract_main_content(
        f'<html><body><nav><a href="/">Home</a></nav><p>{body}')
    assert body in text
    # nested unclosed blocks flush in open order
    text2 = extract_main_content(
        "<div>outer block text long enough to pass the minimum chars rule"
        "<p>inner paragraph also long enough to pass the rules easily here")
    assert text2.index("outer") < text2.index("inner")
