"""T-golden — byte-parity of extracted text per url vs frozen goldens.

The per-row invariant mandated by BASELINE.json: byte-identical extracted
text per url. Goldens were frozen by tools/freeze_goldens.py from the
pure-Python core; here BOTH the core and the full Spark pipeline must
reproduce them exactly.
"""

import hashlib
import json
import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="session")
def manifest():
    with open(os.path.join(GOLDEN_DIR, "manifest.json"), encoding="utf-8") as f:
        return json.load(f)


def test_manifest_covers_corpus(manifest, fixture_rows):
    assert len(manifest) == len(fixture_rows) == 64
    kinds = {v["doc_kind"] for v in manifest.values()}
    assert {"pdf_digital", "pdf_scanned", "html", "text"} <= kinds


def test_pure_python_byte_parity(manifest, fixture_rows):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from freeze_goldens import extract_row
    for row in fixture_rows:
        res = extract_row(row)
        entry = manifest[row["url"]]
        got = hashlib.sha256((res["text"] or "").encode("utf-8")).hexdigest()
        assert got == entry["sha256"], f"text drift for {row['url']}"


def test_spark_pipeline_byte_parity(manifest, pipeline_result):
    rows = pipeline_result.docs.select("url", "text").collect()
    assert len(rows) == len(manifest)
    for r in rows:
        entry = manifest[r["url"]]
        with open(os.path.join(GOLDEN_DIR, entry["file"]), encoding="utf-8") as f:
            golden = f.read()
        assert (r["text"] or "") == golden, f"Spark text drift for {r['url']}"


def test_spark_raw_claim_counts_match_golden(manifest, pipeline_result,
                                             spark):
    # n_raw_claims in the manifest is pre-dedup/pre-phantom; compare against
    # the fields stage output (claims_raw sizes) via docs' num_chunks proxy:
    # recompute raw counts from golden text through the pure parser instead.
    from insurance_pdf_extractor_spark.fields import extract_document_fields
    for url, entry in manifest.items():
        with open(os.path.join(GOLDEN_DIR, entry["file"]), encoding="utf-8") as f:
            golden = f.read()
        assert len(extract_document_fields(golden)["claims"]) == \
            entry["n_raw_claims"]
