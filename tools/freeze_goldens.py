"""Freeze byte-parity goldens for the fixture corpus.

Runs the pure-Python extraction core (NOT Spark) over the deterministic
fixture documents and writes per-url golden text + claims JSON under
tests/golden/. The Spark pipeline's output is then asserted byte-identical
against these files (T-golden in SURVEY.md §5).

Run once: python tools/freeze_goldens.py
Re-running must be a no-op unless extraction semantics intentionally
changed (the test suite will tell you which urls drifted).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from insurance_pdf_extractor_spark import fixtures as FX  # noqa: E402
from insurance_pdf_extractor_spark import html_extract, textops  # noqa: E402
from insurance_pdf_extractor_spark.fields import extract_document_fields  # noqa: E402

GOLDEN_DOCS = 64
SEED = 42
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def extract_row(row: dict) -> dict:
    kind0 = (textops.classify_bytes(row["html"]) if row["html"] is not None
             else ("text" if row["text"] is not None else "empty"))
    if kind0 == "pdf":
        res = textops.extract_pdf_document(row["html"])
    elif kind0 == "html":
        res = html_extract.extract_html_document(row["html"])
    elif kind0 == "text":
        res = {"doc_kind": "text", "text": row["text"]}
    else:
        res = {"doc_kind": kind0, "text": ""}
    return res


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    rows = FX.generate_rows(GOLDEN_DOCS, seed=SEED)
    manifest = {}
    for i, row in enumerate(rows):
        res = extract_row(row)
        fields = extract_document_fields(res["text"] or "")
        slug = f"{i:03d}_{row['url'].rsplit('/', 2)[-2]}"
        txt_path = os.path.join(OUT_DIR, slug + ".txt")
        with open(txt_path, "w", encoding="utf-8") as f:
            f.write(res["text"] or "")
        manifest[row["url"]] = {
            "file": slug + ".txt",
            "doc_kind": res["doc_kind"],
            "sha256": hashlib.sha256(
                (res["text"] or "").encode("utf-8")).hexdigest(),
            "n_raw_claims": len(fields["claims"]),
            "policy_number": fields["policy_number"],
            "insured_name": fields["insured_name"],
        }
    with open(os.path.join(OUT_DIR, "manifest.json"), "w",
              encoding="utf-8") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"froze {len(manifest)} goldens → {os.path.abspath(OUT_DIR)}")


if __name__ == "__main__":
    main()
