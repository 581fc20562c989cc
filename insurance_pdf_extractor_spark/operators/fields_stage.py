"""Stage 3+4 — segment + field extraction (G1, §2.9 rule spotting).

A slim ``mapInPandas`` stage for the layout-dependent parts only:
policy segmentation over char offsets and ASCII-table row parsing
(both operate on the tokenize stage's text artifact). All values are
emitted as RAW STRINGS; numeric/typed normalization (C1-C9) runs as
native column expressions in finalize, where Catalyst owns it.

The relational twins of segmentation (window forward-fill, lead bounds)
are exposed separately as queries in __spark_entry__.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from .. import fields as FX
from ..schemas import CLAIM_RAW, FIELDS_OUT

_CLAIM_KEYS = [f.name for f in CLAIM_RAW.fields]


def make_fields_fn(run_id: str):
    def fields_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            policy, insured, rdate, nchunks, claims = [], [], [], [], []
            spans = []
            for text in pdf["text"]:
                try:
                    res = FX.extract_document_fields(text or "")
                except Exception:
                    res = {"policy_number": None, "insured_name": None,
                           "report_date": None, "num_chunks": 0,
                           "claims": [], "field_spans": []}
                policy.append(res["policy_number"])
                insured.append(res["insured_name"])
                rdate.append(res["report_date"])
                nchunks.append(res["num_chunks"])
                claims.append([
                    {k: c.get(k) for k in _CLAIM_KEYS} for c in res["claims"]
                ])
                spans.append(res.get("field_spans", []))
            out["policy_number"] = policy
            out["insured_name"] = insured
            out["report_date"] = rdate
            out["num_chunks"] = pd.array(nchunks, dtype="int32")
            out["claims_raw"] = claims
            out["field_spans"] = spans
            out["_metric"] = None  # lineage rows only exist on the fused path
            yield out
    return fields_fn


def extract_fields(df, run_id: str, metrics_dir=None):
    """TOKENIZED → FIELDS_OUT DataFrame (standalone unit-test path;
    metrics_dir accepted and ignored — lineage lives in fused.py)."""
    return df.mapInPandas(make_fields_fn(run_id), schema=FIELDS_OUT)
