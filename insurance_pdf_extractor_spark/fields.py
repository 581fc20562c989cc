"""Rule-based field extraction: policy segmentation + claims spotting.

Deterministic replacements for the reference's GPT-4o stages
(SURVEY.md §2.12). The specs are the reference's own prompts/fallbacks:

- Policy-boundary detection: spot ``Policy Number / Policy # / Pol #``
  headers, value possibly on the NEXT line; locate by char index; sort;
  dedup by index; split into [start_i, start_{i+1}) slices with an
  "Initial Section" pre-chunk (reference backend/chunked_extractor.py:15-122).
- Claims extraction: parse ``[TABLE n]`` blocks emitted by the tokenize
  stage, map header labels to canonical fields via an alias table
  (reference backend/config.py:49-58), emit one raw-string claim dict per
  data row. Line-grain regex spotting is the fallback for OCR/plain-text
  documents.

All values stay RAW STRINGS here; typing/normalization (C1-C9) happens as
native Spark column expressions in the finalize stage, where Catalyst and
whole-stage codegen handle them.
"""

from __future__ import annotations

import re

# label → canonical field (superset of reference backend/config.py:49-58)
FIELD_ALIASES: dict[str, str] = {}
for canon, labels in {
    "claim_number": ["claim number", "claim #", "claim id", "claim no",
                     "file number", "file #", "case #"],
    "employee_name": ["employee name", "claimant", "name", "worker name"],
    "status": ["status", "claim status", "current status"],
    "injury_date_time": ["date of injury", "doi", "injury date",
                         "accident date", "date of loss"],
    "injury_type": ["injury type", "nature of injury", "type of injury",
                    "nature"],
    "body_part": ["body part", "part of body", "body part affected",
                  "injured body part"],
    "claim_class": ["class", "claim class", "classification"],
    "injury_description": ["description", "injury description", "details",
                           "accident description"],
    "medical_paid": ["medical paid", "med paid", "paid medical"],
    "medical_reserve": ["medical reserve", "med resv", "med reserve",
                        "est. medical", "estimated medical"],
    "indemnity_paid": ["ind paid", "indemnity paid", "paid compensation",
                       "paid comp"],
    "indemnity_reserve": ["ind resv", "indemnity reserve", "est. comp",
                          "estimated compensation"],
    "expense_paid": ["expense paid", "exp paid"],
    "expense_reserve": ["expense reserve", "exp resv"],
    "recovery": ["recovery", "subro", "subrogation"],
    "deductible": ["deductible", "ded"],
    "total_incurred": ["total incurred", "total", "total paid", "incurred"],
}.items():
    for lab in labels:
        FIELD_ALIASES[lab] = canon

CLAIM_FIELDS = ["claim_number", "employee_name", "status", "injury_date_time",
                "injury_type", "body_part", "claim_class",
                "injury_description", "medical_paid", "medical_reserve",
                "indemnity_paid", "indemnity_reserve", "expense_paid",
                "expense_reserve", "recovery", "deductible", "total_incurred",
                "extraction_source"]

# label matches case-insensitively; the VALUE must be an uppercase id
# containing a digit (a bare re.IGNORECASE let prose like
# 'Policy Number: see attached' capture 'see' as a policy id)
POLICY_HEADER_RE = re.compile(
    r"(?i:Policy\s*(?:Number|#|No\.?)|Pol\s*#)\s*:?[ \t]*"
    r"((?=[A-Z0-9\-]*\d)[A-Z0-9][A-Z0-9\-]{2,})?")
NEXT_LINE_VALUE_RE = re.compile(
    r"\s*\n[ \t]*((?=[A-Z0-9\-]*\d)[A-Z0-9][A-Z0-9\-]{2,})")
INSURED_RE = re.compile(r"Insured(?:\s*Name)?\s*:\s*(.+?)\s*$",
                        re.IGNORECASE | re.MULTILINE)
REPORT_DATE_RE = re.compile(
    r"(?:Report\s+produced\s+on|Report\s+Date\s*:?)\s*([0-9/\-]{8,10})",
    re.IGNORECASE)
LINE_CLAIM_RE = re.compile(
    r"Claim(?:\s*Number|#)?\s*[:#]?\s*([A-Z]?\d[A-Z0-9\-]{3,})",
    re.IGNORECASE)
# discovery-stage rules (reference backend/insurance_extractor.py:180-216)
CONVERTED_RE = re.compile(
    r"Converted\s*#\s*:?\s*([A-Z0-9][A-Z0-9\-]{2,})", re.IGNORECASE)
HOMESTATES_RE = re.compile(r"\b(\d{8})\b")  # 8-digit integer claim ids
POLICY_PREFIX_BLACKLIST = ("CRWC", "SWC", "TWC")  # policy ids, never claims
INCIDENT_NAME_RE = re.compile(r"[A-Z][a-z]+,\s+[A-Z][a-z]+"
                              r"|[A-Z][a-z]+\s+[A-Z][a-z]+")
# capitalized-word pairs that are document labels, not person names —
# without this, 'Claim Number 540324B' yields employee_name='Claim
# Number' and a header like 'Loss Run' passes the incident gate
_NON_NAME_WORDS = frozenset(
    "claim claims number status policy loss run report date total "
    "summary converted reference page open closed reopened insured "
    "analysis paid reserve recovery incurred medical expense".split())


def _incident_name(line: str) -> str | None:
    """First capitalized-pair in the line that isn't made of label
    words; None when the line has no plausible person name."""
    for m in INCIDENT_NAME_RE.finditer(line):
        words = re.split(r"[,\s]+", m.group(0).strip())
        if all(w.lower() not in _NON_NAME_WORDS for w in words if w):
            return m.group(0)
    return None
LINE_STATUS_RE = re.compile(
    r"\b(OPEN|CLOSED|REOPENED|REOP|OP|CL)\b", re.IGNORECASE)
LINE_DATE_RE = re.compile(r"\b(\d{4}-\d{2}-\d{2}|\d{2}/\d{2}/\d{4})\b")
TABLE_BLOCK_RE = re.compile(
    r"\[TABLE \d+\]\n-{80}\n(.*?)\n-{80}", re.DOTALL)


# --------------------------------------------------------------------------
# G1 — policy segmentation
# --------------------------------------------------------------------------

def detect_policy_boundaries(text: str) -> list[dict]:
    """[{policy_number, start_index, value_start, value_end}] sorted and
    index-deduped. start_index is the HEADER offset (chunk boundary);
    value_start/value_end delimit the id itself (span artifact)."""
    boundaries = []
    scan = text if len(text) < 100_000 else text[:100_000]
    for m in POLICY_HEADER_RE.finditer(scan):
        value = m.group(1)
        if value:
            v_start, v_end = m.start(1), m.end(1)
        else:
            m2 = NEXT_LINE_VALUE_RE.match(scan, m.end())
            if m2:
                value = m2.group(1)
                v_start, v_end = m2.start(1), m2.end(1)
        if not value:
            continue
        boundaries.append({"policy_number": value, "start_index": m.start(),
                           "value_start": v_start, "value_end": v_end})
    boundaries.sort(key=lambda b: b["start_index"])
    out, last = [], -1
    for b in boundaries:
        if b["start_index"] != last:
            out.append(b)
            last = b["start_index"]
    return out


def split_into_chunks(text: str, boundaries: list[dict]) -> list[dict]:
    """[{policy_number, text, start_index}] per reference
    backend/chunked_extractor.py:95-122 (incl. the 'Initial Section')."""
    if not boundaries:
        return [{"policy_number": "Unknown", "text": text, "start_index": 0}]
    chunks = []
    if boundaries[0]["start_index"] > 10:
        pre = text[:boundaries[0]["start_index"]].strip()
        if pre:
            chunks.append({"policy_number": "Initial Section", "text": pre,
                           "start_index": 0})
    for i, b in enumerate(boundaries):
        end = (boundaries[i + 1]["start_index"] if i + 1 < len(boundaries)
               else len(text))
        chunks.append({"policy_number": b["policy_number"],
                       "text": text[b["start_index"]:end].strip(),
                       "start_index": b["start_index"]})
    return chunks


# --------------------------------------------------------------------------
# §2.12 stage-1 format analysis (reference insurance_extractor.py:591-656)
# --------------------------------------------------------------------------

_SIMPLE_KEYWORDS = ["MED PAID", "MED RESV", "IND PAID", "IND RESV",
                    "EXP PAID", "TOTAL INCURRED"]


def analyze_format(text: str) -> str:
    """simple_columns | complex_multi_row | unknown — the deterministic
    twin of the reference's GPT format-analysis stage; the verdict picks
    the parsing strategy in :func:`extract_claims` (the reference builds
    format-conditional prompts, insurance_extractor.py:700-770)."""
    up = text.upper()
    hits = sum(1 for k in _SIMPLE_KEYWORDS if k in up)
    if hits >= 2:
        return "simple_columns"
    if "PAYMENTS" in up and "RESERVES" in up:
        return "complex_multi_row"
    return "unknown"


# --------------------------------------------------------------------------
# claim-number discovery rules (reference insurance_extractor.py:180-216)
# --------------------------------------------------------------------------

def _is_blacklisted(token: str) -> bool:
    """CRWC* / SWC* / TWC* ids are POLICY numbers, never claims
    (Berkshire Homestates/Redwood blacklist)."""
    up = token.upper()
    return any(up.startswith(p) for p in POLICY_PREFIX_BLACKLIST)


def discover_line_claim(line: str) -> tuple[str, str] | None:
    """(claim_number, rule) for one text line, or None.

    Rule precedence mirrors the reference's discovery instructions:
    ``Converted #`` values are ALWAYS the claim number; then an explicit
    ``Claim #`` label; then the Homestates format (a bare 8-digit integer
    is a claim id ONLY when the line carries incident data — a name or a
    date; 'strict validation' in the reference prompt). Policy-labeled
    lines and blacklist-prefixed tokens never yield a claim."""
    if re.search(r"(?i:Policy\s*(?:Number|#|No\.?)|Pol\s*#)", line):
        return None
    m = CONVERTED_RE.search(line)
    if m and not _is_blacklisted(m.group(1)):
        return m.group(1), "converted"
    m = LINE_CLAIM_RE.search(line)
    if m and re.search(r"\d", m.group(1)) and not _is_blacklisted(m.group(1)):
        return m.group(1), "claim_label"
    if _incident_name(line) or LINE_DATE_RE.search(line):
        m = HOMESTATES_RE.search(line)
        if m:
            return m.group(1), "homestates_8digit"
    return None


def repeated_policy_numbers(claims: list[dict]) -> set[str]:
    """The reference's GOLDEN RULE: a number appearing as the id of
    MULTIPLE different employees (or on every page as a header) is a
    POLICY number, not a claim number. Applied to line-grain discovery
    output only — table rows are structurally one-claim-per-row."""
    def canon(name: str) -> str:
        # 'Smith, John' and 'John Smith' are the SAME person — compare
        # as a sorted token set so surface-form variation across lines
        # doesn't fake a multi-employee id (code-review r3 finding)
        toks = [t for t in re.split(r"[,\s.]+", name.lower()) if t]
        return " ".join(sorted(toks))

    names_per_id: dict[str, set[str]] = {}
    for c in claims:
        cid = c.get("claim_number")
        if not cid:
            continue
        name = canon(c.get("employee_name") or "")
        names_per_id.setdefault(cid, set()).add(name)
    return {cid for cid, names in names_per_id.items()
            if len({n for n in names if n}) > 1}


# --------------------------------------------------------------------------
# claims spotting
# --------------------------------------------------------------------------

def parse_ascii_table(block: str) -> list[list[str]]:
    """Parse a ljust/' | '-joined table back into rows of stripped cells."""
    rows = []
    for line in block.split("\n"):
        if re.fullmatch(r"[-+\s]*", line):
            continue  # the -+- header rule
        rows.append([c.strip() for c in line.split(" | ")])
    return rows


def _map_header(cells: list[str]) -> dict[int, str] | None:
    mapping: dict[int, str] = {}
    for i, cell in enumerate(cells):
        canon = FIELD_ALIASES.get(cell.lower().strip().rstrip(":"))
        if canon and canon not in mapping.values():
            mapping[i] = canon
    if "claim_number" not in mapping.values() or len(mapping) < 3:
        return None
    return mapping


def claims_from_tables(text: str) -> list[dict]:
    claims = []
    for m in TABLE_BLOCK_RE.finditer(text):
        rows = parse_ascii_table(m.group(1))
        if not rows:
            continue
        mapping = _map_header(rows[0])
        if not mapping:
            continue
        for row in rows[1:]:
            claim = {f: None for f in CLAIM_FIELDS}
            for i, canon in mapping.items():
                if i < len(row) and row[i]:
                    claim[canon] = row[i]
            if claim["claim_number"]:
                claim["extraction_source"] = "table"
                claims.append(claim)
    return claims


def claims_from_lines(text: str) -> list[dict]:
    """Fallback spotter for OCR / pre-extracted plain text, applying the
    discovery exclusion rules (Converted # capture, Homestates 8-digit,
    CRWC/SWC/TWC blacklist, policy-label exclusion) plus the
    repeated-number ⇒ policy heuristic across the whole text."""
    claims = []
    for line in text.split("\n"):
        found = discover_line_claim(line)
        if not found:
            continue
        token, rule = found
        claim = {f: None for f in CLAIM_FIELDS}
        claim["claim_number"] = token
        claim["extraction_source"] = "line"
        rest = line[line.find(token) + len(token):]
        ms = LINE_STATUS_RE.search(rest)
        if ms:
            claim["status"] = ms.group(1)
        md = LINE_DATE_RE.search(line)
        if md:
            claim["injury_date_time"] = md.group(1)
        name = _incident_name(line.replace(token, " "))
        if name:
            claim["employee_name"] = name
        claims.append(claim)
    dropped = repeated_policy_numbers(claims)
    return [c for c in claims if c["claim_number"] not in dropped]


MULTIROW_CLAIM_RE = re.compile(
    r"Claim\s*Number\s*:\s*([A-Z0-9\-]+)\s+Claimant\s*:\s*(.+?)\s+"
    r"Status\s*:\s*(\S+)\s+DOI\s*:\s*([0-9/\-]{8,10})")
# grid header label → canonical column key (Expense/LAE are synonyms,
# reference: 'AMTRUST COLUMN ORDER: 1. MEDICAL, 2. INDEMNITY, 3.
# EXPENSE / LAE')
MULTIROW_HEADER_LABELS = {"medical": "medical", "td": "td", "pd": "pd",
                          "expense": "expense", "lae": "expense",
                          "expense / lae": "expense"}


def claims_from_multirow(text: str) -> list[dict]:
    """AmTrust-style ``complex_multi_row`` layout (reference
    insurance_extractor.py:716-725): each claim is a header line plus a
    Payments/Reserves grid under columns Medical / TD / PD / Expense.

    Mapping (the reference's mandatory calibration):
      medical_paid   = Payments.Medical    medical_reserve = Reserves.Medical
      indemnity_paid = Payments.TD + Payments.PD            (TD+PD summing)
      indemnity_res  = Reserves.TD + Reserves.PD
      expense_paid   = Payments.Expense    expense_reserve = Reserves.Expense
      total_incurred = sum of all six (Paid + Reserve = Incurred checksum)
    """
    heads = list(MULTIROW_CLAIM_RE.finditer(text))
    if not heads:
        return []
    grids: list[tuple[int, list[list[str]]]] = []
    for tm in TABLE_BLOCK_RE.finditer(text):
        rows = parse_ascii_table(tm.group(1))
        if len(rows) >= 3:
            labels = {r[0].strip().lower() for r in rows[1:]}
            if {"payments", "reserves"} <= labels:
                grids.append((tm.start(), rows))
    claims = []
    for k, m in enumerate(heads):
        nxt = heads[k + 1].start() if k + 1 < len(heads) else len(text)
        grid = next((rows for s, rows in grids if m.start() < s < nxt),
                    None)
        if grid is None:
            continue
        col: dict[str, int] = {}
        for i, cell in enumerate(grid[0]):
            key = MULTIROW_HEADER_LABELS.get(cell.strip().lower())
            if key is not None and key not in col:
                col[key] = i
        if "medical" not in col:
            continue
        rows_by_label = {r[0].strip().lower(): r for r in grid[1:]}
        pay = rows_by_label.get("payments")
        res = rows_by_label.get("reserves")
        if pay is None or res is None:
            continue

        def num(row: list[str], key: str) -> float:
            i = col.get(key)
            if i is None or i >= len(row):
                return 0.0
            s = re.sub(r"[^0-9.\-]", "", row[i])
            try:
                return float(s) if s else 0.0
            except ValueError:
                return 0.0

        mp, mr = num(pay, "medical"), num(res, "medical")
        ip = num(pay, "td") + num(pay, "pd")
        ir = num(res, "td") + num(res, "pd")
        ep, er = num(pay, "expense"), num(res, "expense")
        claim = {f: None for f in CLAIM_FIELDS}
        claim.update({
            "claim_number": m.group(1),
            "employee_name": m.group(2).strip(),
            "status": m.group(3),
            "injury_date_time": m.group(4),
            "medical_paid": f"{mp:.2f}", "medical_reserve": f"{mr:.2f}",
            "indemnity_paid": f"{ip:.2f}", "indemnity_reserve": f"{ir:.2f}",
            "expense_paid": f"{ep:.2f}", "expense_reserve": f"{er:.2f}",
            "total_incurred": f"{mp + mr + ip + ir + ep + er:.2f}",
            "extraction_source": "multirow"})
        claims.append(claim)
    return claims


def extract_claims(chunk_text: str) -> list[dict]:
    """Format-conditional strategy selection: the §2.12 format-analysis
    verdict picks the parser, mirroring the reference's
    format-conditional extraction prompts (insurance_extractor.py:
    700-770). simple_columns == labeled-header table rows (the positional
    mapping IS the alias table); complex_multi_row == the AmTrust
    Payments/Reserves grid; unknown falls through table → line spotting."""
    fmt = analyze_format(chunk_text)
    if fmt == "complex_multi_row":
        claims = claims_from_multirow(chunk_text)
        if claims:
            return claims
    claims = claims_from_tables(chunk_text)
    if not claims:
        # mixed documents can classify simple_columns (a keyword-bearing
        # summary line) while the actual claims sit in a
        # Payments/Reserves grid — try the multirow parser before
        # falling back to line spotting (code-review r3 finding)
        claims = claims_from_multirow(chunk_text)
    if not claims:
        claims = claims_from_lines(chunk_text)
    return claims


def extract_document_fields(text: str) -> dict:
    """text → {policy_number(s), insured_name, report_date, claims(raw),
    field_spans}.

    Mirrors the reference lifecycle: segment → per-chunk extraction →
    merge with distinct-policy join (backend/chunked_extractor.py:276-369).
    ``field_spans`` carries the character offsets of every spotted
    document-level field in the extracted text — the per-url span
    artifact the north_star pairs with the byte-identical text.
    """
    boundaries = detect_policy_boundaries(text)
    chunks = split_into_chunks(text, boundaries)
    claims: list[dict] = []
    policies: set[str] = set()
    spans: list[dict] = []
    for b in boundaries:
        spans.append({"field": "policy_number", "value": b["policy_number"],
                      "start": b["value_start"], "end": b["value_end"]})
    for ch in chunks:
        for c in extract_claims(ch["text"]):
            c["policy_number"] = ch["policy_number"]
            claims.append(c)
        if ch["policy_number"] not in ("Unknown", "Initial Section"):
            policies.add(ch["policy_number"])
    # discovery STRICT EXCLUSIONS, document-wide: blacklist-prefixed ids
    # and ids equal to a detected policy number are never claims
    claims = [c for c in claims
              if not _is_blacklisted(c["claim_number"] or "")
              and c["claim_number"] not in policies]
    m = INSURED_RE.search(text)
    insured = m.group(1).strip() if m else None
    if m:
        spans.append({"field": "insured_name", "value": insured,
                      "start": m.start(1), "end": m.end(1)})
    md = REPORT_DATE_RE.search(text)
    report_date = md.group(1) if md else None
    if md:
        spans.append({"field": "report_date", "value": report_date,
                      "start": md.start(1), "end": md.end(1)})
    policy_number = ", ".join(sorted(policies)) if policies else None
    return {"policy_number": policy_number, "insured_name": insured,
            "report_date": report_date, "num_chunks": len(chunks),
            "claims": claims, "field_spans": spans}
