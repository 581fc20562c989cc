"""Deterministic synthetic ``web_pages`` fixture generator.

Produces the input table mandated by BASELINE.json's input_hint —
``(url string, warc_ts timestamp, html binary, text string, lang string)``
— with document classes that exercise every extraction branch
(FIXTURES.md §1): loss-run PDFs, multi-policy PDFs, invoices (negative),
scanned, reversed, rotated, garbage-text, blank, recovery-trigger PDFs,
HTML pages, and pre-extracted-text fast-path rows.

Everything is seeded (no wall clock, no external data); the same
(n_docs, seed) always yields byte-identical documents, which is what lets
the byte-parity goldens be frozen.
"""

from __future__ import annotations

import datetime as dt
import random

from .pdf.writer import PDFWriter

EPOCH = dt.datetime(2024, 1, 1, 0, 0, 0)

FIRST_NAMES = ["Maria", "James", "Wei", "Aisha", "Carlos", "Elena", "Raj",
               "Sofia", "Omar", "Grace", "Hiro", "Lena", "Pavel", "Nina"]
LAST_NAMES = ["Hernandez", "Okafor", "Chen", "Patel", "Garcia", "Kim",
              "Novak", "Silva", "Dubois", "Ivanov", "Tanaka", "Mbeki"]
# names that the phantom filter (F6) actually catches after "Last, First"
# normalization: cleaned forms must appear in funcs.PHANTOM_NAMES
PHANTOM_NAMES = ["John Doe", "Alice Johnson", "Glenn Watson", "Michael Boyce"]
BODY_PARTS = ["shoulder(s)", "lower back", "knee", "wrist", "buttocks",
              "ankle", "neck", "hand"]
DESCRIPTIONS = ["struck by falling object", "slip and fall on wet floor",
                "repetitive strain while lifting", "cut by machinery",
                "vehicle collision during delivery", "job stress incident"]
STATUSES = ["O", "OP", "OPEN", "Open", "C", "CL", "CLOSED", "Closed",
            "R", "REOP", "REOPENED"]
INJURY_TYPES = ["MED", "MEDICAL", "COMP", "TTD", "PPD", "INDEMNITY", "MED ONLY"]
COMPANIES = ["ACME FACILITIES LLC", "NORTHWIND LOGISTICS INC",
             "BLUE HARBOR FOODS", "CASCADE BUILDERS CO",
             "SUMMIT RETAIL GROUP", "IRONWOOD MANUFACTURING"]

CLAIM_HEADER = ["Claim Number", "Claimant", "Status", "Date of Injury",
                "Injury Type", "Med Paid", "Med Resv", "Ind Paid",
                "Ind Resv", "Total Incurred"]
CLAIM_COL_W = [86, 120, 62, 84, 72, 76, 76, 76, 76, 90]

DOC_CLASS_WEIGHTS = [
    ("watermark_pdf", 4),
    ("loss_run_pdf", 30),
    ("multi_policy_pdf", 10),
    ("invoice_pdf", 8),
    ("scanned_pdf", 8),
    ("reversed_pdf", 5),
    ("rotated_pdf", 5),
    ("garbage_pdf", 3),
    ("blank_pdf", 2),
    ("recovery_pdf", 5),
    ("html_page", 15),
    ("text_only", 5),
]


def _money(rng: random.Random, lo: float = 0.0, hi: float = 200000.0,
           fmt: str | None = None) -> tuple[float, str]:
    v = round(rng.uniform(lo, hi), 2)
    if fmt is None:
        fmt = rng.choice(["plain", "dollar", "comma"])
    if fmt == "dollar":
        s = f"${v:,.2f}"
    elif fmt == "comma":
        s = f"{v:,.2f}"
    else:
        s = f"{v:.2f}"
    return v, s


def _claim_number(rng: random.Random) -> str:
    if rng.random() < 0.5:
        return f"W{rng.randint(10, 99)}IN{rng.randint(10000, 99999)}"
    return f"{rng.randint(100000, 999999)}B"


def _date(rng: random.Random) -> str:
    y = rng.randint(2019, 2024)
    m = rng.randint(1, 12)
    d = rng.randint(1, 28)
    if rng.random() < 0.6:
        return f"{y:04d}-{m:02d}-{d:02d}"
    return f"{m:02d}/{d:02d}/{y:04d}"


def _claim_row(rng: random.Random, claim_number: str | None = None,
               quality: str = "good") -> list[str]:
    """One claims-table row. quality: good | bad_math | med_guardrail."""
    num = claim_number or _claim_number(rng)
    if rng.random() < 0.08:
        name = rng.choice(PHANTOM_NAMES)
    else:
        name = f"{rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}"
    status = rng.choice(STATUSES)
    doi = _date(rng)
    itype = rng.choice(INJURY_TYPES)
    mp, mp_s = _money(rng, 0, 90000)
    mr, mr_s = _money(rng, 0, 90000)
    ip, ip_s = _money(rng, 0, 50000)
    ir, ir_s = _money(rng, 0, 50000)
    if quality == "bad_math":
        total = round(mp + mr + ip + ir + rng.uniform(500, 5000), 2)
    else:
        total = round(mp + mr + ip + ir, 2)
    total_s = f"${total:,.2f}" if rng.random() < 0.5 else f"{total:,.2f}"
    return [num, name, status, doi, itype, mp_s, mr_s, ip_s, ir_s, total_s]


def _preamble(pg, rng: random.Random, policy: str, company: str,
              y: float = 40.0) -> float:
    pg.text(50, y, "Loss Analysis Report", size=14)
    pg.text(50, y + 22, f"Policy Number: {policy}")
    pg.text(50, y + 38, f"Insured Name: {company}")
    pg.text(50, y + 54, f"Report produced on {_date(rng)}")
    return y + 80


def _claims_table(pg, rng: random.Random, y: float, n_rows: int,
                  dup_of: list[str] | None = None) -> tuple[float, list[str]]:
    rows = [CLAIM_HEADER]
    ids: list[str] = []
    for i in range(n_rows):
        quality = "bad_math" if rng.random() < 0.15 else "good"
        row = _claim_row(rng, quality=quality)
        rows.append(row)
        ids.append(row[0])
    if dup_of:
        # duplicate an earlier claim id with worse math (G5 dedup fodder)
        row = _claim_row(rng, claim_number=rng.choice(dup_of), quality="bad_math")
        rows.append(row)
    y = pg.table(40, y, rows, CLAIM_COL_W, row_height=15.0, size=8.0)
    return y + 14, ids


def make_loss_run_pdf(rng: random.Random) -> bytes:
    w = PDFWriter()
    n_pages = rng.randint(1, 2)
    policy = f"P-{rng.randint(2019, 2024)}-{rng.randint(1000, 9999)}"
    company = rng.choice(COMPANIES)
    all_ids: list[str] = []
    for p in range(n_pages):
        pg = w.add_page(width=1008, height=792)
        if p == 0:
            y = _preamble(pg, rng, policy, company)
        else:
            pg.text(50, 40, f"Loss Analysis Report (continued) page {p+1}")
            y = 70.0
        y, ids = _claims_table(pg, rng, y, rng.randint(3, 7),
                               dup_of=all_ids if (p and rng.random() < 0.5) else None)
        all_ids.extend(ids)
        numeric = [i for i in all_ids if i.isdigit() or i.endswith("B")]
        if numeric and rng.random() < 0.5:
            pg.text(50, y + 10, f"Summary: Claim# {numeric[0].rstrip('B')} reviewed")
    return w.tobytes()


def make_multi_policy_pdf(rng: random.Random) -> bytes:
    w = PDFWriter()
    pg = w.add_page(width=1008, height=792)
    company = rng.choice(COMPANIES)
    pg.text(50, 30, f"Consolidated Loss Run - {company}", size=12)
    y = 60.0
    for k in range(2):
        policy = f"N{rng.randint(1, 9)}WC{rng.randint(100000, 999999)}"
        if rng.random() < 0.5:
            pg.text(50, y, f"Policy Number: {policy}")
            y += 18
        else:  # value on the line below the label (chunked_extractor.py:28-29)
            pg.text(50, y, "Policy Number")
            pg.text(50, y + 14, policy)
            y += 32
        y, _ = _claims_table(pg, rng, y, rng.randint(2, 4))
        y += 10
    return w.tobytes()


def make_invoice_pdf(rng: random.Random) -> bytes:
    w = PDFWriter()
    for p in range(rng.randint(1, 3)):
        pg = w.add_page()
        pg.text(50, 40, f"INVOICE {rng.randint(10000, 99999)}", size=13)
        pg.text(50, 62, f"Bill To: {rng.choice(COMPANIES)}")
        rows = [["Item", "Qty", "Unit Price", "Amount"]]
        for _ in range(rng.randint(2, 5)):
            qty = rng.randint(1, 9)
            price, price_s = _money(rng, 10, 900)
            rows.append([f"Service {rng.randint(1, 99)}", str(qty), price_s,
                         f"{qty * price:,.2f}"])
        y = pg.table(50, 90, rows, [180, 50, 90, 90])
        pg.text(50, y + 12, "Payment due within 30 days.")
    return w.tobytes()


def make_scanned_pdf(rng: random.Random) -> bytes:
    w = PDFWriter()
    for p in range(rng.randint(1, 3)):
        if rng.random() < 0.8:
            ocr = (f"Scanned loss run page {p+1}\n"
                   f"Claim Number {_claim_number(rng)} Status Open\n"
                   f"Total Incurred {rng.randint(1000, 99999)}.00")
        else:
            ocr = ""  # → [No text detected on this page]
        pg = w.add_page(ocr_text=ocr)
        pg.image_placeholder()
    return w.tobytes()


def make_reversed_pdf(rng: random.Random) -> bytes:
    w = PDFWriter()
    pg = w.add_page(width=1008, height=792)
    lines = ["Loss Report paid analysis",
             "Claim Policy Ratio paid summary",
             f"Policy Number: R-{rng.randint(1000, 9999)}"]
    y = 40.0
    for line in lines:
        pg.text(50, y, line[::-1])
        y += 16
    rows = [CLAIM_HEADER] + [_claim_row(rng) for _ in range(2)]
    rows = [[(c or "")[::-1] for c in row] for row in rows]
    pg.table(40, y + 10, rows, CLAIM_COL_W, row_height=15.0, size=8.0)
    return w.tobytes()


def make_rotated_pdf(rng: random.Random) -> bytes:
    w = PDFWriter()
    pg = w.add_page(width=792, height=612)
    x = 700.0  # vertical lines laid out right-to-left, reading top-down
    for line in [f"Rotated loss run {rng.randint(1, 999)}",
                 f"Policy Number: ROT-{rng.randint(100, 999)}",
                 f"Claim {_claim_number(rng)} Open {_date(rng)}"]:
        pg.text(x, 580, line, vertical=True)
        x -= 16
    return w.tobytes()


def make_garbage_pdf(rng: random.Random) -> bytes:
    """Unreadable text layer (slash codes) → routed to the OCR branch."""
    w = PDFWriter()
    recovered = (f"Recovered via OCR\nClaim Number {_claim_number(rng)} "
                 f"Closed {_date(rng)}")
    pg = w.add_page(ocr_text=recovered)
    y = 40.0
    for _ in range(6):
        junk = " ".join(f"/{rng.randint(0, 9)}{rng.randint(0, 9)}"
                        for _ in range(20))
        pg.text(40, y, junk, size=9)
        y += 14
    return w.tobytes()


def make_blank_pdf(rng: random.Random) -> bytes:
    """Digital doc with an (almost) blank trailing page → F4 marker."""
    w = PDFWriter()
    pg = w.add_page()
    pg.text(50, 40, "Loss run attachment cover page for "
            + rng.choice(COMPANIES) + " with no claim tables enclosed.")
    pg2 = w.add_page()
    if rng.random() < 0.5:
        pg2.text(50, 40, "ok")  # <10 chars → F4 blank-page marker
    return w.tobytes()


def make_recovery_pdf(rng: random.Random) -> bytes:
    """A claim id placed inside the table bbox but outside every cell:
    dropped by the layout path, kept by the raw path → T5 recovery fires."""
    w = PDFWriter()
    pg = w.add_page(width=1008, height=792)
    policy = f"P-{rng.randint(2019, 2024)}-{rng.randint(1000, 9999)}"
    y = _preamble(pg, rng, policy, rng.choice(COMPANIES))
    rows = [CLAIM_HEADER] + [_claim_row(rng) for _ in range(3)]
    y_end = pg.table(40, y, rows, CLAIM_COL_W, row_height=15.0, size=8.0)
    # orphan run: x beyond the last column, y inside the grid
    orphan = _claim_number(rng)
    pg.text(40 + sum(CLAIM_COL_W) + 30, y + 18, orphan, size=8)
    pg.text(50, y_end + 20, "End of report.")
    return w.tobytes()


def make_watermark_pdf(rng: random.Random) -> bytes:
    """Same watermark line on every page → F5 frequency rule strips it."""
    w = PDFWriter()
    wm = rng.choice(["CONFIDENTIAL - INTERNAL USE ONLY", "DRAFT COPY",
                     "PROPERTY OF " + rng.choice(COMPANIES)])
    policy = f"P-{rng.randint(2019, 2024)}-{rng.randint(1000, 9999)}"
    for p in range(2):
        pg = w.add_page(width=1008, height=792)
        pg.text(620, 16, wm, size=9)
        if p == 0:
            y = _preamble(pg, rng, policy, rng.choice(COMPANIES))
            _claims_table(pg, rng, y, rng.randint(2, 4))
        else:
            pg.text(50, 60, f"Supplementary notes for page {p + 1} of the "
                            "filing with additional remarks.")
    return w.tobytes()


def make_amtrust_pdf(rng: random.Random) -> bytes:
    """AmTrust-style ``complex_multi_row`` layout (reference
    insurance_extractor.py:716-725): each claim is a header line plus a
    Payments/Reserves grid under Medical/TD/PD/Expense columns. The
    parser must SUM TD+PD into indemnity — exercises the
    format-conditional strategy in fields.extract_claims."""
    w = PDFWriter()
    pg = w.add_page(width=1008, height=792)
    policy = f"AMT-{rng.randint(2019, 2024)}-{rng.randint(100, 999)}"
    y = _preamble(pg, rng, policy, rng.choice(COMPANIES))
    for _ in range(rng.randint(1, 3)):
        num = str(rng.randint(3600000, 3699999))
        name = f"{rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}"
        status = rng.choice(["O", "C", "R"])
        doi = _date(rng)
        pg.text(40, y, f"Claim Number: {num}  Claimant: {name}  "
                       f"Status: {status}  DOI: {doi}", size=9)
        y += 18
        vals = [round(rng.uniform(0, 9000), 2) for _ in range(8)]
        rows = [["", "Medical", "TD", "PD", "Expense"],
                ["Payments", f"{vals[0]:,.2f}", f"{vals[1]:,.2f}",
                 f"{vals[2]:,.2f}", f"{vals[3]:,.2f}"],
                ["Reserves", f"{vals[4]:,.2f}", f"{vals[5]:,.2f}",
                 f"{vals[6]:,.2f}", f"{vals[7]:,.2f}"]]
        y = pg.table(40, y, rows, [80, 90, 90, 90, 90],
                     row_height=15.0, size=8.0) + 16
    return w.tobytes()


def make_homestates_pdf(rng: random.Random) -> bytes:
    """Berkshire Homestates-style scanned loss run: a ``CRWC`` policy id
    repeated on every page (blacklist + repeated-number rules), claim
    ids as ``Converted #`` captures or bare 8-digit integers paired with
    incident data — exercises every discovery exclusion rule
    (reference insurance_extractor.py:180-216)."""
    w = PDFWriter()
    policy = f"CRWC{rng.randint(1000000, 9999999)}"
    for p in range(rng.randint(1, 2)):
        lines = [f"Homestates loss run page {p + 1}",
                 f"Policy Number: {policy}"]
        for _ in range(rng.randint(2, 4)):
            first, last = rng.choice(FIRST_NAMES), rng.choice(LAST_NAMES)
            doi = _date(rng)
            num8 = rng.randint(10000000, 99999999)
            if rng.random() < 0.4:
                lines.append(f"Converted # {num8}  {last}, {first}  {doi}")
            else:
                lines.append(f"{num8}  {last}, {first}  {doi}")
        lines.append(f"Reference {policy} continued")
        pg = w.add_page(ocr_text="\n".join(lines))
        pg.image_placeholder()
    return w.tobytes()


NAV_LINKS = ["Home", "About", "Products", "Pricing", "Careers", "Contact",
             "Blog", "Support", "Login", "Sign up"]
ARTICLE_SENTENCES = [
    "Insurance loss runs summarize the claim history of a policyholder.",
    "Carriers use loss data to price renewals and set reserves accurately.",
    "A claim moves from open to closed once payments and recoveries settle.",
    "Medical and indemnity reserves are tracked separately by adjusters.",
    "Deductibles shift part of each loss back to the insured business.",
    "Experience modification factors reward employers with fewer claims.",
    "Subrogation recovers costs from third parties responsible for a loss.",
    "Actuaries study development triangles to project ultimate losses.",
]


def make_html_page(rng: random.Random) -> bytes:
    nav = "".join(f'<li><a href="/{t.lower()}">{t}</a></li>'
                  for t in rng.sample(NAV_LINKS, 6))
    paras = []
    for _ in range(rng.randint(3, 6)):
        k = rng.randint(2, 4)
        paras.append("<p>" + " ".join(rng.sample(ARTICLE_SENTENCES, k)) + "</p>")
    side = "".join(f'<li><a href="/tag/{i}">tag {i}</a></li>'
                   for i in range(rng.randint(4, 8)))
    title = f"Understanding loss run {rng.randint(1, 9999)}"
    html = f"""<!DOCTYPE html>
<html><head><title>{title}</title>
<script>var t = {rng.randint(0, 99)};</script>
<style>body {{ margin: 0; }}</style></head>
<body>
<nav><ul>{nav}</ul></nav>
<header><div>Site chrome banner</div></header>
<article>
<h1>{title}</h1>
{''.join(paras)}
</article>
<aside><ul>{side}</ul></aside>
<footer><div><a href="/privacy">Privacy</a> <a href="/terms">Terms</a>
(c) 2024 Example Corp</div></footer>
</body></html>"""
    return html.encode("utf-8")


def make_text_only(rng: random.Random) -> str:
    lines = [f"Policy Number: TXT-{rng.randint(100, 999)}"]
    for _ in range(rng.randint(2, 5)):
        lines.append(f"Claim# {rng.randint(10000, 99999)} "
                     f"{rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)} "
                     f"{rng.choice(STATUSES)} {_date(rng)}")
    return "\n".join(lines)


_MAKERS = {
    "watermark_pdf": make_watermark_pdf,
    "loss_run_pdf": make_loss_run_pdf,
    "multi_policy_pdf": make_multi_policy_pdf,
    "invoice_pdf": make_invoice_pdf,
    "scanned_pdf": make_scanned_pdf,
    "reversed_pdf": make_reversed_pdf,
    "rotated_pdf": make_rotated_pdf,
    "garbage_pdf": make_garbage_pdf,
    "blank_pdf": make_blank_pdf,
    "recovery_pdf": make_recovery_pdf,
    "amtrust_pdf": make_amtrust_pdf,
    "homestates_pdf": make_homestates_pdf,
}


def generate_rows(n_docs: int, seed: int = 42) -> list[dict]:
    """Deterministic web_pages rows. Each row's RNG is derived from
    (seed, i) so generation is order-independent and parallelizable."""
    classes = [c for c, wt in DOC_CLASS_WEIGHTS for _ in range(wt)]
    rows = []
    for i in range(n_docs):
        rng = random.Random((seed << 20) ^ i)
        doc_class = classes[rng.randrange(len(classes))]
        # round-3 classes ride on fixed doc-id slices (override AFTER the
        # weighted draw) so every other document — and its frozen golden —
        # stays byte-identical across rounds
        if i % 40 == 7:
            doc_class = "amtrust_pdf"
        elif i % 40 == 23:
            doc_class = "homestates_pdf"
        url = f"https://fixture.test/{doc_class}/{i}"
        ts = EPOCH + dt.timedelta(seconds=i * 37)
        lang = rng.choices(["en", "es", "de"], weights=[90, 6, 4])[0]
        if doc_class == "html_page":
            html: bytes | None = make_html_page(rng)
            text = None
        elif doc_class == "text_only":
            html = None
            text = make_text_only(rng)
        else:
            html = _MAKERS[doc_class](rng)
            text = None
        if doc_class != "text_only" and rng.random() < 0.02:
            html = b"\x00\x01junk" + (html or b"")[:64]  # 'other' sniff branch
        rows.append({"url": url, "warc_ts": ts, "html": html,
                     "text": text, "lang": lang})
    return rows


def write_web_pages_parquet(path: str, n_docs: int, seed: int = 42) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = generate_rows(n_docs, seed)
    table = pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    })
    # small row groups → Spark can split the scan across tasks (a single
    # default row group would serialize the whole read into one task)
    pq.write_table(table, path, row_group_size=256)
