"""Native column-expression library — SURVEY.md §2.9 scalar functions.

Every function returns a ``pyspark.sql.Column`` built from built-in
functions only (JVM-side, whole-stage codegen) — the fast path the
reference implements as per-row Python. Reference anchors cited per
function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CURRENCY_FIELDS = ["medical_paid", "medical_reserve", "indemnity_paid",
                   "indemnity_reserve", "expense_paid", "expense_reserve",
                   "recovery", "deductible", "total_incurred"]

# reference backend/insurance_extractor.py:1229-1234
PHANTOM_NAMES = [
    "john smith", "doe john", "john doe", "smith jane", "jane smith",
    "alice johnson", "johnson alice", "michael johnson", "johnson michael",
    "duarte milian", "milian duarte", "linda johnson", "boyce michael",
    "michael boyce", "glenn watson", "watson glenn",
]


def currency_clean(col: Column) -> Column:
    """C1 — strip non-numeric chars, cast, null/empty → 0.0
    (reference backend/insurance_extractor.py:1113-1122)."""
    cleaned = F.regexp_replace(col.cast("string"), r"[^0-9.]", "")
    return F.coalesce(F.nullif(cleaned, F.lit("")).cast("double"), F.lit(0.0))


def status_normalize(col: Column) -> Column:
    """C2 — map to Open/Closed/Reopened; unknown passes through uppercased
    (reference backend/insurance_extractor.py:1081-1103)."""
    up = F.upper(F.trim(F.coalesce(col, F.lit(""))))
    return (F.when(up.isin("C", "CL", "CLOSED"), "Closed")
             .when(up.isin("O", "OP", "OPEN"), "Open")
             .when(up.isin("R", "RC", "REOP", "REOPENED"), "Reopened")
             .otherwise(F.nullif(up, F.lit(""))))  # null stays null


def injury_type_normalize(col: Column) -> Column:
    """C3 — COMP/TTD/TPD/PPD/INDEM* → COMP; MED* → MED; else unchanged
    (reference backend/insurance_extractor.py:1105-1110)."""
    up = F.upper(F.coalesce(col, F.lit("")))
    return (F.when(up.rlike("COMP|TTD|TPD|PPD|INDEMNITY|INDEM"), "COMP")
             .when(up.rlike("MED|MEDICAL"), "MED")
             .otherwise(col))


def claim_year(date_col: Column) -> Column:
    """C4 — first (19|20)\\d{2} in the date string, as int, null if none
    (reference backend/insurance_extractor.py:1129-1140)."""
    y = F.regexp_extract(F.coalesce(date_col.cast("string"), F.lit("")),
                         r"((?:19|20)\d{2})", 1)
    return F.nullif(y, F.lit("")).cast("int")


def name_last_first(col: Column) -> Column:
    """C5 — 'First [Mid] Last' → 'Last, First [Mid]'; untouched when a
    comma is already present or <2 words
    (reference backend/insurance_extractor.py:1191-1202)."""
    name = F.trim(F.coalesce(col, F.lit("")))
    parts = F.split(name, r"\s+")
    n = F.size(parts)
    converted = F.concat(
        F.element_at(parts, -1), F.lit(", "),
        F.array_join(F.slice(parts, 1, n - 1), " "))
    keep = name.contains(",") | (n < 2) | (name == "")
    return F.when(keep, F.nullif(name, F.lit(""))).otherwise(converted)


def med_guardrail(injury_type: Column, value: Column) -> Column:
    """C6 — MED claims force indemnity paid/reserve to 0.0
    (reference backend/insurance_extractor.py:1124-1127)."""
    return F.when(injury_type == "MED", F.lit(0.0)).otherwise(value)


def is_phantom_name(name_col: Column) -> Column:
    """F6 — phantom/calibration claim filter predicate
    (reference backend/insurance_extractor.py:1224-1240)."""
    raw = F.lower(F.trim(F.coalesce(name_col, F.lit(""))))
    clean = F.trim(F.regexp_replace(raw, r"[,.]", ""))
    return clean.isin(PHANTOM_NAMES) | raw.rlike("placeholder|test person")


def nonzero_currency_count(prefix: str = "") -> Column:
    """A10 — count of positive currency fields (dedup tiebreak)
    (reference backend/insurance_extractor.py:1216-1218)."""
    total = F.lit(0)
    for f in CURRENCY_FIELDS:
        total = total + F.when(F.col(prefix + f) > 0, 1).otherwise(0)
    return total


def token_estimate(text: Column) -> Column:
    """C13 — len(text)//4 (reference backend/insurance_extractor.py:444)."""
    return F.floor(F.length(F.coalesce(text, F.lit(""))) / 4).cast("long")


def reverse_lines(text: Column) -> Column:
    """T3 relational twin — reverse each line of a text column
    (reference backend/pdf_plumber.py:246-251)."""
    return F.array_join(
        F.transform(F.split(F.coalesce(text, F.lit("")), "\n"), F.reverse),
        "\n")


# fields checked for negativity, in the reference's iteration order
# (reference backend/insurance_extractor.py:1296-1301)
FINVAL_FIELDS = ["medical_paid", "medical_reserve", "indemnity_paid",
                 "indemnity_reserve", "expense_paid", "expense_reserve",
                 "total_incurred"]


def financial_validation_errors(prefix: str = "") -> Column:
    """C10 — $0.02-tolerance total check + non-negativity checks, each
    failure an error string, in the reference's order and wording
    (reference backend/insurance_extractor.py:1265-1303
    ``_validate_financial_data``). Runs on POST-repair values (the
    reference calls it on the final claims dicts, :1255-1258)."""
    def col(name):
        return F.coalesce(F.col(prefix + name), F.lit(0.0))

    calc = (col("medical_paid") + col("medical_reserve")
            + col("indemnity_paid") + col("indemnity_reserve")
            + col("expense_paid") + col("expense_reserve"))
    checks = [
        F.when(F.abs(calc - col("total_incurred")) > 0.02,
               F.format_string(
                   "Total mismatch: calculated $%.2f != reported $%.2f",
                   calc, col("total_incurred"))),
    ]
    for name in FINVAL_FIELDS:
        checks.append(
            F.when(col(name) < 0,
                   F.format_string(f"{name} is negative: $%.2f", col(name))))
    return F.filter(F.array(*checks), lambda e: e.isNotNull())


def looks_reversed(text: Column) -> Column:
    """F3 — ≥2 reversed-keyword hits (reference backend/pdf_plumber.py:234-243)."""
    kws = ["tropeR", "mialC", "ycailoP", "oitaR", "ssoL", "diap"]
    low = F.lower(F.coalesce(text, F.lit("")))
    hits = F.lit(0)
    for kw in kws:
        hits = hits + F.when(
            F.coalesce(text, F.lit("")).contains(kw)
            | low.contains(kw.lower()), 1).otherwise(0)
    return hits >= 2


def winnow_fingerprints(text_col: str, k: int = 8, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the task brief's 'rolling hash' fingerprinting): hash
    every k-gram, slide a window of w consecutive hashes, keep each
    window's minimum; any shared substring of length ≥ w + k - 1 between
    two documents is GUARANTEED to share a fingerprint.

    Entirely native (one SQL expression, no UDF): md5 stands in for the
    rolling hash — O(n·k) instead of O(n), irrelevant at k=8, and its
    lexicographic min is engine-portable (string ordering is identical
    everywhere, unlike integer hash implementations). Returns
    array<string> of distinct selected fingerprints, [] for texts
    shorter than w + k - 1."""
    return F.expr(f"""
        CASE WHEN length({text_col}) >= {w + k - 1} THEN
          array_distinct(transform(
            sequence(1, length({text_col}) - {k} + 1 - {w} + 1),
            j -> array_min(transform(sequence(j, j + {w} - 1),
                           i -> md5(substring({text_col}, i, {k}))))))
        ELSE array()
        END""").cast("array<string>")


#: GPT-2-style pretokenizer shape (contractions | letter runs | digit
#: runs | punct runs | whitespace runs) — the task brief's "BPE-ish
#: regex" token counter. Portable subset: \p{L}/\p{N} classes exist in
#: both Java regex (Spark) and RE2 (DuckDB), so the count is
#: oracle-checkable cross-engine.
BPE_ISH_PATTERN = (r"'(?:s|t|m|d|ll|ve|re)"
                   r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+")


def bpe_ish_token_count(text: Column) -> Column:
    """C13 upgrade: token count under a BPE-style pretokenization regex
    (closer to real LLM token budgets than whitespace splitting — digit
    runs, punctuation runs and contractions count separately)."""
    return F.regexp_count(F.coalesce(text, F.lit("")),
                          F.lit(BPE_ISH_PATTERN)).cast("long")
