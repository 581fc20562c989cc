"""Unit tests for segmentation (G1) and rule-based claims spotting."""

from insurance_pdf_extractor_spark import fields as FX


class TestSegmentation:
    def test_boundaries_same_line(self):
        text = "intro text here\nPolicy Number: ABC-123\nbody\n"
        bs = FX.detect_policy_boundaries(text)
        assert len(bs) == 1
        assert bs[0]["policy_number"] == "ABC-123"

    def test_boundaries_next_line(self):
        text = "x\nPolicy Number\nSWC1364773\nmore\n"
        bs = FX.detect_policy_boundaries(text)
        assert bs[0]["policy_number"] == "SWC1364773"

    def test_boundaries_sorted_deduped(self):
        text = "Policy # AAA111 yes\n" + "pad " * 50 + "\nPol # BBB222\n"
        bs = FX.detect_policy_boundaries(text)
        assert [b["policy_number"] for b in bs] == ["AAA111", "BBB222"]
        assert bs[0]["start_index"] < bs[1]["start_index"]

    def test_initial_section_prechunk(self):
        text = "A meaningful preamble.\nPolicy Number: P-1\nsection body"
        chunks = FX.split_into_chunks(text, FX.detect_policy_boundaries(text))
        assert chunks[0]["policy_number"] == "Initial Section"
        assert chunks[1]["policy_number"] == "P-1"

    def test_no_boundaries_single_chunk(self):
        chunks = FX.split_into_chunks("no headers", [])
        assert len(chunks) == 1
        assert chunks[0]["policy_number"] == "Unknown"

    def test_chunk_spans_cover_text(self):
        text = "Policy Number: P-1\naaa\nPolicy Number: P-2\nbbb"
        chunks = FX.split_into_chunks(text, FX.detect_policy_boundaries(text))
        assert [c["policy_number"] for c in chunks] == ["P-1", "P-2"]
        assert "aaa" in chunks[0]["text"] and "bbb" in chunks[1]["text"]


TABLE_TEXT = """[TABLE 1]
--------------------------------------------------------------------------------
Claim Number | Claimant    | Status | Date of Injury | Med Paid | Total Incurred
-------------+-------------+--------+----------------+----------+---------------
W11IN22222   | Ada Okafor  | OP     | 2023-01-15     | $1,000.00 | 2,000.00
333333B      | Bo Chen     | CLOSED | 05/20/2022     | 500.50    | 500.50
--------------------------------------------------------------------------------
"""


class TestClaims:
    def test_table_claims(self):
        claims = FX.claims_from_tables(TABLE_TEXT)
        assert len(claims) == 2
        c = claims[0]
        assert c["claim_number"] == "W11IN22222"
        assert c["employee_name"] == "Ada Okafor"
        assert c["status"] == "OP"
        assert c["medical_paid"] == "$1,000.00"
        assert c["total_incurred"] == "2,000.00"

    def test_header_alias_mapping(self):
        m = FX._map_header(["Claim #", "Worker Name", "DOI", "Paid Medical"])
        assert m == {0: "claim_number", 1: "employee_name",
                     2: "injury_date_time", 3: "medical_paid"}

    def test_non_claims_table_skipped(self):
        text = TABLE_TEXT.replace("Claim Number", "Item").replace(
            "Claimant", "Qty")
        assert FX.claims_from_tables(text) == []

    def test_line_fallback(self):
        text = "Claim# 12345 Ada OPEN 2023-01-15\nno claim here\n"
        claims = FX.claims_from_lines(text)
        assert len(claims) == 1
        assert claims[0]["claim_number"] == "12345"
        assert claims[0]["status"] == "OPEN"
        assert claims[0]["injury_date_time"] == "2023-01-15"

    def test_document_fields_merge(self):
        text = ("Insured Name: ACME LLC\nPolicy Number: P-1\n" + TABLE_TEXT
                + "\nPolicy Number: P-2\n" + TABLE_TEXT)
        res = FX.extract_document_fields(text)
        assert res["insured_name"] == "ACME LLC"
        # distinct policies joined sorted (reference chunked_extractor.py:359-362)
        assert res["policy_number"] == "P-1, P-2"
        assert len(res["claims"]) == 4
        assert {c["policy_number"] for c in res["claims"]} == {"P-1", "P-2"}


class TestFieldSpans:
    def test_spans_index_into_text(self):
        text = ("Intro line\nPolicy Number: ABC-123\nInsured Name: ACME LLC\n"
                "Report produced on 2024-01-05\nPolicy Number: XYZ-9\nbody")
        res = FX.extract_document_fields(text)
        spans = {(s["field"], s["value"]): s for s in res["field_spans"]}
        assert ("policy_number", "ABC-123") in spans
        assert ("policy_number", "XYZ-9") in spans
        ins = spans[("insured_name", "ACME LLC")]
        assert text[ins["start"]:ins["end"]] == "ACME LLC"
        rd = spans[("report_date", "2024-01-05")]
        assert text[rd["start"]:rd["end"]] == "2024-01-05"
        # every span delimits its VALUE in the text
        p1 = spans[("policy_number", "ABC-123")]
        assert text[p1["start"]:p1["end"]] == "ABC-123"

    def test_spans_empty_for_plain_text(self):
        assert FX.extract_document_fields("nothing here")["field_spans"] == []


def test_policy_value_requires_digit_and_case():
    # prose after the label must not be captured as a policy id
    res = FX.extract_document_fields("Policy Number: see attached schedule")
    assert res["policy_number"] is None
    # value on the next line still works and spans the value
    res2 = FX.extract_document_fields("Policy Number\nSWC1364773\nbody")
    assert res2["policy_number"] == "SWC1364773"
    sp = [s for s in res2["field_spans"] if s["field"] == "policy_number"][0]
    text = "Policy Number\nSWC1364773\nbody"
    assert text[sp["start"]:sp["end"]] == "SWC1364773"


class TestClaimDiscoveryRules:
    """Discovery exclusion rules (reference insurance_extractor.py:180-216)."""

    def test_crwc_blacklist_never_a_claim(self):
        res = FX.extract_document_fields(
            "Policy Number: CRWC1234567\n"
            "Claim # CRWC1234567 Smith, John 2021-01-01")
        assert all(not (c["claim_number"] or "").startswith("CRWC")
                   for c in res["claims"])

    def test_converted_number_is_the_claim(self):
        got = FX.discover_line_claim(
            "Converted # 44070643  Chen, Wei  2021-03-04")
        assert got == ("44070643", "converted")

    def test_homestates_8digit_needs_incident_context(self):
        assert FX.discover_line_claim(
            "44070643  Chen, Wei  2021-03-04") == ("44070643",
                                                   "homestates_8digit")
        # bare number with no name/date: strict validation drops it
        assert FX.discover_line_claim("ref 44070643 archived") is None

    def test_policy_labeled_line_excluded(self):
        assert FX.discover_line_claim(
            "Policy Number: 44070643 Chen, Wei 2021-01-01") is None

    def test_swc_twc_blacklist(self):
        assert FX.discover_line_claim(
            "Claim # SWC1234567 Kim, Grace 2020-01-01") is None
        text = ("Converted # TWC9988776 Kim, Grace 2020-01-01\n"
                "Converted # 55066077 Kim, Grace 2020-01-01")
        nums = [c["claim_number"]
                for c in FX.extract_document_fields(text)["claims"]]
        assert nums == ["55066077"]

    def test_repeated_number_is_policy(self):
        # same id for two DIFFERENT employees => policy number, dropped
        text = ("Claim # 12345678 Garcia, Carlos 2020-05-05\n"
                "Claim # 12345678 Tanaka, Hiro 2020-06-06\n"
                "Claim # 87654321 Silva, Ana 2020-07-07")
        nums = [c["claim_number"]
                for c in FX.extract_document_fields(text)["claims"]]
        assert nums == ["87654321"]
        # same id for the SAME employee (dup rows) is kept (G5 dedups later)
        text2 = ("Claim # 12345678 Garcia, Carlos 2020-05-05\n"
                 "Claim # 12345678 Garcia, Carlos 2020-05-05")
        nums2 = [c["claim_number"]
                 for c in FX.extract_document_fields(text2)["claims"]]
        assert nums2 == ["12345678", "12345678"]

    def test_claim_equal_to_detected_policy_dropped(self):
        text = ("Policy Number: 44556677\n"
                "Claim # 44556677 Chen, Wei 2021-01-01\n"
                "Claim # 99887766 Kim, Bo 2021-02-02")
        nums = [c["claim_number"]
                for c in FX.extract_document_fields(text)["claims"]]
        assert nums == ["99887766"]


class TestFormatConditionalParsing:
    def test_analyze_format_taxonomy(self):
        assert FX.analyze_format(
            "Claim# | Med Paid | Ind Paid | Total") == "simple_columns"
        assert FX.analyze_format(
            "Payments 1 2 3\nReserves 4 5 6") == "complex_multi_row"
        assert FX.analyze_format("Dear customer ...") == "unknown"

    def test_multirow_td_pd_summing(self):
        text = (
            "Claim Number: 3631112  Claimant: Duarte Milian  "
            "Status: O  DOI: 2021-03-04\n"
            "[TABLE 1]\n" + "-" * 80 + "\n"
            "         | Medical | TD     | PD     | Expense\n"
            "---------+---------+--------+--------+--------\n"
            "Payments | 966.00  | 500.00 | 926.00 | 173.00\n"
            "Reserves | 6862.00 | 400.00 | 100.00 | 0.00\n"
            + "-" * 80 + "\n")
        claims = FX.claims_from_multirow(text)
        assert len(claims) == 1
        c = claims[0]
        assert c["claim_number"] == "3631112"
        assert c["indemnity_paid"] == "1426.00"      # 500 + 926 (TD+PD)
        assert c["indemnity_reserve"] == "500.00"    # 400 + 100
        assert c["medical_reserve"] == "6862.00"
        assert c["total_incurred"] == "9927.00"
        assert c["extraction_source"] == "multirow"

    def test_extract_claims_selects_strategy(self):
        multirow = (
            "Claim Number: 111222  Claimant: Bo Chen  Status: C  "
            "DOI: 2020-01-01\n"
            "[TABLE 1]\n" + "-" * 80 + "\n"
            "         | Medical | TD    | PD    | Expense\n"
            "Payments | 1.00    | 2.00  | 3.00  | 4.00\n"
            "Reserves | 5.00    | 6.00  | 7.00  | 8.00\n"
            + "-" * 80 + "\n")
        out = FX.extract_claims(multirow)
        assert out and out[0]["extraction_source"] == "multirow"
