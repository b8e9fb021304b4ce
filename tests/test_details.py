"""kernels/details.py: the reference's structured `details` record
(gemini_ocr.py:540-588 schema + workflow.py:253-260/737-756 merge/sweep)."""

import json

from deed_ocr_spark.corpus import WARRANTY_DEED_SAMPLE
from deed_ocr_spark.kernels.details import (
    classify_document,
    doc_details,
    doc_details_json,
    extract_deed_details,
    extract_lease_details,
    extract_parties,
    page_details,
)


def test_classify_taxonomy():
    # subtypes from the prompt's own examples (gemini_ocr.py:542-544)
    assert classify_document("GENERAL WARRANTY DEED herein") == ("Deed", "Warranty Deed")
    assert classify_document("This QUITCLAIM DEED made") == ("Deed", "Quitclaim Deed")
    assert classify_document("MINERAL DEED recorded") == ("Deed", "Mineral Deed")
    assert classify_document("DEED OF TRUST") == ("Deed", "Deed of Trust")
    assert classify_document("OIL & GAS LEASE no. 7") == ("Lease", "Oil & Gas Lease")
    assert classify_document("oil and gas lease") == ("Lease", "Oil & Gas Lease")
    assert classify_document("DECREE OF HEIRSHIP") == ("Decree", "Decree of Heirship")
    assert classify_document("QUIET TITLE DECREE") == ("Decree", "Quiet Title Decree")
    assert classify_document("STIPULATION of the parties") == (
        "Stipulation",
        "Stipulation",
    )
    assert classify_document("plain mortgage terms") is None
    # specificity: WARRANTY DEED wins over the bare DEED fallback
    assert classify_document("deed book entry")[1] == "Deed"


def test_extract_parties_announcing_form():
    p = extract_parties(WARRANTY_DEED_SAMPLE)
    assert p["grantor"] == ["JOHN A. SMITH", "MARY L. SMITH"]
    assert p["grantee"] == ["ROBERT J. JONES", "SUSAN K. JONES"]
    # prose mentions without the announcing comma name nobody
    assert extract_parties("The grantor hereby conveys to the grantee.") == {}
    # lease/decree roles
    p = extract_parties("the lessor: ACME MINERALS LLC and the lessees, BOB RAY AND SUE RAY,")
    assert p["lessor"] == ["ACME MINERALS LLC"]
    assert p["lessee"] == ["BOB RAY", "SUE RAY"]


def test_deed_and_lease_details():
    dd = extract_deed_details(WARRANTY_DEED_SAMPLE)
    assert dd["grantors_interest"] == "the grantors undivided 1/2 interest in the property"
    assert dd["Interest_fraction"] == "undivided 1/2 interest"
    assert dd["subject_to"] == "subject to easements, restrictions and reservations of record"
    assert extract_deed_details("nothing relevant here") is None
    ld = extract_lease_details(
        "covering 160 acres with a 3/16 royalty for a term of 5 years"
    )
    assert ld == {
        "gross_acreage": "160",
        "lease_royalty": "3/16",
        "lease_term": "5 years",
    }
    assert extract_lease_details("no lease content") is None


def test_page_details_deed_page():
    d = page_details(WARRANTY_DEED_SAMPLE)
    assert d["document_type"] == "Deed" and d["document_subtype"] == "Warranty Deed"
    assert d["parties"]["grantor"] == ["JOHN A. SMITH", "MARY L. SMITH"]
    # the sample's Township-FIRST form doesn't match the reference's
    # Section-first TRS pattern (extractors/regex.py:13-16) — parity kept
    assert "TRS" not in d
    assert d["deed_details"] is not None


def test_doc_details_merge_conflict_rename_and_sweep():
    pages = [
        WARRANTY_DEED_SAMPLE,  # page 1: full deed record
        "DEED OF TRUST covering Section 14, Township 2 N, Range 3 W",  # page 2
        "plain page with no details at all",  # page 3: contributes nothing
        "The SW 1/4 of Section 15, Township 2N, Range 3E",  # page 4: TRS only
    ]
    d = doc_details(pages)
    # first writer keeps bare keys (workflow.py:253-260)
    assert d["document_type"] == "Deed"
    assert d["document_subtype"] == "Warranty Deed"
    # page-2 conflicts renamed with the TRUE page number
    assert d["page_2_document_type"] == "Deed"
    assert d["page_2_document_subtype"] == "Deed of Trust"
    # page 2 is the FIRST TRS writer (page 1's Township-first form doesn't
    # match) so its list lands on the bare key, which the sweep then drops
    # as redundant (workflow.py:733-735); page 4's conflict-renamed copy
    # survives — exactly the reference's final_result shape
    assert "TRS" not in d
    assert "page_2_TRS" not in d
    assert d["page_4_TRS"] == ["SW 1/4 of Section 15, Township 2N, Range 3E"]
    # JSON form is stable and round-trips
    j = doc_details_json(pages)
    assert json.loads(j) == d
    assert doc_details_json(pages) == j


def test_doc_details_empty_pages():
    assert doc_details([]) == {}
    assert doc_details(["nothing here", "still nothing"]) == {}
    assert doc_details_json([]) == "{}"
