"""Equivalence tests for the single tagged regex pass (kernels/legal.py
``extract_with_regex_tagged`` / ``scan_pages``).

The round-3 hot-path change computes ONE (lower, tagged-matches) pass per
page and per combined text, then derives every consumer list (description
matches, page TRS, full-doc TRS, details.TRS) as projections of it. These
tests pin the contract that each projection is byte-identical to the
dedicated rescan it replaced, on adversarial fixed cases and on
hypothesis-generated page sets.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from deed_ocr_spark.kernels.details import doc_details, page_details
from deed_ocr_spark.kernels.legal import (
    PATTERNS,
    doc_legal_summary,
    extract_with_regex,
    extract_with_regex_tagged,
    scan_pages,
)
from deed_ocr_spark.kernels.textops import page_concat

# Fragments chosen to hit every pattern, multi-match pages, boundary
# adjacency with the page separator, and guard-literal-present-but-no-match.
_FRAGMENTS = [
    "Lot 42, Block B, RIVERSIDE ESTATES",
    "Lot 7A, Block 12, SUNNY ACRES SUBDIVISION",
    "NE 1/4 of Section 14, Township 3 N, Range 8 E",
    "Section 2, Township 12 S, Range 4 W and Section 3, Township 12 S, Range 4 W",
    "Beginning at a point on the north line, thence south 300 feet",
    "Beginning at the iron pin, containing 40 acres",
    "LEGAL DESCRIPTION: the following tract",
    "lot of consideration but no block here",  # guard fires, regex fails
    "this section discusses townships in general",  # guard fires, no match
    "RANGE",  # tail adjacency bait
    "ESTATES",  # suffix-only bait at page start
    "",  # empty page
    "plain prose with none of the keywords at all",
    "--- Page 2 ---",  # page text that LOOKS like the separator
]


def _pages_strategy():
    return st.lists(
        st.lists(st.sampled_from(_FRAGMENTS), min_size=0, max_size=4).map(
            " ".join
        ),
        min_size=1,
        max_size=5,
    )


def test_untagged_is_projection_of_tagged():
    for frag in _FRAGMENTS:
        text = f"{frag} and Section 1, Township 2 N, Range 3 W near {frag}"
        tagged = extract_with_regex_tagged(text)
        assert extract_with_regex(text) == [(t, s, e) for _, t, s, e in tagged]
        # every tagged name is a real pattern and its span re-matches
        for name, t, s, e in tagged:
            assert name in PATTERNS
            assert text[s:e] == t


def test_trs_projection_equals_dedicated_rescan():
    trs_pat = PATTERNS["section_township_range"]
    for frag in _FRAGMENTS:
        text = f"{frag}. Section 9, Township 1 N, Range 2 E. {frag}"
        tagged = extract_with_regex_tagged(text)
        derived = [t for n, t, _, _ in tagged if n == "section_township_range"]
        direct = [m.group(0) for m in trs_pat.finditer(text)]
        assert derived == direct


@settings(max_examples=150, deadline=None)
@given(_pages_strategy())
def test_doc_legal_summary_with_and_without_scans(pages):
    combined = page_concat(pages)
    base = doc_legal_summary(pages, combined)
    page_scans = scan_pages(pages)
    combined_lower = combined.lower()
    combined_scan = (
        combined_lower,
        extract_with_regex_tagged(combined, combined_lower),
    )
    assert doc_legal_summary(pages, combined, page_scans, combined_scan) == base


@settings(max_examples=150, deadline=None)
@given(_pages_strategy())
def test_doc_details_with_and_without_scans(pages):
    assert doc_details(pages, scan_pages(pages)) == doc_details(pages)


# ---------------------------------------------------------------------------
# Fast STR finder (_finditer_str): core-scan + backward prefix parse must be
# byte-identical to the original full pattern, including unicode-casefold
# bait (ſ folds to s under re.IGNORECASE, K to k), prefix-overlap bait
# ("Range 5 E 1/4 of Section …" — the E belongs to the previous match, so
# the next match must be core-only), and whitespace-run edge cases.
# ---------------------------------------------------------------------------

_STR_FRAGMENTS = [
    "Section 14",
    "Township 3 N",
    "Range 8 E",
    "Section 2, Township 1 S, Range 4 W",
    "NE 1/4 of ",
    "N 1/4 of ",
    "SW1/2 of ",
    "E  1/4  of  ",
    "1/4 of ",
    "of ",
    "NE 1/3 of ",
    "XE 1/4 of ",
    "ſ 1/4 of ",  # ſ — casefolds to s
    "ſection 9, townſhip 2 n, range 3 e",
    "NNE 1/4 of ",
    "SNE 1/4 of ",
    "N E 1/4 of ",
    "Range 5 E 1/4 of Section 9, Township 1 N, Range 2 E",
    "Section 9, Township 1 N, Range 2 ENE 1/4 of Section 3, Township 1 N, Range 2 W",
    " ",
    "\n",
    " ",  # NBSP is \s in unicode mode
    ",",
    "x",
    "K",  # Kelvin sign
    "section",
    "OF",
    "oF ",
    "1/2",
    "24",
    "NE 1/4 of Section 1, Township 2 N, Range 3 W",
]


def _direct_str(text):
    pat = PATTERNS["section_township_range"]
    return [(m.group(0), m.start(), m.end()) for m in pat.finditer(text)]


@settings(max_examples=400, deadline=None)
@given(
    st.lists(st.sampled_from(_STR_FRAGMENTS), min_size=1, max_size=10),
    st.sampled_from(["as-is", "upper", "lower"]),
)
def test_fast_str_finditer_equals_original(parts, case):
    from deed_ocr_spark.kernels.legal import _finditer_str

    text = "".join(parts)
    if case == "upper":
        text = text.upper()
    elif case == "lower":
        text = text.lower()
    assert _finditer_str(text) == _direct_str(text)


# ---------------------------------------------------------------------------
# Guard-layer casefold exactness (round-4 ADVICE): re.IGNORECASE applies
# FULL unicode casefolding (ſ↔s, K↔k) while str.lower() does not, so the
# `literal in lower` short-circuit guards must fall through to the regex on
# non-ASCII text. These baits previously matched the raw patterns (and the
# fast STR scan) but were swallowed by the guard layer.
# ---------------------------------------------------------------------------


def _direct_tagged(text):
    """Unguarded enumeration: every non-header pattern, raw finditer."""
    out = []
    for name, pattern in PATTERNS.items():
        if name == "legal_desc_header":
            continue
        for m in pattern.finditer(text):
            out.append((name, m.group(0), m.start(), m.end()))
    return out


_CASEFOLD_BAITS = [
    "ſection 9, Township 2 N, Range 3 E",  # ſ defeats the 'section' guard
    "NE 1/4 of ſection 9, Township 2 N, Range 3 E",
    "Lot 42, Block B, RIVERSIDE ESTATES",  # ASCII control: guards stay exact
    "ſ plain non-ascii text with no match at all",
    "beginning at a point, thence 300 feet — K marks the spot",  # Kelvin sign
]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(_CASEFOLD_BAITS + _STR_FRAGMENTS), min_size=1, max_size=6))
def test_guard_layer_exact_on_casefold_bait(parts):
    text = " ".join(parts)
    assert extract_with_regex_tagged(text) == _direct_tagged(text)


def test_classify_document_casefold_bait():
    from deed_ocr_spark.kernels.details import classify_document

    # 'LEAſE' satisfies \bLEASE\b under re.I but 'lease' not in str.lower()
    assert classify_document("THIS LEAſE made this day") == ("Lease", "Lease")
    # ASCII behavior unchanged
    assert classify_document("THIS LEASE made this day") == ("Lease", "Lease")
    assert classify_document("no taxonomy words here") is None


def test_deed_details_casefold_bait():
    from deed_ocr_spark.kernels.details import extract_deed_details

    # 'ſubject' defeats the 'subject' guard but matches the re.I pattern
    out = extract_deed_details("ſubject to liens of record")
    assert out == {"subject_to": "ſubject to liens of record"}


def test_page_details_trs_casefold_bait():
    d = page_details("conveys ſection 9, Township 2 N, Range 3 E")
    assert d.get("TRS") == ["ſection 9, Township 2 N, Range 3 E"]


def test_page_details_with_precomputed_trs():
    text = (
        "WARRANTY DEED. GRANTOR: JOHN A. SMITH AND MARY SMITH. "
        "Section 14, Township 3 N, Range 8 E. Section 14, Township 3 N, "
        "Range 8 E. the grantor's undivided 1/2 interest in the property"
    )
    lower = text.lower()
    tagged = extract_with_regex_tagged(text, lower)
    trs = [v for n, v, _, _ in tagged if n == "section_township_range"]
    assert page_details(text, lower, trs) == page_details(text)
    assert page_details(text)["TRS"] == ["Section 14, Township 3 N, Range 8 E"]
