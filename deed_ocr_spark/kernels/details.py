"""Deterministic structured-details extraction — the reference's `details`
record (its actual product output).

The reference's LLM stage returns, per page, a ``details`` dict with the
schema prescribed in its prompt (/root/reference/deed_ocr/ocr/
gemini_ocr.py:540-588): document_type / document_subtype (taxonomy from the
prompt: Deed, Decree, Stipulation, Lease with specific subtypes), a
``parties`` role→names map (role names per document type, prompt
:581-586), per-page ``TRS``, and ``deed_details`` / ``lease_details``
objects that are None when the document isn't of that kind (:587-589).
Pages merge at workflow.py:253-260 (first writer keeps the bare key,
conflicts become ``page_{n}_{key}``) and the final record is swept by the
ordered-dedup pass at workflow.py:737-756 (which also drops the redundant
``details.TRS``).

This module replaces the network LLM call with deterministic pattern
extraction over the extracted page text (the north_rule's substitution),
keeping the record SHAPE and the merge/sweep semantics reference-exact —
the merge and sweep are the reference's own code paths re-expressed in
kernels/mergeops.py.
"""

from __future__ import annotations

import json
import re
from typing import Dict, List, Optional, Sequence, Tuple

from deed_ocr_spark.kernels.legal import PATTERNS, _finditer_str
from deed_ocr_spark.kernels.mergeops import dedup_sweep, merge_details
from deed_ocr_spark.kernels.textops import ordered_dedup

# (pattern, type, subtype) — first match wins; order = specificity.
# Taxonomy strings from the reference prompt (gemini_ocr.py:542-544).
_DOC_TYPES: List[Tuple["re.Pattern[str]", str, str]] = [
    (re.compile(r"\bWARRANTY\s+DEED\b", re.I), "Deed", "Warranty Deed"),
    (re.compile(r"\bQUITCLAIM\s+DEED\b", re.I), "Deed", "Quitclaim Deed"),
    (re.compile(r"\bMINERAL\s+DEED\b", re.I), "Deed", "Mineral Deed"),
    (re.compile(r"\bDEED\s+OF\s+TRUST\b", re.I), "Deed", "Deed of Trust"),
    (re.compile(r"\bOIL\s*(?:&|AND)\s*GAS\s+LEASE\b", re.I), "Lease", "Oil & Gas Lease"),
    (re.compile(r"\bDECREE\s+OF\s+HEIRSHIP\b", re.I), "Decree", "Decree of Heirship"),
    (re.compile(r"\bQUIET\s+TITLE\s+DECREE\b", re.I), "Decree", "Quiet Title Decree"),
    (re.compile(r"\bLEASE\b", re.I), "Lease", "Lease"),
    (re.compile(r"\bDECREE\b", re.I), "Decree", "Decree"),
    (re.compile(r"\bSTIPULATION\b", re.I), "Stipulation", "Stipulation"),
    (re.compile(r"\bDEED\b", re.I), "Deed", "Deed"),
]

# Party roles per the prompt's guidelines (gemini_ocr.py:581-586): deeds use
# grantor/grantee, leases lessor/lessee, decrees plaintiff/defendant.
# Names are UPPERCASE word runs ("JOHN A. SMITH"), 'AND'-separated lists;
# the role word must be followed by ',' or ':' (the announcing form — plain
# prose like "the grantor hereby conveys" names no party).
_NAME = r"(?:(?!AND\b)[A-Z][A-Z.'\-]*)(?:\s+(?!AND\b)[A-Z][A-Z.'\-]*)*"
_PARTY_RE = re.compile(
    rf"\b(grantors?|grantees?|lessors?|lessees?|plaintiffs?|defendants?)\s*[,:]\s*"
    rf"({_NAME}(?:\s+AND\s+{_NAME})*)"
)

_TRS_PAT = PATTERNS["section_township_range"]

# deed_details fields (prompt gemini_ocr.py:559-563): clause-level captures
# — the deterministic stand-in for the prompt's "<sentence that include …>".
_GRANTOR_INTEREST_RE = re.compile(
    r"(?:the\s+)?grantors?'?s?\s+undivided\s+\d+\s*/\s*\d+\s+interest(?:\s+in\s+the\s+property)?",
    re.I,
)
_INTEREST_FRACTION_RE = re.compile(r"undivided\s+(\d+\s*/\s*\d+)\s+interest", re.I)
_SUBJECT_TO_RE = re.compile(
    # greedy: captures through the LAST qualifying terminator in the clause
    # ("subject to easements, restrictions and reservations of record")
    r"subject\s+to\b[^.!?]*(?:of\s+record|reservations?|easements?|encumbrances?|restrictions?)",
    re.I,
)

# lease_details fields (prompt gemini_ocr.py:564-568)
_ACREAGE_RE = re.compile(r"\b(\d+(?:[.,]\d+)?)\s*acres?\b", re.I)
_ROYALTY_RE = re.compile(r"\b(\d+\s*/\s*\d+|\d+(?:\.\d+)?\s*%)\s+royalty\b", re.I)
_LEASE_TERM_RE = re.compile(r"\bterm\s+of\s+(\d+\s+years?)\b", re.I)


# Lowercase literal each taxonomy regex requires — the same short-circuit
# trick as kernels/legal.py's _PATTERN_GUARDS: `literal in lower` is a
# memchr-speed scan that skips the regex engine on pages that can't match.
_DOC_TYPE_GUARDS = [
    "warranty", "quitclaim", "mineral", "deed", "lease",
    "heirship", "quiet", "lease", "decree", "stipulation", "deed",
]

_CLASSIFY_ANY = ("deed", "lease", "decree", "stipulation")


def classify_document(text: str, lower: Optional[str] = None) -> Optional[Tuple[str, str]]:
    if lower is None:
        lower = text.lower()
    # Guards are exact only on ASCII text (re.I full-casefolds ſ↔s etc.,
    # str.lower() does not — see kernels/legal.py); non-ASCII text skips
    # the short-circuit and always consults the regexes.
    guardable = text.isascii()
    if guardable and not any(g in lower for g in _CLASSIFY_ANY):
        return None
    for guard, (pat, typ, sub) in zip(_DOC_TYPE_GUARDS, _DOC_TYPES):
        if (not guardable or guard in lower) and pat.search(text):
            return typ, sub
    return None


def _singular(role: str) -> str:
    role = role.lower()
    return role[:-1] if role.endswith("s") and not role.endswith("ss") else role


# _PARTY_RE is case-SENSITIVE on the role word, so guard on the raw text
_PARTY_STEMS = ("grantor", "grantee", "lessor", "lessee", "plaintiff", "defendant")


def extract_parties(text: str) -> Dict[str, List[str]]:
    parties: Dict[str, List[str]] = {}
    if not any(stem in text for stem in _PARTY_STEMS):
        return parties
    for m in _PARTY_RE.finditer(text):
        role = _singular(m.group(1))
        names = [n.strip() for n in re.split(r"\s+AND\s+", m.group(2)) if n.strip()]
        bucket = parties.setdefault(role, [])
        for n in names:
            if n not in bucket:
                bucket.append(n)
    return parties


def extract_deed_details(text: str, lower: Optional[str] = None) -> Optional[Dict[str, str]]:
    if lower is None:
        lower = text.lower()
    out: Dict[str, str] = {}
    guardable = text.isascii()  # guards exact only on ASCII (see legal.py)
    if not guardable or "undivided" in lower:
        m = _GRANTOR_INTEREST_RE.search(text)
        if m:
            out["grantors_interest"] = m.group(0)
        m = _INTEREST_FRACTION_RE.search(text)
        if m:
            # key case follows the reference prompt schema verbatim
            # (gemini_ocr.py:561 names it "Interest_fraction", capital I)
            out["Interest_fraction"] = m.group(0)
    if not guardable or "subject" in lower:
        m = _SUBJECT_TO_RE.search(text)
        if m:
            out["subject_to"] = m.group(0)
    # "If no values are found … set the entire object to None" (prompt :587)
    return out or None


def extract_lease_details(text: str, lower: Optional[str] = None) -> Optional[Dict[str, str]]:
    if lower is None:
        lower = text.lower()
    out: Dict[str, str] = {}
    guardable = text.isascii()  # guards exact only on ASCII (see legal.py)
    if not guardable or "acre" in lower:
        m = _ACREAGE_RE.search(text)
        if m:
            out["gross_acreage"] = m.group(1)
    if not guardable or "royalty" in lower:
        m = _ROYALTY_RE.search(text)
        if m:
            out["lease_royalty"] = m.group(1)
    if not guardable or "term" in lower:
        m = _LEASE_TERM_RE.search(text)
        if m:
            out["lease_term"] = m.group(1)
    return out or None


def page_details(
    text: str,
    lower: Optional[str] = None,
    trs_matches: Optional[List[str]] = None,
) -> Dict:
    """Per-page ``details`` dict (the reference's per-page LLM result).

    ``lower``/``trs_matches`` may carry a precomputed lowercase text and the
    page's STR matches in position order (the projection of one tagged
    regex pass, kernels/legal.py ``extract_with_regex_tagged``) so the
    fused summaries kernel never lowers or regex-scans a page twice."""
    d: Dict = {}
    if lower is None:
        lower = text.lower()
    dt = classify_document(text, lower)
    if dt:
        d["document_type"], d["document_subtype"] = dt
    parties = extract_parties(text)
    if parties:
        d["parties"] = parties
    if trs_matches is None:
        if "section" in lower or not text.isascii():
            trs_matches = [t for t, _, _ in _finditer_str(text)]
        else:
            trs_matches = []
    trs = ordered_dedup(trs_matches)
    if trs:
        d["TRS"] = trs
    if dt and dt[0] == "Deed":
        d["deed_details"] = extract_deed_details(text, lower)
    if dt and dt[0] == "Lease":
        d["lease_details"] = extract_lease_details(text, lower)
    return d


def _page_details_from_scans(pages: Sequence[str], page_scans) -> List[Dict]:
    return [
        page_details(
            t,
            lower,
            [v for n, v, _, _ in tagged if n == "section_township_range"],
        )
        for t, (lower, tagged) in zip(pages, page_scans)
    ]


def doc_details(pages: Sequence[str], page_scans=None) -> Dict:
    """Whole-document ``details``: per-page extraction → conflict-renaming
    fold (workflow.py:253-260) → ordered-dedup sweep incl. the redundant
    ``details.TRS`` drop (workflow.py:733-756). ``page_scans`` (see
    kernels/legal.py ``scan_pages``) lets the caller share one regex pass
    per page with the legal-summary path."""
    if page_scans is None:
        details_iter = (page_details(t) for t in pages)
    else:
        details_iter = iter(_page_details_from_scans(pages, page_scans))
    per_page = [(n, d) for n, d in enumerate(details_iter, 1) if d]
    merged = merge_details(per_page)
    return dedup_sweep({"details": merged})["details"]


def doc_details_json(pages: Sequence[str], page_scans=None) -> str:
    """Canonical JSON form (insertion-ordered — deterministic given page
    order, like the reference's final_result.json serialization)."""
    return json.dumps(
        doc_details(pages, page_scans), ensure_ascii=False, separators=(",", ":")
    )
