"""Legal-description extraction semantics, reference-exact.

Re-states the reference's deterministic domain logic (the WHAT, verified by
its own parametrized spec at
/root/reference/test/test_legal_description_extraction.py:83-91):

* regex pattern set        — /root/reference/deed_ocr/extractors/regex.py:7-24
* match enumeration        — extractors/regex.py:27-53 (header pattern is
  detected but not emitted as a match — parity kept)
* confidence scoring       — extractors/llm.py:143-165 (base 0.5, +0.2 if a
  header keyword occurs within 500 chars of the match, +0.1 for >100 chars,
  +0.1 for >200 chars, capped at 0.9)
* similarity ladder        — extractors/llm.py:195-217 (1.0 equal / 0.9
  containment / word-set Jaccard)
* per-page dedup           — extractors/llm.py:167-193 (sort by confidence
  desc, drop if similarity > 0.8 with an already-kept same-page match)
* final-list merge         — workflow.py:484-598 (full-doc values first,
  page values appended if not already present, order preserved;
  reserve_retain/oil_mineral from pages only)
"""

from __future__ import annotations

import re
from typing import Dict, List, NamedTuple, Sequence, Tuple

PATTERNS: Dict[str, "re.Pattern[str]"] = {
    # The reference pattern (extractors/regex.py:9-12) requires a numeric
    # block and a SUBDIVISION/ADDITION suffix, which contradicts the
    # reference's own spec table (test_legal_description_extraction.py:87
    # expects "Lot 42, Block B, RIVERSIDE ESTATES" to be found — that test
    # never ran, see SURVEY.md §5.1). Extended minimally to satisfy the
    # spec: letter-only blocks and the ESTATES suffix.
    "lot_block": re.compile(
        r"(Lot\s+\d+[A-Z]?,?\s*Block\s+(?:\d+[A-Z]?|[A-Z]\b),?\s*(?:of\s+)?[A-Z\s]+(?:SUBDIVISION|ADDITION|ESTATES))",
        re.IGNORECASE,
    ),
    "section_township_range": re.compile(
        r"((?:(?:N|S|E|W|NE|NW|SE|SW)\s*1/[24]\s+of\s+)?Section\s+\d+,?\s*Township\s+\d+\s*[NS],?\s*Range\s+\d+\s*[EW])",
        re.IGNORECASE,
    ),
    "metes_bounds_start": re.compile(
        r"(Beginning\s+at\s+(?:a\s+point\s+)?.*?(?:thence|containing).*?(?:acres?|feet))",
        re.IGNORECASE | re.DOTALL,
    ),
    "legal_desc_header": re.compile(
        r"(?:LEGAL\s+DESCRIPTION|PROPERTY\s+DESCRIPTION|DESCRIBED\s+AS\s+FOLLOWS?):?\s*",
        re.IGNORECASE,
    ),
}

HEADER_KEYWORDS = ("legal description", "property description", "described as follows")


# Cheap lowercase literals each pattern REQUIRES (implied by the regex:
# lot_block needs "Lot…", STR needs "Section…", metes needs "Beginning…").
# Scanning `literal in lower` first skips the regex engine entirely on the
# (common) pages that can't match — a pure short-circuit, so match output
# is byte-identical. This is the kernel hot path at 100 TB.
_PATTERN_GUARDS: Dict[str, str] = {
    "lot_block": "lot",
    "section_township_range": "section",
    "metes_bounds_start": "beginning",
}

# ---------------------------------------------------------------------------
# Fast STR scan. The full section_township_range pattern starts with an
# OPTIONAL quarter-call prefix (?:N|S|E|W|NE|NW|SE|SW)\s*1/[24]\s+of\s+ —
# sre therefore attempts a match at every n/s/e/w/whitespace position
# (~20% of English text), which measured 13.7x slower than scanning the
# "Section …" core alone. The fast path scans only the core and, at each
# core hit, reconstructs the optional prefix with an exact backward parse
# of the prefix grammar, yielding byte-identical (match, start, end)
# triples with identical non-overlap consumption (the `floor` argument is
# the previous match's end, mirroring finditer's resume position).
# Equivalence is property-tested against the original pattern in
# tests/test_tagged_scan.py, including unicode-casefold bait (ſ, K).
# ---------------------------------------------------------------------------
_STR_CORE = re.compile(
    r"Section\s+\d+,?\s*Township\s+\d+\s*[NS],?\s*Range\s+\d+\s*[EW]",
    re.IGNORECASE,
)
_WS_CHAR = re.compile(r"\s")


def _str_prefix_start(text: str, c: int, floor: int) -> int | None:
    """Start index of the quarter-call prefix ending exactly at ``c``, or
    None. Literals anchor every component, so the backward parse is
    deterministic: maximal whitespace runs, then the literal each must
    abut. ``floor`` is the previous match's end — a prefix reaching into
    already-consumed text is rejected, exactly as finditer's scan resume
    makes the original pattern do."""
    j = c
    while j > floor and _WS_CHAR.match(text[j - 1]):
        j -= 1
    if j == c:  # the grammar requires \s+ before the core
        return None
    if j - 2 < floor or text[j - 2 : j].lower() != "of":
        return None
    j -= 2
    k = j
    while k > floor and _WS_CHAR.match(text[k - 1]):
        k -= 1
    if k == j:  # \s+ between 1/[24] and "of"
        return None
    if k - 3 < floor or text[k - 3 : k - 1] != "1/" or text[k - 1] not in "24":
        return None
    k -= 3
    m = k
    while m > floor and _WS_CHAR.match(text[m - 1]):  # \s* — zero allowed
        m -= 1
    # Leftmost match start wins (finditer semantics): a valid two-letter
    # direction starts one char earlier than a valid one-letter one.
    if m - 2 >= floor and text[m - 2 : m].upper() in ("NE", "NW", "SE", "SW"):
        return m - 2
    if m - 1 >= floor and text[m - 1 : m].upper() in ("N", "S", "E", "W"):
        return m - 1
    return None


def _finditer_str(text: str) -> List[Tuple[str, int, int]]:
    """(match, start, end) triples byte-identical to
    ``PATTERNS['section_township_range'].finditer(text)``."""
    out: List[Tuple[str, int, int]] = []
    last = 0
    for m in _STR_CORE.finditer(text):
        c, e = m.start(), m.end()
        p = _str_prefix_start(text, c, last)
        s = c if p is None else p
        out.append((text[s:e], s, e))
        last = e
    return out


# (pattern_name, match_text, start, end) — one regex pass over a text,
# reusable by every consumer (description list, TRS list, details.TRS)
# instead of re-scanning the same pattern on the same string.
TaggedMatch = Tuple[str, str, int, int]


def extract_with_regex_tagged(
    text: str, lower: str | None = None
) -> List[TaggedMatch]:
    """All (pattern_name, match, start, end) for the non-header patterns, in
    pattern order then position order — the reference's enumeration order
    (extractors/regex.py:44-51, dict order is insertion order). ``lower``
    may carry a precomputed ``text.lower()`` to avoid re-lowering.

    This is the ONE regex pass over a given text; the untagged description
    list and both TRS lists are projections of it (the STR subset preserves
    page/position order, identical to a dedicated ``finditer`` rescan), so
    each page and the combined text are scanned exactly once per document.
    """
    if lower is None:
        lower = text.lower()
    # The guards are only exact on ASCII text: re.IGNORECASE applies FULL
    # Unicode casefolding (ſ↔s, ı↔i, K↔k) while str.lower() does not, so
    # 'ſection' satisfies the regex but not `"section" in lower`. Non-ASCII
    # text therefore falls through to the regex engine unconditionally —
    # the guard stays a pure short-circuit (byte-identical output).
    guardable = text.isascii()
    matches: List[TaggedMatch] = []
    for name, pattern in PATTERNS.items():
        if name == "legal_desc_header":
            continue
        if guardable and _PATTERN_GUARDS[name] not in lower:
            continue
        if name == "section_township_range":
            for t, s, e in _finditer_str(text):
                matches.append((name, t, s, e))
        else:
            for m in pattern.finditer(text):
                matches.append((name, m.group(0), m.start(), m.end()))
    return matches


def extract_with_regex(text: str, lower: str | None = None) -> List[Tuple[str, int, int]]:
    """Untagged (match, start, end) projection of the single tagged pass."""
    return [(t, s, e) for _, t, s, e in extract_with_regex_tagged(text, lower)]


def traditional_confidence(
    match_text: str, full_text: str, lower: str | None = None
) -> float:
    """Confidence score, byte-parity with extractors/llm.py:143-165."""
    confidence = 0.5
    if lower is None:
        lower = full_text.lower()
    for header in HEADER_KEYWORDS:
        if header in lower:
            header_pos = lower.find(header)
            match_pos = full_text.find(match_text)
            if abs(match_pos - header_pos) < 500:
                confidence += 0.2
                break
    if len(match_text) > 100:
        confidence += 0.1
    if len(match_text) > 200:
        confidence += 0.1
    return min(confidence, 0.9)


def text_similarity(text1: str, text2: str) -> float:
    """Similarity ladder, parity with extractors/llm.py:195-217."""
    t1 = text1.lower().strip()
    t2 = text2.lower().strip()
    if t1 == t2:
        return 1.0
    if t1 in t2 or t2 in t1:
        return 0.9
    w1 = set(t1.split())
    w2 = set(t2.split())
    if not w1 or not w2:
        return 0.0
    union = len(w1 | w2)
    return len(w1 & w2) / union if union > 0 else 0.0


class Description(NamedTuple):
    text: str
    page_number: int
    start_char: int
    end_char: int
    confidence: float


def dedup_descriptions(descriptions: Sequence[Description]) -> List[Description]:
    """Confidence-desc sort + same-page similarity>0.8 dedup
    (extractors/llm.py:167-193). Python's sort is stable, matching the
    reference's ``list.sort(key=..., reverse=True)``."""
    if not descriptions:
        return []
    ranked = sorted(descriptions, key=lambda d: d.confidence, reverse=True)
    final: List[Description] = []
    for desc in ranked:
        dup = any(
            desc.page_number == kept.page_number
            and text_similarity(desc.text, kept.text) > 0.8
            for kept in final
        )
        if not dup:
            final.append(desc)
    return final


# Per-page precomputed scan: (lowercased text, tagged matches). Threading
# these through doc_legal_summary/doc_details lets the fused summaries
# kernel lower() and regex-scan each page exactly once per document.
PageScan = Tuple[str, List[TaggedMatch]]


def scan_pages(page_texts: Sequence[str]) -> List[PageScan]:
    """One (lower, tagged-matches) pass per page."""
    out: List[PageScan] = []
    for text in page_texts:
        lower = text.lower()
        out.append((lower, extract_with_regex_tagged(text, lower)))
    return out


def find_descriptions_in_pages(
    page_texts: Sequence[str], page_scans: Sequence[PageScan] | None = None
) -> List[Description]:
    """Regex extraction + confidence over 1-indexed pages, then dedup —
    the deterministic fallback path of the reference's hybrid extractor
    (extractors/llm.py:60-141 step 4, with LLM/layout steps absent)."""
    if page_scans is None:
        page_scans = scan_pages(page_texts)
    all_desc: List[Description] = []
    for page_number, (text, (lower, tagged)) in enumerate(
        zip(page_texts, page_scans), 1
    ):
        for _, match_text, start, end in tagged:
            all_desc.append(
                Description(
                    text=match_text,
                    page_number=page_number,
                    start_char=start,
                    end_char=end,
                    confidence=traditional_confidence(match_text, text, lower),
                )
            )
    return dedup_descriptions(all_desc)


def doc_legal_summary(
    pages: Sequence[str],
    combined: str,
    page_scans: Sequence[PageScan] | None = None,
    combined_scan: PageScan | None = None,
) -> Dict[str, List[str]]:
    """Per-document legal-description + TRS result over extracted pages.

    The reference's two-pass merge (workflow.py:484-598 + ordered-dedup
    sweep :737-756): per-page extraction with confidence/similarity dedup,
    a full-document pass over the combined text, full-doc-first merge for
    legal descriptions, page-first merge for TRS. Shared by the golden
    executor and the Spark kernel so the two cannot drift.

    ``page_scans``/``combined_scan`` may carry precomputed tagged regex
    passes (see ``scan_pages``); the TRS lists are projections of the same
    tagged matches (STR subset, page then position order — exactly what a
    dedicated ``finditer`` rescan yields), so no text is scanned twice.
    """
    from deed_ocr_spark.kernels.textops import ordered_dedup

    if page_scans is None:
        page_scans = scan_pages(pages)
    if combined_scan is None:
        combined_lower = combined.lower()
        combined_scan = (
            combined_lower,
            extract_with_regex_tagged(combined, combined_lower),
        )
    combined_tagged = combined_scan[1]

    page_descs = find_descriptions_in_pages(pages, page_scans)
    pages_ld: List[str] = []
    for d in page_descs:  # collect-with-dedup, workflow.py:501-509
        if d.text and d.text not in pages_ld:
            pages_ld.append(d.text)
    fulldoc_ld = [t for _, t, _, _ in combined_tagged]
    legal = ordered_dedup(merge_final_lists(fulldoc_ld, pages_ld))

    pages_trs: List[str] = []
    for _, tagged in page_scans:
        for name, v, _, _ in tagged:
            if name == "section_township_range" and v and v not in pages_trs:
                pages_trs.append(v)
    fulldoc_trs = [
        t for n, t, _, _ in combined_tagged if n == "section_township_range"
    ]
    trs = ordered_dedup(merge_final_lists(pages_trs, fulldoc_trs))
    return {"legal_description_block": legal, "trs": trs}


def merge_final_lists(
    fulldoc_values: Sequence[str], page_values: Sequence[str]
) -> List[str]:
    """A5 merge: full-doc values first (as-is, duplicates kept), page values
    appended only when not already present — parity with
    workflow.py:547-563 (note the asymmetry: the full-doc side is NOT
    deduped against itself at this stage; the later post-process sweep at
    workflow.py:737-756 applies ordered dedup)."""
    final: List[str] = [str(v) for v in fulldoc_values if v]
    for v in page_values:
        if v and v not in final:
            final.append(v)
    return final
