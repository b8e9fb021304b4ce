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


def extract_with_regex(text: str, lower: str | None = None) -> List[Tuple[str, int, int]]:
    """All (match, start, end) for the non-header patterns, in pattern order
    then position order — the reference's enumeration order
    (extractors/regex.py:44-51, dict order is insertion order). ``lower``
    may carry a precomputed ``text.lower()`` to avoid re-lowering."""
    if lower is None:
        lower = text.lower()
    matches: List[Tuple[str, int, int]] = []
    for name, pattern in PATTERNS.items():
        if name == "legal_desc_header":
            continue
        if _PATTERN_GUARDS[name] not in lower:
            continue
        for m in pattern.finditer(text):
            matches.append((m.group(0), m.start(), m.end()))
    return matches


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


def find_descriptions_in_pages(page_texts: Sequence[str]) -> List[Description]:
    """Regex extraction + confidence over 1-indexed pages, then dedup —
    the deterministic fallback path of the reference's hybrid extractor
    (extractors/llm.py:60-141 step 4, with LLM/layout steps absent)."""
    all_desc: List[Description] = []
    for page_number, text in enumerate(page_texts, 1):
        lower = text.lower()
        for match_text, start, end in extract_with_regex(text, lower):
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


def doc_legal_summary(pages: Sequence[str], combined: str) -> Dict[str, List[str]]:
    """Per-document legal-description + TRS result over extracted pages.

    The reference's two-pass merge (workflow.py:484-598 + ordered-dedup
    sweep :737-756): per-page extraction with confidence/similarity dedup,
    a full-document pass over the combined text, full-doc-first merge for
    legal descriptions, page-first merge for TRS. Shared by the golden
    executor and the Spark kernel so the two cannot drift.
    """
    from deed_ocr_spark.kernels.textops import ordered_dedup

    page_descs = find_descriptions_in_pages(pages)
    pages_ld: List[str] = []
    for d in page_descs:  # collect-with-dedup, workflow.py:501-509
        if d.text and d.text not in pages_ld:
            pages_ld.append(d.text)
    combined_lower = combined.lower()
    fulldoc_ld = [m[0] for m in extract_with_regex(combined, combined_lower)]
    legal = ordered_dedup(merge_final_lists(fulldoc_ld, pages_ld))

    trs_pat = PATTERNS["section_township_range"]
    pages_trs: List[str] = []
    for text in pages:
        if "section" not in text.lower():
            continue
        for m in trs_pat.finditer(text):
            v = m.group(0)
            if v and v not in pages_trs:
                pages_trs.append(v)
    if "section" in combined_lower:
        fulldoc_trs = [m.group(0) for m in trs_pat.finditer(combined)]
    else:
        fulldoc_trs = []
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
