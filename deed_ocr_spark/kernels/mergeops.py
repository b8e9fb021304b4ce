"""Document-level merge/post-process kernels, reference-exact.

* A3 map-merge with conflict rename — /root/reference/deed_ocr/workflow.py:253-260
  (page detail dicts fold left; a key already present becomes
  ``page_{n}_{key}``)
* A7 nested dedup sweep — workflow.py:737-756 (ordered dedup applied to
  every all-string list at top level and inside ``details``, skipping the
  special fields; ``details.TRS`` removed as redundant, workflow.py:733-735)
* P9 error categorization — workflow.py:65-110 (exception text →
  {timeout, rate_limit, network, authentication, not_found, server_error,
  json_parsing, content_filter, invalid_argument, unknown} + retry flag)
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

from deed_ocr_spark.kernels.textops import ordered_dedup

SPECIAL_FIELDS = {"token_usage", "processing_status", "error", "error_info", "full_text"}


def merge_details(page_details: Sequence[Tuple[int, Dict[str, Any]]]) -> Dict[str, Any]:
    """Fold per-page ``details`` dicts; conflicts become ``page_{n}_{key}``
    (workflow.py:253-260 semantics: first writer keeps the bare key)."""
    combined: Dict[str, Any] = {}
    for page_num, details in page_details:
        if not isinstance(details, dict):
            continue
        for key, value in details.items():
            if key in combined:
                combined[f"page_{page_num}_{key}"] = value
            else:
                combined[key] = value
    return combined


def _is_string_list(value: Any) -> bool:
    return isinstance(value, list) and all(isinstance(v, str) for v in value)


def dedup_sweep(result: Dict[str, Any]) -> Dict[str, Any]:
    """A7: ordered dedup over every all-string list field, top level and one
    level inside ``details``; drops redundant ``details.TRS`` first
    (workflow.py:733-756)."""
    cleaned = dict(result)
    if isinstance(cleaned.get("details"), dict):
        details = dict(cleaned["details"])
        details.pop("TRS", None)
        for key, value in details.items():
            if _is_string_list(value):
                details[key] = ordered_dedup(value)
        cleaned["details"] = details
    for key, value in cleaned.items():
        if key not in SPECIAL_FIELDS and key != "details" and _is_string_list(value):
            cleaned[key] = ordered_dedup(value)
    return cleaned


# (category, retryable) ladder; substring checks over the lowercased error
# text, in the reference's exact evaluation order (workflow.py:86-107).
# The engine-local variants (ocr/gemini_ocr.py:48-101 etc.) add
# content_filter / invalid_argument categories; this is the workflow one.
_ERROR_LADDER: List[Tuple[Tuple[str, ...], str, bool]] = [
    (("timeout", "timed out"), "timeout", True),
    (("rate limit", "quota"), "rate_limit", True),
    (("network", "connection", "unreachable"), "network", True),
    (("authentication", "unauthorized", "invalid api key"), "authentication", False),
    (("not found", "404"), "not_found", False),
    (("internal server error", "500"), "server_error", True),
]


def classify_error(message: str) -> Tuple[str, bool]:
    """P9: exception text → (error_kind, retryable), workflow.py:65-110."""
    lower = (message or "").lower()
    for needles, kind, retry in _ERROR_LADDER:
        if any(n in lower for n in needles):
            return kind, retry
    if "json" in lower and "parse" in lower:
        return "json_parsing", True
    return "unknown", True
