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
# This is the workflow variant; the engine variant below
# (classify_error_gemini) carries the extra categories from
# ocr/gemini_ocr.py:48-101. Union of the two = the full 10+-category
# taxonomy: timeout, rate_limit, network, authentication, not_found,
# model_not_found, server_error, json_parsing, content_filter,
# invalid_argument, unknown.
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


# category → retryable, the union of both ladders (workflow.py:86-107 +
# gemini_ocr.py:66-101). The state ledger consults this to decide whether a
# bucket with errors is worth re-running (retry_helper.py:224-349 analog).
RETRYABLE: Dict[str, bool] = {
    "timeout": True,
    "rate_limit": True,
    "network": True,
    "authentication": False,
    "not_found": False,
    "model_not_found": False,
    "server_error": True,
    "json_parsing": True,
    "content_filter": False,
    "invalid_argument": False,
    "unknown": True,
}


def classify_error_gemini(message: str) -> Tuple[str, bool]:
    """Engine-variant taxonomy, parity with ocr/gemini_ocr.py:66-101.

    Differences from the workflow ladder (same evaluation order as the
    reference's elif chain): rate_limit also matches ``resource_exhausted``;
    authentication matches the bare ``api key``; a not-found whose text
    mentions ``model`` becomes ``model_not_found``; server_error also
    matches ``internal_error``; json_parsing needs json + (parse|decode);
    plus the two engine-only categories ``content_filter`` (not retryable)
    and ``invalid_argument`` (not retryable). Unknown defaults to retry.
    """
    lower = (message or "").lower()
    if "timeout" in lower or "timed out" in lower:
        return "timeout", True
    if "rate limit" in lower or "quota" in lower or "resource_exhausted" in lower:
        return "rate_limit", True
    if "network" in lower or "connection" in lower or "unreachable" in lower:
        return "network", True
    if "api key" in lower or "authentication" in lower or "unauthorized" in lower:
        return "authentication", False
    if "not found" in lower or "404" in lower:
        if "model" in lower:
            return "model_not_found", False
        return "not_found", False
    if "internal server error" in lower or "500" in lower or "internal_error" in lower:
        return "server_error", True
    if "json" in lower and ("parse" in lower or "decode" in lower):
        return "json_parsing", True
    if "content_filter" in lower or "safety" in lower:
        return "content_filter", False
    if "invalid_argument" in lower:
        return "invalid_argument", False
    return "unknown", True
