"""Unit tests for the A3/A7/P9 merge kernels (reference-exact semantics)."""

from deed_ocr_spark.kernels.mergeops import (
    classify_error,
    classify_error_gemini,
    dedup_sweep,
    merge_details,
)


def test_merge_details_conflict_rename():
    # workflow.py:253-260: first writer keeps the bare key; later pages get
    # page_{n}_{key}
    out = merge_details(
        [
            (1, {"document_type": "deed", "county": "Example"}),
            (2, {"document_type": "lease"}),
            (3, {"county": "Other", "state": "TX"}),
        ]
    )
    assert out == {
        "document_type": "deed",
        "county": "Example",
        "page_2_document_type": "lease",
        "page_3_county": "Other",
        "state": "TX",
    }


def test_merge_details_skips_non_dict():
    assert merge_details([(1, None), (2, "oops"), (3, {"k": "v"})]) == {"k": "v"}


def test_dedup_sweep():
    result = {
        "legal_description_block": ["a", "b", "a", ""],
        "TRS": ["t1", "t1"],
        "full_text": ["x", "x"],  # special field: untouched
        "mixed": ["s", 1],  # not all-string: untouched
        "details": {
            "TRS": ["redundant"],  # dropped entirely
            "parties": ["p1", "p1", "p2"],
            "note": "scalar stays",
        },
    }
    out = dedup_sweep(result)
    assert out["legal_description_block"] == ["a", "b"]
    assert out["TRS"] == ["t1"]
    assert out["full_text"] == ["x", "x"]
    assert out["mixed"] == ["s", 1]
    assert "TRS" not in out["details"]
    assert out["details"]["parties"] == ["p1", "p2"]
    assert out["details"]["note"] == "scalar stays"
    # input not mutated
    assert result["details"]["TRS"] == ["redundant"]


def test_classify_error_reference_ladder():
    # workflow.py:86-107, exact order and retry flags
    assert classify_error("Read timed out after 30s") == ("timeout", True)
    assert classify_error("Rate limit exceeded; quota") == ("rate_limit", True)
    assert classify_error("Network connection unreachable") == ("network", True)
    assert classify_error("Invalid API key provided") == ("authentication", False)
    assert classify_error("Resource not found (404)") == ("not_found", False)
    assert classify_error("HTTP 500 internal server error") == ("server_error", True)
    assert classify_error("could not parse JSON response") == ("json_parsing", True)
    assert classify_error("something odd") == ("unknown", True)
    # ladder order: "connection timeout" hits timeout before network
    assert classify_error("connection timeout")[0] == "timeout"


def test_classify_error_gemini_full_taxonomy():
    # ocr/gemini_ocr.py:66-101: all 11 categories, exact elif order + flags
    assert classify_error_gemini("Read timed out") == ("timeout", True)
    assert classify_error_gemini("RESOURCE_EXHAUSTED") == ("rate_limit", True)
    assert classify_error_gemini("connection reset") == ("network", True)
    assert classify_error_gemini("bad api key") == ("authentication", False)
    assert classify_error_gemini("endpoint not found") == ("not_found", False)
    # not-found mentioning model escalates to model_not_found (gemini_ocr.py:84-85)
    assert classify_error_gemini("model gemini-x not found") == (
        "model_not_found",
        False,
    )
    assert classify_error_gemini("INTERNAL_ERROR occurred") == ("server_error", True)
    assert classify_error_gemini("failed to decode json body") == ("json_parsing", True)
    # json without parse/decode does NOT classify (needs both needles)
    assert classify_error_gemini("json body too large") == ("unknown", True)
    assert classify_error_gemini("blocked by safety settings") == (
        "content_filter",
        False,
    )
    assert classify_error_gemini("CONTENT_FILTER triggered") == (
        "content_filter",
        False,
    )
    assert classify_error_gemini("INVALID_ARGUMENT: bad mime") == (
        "invalid_argument",
        False,
    )
    assert classify_error_gemini("mystery") == ("unknown", True)
    # order: authentication ("api key") checked before not_found
    assert classify_error_gemini("api key not found")[0] == "authentication"
