"""Single-process golden executor — the semantic oracle for the Spark job.

Applies the extraction kernels document-by-document, exactly as the
reference processes one PDF at a time (/root/reference/deed_ocr/cli.py:226,
workflow.py:195). The Spark pipeline (deed_ocr_spark.extract) must produce
byte-identical ``(kind, text, media_ref, order)`` sequences per doc_id
under ANY partitioning — the north_rule's per-row invariant.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from deed_ocr_spark.kernels.html import strip_html_boilerplate
from deed_ocr_spark.kernels.legal import doc_legal_summary
from deed_ocr_spark.kernels.ocr import ocr_region_text
from deed_ocr_spark.kernels.pdfblocks import segment_pdf_blocks
from deed_ocr_spark.kernels.textops import clean_watermarks, page_concat

# (order, kind, text, media_ref, src_kind)
OutSpan = Tuple[int, str, str, str, str]


def extract_span_text(kind: str, text: str) -> str:
    """Kind-dispatched extraction for one text-bearing span, then the
    reference's watermark/whitespace cleanup (workflow.py:711-726)."""
    if kind == "html":
        extracted = strip_html_boilerplate(text)
    elif kind == "pdf_page":
        extracted = segment_pdf_blocks(text)
    elif kind == "ocr_region":
        extracted = ocr_region_text(text)
    else:  # 'text' passthrough
        extracted = text
    return clean_watermarks(extracted)


def extract_doc(spans: Sequence[Dict]) -> List[OutSpan]:
    """Extract one document's ordered output span sequence.

    Input spans may arrive in any order; ``offset`` defines order (order is
    data, never row position). Every input span yields exactly one output
    span — empty extractions are kept as empty text spans, mirroring the
    reference's keep-going-with-error-records discipline
    (workflow.py:262-282).
    """
    ordered = sorted(spans, key=lambda s: s["offset"])
    out: List[OutSpan] = []
    for order, span in enumerate(ordered):
        kind = span["kind"]
        if kind == "media":
            out.append((order, "media_ref", "", span["media_ref"] or "", kind))
        else:
            out.append((order, "text", extract_span_text(kind, span["text"] or ""), "", kind))
    return out


def doc_summary(spans: Sequence[Dict]) -> Dict:
    """Stage-2 per-document result: the reference's final-merge semantics.

    Pages = the extracted text spans in order (each text-bearing span plays
    the role of one page). Combined text uses the reference separator
    (workflow.py:221); the full-doc pass re-runs extraction over the
    combined text and the two sources merge per workflow.py:484-598 with
    the post-process ordered-dedup sweep (workflow.py:737-756).
    """
    from deed_ocr_spark.kernels.details import doc_details_json

    out_spans = extract_doc(spans)
    pages = [text for _, kind, text, _, _ in out_spans if kind == "text"]
    combined = page_concat(pages)
    summary = doc_legal_summary(pages, combined)
    n_media = sum(1 for s in out_spans if s[1] == "media_ref")
    return {
        "n_pages": len(pages),
        "n_spans": len(out_spans),
        "n_media": n_media,
        "combined_chars": len(combined),
        "legal_description_block": summary["legal_description_block"],
        "trs": summary["trs"],
        "details_json": doc_details_json(pages),
    }
