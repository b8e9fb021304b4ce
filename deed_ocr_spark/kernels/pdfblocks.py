"""PDF page parsing with block segmentation.

The reference renders PDF pages and delegates text to a remote OCR model
(/root/reference/deed_ocr/utils/pdf_converter.py:46-60) whose response
carries a page → block → paragraph → word hierarchy that the reference
flattens (/root/reference/deed_ocr/ocr/vision_ocr.py:309-342). Our corpus
encodes a *pseudo page*: one line per laid-out text line, each tagged with
synthetic geometry, and this kernel recovers the block structure
deterministically.

Input line format (corpus contract, see deed_ocr_spark.corpus):

    ``x1,y1,x2,y2|TYPE|text``

where TYPE is ``H`` (header) or ``P`` (paragraph line). Lines arrive in
layout order top-to-bottom. Segmentation rule: consecutive lines belong to
the same block while the vertical gap between them is <= ``gap``; block
text joins its lines with ``"\\n"``; page text joins blocks with
``"\\n\\n"``. Blocks are emitted in reading order (top y, then left x).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple


class PdfLine(NamedTuple):
    x1: float
    y1: float
    x2: float
    y2: float
    kind: str  # 'H' | 'P'
    text: str


def parse_pdf_lines(payload: str) -> List[PdfLine]:
    """Parse the corpus pseudo-page encoding; malformed lines are skipped
    (mirrors the reference's per-unit fault isolation — a bad line never
    aborts the page, cf. workflow.py:262-282 error containment)."""
    lines: List[PdfLine] = []
    for raw in payload.split("\n"):
        if not raw.strip():
            continue
        parts = raw.split("|", 2)
        if len(parts) != 3:
            continue
        coords = parts[0].split(",")
        if len(coords) != 4:
            continue
        try:
            x1, y1, x2, y2 = (float(c) for c in coords)
        except ValueError:
            continue
        lines.append(PdfLine(x1, y1, x2, y2, parts[1], parts[2]))
    return lines


def segment_pdf_blocks(payload: str, gap: float = 18.0) -> str:
    """Segment a pseudo PDF page into blocks and return reading-order text.

    Headers (``H`` lines) always start a new block, matching the
    header-delimited region model of the reference's layout heuristics
    (/root/reference/deed_ocr/models/layout.py:96-119).
    """
    lines = parse_pdf_lines(payload)
    if not lines:
        return ""
    # Stable sort by (top y, left x) — reading order for single-column text.
    lines = sorted(lines, key=lambda ln: (ln.y1, ln.x1))
    blocks: List[List[PdfLine]] = []
    current: List[PdfLine] = [lines[0]]
    for prev, cur in zip(lines, lines[1:]):
        new_block = cur.kind == "H" or (cur.y1 - prev.y2) > gap
        if new_block:
            blocks.append(current)
            current = [cur]
        else:
            current.append(cur)
    blocks.append(current)

    def block_key(block: List[PdfLine]) -> Tuple[float, float]:
        return (min(ln.y1 for ln in block), min(ln.x1 for ln in block))

    blocks.sort(key=block_key)
    return "\n\n".join("\n".join(ln.text for ln in block) for block in blocks)
