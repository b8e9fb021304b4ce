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

from typing import List, NamedTuple, Sequence, Tuple

import numpy as np


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


def segment_pdf_blocks_many(
    payloads: Sequence[str], gap: float = 18.0
) -> List[str]:
    """Batched ``segment_pdf_blocks``: one numpy pass over every line of
    every page in the Arrow batch (byte-identical output, property-tested
    against the scalar form).

    The scalar kernel's cost is dominated by per-line Python ``float()``
    calls and per-line tuple construction; here the coordinate matrix is
    parsed by numpy's C string→float conversion in one call, the
    (payload, y1, x1) ordering is one stable ``lexsort``, block breaks are
    a vectorized mask, and per-block reading-order keys come from
    ``minimum.reduceat`` over the contiguous block runs. Only the final
    string joins stay in Python.
    """
    pidx: List[int] = []
    coords: List[str] = []  # flat x1,y1,x2,y2 runs — one 1-D C parse
    is_h: List[bool] = []
    texts: List[str] = []
    for p, payload in enumerate(payloads):
        for raw in payload.split("\n"):
            if not raw.strip():
                continue
            parts = raw.split("|", 2)
            if len(parts) != 3:
                continue
            cs = parts[0].split(",")
            if len(cs) != 4:
                continue
            pidx.append(p)
            coords.extend(cs)
            is_h.append(parts[1] == "H")
            texts.append(parts[2])
    n = len(pidx)
    if n == 0:
        return ["" for _ in payloads]
    try:
        cmat = np.asarray(coords, dtype=np.float64).reshape(-1, 4)
    except ValueError:
        # a malformed float anywhere in the batch: fall back to the scalar
        # path, which skips exactly the malformed lines (rare; parity > speed)
        return [segment_pdf_blocks(p, gap) for p in payloads]
    if not np.isfinite(cmat).all():
        # 'nan'/'inf' parse in both paths (no ValueError), but Python's
        # sorted() and np.lexsort order non-finite keys differently — the
        # byte-identical contract holds only on finite coordinates, so such
        # adversarial payloads take the scalar path too
        return [segment_pdf_blocks(p, gap) for p in payloads]

    pix = np.asarray(pidx, dtype=np.int64)
    x1, y1, y2 = cmat[:, 0], cmat[:, 1], cmat[:, 3]
    header = np.asarray(is_h, dtype=bool)

    order = np.lexsort((x1, y1, pix))  # stable: ties keep input order
    pix_s, x1_s, y1_s, y2_s = pix[order], x1[order], y1[order], y2[order]

    new_block = np.empty(n, dtype=bool)
    new_block[0] = True
    new_block[1:] = (
        (pix_s[1:] != pix_s[:-1])
        | header[order][1:]
        | ((y1_s[1:] - y2_s[:-1]) > gap)
    )
    starts = np.flatnonzero(new_block)
    ends = np.append(starts[1:], n)
    b_pix = pix_s[starts]
    b_min_y1 = np.minimum.reduceat(y1_s, starts)
    b_min_x1 = np.minimum.reduceat(x1_s, starts)
    b_order = np.lexsort((b_min_x1, b_min_y1, b_pix))  # stable, like list.sort

    order_l = order.tolist()  # texts stay a Python list; no object arrays
    out_parts: List[List[str]] = [[] for _ in payloads]
    for b in b_order.tolist():
        s, e = starts[b], ends[b]
        out_parts[b_pix[b]].append("\n".join(texts[j] for j in order_l[s:e]))
    return ["\n\n".join(parts) for parts in out_parts]
