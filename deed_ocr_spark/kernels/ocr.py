"""OCR-region handling: reading-order recovery via recursive XY-cut.

The reference's spatial heuristic sorts boxes below a header by vertical
position (/root/reference/deed_ocr/models/layout.py:108-119) and its OCR
response preserves block order from the remote service
(/root/reference/deed_ocr/ocr/vision_ocr.py:309-342). For scanned regions
our engine must *recover* reading order itself; we use the classic
recursive XY-cut algorithm (Nagy & Seth, 1984 — public domain technique):

1. project fragment bounding boxes onto the Y axis; if a horizontal gap of
   at least ``min_gap`` separates the projections, cut there and recurse
   top part first;
2. otherwise project onto X and try a vertical cut (left part first —
   handles multi-column layouts);
3. when no cut exists, order fragments by (y1, x1).

Input fragment format (corpus contract): one fragment per line,
``x1,y1,x2,y2|text``, in *scrambled* order.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence


class Fragment(NamedTuple):
    x1: float
    y1: float
    x2: float
    y2: float
    text: str


def parse_ocr_region(payload: str) -> List[Fragment]:
    frags: List[Fragment] = []
    for raw in payload.split("\n"):
        if not raw.strip():
            continue
        parts = raw.split("|", 1)
        if len(parts) != 2:
            continue
        coords = parts[0].split(",")
        if len(coords) != 4:
            continue
        try:
            x1, y1, x2, y2 = (float(c) for c in coords)
        except ValueError:
            continue
        frags.append(Fragment(x1, y1, x2, y2, parts[1]))
    return frags


def _widest_gap(
    intervals: Sequence[tuple], min_gap: float
) -> Optional[float]:
    """Largest gap >= min_gap between merged 1-D intervals; returns the cut
    coordinate (midpoint) or None."""
    ivs = sorted(intervals)
    best_width = 0.0
    best_cut: Optional[float] = None
    cover_end = ivs[0][1]
    for lo, hi in ivs[1:]:
        if lo > cover_end:
            width = lo - cover_end
            if width >= min_gap and width > best_width:
                best_width = width
                best_cut = (cover_end + lo) / 2.0
        cover_end = max(cover_end, hi)
    return best_cut


def xy_cut_order(
    frags: Sequence[Fragment], min_gap: float = 12.0
) -> List[Fragment]:
    """Return fragments in recovered reading order (recursive XY-cut)."""
    if len(frags) <= 1:
        return list(frags)
    cut_y = _widest_gap([(f.y1, f.y2) for f in frags], min_gap)
    if cut_y is not None:
        top = [f for f in frags if f.y2 <= cut_y]
        bottom = [f for f in frags if f.y2 > cut_y]
        return xy_cut_order(top, min_gap) + xy_cut_order(bottom, min_gap)
    cut_x = _widest_gap([(f.x1, f.x2) for f in frags], min_gap)
    if cut_x is not None:
        left = [f for f in frags if f.x2 <= cut_x]
        right = [f for f in frags if f.x2 > cut_x]
        return xy_cut_order(left, min_gap) + xy_cut_order(right, min_gap)
    return sorted(frags, key=lambda f: (f.y1, f.x1))


def ocr_region_text(payload: str, min_gap: float = 12.0) -> str:
    """Parse a scrambled OCR region and return reading-order text."""
    ordered = xy_cut_order(parse_ocr_region(payload), min_gap)
    return "\n".join(f.text for f in ordered)


def ocr_region_texts_many(
    payloads: Sequence[str], min_gap: float = 12.0
) -> List[str]:
    """Batched ``ocr_region_text``: all coordinates of every region in the
    Arrow batch parsed by numpy's C string→float conversion in ONE call
    (the scalar kernel's per-line ``float()`` quadruples were the parse
    cost — same trick as pdfblocks.segment_pdf_blocks_many). The XY-cut
    recursion itself stays per region (it is the allowed recursive
    parser). Byte-identical to the scalar form, property-tested; payloads
    numpy cannot parse identically (underscored floats, nan/inf — where
    Python's float() differs or ordering of non-finite keys diverges)
    fall back to the scalar path wholesale, which skips/handles exactly
    those lines."""
    import numpy as np

    pidx: List[int] = []
    coords: List[str] = []
    texts: List[str] = []
    for p, payload in enumerate(payloads):
        for raw in payload.split("\n"):
            if not raw.strip():
                continue
            parts = raw.split("|", 1)
            if len(parts) != 2:
                continue
            cs = parts[0].split(",")
            if len(cs) != 4:
                continue
            pidx.append(p)
            coords.extend(cs)
            texts.append(parts[1])
    if not pidx:
        return ["" for _ in payloads]
    try:
        cmat = np.asarray(coords, dtype=np.float64).reshape(-1, 4)
    except ValueError:
        return [ocr_region_text(p, min_gap) for p in payloads]
    if not np.isfinite(cmat).all():
        return [ocr_region_text(p, min_gap) for p in payloads]
    x1 = cmat[:, 0].tolist()
    y1 = cmat[:, 1].tolist()
    x2 = cmat[:, 2].tolist()
    y2 = cmat[:, 3].tolist()
    frags_per: List[List[Fragment]] = [[] for _ in payloads]
    for i, p in enumerate(pidx):
        frags_per[p].append(Fragment(x1[i], y1[i], x2[i], y2[i], texts[i]))
    return [
        "\n".join(f.text for f in xy_cut_order(fr, min_gap)) for fr in frags_per
    ]
