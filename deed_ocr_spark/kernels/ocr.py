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
