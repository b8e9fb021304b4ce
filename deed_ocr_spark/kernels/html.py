"""HTML main-content extraction via text-density / link-density heuristics.

This is the boilerplate-stripping capability the north_star names (the
Boilerpipe / jusText family of block-level heuristics). The reference's
analogous deterministic logic is its keyword/region layout heuristics
(/root/reference/deed_ocr/models/layout.py:83-137); no HTML parser exists
in the reference, so the algorithm here is the published public heuristic,
implemented from scratch:

1. split the markup into *blocks* at block-level tag boundaries,
2. per block compute ``link_density`` (characters inside <a> tags / total
   visible characters) and visible text length,
3. drop blocks that are short or link-dense (navigation, footers, chrome),
   and drop <script>/<style>/<nav>/<footer>/<header>/<aside> content
   entirely,
4. join surviving block texts with a blank line.

Pure Python/stdlib (regex-based tag handling — the corpus generator emits
well-formed fragments, so a full HTML5 parser is unnecessary and would add
a non-deterministic dependency).
"""

from __future__ import annotations

import html as _htmllib
import re
from typing import List

# Tags whose entire subtree is boilerplate by construction.
_DROP_SUBTREE = re.compile(
    r"<(script|style|nav|footer|header|aside)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)

# Block-level boundaries at which we segment the document.
_BLOCK_SPLIT = re.compile(
    r"</?(?:div|p|td|tr|table|ul|ol|li|h[1-6]|section|article|main|blockquote|pre|br)\b[^>]*/?>",
    re.IGNORECASE,
)

_ANCHOR = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_ANY_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")

# Published jusText-style defaults: blocks shorter than this or with more
# than this fraction of anchor text are boilerplate.
MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.33


def _visible_text(fragment: str) -> str:
    """Strip tags, unescape entities, collapse whitespace."""
    if "<" in fragment:
        fragment = _ANY_TAG.sub(" ", fragment)
    if "&" in fragment:  # unescape is regex-backed; skip when no entity
        fragment = _htmllib.unescape(fragment)
    # ' '.join(split()) == collapse-all-whitespace + strip, without regex
    return " ".join(fragment.split())


def strip_html_boilerplate(
    raw_html: str,
    min_block_chars: int = MIN_BLOCK_CHARS,
    max_link_density: float = MAX_LINK_DENSITY,
) -> str:
    """Return the main-content text of an HTML fragment.

    Deterministic block-level text-density/link-density classifier; blocks
    that survive are joined with ``"\\n\\n"`` in document order.
    """
    cleaned = _DROP_SUBTREE.sub(" ", raw_html)
    blocks = _BLOCK_SPLIT.split(cleaned)
    kept: List[str] = []
    for block in blocks:
        if not block or block.isspace():
            continue
        # length gate first: short blocks drop regardless of link density,
        # and most split fragments are tiny tag debris — skips the anchor
        # regex for them entirely (same kept set; conditions are AND-ed)
        text = _visible_text(block)
        if not text or len(text) < min_block_chars:
            continue
        anchor_chars = 0
        if "<a" in block or "<A" in block:  # cheap probe before the regex
            for m in _ANCHOR.finditer(block):
                anchor_chars += len(_visible_text(m.group(1)))
        if anchor_chars / len(text) > max_link_density:
            continue
        kept.append(text)
    return "\n\n".join(kept)
