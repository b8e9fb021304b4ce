"""Deterministic synthetic interleaved-document corpus.

Generates the input table of ``BASELINE.json``'s ``input_hint``:

    (doc_id: string,
     spans:  array<struct<kind:string, text:string, media_ref:string,
                          offset:int32>>)

Span kinds: ``html``, ``pdf_page``, ``ocr_region``, ``text``, ``media``
(FIXTURES.md §1). All content is a pure function of ``(seed, doc_id)`` —
``random.Random`` seeded from crc32 (never Python's salted ``hash()``) — so
any worker can generate any document independently: generation itself is
distributed via ``mapInPandas`` over ``spark.range`` and would scale to the
nominal 10^12-doc corpus without ever materializing on the driver.

Content recipes follow FIXTURES.md: deed-like snippets from the reference's
own spec cases (/root/reference/test/test_legal_description_extraction.py:83-91
and the SUNNY ACRES / EXHIBIT A fixtures at :12-46), watermark salting
matching /root/reference/deed_ocr/workflow.py:711-726, multi-page docs,
duplicated descriptions across pages, heavy-tailed sizes for skew, and
media spans interleaved at known offsets.
"""

from __future__ import annotations

import random
import zlib
from typing import Dict, Iterator, List

import pandas as pd

SPAN_KINDS = ("html", "pdf_page", "ocr_region", "text", "media")

# Deed-like sentence pool. The starred entries are the reference's own
# parametrized spec inputs (test_legal_description_extraction.py:86-89) and
# fixture pages (:12-46) — carried over so the regex/legal kernels are
# exercised by the corpus exactly as the reference's tests exercise them.
LEGAL_SNIPPETS = [
    "Beginning at a point on the North line of Section 12, thence East 330 feet",  # *
    "Lot 42, Block B, RIVERSIDE ESTATES SUBDIVISION",  # *
    "The SW 1/4 of Section 15, Township 2N, Range 3E",  # *
    "Lot 5, Block 3, of SUNNY ACRES SUBDIVISION, according to the plat thereof "
    "recorded in Plat Book 123, Page 45, of the Public Records of Example County, State.",  # *
    "Section 14, Township 2 N, Range 3 W",
    "Lot 7, Block 12, of GREEN VALLEY ADDITION",
    "Beginning at a point 50 feet North of the SE corner, thence West 200 feet, "
    "containing 1.5 acres",
]

PLAIN_SNIPPETS = [
    "This is just a regular paragraph with no legal description",  # *
    "Terms and conditions of the mortgage are set forth below.",
    "Payment shall be made monthly on the first business day.",
    "Interest rate is fixed at 5.5% per annum for the life of the loan.",
    "IN WITNESS WHEREOF, the parties have executed this instrument.",
    "The grantor hereby conveys and warrants to the grantee the following.",
    "Recorded in the office of the county clerk on the date shown above.",
    "TOGETHER WITH all improvements thereon and appurtenances thereto.",
    "Subject to easements, restrictions and reservations of record.",
    "EXHIBIT A attached hereto and incorporated herein by reference.",
]

HEADERS = [
    "LEGAL DESCRIPTION:",
    "PROPERTY DESCRIPTION:",
    "DESCRIBED AS FOLLOWS:",
    "DEED OF TRUST",
    "GENERAL WARRANTY DEED",
    "EXHIBIT A",
]

# Bumped whenever generated content changes (cache keys — e.g. the bench's
# materialized corpus — include it so stale parquet is never reused).
CORPUS_VERSION = 3

# Condensed from the reference's warranty-deed fixture
# (/root/reference/test/test_gemini_ocr.py:14-62): metes-and-bounds courses
# plus the TRS line — exercises the DOTALL metes_bounds pattern across
# multiple THENCE courses and the spaced township/range form. Party names,
# the undivided-interest clause and the subject-to clause feed the
# deterministic details extractor (kernels/details.py — the reference's
# prompt schema, gemini_ocr.py:540-588).
WARRANTY_DEED_SAMPLE = (
    # single-line so it embeds safely in the line-oriented pdf/ocr encodings
    "GENERAL WARRANTY DEED - KNOW ALL MEN BY THESE PRESENTS, that the "
    "grantors, JOHN A. SMITH AND MARY L. SMITH, for consideration "
    "acknowledged, have GRANTED, SOLD and CONVEYED unto the grantees, "
    "ROBERT J. JONES AND SUSAN K. JONES, all of the grantors undivided 1/2 "
    "interest in the property, subject to easements, restrictions and "
    "reservations of record, in all that certain tract of land described as "
    "follows: BEGINNING at a point in the south line of said survey, said "
    "point being South 89 30 00 East 100.00 feet from the southwest corner; "
    "THENCE North 0 30 00 East 200.00 feet to a point; THENCE South 89 30 00 "
    "East 150.00 feet to a point; THENCE North 89 30 00 West 150.00 feet to "
    "the POINT OF BEGINNING, containing 0.69 acres, more or less. "
    "Township 2 North, Range 3 West, Section 14. "
    "EXECUTED this 15th day of March, 2024."
)

# Lease/decree samples exercise the full details taxonomy end-to-end
# (document types, lessor/lessee and plaintiff/defendant parties,
# lease_details fields — kernels/details.py per gemini_ocr.py:540-588).
LEASE_SAMPLE = (
    "OIL & GAS LEASE - THIS LEASE made between the lessor, ACME ROYALTY "
    "COMPANY, and the lessees, CAROL M. DAVIS AND PETER Q. DAVIS, covering "
    "160 acres in Section 9, Township 4 N, Range 2 W, with a 3/16 royalty "
    "for a term of 5 years."
)

DECREE_SAMPLE = (
    "DECREE OF HEIRSHIP - IN THE DISTRICT COURT. The plaintiffs, HENRY T. "
    "WILSON AND GRACE WILSON, and the defendant, ESTATE OF EDNA WILSON, "
    "appeared; the court finds the heirs entitled to the SW 1/4 of "
    "Section 22, Township 5 N, Range 7 W."
)

NAV_WORDS = ["Home", "Search", "Records", "Login", "About", "Contact", "Help", "Index"]

WATERMARK_FORMS = ["UNOFFICIAL COPY", "UNOFFICIAL COPY UNOFFICIAL COPY", "UNO"]


def _doc_rng(doc_id: str, seed: int) -> random.Random:
    return random.Random((seed << 32) ^ zlib.crc32(doc_id.encode("utf-8")))


def _sentence(rng: random.Random) -> str:
    roll = rng.random()
    if roll < 0.02:
        return WARRANTY_DEED_SAMPLE
    if roll < 0.03:
        return LEASE_SAMPLE
    if roll < 0.04:
        return DECREE_SAMPLE
    if roll < 0.27:
        return rng.choice(LEGAL_SNIPPETS)
    return rng.choice(PLAIN_SNIPPETS)


def _maybe_watermark(rng: random.Random, text: str) -> str:
    if rng.random() < 0.3:
        wm = rng.choice(WATERMARK_FORMS)
        pos = rng.randint(0, len(text))
        sep = "\n\n\n" if rng.random() < 0.3 else "  "
        text = text[:pos] + sep + wm + sep + text[pos:]
    return text


def _gen_paragraph(rng: random.Random, n_sentences: int) -> str:
    return " ".join(_sentence(rng) for _ in range(n_sentences))


def _gen_html(rng: random.Random) -> str:
    """HTML fragment: link-dense nav/footer boilerplate around real content."""
    nav_links = "".join(
        f'<li><a href="/{w.lower()}">{w}</a></li>'
        for w in rng.sample(NAV_WORDS, rng.randint(3, 6))
    )
    paras = []
    if rng.random() < 0.5:
        paras.append(f"<h2>{rng.choice(HEADERS)}</h2>")
    for _ in range(rng.randint(1, 4)):
        paras.append(f"<p>{_maybe_watermark(rng, _gen_paragraph(rng, rng.randint(2, 5)))}</p>")
    footer_links = "".join(
        f'<a href="/f{i}">{rng.choice(NAV_WORDS)}</a> ' for i in range(rng.randint(2, 5))
    )
    return (
        f"<nav><ul>{nav_links}</ul></nav>"
        f'<div class="sidebar"><ul>{nav_links}</ul></div>'
        f"<article>{''.join(paras)}</article>"
        f"<footer><div>{footer_links}</div></footer>"
        f"<script>var t={rng.randint(0, 9)};</script>"
    )


def _gen_pdf_page(rng: random.Random) -> str:
    """Pseudo PDF page: geometry-tagged lines (see kernels.pdfblocks)."""
    lines: List[str] = []
    y = 40.0
    for _ in range(rng.randint(1, 4)):  # blocks
        if rng.random() < 0.5:
            header = rng.choice(HEADERS)
            lines.append(f"72,{y:.0f},540,{y + 14:.0f}|H|{header}")
            y += 14 + rng.uniform(2, 8)
        for _ in range(rng.randint(1, 4)):  # lines in block
            text = _maybe_watermark(rng, _sentence(rng))
            lines.append(f"72,{y:.0f},540,{y + 12:.0f}|P|{text}")
            y += 12 + rng.uniform(1, 4)
        y += rng.uniform(25, 60)  # inter-block gap > kernel gap threshold
    return "\n".join(lines)


def _gen_ocr_region(rng: random.Random) -> str:
    """Scrambled OCR fragments; reading order recoverable by XY-cut.

    Layouts: single column (clear y-gaps), two columns (clear x-gap), or a
    2×2 quadrant page (top band with an x-gap, y-gap, bottom band with an
    x-gap) — the latter forces a *nested* cut: horizontal first, then a
    vertical cut inside each band. Fragments shuffled deterministically.
    """
    frags: List[str] = []
    style = rng.random()
    if style < 0.15:  # 2×2 quadrants — nested cuts
        for band_y in (30.0, 160.0):
            for _ in range(rng.randint(1, 2)):
                frags.append(f"40,{band_y:.0f},280,{band_y + 12:.0f}|{_sentence(rng)}")
                frags.append(f"320,{band_y:.0f},560,{band_y + 12:.0f}|{_sentence(rng)}")
    else:
        two_col = style < 0.5
        n_rows = rng.randint(2, 6)
        y = 30.0
        for _ in range(n_rows):
            if two_col:
                frags.append(f"40,{y:.0f},280,{y + 12:.0f}|{_sentence(rng)}")
                frags.append(f"320,{y:.0f},560,{y + 12:.0f}|{_sentence(rng)}")
            else:
                frags.append(f"40,{y:.0f},560,{y + 12:.0f}|{_maybe_watermark(rng, _sentence(rng))}")
            y += 12 + rng.uniform(20, 40)
    rng.shuffle(frags)
    return "\n".join(frags)


def _gen_text(rng: random.Random) -> str:
    text = _gen_paragraph(rng, rng.randint(1, 6))
    text = _maybe_watermark(rng, text)
    if rng.random() < 0.3:  # whitespace noise the cleanup must collapse
        text = text.replace(". ", ".   ", 1)
    return text


def gen_doc(doc_id: str, seed: int = 42) -> Dict:
    """Generate one document: pure function of (seed, doc_id)."""
    rng = _doc_rng(doc_id, seed)
    # Heavy-tailed size: ~1.5% hot documents (skew the salting must absorb).
    if rng.random() < 0.015:
        n_spans = rng.randint(40, 120)
    else:
        n_spans = rng.randint(2, 10)
    weights = [0.2, 0.35, 0.15, 0.2, 0.1]  # html, pdf_page, ocr_region, text, media
    spans = []
    offset = 0
    for _ in range(n_spans):
        kind = rng.choices(SPAN_KINDS, weights=weights)[0]
        if kind == "media":
            text = ""
            media_ref = f"img://{doc_id}/{offset}"
        else:
            media_ref = ""
            gen = {
                "html": _gen_html,
                "pdf_page": _gen_pdf_page,
                "ocr_region": _gen_ocr_region,
                "text": _gen_text,
            }[kind]
            text = gen(rng)
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}
        )
        offset += max(len(text), 1) + rng.randint(1, 16)
    return {"doc_id": doc_id, "spans": spans}


def doc_id_for(i: int) -> str:
    # 13 digits keeps doc_id lexicographically sortable through the
    # nominal 10^12-document corpus
    return f"doc-{i:013d}"


def gen_docs_pandas(indices, seed: int = 42) -> pd.DataFrame:
    """Batch generation → pandas frame with a list-of-struct spans column."""
    docs = [gen_doc(doc_id_for(int(i)), seed) for i in indices]
    return pd.DataFrame(
        {"doc_id": [d["doc_id"] for d in docs], "spans": [d["spans"] for d in docs]}
    )


SPANS_DDL = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def corpus_df(spark, n_docs: int, seed: int = 42, n_partitions: int = 0):
    """Distributed corpus generation: ``spark.range`` → ``mapInPandas``.

    No driver-side materialization — each task generates its own id range,
    so this scales to arbitrarily large corpora (the 10^12-doc story).
    """
    return corpus_range_df(spark, 0, n_docs, seed, n_partitions)


def corpus_range_df(
    spark, start: int, end: int, seed: int = 42, n_partitions: int = 0
):
    """Corpus slice for doc indices [start, end): content is a pure function
    of (seed, doc_id), so any contiguous range regenerates exactly the same
    documents the full corpus holds at those indices — the property that
    makes per-chunk incremental maintenance of derived tables sound
    (multimodal.ensure_media_table)."""
    if n_partitions <= 0:
        n_partitions = max(spark.sparkContext.defaultParallelism, 1)

    def gen_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b):
                yield gen_docs_pandas(b["id"].to_numpy(), seed)

    return spark.range(start, end, 1, n_partitions).mapInPandas(
        gen_batches, SPANS_DDL
    )
