"""Document fingerprinting via rolling hash + winnowing.

The classic local-fingerprinting scheme (Schleimer, Wilkerson, Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003 —
public algorithm):

1. polynomial rolling hash over character k-grams,
2. slide a window of w consecutive k-gram hashes and keep the minimum
   (rightmost on ties),
3. the de-duplicated (hash, position) picks are the document's
   fingerprints — any shared substring of length ≥ k + w - 1 between two
   documents is guaranteed to produce at least one shared fingerprint.

Vectorized with numpy: the rolling hash is k vectorized passes (not a
per-character Python loop), window minima via stride tricks.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

# Polynomial rolling hash mod 2^64 via native uint64 wraparound: no `%` in
# the hot loop, and a 64-bit fingerprint space. The space matters at corpus
# scale, not per document: an earlier 2^31-1 Mersenne variant was ample for
# one document's ~10^2 fingerprints, but the DEDUP SELF-JOIN compares every
# fingerprint in the corpus — at just 2*10^4 docs (~2*10^6 fps) birthday
# collisions already dominated the reported pairs (measured: 2.5k pairs
# where 200 were planted), and at 10^9 docs the mean df per 31-bit value is ~50,
# i.e. pure noise. 2^64 keeps expected cross-corpus collisions << 1 up to
# ~10^9 fingerprints. Base 257 is odd (invertible mod 2^64) so every
# character position keeps full influence; the known mod-2^64 weakness is
# ADVERSARIAL inputs (Thue-Morse constructions), irrelevant to dedup of
# natural text. Hash values are exposed as the int64 BIT PATTERN
# (uint64 view) — parquet/Spark LongType carry them losslessly, and the
# winnowing min is taken over this signed view, which is just as valid an
# ordering for the winnowing guarantee and keeps scalar/batched/naive
# implementations trivially consistent.
_BASE = np.uint64(257)


def kgram_hashes(text: str, k: int = 8) -> np.ndarray:
    """Rolling polynomial hashes of all k-grams (int64 array — the signed
    view of the mod-2^64 hash — possibly empty)."""
    n = len(text)
    if n < k:
        return np.empty(0, dtype=np.int64)
    ords = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):  # k vectorized passes over all positions
        h = h * _BASE + ords[j : j + m]  # uint64 wraparound == mod 2^64
    return h.view(np.int64)


def winnow_arrays(text: str, k: int = 8, w: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """Winnowing fingerprints as parallel numpy arrays (hashes, positions),
    position-sorted — the columnar form: callers batch documents with
    ``np.concatenate`` and never box per-fingerprint Python tuples.

    Rightmost-minimum tie-break per the paper; consecutive duplicate picks
    collapse to one fingerprint.
    """
    h = kgram_hashes(text, k)
    m = len(h)
    empty = np.empty(0, dtype=np.int64)
    if m == 0:
        return empty, empty
    if m <= w:
        pos = int(np.flatnonzero(h == h.min())[-1])
        return h[pos : pos + 1], np.array([pos], dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    # rightmost argmin: argmin over reversed window
    rev = win[:, ::-1]
    right_idx = (w - 1) - rev.argmin(axis=1)
    picks_pos = np.arange(len(win)) + right_idx
    picks_hash = win[np.arange(len(win)), right_idx]
    # collapse consecutive identical positions
    keep = np.ones(len(picks_pos), dtype=bool)
    keep[1:] = picks_pos[1:] != picks_pos[:-1]
    return picks_hash[keep], picks_pos[keep].astype(np.int64)


def winnow(text: str, k: int = 8, w: int = 4) -> List[Tuple[int, int]]:
    """Tuple-list view of :func:`winnow_arrays` (kept for the naive-reference
    cross-check tests; the Spark kernel consumes the arrays directly)."""
    hs, ps = winnow_arrays(text, k, w)
    return [(int(hv), int(pv)) for hv, pv in zip(hs, ps)]


def winnow_arrays_many(
    texts, k: int = 8, w: int = 4
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch form of :func:`winnow_arrays`: fingerprints for MANY documents
    in one vectorized pass, returned as parallel arrays
    ``(doc_index, hashes, doc_local_positions)``.

    Per-document numpy dispatch is the measured constant factor for short
    documents (~10² chars ⇒ the arrays are tiny and call overhead wins).
    This concatenates the batch into one char array, computes the rolling
    hash in k passes TOTAL (not k passes per doc), takes one global
    windowed rightmost-argmin, and selects each document's valid window
    rows via ragged-range indexing — no per-document numpy work at all for
    documents with at least w k-grams. A k-gram or window never crosses a
    document boundary because window starts are restricted to each
    document's valid range. Output is byte-identical to winnow_arrays per
    document (property-tested), incl. the m<=w short-document rule.
    """
    n_docs = len(texts)
    empty = np.empty(0, dtype=np.int64)
    if n_docs == 0:
        return empty, empty, empty
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n_docs)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    total = int(lens.sum())
    if total == 0:
        return empty, empty, empty
    ords = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )
    if total < k:
        m_global = 0
        h = np.empty(0, dtype=np.int64)
    else:
        m_global = total - k + 1
        h = np.zeros(m_global, dtype=np.uint64)
        for j in range(k):  # k vectorized passes over the WHOLE batch
            h = h * _BASE + ords[j : j + m_global]  # uint64 wraparound
        h = h.view(np.int64)  # same signed ordering as kgram_hashes

    # per-doc k-gram counts and window counts
    m_doc = np.maximum(lens - k + 1, 0)          # valid hash positions per doc
    n_win = np.maximum(m_doc - w + 1, 0)         # full windows per doc

    out_doc, out_h, out_p = [], [], []

    # --- fast path: docs with at least one full window, all batched -------
    full = np.flatnonzero(n_win > 0)
    if len(full) and m_global >= w:
        # rightmost argmin of every length-w window via sparse-table
        # doubling: O(log w) full-array passes, no (N, w) materialization
        # (a sliding_window_view + fancy-index materializes N*w int64 —
        # measured 14x slower than the scalar loop at w=8).
        cur = np.arange(m_global, dtype=np.int64)  # argmin of size-1 windows
        size = 1
        while 2 * size <= w:
            a = cur[: m_global - 2 * size + 1]
            b = cur[size : size + m_global - 2 * size + 1]
            cur = np.where(h[b] <= h[a], b, a)  # <=: rightmost wins ties
            size *= 2
        if size < w:
            a = cur[: m_global - w + 1]
            b = cur[w - size : w - size + m_global - w + 1]
            amin = np.where(h[b] <= h[a], b, a)
        else:
            amin = cur
        counts = n_win[full]
        # ragged ranges: global window-start index for every valid window
        reps = np.repeat(starts[full], counts)
        local = np.arange(counts.sum()) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        widx = reps + local
        picks_pos = amin[widx]
        picks_hash = h[picks_pos]
        doc_of = np.repeat(full, counts)
        # collapse consecutive identical positions WITHIN a document
        keep = np.ones(len(picks_pos), dtype=bool)
        keep[1:] = (picks_pos[1:] != picks_pos[:-1]) | (doc_of[1:] != doc_of[:-1])
        out_doc.append(doc_of[keep])
        out_h.append(picks_hash[keep])
        out_p.append(picks_pos[keep] - starts[doc_of[keep]])

    # --- short docs (0 < m <= w): single rightmost-min pick ---------------
    short = np.flatnonzero((m_doc > 0) & (n_win == 0))
    for di in short:
        s = starts[di]
        hd = h[s : s + m_doc[di]]
        pos = int(np.flatnonzero(hd == hd.min())[-1])
        out_doc.append(np.array([di], dtype=np.int64))
        out_h.append(hd[pos : pos + 1])
        out_p.append(np.array([pos], dtype=np.int64))

    if not out_doc:
        return empty, empty, empty
    doc_idx = np.concatenate(out_doc)
    hs = np.concatenate(out_h)
    ps = np.concatenate(out_p)
    # restore per-document contiguity (short docs were appended after the
    # batched fast path); stable sort keeps position order within a doc
    order = np.argsort(doc_idx, kind="stable")
    return doc_idx[order], hs[order], ps[order]
