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

# Mersenne prime 2^31-1 keeps h*BASE well inside int64 (no silent numpy
# overflow); 2^31 hash space is ample for fingerprint sets of ~10^3/doc.
_BASE = np.int64(257)
_MOD = np.int64((1 << 31) - 1)


def kgram_hashes(text: str, k: int = 8) -> np.ndarray:
    """Rolling polynomial hashes of all k-grams (int64 array, possibly empty)."""
    n = len(text)
    if n < k:
        return np.empty(0, dtype=np.int64)
    ords = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    m = n - k + 1
    h = np.zeros(m, dtype=np.int64)
    for j in range(k):  # k vectorized passes over all positions
        h = ((h * _BASE) % _MOD + ords[j : j + m]) % _MOD
    return h


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
