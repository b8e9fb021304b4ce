"""Per-row error channel: a kernel exception never aborts the batch — the
span degrades to empty text with a taxonomy-classified status, mirroring
the reference's per-page error records (workflow.py:262-282)."""

import pandas as pd
import pytest

import deed_ocr_spark.extract as ex
from deed_ocr_spark.corpus import gen_docs_pandas


def _run_batch(pdf):
    return ex._extract_flat(ex._explode_batch(pdf))


def test_kernel_exception_becomes_status(monkeypatch):
    def boom(text):
        raise RuntimeError("Read timed out after 30s")

    monkeypatch.setitem(ex._KIND_FN, "html", boom)
    pdf = gen_docs_pandas(range(40), 42)
    out = _run_batch(pdf)
    html = out[out["src_kind"] == "html"]
    assert len(html) > 0
    assert set(html["status"]) == {"timeout"}
    assert set(html["text"]) == {""}
    # every other span unaffected and the batch completed fully
    others = out[out["src_kind"] != "html"]
    assert set(others["status"]) == {"ok"}
    assert len(out) == sum(len(s) for s in pdf["spans"])


def test_error_rows_keep_order_dense(monkeypatch):
    monkeypatch.setitem(
        ex._KIND_FN, "ocr_region", lambda t: (_ for _ in ()).throw(ValueError("x"))
    )
    pdf = gen_docs_pandas(range(40), 42)
    out = _run_batch(pdf)
    for doc_id, g in out.groupby("doc_id"):
        assert sorted(g["order"]) == list(range(len(g)))


def test_clean_run_is_all_ok():
    out = _run_batch(gen_docs_pandas(range(40), 42))
    assert set(out["status"]) == {"ok"}
