"""Property-based kernel tests (hypothesis) — invariants that must hold for
ANY input, complementing the example-based parity tests."""

import string

from hypothesis import given, settings, strategies as st

from deed_ocr_spark.kernels.legal import text_similarity
from deed_ocr_spark.kernels.ocr import Fragment, xy_cut_order
from deed_ocr_spark.kernels.textops import clean_watermarks, ordered_dedup
from deed_ocr_spark.golden import extract_doc

text_strategy = st.text(
    alphabet=string.ascii_letters + string.digits + " \n.,;:!?-/",
    max_size=400,
)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_clean_watermarks_idempotent_on_watermark_free(s):
    once = clean_watermarks(s)
    # after one pass no watermark tokens remain, so a second pass only
    # re-applies whitespace collapse — which is idempotent
    assert clean_watermarks(once) == once


@given(st.lists(st.text(max_size=20)))
@settings(max_examples=200, deadline=None)
def test_ordered_dedup_properties(items):
    out = ordered_dedup(items)
    assert len(out) == len(set(out))  # no duplicates
    assert all(x in items for x in out)  # subset
    assert ordered_dedup(out) == out  # idempotent
    # stable: relative order of survivors matches first occurrences
    firsts = []
    for x in items:
        if x and x not in firsts:
            firsts.append(x)
    assert out == firsts


@given(text_strategy, text_strategy)
@settings(max_examples=200, deadline=None)
def test_text_similarity_bounds_and_symmetry_class(a, b):
    s = text_similarity(a, b)
    assert 0.0 <= s <= 1.0
    # equality class is symmetric; containment class is symmetric
    assert text_similarity(b, a) == s or {
        round(text_similarity(b, a), 9),
        round(s, 9),
    } <= {0.9, 1.0} or abs(text_similarity(b, a) - s) < 1e-12


boxes = st.lists(
    st.tuples(
        st.floats(0, 500, allow_nan=False),
        st.floats(0, 700, allow_nan=False),
        st.floats(1, 100, allow_nan=False),
        st.floats(1, 30, allow_nan=False),
        st.text(alphabet=string.ascii_letters + " ", min_size=1, max_size=12),
    ),
    max_size=25,
)


@given(boxes)
@settings(max_examples=150, deadline=None)
def test_xy_cut_is_permutation(raw):
    frags = [Fragment(x, y, x + w, y + h, t) for x, y, w, h, t in raw]
    out = xy_cut_order(frags)
    assert sorted(map(tuple, out)) == sorted(map(tuple, frags))


spans_strategy = st.lists(
    st.builds(
        dict,
        kind=st.sampled_from(["html", "pdf_page", "ocr_region", "text", "media"]),
        text=text_strategy,
        media_ref=st.text(alphabet=string.ascii_lowercase + ":/", max_size=20),
        offset=st.integers(0, 10_000_000),
    ),
    max_size=12,
    unique_by=lambda s: s["offset"],
)


@given(spans_strategy)
@settings(max_examples=150, deadline=None)
def test_extract_doc_total_and_ordered(spans):
    out = extract_doc(spans)
    # one output span per input span, dense 0-based order
    assert len(out) == len(spans)
    assert [o[0] for o in out] == list(range(len(spans)))
    # order is derived from offsets: shuffling the input changes nothing
    out_rev = extract_doc(list(reversed(spans)))
    assert out == out_rev
    for _, kind, text, media_ref, src in out:
        if kind == "media_ref":
            assert text == ""
        else:
            assert media_ref == ""


# --- batched pdf segmentation must be byte-identical to the scalar kernel ---
_pdf_line = st.builds(
    lambda x1, y1, h, kind, text: f"{x1:.1f},{y1:.1f},540,{y1 + h:.1f}|{kind}|{text}",
    st.floats(0, 600, allow_nan=False),
    st.floats(0, 800, allow_nan=False),
    st.floats(5, 30, allow_nan=False),
    st.sampled_from(["H", "P"]),
    st.text(alphabet=string.ascii_letters + " .,", max_size=30),
)
_pdf_payload = st.one_of(
    st.just(""),
    st.just("garbage no pipes"),
    st.just("1,2|P|too few coords"),
    st.lists(_pdf_line, max_size=12).map("\n".join),
)


@given(st.lists(_pdf_payload, max_size=8))
@settings(max_examples=150, deadline=None)
def test_segment_pdf_blocks_many_matches_scalar(payloads):
    from deed_ocr_spark.kernels.pdfblocks import (
        segment_pdf_blocks,
        segment_pdf_blocks_many,
    )

    assert segment_pdf_blocks_many(payloads) == [
        segment_pdf_blocks(p) for p in payloads
    ]


def test_segment_many_malformed_float_fallback():
    from deed_ocr_spark.kernels.pdfblocks import (
        segment_pdf_blocks,
        segment_pdf_blocks_many,
    )

    payloads = [
        "72,40,540,52|P|good line",
        "72,nope,540,52|P|bad float\n72,40,540,52|P|kept",
    ]
    assert segment_pdf_blocks_many(payloads) == [
        segment_pdf_blocks(p) for p in payloads
    ]


# --- details kernel: total on arbitrary input, JSON always round-trips ------
_page_text = st.text(
    alphabet=string.ascii_letters + string.digits + " \n.,;:!?-/&%'",
    max_size=300,
)


@given(st.lists(_page_text, max_size=6))
@settings(max_examples=150, deadline=None)
def test_doc_details_total_and_json_roundtrip(pages):
    import json

    from deed_ocr_spark.kernels.details import doc_details, doc_details_json

    d = doc_details(pages)
    j = doc_details_json(pages)
    assert json.loads(j) == d
    # determinism: same input → same record
    assert doc_details_json(pages) == j
    # the sweep contract: the redundant details.TRS never survives
    assert "TRS" not in d



# --- columnar explode must be byte-identical to the scalar loop --------------
# Duplicate offsets are deliberately allowed: sorted(key=offset) is stable,
# so the columnar lexsort must preserve input order on ties too.
_explode_spans = st.lists(
    st.one_of(
        st.none(),  # null struct elements are dropped (shared _span_valid)
        st.builds(
            dict,
            kind=st.sampled_from(["html", "pdf_page", "ocr_region", "text", "media"]),
            text=st.one_of(st.none(), text_strategy),
            media_ref=st.one_of(
                st.none(), st.text(alphabet=string.ascii_lowercase + ":/", max_size=10)
            ),
            # null offsets are dropped too (malformed: no ordering key)
            offset=st.one_of(st.none(), st.integers(0, 50)),
        ),
    ),
    max_size=8,
)


@given(
    st.lists(
        st.one_of(st.none(), _explode_spans),
        max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_explode_batch_columnar_matches_scalar(rows):
    import numpy as np
    import pandas as pd

    from deed_ocr_spark.extract import _explode_batch, _explode_batch_scalar

    pdf = pd.DataFrame(
        {
            "doc_id": pd.Series([f"d{i:03d}" for i in range(len(rows))], dtype="object"),
            "spans": pd.Series(
                [None if r is None else np.array(r, dtype=object) for r in rows],
                dtype="object",
            ),
        }
    )
    got = _explode_batch(pdf)
    want = _explode_batch_scalar(pdf)
    assert list(got.columns) == list(want.columns)
    assert got["order"].dtype == want["order"].dtype
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )


def _span_struct_type():
    import pyarrow as pa

    return pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )


def test_explode_recordbatch_noncanonical_null_slot_falls_back():
    """A null list slot with a NON-empty offset range is legal Arrow that
    Spark's serializer never produces but arbitrary parquet (streaming /
    run_job inputs) can. pyarrow's list_flatten DROPS the slot's covered
    values while list_parent_indices still emits indices for them, so the
    columnar explode must detect the length divergence and fall back to the
    pandas explode instead of misaligning fields (round-4 ADVICE)."""
    import pandas as pd
    import pyarrow as pa

    from deed_ocr_spark.extract import _explode_batch, _explode_recordbatch

    values = pa.array(
        [
            {"kind": "text", "text": "b", "media_ref": None, "offset": 1},
            {"kind": "text", "text": "a", "media_ref": None, "offset": 0},
            {"kind": "text", "text": "hidden", "media_ref": None, "offset": 0},
            {"kind": "media", "text": None, "media_ref": "m:1", "offset": 2},
        ],
        type=_span_struct_type(),
    )
    offsets = pa.array([0, 2, 3, 4], type=pa.int32())
    mask = pa.array([False, True, False])  # null slot covers values[2:3]
    spans = pa.ListArray.from_arrays(offsets, values, mask=mask)
    assert len(spans.flatten()) != 4  # the non-canonical premise holds
    rb = pa.RecordBatch.from_arrays(
        [pa.array(["d1", "d2", "d3"]), spans], names=["doc_id", "spans"]
    )
    got = _explode_recordbatch(rb)
    want = _explode_batch(rb.to_pandas())
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    # the null slot's covered value never leaks into the output
    assert "hidden" not in set(got["in_text"])


def test_explode_recordbatch_noncanonical_all_null_returns_none():
    """Flatten empty but parent non-empty (every slot null, offsets still
    covering values): the guard must fall back and yield None, not
    early-return on the misleading parent length."""
    import pyarrow as pa

    from deed_ocr_spark.extract import _explode_recordbatch

    values = pa.array(
        [
            {"kind": "text", "text": "x", "media_ref": None, "offset": 0},
            {"kind": "text", "text": "y", "media_ref": None, "offset": 1},
        ],
        type=_span_struct_type(),
    )
    offsets = pa.array([0, 2], type=pa.int32())
    mask = pa.array([True])
    spans = pa.ListArray.from_arrays(offsets, values, mask=mask)
    rb = pa.RecordBatch.from_arrays(
        [pa.array(["d1"]), spans], names=["doc_id", "spans"]
    )
    assert _explode_recordbatch(rb) is None


# --- batched OCR-region kernel must be byte-identical to the scalar one ------
_ocr_line = st.builds(
    lambda x1, y1, w, h, text: f"{x1:.1f},{y1:.1f},{x1 + w:.1f},{y1 + h:.1f}|{text}",
    st.floats(0, 600, allow_nan=False),
    st.floats(0, 800, allow_nan=False),
    st.floats(5, 200, allow_nan=False),
    st.floats(5, 30, allow_nan=False),
    st.text(alphabet=string.ascii_letters + " .,", max_size=30),
)
_ocr_payload = st.one_of(
    st.just(""),
    st.just("garbage no pipes"),
    st.just("1,2|too few coords"),
    st.just("nan,1,2,3|nan coord forces scalar fallback"),
    st.just("1_0,1,2,3|underscored float forces scalar fallback"),
    st.lists(_ocr_line, max_size=12).map("\n".join),
)


@given(st.lists(_ocr_payload, max_size=8))
@settings(max_examples=150, deadline=None)
def test_ocr_region_texts_many_matches_scalar(payloads):
    from deed_ocr_spark.kernels.ocr import ocr_region_text, ocr_region_texts_many

    assert ocr_region_texts_many(payloads) == [
        ocr_region_text(p) for p in payloads
    ]
