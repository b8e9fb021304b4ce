"""Multimodal plumbing tests: binary columns, typed metadata, UDTF-shaped
frame fan-out — the Spark-side path is real even though pixels are stubbed."""

from pyspark.sql import functions as F

from deed_ocr_spark.corpus import corpus_df
from deed_ocr_spark.job import extract_spans
from deed_ocr_spark.multimodal import (
    decode_media,
    resize_images,
    sample_frames,
    synth_media_table,
)


def _media(spark):
    spans = extract_spans(corpus_df(spark, 80, seed=13, n_partitions=2))
    return synth_media_table(spans)


def test_media_table_schema_and_determinism(spark):
    m = _media(spark)
    fields = {f.name: f.dataType.simpleString() for f in m.schema.fields}
    assert fields["payload"] == "binary"
    assert fields["meta"].startswith("struct<width:int,height:int")
    rows = {r["media_ref"]: (r["media_kind"], bytes(r["payload"])) for r in m.collect()}
    rows2 = {r["media_ref"]: (r["media_kind"], bytes(r["payload"])) for r in _media(spark).collect()}
    assert rows == rows2  # deterministic regeneration
    assert len(rows) > 0


def test_decode_metadata(spark):
    m = _media(spark)
    d = decode_media(m)
    rows = d.collect()
    assert all(r["width"] >= 64 and r["height"] >= 64 for r in rows)
    assert all(r["n_bytes"] >= 64 for r in rows)
    assert d.count() == m.count()  # decode is total


def test_resize_bounds(spark):
    r = resize_images(_media(spark), max_side=128)
    rows = r.collect()
    assert rows, "corpus must contain image media"
    for row in rows:
        assert max(row["out_width"], row["out_height"]) <= 128
        assert min(row["out_width"], row["out_height"]) >= 1


def test_base64_round_trip_is_byte_exact(spark):
    """F10: base64 encode/decode (the reference's API-transport hop) must
    round-trip every payload byte-exactly, JVM-side."""
    from deed_ocr_spark.multimodal import decode_payload_b64, encode_payload_b64

    m = _media(spark).select("media_ref", "payload")
    enc = encode_payload_b64(m)
    assert dict(enc.dtypes)["payload_b64"] == "string"
    back = decode_payload_b64(enc.select("media_ref", "payload_b64"))
    orig = {r["media_ref"]: bytes(r["payload"]) for r in m.collect()}
    got = {r["media_ref"]: bytes(r["payload"]) for r in back.collect()}
    assert got == orig and len(got) > 0


def test_multimodal_pipeline_query_unions_all_stages(spark):
    """The registered driver query must exercise all three kernels: its
    per-stage row counts equal the standalone kernels' counts."""
    from deed_ocr_spark.queries.extraction import (
        m1_media_metadata,
        m1_multimodal_pipeline,
        m2_image_resize,
        m3_video_frames,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["stage"]: r["n"]
        for r in m1_multimodal_pipeline(spark, sf)
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got["decode"] == m1_media_metadata(spark, sf).count()
    assert got["resize"] == m2_image_resize(spark, sf).count()
    assert got["frames"] == m3_video_frames(spark, sf).count()
    assert got["decode"] > 0 and got["resize"] > 0 and got["frames"] > 0


def test_frame_sampling_fanout(spark):
    m = _media(spark)
    f = sample_frames(m, every_ms=1000, max_frames=8)
    rows = f.collect()
    vids = m.filter(F.col("media_kind") == "video").count()
    if vids:
        assert len(rows) >= vids  # ≥1 frame per video
        per_ref = {}
        for r in rows:
            per_ref.setdefault(r["media_ref"], []).append(r)
        for ref, frames in per_ref.items():
            idxs = sorted(fr["frame_idx"] for fr in frames)
            assert idxs == list(range(len(idxs)))  # dense frame indices
            assert all(fr["ts_ms"] == fr["frame_idx"] * 1000 for fr in frames)
