"""Structured Streaming ingest: same kernels, incremental arrival,
exactly-once across restarts via the streaming checkpoint."""

from deed_ocr_spark.corpus import corpus_df, doc_id_for, gen_doc
from deed_ocr_spark.golden import extract_doc
from deed_ocr_spark.streaming import run_stream


def _write_batch(spark, path, lo, hi):
    # ids [lo, hi) — distinct parquet files simulate incremental arrival
    df = corpus_df(spark, hi, seed=21, n_partitions=1).filter(
        f"doc_id >= '{doc_id_for(lo)}'"
    )
    df.write.mode("append").parquet(path)


def test_streaming_matches_golden_and_is_incremental(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, inp, 0, 20)
    q = run_stream(spark, inp, out, ckpt)
    q.awaitTermination(120)

    first = spark.read.parquet(out)
    assert first.select("doc_id").distinct().count() == 20

    # second arrival: only the new docs are processed (checkpoint advances)
    _write_batch(spark, inp, 20, 30)
    q2 = run_stream(spark, inp, out, ckpt)
    q2.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["order"], r["kind"], r["text"], r["media_ref"], r["src_kind"])
        )
    assert len(got) == 30
    for doc_id, seq in got.items():
        seq.sort()
        assert seq == extract_doc(gen_doc(doc_id, 21)["spans"]), doc_id
        # exactly-once: no duplicated orders from the re-run
        assert len({o for o, *_ in seq}) == len(seq)
