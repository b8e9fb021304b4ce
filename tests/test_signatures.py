"""Materialized signature tables must reproduce the in-session dedup
results exactly, and the from-table plans must not depend on the session
cache (no InMemoryTableScan) nor contain a cartesian product."""

import pytest

from deed_ocr_spark.queries.textpipe import (
    d7_ngram_jaccard_pairs,
    d9_minhash_band_pairs,
    d13_winnow_dup_pairs,
)
from deed_ocr_spark.signatures import (
    materialize_signatures,
    minhash_band_pairs_from_tables,
    ngram_jaccard_pairs_from_tables,
    winnow_dup_pairs_from_tables,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sig_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sigs"))
    paths = materialize_signatures(spark, SF, out)
    assert set(paths) == {"shingles", "minhash_sigs", "winnow_fps"}
    return out


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_minhash_pairs_match_in_session(spark, sig_dir):
    assert _rows(minhash_band_pairs_from_tables(spark, sig_dir)) == _rows(
        d9_minhash_band_pairs(spark, SF)
    )


def test_jaccard_pairs_match_in_session(spark, sig_dir):
    assert _rows(ngram_jaccard_pairs_from_tables(spark, sig_dir)) == _rows(
        d7_ngram_jaccard_pairs(spark, SF)
    )


def test_winnow_pairs_match_in_session(spark, sig_dir):
    assert _rows(winnow_dup_pairs_from_tables(spark, sig_dir)) == _rows(
        d13_winnow_dup_pairs(spark, SF)
    )


def test_ensure_signature_table_caches_and_detects_staleness(spark, tmp_path, monkeypatch):
    """The registered-query route: first call materializes, second call
    reuses the same path without rewriting; touching the corpus parquet
    (new mtime) yields a NEW content key, so stale tables are never read."""
    import os
    import shutil

    import deed_ocr_spark.signatures as sig

    monkeypatch.setattr(sig, "SIG_CACHE_ROOT", str(tmp_path / "sigcache"))
    # copy the corpus so we can touch it without writing to /root/testdata
    corpus = tmp_path / "sf"
    corpus.mkdir()
    shutil.copy(f"{SF}/documents.parquet", corpus / "documents.parquet")

    p1 = sig.ensure_signature_table(spark, str(corpus), sig.SHINGLES)
    mtime1 = os.path.getmtime(p1)
    assert sig.ensure_signature_table(spark, str(corpus), sig.SHINGLES) == p1
    assert os.path.getmtime(p1) == mtime1, "second call must not rewrite"

    os.utime(corpus / "documents.parquet")  # simulate regenerated data
    p2 = sig.ensure_signature_table(spark, str(corpus), sig.SHINGLES)
    assert p2 != p1, "content key must change when the corpus changes"
    assert spark.read.parquet(p2).count() == spark.read.parquet(p1).count()


def test_from_table_plans_are_cache_free_and_cartesian_free(spark, sig_dir):
    for df in (
        minhash_band_pairs_from_tables(spark, sig_dir),
        ngram_jaccard_pairs_from_tables(spark, sig_dir),
        winnow_dup_pairs_from_tables(spark, sig_dir),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" not in plan
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
