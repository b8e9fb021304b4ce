"""Incremental dup-pair maintenance: pairs(old+new) == pairs(old) ∪ added
− retracted, including df-cap crossings, at frame level and through the
signature table's add-dir provenance."""

import os
import random

import pytest

import deed_ocr_spark.signatures as sig
from deed_ocr_spark.queries.textpipe import (
    winnow_dup_pairs_from,
    winnow_pair_delta,
)


def _pair_set(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.select("doc_a", "doc_b").collect()}


def _check_delta(spark, old_rows, new_rows, max_df):
    """The equality contract, plus disjointness sanity — through BOTH
    reduction routes (broadcast-hash and mirror-relation)."""
    old = spark.createDataFrame(old_rows, "doc_id bigint, fp bigint")
    new = spark.createDataFrame(new_rows, "doc_id bigint, fp bigint")
    p_old = _pair_set(winnow_dup_pairs_from(old, max_df=max_df))
    p_full = _pair_set(
        winnow_dup_pairs_from(old.unionByName(new), max_df=max_df)
    )
    added, retracted = winnow_pair_delta(old, new, max_df=max_df)
    a, r = _pair_set(added), _pair_set(retracted)
    assert (p_old | a) - r == p_full
    assert a & p_old == set(), "added must be genuinely new"
    assert r <= p_old, "retractions must have existed"
    assert a & r == set()
    # mirror route: the corpus relation stands in for the bucketed table
    a2, r2 = map(
        _pair_set,
        winnow_pair_delta(
            old, new, max_df=max_df, corpus_fps=old.unionByName(new)
        ),
    )
    assert (a2, r2) == (a, r), "mirror route must equal broadcast route"
    return a, r


def test_delta_added_pairs_only(spark):
    # new doc 10 shares fp 1 with old doc 1 → one added pair, no retraction
    a, r = _check_delta(
        spark,
        [(1, 1), (2, 2)],
        [(10, 1)],
        max_df=4,
    )
    assert a == {(1, 10)} and r == set()


def test_delta_cap_crossing_retracts(spark):
    """fp 7 sits exactly at the cap (df=3) supporting three old pairs; one
    new doc carrying fp 7 pushes df to 4 > cap — all three pairs lose
    their only support and must be retracted."""
    old = [(1, 7), (2, 7), (3, 7)]
    a, r = _check_delta(spark, old, [(9, 7)], max_df=3)
    assert r == {(1, 2), (1, 3), (2, 3)}
    assert a == set(), "the crossing fp is over cap for the new doc too"


def test_delta_cap_crossing_with_surviving_support(spark):
    """A pair supported by TWO fps keeps existing when only one crosses."""
    old = [(1, 7), (2, 7), (3, 7), (1, 8), (2, 8)]
    a, r = _check_delta(spark, old, [(9, 7)], max_df=3)
    assert (1, 2) not in r, "fp 8 still supports (1,2)"
    assert r == {(1, 3), (2, 3)}


def test_delta_new_new_pairs(spark):
    a, r = _check_delta(
        spark, [(1, 1)], [(10, 5), (11, 5)], max_df=4
    )
    assert a == {(10, 11)} and r == set()


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_delta_random_property(spark, seed):
    """Randomized contract check across df-cap regimes."""
    rng = random.Random(seed)
    max_df = rng.choice([2, 3, 5])
    old = [
        (rng.randrange(30), rng.randrange(12)) for _ in range(80)
    ]
    new = [
        (30 + rng.randrange(10), rng.randrange(12)) for _ in range(30)
    ]
    _check_delta(spark, old, new, max_df)


def _write_docs(spark, path, lo, hi, parts, mode):
    """Tiny deterministic corpus in the documents.parquet shape; adjacent
    (i-1, i) docs share text when i % 10 == 7 (planted near-dups)."""
    rows = [
        (
            i,
            " ".join(
                f"w{(i - (1 if i % 10 == 7 else 0)) * 31 + j:06d}"
                for j in range(12)
            ),
        )
        for i in range(lo, hi)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    df.repartition(parts).write.mode(mode).parquet(
        os.path.join(path, "documents.parquet")
    )


def test_table_level_delta_matches_full(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(sig, "SIG_CACHE_ROOT", str(tmp_path / "cache"))
    sf = str(tmp_path / "sf")
    _write_docs(spark, sf, 0, 60, 2, "overwrite")

    snap = sig.processed_parts(spark, sf, sig.WINNOW_FPS)
    full_before = _pair_set(
        winnow_dup_pairs_from(
            sig.read_signature_table(
                spark, sig.ensure_signature_table(spark, sf, sig.WINNOW_FPS)
            )
        )
    )

    # a new partition lands (includes a twin of doc 59's content range)
    _write_docs(spark, sf, 60, 90, 1, "append")
    added, retracted = sig.winnow_dup_pairs_delta(spark, sf, snap)
    full_after = _pair_set(
        winnow_dup_pairs_from(
            sig.read_signature_table(
                spark, sig.ensure_signature_table(spark, sf, sig.WINNOW_FPS)
            )
        )
    )
    a, r = _pair_set(added), _pair_set(retracted)
    assert (full_before | a) - r == full_after
    assert a, "appended range plants near-dups, so the delta is non-empty"

    # no-op delta after a fresh snapshot
    snap2 = sig.processed_parts(spark, sf, sig.WINNOW_FPS)
    a2, r2 = sig.winnow_dup_pairs_delta(spark, sf, snap2)
    assert a2.count() == 0 and r2.count() == 0


def test_table_level_delta_excludes_concurrent_add_dir(
    spark, tmp_path, monkeypatch
):
    """An add dir committed by a CONCURRENT maintainer after the delta's
    processed snapshot (its parts outside since ∪ new_parts) belongs to
    the NEXT window: its rows must not enter the old baseline (which
    would permanently hide their pairs from every future delta) nor the
    new side of this one."""
    import shutil

    monkeypatch.setattr(sig, "SIG_CACHE_ROOT", str(tmp_path / "cache"))
    sf = str(tmp_path / "sf")
    _write_docs(spark, sf, 0, 60, 2, "overwrite")
    snap = sig.processed_parts(spark, sf, sig.WINNOW_FPS)
    _write_docs(spark, sf, 60, 90, 1, "append")
    ver = sig.ensure_signature_table(spark, sf, sig.WINNOW_FPS)
    baseline = sig.winnow_dup_pairs_delta(spark, sf, snap)
    base_sets = (_pair_set(baseline[0]), _pair_set(baseline[1]))

    # plant a "concurrent" add dir: a copy of an existing add dir with a
    # part record naming a part neither in the snapshot nor the appends
    src = next(
        os.path.join(ver, n) for n in os.listdir(ver) if n.startswith("add-")
    )
    foreign = os.path.join(ver, "add-feedfacecafe")
    shutil.copytree(src, foreign)
    with open(os.path.join(foreign, "_parts.json"), "w") as f:
        f.write('{"part-future.parquet": "999:999"}')

    got = sig.winnow_dup_pairs_delta(spark, sf, snap)
    assert (_pair_set(got[0]), _pair_set(got[1])) == base_sets
    shutil.rmtree(foreign)


def test_table_level_delta_refuses_after_rebuild(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(sig, "SIG_CACHE_ROOT", str(tmp_path / "cache"))
    sf = str(tmp_path / "sf")
    _write_docs(spark, sf, 0, 40, 1, "overwrite")
    snap = sig.processed_parts(spark, sf, sig.WINNOW_FPS)
    # rewrite the corpus in place: same part names, new content/mtime
    _write_docs(spark, sf, 0, 50, 1, "overwrite")
    with pytest.raises(ValueError, match="rebuilt"):
        sig.winnow_dup_pairs_delta(spark, sf, snap)


def test_table_level_delta_refuses_after_compaction(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(sig, "SIG_CACHE_ROOT", str(tmp_path / "cache"))
    sf = str(tmp_path / "sf")
    _write_docs(spark, sf, 0, 40, 1, "overwrite")
    snap = sig.processed_parts(spark, sf, sig.WINNOW_FPS)
    _write_docs(spark, sf, 40, 60, 1, "append")
    sig.ensure_signature_table(spark, sf, sig.WINNOW_FPS)
    fam = os.path.dirname(sig.ensure_signature_table(spark, sf, sig.WINNOW_FPS))
    sig.compact_signature_table(spark, fam)
    with pytest.raises(ValueError, match="full query"):
        sig.winnow_dup_pairs_delta(spark, sf, snap)


def test_delta_rejects_overlapping_doc_ids(spark):
    """Round-5 ADVICE: a partition re-landed under EXISTING doc_ids breaks
    the delta's equality contract silently (added reports pre-existing
    pairs, per-fp dfs double-count). The frame-level API must refuse."""
    old = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 9)], "doc_id bigint, fp bigint"
    )
    relanded = spark.createDataFrame(
        [(2, 7), (10, 9)], "doc_id bigint, fp bigint"
    )
    with pytest.raises(ValueError, match="disjoint"):
        winnow_pair_delta(old, relanded, max_df=4)


# --- durable dup-pairs table (round-6 VERDICT #2) ------------------------------
def test_pairs_table_full_build_matches_d13(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(sig, "SIG_CACHE_ROOT", str(tmp_path / "cache"))
    sf = str(tmp_path / "sf")
    _write_docs(spark, sf, 0, 60, 2, "overwrite")
    ver = sig.ensure_dup_pairs_table(spark, sf)
    stored = _pair_set(sig.read_signature_table(spark, ver))
    want = _pair_set(
        winnow_dup_pairs_from(
            sig.read_signature_table(
                spark, sig.ensure_signature_table(spark, sf, sig.WINNOW_FPS)
            )
        )
    )
    assert stored == want and stored
    # current → second call is the lock-free fast path, same version
    assert sig.ensure_dup_pairs_table(spark, sf) == ver


def test_pairs_table_append_goes_through_delta(spark, tmp_path, monkeypatch):
    """After an append-only corpus growth the table must be maintained by
    the pair DELTA (old ∪ added − retracted over the small stored table),
    never by a full recompute — and the result must equal one."""
    monkeypatch.setattr(sig, "SIG_CACHE_ROOT", str(tmp_path / "cache"))
    sf = str(tmp_path / "sf")
    _write_docs(spark, sf, 0, 60, 2, "overwrite")
    v1 = sig.ensure_dup_pairs_table(spark, sf)
    _write_docs(spark, sf, 60, 90, 1, "append")

    def no_full(*a, **k):  # the delta path must not recompute
        raise AssertionError("full recompute ran on an append-only change")

    monkeypatch.setattr(sig, "_pairs_full_df", no_full)
    v2 = sig.ensure_dup_pairs_table(spark, sf)
    monkeypatch.undo()
    monkeypatch.setattr(sig, "SIG_CACHE_ROOT", str(tmp_path / "cache"))
    assert v2 != v1, "append must land a fresh pairs version"
    stored = _pair_set(sig.read_signature_table(spark, v2))
    want = _pair_set(
        winnow_dup_pairs_from(
            sig.read_signature_table(
                spark, sig.ensure_signature_table(spark, sf, sig.WINNOW_FPS)
            )
        )
    )
    assert stored == want and stored
    # manifest tracks the fps snapshot → third call is current
    assert sig.ensure_dup_pairs_table(spark, sf) == v2


def test_pairs_table_rebuild_falls_back_to_full(spark, tmp_path, monkeypatch):
    """A REWRITTEN old part (fps family rebuilt) breaks delta provenance —
    the pairs table must take the full-recompute path and still be exact."""
    import time as t

    monkeypatch.setattr(sig, "SIG_CACHE_ROOT", str(tmp_path / "cache"))
    sf = str(tmp_path / "sf")
    _write_docs(spark, sf, 0, 60, 2, "overwrite")
    v1 = sig.ensure_dup_pairs_table(spark, sf)
    _write_docs(spark, sf, 0, 70, 2, "overwrite")  # rewrite, not append
    calls = {"full": 0}
    real_full = sig._pairs_full_df

    def counting_full(*a, **k):
        calls["full"] += 1
        return real_full(*a, **k)

    monkeypatch.setattr(sig, "_pairs_full_df", counting_full)
    v2 = sig.ensure_dup_pairs_table(spark, sf)
    assert v2 != v1 and calls["full"] == 1
    stored = _pair_set(sig.read_signature_table(spark, v2))
    want = _pair_set(
        winnow_dup_pairs_from(
            sig.read_signature_table(
                spark, sig.ensure_signature_table(spark, sf, sig.WINNOW_FPS)
            )
        )
    )
    assert stored == want and stored


def test_dup_components_scans_durable_pairs(spark, tmp_path, monkeypatch):
    """dup_components must consume the durable table: once the table is
    current, cluster resolution runs with NO pair re-derivation (the
    ~73 s components input-materialization tax of the 10⁶ smoke)."""
    from deed_ocr_spark.queries.components import dup_components

    monkeypatch.setattr(sig, "SIG_CACHE_ROOT", str(tmp_path / "cache"))
    sf = str(tmp_path / "sf")
    _write_docs(spark, sf, 0, 60, 2, "overwrite")
    ver = sig.ensure_dup_pairs_table(spark, sf)
    pairs = _pair_set(sig.read_signature_table(spark, ver))

    def no_full(*a, **k):
        raise AssertionError("dup_components re-derived pairs")

    monkeypatch.setattr(sig, "_pairs_full_df", no_full)
    got = {
        r["doc_id"]: r["component"] for r in dup_components(spark, sf).collect()
    }
    # union-find oracle over the stored pairs
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want and got


# --- mirror route (round-6 VERDICT #3) ------------------------------------------
def test_table_level_mirror_route_matches_broadcast(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setattr(sig, "SIG_CACHE_ROOT", str(tmp_path / "cache"))
    sf = str(tmp_path / "sf")
    _write_docs(spark, sf, 0, 60, 2, "overwrite")
    snap = sig.processed_parts(spark, sf, sig.WINNOW_FPS)
    _write_docs(spark, sf, 60, 90, 1, "append")
    a_b, r_b = map(
        _pair_set, sig.winnow_dup_pairs_delta(spark, sf, snap, route="broadcast")
    )
    a_m, r_m = map(
        _pair_set, sig.winnow_dup_pairs_delta(spark, sf, snap, route="mirror")
    )
    name = None
    for t in spark.catalog.listTables():
        if t.name.startswith("sig_winnow_fps"):
            name = t.name
    try:
        assert (a_m, r_m) == (a_b, r_b) and a_b
    finally:
        if name:
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_auto_route_picks_mirror_for_large_append(
    spark, tmp_path, monkeypatch
):
    """route='auto' must go through the mirror when the new add-dirs'
    bytes exceed the broadcast threshold (forced low here)."""
    monkeypatch.setattr(sig, "SIG_CACHE_ROOT", str(tmp_path / "cache"))
    sf = str(tmp_path / "sf")
    _write_docs(spark, sf, 0, 60, 2, "overwrite")
    snap = sig.processed_parts(spark, sf, sig.WINNOW_FPS)
    _write_docs(spark, sf, 60, 90, 1, "append")
    calls = {"mirror": 0}
    real = sig.ensure_bucketed_signature_table

    def counting(*a, **k):
        calls["mirror"] += 1
        return real(*a, **k)

    monkeypatch.setattr(sig, "ensure_bucketed_signature_table", counting)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
    try:
        a, r = map(
            _pair_set, sig.winnow_dup_pairs_delta(spark, sf, snap, route="auto")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert calls["mirror"] == 1, "auto must route a too-big append via mirror"
    a_b, r_b = map(
        _pair_set, sig.winnow_dup_pairs_delta(spark, sf, snap, route="broadcast")
    )
    assert (a, r) == (a_b, r_b)
    for t in spark.catalog.listTables():
        if t.name.startswith("sig_winnow_fps"):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")


def test_mirror_reduction_never_exchanges_corpus_side(
    spark, tmp_path, monkeypatch
):
    """The mirror route's whole point at a forced-low broadcast budget:
    the corpus-table side of the fp semi-join rides bucket co-location
    (bucketed scan present, one FEWER Exchange than the same reduction
    against plain parquet — the missing one is exactly the corpus
    shuffle)."""
    import re

    from deed_ocr_spark.queries.textpipe import reduced_corpus_rel

    monkeypatch.setattr(sig, "SIG_CACHE_ROOT", str(tmp_path / "cache"))
    sf = str(tmp_path / "sf")
    _write_docs(spark, sf, 0, 60, 2, "overwrite")
    name = sig.ensure_bucketed_signature_table(
        spark, sf, sig.WINNOW_FPS, key="fp"
    )
    ver = sig.ensure_signature_table(spark, sf, sig.WINNOW_FPS)
    from pyspark.sql import functions as F

    new_fp_set = spark.range(5).select((F.col("id") * 7).alias("fp"))
    new_docs = spark.range(3).select(F.col("id").alias("doc_id"))

    def plan(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    def n_exchanges(p):
        return len(set(re.findall(r"Exchange \((\d+)\)", p)))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p_mirror = plan(
            reduced_corpus_rel(spark.table(name), new_fp_set, new_docs)
        )
        p_plain = plan(
            reduced_corpus_rel(
                sig.read_signature_table(spark, ver), new_fp_set, new_docs
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    assert "Bucketed: true" in p_mirror, p_mirror
    assert n_exchanges(p_mirror) == n_exchanges(p_plain) - 1, (
        p_mirror,
        p_plain,
    )


# --- round-6 review regressions --------------------------------------------------
def test_mirror_route_rejects_overlapping_doc_ids(spark):
    """The mirror carve-out anti-joins the new ids, so without its own
    check a re-landed doc would be silently DELETED from the old relation
    (review F1) — both routes must raise identically."""
    old = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 9)], "doc_id bigint, fp bigint"
    )
    relanded = spark.createDataFrame(
        [(2, 7), (10, 9)], "doc_id bigint, fp bigint"
    )
    with pytest.raises(ValueError, match="disjoint"):
        winnow_pair_delta(
            old, relanded, max_df=4, corpus_fps=old.unionByName(relanded)
        )


def test_mirror_route_refuses_out_of_window_add_dir(
    spark, tmp_path, monkeypatch
):
    """The bucketed mirror reflects the LIVE table; an add dir outside the
    delta's [since, processed] window would be counted as old baseline
    (inflated dfs, spurious cap crossings — review F3). The mirror route
    must refuse; the broadcast route (explicit provenance paths) still
    answers."""
    import shutil

    monkeypatch.setattr(sig, "SIG_CACHE_ROOT", str(tmp_path / "cache"))
    sf = str(tmp_path / "sf")
    _write_docs(spark, sf, 0, 60, 2, "overwrite")
    snap = sig.processed_parts(spark, sf, sig.WINNOW_FPS)
    _write_docs(spark, sf, 60, 90, 1, "append")
    ver = sig.ensure_signature_table(spark, sf, sig.WINNOW_FPS)
    src = next(
        os.path.join(ver, n) for n in os.listdir(ver) if n.startswith("add-")
    )
    foreign = os.path.join(ver, "add-feedfacecafe")
    shutil.copytree(src, foreign)
    with open(os.path.join(foreign, "_parts.json"), "w") as f:
        f.write('{"part-future.parquet": "999:999"}')
    # a TRULY out-of-window dir is one the delta's processed snapshot
    # missed (it landed between the snapshot read and the dir listing):
    # simulate by hiding its part from _processed_parts
    real_pp = sig._processed_parts

    def pp_missing_future(ver_dir, manifest):
        d = real_pp(ver_dir, manifest)
        d.pop("part-future.parquet", None)
        return d

    monkeypatch.setattr(sig, "_processed_parts", pp_missing_future)
    try:
        with pytest.raises(ValueError, match="outside this delta window"):
            sig.winnow_dup_pairs_delta(spark, sf, snap, route="mirror")
        a, r = sig.winnow_dup_pairs_delta(spark, sf, snap, route="broadcast")
        assert _pair_set(a)
    finally:
        shutil.rmtree(foreign)


def test_auto_route_uses_mirror_when_broadcast_disabled(
    spark, tmp_path, monkeypatch
):
    """autoBroadcastJoinThreshold=-1 means the admin DISABLED broadcasting;
    the broadcast route's explicit hint would override that and ship an
    arbitrarily large fp set (review F4) — auto must pick the mirror."""
    monkeypatch.setattr(sig, "SIG_CACHE_ROOT", str(tmp_path / "cache"))
    sf = str(tmp_path / "sf")
    _write_docs(spark, sf, 0, 60, 2, "overwrite")
    snap = sig.processed_parts(spark, sf, sig.WINNOW_FPS)
    _write_docs(spark, sf, 60, 90, 1, "append")
    calls = {"mirror": 0}
    real = sig.ensure_bucketed_signature_table

    def counting(*a, **k):
        calls["mirror"] += 1
        return real(*a, **k)

    monkeypatch.setattr(sig, "ensure_bucketed_signature_table", counting)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a, r = map(
            _pair_set, sig.winnow_dup_pairs_delta(spark, sf, snap, route="auto")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert calls["mirror"] == 1
    a_b, r_b = map(
        _pair_set, sig.winnow_dup_pairs_delta(spark, sf, snap, route="broadcast")
    )
    assert (a, r) == (a_b, r_b)
    for t in spark.catalog.listTables():
        if t.name.startswith("sig_winnow_fps"):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")


def test_stale_pairs_family_gc(tmp_path, monkeypatch):
    """A WINNOW_FPS algo bump must reclaim old fa<N> pairs dirs (review
    F5) — _gc_stale_algo_versions cannot see them (pattern mismatch)."""
    monkeypatch.setitem(sig.FAMILY_ALGO_VERSION, sig.WINNOW_FPS, 3)
    parent = tmp_path / "corpuskey"
    cur_dir = parent / "winnow_pairs-df64-fa3"
    old_dir = parent / "winnow_pairs-df64-fa2"
    other_df = parent / "winnow_pairs-df32-fa2"  # different df param
    for d in (cur_dir, old_dir, other_df):
        d.mkdir(parents=True)
    sig._gc_stale_pairs_versions(str(cur_dir), 64)
    assert cur_dir.is_dir(), "current version must survive"
    assert not old_dir.exists(), "older fa version reclaimed"
    assert other_df.is_dir(), "a different max_df family is not ours to GC"
