"""Connected-components operator vs a Python union-find oracle, plus the
canonical (transitive-closure) keep-list semantics it enables."""

import random

import pytest
from deed_ocr_spark.queries.components import (
    canonical_keeplist,
    connected_components,
    dup_components,
)

SF = "/root/testdata/sf0.001"


def _union_find(edges):
    """Oracle: {node: component-min} via path-compressed union-find."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    out = connected_components(df)
    return {r["doc_id"]: r["component"] for r in out.collect()}


def test_components_small_shapes(spark):
    # two chains, a star, a triangle, an isolated pair — in one graph
    edges = [
        (1, 2), (2, 3), (3, 4),          # chain -> {1,2,3,4}
        (10, 11), (10, 12), (10, 13),    # star centered high -> min 10
        (20, 21), (21, 22), (20, 22),    # triangle
        (30, 31),                        # pair
        (41, 40),                        # reversed pair
    ]
    assert _run(spark, edges) == _union_find(edges)


def test_components_local_minimum_bridges(spark):
    """The case greedy drop-doc_b gets wrong: B-C and A-C with A<B<C is
    ONE cluster; B is a local minimum but not the component min."""
    edges = [(2, 3), (1, 3)]
    got = _run(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1} == _union_find(edges)


def test_components_long_chain_converges(spark):
    """512-node chain: the adversarial depth case for label propagation;
    the alternating algorithm must converge well under MAX_ROUNDS."""
    edges = [(i, i + 1) for i in range(511)]
    got = _run(spark, edges)
    assert got == {n: 0 for n in range(512)}


@pytest.mark.parametrize("seed,n,m", [(7, 200, 150), (8, 300, 420)])
def test_components_random_graphs_match_union_find(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(m)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark, edges) == _union_find(edges)


def test_components_string_ids(spark):
    df = spark.sql(
        "SELECT * FROM VALUES ('b','c'), ('a','c'), ('x','y') AS t(doc_a, doc_b)"
    )
    out = {r["doc_id"]: r["component"] for r in connected_components(df).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_components_plan_has_no_cartesian(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "doc_a bigint, doc_b bigint")
    out = connected_components(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dup_components_match_driver_pairs_oracle(spark):
    """Corpus-scale check at sf0.001: components over d13's actual pairs
    equal union-find of those same pairs."""
    from deed_ocr_spark.queries.textpipe import d13_winnow_dup_pairs

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in d13_winnow_dup_pairs(spark, SF).collect()
    ]
    got = {
        r["doc_id"]: r["component"]
        for r in dup_components(spark, SF).collect()
    }
    assert got == _union_find(pairs)
    assert len(got) > 0, "sf0.001 corpus must contain at least one dup pair"


def test_canonical_keeplist_keeps_one_per_cluster(spark):
    from deed_ocr_spark.queries.common import t

    comp = {
        r["doc_id"]: r["component"]
        for r in dup_components(spark, SF).collect()
    }
    all_docs = {
        r["doc_id"] for r in t(spark, SF, "documents").select("doc_id").collect()
    }
    keep = {r["doc_id"] for r in canonical_keeplist(spark, SF).collect()}
    # exactly: docs outside any pair, plus each cluster's minimum
    expected = (all_docs - set(comp)) | {
        m for m in comp.values()
    }
    assert keep == expected
    # and every cluster contributes exactly its representative
    for doc, m in comp.items():
        assert (doc in keep) == (doc == m)


def test_d16_registered_with_oracle_and_matches_union_find(spark):
    """Round-6 registration lock: d16_dup_components sits in the 50-slot
    registry WITH a DuckDB oracle (the swap's whole point was raising the
    oracle-backed count), d6b is demoted but still importable, and d16's
    labels equal a union-find over the exact pairs it clusters."""
    from deed_ocr_spark.queries import ORACLES, QUERIES
    from deed_ocr_spark.queries.components import d16_dup_components
    from deed_ocr_spark.queries.textpipe import (
        d6b_simhash_fast,  # noqa: F401 — demoted, must stay importable
        d7b_ngram_jaccard_pairs_bucketed,
    )

    assert "d16_dup_components" in QUERIES and "d16_dup_components" in ORACLES
    assert "d6b_simhash_fast" not in QUERIES
    assert len(QUERIES) == 50
    sf = "/root/testdata/sf0.001"
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in d7b_ngram_jaccard_pairs_bucketed(spark, sf).collect()
    ]
    got = {
        r["doc_id"]: r["component"]
        for r in d16_dup_components(spark, sf).collect()
    }
    assert got == _union_find(pairs) and got


# --- incremental label maintenance (round 6) ------------------------------------
def _labels(df):
    return {r["doc_id"]: r["component"] for r in df.collect()}


def _run_update(spark, old_edges, added, retracted):
    """update_components vs connected_components on the post-delta graph."""
    from deed_ocr_spark.queries.components import update_components

    def edf(pairs):
        return spark.createDataFrame(
            pairs or [(None, None)], "doc_a bigint, doc_b bigint"
        ).filter("doc_a is not null")

    cur = sorted((set(old_edges) | set(added)) - set(retracted))
    old_lab = _run(spark, old_edges)  # dict from union-find-checked helper
    old_df = spark.createDataFrame(
        list(old_lab.items()) or [(None, None)],
        "doc_id bigint, component bigint",
    ).filter("doc_id is not null")
    got = _labels(
        update_components(old_df, edf(cur), edf(added), edf(retracted))
    )
    want = _union_find(cur)
    assert got == want, (old_edges, added, retracted, got, want)


def test_update_components_merges_only(spark):
    # two clusters {1,2} {5,6}, a new edge merges them through a new doc
    _run_update(spark, [(1, 2), (5, 6)], [(2, 9), (9, 5)], [])


def test_update_components_split(spark):
    # chain 1-2-3-4 loses its middle edge → two clusters
    _run_update(spark, [(1, 2), (2, 3), (3, 4)], [], [(2, 3)])


def test_update_components_split_and_merge(spark):
    _run_update(
        spark,
        [(1, 2), (2, 3), (10, 11)],
        [(3, 10)],
        [(1, 2)],
    )


def test_update_components_node_loses_all_edges(spark):
    # doc 2's only edge retracts → it must vanish from the labels
    _run_update(spark, [(1, 2), (5, 6)], [], [(1, 2)])


def test_update_components_noop_delta(spark):
    _run_update(spark, [(1, 2), (2, 3)], [], [])


@pytest.mark.parametrize("seed", [11, 12, 13, 14])
def test_update_components_random_property(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(24))
    old = {
        tuple(sorted(rng.sample(nodes, 2))) for _ in range(rng.randrange(6, 18))
    }
    added = {
        tuple(sorted((rng.randrange(30), rng.randrange(30))))
        for _ in range(rng.randrange(0, 6))
    }
    added = {(a, b) for a, b in added if a != b} - old
    retracted = set(rng.sample(sorted(old), rng.randrange(0, len(old) // 2 + 1)))
    _run_update(spark, sorted(old), sorted(added), sorted(retracted))


def test_dup_components_incremental_matches_recompute(
    spark, tmp_path, monkeypatch
):
    """Table-level flow: labels at T0 + corpus append → incremental labels
    equal a full dup_components over the appended corpus."""
    import deed_ocr_spark.signatures as sig
    from deed_ocr_spark.queries.components import (
        dup_components,
        dup_components_incremental,
    )
    from tests.test_pair_delta import _write_docs

    monkeypatch.setattr(sig, "SIG_CACHE_ROOT", str(tmp_path / "cache"))
    sf = str(tmp_path / "sf")
    _write_docs(spark, sf, 0, 60, 2, "overwrite")
    snap = sig.processed_parts(spark, sf, sig.WINNOW_FPS)
    old_labels = dup_components(spark, sf).localCheckpoint(eager=True)
    _write_docs(spark, sf, 60, 90, 1, "append")
    got = _labels(dup_components_incremental(spark, sf, old_labels, snap))
    want = _labels(dup_components(spark, sf))
    assert got == want and got


def test_dup_components_incremental_single_delta_and_race_refusal(
    spark, tmp_path, monkeypatch
):
    """Round-6 second review: (a) the incremental flow computes the
    |new|×corpus delta exactly ONCE (ensure_dup_pairs_table reuses it via
    delta_hint), and (b) a concurrent append widening the pairs table's
    window past the label delta's raises instead of silently dropping the
    concurrent docs' labels."""
    import deed_ocr_spark.signatures as sig
    from deed_ocr_spark.queries.components import (
        dup_components,
        dup_components_incremental,
    )
    from tests.test_pair_delta import _write_docs

    monkeypatch.setattr(sig, "SIG_CACHE_ROOT", str(tmp_path / "cache"))
    sf = str(tmp_path / "sf")
    _write_docs(spark, sf, 0, 60, 2, "overwrite")
    snap = sig.processed_parts(spark, sf, sig.WINNOW_FPS)
    old_labels = dup_components(spark, sf).localCheckpoint(eager=True)
    _write_docs(spark, sf, 60, 90, 1, "append")

    calls = {"n": 0}
    real_delta = sig.winnow_dup_pairs_delta

    def counting(*a, **k):
        calls["n"] += 1
        return real_delta(*a, **k)

    monkeypatch.setattr(sig, "winnow_dup_pairs_delta", counting)
    got = {
        r["doc_id"]: r["component"]
        for r in dup_components_incremental(spark, sf, old_labels, snap)
        .collect()
    }
    assert calls["n"] == 1, "delta must run once (hint reused by ensure)"
    assert got == {
        r["doc_id"]: r["component"]
        for r in dup_components(spark, sf).collect()
    }

    # (b) the race: another append lands between the label delta and the
    # pairs-table ensure — the table's window is wider, labels must refuse
    snap2 = sig.processed_parts(spark, sf, sig.WINNOW_FPS)
    labels2 = dup_components(spark, sf).localCheckpoint(eager=True)
    _write_docs(spark, sf, 90, 120, 1, "append")

    def delta_then_concurrent_append(*a, **k):
        out = real_delta(*a, **k)
        _write_docs(spark, sf, 120, 150, 1, "append")
        return out

    monkeypatch.setattr(
        sig, "winnow_dup_pairs_delta", delta_then_concurrent_append
    )
    with pytest.raises(ValueError, match="wider window"):
        dup_components_incremental(spark, sf, labels2, snap2)


def test_release_checkpoint_frees_pinned_blocks(spark):
    """_release_checkpoint must actually drop a superseded
    localCheckpoint's RDD from the context's persistent set (round-6
    ADVICE): it reaches through private JVM accessors and silently no-ops
    on any exception, so a Spark-internal rename would otherwise
    reintroduce the observed 10^8-edge UNABLE_TO_ACQUIRE_MEMORY block
    accumulation with no test failing."""
    from deed_ocr_spark.queries.components import _release_checkpoint

    def n_persistent():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    base = n_persistent()
    df = spark.range(0, 1000).localCheckpoint(eager=True)
    assert n_persistent() == base + 1, "localCheckpoint must pin blocks"
    _release_checkpoint(df)
    assert n_persistent() == base, (
        "release was a no-op — the internal accessor path "
        "(queryExecution().analyzed().rdd()) has drifted"
    )


@pytest.mark.parametrize("stride", [1])
def test_components_stride_rounds_identical_labels(spark, stride):
    """Any materialization stride yields the same fixpoint labels (the
    r6 NEXT #6 I/O trade only changes WHEN lineage is truncated):
    adversarial chain + star + random edges, compared to the default."""
    rng = random.Random(1234)
    edges = (
        [(i, i + 1) for i in range(64)]              # depth
        + [(100, 100 + i) for i in range(1, 20)]     # star
        + [
            (rng.randrange(200, 260), rng.randrange(200, 260))
            for _ in range(80)
        ]
    )
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    base = {
        r["doc_id"]: r["component"]
        for r in connected_components(df).collect()
    }
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(df, stride_rounds=stride).collect()
    }
    assert got == base == _union_find(edges)


def test_components_stride_rounds_validation(spark):
    """Strides > 2 are refused up front: the star rounds fan out their
    input ~4x each, so an unmaterialized k-round stride plans ~4^k
    subtree copies — a 64-edge toy graph hung at stride 3 (BENCH.md)."""
    df = spark.createDataFrame([(1, 2)], "doc_a bigint, doc_b bigint")
    for bad in (0, 3, 4):
        with pytest.raises(ValueError, match="stride_rounds"):
            connected_components(df, stride_rounds=bad)


def test_components_adaptive_stride_crossing(spark, monkeypatch):
    """The adaptive stride switches MID-LOOP as the edge multiset
    shrinks (a clique collapses 190 -> 19 edges): labels must equal the
    union-find oracle across the regime boundary."""
    import deed_ocr_spark.queries.components as C

    monkeypatch.setattr(C, "ADAPTIVE_STRIDE_EDGES", 50)
    clique = [(a, b) for a in range(20) for b in range(a + 1, 20)]
    chain = [(100 + i, 101 + i) for i in range(30)]
    edges = clique + chain
    df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    stats = {}
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(df, stats=stats).collect()
    }
    assert got == _union_find(edges)
    assert stats["rounds"] >= 2
