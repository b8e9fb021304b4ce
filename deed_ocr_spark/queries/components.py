"""Distributed connected components over duplicate-pair edges.

The dedup family emits PAIRS (d7 Jaccard, d9 LSH bands, d13 winnowing);
canonical corpus dedup needs their TRANSITIVE CLOSURE: near-dup is not
transitive, but a keep-one-per-cluster policy must treat A~B, B~C as one
cluster {A,B,C} or the keep-list double-keeps content (the greedy
drop-every-doc_b policy of d14 keeps every LOCAL-minimum doc — e.g.
edges B-C and A-C with A<B<C keep both A and B).

Algorithm: the alternating large-star / small-star method of Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
MapReduce and Beyond" (SoCC 2014 — public paper). Both operations are
pure relational steps (symmetrize -> per-node min -> equi-join), each
round is two shuffles keyed on node id, the edge multiset shrinks
monotonically toward a star forest, and convergence takes O(log^2 n)
rounds on adversarial graphs (in practice a handful: near-dup clusters
are shallow). Nothing here collects edges to the driver — the loop's
only driver-side values are one (count, hash) scalar pair per round for
the fixpoint test, exactly the control-plane shape a 10^12-doc run
needs. Compare GraphFrames' connectedComponents, which implements the
same family of algorithms on top of the same DataFrame operations.

Engine addition beyond the reference (its similarity self-dedup,
extractors/llm.py:195-217, dedups WITHIN one document's candidate list;
corpus-level clustering has no analog there). Tested against a Python
union-find oracle on adversarial graphs (chains, stars, cliques, random)
in tests/test_components.py; registered as d16_dup_components (round-6
swap for the agreement-tested d6b twin) with a recursive-CTE DuckDB
value oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Far above the O(log^2 n) bound for any feasible corpus (n = 10^12 =>
# log2(n) ~ 40); hitting it means a bug, not a big graph — so raise.
MAX_ROUNDS = 64

# Per-round shuffle sizing (round-5 VERDICT #4): every star operation
# shuffles on node id, and the edge multiset both starts huge (10^8+ pair
# edges on a crawl corpus) and SHRINKS monotonically — a fixed session
# default either makes multi-GB partitions early or thousands of empty
# ones late. Each materialization stride re-derives the partition count
# from the CURRENT edge count; AQE coalescing then trims the tail.
EDGES_PER_PARTITION = 2_000_000
MAX_ROUND_PARTITIONS = 4096

# Adaptive materialization stride (round 7): below this live edge count a
# star round's cost is dominated by fixed per-action overheads (job
# launch, digest aggregation, checkpoint bookkeeping), so two rounds per
# localCheckpoint halve the action count; at or above it each round's two
# node-keyed shuffles of the edge multiset dominate, so per-round
# materialization + per-round fixpoint detection win (no expensive
# overshoot rounds, shallower plans). 10M ~= 5 EDGES_PER_PARTITION-sized
# shuffle partitions — the point where a round stops being latency-priced
# on the reference 32-core box; measured crossover evidence in BENCH.md
# ("Materialization stride").
ADAPTIVE_STRIDE_EDGES = 10_000_000


def _round_partitions(spark: SparkSession, n_edges: int) -> int:
    par = spark.sparkContext.defaultParallelism
    return max(
        par,
        min(
            MAX_ROUND_PARTITIONS,
            math.ceil(max(n_edges, 1) / EDGES_PER_PARTITION),
        ),
    )


def _canonical_edges(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct undirected edges as (u, v), self-loops dropped."""
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    return e.filter(F.col("u") != F.col("v")).distinct()


def _symmetrize(e: DataFrame) -> DataFrame:
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(sym: DataFrame) -> DataFrame:
    """For every node u: attach each STRICTLY LARGER neighbor to
    m = min(neighborhood(u) + {u}). Keeps connectivity, only ever lowers
    labels (Kiveris et al. Thm 1)."""
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(sym: DataFrame) -> DataFrame:
    """For every node u: attach u and each SMALLER neighbor to the
    minimum of those smaller neighbors."""
    smaller = sym.filter(F.col("v") < F.col("u"))
    mins = smaller.groupBy("u").agg(F.min("v").alias("m"))
    moved = (
        smaller.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edges = mins.select("u", F.col("m").alias("v"))
    return (
        moved.union(self_edges)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _release_checkpoint(df: DataFrame) -> None:
    """Free a superseded localCheckpoint's blocks. They are NON-EVICTABLE
    (lineage is gone, so Spark pins them) and ``DataFrame.unpersist()`` is
    a no-op for them — the persistence lives on the underlying RDD inside
    the LogicalRDD plan node, not in the CacheManager. Verified: the plan
    route drops the entry from getPersistentRDDs; without it a 10⁸-edge
    run accumulates every stride's blocks and starves execution memory
    (UNABLE_TO_ACQUIRE_MEMORY — observed). Best-effort: if the internal
    accessor moves in a future Spark, blocks merely stay resident (the
    pre-round-6 behavior)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # pragma: no cover — internal API drift
        pass


def _digest(e: DataFrame):
    """(edge_count, order-free hash) — the per-round fixpoint scalar."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(u, v))").alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"]) if row["h"] is not None else 0


def connected_components(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b",
    stats: dict | None = None, stride_rounds: int | None = None
) -> DataFrame:
    """(doc_id, component) for every node appearing in ``pairs``; the
    component label is the smallest doc_id in the component.

    Iterates large-star / small-star to a fixpoint, materializing with
    ``localCheckpoint`` every stride (lineage otherwise stacks O(rounds)
    deep and the planner re-derives the whole chain every action; on a
    cluster with a configured checkpoint dir, ``checkpoint`` is the
    fault-tolerant drop-in — GraphFrames does the same every few
    rounds). The stride length is regime-dependent and by default
    ADAPTIVE per stride on the live edge count (round 7, measured —
    BENCH.md "Materialization stride"):

    * SMALL graphs (< ADAPTIVE_STRIDE_EDGES): 2 rounds per stride —
      fixed per-action costs (job launch, digest aggregation, checkpoint
      bookkeeping) dominate, so halving the action count wins
      (round-5 VERDICT #4). This is the pre-round-7 behavior, byte-for-
      byte, at every driver-measured tier.
    * LARGE graphs: 1 round per stride — each round shuffles the
      still-huge edge multiset twice, so the 2-round stride's coarser
      fixpoint detection overshoots by up to 2 EXPENSIVE rounds, and
      its deeper unmaterialized plan (each star round references its
      input ~4×) costs real planning/recompute. Measured at 2×10⁷
      chain edges (same-window interleaved pairs): stride 1
      {208, 135 s, 10 rounds} vs stride 2 {216, 216 s, 12 rounds}.

    Strides LONGER than 2 are refused: with ~4× input fan-out per round
    and no common-subtree sharing in Catalyst, a k-round unmaterialized
    stride plans ~4^k subtree copies — a 64-edge toy converges in 21 s
    at stride 2 and did not finish in 8.5 min at stride 3 (BENCH.md),
    settling r6 NEXT #6 (checkpoint-every-4-rounds) structurally: the
    I/O saved per materialization can never outrun quartic planning
    growth. Fixpoint detection across a stride of 1 or 2 is sound
    because the alternation's potential function strictly decreases
    until the star forest is reached (Kiveris et al. Thm 2) — an
    unchanged digest over k rounds cannot be a k-cycle.

    ``stride_rounds``: None (default) = adaptive as above; 1 or 2 pins
    the stride for the whole run (the scale smokes' A/B knob).

    Pass a dict as ``stats`` to receive {"rounds": int} for convergence
    telemetry (the scale smoke records it)."""
    if stride_rounds not in (None, 1, 2):
        raise ValueError(
            "stride_rounds must be None (adaptive), 1 or 2: the star "
            "rounds fan out their input ~4x each, so a k-round "
            "unmaterialized stride plans ~4^k subtree copies (see "
            "docstring / BENCH.md round 7)"
        )
    e0 = _canonical_edges(pairs, src, dst).localCheckpoint(eager=True)
    # nodes derive from the CHECKPOINTED frame — lineage through `pairs`
    # would re-execute the whole upstream pair query (d13's corpus
    # self-join) inside the centers anti-join on every downstream action —
    # and are MATERIALIZED here so e0's blocks can be released once the
    # first stride supersedes it (see unpersist below)
    nodes = (
        _symmetrize(e0)
        .select(F.col("u").alias("doc_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    spark = e0.sparkSession
    orig_parts = spark.conf.get("spark.sql.shuffle.partitions")
    e = e0
    prev = _digest(e0)
    rounds = 0
    try:
        while rounds < MAX_ROUNDS:
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(_round_partitions(spark, prev[0])),
            )
            stride = stride_rounds or (
                1 if prev[0] >= ADAPTIVE_STRIDE_EDGES else 2
            )
            nxt = e
            for _ in range(stride):
                nxt = _small_star(_symmetrize(_large_star(_symmetrize(nxt))))
            e_next = nxt.localCheckpoint(eager=True)
            rounds += stride
            cur = _digest(e_next)
            # e_next is materialized and never references e, so the
            # superseded stride's pinned blocks are safe to drop
            _release_checkpoint(e)
            e = e_next
            if cur == prev:
                break
            prev = cur
        else:
            raise RuntimeError(
                f"connected_components did not converge in {MAX_ROUNDS} "
                "rounds"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig_parts)
    if stats is not None:
        stats["rounds"] = rounds

    # fixpoint edge set is a star forest: (member, center) with center =
    # component min; centers (and only they) are absent from the child side
    members = e.select(F.col("u").alias("doc_id"), F.col("v").alias("component"))
    centers = nodes.join(
        members.select("doc_id"), "doc_id", "left_anti"
    ).select("doc_id", F.col("doc_id").alias("component"))
    return members.union(centers)


def dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters of the corpus: connected components over the
    DURABLE winnowing dup-pair table (signatures.ensure_dup_pairs_table —
    d13's min_shared=1 pair set, incrementally maintained via the pair
    delta). Cluster resolution pays only for the graph, never for
    re-deriving it from the corpus: before round 6 the first eager
    checkpoint re-ran the whole dup-pairs query (~73 s of the 10⁶-doc
    maintenance smoke); now it scans a tiny parquet table."""
    from deed_ocr_spark.signatures import (
        ensure_dup_pairs_table,
        read_signature_table,
    )

    pairs = read_signature_table(
        spark, ensure_dup_pairs_table(spark, sf_dir)
    )
    return connected_components(pairs)


def d16_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REGISTERED components query: duplicate clusters over the n-gram
    Jaccard pairs (d7's registered bucketed form — row-identical to the
    portable pipeline its DuckDB oracle mirrors). d7's pair predicate is
    fully SQL-expressible, so this operator gets a real value oracle: the
    same pairs fed to a recursive-CTE transitive closure with min-label
    aggregation (textpipe's d7 SQL + reach CTE). The d13-based
    ``dup_components`` above stays the maintenance-pipeline form (its
    winnowing hash is engine-native, hence rows-only)."""
    from deed_ocr_spark.queries.textpipe import (
        d7b_ngram_jaccard_pairs_bucketed,
    )

    return connected_components(
        d7b_ngram_jaccard_pairs_bucketed(spark, sf_dir)
    )


def canonical_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One keeper per duplicate CLUSTER (the transitive-closure upgrade of
    d14's greedy pair policy): every doc outside any dup pair keeps
    itself; inside a cluster only the smallest doc_id survives.

    Chaining caveat (inherent to transitive closure, not this operator):
    near-dup is not transitive, so pairwise-similar TEMPLATES chain —
    on the synthetic sf0.01 corpus d13's default min_shared=1 pairs
    connect 498/500 docs into one cluster. A production curation run
    tightens the pair predicate (min_shared, Jaccard threshold) or
    re-verifies within oversized clusters before dropping; the operator
    clusters whatever pair frame it is given."""
    from deed_ocr_spark.queries.common import t

    docs = t(spark, sf_dir, "documents").select("doc_id")
    comp = dup_components(spark, sf_dir)
    dropped = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    return docs.join(dropped, "doc_id", "left_anti")


# --- incremental label maintenance ---------------------------------------------
def update_components(
    old_labels: DataFrame,
    current_pairs: DataFrame,
    added: DataFrame,
    retracted: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Maintain (doc_id, component) labels under a pair DELTA instead of
    re-clustering the corpus: given labels for graph G and the
    (added, retracted) edge delta producing G' (``current_pairs`` —
    e.g. the freshly-maintained durable pairs table), return
    connected_components(G') — property-tested equal to the recompute.

    The day-2 economics: relabeling work is proportional to the DELTA's
    reach, never the corpus. Additions only ever MERGE clusters, so they
    are solved on a CONTRACTED graph whose nodes are old cluster labels
    (one super-edge per added pair). Retractions can SPLIT, but only the
    clusters that carried a retracted edge — and because components
    partition the graph (every surviving G' edge incident to an affected
    cluster stays inside affected clusters; cross-cluster edges in G' are
    exactly the additions), those clusters' node-level subgraphs are
    re-solved from ``current_pairs`` restricted to their nodes. Both
    reduced edge sets feed ONE star-contraction run; final labels
    compose: affected/new nodes take the reduced solution directly,
    unaffected nodes follow their old cluster's (possibly merged) label.
    Labels stay canonical (min doc id): an unaffected supernode's id IS
    its cluster minimum, so the reduced run's min-label is the true min
    of any merged cluster.

    Nodes that lose their last edge drop out of the result, matching
    connected_components' domain (nodes appearing in some pair).

    ``old_labels`` should arrive materialized (a table scan or a
    checkpointed frame): its lineage is evaluated a few times below, and
    re-running a full clustering per evaluation would defeat the point.
    The DELTA frames are checkpointed here exactly once — a caller
    passing the lazy |new|×corpus delta query must not pay that join per
    downstream action."""
    old = old_labels.select("doc_id", "component")
    add_e = _canonical_edges(added, src, dst).localCheckpoint(eager=True)
    retr_e = _canonical_edges(retracted, src, dst).localCheckpoint(
        eager=True
    )

    # clusters wounded by a retraction → their full node sets re-solve
    wounded = (
        old.join(
            _symmetrize(retr_e).select(F.col("u").alias("doc_id")).distinct(),
            "doc_id",
            "semi",
        )
        .select("component")
        .distinct()
    )
    aff_nodes = (
        old.join(wounded, "component", "semi")
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    # rep: identity for affected nodes and brand-new docs (absent rows →
    # coalesce to the node itself), old cluster label otherwise
    rep = old.join(aff_nodes, "doc_id", "left_anti")

    def contracted(e: DataFrame) -> DataFrame:
        for side in ("u", "v"):
            e = (
                e.join(
                    rep.select(
                        F.col("doc_id").alias(side),
                        F.col("component").alias(f"_{side}"),
                    ),
                    side,
                    "left",
                )
                .withColumn(side, F.coalesce(f"_{side}", side))
                .drop(f"_{side}")
            )
        return e

    # raw projection, NO distinct: a pre-semi distinct would aggregate
    # the whole corpus-scale pair graph before the delta-sized restriction
    # (Catalyst cannot push a semi-join below an Aggregate), and
    # connected_components dedups its input anyway. Components partition
    # G: both endpoints of a non-added edge incident to an affected
    # cluster lie inside affected clusters, so the u-side semi suffices.
    cur_raw = current_pairs.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).filter(F.col("u") != F.col("v"))
    sub_e = cur_raw.join(
        aff_nodes.withColumnRenamed("doc_id", "u"), "u", "semi"
    )
    reduced = contracted(add_e).unionByName(sub_e).filter("u != v")
    labels_r = connected_components(
        reduced.select(F.col("u").alias("doc_a"), F.col("v").alias("doc_b"))
    )

    new_docs = (
        _symmetrize(add_e)
        .select(F.col("u").alias("doc_id"))
        .distinct()
        .join(old, "doc_id", "left_anti")
    )
    direct = labels_r.join(
        aff_nodes.unionByName(new_docs).distinct(), "doc_id", "semi"
    )
    merged = labels_r.select(
        F.col("doc_id").alias("component"),
        F.col("component").alias("_m"),
    )
    carried = (
        rep.join(merged, "component", "left")
        .select(
            "doc_id", F.coalesce("_m", "component").alias("component")
        )
    )
    return carried.unionByName(direct)


def dup_components_incremental(
    spark: SparkSession, sf_dir: str, old_labels: DataFrame,
    since: dict, max_df: int = 64,
) -> DataFrame:
    """Table-level composition: pair delta from the fingerprint table's
    add-dir provenance (signatures.winnow_dup_pairs_delta) + the durable
    pairs table brought current (ensure_dup_pairs_table, REUSING the same
    delta via delta_hint so the |new|×corpus join runs once) + label
    maintenance (update_components). ``since`` is the processed_parts
    snapshot ``old_labels`` was computed against; raises ValueError (run
    the full dup_components) when provenance is insufficient — including
    when a CONCURRENT append widened the pairs table's window past this
    delta's: update_components' precondition is current_pairs == old ∪
    added − retracted, and a silently wider table would drop the
    concurrent docs' labels and merges with no error."""
    from deed_ocr_spark.signatures import (
        _read_manifest,
        ensure_dup_pairs_table,
        read_signature_table,
        winnow_dup_pairs_delta,
    )

    window: dict = {}
    added, retracted = winnow_dup_pairs_delta(
        spark, sf_dir, since, max_df, window=window
    )
    added = added.localCheckpoint(eager=True)
    retracted = retracted.localCheckpoint(eager=True)
    ver = ensure_dup_pairs_table(
        spark,
        sf_dir,
        max_df,
        delta_hint=(since, window["parts"], added, retracted),
    )
    if _read_manifest(ver) != window["parts"]:
        raise ValueError(
            "the durable pairs table covers a wider window than this "
            "label delta (a concurrent append landed) — recompute labels "
            "with the full dup_components"
        )
    pairs_now = read_signature_table(spark, ver)
    return update_components(old_labels, pairs_now, added, retracted)


# --- driver registry -----------------------------------------------------------
def _d16_oracle_sql() -> str:
    """Recursive-CTE components oracle: d7's pair SQL symmetrized, then
    transitive closure (UNION-dedup fixpoint) and min-label aggregation —
    feasible because the pair graph at oracle scale (sf0.001/sf0.01) is
    tiny; the Spark side is the O(log) star-contraction that scales."""
    from deed_ocr_spark.queries.textpipe import ORACLES as _T

    d7 = _T["d7_ngram_jaccard_pairs"]
    return f"""
        WITH RECURSIVE pairs AS ({d7}),
        edges AS (
          SELECT doc_a AS u, doc_b AS v FROM pairs
          UNION
          SELECT doc_b AS u, doc_a AS v FROM pairs
        ),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
          WHERE e.v <> r.u
        )
        SELECT u AS doc_id, least(u, min(v)) AS component
        FROM reach GROUP BY u
    """


QUERIES = {"d16_dup_components": d16_dup_components}
ORACLES = {"d16_dup_components": _d16_oracle_sql()}
