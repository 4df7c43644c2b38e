"""Distributed connected components + dedup-group assembly.

The LSH candidate-pair operators (operators/dedup.py) emit
connectivity-preserving edges; the consumer that turns them into dedup
GROUPS is connected components. At 10^12-document scale that is a
distributed iterative algorithm, implemented here with the alternating
large-star / small-star technique (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) in pure DataFrame ops:

- **large-star**: every node connects its strictly-larger neighbors to its
  current minimum neighbor (or itself) — one groupBy per round.
- **small-star**: every node connects its smaller-or-equal neighbors to the
  minimum — halves tree heights.
- Convergence in O(log^2 n) rounds on adversarial graphs, 2-5 rounds on the
  near-clique components dedup produces; each round is ONE shuffle on the
  node id with map-side combine (no windows, no driver-side edge lists).

Determinism: labels are the MINIMUM member id of each component, so output
is engine-independent and comparable against a driver-side union-find
oracle in tests. Every round materializes via an eager localCheckpoint
(lineage truncation — see the in-function comment) and checks convergence
with two scalar probes — the loop is driver-controlled but touches only
aggregate counts, never edge data.

Reference parity: the reference has no graph ops (its dedup is
drop-first-by-id, terracatalog.py:617-619); this is part of the
training-data-pipeline surface the engine adds beyond the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as _dedup

# Last-call iteration stats: {rounds, edges_in, nodes}.
LAST_CC_STATS: dict[str, int] = {}


def _canonical_edges(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Undirected edge list -> canonical (src>dst is allowed; self-loops and
    duplicates dropped)."""
    e = pairs.select(F.col(a).alias("u"), F.col(b).alias("v")).where(
        F.col("u") != F.col("v")
    )
    return e.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).distinct()


def connected_components(
    pairs: DataFrame, a: str = "id_a", b: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """Connected components over an undirected edge list.

    Returns (node, component) with component = min node id of the component;
    isolated nodes never appear in ``pairs`` so they are trivially their own
    component (callers left-join and coalesce to the node id).

    Each iteration alternates large-star and small-star, each ONE
    aggregate-shuffle over the current edge set; convergence = small-star
    produced no new edge (checked with a subtract-count on the tiny deltas,
    not a full materialization to the driver).
    """
    # localCheckpoint per round: each round's plan references the previous
    # round TWICE (the symmetric union), so without lineage truncation the
    # logical tree grows exponentially and Catalyst analysis dominates the
    # wall clock by round ~8. Eager localCheckpoint materializes to executor
    # storage and cuts the lineage; blocks are released by the
    # ContextCleaner when each round's DataFrame goes out of scope.
    edges = _canonical_edges(pairs, a, b).localCheckpoint(eager=True)
    n_in = n_old = edges.count()

    rounds = 0
    for rounds in range(1, max_iter + 1):
        # large-star: symmetric neighborhoods; each neighbor y > x links to
        # m* = min(N(x) ∪ {x}) — keeps big stars from growing
        sym = edges.selectExpr("u AS x", "v AS y").unionAll(
            edges.selectExpr("v AS x", "u AS y")
        )
        mins = sym.groupBy("x").agg(F.min("y").alias("m"))
        large = (
            sym.join(mins, "x")
            .where(F.col("y") > F.col("x"))
            .select(
                F.least(F.col("y"), F.least("x", "m")).alias("u"),
                F.greatest(F.col("y"), F.least("x", "m")).alias("v"),
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: each neighbor y <= x links to m = min(N(x)), AND x
        # itself links to m — dropping the (x, m) link would disconnect
        # nodes whose neighbors are all smaller
        sym2 = large.selectExpr("u AS x", "v AS y").unionAll(
            large.selectExpr("v AS x", "u AS y")
        )
        mins2 = sym2.groupBy("x").agg(F.min("y").alias("m"))
        links = sym2.join(mins2, "x").where(F.col("y") <= F.col("x")).select(
            "y", "m"
        ).unionAll(mins2.select(F.col("x").alias("y"), F.col("m")))
        small = (
            links.select(
                F.least(F.col("y"), F.col("m")).alias("u"),
                F.greatest(F.col("y"), F.col("m")).alias("v"),
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        new_edges = small.localCheckpoint(eager=True)
        n_new = new_edges.count()
        # fixed point (a star per component) ⟺ same cardinality AND no new
        # edge: new−old empty alone would accept a strict subset and stop
        # on a non-star set. Both probes are tiny aggregates over
        # checkpointed sets, never a collect of edge data.
        changed = (n_new != n_old) or new_edges.exceptAll(edges).limit(1).count() > 0
        edges, n_old = new_edges, n_new
        if not changed:
            break

    labels = (
        edges.selectExpr("v AS node", "u AS component")
        .unionByName(edges.selectExpr("u AS node", "u AS component"))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    LAST_CC_STATS.update(rounds=rounds, edges_in=n_in)
    return labels


def dedup_groups(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
    bands: int = 16,
    max_bucket: int = 256,
) -> DataFrame:
    """End-to-end near-duplicate GROUPING: minhash LSH candidates -> exact
    n-gram Jaccard verification at ``jaccard_threshold`` -> connected
    components -> (doc_id, group_id, is_kept). group_id = min doc_id of the
    verified-duplicate component; ``is_kept`` marks the canonical survivor
    (the 'keep first' policy, reference terracatalog.py:617-619, extended
    from exact to near duplicates). Docs with no verified near-duplicate
    keep their own id. This is the full web-scale dedup pipeline shape:
    candidates (bounded by star-collapse + salting), per-pair verification
    (pure JVM array ops), and an O(log n)-round component contraction."""
    pairs = _dedup.minhash_candidate_pairs(
        docs, key_col=key_col, text_col=text_col, bands=bands, max_bucket=max_bucket
    )
    verified = (
        _dedup.ngram_jaccard(pairs, docs, key_col=key_col, text_col=text_col)
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b")
    )
    comp = connected_components(verified)
    out = (
        docs.select(key_col)
        .join(comp.withColumnRenamed("node", key_col), key_col, "left")
        .select(
            F.col(key_col),
            F.coalesce("component", F.col(key_col)).alias("group_id"),
        )
        .withColumn("is_kept", F.col(key_col) == F.col("group_id"))
    )
    return out
