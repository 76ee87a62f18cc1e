"""Graph analytics over the materialized entity graph (beyond-reference).

The reference stops at emitting triples (kgconstruction/ writes JSON
triple files and serves lookups); a KG pipeline at 100 TB also needs
the downstream graph computations those triples feed. This module adds
the two canonical ones, Spark-first:

- ``pagerank``: fixed-iteration damped PageRank via iterative
  DataFrame joins — the standard Pregel-free formulation (one
  contribution shuffle per round, lineage cut per round the same way
  as canonicalize.connected_components).
- ``triangle_count``: per-node triangle participation via the
  oriented-edge join (each triangle counted once at its smallest
  vertex's orientation) — the join-based formulation that avoids
  enumerating open wedges twice.

Scale design (both):
- Edges shuffle on their join key per round; hot entities (Zipfian
  head) are exactly the AQE skew-join case, same as the linker.
- ``pagerank`` rounds each iteration's rank to ``round_dp`` decimals.
  That is NOT cosmetic: groupBy-sum order is nondeterministic across
  partitionings/engines, leaving ~1e-17 -relative float noise per
  round; compounding it over iterations would diverge engines. The
  per-round quantization (step 1e-10 ≫ ulp noise) makes every round's
  output bit-identical, so the DuckDB oracle can reproduce the exact
  values — the same portability discipline as the md5-based dedup
  hashes.
- Dangling nodes (no out-edges) leak their mass — the simplified
  textbook variant; the oracle mirrors it. (Redistributing dangling
  mass needs one extra scalar agg per round — same plan shape, omitted
  for oracle parity.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_DAMPING = 0.85
PR_ITERS = 10
PR_ROUND_DP = 10


def _edge_nodes(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    damping: float = PR_DAMPING,
    n_iter: int = PR_ITERS,
    round_dp: int = PR_ROUND_DP,
    use_local_checkpoint: bool = True,
) -> DataFrame:
    """edges(src long, dst long), directed + deduped, self-loops
    excluded by the caller → (id long, rank double).

    ``rank`` is UNIFORM-NORMALIZED PageRank: the probability vector
    scaled by N, so uniform = 1.0 and the probability form is rank/N.
    Iteration (the standard recurrence with both sides multiplied by
    N): rank⁰ = 1; rankᵗ⁺¹(v) = (1−d) + d·Σ_{u→v} rankᵗ(u)/outdeg(u),
    every rank rounded to ``round_dp`` decimals per round (see module
    docstring).  The normalization is what makes the fixed decimal
    grid scale-free: values stay O(1) at ANY graph size, so 10 dp keeps
    ~10 significant digits whether N is 10² or 10¹⁰ — quantizing the
    raw probabilities instead would hit the grid (100% error, then
    all-zero ranks) once 1/N approaches 1e-10.  N counts edge-touching
    nodes; isolated nodes are the caller's concern (same contract as
    connected_components).

    Per round: one join of the edge list with the rank table on src
    (rank moves to the edges' partitioning — on a real cluster,
    bucketing edges by src makes this exchange one-sided) and one
    groupBy(dst) contribution sum with map-side partial aggregation.
    ``localCheckpoint`` per round cuts the iterative plan's lineage
    exactly as in connected_components; use reliable ``checkpoint()``
    on a cluster for resumability.
    """
    edges = edges.select("src", "dst")
    if use_local_checkpoint:
        edges = edges.localCheckpoint(eager=True)
    # nodes and outdeg are joined EVERY round — materialize them once,
    # or each iteration re-runs their distinct/groupBy shuffles from
    # the edge list (10 redundant shuffles at the default iteration
    # count)
    nodes = _edge_nodes(edges)
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    if use_local_checkpoint:
        nodes = nodes.localCheckpoint(eager=True)
        outdeg = outdeg.localCheckpoint(eager=True)
    teleport = 1.0 - damping
    rank = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(n_iter):
        contribs = (
            edges.join(rank.withColumnRenamed("id", "src"), "src")
            .join(outdeg, "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        rank = nodes.join(
            contribs.withColumnRenamed("dst", "id"), "id", "left"
        ).select(
            "id",
            F.round(
                F.lit(teleport)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)),
                round_dp,
            ).alias("rank"),
        )
        if use_local_checkpoint:
            rank = rank.localCheckpoint(eager=True)
    return rank


def khop_counts(
    edges: DataFrame, k: int = 2, use_local_checkpoint: bool = True
) -> DataFrame:
    """edges(src long, dst long), directed, self-loops excluded by the
    caller → (id long, reach long): number of DISTINCT nodes reachable
    in 1..k directed hops (excluding the node itself) — the standard
    BFS-by-join.

    Per hop: one join of the current frontier with the (checkpointed)
    edge list on a single node key + a distinct — the frontier is
    deduped EVERY hop, which is what keeps a power-law graph's hub
    fan-out from multiplying paths (reachability, not path counting).
    k stays small in practice (neighborhood features); deep traversal
    belongs to the pregel-style loop with convergence checks
    (connected_components).
    """
    edges = edges.select("src", "dst")
    if use_local_checkpoint:
        edges = edges.localCheckpoint(eager=True)
    reach = edges
    frontier = edges
    for _ in range(k - 1):
        frontier = (
            frontier.alias("f")
            .join(edges.alias("e"), F.col("f.dst") == F.col("e.src"))
            .select(F.col("f.src").alias("src"), F.col("e.dst").alias("dst"))
            .distinct()
        )
        if use_local_checkpoint:
            frontier = frontier.localCheckpoint(eager=True)
        reach = reach.unionByName(frontier)
    counts = (
        reach.filter(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy("src")
        .agg(F.count("*").alias("reach"))
        .withColumnRenamed("src", "id")
    )
    return (
        _edge_nodes(edges)
        .join(counts, "id", "left")
        .select("id", F.coalesce("reach", F.lit(0)).cast("long").alias("reach"))
    )


def triangle_count(edges: DataFrame, use_local_checkpoint: bool = True) -> DataFrame:
    """edges(src long, dst long), treated as UNDIRECTED → (id long,
    triangles long): number of triangles each node participates in.

    Oriented-edge formulation: orient every undirected edge low→high
    (so each triangle {a<b<c} exists exactly as the wedge a→b→c closed
    by a→c), join wedges with the closing edge, then count each found
    triangle once per member vertex. Two shuffle joins on single node
    keys — never an open-wedge cross product per node, and the
    orientation bounds the join fan-out by the smaller "forward
    degree" (the classic compact-forward argument: high-degree hubs
    mostly receive edges, so their forward adjacency stays small).

    The edge list is materialized (lineage cut) BEFORE the three-way
    self-join: the join references it three times, and without the cut
    each reference re-expands the caller's full upstream plan — for
    the triples graph that would re-run model inference 3× (the first
    plan_audit of this query showed 529 exchanges).  Same remedy as
    pagerank's per-round checkpoint; use reliable ``checkpoint()`` on
    a cluster.
    """
    und = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if use_local_checkpoint:
        und = und.localCheckpoint(eager=True)
    fwd = und.filter(F.col("src") < F.col("dst"))
    ab = fwd.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = fwd.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = fwd.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])  # a<b<c, all three edges
    per_node = (
        tri.select(F.col("a").alias("id"))
        .unionByName(tri.select(F.col("b").alias("id")))
        .unionByName(tri.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        _edge_nodes(und)
        .join(per_node, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"))
    )
