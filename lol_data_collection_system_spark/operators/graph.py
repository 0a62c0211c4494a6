"""Connected components over near-duplicate pairs — the cluster step of
corpus deduplication (pairs → components → one canonical doc per
component). The reference has no graph step (its dedup is per-row ORM
get-or-create); this is part of the LLM-training-pipeline surface the
engine adds on top.

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round every node takes the minimum label in its closed
neighborhood; converged when no label changes. Rounds = graph diameter,
and near-dup graphs are piles of tiny dense clusters (diameter 2-4 in
practice), so the loop runs 2-5 rounds of one shuffle-join + one
hash-aggregate each — the right shape for this workload at corpus scale.
(For adversarially long chains the round count grows with the diameter;
the two-phase star algorithms of Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC 2014, cut that to O(log n) rounds — same
join/agg building blocks, more of them per round. Not needed for
near-dup clustering.)

Scale notes
-----------
- Per round: one join of labels onto the symmetrized edge list (shuffle
  keyed by node id, partial-agg'd min) — no driver-side graph state;
  the only driver action is the convergence count.
- `localCheckpoint` after each round truncates lineage: without it the
  plan doubles per iteration and Catalyst analysis time explodes by
  round ~10. Checkpoints are LAZY (`eager=False`): each round's
  convergence-sum action is what materializes that round's frame, so a
  round costs one job, not a checkpoint job plus an aggregate job —
  measured 1.34 s -> 1.09 s warm for the 6-round sf0.1 loop.
- Labels are monotonically non-increasing, so convergence is guaranteed
  and checkable by counting strict decreases (0 = fixed point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component_id) for every node that appears in `edges`;
    component_id = the minimum node id in the component.

    Edges are undirected (symmetrized internally); self-loops and
    duplicate edges are harmless. Raises if `max_iter` rounds don't
    reach the fixed point — near-dup graphs converge in single digits,
    so hitting the cap means the input isn't the expected workload.
    """
    from pyspark.sql.types import NumericType

    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # Seed with the closed-neighborhood min — identical to running one
    # propagation round over identity labels, but as a single aggregate:
    # saves one full join+agg+checkpoint round on every input.
    labels = (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.least(F.min("v"), F.first("u")).alias("comp"))
        .localCheckpoint(eager=False)
    )

    # Labels only ever decrease, so for numeric ids the fixed point is
    # detectable from sum(comp) alone — one tiny aggregate per round
    # instead of an old-vs-new join. Non-numeric ids fall back to the
    # join-based strict-decrease count.
    numeric = isinstance(labels.schema["comp"].dataType, NumericType)
    # decimal(38,0) sum: exact for any id width (a bigint sum of 60-bit
    # ids overflows — wraps silently or errors under ANSI)
    _sum = lambda df: df.agg(  # noqa: E731
        F.sum(F.col("comp").cast("decimal(38,0)"))
    ).collect()[0][0]
    prev_sum = _sum(labels) if numeric else None

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .select(F.col("u").alias("node"), F.col("comp"))
        )
        new_labels = (
            labels.union(neighbor_min)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        if numeric:
            new_sum = _sum(new_labels)
            converged = new_sum == prev_sum
            prev_sum = new_sum
        else:
            converged = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.comp") < F.col("o.comp"))
                .count()
                == 0
            )
        labels = new_labels
        if converged:
            return labels.select(
                F.col("node"), F.col("comp").alias("component_id")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_clusters(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Full-corpus (doc_id, component_id) map: docs touched by an edge get
    their component's min id, untouched docs are their own singleton
    component. This is the table a dedup pass filters on
    (`component_id = doc_id` keeps one canonical doc per cluster)."""
    comp = connected_components(edges, src, dst)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce("component_id", "doc_id").alias("component_id"),
        )
    )


def quality_canonicals(
    docs: DataFrame,
    labels: DataFrame,
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware canonical selection per near-dup component: keep the
    HIGHEST-quality member (ties → smallest id), not the smallest id —
    the policy real corpus prep uses (RefinedWeb keeps the longest
    member of a dup cluster; any monotone quality score slots in).

    `labels` is `dedup_clusters`' (doc_id, component_id) map. Returns
    one row per component: (component_id, canonical_id, n_members,
    canonical_quality) — filter `n_members > 1` for the clusters where
    the policy actually changed anything.

    Generic over id type (numeric, string, binary ids all work): pass 1
    partial-aggs (max quality, member count) per component; pass 2 keeps
    only max-quality members and min()s their ids. Both aggregations and
    the rejoin are keyed by component_id, so the second pass reuses the
    first's shuffle partitioning instead of adding a differently-keyed
    exchange.
    """
    joined = labels.join(
        docs.select(F.col(id_col), F.col(quality_col).alias("_q")), id_col
    )
    per_comp = joined.groupBy("component_id").agg(
        F.max("_q").alias("canonical_quality"),
        F.count(F.lit(1)).alias("n_members"),
    )
    return (
        joined.join(per_comp, "component_id")
        # null-safe: a component whose every quality is NULL still keeps
        # a canonical (min id) instead of vanishing from the output.
        .where(F.col("_q").eqNullSafe(F.col("canonical_quality")))
        .groupBy("component_id", "n_members", "canonical_quality")
        .agg(F.min(id_col).alias("canonical_id"))
        .select(
            "component_id", "canonical_id", "n_members", "canonical_quality"
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    damping: float = 0.85,
    iters: int = 10,
    directed: bool = False,
) -> DataFrame:
    """Deterministic PageRank over a doc-similarity graph (kNN edges,
    near-dup pairs): (node, rank), ranks summing to 1. Centrality over
    the `knn_graph` edge list is the graph half of representativeness-
    based coreset selection — a doc its neighborhood keeps pointing at
    is a cluster exemplar; combined with `quality_canonicals` it picks
    "keep" docs by structure rather than by score alone.

    Fixed `iters` power-iteration rounds (no convergence action — rank
    deltas after 10 rounds are far below any selection threshold at
    damping 0.85). Per round: one join of ranks onto the edge list
    (keyed by node), one DECIMAL(38,18)-summed aggregate per
    destination — decimal makes the shuffle-order float sum exact, so
    ranks are bit-identical across partitionings (pinned in tests) —
    plus one tiny aggregate for the dangling-mass scalar (nodes without
    out-edges redistribute uniformly; for symmetrized similarity graphs
    that set is empty, but the generic contract keeps ranks summing
    to 1 on any input). Lineage is truncated per round with a lazy
    localCheckpoint, same loop discipline as `connected_components`.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not directed:
        e = e.union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    e = e.distinct().localCheckpoint(eager=False)

    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        # empty edge frame (clean corpus / high threshold): empty ranks,
        # not a divide-by-zero at plan time
        return nodes.select(
            "node", F.lit(0.0).alias("rank")
        )
    outdeg = e.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    ranks = nodes.join(outdeg, "node", "left").select(
        "node",
        "outdeg",
        (F.lit(1.0) / F.lit(float(n))).cast("decimal(38,18)").alias("rank"),
    ).localCheckpoint(eager=False)

    base = (1.0 - damping) / n
    for _ in range(iters):
        # dangling mass: ranks of sink nodes spread uniformly
        dangling = (
            ranks.filter(F.col("outdeg").isNull())
            .agg(F.sum("rank"))
            .collect()[0][0]
        )
        dangling_share = float(dangling or 0) / n
        contrib = (
            e.join(ranks, e["u"] == ranks["node"])
            .select(
                F.col("v").alias("node"),
                (F.col("rank") / F.col("outdeg")).cast("decimal(38,18)").alias(
                    "c"
                ),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            ranks.select("node", "outdeg")
            .join(contrib, "node", "left")
            .select(
                "node",
                "outdeg",
                (
                    F.lit(base + damping * dangling_share)
                    + F.lit(damping)
                    * F.coalesce(F.col("inflow").cast("double"), F.lit(0.0))
                )
                .cast("decimal(38,18)")
                .alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.col("rank").cast("double").alias("rank"))
