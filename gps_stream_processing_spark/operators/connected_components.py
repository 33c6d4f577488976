"""Connected components over an edge list — min-label propagation.

The reference has no graph code of any kind (its only code file is
class.nmea.parser.php:1-399; SURVEY §0) — engine surface (`ext`), added
because duplicate-pair output (q_dedup_near etc.) is only half of a
dedup pipeline: production dedup keeps ONE survivor per *cluster* of
near-duplicates, and clusters are the connected components of the
pair graph.

Algorithm: iterative min-label propagation (the Pregel/GraphX-style
formulation, a simplification of the large-star/small-star algorithm of
Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14):

  label(v) := v
  repeat: label(v) := min(label(v), min over neighbors u of label(u))
  until no label changes.

Each round is one shuffle (edge join + min-aggregate); convergence takes
at most the graph diameter rounds — near-dup clusters are tiny and
dense, so 2-4 rounds in practice. Per-round ``localCheckpoint`` truncates
the lineage so the plan does not grow exponentially with iterations (the
standard Spark iterative-algorithm discipline; without it round k
re-executes rounds 1..k-1).

At 100 TB scale this is shuffle-bound on the edge list; the labels table
is (long, long) — orders of magnitude smaller than the documents
themselves. Diameter-proportional rounds are acceptable because dedup
graphs are unions of small cliques; for adversarial long-path graphs,
switch to alternating large-star/small-star (O(log n) rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Return (``id``, ``component``) where component = min node id
    reachable over undirected ``edges``. ``nodes`` must contain every
    vertex (isolated vertices become their own singleton component).
    Deterministic; converges in <= diameter rounds, hard-capped by
    ``max_iterations`` (raises if not converged — a correctness error,
    never a silent partial result)."""
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(
        F.col(node_col).alias("id"), F.col(node_col).alias("component")
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, on="id", how="left")
            # the change flag is computable right here (old vs new label in
            # the same row) — a separate old⋈new convergence join per round
            # would double the per-round join count
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                (F.coalesce("nbr_min", F.col("component")) < F.col("component")).alias(
                    "chg"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("chg").limit(1).count()
        labels = new_labels.drop("chg")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )
