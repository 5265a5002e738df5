"""Link-graph authority: fixed-iteration PageRank over (src, dst) edges.

Crawl curation uses domain authority as a quality prior (Common Crawl
publishes domain-level ranks; CCNet-style pipelines weight sources by
them). The engine op is damped PageRank over an edge table — the
second classic iterative-join workload next to connected components
(operators/components.py), sharing its execution discipline: per-round
lineage cuts, everything map-side-combinable, state = one small
(node, rank) table.

Contract (the oracle recomputes it, so it is frozen and exact):
- ``iterations`` is FIXED (no convergence test): rank_0 = 1/N for the
  N distinct nodes; each round every node receives
  (1-d)/N + d * sum(contributions), a contribution being the source's
  rank / out_degree for each in-edge.
- Dangling mass: by default NOT redistributed (the "simple" variant —
  dangling nodes absorb rank; deterministic, and a common choice for
  authority-PRIORS where relative order is what matters). With
  ``redistribute_dangling=True`` each round also spreads the summed
  rank of out-degree-0 nodes uniformly: every node receives
  (1-d)/N + d * (sum(contributions) + dangling_mass / N) — the
  textbook stochastic-completion form. Real link graphs are
  dangling-heavy (most crawled URLs are never sources), and the two
  variants order nodes differently, so both are first-class.
- Determinism is engineered the lm.py way: each contribution and each
  new rank is rounded to 12 digits and summed in DECIMAL(28,12) —
  addition is exact and order-independent, so partition layout can
  never flip a bit. Ranks are reported rounded to 8 digits.

Scale: one shuffle per iteration (groupBy dst of the contribution
join); the rank table is |nodes| rows — tiny next to the edge table —
so the join broadcasts when it fits and hash-joins when it does not;
edges are scanned once per round, never mutated. Hot dst nodes (every
page links to the same homepage) are one combiner cell, not one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RANK_T = "decimal(28, 12)"
ROUND_D = 12
REPORT_D = 8


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    redistribute_dangling: bool = False,
) -> DataFrame:
    """(node, rank) after ``iterations`` damped rounds. Duplicate
    (src, dst) rows count as parallel edges (each carries its own
    contribution) — pre-dedup if simple-graph semantics are wanted.

    ``redistribute_dangling=True`` adds the stochastic-completion term:
    the DECIMAL-exact sum of dangling ranks is a 1-row table crossJoined
    (broadcast scalar, the lm.py pattern — no driver collect) into the
    rank update as round(mass/N, 12). The dangling node set is computed
    ONCE (anti-join on out-degree) — membership never changes across
    rounds."""
    src = F.col(src_col)
    dst = F.col(dst_col)
    nodes = (
        edges.select(src.alias("node"))
        .unionByName(edges.select(dst.alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    base = round((1.0 - damping) / n, ROUND_D)
    out_deg = edges.groupBy(src.alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    dangling = nodes.join(out_deg, "node", "left_anti") if redistribute_dangling else None
    ranks = nodes.select(
        "node", F.lit(round(1.0 / n, ROUND_D)).cast(RANK_T).alias("rank")
    )
    for _ in range(iterations):
        contribs = (
            edges.join(ranks, edges[src_col] == ranks["node"])
            .join(out_deg, ranks["node"] == out_deg["node"])
            .select(
                dst.alias("to"),
                F.round(
                    F.col("rank").cast("double") / F.col("out_deg"), ROUND_D
                )
                .cast(RANK_T)
                .alias("c"),
            )
        )
        recv = contribs.groupBy("to").agg(F.sum("c").alias("s"))
        joined = nodes.join(recv, nodes["node"] == recv["to"], "left")
        if redistribute_dangling:
            # exact order-independent DECIMAL sum of dangling rank, then
            # one rounded double share per node; 1-row broadcast scalar
            dmass = (
                ranks.join(dangling, "node", "left_semi")
                .agg(
                    F.round(
                        F.coalesce(F.sum("rank").cast("double"), F.lit(0.0))
                        / F.lit(float(n)),
                        ROUND_D,
                    ).alias("dshare")
                )
            )
            joined = joined.crossJoin(F.broadcast(dmass))
            received = F.coalesce(F.col("s").cast("double"), F.lit(0.0)) + F.col(
                "dshare"
            )
        else:
            received = F.coalesce(F.col("s").cast("double"), F.lit(0.0))
        ranks = (
            joined.select(
                "node",
                F.round(F.lit(base) + damping * received, ROUND_D)
                .cast(RANK_T)
                .alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        "node", F.round(F.col("rank").cast("double"), REPORT_D).alias("rank")
    )
