"""Fixed-iteration PageRank (operators/linkgraph.py)."""

from __future__ import annotations

from collections import Counter, defaultdict
from decimal import Decimal

import pytest

from gnames_spark.operators.linkgraph import pagerank

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("d", "a"), ("e", "c"),  # e,d are dangling-in only
]


def ref_pagerank(edges, d=0.85, iters=5, dangling=False):
    """Sequential reference of the exact module contract."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    out = Counter(s for s, _ in edges)
    rank = {v: round(1.0 / n, 12) for v in nodes}
    base = round((1.0 - d) / n, 12)
    for _ in range(iters):
        recv = defaultdict(Decimal)
        for s, t in edges:
            recv[t] += Decimal(str(round(rank[s] / out[s], 12)))
        dshare = 0.0
        if dangling:
            dmass = sum(
                (Decimal(str(rank[v])) for v in nodes if out[v] == 0),
                Decimal(0),
            )
            dshare = round(float(dmass) / n, 12)
        rank = {
            v: round(base + d * (float(recv[v]) + dshare), 12) for v in nodes
        }
    return {v: round(r, 8) for v, r in rank.items()}


class TestPageRank:
    def test_matches_sequential_reference(self, spark):
        df = spark.createDataFrame(EDGES, ["src", "dst"])
        got = {r.node: r.rank for r in pagerank(df).collect()}
        assert got == ref_pagerank(EDGES)

    def test_sink_heavy_node_ranks_highest(self, spark):
        df = spark.createDataFrame(EDGES, ["src", "dst"])
        got = {r.node: r.rank for r in pagerank(df).collect()}
        # c (4 in-edges) and a (receives ALL of c's mass) are the top
        # two; source-only nodes d,e get just the base
        assert set(sorted(got, key=got.get)[-2:]) == {"a", "c"}
        assert got["d"] == got["e"] == min(got.values())

    def test_partition_invariant(self, spark):
        df = spark.createDataFrame(EDGES * 3, ["src", "dst"])  # parallel edges
        a = {r.node: r.rank for r in pagerank(df).collect()}
        b = {r.node: r.rank for r in pagerank(df.repartition(13)).collect()}
        assert a == b

    def test_total_rank_bounded(self, spark):
        df = spark.createDataFrame(EDGES, ["src", "dst"])
        total = sum(r.rank for r in pagerank(df).collect())
        # simple variant: dangling mass leaks, so total <= 1
        assert 0.5 < total <= 1.000001


DANGLING_EDGES = [
    # b, d, e never appear as sources — a dangling-heavy graph where
    # redistribution visibly changes both totals and relative order
    ("a", "b"), ("a", "d"), ("c", "d"), ("c", "e"), ("a", "c"),
]


class TestPageRankDangling:
    def test_matches_sequential_reference(self, spark):
        df = spark.createDataFrame(DANGLING_EDGES, ["src", "dst"])
        got = {
            r.node: r.rank
            for r in pagerank(df, redistribute_dangling=True).collect()
        }
        assert got == ref_pagerank(DANGLING_EDGES, dangling=True)

    def test_partition_invariant(self, spark):
        df = spark.createDataFrame(DANGLING_EDGES * 3, ["src", "dst"])
        a = {
            r.node: r.rank
            for r in pagerank(df, redistribute_dangling=True).collect()
        }
        b = {
            r.node: r.rank
            for r in pagerank(
                df.repartition(13), redistribute_dangling=True
            ).collect()
        }
        assert a == b

    def test_conserves_total_mass(self, spark):
        # stochastic completion keeps the rank vector a distribution
        # (up to the documented per-step rounding)
        df = spark.createDataFrame(DANGLING_EDGES, ["src", "dst"])
        total = sum(
            r.rank for r in pagerank(df, redistribute_dangling=True).collect()
        )
        assert abs(total - 1.0) < 1e-6

    def test_redistribution_lifts_sources_over_simple(self, spark):
        df = spark.createDataFrame(DANGLING_EDGES, ["src", "dst"])
        simple = {r.node: r.rank for r in pagerank(df).collect()}
        redis = {
            r.node: r.rank
            for r in pagerank(df, redistribute_dangling=True).collect()
        }
        # recycled dangling mass flows back to every node; sources a, c
        # (rank = base only in both variants' floor) strictly gain
        assert redis["a"] > simple["a"]
        assert redis["c"] > simple["c"]

    def test_no_dangling_nodes_equals_simple_variant(self, spark):
        # on a graph with no sinks the two contracts coincide exactly
        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
        )
        simple = {r.node: r.rank for r in pagerank(df).collect()}
        redis = {
            r.node: r.rank
            for r in pagerank(df, redistribute_dangling=True).collect()
        }
        assert simple == redis
