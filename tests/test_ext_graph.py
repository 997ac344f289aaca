"""PageRank: analytic cases, mass conservation, networkx-free oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext.graph import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["id"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_symmetric_cycle_is_uniform(spark):
    """A directed cycle: perfect symmetry → everyone holds rank 1/n."""
    got = _ranks(spark, [(1, 2), (2, 3), (3, 1)], n_iter=5)
    for v in got.values():
        assert v == pytest.approx(1 / 3, rel=1e-12)


def test_mass_conserved_with_dangling_nodes(spark):
    """Node 3 has no out-edges — its mass redistributes; Σ rank == 1."""
    got = _ranks(spark, [(1, 3), (2, 3)], n_iter=8)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)
    assert got[3] > got[1] == got[2]


def test_matches_reference_power_iteration(spark):
    """Exact match (float tolerance) against a plain numpy-free Python
    power iteration with the same damping/dangling handling."""
    edges = [(1, 2), (2, 3), (3, 1), (3, 2), (4, 3), (5, 3), (5, 1)]
    d, n_iter = 0.85, 12
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {u: sum(1 for a, _ in edges if a == u) for u in nodes}
    rank = {u: 1 / n for u in nodes}
    for _ in range(n_iter):
        dang = sum(rank[u] for u in nodes if out[u] == 0)
        contrib = {u: 0.0 for u in nodes}
        for a, b in edges:
            contrib[b] += rank[a] / out[a]
        rank = {
            u: (1 - d) / n + d * (contrib[u] + dang / n) for u in nodes
        }
    got = _ranks(spark, edges, damping=d, n_iter=n_iter)
    for u in nodes:
        assert got[u] == pytest.approx(rank[u], rel=1e-9), u


def test_validation(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(df, n_iter=0)


class TestTriangleCounts:
    def _run(self, spark, edge_list):
        from dbt_databricks_metrics_spark.ext.graph import triangle_counts

        edges = spark.createDataFrame(edge_list, "src BIGINT, dst BIGINT")
        return {
            r["id"]: (r["degree"], r["n_triangles"], r["clustering"])
            for r in triangle_counts(edges).collect()
        }

    def test_k4_minus_edge(self, spark):
        # K4 without (3,4): triangles {1,2,3} and {1,2,4}
        got = self._run(
            spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]
        )
        assert got[1] == (3, 2, pytest.approx(2 * 2 / (3 * 2)))
        assert got[2] == (3, 2, pytest.approx(2 * 2 / (3 * 2)))
        assert got[3] == (2, 1, pytest.approx(1.0))
        assert got[4] == (2, 1, pytest.approx(1.0))

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        # duplicates, self-loops and both orientations must not inflate
        got = self._run(
            spark,
            [(1, 2), (2, 1), (1, 3), (2, 3), (2, 3), (3, 3)],
        )
        assert got[1] == (2, 1, pytest.approx(1.0))
        assert got[3] == (2, 1, pytest.approx(1.0))

    def test_matches_bruteforce_on_random_graph(self, spark):
        import itertools
        import random

        rng = random.Random(7)
        nodes = list(range(24))
        edge_list = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.choice(nodes), rng.choice(nodes)) for _ in range(120)
                )
                if a != b
            }
        )
        eset = set(edge_list)
        exp_tri = {n: 0 for n in nodes}
        for x, y, z in itertools.combinations(nodes, 3):
            if (x, y) in eset and (y, z) in eset and (x, z) in eset:
                exp_tri[x] += 1
                exp_tri[y] += 1
                exp_tri[z] += 1
        got = self._run(spark, edge_list)
        for n, (deg, t, _c) in got.items():
            assert t == exp_tri[n], f"node {n}"


class TestLabelPropagation:
    def _edges(self, spark, pairs):
        both = pairs + [(b, a) for a, b in pairs]
        return spark.createDataFrame(both, "src BIGINT, dst BIGINT")

    def test_two_cliques_with_bridge(self, spark):
        from dbt_databricks_metrics_spark.ext.graph import label_propagation

        # clique {1,2,3}, clique {10,11,12}, one bridge 3-10
        pairs = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)]
        got = {
            r["id"]: r["label"]
            for r in label_propagation(self._edges(spark, pairs), n_iter=3).collect()
        }
        # each clique converges to its minimum id; the bridge does not
        # merge the two communities (the clique majority wins)
        assert got[1] == got[2] == got[3] == 1
        assert got[10] == got[11] == got[12]
        assert got[10] != got[1]

    def test_deterministic_under_repartition(self, spark):
        from dbt_databricks_metrics_spark.ext.graph import label_propagation

        pairs = [(i, i + 1) for i in range(0, 30, 2)] + [(0, 29), (4, 17)]
        e = self._edges(spark, pairs)
        a = sorted(map(tuple, label_propagation(e, n_iter=4).collect()))
        b = sorted(map(tuple, label_propagation(e.repartition(7), n_iter=4).collect()))
        assert a == b

    def test_bad_args(self, spark):
        import pytest as _pytest

        from dbt_databricks_metrics_spark.ext.graph import label_propagation

        with _pytest.raises(ValueError, match="n_iter"):
            label_propagation(self._edges(spark, [(1, 2)]), n_iter=0)
