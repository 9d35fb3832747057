"""Graph analytics operators (operators/graph.py): triangle census,
label propagation, bounded BFS — hand-built graphs with known answers."""

import pytest

from xdlake_spark.operators.graph import (bfs_hops, label_propagation,
                                          triangle_stats)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _bidir(pairs):
    return pairs + [(b, a) for a, b in pairs]


class TestTriangles:
    def test_k4_is_all_triangles(self, spark):
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        row = triangle_stats(_edges(spark, k4)).collect()[0]
        assert row.n_nodes == 4 and row.n_edges == 6
        assert row.n_wedges == 12 and row.n_triangles == 4
        assert row.clustering_coeff == 1.0

    def test_path_has_no_triangles(self, spark):
        row = triangle_stats(_edges(spark, [(1, 2), (2, 3)])) \
            .collect()[0]
        assert row.n_triangles == 0 and row.n_wedges == 1
        assert row.clustering_coeff == 0.0

    def test_duplicate_reversed_and_self_edges_canonicalize(self,
                                                            spark):
        tri = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
        row = triangle_stats(_edges(spark, tri)).collect()[0]
        assert row.n_edges == 3 and row.n_triangles == 1

    def test_two_sharing_an_edge(self, spark):
        # triangles {1,2,3} and {2,3,4} share edge (2,3)
        g = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
        row = triangle_stats(_edges(spark, g)).collect()[0]
        assert row.n_triangles == 2


class TestLabelPropagation:
    def test_two_cliques_with_bridge(self, spark):
        c1 = [(1, 2), (1, 3), (2, 3)]
        c2 = [(7, 8), (7, 9), (8, 9)]
        bridge = [(3, 7)]
        lab = {r.node: r.label
               for r in label_propagation(
                   _edges(spark, _bidir(c1 + c2 + bridge)),
                   iterations=3).collect()}
        # each clique converges to one label; the two differ
        assert lab[1] == lab[2]
        assert lab[8] == lab[9]
        assert lab[1] != lab[8]

    def test_isolated_pair_keeps_own_community(self, spark):
        lab = {r.node: r.label
               for r in label_propagation(
                   _edges(spark, _bidir([(1, 2), (5, 6)])),
                   iterations=2).collect()}
        # after round 1 each node holds its neighbor's label; round 2
        # swaps back — the pair stays a 2-cycle, deterministic
        assert {lab[1], lab[2]} <= {1, 2}
        assert {lab[5], lab[6]} <= {5, 6}

    def test_bad_iterations_raise(self, spark):
        with pytest.raises(ValueError, match=">= 1"):
            label_propagation(_edges(spark, [(1, 2)]), iterations=0)


class TestBfs:
    def test_path_distances_and_cutoff(self, spark):
        path = _bidir([(1, 2), (2, 3), (3, 4), (4, 5)])
        hops = {r.node: r.hops
                for r in bfs_hops(_edges(spark, path), 1,
                                  max_hops=3).collect()}
        assert hops == {1: 0, 2: 1, 3: 2, 4: 3}  # node 5 beyond cutoff

    def test_min_distance_not_revisited(self, spark):
        # diamond: 1-2-4 and 1-3-4, plus long way 2-3
        g = _bidir([(1, 2), (1, 3), (2, 4), (3, 4), (2, 3)])
        hops = {r.node: r.hops
                for r in bfs_hops(_edges(spark, g), 1,
                                  max_hops=4).collect()}
        assert hops == {1: 0, 2: 1, 3: 1, 4: 2}

    def test_early_stop_on_exhausted_component(self, spark):
        g = _bidir([(1, 2), (8, 9)])
        hops = {r.node: r.hops
                for r in bfs_hops(_edges(spark, g), 1,
                                  max_hops=4).collect()}
        assert hops == {1: 0, 2: 1}

    def test_bad_max_hops_raises(self, spark):
        with pytest.raises(ValueError, match=">= 0"):
            bfs_hops(_edges(spark, [(1, 2)]), 1, max_hops=-1)


class TestKCore:
    """k-core peeling (operators/graph.py kcore): hand-built graphs
    with known cores; the chain-graph query is oracle-exact vs a
    10-round unrolled peeling twin (`graph_kcore`)."""

    def test_clique_with_tail(self, spark):
        from xdlake_spark.operators.graph import kcore
        # K4 clique (0-3) + a tail 3-4-5: the 2-core is the clique
        pairs = [(a, b) for a in range(4) for b in range(4) if a < b]
        pairs += [(3, 4), (4, 5)]
        got = {r["node"]: r["degree"]
               for r in kcore(_edges(spark, pairs), k=2).collect()}
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_cascade_peeling(self, spark):
        from xdlake_spark.operators.graph import kcore
        # removing the leaf (5) drops 4 below degree 2, cascading:
        # a pure chain has NO 2-core at all
        chain = [(i, i + 1) for i in range(6)]
        assert kcore(_edges(spark, chain), k=2).count() == 0
        # but a cycle survives intact (every node degree exactly 2)
        cycle = chain + [(6, 0)]
        got = {r["node"]: r["degree"]
               for r in kcore(_edges(spark, cycle), k=2).collect()}
        assert got == {i: 2 for i in range(7)}

    def test_k3_of_two_cliques_bridged(self, spark):
        from xdlake_spark.operators.graph import kcore
        # two K4s joined by one bridge edge: the bridge never creates
        # degree-3 outside the cliques, so the 3-core is both cliques
        k4a = [(a, b) for a in range(4) for b in range(4) if a < b]
        k4b = [(a + 10, b + 10) for a, b in k4a]
        pairs = k4a + k4b + [(3, 10)]
        got = {r["node"] for r in
               kcore(_edges(spark, pairs), k=3).collect()}
        assert got == set(range(4)) | set(range(10, 14))

    def test_directed_input_is_canonicalized(self, spark):
        from xdlake_spark.operators.graph import kcore
        # duplicate directed edges and self-loops collapse away
        pairs = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1)]
        got = {r["node"]: r["degree"]
               for r in kcore(_edges(spark, pairs), k=2).collect()}
        assert got == {1: 2, 2: 2, 3: 2}


class TestDeterministicWalks:
    def test_shape_and_validity(self, spark):
        from xdlake_spark.operators.graph import deterministic_walks
        pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)]
        rows = deterministic_walks(_edges(spark, pairs),
                                   length=3).collect()
        adj: dict = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        walks: dict = {}
        for r in rows:
            walks.setdefault(r["start"], {})[r["step"]] = r["node"]
        assert set(walks) == {1, 2, 3, 4}        # one walk per node
        for start, w in walks.items():
            assert sorted(w) == [0, 1, 2, 3]     # full length
            assert w[0] == start
            for s in range(1, 4):
                assert w[s] in adj[w[s - 1]]     # every hop is an edge

    def test_deterministic_and_seed_sensitive(self, spark):
        from xdlake_spark.operators.graph import deterministic_walks
        pairs = [(i, j) for i in range(8) for j in range(8) if i < j]
        e = _edges(spark, pairs)
        a = sorted(map(tuple, deterministic_walks(e, 4, seed=1)
                       .collect()))
        b = sorted(map(tuple, deterministic_walks(e, 4, seed=1)
                       .collect()))
        c = sorted(map(tuple, deterministic_walks(e, 4, seed=2)
                       .collect()))
        assert a == b
        assert a != c    # on K8 a different seed changes some hop
