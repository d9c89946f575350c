"""Connected components (operators/graph.py): multi-hop chains,
separate components, convergence on cliques, and determinism."""

from hpaste_spark.operators.graph import connected_components


def _clusters(rows):
    return {r["node"]: r["cluster_id"] for r in rows}


def test_chain_multi_hop(spark):
    # 1-2-3-4-5 chain: diameter 4 forces several propagation rounds
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (4, 5)], "id_a long, id_b long"
    )
    out = _clusters(connected_components(edges).collect())
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_clique(spark):
    edges = spark.createDataFrame(
        [(10, 11), (11, 12), (10, 12), (20, 21)], "id_a long, id_b long"
    )
    out = _clusters(connected_components(edges).collect())
    assert out == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_isolated_nodes_not_emitted(spark):
    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = _clusters(connected_components(edges).collect())
    assert set(out) == {1, 2}


def test_long_chain_converges_within_budget(spark):
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long"
    )
    out = _clusters(connected_components(edges, max_iter=n).collect())
    assert all(v == 1 for v in out.values()) and len(out) == n
