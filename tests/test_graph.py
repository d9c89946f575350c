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


def test_nonconvergence_raises_not_silent_wrong_labels(spark):
    # a 30-hop chain cannot finish in 3 min-label rounds: must raise,
    # never return partially-propagated labels
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=3)


def test_star_variant_matches_label_propagation(spark):
    from hpaste_spark.operators.graph import connected_components_star

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    star = _clusters(connected_components_star(edges).collect())
    prop = _clusters(connected_components(edges).collect())
    assert star == prop


def test_star_variant_long_chain_few_rounds(spark):
    """A 200-node path (diameter 199) must converge in O(log d) ≈ well
    under 15 full rounds — the adversarial case min-label can't do."""
    from hpaste_spark.operators.graph import connected_components_star

    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long"
    )
    out = _clusters(connected_components_star(edges, max_iter=15).collect())
    assert len(out) == n and all(v == 1 for v in out.values())


def test_star_variant_random_graphs_fuzz(spark):
    """Property fuzz: on random graphs the star variant must equal
    min-label propagation (itself oracle-checked against the recursive
    CTE via dedup_cluster_assign)."""
    import random

    from hpaste_spark.operators.graph import connected_components_star

    rng = random.Random(42)
    for trial in range(5):
        n = rng.randint(5, 60)
        m = rng.randint(1, n * 2)
        pairs = {(rng.randint(1, n), rng.randint(1, n)) for _ in range(m)}
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            continue
        edges = spark.createDataFrame(pairs, "id_a long, id_b long")
        star = _clusters(connected_components_star(edges).collect())
        prop = _clusters(connected_components(edges, max_iter=80).collect())
        assert star == prop, f"trial {trial}: star != propagation"
