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


def test_pagerank_matches_python_power_iteration(spark):
    """3 iterations on a small undirected star+path graph vs an exact
    python replica (including the per-iteration 12dp rounding)."""
    from hpaste_spark.operators.graph import pagerank

    und = [(1, 2), (2, 3), (3, 4), (1, 3)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iterations=3).collect()}

    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    n = len(deg)
    r = {v: 1.0 / n for v in deg}
    for _ in range(3):
        inn = {v: 0.0 for v in deg}
        for s, t in edges:
            inn[t] += r[s] / deg[s]
        r = {v: round(0.15 / n + 0.85 * inn[v], 12) for v in deg}
    exp = {v: round(x, 6) for v, x in r.items()}
    assert got == exp
    # rank mass ~1 and the degree-3 hubs outrank the leaf
    assert abs(sum(got.values()) - 1.0) < 1e-3
    assert got[3] > got[4] and got[1] > got[4]


def test_pagerank_requires_iterations(spark):
    import pytest

    from hpaste_spark.operators.graph import pagerank

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)
