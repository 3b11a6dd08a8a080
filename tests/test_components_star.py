"""Large-star/small-star connected components — the skew-safe
variant for hub-dominated graphs (one node in ~50% of edges), where
per-node neighbor lists would concentrate on one executor.
"""

from __future__ import annotations

import random

from etl_npl_pipeline_spark.operators.components import (
    connected_components,
    connected_components_star,
)


def _labels(df):
    return {(r.node, r.component) for r in df.collect()}


def test_star_matches_hashmin_on_clusters(spark):
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (21, 20), (21, 22)],
        ["src", "dst"],
    )
    assert _labels(connected_components_star(edges, "src", "dst")) == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_star_hub_graph_converges(spark):
    """Hub node 500 participates in half of all edges; the other
    half is a long chain glued to the hub — both skew and depth in
    one graph."""
    hub = [(500, i) for i in range(200)]           # hub in 50% of edges
    chain = [(i, i + 1) for i in range(200, 400)]  # diameter 200
    glue = [(500, 200)]
    edges = spark.createDataFrame(hub + chain + glue, ["src", "dst"])
    got = _labels(connected_components_star(edges, "src", "dst"))
    nodes = set(range(401)) | {500}
    assert got == {(n, 0) for n in sorted(nodes)}


def test_star_matches_hashmin_on_random_graph(spark):
    rnd = random.Random(7)
    edges_py = [
        (rnd.randrange(120), rnd.randrange(120)) for _ in range(150)
    ]
    edges_py = [(a, b) for a, b in edges_py if a != b]
    edges = spark.createDataFrame(edges_py, ["src", "dst"])
    assert _labels(connected_components_star(edges, "src", "dst")) == _labels(
        connected_components(edges, "src", "dst")
    )


def test_star_warns_when_max_iter_hit_without_fixpoint(spark):
    """A star rewrite stopped mid-flight is not a valid labeling —
    the loop must warn instead of silently returning."""
    import warnings

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["src", "dst"]
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components_star(edges, "src", "dst", max_iter=1).collect()
    assert any("no fixpoint" in str(x.message) for x in w)
