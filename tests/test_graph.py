"""Connected-components operator tests."""

from __future__ import annotations


from openskidata_processor_spark.operators.graph import connected_components


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "f")],
        "src string, dst string")
    out = {r.vertex: r.component
           for r in connected_components(edges).collect()}
    assert out == {"a": "a", "b": "a", "c": "a",
                   "d": "d", "e": "d", "f": "f"}


def test_connected_components_chain_converges(spark):
    # a 12-hop path exercises multiple propagation rounds + checkpoints
    names = [f"v{i:02d}" for i in range(13)]
    edges = spark.createDataFrame(
        list(zip(names, names[1:])), "src string, dst string")
    out = {r.vertex: r.component
           for r in connected_components(edges).collect()}
    assert set(out.values()) == {"v00"}
    assert len(out) == 13
