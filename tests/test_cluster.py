"""Connected components vs a union-find oracle, plus size filtering."""

import random

from pyspark.sql import functions as F

from entity_resolution_pipeline_v1_spark.operators.cluster import (
    connected_components,
    filter_and_relabel,
)


def _oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for n in parent:
        comp.setdefault(find(n), set()).add(n)
    return {frozenset(v) for v in comp.values()}


def test_cc_matches_union_find(spark):
    rng = random.Random(42)
    nodes = [f"n{i:03d}" for i in range(120)]
    edges = []
    # chains, cliques, stars, random links
    for i in range(0, 30):
        edges.append((nodes[i], nodes[i + 1]))
    for i in range(40, 50):
        for j in range(i + 1, 50):
            edges.append((nodes[i], nodes[j]))
    for i in range(60, 80):
        edges.append((nodes[60], nodes[i]))
    for _ in range(30):
        edges.append((rng.choice(nodes[80:]), rng.choice(nodes[80:])))
    edges = [(a, b) for a, b in edges if a != b]

    df = spark.createDataFrame(edges, "src string, dst string")
    labels = connected_components(df)
    got = {}
    for r in labels.collect():
        got.setdefault(r["cluster_id"], set()).add(r["record_id"])
    assert {frozenset(v) for v in got.values()} == _oracle(edges)
    # cluster_id is the component minimum
    for cid, members in got.items():
        assert cid == min(members)


def test_filter_and_relabel(spark):
    labels = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c2"), ("d", "c3"), ("e", "c3"), ("f", "c3")],
        "record_id string, cluster_id string",
    )
    out = filter_and_relabel(labels, min_cluster_size=2, max_cluster_size=2)
    rows = out.collect()
    # c2 (singleton) dropped; c1 and c3 kept, densely renumbered 0/1
    assert {r["cluster_id"] for r in rows} == {0, 1}
    oversized = {r["record_id"]: r["oversized"] for r in rows}
    assert oversized["d"] and oversized["e"] and oversized["f"]
    assert not oversized["a"]


def test_position_in_cluster(spark):
    from entity_resolution_pipeline_v1_spark.operators.cluster import position_in_cluster

    labels = spark.createDataFrame(
        [("r3", 0), ("r1", 0), ("r2", 0), ("r9", 1)], "record_id string, cluster_id int"
    )
    got = {(r["record_id"]): (r["cluster_id"], r["position"])
           for r in position_in_cluster(labels).collect()}
    assert got == {"r1": (0, 1), "r2": (0, 2), "r3": (0, 3), "r9": (1, 1)}


def test_cc_reliable_checkpoint_identical(spark, tmp_path):
    """checkpoint_dir switches per-round materialization to reliable
    df.checkpoint() (survives executor loss on a real cluster);
    convergence and labels must be identical to the localCheckpoint
    default, and the checkpoint files must actually land in the dir."""
    import os

    rng = random.Random(7)
    nodes = [f"m{i:03d}" for i in range(80)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(0, 25)]
    edges += [(rng.choice(nodes), rng.choice(nodes)) for _ in range(40)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src string, dst string")

    base = {(r["record_id"], r["cluster_id"]) for r in connected_components(df).collect()}
    ckdir = str(tmp_path / "cc_ck")
    reliable = {
        (r["record_id"], r["cluster_id"])
        for r in connected_components(df, checkpoint_dir=ckdir).collect()
    }
    assert reliable == base
    found = []
    for root, _dirs, files in os.walk(ckdir):
        found.extend(files)
    assert found, "no reliable checkpoint files written"
