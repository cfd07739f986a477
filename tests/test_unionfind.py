"""Union-find / connected-components tests: driver vs distributed vs networkx."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest


def _random_edges(n_nodes: int, n_edges: int, seed: int) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, size=n_edges)
    b = rng.integers(0, n_nodes, size=n_edges)
    # include negative ids (int64-viewed uint64 nodes are often negative)
    offs = rng.choice([-(1 << 62), 0, 1 << 40], size=n_edges)
    return [(int(x + o), int(y + o)) for x, y, o in zip(a, b, offs) if x != y]


def _oracle(edges) -> dict[int, int]:
    g = nx.Graph()
    g.add_edges_from(edges)
    return {n: min(c) for c in nx.connected_components(g) for n in c}


@pytest.mark.parametrize("seed", [1, 2])
def test_driver_union_find_matches_networkx(ray_session, seed):
    import ray.data

    from europa_ray.state.unionfind import connected_components_driver

    edges = _random_edges(200, 300, seed)
    tbl = pa.table(
        {
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    got = connected_components_driver(ray.data.from_arrow(tbl))
    assert got == _oracle(edges)


def test_distributed_cc_matches_networkx(ray_session):
    import ray.data

    from europa_ray.state.unionfind import connected_components_distributed

    # include a long path (worst case for label propagation rounds)
    edges = _random_edges(100, 120, 3) + [(10_000 + i, 10_001 + i) for i in range(30)]
    tbl = pa.table(
        {
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    labels = connected_components_distributed(ray.data.from_arrow(tbl)).to_pandas()
    got = dict(zip(labels.node.tolist(), labels.cluster.tolist()))
    assert got == _oracle(edges)


def test_driver_cc_five_million_edges(ray_session):
    """Scale evidence for the driver path (used up to cc_driver_max_edges =
    5M): 5M edges over 1M nodes in 1000 components known by construction
    (edges only connect nodes within the same id-block), labels must be the
    per-block minimum. Runs in seconds — the O(E)-per-round pointer-jumping
    implementation, not a per-edge Python loop."""
    import time

    import ray.data

    from europa_ray.state.unionfind import connected_components_driver

    n_nodes, n_comp, n_edges = 1_000_000, 1_000, 5_000_000
    per = n_nodes // n_comp
    rng = np.random.default_rng(7)
    comp = rng.integers(0, n_comp, size=n_edges)
    x = rng.integers(0, per, size=n_edges)
    y = rng.integers(0, per, size=n_edges)
    a = comp * per + x
    b = comp * per + y
    keep = a != b
    a, b = a[keep], b[keep]
    # guarantee every component is fully connected: add a spanning path
    base = np.repeat(np.arange(n_comp) * per, per - 1)
    step = np.tile(np.arange(per - 1), n_comp)
    a = np.concatenate([a, base + step])
    b = np.concatenate([b, base + step + 1])
    tbl = pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    t0 = time.time()
    got = connected_components_driver(ray.data.from_arrow(tbl))
    dt = time.time() - t0
    assert len(got) == n_nodes
    items = np.array(list(got.items()), dtype=np.int64)
    assert (items[:, 1] == (items[:, 0] // per) * per).all()
    assert dt < 300, f"driver CC on 5M edges took {dt:.0f}s"  # generous: VM fault-rate bursts hit first-touch allocations


def test_distributed_cc_path_graph_multi_round(ray_session):
    """Worst-case round count for hash-to-min (a long path) plus disjoint
    small components, through the join-based vectorized rounds and the
    growth-guarded dedup."""
    import ray.data

    from europa_ray.state.unionfind import connected_components_distributed

    path = [(i, i + 1) for i in range(400)]
    cliques = [(1000 + 10 * c + i, 1000 + 10 * c + j)
               for c in range(5) for i in range(3) for j in range(i + 1, 3)]
    edges = path + cliques
    tbl = pa.table(
        {
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    labels = connected_components_distributed(ray.data.from_arrow(tbl))
    got = {}
    for b in labels.iter_batches(batch_format="pyarrow", batch_size=65536):
        got.update(zip(b["node"].to_numpy().tolist(), b["cluster"].to_numpy().tolist()))
    assert got == _oracle(edges)
