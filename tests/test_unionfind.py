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
