"""Connected components over the verified pair list (SURVEY.md §2.5 A6).

The reference's final grouping is a SERIAL greedy pass over a channel
(``/root/reference/Api/Implementations/SimilarImages/SimilarImageFinder.cs:
340-411``) whose clusters depend on arrival order (a neighbor already claimed
by an earlier cluster is silently dropped, ``:360-363``). The engine computes
true connected components — a canonical superset merge — with
``cluster = min(node)`` labels so output is deterministic.

Two implementations:

- ``connected_components_driver``: classic union-find with path compression
  over the streamed edge list. Edges = verified near-dup pairs, orders of
  magnitude smaller than the corpus; up to ``cc_driver_max_edges`` this is
  the fastest correct choice and keeps zero extra shuffles.
- ``connected_components_distributed``: hash-to-min set propagation
  (Rastogi et al., "Finding Connected Components in Map-Reduce in
  Logarithmic Rounds", ICDE 2013) expressed as Ray Data
  ``groupby(key).map_groups`` rounds — one metadata-only (int64, int64)
  shuffle per round, O(log n) rounds even for path graphs. Used above the
  driver threshold; correctness cross-checked against networkx in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from europa_ray.util import mix64


def connected_components_driver(pairs_ds) -> dict[int, int]:
    """Connected components over an (a: int64, b: int64, ...) pairs Dataset,
    vectorized: min-label propagation with pointer jumping over NumPy index
    arrays — O(E) per round, O(log n) rounds, no Python-per-edge loop.

    Returns {node → component_label} with label = min node in component,
    only for nodes appearing in at least one edge.
    """
    a_parts: list[np.ndarray] = []
    b_parts: list[np.ndarray] = []
    for batch in pairs_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        a_parts.append(batch["a"].to_numpy())
        b_parts.append(batch["b"].to_numpy())
    if not a_parts:
        return {}
    a = np.concatenate(a_parts)
    b = np.concatenate(b_parts)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: a.shape[0]], inv[a.shape[0] :]
    # nodes are sorted, so min over indices == min over node values
    labels = np.arange(nodes.shape[0], dtype=np.int64)
    while True:
        m = np.minimum(labels[ia], labels[ib])
        new = labels.copy()
        np.minimum.at(new, ia, m)
        np.minimum.at(new, ib, m)
        new = new[new[new]]  # pointer jumping: geometric convergence
        if np.array_equal(new, labels):
            break
        labels = new
    return dict(zip(nodes.tolist(), nodes[labels].tolist()))


def _emit_h2m(batch: pa.Table) -> pa.Table:
    """Vectorized hash-to-min emissions for joined (key=u, val=v,
    ``min(val)``) rows: with m = min(u, min C(u)), emit (m → v), (v → m)
    and (u → m) — the same messages the per-group formulation sends
    (component members accumulate at the component min), but produced
    row-wise with no Python-per-key call. Batch-local dedup keeps the
    3× emission fan-out from compounding."""
    u = batch["key"].to_numpy()
    v = batch["val"].to_numpy()
    m = np.minimum(u, batch["min(val)"].to_numpy())
    keys = np.concatenate([m, v, u])
    vals = np.concatenate([v, m, m])
    order = np.lexsort((vals, keys))
    keys, vals = keys[order], vals[order]
    keep = np.ones(keys.shape[0], dtype=bool)
    keep[1:] = (keys[1:] != keys[:-1]) | (vals[1:] != vals[:-1])
    return pa.table({"key": pa.array(keys[keep]), "val": pa.array(vals[keep])})


def _label_checksum(labels) -> int:
    """Order-independent uint64 checksum of a (key, min(val)) Dataset."""
    total = np.uint64(0)
    for batch in labels.iter_batches(batch_format="pyarrow", batch_size=65536):
        k = batch["key"].to_numpy().view(np.uint64)
        v = batch["min(val)"].to_numpy().view(np.uint64)
        with np.errstate(over="ignore"):
            total += mix64(k * np.uint64(31) ^ v).sum(dtype=np.uint64)
    return int(total)


def connected_components_distributed(pairs_ds, *, max_iters: int = 50):
    """Hash-to-min to fixpoint; returns Dataset (node, cluster).

    Each round is one metadata-only (int64, int64) label aggregate + one
    hash join + a row-wise vectorized emit (:func:`_emit_h2m`) — NO
    Python-per-key ``map_groups`` call, so a 100M-edge round costs a
    shuffle, not tens of millions of interpreter invocations. Rounds ≈
    O(log n) even for path graphs. Space notes: the component-min key
    accumulates its whole component's ids (the known hash-to-min
    tradeoff — components ≪ corpus for the near-dup workload), and
    cross-batch duplicate messages are squeezed by a distributed
    distinct whenever the state grows past 2× its low-water mark.
    """
    from europa_ray.util import default_num_partitions

    def seed(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        keys = np.concatenate([a, b]).astype(np.int64)
        vals = np.concatenate([b, a]).astype(np.int64)
        return pa.table({"key": pa.array(keys), "val": pa.array(vals)})

    nparts = default_num_partitions()
    state = pairs_ds.map_batches(seed, batch_format="pyarrow").materialize()
    low_water = max(state.count(), 1)
    prev = None
    for _ in range(max_iters):
        labels = state.groupby("key").min("val").materialize()
        chk = _label_checksum(labels)
        if chk == prev:
            break
        prev = chk
        state = (
            state.join(labels, join_type="inner", num_partitions=nparts, on=("key",))
            .map_batches(_emit_h2m, batch_format="pyarrow")
            .materialize()
        )
        n = state.count()
        if n > 2 * low_water:
            state = (
                state.groupby(["key", "val"])
                .count()
                .select_columns(["key", "val"])
                .materialize()
            )
            n = state.count()
        low_water = min(low_water, max(n, 1))
    labels = state.groupby("key").min("val").rename_columns(
        {"key": "node", "min(val)": "cluster"}
    )

    # min(val) for the component-min node is its smallest *other* member, not
    # itself — clamp to min(node, cluster)
    def clamp(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy()
        cl = np.minimum(node, batch["cluster"].to_numpy())
        return pa.table({"node": pa.array(node), "cluster": pa.array(cl)})

    return labels.map_batches(clamp, batch_format="pyarrow")


def components(pairs_ds, *, driver_max_edges: int = 5_000_000):
    """Dispatch: driver union-find for small edge lists (returns
    {node → cluster}), distributed hash-to-min above the threshold (returns
    a ``(node, cluster)`` Dataset — labels NEVER land on the driver; member
    assembly joins them back, ``pipelines/neardup.py:assemble_members``)."""
    n_edges = pairs_ds.count()
    if n_edges <= driver_max_edges:
        return connected_components_driver(pairs_ds)
    return connected_components_distributed(pairs_ds)
