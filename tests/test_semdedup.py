"""SemDeDup (pipelines/semdedup.py): nlist=1 ≡ exact baseline, clustered
recall on planted duplicates, keep-min representative selection."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _emb_ds(mat: np.ndarray, ids: np.ndarray) -> "ray.data.Dataset":
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in mat], pa.list_(pa.float32())
                ),
            }
        )
    )


def _as_table(result) -> pa.Table:
    import ray.data

    if isinstance(result, ray.data.Dataset):
        t = [
            b
            for b in result.iter_batches(batch_format="pyarrow", batch_size=1 << 16)
            if b.num_rows
        ]
        if not t:
            return result.schema().base_schema.empty_table()
        return pa.concat_tables(t, promote_options="default")
    return result


@pytest.fixture(scope="module")
def clustered(ray_session):
    """8 well-separated clusters, 400 base points, 25 planted exact copies
    and 25 planted near copies (cos > 0.999 with their source)."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    base = centers[np.arange(400) % 8] + 0.05 * rng.normal(size=(400, 32))
    ids = np.arange(400, dtype=np.int64)
    exact_src = np.arange(0, 100, 4, dtype=np.int64)  # 25 sources
    near_src = np.arange(200, 300, 4, dtype=np.int64)  # 25 sources
    exact = base[exact_src]
    near = base[near_src] + 0.001 * rng.normal(size=(near_src.shape[0], 32))
    mat = np.concatenate([base, exact, near]).astype(np.float32)
    all_ids = np.concatenate(
        [ids, exact_src + 10_000, near_src + 20_000]
    )
    planted = {(int(s), int(s + 10_000)) for s in exact_src} | {
        (int(s), int(s + 20_000)) for s in near_src
    }
    return _emb_ds(mat, all_ids), planted


def test_nlist1_equals_exact_baseline(clustered):
    from europa_ray.pipelines.semdedup import semantic_dup_pairs
    from europa_ray.stages.ann import exact_cosine_pairs

    ds, _ = clustered
    got = _as_table(semantic_dup_pairs(ds, threshold=0.95, nlist=1))
    want = exact_cosine_pairs(ds, threshold=0.95)
    key = lambda t: sorted(zip(t["a"].to_pylist(), t["b"].to_pylist(), t["score"].to_pylist()))
    assert key(got) == key(want)
    assert got.num_rows > 0


def test_clustered_recall_on_planted(clustered):
    """Every planted duplicate (exact AND tiny-noise near copy) is found at
    nlist=8: copies land in their source's argmax cell."""
    from europa_ray.pipelines.semdedup import semantic_dup_pairs

    ds, planted = clustered
    got = _as_table(semantic_dup_pairs(ds, threshold=0.999, nlist=8))
    found = set(zip(got["a"].to_pylist(), got["b"].to_pylist()))
    missing = planted - found
    assert not missing, f"missing {len(missing)} planted pairs"


def test_kept_ids_keep_min_policy(clustered):
    """Representatives: planted copies (higher ids) drop, sources and all
    unmatched rows stay."""
    from europa_ray.pipelines.semdedup import semantic_dup_pairs, semdedup_kept_ids

    ds, _ = clustered
    pairs = _as_table(semantic_dup_pairs(ds, threshold=0.999, nlist=1))
    kept = _as_table(semdedup_kept_ids(ds, threshold=0.999, nlist=1))
    all_ids = set()
    for b in ds.iter_batches(batch_format="pyarrow"):
        all_ids.update(b["vec_id"].to_pylist())
    # union-find expectation computed independently
    import collections

    parent = {i: i for i in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"].to_pylist(), pairs["b"].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = collections.defaultdict(list)
    for i in all_ids:
        comp[find(i)].append(i)
    expect = sorted(min(v) for v in comp.values())
    assert kept["vec_id"].to_pylist() == expect


def test_empty_pairs_keeps_everything(ray_session):
    from europa_ray.pipelines.semdedup import semdedup_kept_ids

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(50, 16)).astype(np.float32)
    ids = np.arange(50, dtype=np.int64)
    kept = _as_table(semdedup_kept_ids(_emb_ds(mat, ids), threshold=0.9999, nlist=1))
    assert kept["vec_id"].to_pylist() == ids.tolist()


def test_kept_ids_distributed_labels_equivalent(clustered):
    """Forced driver_max_edges=0 → distributed CC labels + anti-join keep
    path; must equal the driver union-find path row-for-row."""
    from europa_ray.pipelines.semdedup import semdedup_kept_ids

    ds, _ = clustered
    a = _as_table(semdedup_kept_ids(ds, threshold=0.999, nlist=1))
    b = _as_table(
        semdedup_kept_ids(ds, threshold=0.999, nlist=1, driver_max_edges=0)
    )
    assert a["vec_id"].to_pylist() == b["vec_id"].to_pylist()
